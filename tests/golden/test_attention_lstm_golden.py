"""Golden tests: full attention-family and LSTM/GRU model forwards vs TF2.

Round-2 verdict item 5: the attention models (BASELINE config 5) and the
recurrent models previously had only zoo-contract tests.  Each test here
transcribes the COMPLETE forward pass into TF2 ops — standard MHA / LayerNorm
/ BasicLSTMCell math (ref: attention_modules.py#MultiHeadAttention /
#TransformerEncoder, frame_level_models.py#LstmModel) — runs it with the
IDENTICAL weights taken from flax init, and demands ≤1e-5 fp32 agreement,
like test_netvlad_golden.

Layout notes the transcriptions encode:
- flax MHA stores per-head kernels [D, H, hd] (out: [H, hd, D]); queries are
  scaled by 1/sqrt(head_dim); masked logits get a large negative.
- flax LayerNorm: eps 1e-6, mean/var over the last axis.
- TF BasicLSTMCell fuses gates into one [D+H, 4H] kernel in (i, j, f, o)
  order and adds forget_bias=1.0 at runtime; the transcription builds the
  fused kernel from flax's per-gate slices via the same mapping
  core/checkpoint_import.py uses (its f-bias absorbs the +1.0).
- GruModel: flax GRUCell is the reset-after variant (r gates h·W_hn, not
  (r·h)·W_hn); the transcription follows that variant — the import path for
  reference reset-before checkpoints is out of scope by design.
"""

import jax
import jax.numpy as jnp
import numpy as np
import tensorflow as tf

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.models import create_model

V = 12
B, F, DIN = 3, 7, 10
NF = np.array([7, 4, 2], np.int32)

CFG = ModelConfig(
    vocab_size=V,
    attention_hidden_size=16,
    attention_heads=2,
    transformer_layers=2,
    transformer_ff_size=24,
    attention_cluster_size=3,
    netvlad_cluster_size=4,
    netvlad_hidden_size=16,
    lstm_cells=8,
    lstm_layers=2,
    gru_cells=8,
    gru_layers=2,
    moe_num_mixtures=2,
)

BN_EPS = 1e-3
LN_EPS = 1e-6


def _init(model, x, nf):
    return model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        jnp.asarray(x), num_frames=jnp.asarray(nf), training=False,
    )


def _perturb_stats(variables, rng):
    """Make BN running stats non-trivial so inference-mode folding is real."""
    if "batch_stats" not in variables:
        return variables
    bs = jax.tree.map(
        lambda a: a
        + jnp.asarray(rng.uniform(0.05, 0.3, a.shape).astype(np.float32)),
        variables["batch_stats"],
    )
    return {"params": variables["params"], "batch_stats": bs}


def _t(a):
    return tf.constant(np.asarray(a, np.float32))


def _tf_bn(x, p, s):
    return (x - _t(s["mean"])) * tf.math.rsqrt(_t(s["var"]) + BN_EPS) * _t(
        p["scale"]
    ) + _t(p["bias"])


def _tf_layernorm(x, p):
    mean = tf.reduce_mean(x, axis=-1, keepdims=True)
    var = tf.reduce_mean(tf.square(x), axis=-1, keepdims=True) - tf.square(mean)
    return (x - mean) * tf.math.rsqrt(var + LN_EPS) * _t(p["scale"]) + _t(p["bias"])


def _tf_mha(xq, xkv, p, mask=None):
    """flax nn.MultiHeadDotProductAttention, deterministic, f32."""
    head_dim = np.asarray(p["query"]["kernel"]).shape[-1]
    q = tf.einsum("bqd,dhk->bqhk", xq, _t(p["query"]["kernel"])) + _t(p["query"]["bias"])
    k = tf.einsum("bsd,dhk->bshk", xkv, _t(p["key"]["kernel"])) + _t(p["key"]["bias"])
    v = tf.einsum("bsd,dhk->bshk", xkv, _t(p["value"]["kernel"])) + _t(p["value"]["bias"])
    q = q / np.float32(np.sqrt(head_dim))
    logits = tf.einsum("bqhk,bshk->bhqs", q, k)
    if mask is not None:
        logits = tf.where(mask, logits, tf.fill(tf.shape(logits), np.float32(-1e9)))
    w = tf.nn.softmax(logits, axis=-1)
    out = tf.einsum("bhqs,bshk->bqhk", w, v)
    return tf.einsum("bqhk,hkd->bqd", out, _t(p["out"]["kernel"])) + _t(p["out"]["bias"])


def _tf_moe(h, p):
    """MoeModel head in the rebuild's vocab-major layout (the mixture-major
    reference-layout mapping is golden-tested in test_model_heads.py)."""
    m = CFG.moe_num_mixtures
    ga = tf.reshape(tf.matmul(h, _t(p["gates_kernel"])), [-1, m + 1, V])
    ea = tf.reshape(
        tf.matmul(h, _t(p["experts_kernel"])) + _t(p["experts_bias"]), [-1, m, V]
    )
    gating = tf.nn.softmax(ga, axis=1)
    return tf.reduce_sum(gating[:, :m] * tf.nn.sigmoid(ea), axis=1)


def _tf_tail(pooled, params, stats):
    """_lf_tail with the default config (BN on, relu off → bias branch;
    gating with BN) followed by the MoE head."""
    h = tf.matmul(pooled, _t(params["hidden1_weights"])) + _t(
        params["hidden1_biases"]
    )
    gates = tf.matmul(h, _t(params["gating"]["gating_weights"]))
    gates = _tf_bn(gates, params["gating"]["gating_bn"], stats["gating"]["gating_bn"])
    h = h * tf.nn.sigmoid(gates)
    return _tf_moe(h, params["MoeModel_0"])


def _tf_encoder(x, params, num_layers, pad_mask):
    attn_mask = tf.cast(pad_mask, tf.bool)[:, None, None, :] & tf.fill(
        (1, 1, x.shape[1], 1), True
    )
    for i in range(num_layers):
        lp = params[f"layer_{i}"]
        attn = _tf_mha(x, x, lp["mha"], mask=attn_mask)
        x = _tf_layernorm(x + attn, lp["ln1"])
        ff = tf.nn.relu(tf.matmul(x, _t(lp["ff1"]["kernel"])) + _t(lp["ff1"]["bias"]))
        ff = tf.matmul(ff, _t(lp["ff2"]["kernel"])) + _t(lp["ff2"]["bias"])
        x = _tf_layernorm(x + ff, lp["ln2"])
    return x


def _inputs(rng):
    x = rng.normal(size=(B, F, DIN)).astype(np.float32)
    mask = (np.arange(F)[None, :] < NF[:, None]).astype(np.float32)
    return x, mask


def test_transformer_encoder_model_golden(rng):
    """Full TransformerEncoderModel forward (BASELINE config 5): input proj →
    2 masked encoder blocks → masked mean → hidden FC → gating BN → MoE."""
    model = create_model("TransformerEncoderModel", CFG)
    x, mask = _inputs(rng)
    variables = _perturb_stats(_init(model, x, NF), rng)
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(x), num_frames=jnp.asarray(NF), training=False
        )["predictions"]
    )

    p, s = variables["params"], variables["batch_stats"]
    tx = tf.matmul(_t(x), _t(p["input_proj"]["kernel"])) + _t(p["input_proj"]["bias"])
    tx = _tf_encoder(tx, p["encoder"], CFG.transformer_layers, _t(mask))
    denom = tf.maximum(tf.reduce_sum(_t(mask), axis=1, keepdims=True), 1.0)
    pooled = tf.reduce_sum(tx * _t(mask)[:, :, None], axis=1) / denom
    want = _tf_tail(pooled, p, s).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_pooling_model_golden(rng):
    """AttentionPoolingModel: learned-query MHA pooling → concat → tail."""
    model = create_model("AttentionPoolingModel", CFG)
    x, mask = _inputs(rng)
    variables = _perturb_stats(_init(model, x, NF), rng)
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(x), num_frames=jnp.asarray(NF), training=False
        )["predictions"]
    )

    p, s = variables["params"], variables["batch_stats"]
    q_param = np.asarray(p["attn_pool"]["queries"], np.float32)
    nq = q_param.shape[0]
    tx = tf.matmul(_t(x), _t(p["input_proj"]["kernel"])) + _t(p["input_proj"]["bias"])
    q = tf.tile(_t(q_param)[None], [B, 1, 1])
    attn_mask = tf.cast(_t(mask), tf.bool)[:, None, None, :] & tf.fill(
        (1, 1, nq, 1), True
    )
    pooled = _tf_mha(q, tx, p["attn_pool"]["pool_mha"], mask=attn_mask)
    pooled = tf.reshape(pooled, [B, nq * CFG.attention_hidden_size])
    want = _tf_tail(pooled, p, s).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_netvlad_model_golden(rng):
    """AttentionNetVLADModel: encoder → mask-zero → NetVLAD (assignment BN,
    inference stats) → tail."""
    model = create_model("AttentionNetVLADModel", CFG)
    x, mask = _inputs(rng)
    variables = _perturb_stats(_init(model, x, NF), rng)
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(x), num_frames=jnp.asarray(NF), training=False
        )["predictions"]
    )

    p, s = variables["params"], variables["batch_stats"]
    d = CFG.attention_hidden_size
    k = CFG.netvlad_cluster_size
    tx = tf.matmul(_t(x), _t(p["input_proj"]["kernel"])) + _t(p["input_proj"]["bias"])
    tx = _tf_encoder(tx, p["encoder"], CFG.transformer_layers, _t(mask))
    tx = tx * _t(mask)[:, :, None]

    # NetVLAD with BN on the assignment logits (modules.py#NetVLAD)
    vp, vs = p["vlad"], s["vlad"]
    acts = tf.matmul(tf.reshape(tx, [-1, d]), _t(vp["cluster_weights"]))
    acts = _tf_bn(acts, vp["cluster_bn"], vs["cluster_bn"])
    acts = tf.nn.softmax(acts)
    acts = tf.reshape(acts, [-1, F, k])
    a_sum = tf.reduce_sum(acts, -2, keepdims=True)
    a = tf.multiply(a_sum, _t(vp["cluster_weights2"]))
    vlad = tf.matmul(tf.transpose(acts, [0, 2, 1]), tf.reshape(tx, [-1, F, d]))
    vlad = tf.transpose(vlad, [0, 2, 1]) - a
    vlad = tf.nn.l2_normalize(vlad, 1)
    vlad = tf.reshape(vlad, [-1, k * d])
    vlad = tf.nn.l2_normalize(vlad, 1)

    want = _tf_tail(vlad, p, s).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def _fused_lstm_weights(cell_params, din, h):
    """flax OptimizedLSTMCell per-gate slices → TF BasicLSTMCell fused
    [D+H, 4H] kernel + [4H] bias, gate order (i, j, f, o) — the inverse of
    core/checkpoint_import.py's import mapping (f bias absorbs forget_bias)."""
    gate_col = {"i": 0, "g": 1, "f": 2, "o": 3}
    w = np.zeros((din + h, 4 * h), np.float32)
    b = np.zeros((4 * h,), np.float32)
    for g, col in gate_col.items():
        w[:din, col * h:(col + 1) * h] = np.asarray(cell_params[f"i{g}"]["kernel"])
        w[din:, col * h:(col + 1) * h] = np.asarray(cell_params[f"h{g}"]["kernel"])
        bias = np.asarray(cell_params[f"h{g}"]["bias"], np.float32)
        if g == "f":
            bias = bias - 1.0  # TF adds forget_bias=1.0 at runtime
        b[col * h:(col + 1) * h] = bias
    return tf.constant(w), tf.constant(b)


def _tf_basic_lstm_layer(x_seq, w, b, h, nf):
    """dynamic_rnn(BasicLSTMCell) semantics: state frozen at t >= len.
    Returns (output sequence [B,F,H], final h [B,H])."""
    b_sz = x_seq.shape[0]
    c = tf.zeros((b_sz, h), tf.float32)
    hh = tf.zeros((b_sz, h), tf.float32)
    outs = []
    for t in range(x_seq.shape[1]):
        zt = tf.matmul(tf.concat([x_seq[:, t], hh], axis=1), w) + b
        i, j, f, o = tf.split(zt, 4, axis=1)
        new_c = c * tf.sigmoid(f + 1.0) + tf.sigmoid(i) * tf.tanh(j)
        new_h = tf.tanh(new_c) * tf.sigmoid(o)
        alive = tf.cast(t < nf, tf.float32)[:, None]
        c = alive * new_c + (1 - alive) * c
        hh = alive * new_h + (1 - alive) * hh
        outs.append(alive * new_h)  # dynamic_rnn emits zeros past length
    return tf.stack(outs, axis=1), hh


def test_lstm_model_golden(rng):
    """Full LstmModel forward: 2 stacked cells with sequence_length-aware
    final state → MoE, vs the fused-gate TF BasicLSTMCell transcription."""
    model = create_model("LstmModel", CFG)
    x, _ = _inputs(rng)
    variables = _init(model, x, NF)
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(x), num_frames=jnp.asarray(NF), training=False
        )["predictions"]
    )

    p = variables["params"]
    h = CFG.lstm_cells
    seq = _t(x)
    nf = tf.constant(NF)
    final_h = None
    for layer in range(CFG.lstm_layers):
        din = int(seq.shape[-1])
        w, b = _fused_lstm_weights(p[f"OptimizedLSTMCell_{layer}"], din, h)
        seq, final_h = _tf_basic_lstm_layer(seq, w, b, h, nf)
    want = _tf_moe(final_h, p["MoeModel_0"]).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gru_model_golden(rng):
    """Full GruModel forward vs a TF transcription of the (reset-after)
    GRU variant the rebuild uses."""
    model = create_model("GruModel", CFG)
    x, _ = _inputs(rng)
    variables = _init(model, x, NF)
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(x), num_frames=jnp.asarray(NF), training=False
        )["predictions"]
    )

    p = variables["params"]
    h = CFG.gru_cells
    seq = _t(x)
    nf = tf.constant(NF)
    hh = None
    for layer in range(CFG.gru_layers):
        cp = p[f"GRUCell_{layer}"]
        hh = tf.zeros((B, h), tf.float32)
        outs = []
        for t in range(F):
            xt = seq[:, t]
            r = tf.sigmoid(
                tf.matmul(xt, _t(cp["ir"]["kernel"])) + _t(cp["ir"]["bias"])
                + tf.matmul(hh, _t(cp["hr"]["kernel"]))
            )
            z = tf.sigmoid(
                tf.matmul(xt, _t(cp["iz"]["kernel"])) + _t(cp["iz"]["bias"])
                + tf.matmul(hh, _t(cp["hz"]["kernel"]))
            )
            n = tf.tanh(
                tf.matmul(xt, _t(cp["in"]["kernel"])) + _t(cp["in"]["bias"])
                + r * (tf.matmul(hh, _t(cp["hn"]["kernel"])) + _t(cp["hn"]["bias"]))
            )
            new_h = (1.0 - z) * n + z * hh
            alive = tf.cast(t < nf, tf.float32)[:, None]
            hh = alive * new_h + (1 - alive) * hh
            outs.append(alive * new_h)
        seq = tf.stack(outs, axis=1)
    want = _tf_moe(hh, p["MoeModel_0"]).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
