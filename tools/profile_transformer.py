"""Stage anatomy for TransformerEncoderModel (config 5) inference on the
real TPU — where do the 25.4 ms @ B=256 go?

Methodology: chained dispatch (device-side data dependency), single sync,
sync-floor subtracted — same as bench.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model

B, F, DIN = 256, 300, 1152
CFG = ModelConfig(compute_dtype="bfloat16")  # defaults: d=1024 h=8 L=2 ff=2048
D = CFG.attention_hidden_size
H = CFG.attention_heads
FFD = CFG.transformer_ff_size


from _bench_util import timeit as _timeit  # noqa: E402


def timeit(fn, args, iters=16, rounds=6):
    """fn(dep, *args) -> array; jitted here, chained via dep
    (adapter over the shared tools/_bench_util harness)."""
    jfn = jax.jit(fn)
    return _timeit(lambda dep: jfn(dep, *args), iters=iters, rounds=rounds)


def main():
    rng = np.random.default_rng(0)
    model = create_model("TransformerEncoderModel", CFG)
    feats = rng.integers(0, 256, (B, F, DIN), dtype=np.uint8)
    nf = rng.integers(10, F + 1, (B,)).astype(np.int32)
    init_b = {"features": feats[:4], "num_frames": nf[:4]}
    params, bstats = step_lib.init_model_variables(model, init_b, True)
    params = jax.device_put(params)
    bstats = jax.device_put(bstats)
    feats_d = jax.device_put(feats)
    nf_d = jax.device_put(nf)

    # ---- full model (flax path, the round-2 measured config) ----
    def full(dep, p, bs, x, n):
        xx = step_lib.preprocess_input(x) + dep.astype(jnp.float32)
        out = model.apply({"params": p, "batch_stats": bs}, xx,
                          num_frames=n, training=False)
        return out["predictions"]

    t = timeit(full, (params, bstats, feats_d, nf_d))
    print(f"full flax step: {t*1e3:.2f} ms  ({B/t:,.0f} videos/s)")

    # ---- stages ----
    p = jax.device_get(params)
    wproj = jnp.asarray(p["input_proj"]["kernel"], jnp.bfloat16)
    bproj = jnp.asarray(p["input_proj"]["bias"], jnp.float32)
    mask = (np.arange(F)[None] < nf[:, None]).astype(np.float32)
    mask_d = jax.device_put(mask)

    def stage_input(dep, x, w, b):
        xx = step_lib.preprocess_input(x) + dep.astype(jnp.float32)
        h = jnp.matmul(xx.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32) + b
        return h.astype(jnp.bfloat16)

    t_in = timeit(stage_input, (feats_d, wproj, bproj))
    print(f"input stage (dequant+l2+proj): {t_in*1e3:.2f} ms")

    x0 = jax.device_put(rng.normal(0, 1, (B, F, D)).astype(np.float32).astype(jnp.bfloat16))
    lp = p["encoder"]["layer_0"]["mha"]
    wq = jnp.asarray(lp["query"]["kernel"], jnp.bfloat16).reshape(D, -1)
    wk = jnp.asarray(lp["key"]["kernel"], jnp.bfloat16).reshape(D, -1)
    wv = jnp.asarray(lp["value"]["kernel"], jnp.bfloat16).reshape(D, -1)
    wo = jnp.asarray(lp["out"]["kernel"], jnp.bfloat16).reshape(-1, D)

    def stage_qkvo(dep, x, wq, wk, wv, wo):
        x = x + dep.astype(jnp.bfloat16)
        q = jnp.matmul(x, wq, preferred_element_type=jnp.float32)
        k = jnp.matmul(x, wk, preferred_element_type=jnp.float32)
        v = jnp.matmul(x, wv, preferred_element_type=jnp.float32)
        o = jnp.matmul((q + k + v).astype(jnp.bfloat16), wo.T,
                       preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    t_qkvo = timeit(stage_qkvo, (x0, wq, wk, wv, wo))
    print(f"one layer QKV+out projections: {t_qkvo*1e3:.2f} ms")

    hd = D // H
    q0 = jax.device_put(rng.normal(0, 1, (B, F, H, hd)).astype(np.float32).astype(jnp.bfloat16))

    def stage_attn(dep, q, m):
        q = q + dep.astype(jnp.bfloat16)
        logits = jnp.einsum("bqhk,bshk->bhqs", q, q,
                            preferred_element_type=jnp.float32)
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(m[:, None, None, :] > 0, logits, big_neg)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqs,bshk->bqhk", w.astype(jnp.bfloat16), q,
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    t_attn = timeit(stage_attn, (q0, mask_d))
    print(f"one layer attention core (f32 logits): {t_attn*1e3:.2f} ms")

    def stage_attn_bf16(dep, q, m):
        q = q + dep.astype(jnp.bfloat16)
        logits = jnp.einsum("bqhk,bshk->bhqs", q, q,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(m[:, None, None, :] > 0, logits, -1e9)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - mx)).astype(jnp.bfloat16)
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        w = (e / s.astype(jnp.bfloat16))
        out = jnp.einsum("bhqs,bshk->bqhk", w, q,
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    t_attn16 = timeit(stage_attn_bf16, (q0, mask_d))
    print(f"one layer attention core (bf16 weights): {t_attn16*1e3:.2f} ms")

    wf1 = jnp.asarray(p["encoder"]["layer_0"]["ff1"]["kernel"], jnp.bfloat16)
    wf2 = jnp.asarray(p["encoder"]["layer_0"]["ff2"]["kernel"], jnp.bfloat16)

    def stage_ffn(dep, x, w1, w2):
        x = x + dep.astype(jnp.bfloat16)
        h = jax.nn.relu(jnp.matmul(x, w1, preferred_element_type=jnp.float32))
        return jnp.matmul(h.astype(jnp.bfloat16), w2,
                          preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t_ffn = timeit(stage_ffn, (x0, wf1, wf2))
    print(f"one layer FFN: {t_ffn*1e3:.2f} ms")

    def stage_ln(dep, x):
        x = x.astype(jnp.float32) + dep
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
        return ((x - mean) * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)

    t_ln = timeit(stage_ln, (x0,))
    print(f"one LayerNorm pass: {t_ln*1e3:.2f} ms")

    est = t_in + 2 * (t_qkvo + t_attn + t_ffn + 2 * t_ln)
    print(f"stage-sum estimate: {est*1e3:.2f} ms")


if __name__ == "__main__":
    main()
