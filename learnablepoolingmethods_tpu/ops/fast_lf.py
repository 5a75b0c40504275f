"""BN-folded fast inference for the remaining LOUPE "LF" models.

Extends the speed-of-light treatment of ``ops/fast_infer.py`` (NetVLADModelLF)
and ``ops/fast_dbof.py`` (DbofModel) to the rest of the LF family
(ref: frame_level_models.py#NetFVModelLF / #NetRVLADModelLF /
#SoftDbofModelLF — sample → input BN → per-modality pooling → hidden FC →
context gating → MoE):

- **NetFVModelLF**: per-modality fused Pallas NetFV kernel
  (ops/netfv_pallas.py — softmax assignment + 1st/2nd-order statistics +
  both normalizations in VMEM); the hidden FC consumes (fv1, fv2) through
  row-split weights, so the [B, 2·D·K] concat never materializes.
- **NetRVLADModelLF**: the fused NetVLAD kernel with zero centers
  (RVLAD ≡ VLAD without the learned-center subtraction).
- **SoftDbofModelLF**: the soft-assignment histogram is a plain
  matmul → softmax → frame-sum — XLA already fuses it; no kernel needed.

All share: uint8 frame sampling before dequantize (exact reorder), folded
input/cluster BN affines, and the gated-MoE tail from fast_infer.
Parity vs ``model.apply(training=False)`` with presampled inputs is checked
per model in tests/unit/test_fast_lf.py (interpret-mode kernels).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.ops.fast_infer import (
    _fold_bn,
    _require_moe_head,
    gated_moe_tail,
)
from learnablepoolingmethods_tpu.ops.netfv_pallas import netfv_fused, netfv_reference
from learnablepoolingmethods_tpu.ops.netvlad_pallas import (
    netvlad_fused,
    netvlad_reference,
)
from learnablepoolingmethods_tpu.ops.normalize import l2_normalize
from learnablepoolingmethods_tpu.ops.softdbow_pallas import (
    softdbow_fused,
    softdbow_reference,
)
from learnablepoolingmethods_tpu.utils.quantization import dequantize

from learnablepoolingmethods_tpu.ops.fast_dispatch import FAST_LF_MODELS

_MODULE_PREFIX = {
    "NetFVModelLF": "NetFV",
    "NetRVLADModelLF": "NetRVLAD",
    "SoftDbofModelLF": "SoftDBoW",
    "NeXtVLADModel": "NeXtVLAD",
}


def _model_geometry(mcfg: ModelConfig, model_name: str):
    """(cluster_size_rgb, relu flag, per-descriptor width fn) per model.
    NeXtVLAD's width depends on λD/G, which the preparer reads from the
    actual param shapes — the fn slot is None."""
    if model_name == "NetFVModelLF":
        return mcfg.fv_cluster_size, mcfg.fv_relu, lambda d, k: 2 * d * k
    if model_name == "NetRVLADModelLF":
        return mcfg.rvlad_cluster_size, mcfg.netvlad_relu, lambda d, k: d * k
    if model_name == "SoftDbofModelLF":
        return mcfg.dbow_cluster_size, mcfg.netvlad_relu, lambda d, k: k
    if model_name == "NeXtVLADModel":
        return mcfg.nextvlad_cluster_size, mcfg.netvlad_relu, None
    raise ValueError(f"unsupported fast-LF model {model_name!r}")


def prepare_fast_lf_params(
    variables: Dict[str, Any],
    mcfg: ModelConfig,
    model_name: str,
    compute_dtype=jnp.bfloat16,
    int8_hidden: bool = False,
) -> Dict[str, Any]:
    """Fold BNs / cast weights once on host → flat param pytree.

    ``int8_hidden`` (NetFV/NetRVLAD only — the models whose hidden FC is
    the same giant 2·D·K/D·K-row HBM-bound weight the NetVLAD path
    quantizes for a measured +14% at B=256): store the FC slices int8
    with per-column scales (ops/int8_matmul.py)."""
    k_rgb, relu, width = _model_geometry(mcfg, model_name)
    if int8_hidden and model_name not in ("NetFVModelLF", "NetRVLADModelLF"):
        raise ValueError(
            f"int8_hidden is not supported on {model_name} (its hidden FC "
            "is not the HBM-bound giant-weight shape where int8 pays)"
        )
    if int8_hidden:
        from learnablepoolingmethods_tpu.ops.int8_matmul import (
            quantize_weight_int8,
        )

        def set_w(entry, key, slice_):
            q, sc = quantize_weight_int8(slice_)
            entry[key + "_q"] = jnp.asarray(q)
            entry[key + "_s"] = jnp.asarray(sc)
    else:
        def set_w(entry, key, slice_):
            entry[key] = slice_.astype(ct)
    if not mcfg.netvlad_add_batch_norm or relu or not mcfg.gating:
        raise ValueError(
            f"fast path for {model_name} supports the default config "
            "(BN on, relu off, gating on)"
        )
    if mcfg.netvlad_dimred > 0:
        raise ValueError("fast LF path does not support --netvlad_dimred")
    if not mcfg.sample_random_frames:
        raise ValueError(
            "fast path samples iid frames; --nosample_random_frames "
            "(contiguous windows) needs the flax forward"
        )
    p = variables["params"]
    s = variables["batch_stats"]
    ct = compute_dtype
    prefix = _MODULE_PREFIX[model_name]

    mods = []
    offset = 0
    hidden_w = p["hidden1_weights"]
    for i in (0, 1):
        name = f"{prefix}_{i}"
        if name not in p:
            break
        mp = p[name]
        scale, bias = _fold_bn(mp["cluster_bn"], s[name]["cluster_bn"])
        if model_name == "NeXtVLADModel":
            # geometry read from the param shapes (groups may have been
            # divisor-adjusted at model build time — frame_level.py)
            we = mp["expansion_weights"]            # [D, λD]
            k_mod, dp = mp["cluster_weights2"].shape  # [K, λD/G]
            vscale, vbias = _fold_bn(mp["vlad_bn"], s[name]["vlad_bn"])
            w = k_mod * dp
            entry = {
                # "cluster" keeps the [D, …] leaf every branch uses for the
                # modality split width (forward reads .shape[0])
                "cluster": we.astype(ct),
                "scale": scale,
                "bias": bias,
                "wg": mp["group_attention_weights"].astype(ct),
                "wa": mp["cluster_weights"].astype(ct),  # [λD, G·K]
                "c2": mp["cluster_weights2"].astype(jnp.float32),
                "vscale": vscale,
                "vbias": vbias,
                "w1": hidden_w[offset : offset + w].astype(ct),
            }
            offset += w
            mods.append(entry)
            continue
        d, k = mp["cluster_weights"].shape
        entry = {
            "cluster": mp["cluster_weights"].astype(ct),
            "scale": scale,
            "bias": bias,
        }
        if model_name == "NetFVModelLF":
            c2 = mp["cluster_weights2"].reshape(d, k).astype(jnp.float32)
            if mcfg.fv_couple_weights:
                covar = mcfg.fv_coupling_factor * mp["cluster_weights"]
            else:
                covar = mp["covar_weights"]
            entry["c2"] = c2
            entry["covar"] = (
                jnp.square(covar).astype(jnp.float32) + 1e-6
            ).reshape(d, k)
            w = width(d, k)
            # fv1 rows then fv2 rows (modules.py#NetFV concat order)
            set_w(entry, "w1", hidden_w[offset : offset + d * k])
            set_w(entry, "w2", hidden_w[offset + d * k : offset + w])
        elif model_name == "NetRVLADModelLF":
            entry["c2"] = jnp.zeros((d, k), jnp.float32)  # RVLAD: no centers
            w = width(d, k)
            set_w(entry, "w1", hidden_w[offset : offset + w])
        else:  # SoftDbofModelLF
            w = width(d, k)
            set_w(entry, "w1", hidden_w[offset : offset + w])
        offset += w
        mods.append(entry)
    if offset != hidden_w.shape[0]:
        raise ValueError(
            f"hidden FC row split mismatch: consumed {offset} of "
            f"{hidden_w.shape[0]} rows"
        )

    in_scale, in_bias = _fold_bn(p["input_bn"], s["input_bn"])
    g_scale, g_bias = _fold_bn(p["gating"]["gating_bn"], s["gating"]["gating_bn"])
    _require_moe_head(p, mcfg)
    moe = p["MoeModel_0"]
    return {
        "in_scale": in_scale,
        "in_bias": in_bias,
        "mods": mods,
        "hidden_b": p["hidden1_biases"].astype(jnp.float32),
        "gate_w": p["gating"]["gating_weights"].astype(ct),
        "g_scale": g_scale,
        "g_bias": g_bias,
        "gates_kernel": moe["gates_kernel"].astype(ct),
        "experts_kernel": moe["experts_kernel"].astype(ct),
        "experts_bias": moe["experts_bias"].astype(jnp.float32),
    }


def build_fast_lf_inference(
    mcfg: ModelConfig,
    model_name: str,
    top_k: int = 20,
    use_pallas: bool = True,
    pallas_interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    return_probs: bool = False,
):
    """fn(fp, features, num_frames, rng, presampled=False) →
    (values [B,k], indices [B,k]) or probs [B,V] when ``return_probs``."""
    _model_geometry(mcfg, model_name)  # validate the name eagerly
    m = mcfg.moe_num_mixtures
    v = mcfg.vocab_size
    iterations = mcfg.iterations
    ct = compute_dtype

    def _fc(x2d, entry, key):
        """hidden-FC slice matmul, int8-weight-aware (prepare stores
        ``{key}_q``/``{key}_s`` when int8_hidden was requested)."""
        if key + "_q" in entry:
            from learnablepoolingmethods_tpu.ops.int8_matmul import matmul_wi8

            return matmul_wi8(x2d, entry[key + "_q"], entry[key + "_s"])
        return jnp.matmul(x2d, entry[key], preferred_element_type=jnp.float32)

    def _pooled_contrib(x_mod, entry):
        b = x_mod.shape[0]
        if model_name == "NeXtVLADModel":
            # modules.py#NeXtVLAD with folded cluster/vlad BNs — every op is
            # an MXU einsum; XLA fuses the sigmoid/softmax epilogues
            k_mod, dp = entry["c2"].shape
            xt = jnp.einsum(
                "bfd,de->bfe", x_mod.astype(ct), entry["cluster"],
                preferred_element_type=jnp.float32,
            ).astype(ct)  # [B, S, λD]
            g = entry["wg"].shape[1]
            alpha = jax.nn.sigmoid(
                jnp.einsum(
                    "bfe,eg->bfg", xt, entry["wg"],
                    preferred_element_type=jnp.float32,
                )
            )
            logits = (
                jnp.einsum(
                    "bfe,ec->bfc", xt, entry["wa"],
                    preferred_element_type=jnp.float32,
                )
                * entry["scale"]
                + entry["bias"]
            ).reshape(b, -1, g, k_mod)
            assign = jax.nn.softmax(logits, axis=-1) * alpha[..., None]
            xg = xt.reshape(b, -1, g, dp)
            agg = jnp.einsum(
                "bfgk,bfgd->bkd", assign.astype(ct), xg,
                preferred_element_type=jnp.float32,
            )
            a_sum = jnp.sum(assign, axis=(1, 2))  # [B, K]
            vlad = agg - a_sum[:, :, None] * entry["c2"][None]
            vlad = l2_normalize(vlad, axis=-1).reshape(b, k_mod * dp)
            vlad = (vlad * entry["vscale"] + entry["vbias"]).astype(ct)
            return _fc(vlad, entry, "w1")
        if model_name == "NetFVModelLF":
            fv_fn = netfv_fused if use_pallas else netfv_reference
            kw = {"interpret": pallas_interpret} if use_pallas else {}
            fv1, fv2 = fv_fn(
                x_mod, entry["cluster"], entry["scale"], entry["bias"],
                entry["c2"], entry["covar"], **kw,
            )
            return _fc(fv1.reshape(b, -1), entry, "w1") + _fc(
                fv2.reshape(b, -1), entry, "w2"
            )
        if model_name == "NetRVLADModelLF":
            if use_pallas:
                out = netvlad_fused(
                    x_mod, entry["cluster"], entry["scale"], entry["bias"],
                    entry["c2"], interpret=pallas_interpret,
                )
            else:
                out = netvlad_reference(
                    x_mod, entry["cluster"], entry["scale"], entry["bias"],
                    entry["c2"],
                )
            return _fc(out.reshape(b, -1), entry, "w1")
        # SoftDbofModelLF — fused histogram kernel (XLA materializes the
        # [B, F, K] assignment tensor in HBM otherwise: 21 → ~5 ms at B=512)
        if use_pallas:
            bow = softdbow_fused(
                x_mod, entry["cluster"], entry["scale"], entry["bias"],
                interpret=pallas_interpret,
            )
        else:
            bow = softdbow_reference(
                x_mod, entry["cluster"], entry["scale"], entry["bias"]
            )
        bow = l2_normalize(bow, axis=1).astype(ct)
        return _fc(bow, entry, "w1")

    def forward(fp, features, num_frames, rng, presampled: bool = False):
        if not presampled:
            from learnablepoolingmethods_tpu.models.model_utils import (
                sample_frame_features,
            )

            features = sample_frame_features(features, num_frames, iterations, rng)

        x = (
            dequantize(features, dtype=ct)
            if features.dtype == jnp.uint8
            else features.astype(ct)
        )
        x = l2_normalize(x, axis=-1)
        x = (x.astype(jnp.float32) * fp["in_scale"] + fp["in_bias"]).astype(ct)

        h = fp["hidden_b"]
        d_rgb = fp["mods"][0]["cluster"].shape[0]
        slices = [x[:, :, :d_rgb]]
        if len(fp["mods"]) > 1:
            slices.append(x[:, :, d_rgb:])
        for x_mod, entry in zip(slices, fp["mods"]):
            h = h + _pooled_contrib(x_mod, entry)
        return gated_moe_tail(fp, h, m, v, ct, top_k, return_probs)

    return forward
