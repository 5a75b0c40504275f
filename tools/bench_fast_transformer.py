"""Bench the config-5 fast path vs the flax path on the real TPU."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.ops.fast_transformer import (
    build_fast_transformer_inference, prepare_fast_transformer_params,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
F, DIN = 300, 1152
CFG = ModelConfig(compute_dtype="bfloat16")


from _bench_util import sync_floor, timeit  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    model = create_model("TransformerEncoderModel", CFG)
    feats = rng.integers(0, 256, (B, F, DIN), dtype=np.uint8)
    nf = rng.integers(10, F + 1, (B,)).astype(np.int32)
    init_b = {"features": feats[:4], "num_frames": nf[:4]}
    params, bstats = step_lib.init_model_variables(model, init_b, True)
    variables = {"params": jax.device_get(params), "batch_stats": jax.device_get(bstats)}
    feats_d, nf_d = jax.device_put(feats), jax.device_put(nf)

    fp = jax.device_put(prepare_fast_transformer_params(variables, CFG))
    arms = (
        (dict(use_pallas=True), "pallas-attn"),
        (dict(use_pallas=False), "xla-attn"),
    )
    for kw, label in arms:
        fast = jax.jit(build_fast_transformer_inference(CFG, top_k=20, **kw))
        t = timeit(lambda dep: fast(fp, feats_d, nf_d + dep.astype(jnp.int32), None))
        print(f"fast path ({label}): {t*1e3:.2f} ms  ({B/t:,.0f} videos/s) @ B={B}")

    p_d, bs_d = jax.device_put(params), jax.device_put(bstats)
    @jax.jit
    def full(p, bs, x, n):
        xx = step_lib.preprocess_input(x)
        return model.apply({"params": p, "batch_stats": bs}, xx, num_frames=n, training=False)["predictions"]
    t = timeit(lambda dep: full(p_d, bs_d, feats_d, nf_d + dep.astype(jnp.int32)))
    print(f"flax path: {t*1e3:.2f} ms  ({B/t:,.0f} videos/s) @ B={B}")


main()

# int8 experiment (round 3, REMOVED after measurement): dynamic per-row
# activation x per-channel weight int8 on the five big matmuls measured
# 25.34 ms @ B=256 vs 21.89 bf16 — a NET LOSS.  Root cause (tools/
# prof_peak.py): the raw int8 [76800,1024]x[1024,3072]->int32 matmul runs at
# only 92 TOPS (1.2x bf16, not 2x) because the shape is HBM-bound and the
# 4-byte int32 accumulator output doubles the write traffic; the dynamic
# amax+quantize passes add ~3 reads of [B,F,D] on top.  Static-scale
# quantization would remove the passes but not the int32-output wall —
# config 5 stays ~12k videos/s on this chip in any precision.
# out-proj+residual+LN1 in-kernel fusion (round 3, REMOVED after
# measurement): folding the [D,D] out-matmul, residual, and LN1 into the
# attention kernel measured 23.7 ms vs ~22 ms for the simpler composition —
# neutral-to-negative within the ±1.5 ms session jitter band.  The expected
# ~2 ms HBM saving is eaten by the in-kernel out-matmul serializing with the
# attention dots and the per-step wo/ln block traffic; XLA's out+LN fusions
# already overlap with the kernel's DMA.  Keep the simple composition.
