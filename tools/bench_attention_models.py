"""Flax inference numbers for AttentionPoolingModel / AttentionNetVLADModel."""
import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model

B, F, DIN = 256, 300, 1152
CFG = ModelConfig(compute_dtype="bfloat16")

from _bench_util import sync_floor, timeit  # noqa: E402

rng = np.random.default_rng(0)
feats = rng.integers(0, 256, (B, F, DIN), dtype=np.uint8)
nf = rng.integers(10, F+1, (B,)).astype(np.int32)
feats_d, nf_d = jax.device_put(feats), jax.device_put(nf)
for name in ("AttentionPoolingModel", "AttentionNetVLADModel"):
    model = create_model(name, CFG)
    params, bstats = step_lib.init_model_variables(
        model, {"features": feats[:4], "num_frames": nf[:4]}, True)
    p_d, bs_d = jax.device_put(params), jax.device_put(bstats)
    @jax.jit
    def full(p, bs, x, n):
        xx = step_lib.preprocess_input(x)
        return model.apply({"params": p, "batch_stats": bs}, xx, num_frames=n,
                           training=False)["predictions"]
    t = timeit(lambda dep: full(p_d, bs_d, feats_d, nf_d + dep.astype(jnp.int32)))
    print(f"{name} flax: {t*1e3:.2f} ms ({B/t:,.0f} videos/s) @ B={B}")
