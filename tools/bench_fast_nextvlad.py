import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.ops.fast_lf import (
    build_fast_lf_inference, prepare_fast_lf_params,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
F, DIN = 300, 1152
CFG = ModelConfig(iterations=30, compute_dtype="bfloat16")  # NeXtVLAD defaults: K=128 G=8 lam=2

from _bench_util import sync_floor, timeit  # noqa: E402

rng = np.random.default_rng(0)
model = create_model("NeXtVLADModel", CFG)
feats = rng.integers(0, 256, (B, F, DIN), dtype=np.uint8)
nf = rng.integers(10, F+1, (B,)).astype(np.int32)
params, bstats = step_lib.init_model_variables(model, {"features": feats[:4], "num_frames": nf[:4]}, True)
variables = {"params": jax.device_get(params), "batch_stats": jax.device_get(bstats)}
feats_d, nf_d = jax.device_put(feats), jax.device_put(nf)

fp = jax.device_put(prepare_fast_lf_params(variables, CFG, "NeXtVLADModel"))
fast = jax.jit(build_fast_lf_inference(CFG, "NeXtVLADModel", top_k=20, use_pallas=False),
               static_argnames=("presampled",))
key = jax.random.key(0)
t = timeit(lambda dep: fast(fp, feats_d, nf_d + dep.astype(jnp.int32), key))
print(f"NeXtVLAD fast path: {t*1e3:.2f} ms ({B/t:,.0f} videos/s) @ B={B}")

p_d, bs_d = jax.device_put(params), jax.device_put(bstats)
@jax.jit
def full(p, bs, x, n):
    xx = step_lib.preprocess_input(x)
    return model.apply({"params": p, "batch_stats": bs}, xx, num_frames=n,
                       training=False, rngs={"sampling": jax.random.key(0)})["predictions"]
t = timeit(lambda dep: full(p_d, bs_d, feats_d, nf_d + dep.astype(jnp.int32)))
print(f"NeXtVLAD flax path: {t*1e3:.2f} ms ({B/t:,.0f} videos/s)")
