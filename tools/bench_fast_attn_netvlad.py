import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.ops.fast_transformer import (
    build_fast_attn_netvlad_inference, prepare_fast_attn_netvlad_params,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
F, DIN = 300, 1152
CFG = ModelConfig(compute_dtype="bfloat16")

from _bench_util import sync_floor, timeit  # noqa: E402

rng = np.random.default_rng(0)
model = create_model("AttentionNetVLADModel", CFG)
feats = rng.integers(0, 256, (B, F, DIN), dtype=np.uint8)
nf = rng.integers(10, F+1, (B,)).astype(np.int32)
params, bstats = step_lib.init_model_variables(
    model, {"features": feats[:4], "num_frames": nf[:4]}, True)
variables = {"params": jax.device_get(params), "batch_stats": jax.device_get(bstats)}
feats_d, nf_d = jax.device_put(feats), jax.device_put(nf)

fp = jax.device_put(prepare_fast_attn_netvlad_params(variables, CFG))
fast = jax.jit(build_fast_attn_netvlad_inference(CFG, top_k=20, use_pallas=True))
t = timeit(lambda dep: fast(fp, feats_d, nf_d + dep.astype(jnp.int32), None))
print(f"AttentionNetVLAD fast path: {t*1e3:.2f} ms ({B/t:,.0f} videos/s) @ B={B}")

# int8 weight-only hidden FC (same shape the NetVLAD path gains +14% on)
fp8 = jax.device_put(
    prepare_fast_attn_netvlad_params(variables, CFG, int8_hidden=True)
)
t = timeit(lambda dep: fast(fp8, feats_d, nf_d + dep.astype(jnp.int32), None))
print(f"AttentionNetVLAD fast+int8:  {t*1e3:.2f} ms ({B/t:,.0f} videos/s) @ B={B}")

p_d, bs_d = jax.device_put(params), jax.device_put(bstats)
@jax.jit
def full(p, bs, x, n):
    xx = step_lib.preprocess_input(x)
    return model.apply({"params": p, "batch_stats": bs}, xx, num_frames=n,
                       training=False)["predictions"]
t = timeit(lambda dep: full(p_d, bs_d, feats_d, nf_d + dep.astype(jnp.int32)))
print(f"AttentionNetVLAD flax path: {t*1e3:.2f} ms ({B/t:,.0f} videos/s)")
