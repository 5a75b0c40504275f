"""LstmModel/GruModel inference throughput (flax path), real TPU.

Provenance of the BASELINE.md "LSTM/GRU inference" rows.  A fused-scan
fast path (hoisted [B,F,4H] input projections, pre-concatenated [H,4H]
gate kernels, bf16 carries) was benchmarked here and measured SLOWER than
flax (materializing the hoisted projection costs more HBM than batched-M
MXU efficiency buys — BASELINE.md negative-result row), so the experiment
was removed and this tool now measures the shipped flax path only.

Usage: python tools/bench_fast_rnn.py [LstmModel|GruModel] [batch]
"""

import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model

MODEL = sys.argv[1] if len(sys.argv) > 1 else "LstmModel"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
F, DIN = 300, 1152
CFG = ModelConfig(compute_dtype="bfloat16")

from _bench_util import sync_floor, timeit  # noqa: E402

rng = np.random.default_rng(0)
model = create_model(MODEL, CFG)
feats = rng.integers(0, 256, (B, F, DIN), dtype=np.uint8)
nf = rng.integers(10, F+1, (B,)).astype(np.int32)
params, bstats = step_lib.init_model_variables(model, {"features": feats[:4], "num_frames": nf[:4]}, True)
feats_d, nf_d = jax.device_put(feats), jax.device_put(nf)

p_d = jax.device_put(params)
@jax.jit
def full(p, x, n):
    xx = step_lib.preprocess_input(x)
    return model.apply({"params": p}, xx, num_frames=n, training=False)["predictions"]
t = timeit(lambda dep: full(p_d, feats_d, nf_d + dep.astype(jnp.int32)))
print(f"{MODEL} flax path: {t*1e3:.2f} ms ({B/t:,.0f} videos/s) @ B={B}")
