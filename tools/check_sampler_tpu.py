"""On-chip check of the advisor's f32 one-hot sampler finding: with
Precision.HIGHEST the MXU permutation must be bit-exact for float32 inputs
(default precision truncates operands to bf16)."""
import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from learnablepoolingmethods_tpu.models import model_utils

rng = np.random.default_rng(1)
x = jnp.asarray(rng.normal(0, 3, (8, 300, 1152)).astype(np.float32))
nf = jnp.asarray(rng.integers(5, 301, (8,)).astype(np.int32))
key = jax.random.key(2)
got = jax.jit(model_utils.sample_random_frames, static_argnums=2)(x, nf, 30, key)
u = jax.random.uniform(key, (8, 30), dtype=jnp.float32)
idx = jnp.minimum((u * jnp.minimum(nf, 300).astype(jnp.float32)[:, None]).astype(jnp.int32), 299)
want = jnp.take_along_axis(x, idx[:, :, None], axis=1)
g, w = np.asarray(got), np.asarray(want)
exact = np.array_equal(g, w)
print("f32 one-hot sampler bit-exact on TPU:", exact)
if not exact:
    print("max abs diff:", np.abs(g - w).max())
    sys.exit(1)
