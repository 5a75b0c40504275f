import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from learnablepoolingmethods_tpu.ops.fast_transformer import masked_attention_fused

B, F, D, H = 256, 300, 1024, 8

from _bench_util import sync_floor, timeit  # noqa: E402

rng = np.random.default_rng(0)
qkv = jax.device_put(jnp.asarray(rng.normal(0,1,(B,F,3*D)).astype(np.float32), jnp.bfloat16))
mask = jax.device_put((np.arange(F)[None] < rng.integers(10,F+1,(B,))[:,None]).astype(np.float32))
attn = jax.jit(lambda dep, qkv, m: masked_attention_fused(qkv + dep.astype(jnp.bfloat16), m, H))
t = timeit(lambda dep: attn(dep, qkv, mask))
print(f"attention kernel alone: {t*1e3:.2f} ms/layer")

x = jax.device_put(jnp.asarray(rng.normal(0,1,(B,F,D)).astype(np.float32), jnp.bfloat16))
w = jax.device_put(jnp.asarray(rng.normal(0,0.02,(D,3*D)).astype(np.float32), jnp.bfloat16))
mm = jax.jit(lambda dep, x, w: (jnp.matmul(x + dep.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)).astype(jnp.bfloat16))
t = timeit(lambda dep: mm(dep, x, w))
print(f"fused qkv matmul alone: {t*1e3:.2f} ms/layer")

wo = jax.device_put(jnp.asarray(rng.normal(0,0.02,(D,D)).astype(np.float32), jnp.bfloat16))
mo = jax.jit(lambda dep, x, w: (jnp.matmul(x + dep.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)).astype(jnp.bfloat16))
t = timeit(lambda dep: mo(dep, x, wo))
print(f"out proj matmul alone: {t*1e3:.2f} ms/layer")

def lnres(dep, a, b):
    s = a.astype(jnp.float32) + b.astype(jnp.float32) + dep
    m = jnp.mean(s, -1, keepdims=True); v = jnp.mean(s*s, -1, keepdims=True) - m*m
    return ((s-m)*jax.lax.rsqrt(v+1e-6)).astype(jnp.bfloat16)
ln = jax.jit(lnres)
t = timeit(lambda dep: ln(dep, x, x))
print(f"residual+LN fusion alone: {t*1e3:.2f} ms/pass")
