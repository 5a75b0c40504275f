import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp

from _bench_util import sync_floor, timeit  # noqa: E402

rng = np.random.default_rng(0)
for (m,k,n) in ((8192,8192,8192), (76800,1024,3072), (76800,1024,1024), (76800,1152,1024)):
    a = jax.device_put(jnp.asarray(rng.normal(0,1,(m,k)).astype(np.float32), jnp.bfloat16))
    b = jax.device_put(jnp.asarray(rng.normal(0,0.02,(k,n)).astype(np.float32), jnp.bfloat16))
    mm = jax.jit(lambda dep, a, b: jnp.matmul(a + dep.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    t = timeit(lambda dep: mm(dep, a, b))
    fl = 2*m*k*n
    print(f"[{m},{k}]x[{k},{n}]: {t*1e3:.2f} ms  {fl/t/1e12:.0f} TFLOPs")

# int8 raw matmul check
m,k,n = 76800,1024,3072
a8 = jax.device_put(jnp.asarray(rng.integers(-127,128,(m,k)),jnp.int8))
b8 = jax.device_put(jnp.asarray(rng.integers(-127,128,(k,n)),jnp.int8))
mm8 = jax.jit(lambda dep, a, b: jax.lax.dot_general(a, b, (((1,),(0,)),((),())), preferred_element_type=jnp.int32) + dep.astype(jnp.int32))
t = timeit(lambda dep: mm8(dep, a8, b8))
print(f"int8 [{m},{k}]x[{k},{n}] -> int32: {t*1e3:.2f} ms  {2*m*k*n/t/1e12:.0f} TOPS")
