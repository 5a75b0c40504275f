import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
B, F, D = 256, 300, 1024

from _bench_util import sync_floor, timeit  # noqa: E402

rng = np.random.default_rng(0)
x3 = jax.device_put(jnp.asarray(rng.normal(0,1,(B,F,D)).astype(np.float32), jnp.bfloat16))
w = jax.device_put(jnp.asarray(rng.normal(0,0.02,(D,3*D)).astype(np.float32), jnp.bfloat16))

mm3 = jax.jit(lambda dep, x, w: jnp.matmul(x + dep.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
t = timeit(lambda dep: mm3(dep, x3, w)); print(f"3D matmul [B,F,D]x[D,3D]: {t*1e3:.2f} ms")

mm2 = jax.jit(lambda dep, x, w: jnp.matmul(x.reshape(-1, D) + dep.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
t = timeit(lambda dep: mm2(dep, x3, w)); print(f"2D matmul [B*F,D]x[D,3D]: {t*1e3:.2f} ms")

# f32-accum output left in f32 then cast in separate op?
mm2b = jax.jit(lambda dep, x, w: jnp.matmul(x.reshape(-1, D) + dep.astype(jnp.bfloat16), w, preferred_element_type=jnp.bfloat16))
t = timeit(lambda dep: mm2b(dep, x3, w)); print(f"2D matmul bf16-accum: {t*1e3:.2f} ms")
