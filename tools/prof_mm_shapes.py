import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
B, F, D = 256, 300, 1024

def sync_floor():
    nop = jax.jit(lambda x: jnp.sum(x)); t = jnp.ones((8,8)); float(nop(t))
    best = 1e9
    for _ in range(5):
        t0=time.perf_counter(); float(nop(t)); best=min(best, time.perf_counter()-t0)
    return best

def timeit(run, iters=16, rounds=8):
    o = run(jnp.zeros((), jnp.float32)); jax.block_until_ready(o)
    fl = sync_floor(); best, stale = 1e9, 0
    for _ in range(rounds):
        t0 = time.perf_counter(); dep = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            o = run(dep); dep = (jnp.sum(o.astype(jnp.float32))*0).astype(jnp.float32)
        jax.block_until_ready(o); t = time.perf_counter()-t0
        if t < best: best, stale = t, 0
        else:
            stale += 1
            if stale >= 2: break
    return (best-fl)/iters

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
