import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp

def sync_floor():
    nop = jax.jit(lambda x: jnp.sum(x)); t = jnp.ones((8,8)); float(nop(t))
    best = 1e9
    for _ in range(5):
        t0=time.perf_counter(); float(nop(t)); best=min(best, time.perf_counter()-t0)
    return best

def timeit(run, iters=8, rounds=6):
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
