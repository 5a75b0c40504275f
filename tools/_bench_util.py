"""Shared TPU measurement harness for the tools/ scripts.

The "honest TPU timing" methodology (CLAUDE.md, memory notes): through the
axon relay a host↔device sync costs ~30 ms, so per-call timing lies.
Instead dispatch ``iters`` steps chained through a device-side data
dependency (the device must execute them serially), sync ONCE, and
subtract the measured sync floor:

    marginal_step = (best_round_wall_time − sync_floor) / iters

``best`` over up to ``rounds`` rounds with a 2-stale early stop rides out
the shared host's ±20% window jitter.  Measurement traps this encodes
(memory/tpu-perf-findings): keep the whole chain in ONE jit program per
step (a separate "bump" jit adds ~1 ms/iter), and chain the dep through a
TINY value — adding it to a large input un-fuses/copies.

Usage from a tools/ script (they run as ``python tools/x.py`` so the
tools/ dir itself is on sys.path):

    from _bench_util import sync_floor, timeit
    t = timeit(lambda dep: jitted_fn(dep, *args))
"""

import time

import jax
import jax.numpy as jnp


def sync_floor(reps: int = 5) -> float:
    """Best-of-``reps`` cost of one tiny dispatch+sync through the relay."""
    nop = jax.jit(lambda x: jnp.sum(x))
    t = jnp.ones((8, 8))
    float(nop(t))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(nop(t))
        best = min(best, time.perf_counter() - t0)
    return best


def default_dep(o):
    """Collapse a step output (array or tuple of arrays) to a zero f32
    scalar that still data-depends on it."""
    leaf = o[0] if isinstance(o, (tuple, list)) else o
    return (jnp.sum(leaf.astype(jnp.float32)) * 0).astype(jnp.float32)


def timeit(run, iters: int = 16, rounds: int = 8, dep_of=default_dep) -> float:
    """Marginal seconds per call of ``run(dep) -> output``.

    ``run`` must thread ``dep`` (a zero f32 scalar) into its computation's
    INPUT so consecutive calls form a device-side serial chain;
    ``dep_of`` turns each output into the next dep."""
    o = run(jnp.zeros((), jnp.float32))
    jax.block_until_ready(o)
    fl = sync_floor()
    best, stale = 1e9, 0
    for _ in range(rounds):
        t0 = time.perf_counter()
        dep = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            o = run(dep)
            dep = dep_of(o)
        jax.block_until_ready(o)
        t = time.perf_counter() - t0
        if t < best:
            best, stale = t, 0
        else:
            stale += 1
            if stale >= 2:
                break
    return (best - fl) / iters


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)
