"""EXPERIMENT: num_frames frame-block skipping in the fused frontend kernel.

The round-2 anatomy row (BASELINE.md) puts the frontend kernel at 3.6 ms of
the 6.35 ms NetVLAD-256 step @ B=512, VPU-elementwise-bound: ~2 ms of
dequant+ℓ2+BN passes over ALL 300 padded frame rows.  But sampled indices
are always < num_frames (sample_indices clamps), so with the bench/eval
distribution nf ~ U[10, 300] only ~58% of 128-row frame blocks can ever be
sampled.  `netvlad_frontend_fused(..., num_frames=nf)` guards each block on
an SMEM scalar branch — bit-exact (skipped one-hot partials are exact f32
zeros; tests/unit/test_fused_frontend.py).

Run on the real chip:  python tools/exp_frontend_blockskip.py
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from learnablepoolingmethods_tpu.ops.fused_frontend import (
        netvlad_frontend_fused,
        sample_indices,
    )
    from _bench_util import timeit

    B, F, D_RGB, D_AUD, K_RGB, K_AUD, S = 512, 300, 1024, 128, 256, 128, 300
    DT = D_RGB + D_AUD
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (B, F, DT), dtype=np.uint8))
    )
    nf_np = rng.integers(10, F + 1, (B,)).astype(np.int32)
    nf = jax.device_put(jnp.asarray(nf_np))
    idx = jax.device_put(sample_indices(jax.random.key(1), nf, F, S))
    consts = dict(
        in_scale=jnp.asarray(rng.uniform(0.8, 1.2, DT).astype(np.float32)),
        in_bias=jnp.asarray(rng.normal(scale=0.05, size=DT).astype(np.float32)),
        c_rgb=jnp.asarray(rng.normal(scale=0.1, size=(D_RGB, K_RGB)).astype(np.float32)),
        s_rgb=jnp.asarray(rng.uniform(0.5, 1.5, K_RGB).astype(np.float32)),
        b_rgb=jnp.asarray(rng.normal(scale=0.1, size=K_RGB).astype(np.float32)),
        c2_rgb=jnp.asarray(rng.normal(scale=0.1, size=(D_RGB, K_RGB)).astype(np.float32)),
        c_aud=jnp.asarray(rng.normal(scale=0.1, size=(D_AUD, K_AUD)).astype(np.float32)),
        s_aud=jnp.asarray(rng.uniform(0.5, 1.5, K_AUD).astype(np.float32)),
        b_aud=jnp.asarray(rng.normal(scale=0.1, size=K_AUD).astype(np.float32)),
        c2_aud=jnp.asarray(rng.normal(scale=0.1, size=(D_AUD, K_AUD)).astype(np.float32)),
    )
    consts = {k: jax.device_put(v) for k, v in consts.items()}
    ck = list(consts.values())

    dense = jax.jit(
        lambda dep, x, idx: netvlad_frontend_fused(
            x, idx + (dep * 0).astype(jnp.int32), *ck
        )
    )
    skip = jax.jit(
        lambda dep, x, idx, n: netvlad_frontend_fused(
            x, idx + (dep * 0).astype(jnp.int32), *ck, num_frames=n
        )
    )

    t = timeit(lambda dep: dense(dep, x, idx))
    print(f"dense frontend (nf~U[10,300]): {t*1e3:.2f} ms @ B={B}")
    t = timeit(lambda dep: skip(dep, x, idx, nf))
    print(f"skip  frontend (nf~U[10,300]): {t*1e3:.2f} ms @ B={B}")

    # on-chip bit-exactness
    z = jnp.zeros((), jnp.float32)
    d1, d2 = dense(z, x, idx)
    s1, s2 = skip(z, x, idx, nf)
    e = max(
        float(jnp.max(jnp.abs(d1.astype(jnp.float32) - s1.astype(jnp.float32)))),
        float(jnp.max(jnp.abs(d2.astype(jnp.float32) - s2.astype(jnp.float32)))),
    )
    print(f"on-chip max |dense - skip|: {e:.3e} (expect 0.0)")

    nf_full = jax.device_put(jnp.full((B,), F, jnp.int32))
    idx_full = jax.device_put(sample_indices(jax.random.key(2), nf_full, F, S))
    t = timeit(lambda dep: dense(dep, x, idx_full))
    print(f"dense frontend (nf=300 worst): {t*1e3:.2f} ms @ B={B}")
    t = timeit(lambda dep: skip(dep, x, idx_full, nf_full))
    print(f"skip  frontend (nf=300 worst): {t*1e3:.2f} ms @ B={B}")

    # finer frame blocks waste less on the distribution's tail (live
    # fraction ~0.70 @128 vs ~0.61 @64 for nf~U[10,300]) but add branches;
    # frame_block is a static jit arg, so each size recompiles cleanly
    for blk in (64, 32):
        skip_b = jax.jit(
            lambda dep, x, idx, n, _b=blk: netvlad_frontend_fused(
                x, idx + (dep * 0).astype(jnp.int32), *ck,
                num_frames=n, frame_block=_b,
            )
        )
        t = timeit(lambda dep: skip_b(dep, x, idx, nf))
        print(f"skip  frontend (block={blk}, nf~U): {t*1e3:.2f} ms @ B={B}")


if __name__ == "__main__":
    main()
