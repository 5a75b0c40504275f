"""Fused front-end kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.ops.fused_frontend import (
    netvlad_frontend_fused,
    netvlad_frontend_reference,
    sample_indices,
)


def _args(rng, dt, d_rgb, k_rgb, d_aud, k_aud):
    return dict(
        in_scale=jnp.asarray(rng.uniform(0.8, 1.2, dt).astype(np.float32)),
        in_bias=jnp.asarray(rng.normal(scale=0.05, size=dt).astype(np.float32)),
        c_rgb=jnp.asarray(rng.normal(scale=0.1, size=(d_rgb, k_rgb)).astype(np.float32)),
        s_rgb=jnp.asarray(rng.uniform(0.5, 1.5, k_rgb).astype(np.float32)),
        b_rgb=jnp.asarray(rng.normal(scale=0.1, size=k_rgb).astype(np.float32)),
        c2_rgb=jnp.asarray(rng.normal(scale=0.1, size=(d_rgb, k_rgb)).astype(np.float32)),
        c_aud=jnp.asarray(rng.normal(scale=0.1, size=(d_aud, k_aud)).astype(np.float32)),
        s_aud=jnp.asarray(rng.uniform(0.5, 1.5, k_aud).astype(np.float32)),
        b_aud=jnp.asarray(rng.normal(scale=0.1, size=k_aud).astype(np.float32)),
        c2_aud=jnp.asarray(rng.normal(scale=0.1, size=(d_aud, k_aud)).astype(np.float32)),
    )


def test_fused_frontend_matches_reference(rng):
    B, F, D_RGB, D_AUD, K_RGB, K_AUD = 2, 10, 24, 8, 4, 2
    DT = D_RGB + D_AUD
    x = jnp.asarray(rng.integers(0, 256, size=(B, F, DT), dtype=np.uint8))
    nf = jnp.asarray([10, 4], np.int32)
    idx = sample_indices(jax.random.key(1), nf, F, 6)
    args = _args(rng, DT, D_RGB, K_RGB, D_AUD, K_AUD)
    r1, r2 = netvlad_frontend_reference(x, idx, **args)
    g1, g2 = netvlad_frontend_fused(x, idx, **args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(g1, np.float32), np.asarray(r1, np.float32), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(g2, np.float32), np.asarray(r2, np.float32), atol=2e-2
    )


def test_sample_indices_respects_num_frames(rng):
    nf = jnp.asarray([1, 5, 10], np.int32)
    idx = np.asarray(sample_indices(jax.random.key(0), nf, 10, 50))
    assert idx.shape == (3, 50)
    assert np.all(idx[0] == 0)           # only frame 0 valid
    assert np.all(idx[1] < 5)
    assert np.all(idx[2] < 10)
