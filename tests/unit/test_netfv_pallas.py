"""NetFV fused kernel parity: interpret kernel ≡ jnp reference ≡ flax module."""

import jax
import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.ops.netfv_pallas import netfv_fused, netfv_reference


def _inputs(rng, b=3, f=12, d=256, k=8):
    x = jnp.asarray(rng.normal(scale=0.2, size=(b, f, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(scale=0.05, size=(d, k)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(k,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(scale=0.1, size=(k,)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(scale=0.05, size=(d, k)).astype(np.float32))
    covar = jnp.asarray(
        np.square(rng.normal(scale=0.3, size=(d, k))).astype(np.float32) + 1e-6
    )
    return x, c, scale, bias, c2, covar


def test_kernel_matches_reference_interpret(rng):
    args = _inputs(rng)
    r1, r2 = netfv_reference(*args)
    g1, g2 = netfv_fused(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), atol=1e-5)


def test_reference_matches_flax_module(rng):
    """netfv_reference (folded BN) ≡ models.modules.NetFV inference output."""
    from learnablepoolingmethods_tpu.models.modules import NetFV
    from learnablepoolingmethods_tpu.ops.netvlad_pallas import fold_assignment_bn

    b, f, d, k = 2, 7, 24, 4
    x = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    mod = NetFV(feature_size=d, max_frames=f, cluster_size=k, add_batch_norm=True)
    variables = mod.init(jax.random.key(0), x, training=False)
    p, s = variables["params"], variables["batch_stats"]
    want = mod.apply(variables, x, training=False)  # [b, 2*d*k]

    scale, bias = fold_assignment_bn(
        p["cluster_bn"]["scale"], p["cluster_bn"]["bias"],
        s["cluster_bn"]["mean"], s["cluster_bn"]["var"],
    )
    covar = jnp.square(p["covar_weights"]) + 1e-6
    fv1, fv2 = netfv_reference(
        x, p["cluster_weights"], scale, bias, p["cluster_weights2"], covar
    )
    got = jnp.concatenate(
        [fv1.reshape(b, d * k), fv2.reshape(b, d * k)], axis=1
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
