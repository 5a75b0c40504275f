"""Custom-VJP fused aggregation: value + ALL gradients ≡ jnp composition."""

import jax
import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.ops.netvlad_train import (
    netvlad_aggregate,
    netvlad_aggregate_reference,
)

B, F, D, K = 3, 10, 16, 8


def _inputs(rng):
    x = jnp.asarray(rng.normal(scale=0.3, size=(B, F, D)).astype(np.float32))
    logits = jnp.asarray(rng.normal(scale=0.5, size=(B, F, K)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(scale=0.1, size=(D, K)).astype(np.float32))
    return x, logits, c2


def test_forward_value_matches(rng):
    x, logits, c2 = _inputs(rng)
    got = netvlad_aggregate(x, logits, c2, True)
    want = netvlad_aggregate_reference(x, logits, c2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_all_gradients_match(rng):
    x, logits, c2 = _inputs(rng)
    # random downstream cotangent via a scalar projection
    w = jnp.asarray(rng.normal(size=(B, D, K)).astype(np.float32))

    def loss_fused(x, logits, c2):
        return jnp.sum(netvlad_aggregate(x, logits, c2, True) * w)

    def loss_ref(x, logits, c2):
        return jnp.sum(netvlad_aggregate_reference(x, logits, c2) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, logits, c2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, logits, c2)
    for name, a, b in zip(("dx", "dlogits", "dc2"), gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=f"gradient mismatch: {name}",
        )


def test_module_fused_flag_matches_plain(rng):
    """NetVLAD(fused_aggregation=True) ≡ plain module, value and grads."""
    from learnablepoolingmethods_tpu.models.modules import NetVLAD

    x = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
    plain = NetVLAD(feature_size=D, max_frames=F, cluster_size=K)
    fused = NetVLAD(
        feature_size=D, max_frames=F, cluster_size=K,
        fused_aggregation=True, fused_interpret=True,
    )
    variables = plain.init(jax.random.key(0), x, training=False)

    out_p = plain.apply(variables, x, training=False)
    out_f = fused.apply(variables, x, training=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-5)

    w = jnp.asarray(rng.normal(size=out_p.shape).astype(np.float32))

    def loss(mod):
        def fn(params):
            # train mode with mutable BN to exercise the training graph
            out, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, training=True, mutable=["batch_stats"],
            )
            return jnp.sum(out * w)
        return jax.grad(fn)(variables["params"])

    import chex

    gp = loss(plain)
    gf = loss(fused)
    chex.assert_trees_all_close(gf, gp, atol=3e-5)


def test_rvlad_module_fused_flag_matches_plain(rng):
    """NetRVLAD(fused_aggregation=True) ≡ plain module (zero-center path)."""
    from learnablepoolingmethods_tpu.models.modules import NetRVLAD

    x = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
    plain = NetRVLAD(feature_size=D, max_frames=F, cluster_size=K)
    fused = NetRVLAD(
        feature_size=D, max_frames=F, cluster_size=K,
        fused_aggregation=True, fused_interpret=True,
    )
    variables = plain.init(jax.random.key(0), x, training=False)
    out_p = plain.apply(variables, x, training=False)
    out_f = fused.apply(variables, x, training=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-5)
