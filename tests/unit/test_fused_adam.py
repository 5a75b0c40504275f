"""FusedAdam (ops/fused_adam.py) parity + stochastic-rounding tests.

Pure-XLA implementation, so everything — including the stochastic rounding
(manual bit-dither + rbg PRNG) — runs on CPU.  On-chip timing numbers live
in BASELINE.md."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from learnablepoolingmethods_tpu.ops import fused_adam as fa


def _rand_tree(rng, big_shape=(512, 1024)):
    return {
        "big": jnp.asarray(rng.normal(0, 0.05, big_shape), jnp.bfloat16),
        "small": jnp.asarray(rng.normal(0, 0.05, (37,)), jnp.float32),
    }


def _grad_tree(rng, params):
    return jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0, 0.01, p.shape), p.dtype), params
    )


def test_deterministic_mode_matches_fp32_reference():
    rng = np.random.default_rng(0)
    opt = fa.FusedAdam(lambda step: 0.01, clip_norm=1.0, stochastic=False)
    params = _rand_tree(rng)
    state = opt.init(params)
    for t in range(1, 4):
        grads = _grad_tree(rng, params)
        new_params, new_state = opt.fused_apply(grads, state, params)
        p32, m32, v32 = fa.adam_reference_step(
            grads["big"], params["big"], state.m["big"], state.nu["big"],
            lr=0.01, t=t, clip_norm=1.0,
        )
        # allow 1 bf16 ulp (FMA contraction differs between the separately
        # compiled programs); moments likewise
        np.testing.assert_allclose(
            np.asarray(new_params["big"], np.float32),
            np.asarray(p32.astype(jnp.bfloat16), np.float32),
            rtol=2.0**-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(new_state.nu["big"], np.float32),
            np.asarray(v32.astype(jnp.bfloat16), np.float32),
            rtol=2.0**-6, atol=1e-9,
        )
        params, state = new_params, new_state


def test_fp32_leaves_match_optax_adam():
    rng = np.random.default_rng(1)
    lr = 0.01
    opt = fa.FusedAdam(lambda step: lr, clip_norm=None)
    params = {"w": jnp.asarray(rng.normal(0, 0.1, (37,)), jnp.float32)}
    state = opt.init(params)
    ref_tx = optax.adam(lr)
    ref_state = ref_tx.init(params)
    ref_params = params
    for _ in range(5):
        grads = {"w": jnp.asarray(rng.normal(0, 0.01, (37,)), jnp.float32)}
        params, state = opt.fused_apply(grads, state, params)
        updates, ref_state = ref_tx.update(grads, ref_state, ref_params)
        ref_params = optax.apply_updates(ref_params, updates)
        np.testing.assert_allclose(
            np.asarray(params["w"]), np.asarray(ref_params["w"]),
            rtol=2e-6, atol=2e-8,
        )


def test_per_leaf_clip_matches_clip_gradient_norms():
    rng = np.random.default_rng(2)
    clip = 0.5
    opt = fa.FusedAdam(lambda step: 0.01, clip_norm=clip, stochastic=False)
    params = _rand_tree(rng)
    state = opt.init(params)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0, 10.0, p.shape), p.dtype), params
    )  # huge grads -> clip engages
    new_params, _ = opt.fused_apply(grads, state, params)
    p32_exact, _, _ = fa.adam_reference_step(
        grads["big"], params["big"], state.m["big"], state.nu["big"],
        lr=0.01, t=1, clip_norm=clip,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["big"], np.float32),
        np.asarray(p32_exact.astype(jnp.bfloat16), np.float32),
        rtol=2.0**-6, atol=1e-6,
    )


def test_stochastic_round_bf16_unbiased_and_exact_preserving():
    rng = np.random.default_rng(3)
    # values strictly between bf16 neighbors
    x = jnp.asarray(rng.normal(0, 1.0, (4096,)), jnp.float32)
    x = x + jnp.asarray(rng.uniform(1e-5, 1e-4, (4096,)), jnp.float32)
    key = jax.random.key(0, impl="rbg")
    samples = []
    for s in range(32):
        bits = jax.random.bits(jax.random.fold_in(key, s), shape=x.shape,
                               dtype=jnp.uint32)
        samples.append(np.asarray(fa.stochastic_round_bf16(x, bits), np.float64))
    mean = np.mean(samples, axis=0)
    target = np.asarray(x, np.float64)
    ulp = np.abs(target) * 2.0**-8 + 1e-30
    # unbiased: the mean across draws approaches the fp32 value
    assert np.mean(np.abs(mean - target) / ulp) < 0.2
    # each draw is the bf16 floor or ceil of the fp32 value
    u = np.asarray(x, np.float32).view(np.uint32)
    lo = (u & 0xFFFF0000).view(np.float32).astype(np.float64)
    hi = ((u & 0xFFFF0000) + 0x10000).view(np.float32).astype(np.float64)
    for s in samples[:4]:
        assert np.all((s == lo) | (s == hi))
    # exact bf16 values never move
    exact = jnp.asarray(np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32))
    bits = jax.random.bits(key, shape=exact.shape, dtype=jnp.uint32)
    np.testing.assert_array_equal(
        np.asarray(fa.stochastic_round_bf16(exact, bits), np.float32),
        np.asarray(exact),
    )


def test_stochastic_round_bf16_nonfinite_and_near_max_guard():
    """inf must stay inf (not become a NaN bit pattern), nan stays nan, and
    finite values in/above the top bf16 binade must never dither into the
    inf encoding (the advisor-flagged carry)."""
    bf16_max = float(jnp.finfo(jnp.bfloat16).max)
    x = jnp.asarray(
        [np.inf, -np.inf, np.nan, bf16_max, -bf16_max,
         np.float32(3.4e38),          # between bf16_max and f32 max
         np.nextafter(np.float32(bf16_max), np.float32(0.0))],
        jnp.float32,
    )
    # worst-case dither: all-ones low bits force any possible carry
    bits = jnp.full(x.shape, 0xFFFF, jnp.uint32)
    got = np.asarray(fa.stochastic_round_bf16(x, bits), np.float32)
    assert np.isposinf(got[0])
    assert np.isneginf(got[1])
    assert np.isnan(got[2])
    assert np.isfinite(got[3]) or np.isposinf(got[3])  # deterministic cast
    assert not np.isnan(got[3]) and not np.isnan(got[4])
    assert not np.isnan(got[5])
    # strictly-below-max value may round up to at most bf16_max, never inf/nan
    assert np.isfinite(got[6]) and got[6] <= bf16_max


def test_sr_nu_tracks_ema_where_deterministic_bf16_stalls():
    """THE reason nu can be bf16 only WITH stochastic rounding at
    beta2=0.999: sub-ulp terms of the EMA round away deterministically, so
    the deterministic bf16 EMA drifts >5% off the exact value within 300
    steps (stalling or overshooting depending on regime) while SR tracks it
    in expectation to <1%."""
    steps = 300
    g = {"w": jnp.full((1024, 128), 0.01, jnp.bfloat16)}

    def run(stochastic, seed=0):
        params = {"w": jnp.zeros((1024, 128), jnp.bfloat16)}
        opt = fa.FusedAdam(lambda s: 0.0, clip_norm=None,
                           stochastic=stochastic, seed=seed)
        state = opt.init(params)
        p = params
        step = jax.jit(opt.fused_apply, donate_argnums=(1, 2))
        for _ in range(steps):
            p, state = step(g, state, p)
        return float(np.asarray(state.nu["w"], np.float64).mean())

    g32 = float(np.asarray(g["w"], np.float32)[0, 0])
    expect = (1 - 0.999**steps) * g32 * g32
    sr = run(True)
    det = run(False)
    assert abs(sr - expect) / expect < 0.01, (sr, expect)
    # deterministic bf16 drifts far off the exact EMA (here it overshoots:
    # the sub-ulp beta2 decay rounds away while the ~1-ulp increment lands)
    assert abs(det - expect) / expect > 0.05, (det, expect)


def test_train_state_integration_and_state_dtypes():
    from learnablepoolingmethods_tpu.core.train_state import TrainState

    rng = np.random.default_rng(4)
    opt = fa.FusedAdam(lambda step: 0.01, clip_norm=1.0)
    params = _rand_tree(rng)
    state = TrainState.create(params, batch_stats={}, tx=opt)
    grads = _grad_tree(rng, params)
    new_state = state.apply_gradients(grads)
    assert int(new_state.step) == 1
    assert new_state.params["big"].dtype == jnp.bfloat16
    assert new_state.opt_state.m["big"].dtype == jnp.bfloat16
    assert new_state.opt_state.nu["big"].dtype == jnp.bfloat16
    assert new_state.opt_state.m["small"].dtype == jnp.float32
    assert not np.array_equal(
        np.asarray(new_state.params["big"], np.float32),
        np.asarray(state.params["big"], np.float32),
    )
    # replica determinism: same inputs -> identical update (SR is keyed)
    again = state.apply_gradients(grads)
    np.testing.assert_array_equal(
        np.asarray(again.params["big"], np.float32),
        np.asarray(new_state.params["big"], np.float32),
    )


def test_create_optimizer_dispatch():
    from learnablepoolingmethods_tpu.config import TrainingConfig
    from learnablepoolingmethods_tpu.core.optimizers import create_optimizer

    tx = create_optimizer(TrainingConfig(fused_adam=True))
    assert hasattr(tx, "fused_apply")
    with pytest.raises(ValueError):
        create_optimizer(
            TrainingConfig(fused_adam=True, optimizer="AdafactorOptimizer")
        )
