"""Model-axis (2-D mesh) sharding equivalence (SURVEY.md §7 hard part).

The Willow config's 278528×1024 hidden FC (~285M params) is the one weight
that can outgrow a chip; ``parallel/mesh.py#shard_params`` splits its output
axis over the ``"model"`` mesh axis.  These tests prove on a 4×2 virtual mesh
that the sharded train/eval steps are numerically equivalent to the fully
replicated 1-D-mesh run (XLA inserts the all-gathers; math unchanged).
"""

import chex
import jax
import numpy as np

from learnablepoolingmethods_tpu import losses
from learnablepoolingmethods_tpu.config import ModelConfig, TrainingConfig
from learnablepoolingmethods_tpu.core import optimizers, step as step_lib
from learnablepoolingmethods_tpu.core.train_state import TrainState
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib

MCFG = ModelConfig(
    vocab_size=32,
    iterations=6,
    netvlad_cluster_size=8,
    netvlad_hidden_size=32,
    moe_num_mixtures=2,
)
TCFG = TrainingConfig(batch_size=8, base_learning_rate=0.01)
MIN_SIZE = 1 << 8  # shrink the "large param" threshold to hit the tiny FC


def _make_state_and_batch(rng):
    model = create_model("NetVLADModelLF", MCFG)
    batch = {
        "features": rng.integers(0, 256, size=(8, 12, 24), dtype=np.uint8),
        "labels": (rng.uniform(size=(8, MCFG.vocab_size)) < 0.2).astype(np.float32),
        "num_frames": rng.integers(1, 13, size=(8,)).astype(np.int32),
        "weights": np.ones(8, np.float32),
    }
    params, bs = step_lib.init_model_variables(model, batch, frame_features=True)
    tx = optimizers.create_optimizer(TCFG)
    return model, TrainState.create(params, bs, tx), batch


def _shard_state(state, mesh):
    repl = mesh_lib.replicated_sharding(mesh)
    return state.replace(
        params=mesh_lib.shard_params(state.params, mesh, min_size=MIN_SIZE),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=mesh_lib.shard_params(state.opt_state, mesh, min_size=MIN_SIZE),
        step=jax.device_put(state.step, repl),
    )


def test_shard_params_actually_shards():
    """Guard against vacuous equivalence: at least one param must land on
    the model axis of a 4×2 mesh."""
    rng = np.random.default_rng(0)
    _, state, _ = _make_state_and_batch(rng)
    mesh = mesh_lib.create_mesh(model_parallelism=2)
    sharded = mesh_lib.shard_params(state.params, mesh, min_size=MIN_SIZE)
    n_model_sharded = 0
    for p in jax.tree.leaves(sharded):
        spec = p.sharding.spec
        if any(s == mesh_lib.MODEL_AXIS for s in spec):
            n_model_sharded += 1
            assert p.shape[-1] % 2 == 0
    assert n_model_sharded >= 1, "no param was sharded over the model axis"


def test_model_axis_train_step_equals_replicated(rng):
    model, state, batch = _make_state_and_batch(rng)
    loss_obj = losses.CrossEntropyLoss()
    step_fn = step_lib.make_train_step(model, loss_obj, TCFG, MCFG, True)
    key = jax.random.key(0)

    # baseline: 1-D data mesh, everything replicated
    mesh1 = mesh_lib.create_mesh()
    state1 = jax.device_put(state, mesh_lib.replicated_sharding(mesh1))
    batch1 = mesh_lib.shard_batch(batch, mesh1)
    key1 = jax.device_put(key, mesh_lib.replicated_sharding(mesh1))
    s1, m1 = jax.jit(step_fn)(state1, batch1, key1)

    # 4×2 mesh with model-axis param sharding
    mesh2 = mesh_lib.create_mesh(model_parallelism=2)
    state2 = _shard_state(jax.device_get(state), mesh2)
    batch2 = mesh_lib.shard_batch(batch, mesh2)
    key2 = jax.device_put(key, mesh_lib.replicated_sharding(mesh2))
    s2, m2 = jax.jit(step_fn)(state2, batch2, key2)

    chex.assert_trees_all_close(
        jax.device_get(s1.params), jax.device_get(s2.params),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)

    # second step: sharding survives the update (output shardings propagate)
    s2b, m2b = jax.jit(step_fn)(s2, batch2, key2)
    assert np.isfinite(float(m2b["loss"]))


def test_model_axis_eval_equals_replicated(rng):
    model, state, batch = _make_state_and_batch(rng)
    loss_obj = losses.CrossEntropyLoss()
    eval_fn = step_lib.make_eval_step(model, loss_obj, MCFG, True, top_k=5)

    mesh1 = mesh_lib.create_mesh()
    p1 = jax.device_put(state.params, mesh_lib.replicated_sharding(mesh1))
    b1 = jax.device_put(state.batch_stats, mesh_lib.replicated_sharding(mesh1))
    out1 = jax.jit(eval_fn)(p1, b1, mesh_lib.shard_batch(batch, mesh1))

    mesh2 = mesh_lib.create_mesh(model_parallelism=2)
    p2 = mesh_lib.shard_params(jax.device_get(state.params), mesh2, min_size=MIN_SIZE)
    b2 = jax.device_put(
        jax.device_get(state.batch_stats), mesh_lib.replicated_sharding(mesh2)
    )
    out2 = jax.jit(eval_fn)(p2, b2, mesh_lib.shard_batch(batch, mesh2))

    np.testing.assert_allclose(
        np.asarray(out1["predictions"]), np.asarray(out2["predictions"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]), rtol=1e-5)


def test_dryrun_multichip_body_runs_in_suite():
    """In-suite guard for the driver's multichip gate: the dry-run body must
    keep running on the 8-virtual-device platform (the driver invokes it via
    __graft_entry__.dryrun_multichip, which self-provisions a subprocess)."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import __graft_entry__ as g

    g._dryrun_multichip_body(8)  # prints the mesh-OK line; raises on failure


def test_multislice_mesh_train_step_equals_replicated(rng):
    """Multi-slice simulation: a 2×2×2 ("dcn","data","model") mesh — batch
    sharded over (dcn, data), params over the model axis — must produce the
    same step as the flat replicated run (the gradient all-reduce combines
    the ICI and DCN hops; math unchanged)."""
    model, state, batch = _make_state_and_batch(rng)
    loss_obj = losses.CrossEntropyLoss()
    step_fn = step_lib.make_train_step(model, loss_obj, TCFG, MCFG, True)
    key = jax.random.key(0)

    mesh1 = mesh_lib.create_mesh()
    s1, m1 = jax.jit(step_fn)(
        jax.device_put(state, mesh_lib.replicated_sharding(mesh1)),
        mesh_lib.shard_batch(batch, mesh1),
        jax.device_put(key, mesh_lib.replicated_sharding(mesh1)),
    )

    mesh3 = mesh_lib.create_mesh(model_parallelism=2, dcn_parallelism=2)
    assert mesh3.axis_names == ("dcn", "data", "model")
    assert mesh3.devices.shape == (2, 2, 2)
    state3 = _shard_state(jax.device_get(state), mesh3)
    batch3 = mesh_lib.shard_batch(batch, mesh3)
    # batch axis spans dcn×data = 4 shards
    assert batch3["features"].sharding.spec == (("dcn", "data"),)
    key3 = jax.device_put(key, mesh_lib.replicated_sharding(mesh3))
    s3, m3 = jax.jit(step_fn)(state3, batch3, key3)

    chex.assert_trees_all_close(
        jax.device_get(s1.params), jax.device_get(s3.params),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m3["loss"]), rtol=1e-5)


def test_fast_infer_params_shard_over_model_axis(rng):
    """--fast_infer must honor --model_parallelism (round-2 verdict): the
    folded fast-param tree shards over the model axis via the same
    shard_params rule, and the jnp fast forward under GSPMD must equal the
    replicated run exactly (XLA inserts the collectives; math unchanged)."""
    from learnablepoolingmethods_tpu.ops.fast_infer import (
        build_fast_netvlad_inference,
        prepare_fast_params,
    )

    # full 1152-wide input so both modalities (NetVLAD_0/_1) exist
    fcfg = ModelConfig(
        vocab_size=20, iterations=6, netvlad_cluster_size=8,
        netvlad_hidden_size=16, moe_num_mixtures=2,
    )
    model = create_model("NetVLADModelLF", fcfg)
    feats_u8 = rng.integers(0, 256, size=(8, 6, 1152), dtype=np.uint8)
    nf = np.full((8,), 6, np.int32)
    x = step_lib.preprocess_input(np.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=np.asarray(nf), training=True,
    )
    fp_host = prepare_fast_params(variables, fcfg, compute_dtype=np.float32)
    fast = build_fast_netvlad_inference(
        fcfg, top_k=5, use_pallas=False, compute_dtype=np.float32
    )
    key = jax.random.key(2)

    mesh1 = mesh_lib.create_mesh()
    fp1 = jax.device_put(fp_host, mesh_lib.replicated_sharding(mesh1))
    v1, i1 = jax.jit(fast, static_argnames=("presampled",))(
        fp1,
        jax.device_put(feats_u8, mesh_lib.batch_sharding(mesh1)),
        jax.device_put(nf, mesh_lib.batch_sharding(mesh1)),
        key,
    )

    mesh2 = mesh_lib.create_mesh(model_parallelism=2)
    fp2 = mesh_lib.shard_params(fp_host, mesh2, min_size=MIN_SIZE)
    n_sharded = sum(
        any(s == mesh_lib.MODEL_AXIS for s in p.sharding.spec)
        for p in jax.tree.leaves(fp2)
    )
    assert n_sharded >= 1, "no fast param landed on the model axis (vacuous)"
    v2, i2 = jax.jit(fast, static_argnames=("presampled",))(
        fp2,
        jax.device_put(feats_u8, mesh_lib.batch_sharding(mesh2)),
        jax.device_put(nf, mesh_lib.batch_sharding(mesh2)),
        key,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_fused_adam_runs_sharded_and_matches_replicated():
    """--fused_adam on a 4x2 model-sharded mesh: the pure-XLA SR update
    shards with the params (GSPMD partitions the elementwise chain and the
    rbg dither), and the resulting params must match the fully-replicated
    1-D-mesh run of the identical step. rbg bits are NOT guaranteed
    position-stable across shardings, so the comparison runs the
    deterministic-rounding mode; a second sharded step in stochastic mode
    must at least execute and keep every leaf finite."""
    import dataclasses

    from learnablepoolingmethods_tpu import losses as losses_lib
    from learnablepoolingmethods_tpu.ops.fused_adam import FusedAdam

    rng = np.random.default_rng(5)
    mcfg = dataclasses.replace(MCFG, param_dtype="bfloat16")
    tcfg = dataclasses.replace(TCFG, fused_adam=True)
    model = create_model("NetVLADModelLF", mcfg)
    batch = {
        "features": rng.integers(0, 256, size=(8, 12, 24), dtype=np.uint8),
        "labels": (rng.uniform(size=(8, mcfg.vocab_size)) < 0.2).astype(np.float32),
        "num_frames": rng.integers(1, 13, size=(8,)).astype(np.int32),
        "weights": np.ones(8, np.float32),
    }
    params, bs = step_lib.init_model_variables(model, batch, frame_features=True)

    def run(mesh, stochastic):
        tx = FusedAdam(
            optimizers.learning_rate_schedule(tcfg),
            clip_norm=tcfg.clip_gradient_norm,
            stochastic=stochastic,
        )
        state = TrainState.create(params, bs, tx)
        state = _shard_state(state, mesh)
        rng_key = jax.device_put(
            jax.random.key(0), mesh_lib.replicated_sharding(mesh)
        )
        step = jax.jit(
            step_lib.make_train_step(
                model, losses_lib.CrossEntropyLoss(), tcfg, mcfg, True
            )
        )
        db = {
            k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
            for k, v in batch.items()
        }
        new_state, metrics = step(state, db, rng_key)
        return new_state, float(metrics["loss"])

    mesh_2d = mesh_lib.create_mesh(model_parallelism=2)
    mesh_1d = mesh_lib.create_mesh()
    sharded, loss_2d = run(mesh_2d, stochastic=False)
    repl, loss_1d = run(mesh_1d, stochastic=False)
    assert np.isfinite(loss_2d) and abs(loss_2d - loss_1d) < 1e-3
    for a, b in zip(
        jax.tree.leaves(sharded.params), jax.tree.leaves(repl.params)
    ):
        chex.assert_trees_all_close(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-2, rtol=2e-2,  # bf16 state + cross-sharding reduction order
        )

    # stochastic mode on the 2-D mesh: executes and stays finite
    sr_state, sr_loss = run(mesh_2d, stochastic=True)
    assert np.isfinite(sr_loss)
    for leaf in jax.tree.leaves(sr_state.params):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_assemble_local_predictions_dedups_model_replicas():
    """train.py's log-path shard assembly: on a (data, model) mesh a
    P('data')-sharded [B, V] array exposes each row block once PER
    model-axis device — a plain concatenation of addressable_shards
    duplicates rows (the bug this helper fixed).  The helper must return
    each row exactly once, in order, and also stitch a vocab-axis
    sharding along columns."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_lib.create_mesh(model_parallelism=2)  # (data=4, model=2)
    x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)

    rows_only = jax.device_put(x, NamedSharding(mesh, P("data")))
    # precondition: the naive concatenation really would duplicate rows
    assert len(rows_only.addressable_shards) == 8  # 4 row blocks × 2 replicas
    np.testing.assert_array_equal(mesh_lib.assemble_local_rows(rows_only), x)

    both_axes = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    np.testing.assert_array_equal(mesh_lib.assemble_local_rows(both_axes), x)

    replicated = jax.device_put(x, NamedSharding(mesh, P()))
    np.testing.assert_array_equal(mesh_lib.assemble_local_rows(replicated), x)
