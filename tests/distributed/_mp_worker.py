"""Worker for the two-process ``jax.distributed`` test (test_multiprocess.py).

argv: <pid> <port> <data_pattern> <cache_dir> <out_dir>

Each of the two workers runs on a 4-virtual-CPU-device platform (env set by
the launcher), joins the cluster via ``parallel/mesh.py#distributed_init``,
resolves the packed cache the way flags.py#input_iterator does in
multi-process mode (process 0 builds, the rest block in
``packed_cache.wait_for_cache``), iterates its OWN shard of the data
(shard_by_process), and runs 3 sharded train steps over the 8-device global
mesh.  Final replicated params are serialized to out_dir/params_<pid>.msgpack
for the parent to compare — across processes (must be bit-identical) and
against a single-process 8-device replay of the same global batches.
"""

import sys


V, RGB, AUD, MAXF = 6, 8, 4, 5
LOCAL_BATCH = 8
STEPS = 3
RESUME_STEPS = 5


def model_setup():
    from learnablepoolingmethods_tpu.config import ModelConfig, TrainingConfig
    from learnablepoolingmethods_tpu.models import create_model

    mcfg = ModelConfig(vocab_size=V)
    # batch_size is the GLOBAL batch (drives the lr-decay schedule)
    tcfg = TrainingConfig(batch_size=2 * LOCAL_BATCH, base_learning_rate=0.05)
    return create_model("FrameLevelLogisticModel", mcfg), mcfg, tcfg


def run_steps(model, mcfg, tcfg, mesh, batches, put_fn):
    import jax
    import numpy as np

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.core import optimizers, step as step_lib
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib

    first = batches[0]
    params, batch_stats = step_lib.init_model_variables(
        model, first, frame_features=True, seed=0
    )
    state = TrainState.create(params, batch_stats, optimizers.create_optimizer(tcfg))
    repl = mesh_lib.replicated_sharding(mesh)
    # multi-process: device_put onto a global sharding accepts HOST arrays
    # only (committed jax.Arrays raise "must represent addressable devices"),
    # and key arrays must be created inside jit with an out_sharding
    state = jax.device_put(jax.tree.map(np.asarray, state), repl)
    rng = jax.jit(lambda: jax.random.key(0), out_shardings=repl)()
    step = jax.jit(
        step_lib.make_train_step(
            model, losses.CrossEntropyLoss(), tcfg, mcfg, frame_features=True
        ),
        donate_argnums=0,
    )
    losses_seen = []
    for b in batches:
        state, metrics = step(state, put_fn(b), rng)
        losses_seen.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses_seen), losses_seen
    return jax.device_get(state.params), losses_seen


def _materialize_packed_batches(pid, data_pattern, cache_dir, n_steps):
    """The flags.py#input_iterator multi-process protocol (0 builds, 1 waits)
    followed by a deterministic per-process shard stream."""
    import jax

    from learnablepoolingmethods_tpu.data import packed_cache

    if pid == 0:
        cache = packed_cache.build_cache(
            data_pattern, cache_dir, frame_level=True,
            feature_sizes=(RGB, AUD), feature_names=("rgb", "audio"),
            num_classes=V, max_frames=MAXF, num_workers=1,
        )
    else:
        cache = packed_cache.wait_for_cache(cache_dir, data_pattern, timeout_s=300)

    it = packed_cache.packed_batch_iterator(
        cache, LOCAL_BATCH, num_epochs=n_steps, shuffle=False,
        shard_index=jax.process_index(), num_shards=jax.process_count(),
    )
    batches = []
    for b in it:
        batches.append({k: v for k, v in b.items() if k != "video_id"})
        if len(batches) == n_steps:
            break
    assert len(batches) == n_steps
    return batches


def run_resume(pid, data_pattern, cache_dir, out_dir, ckpt_dir, crash_at):
    """Crash-resume drill body (ref: tf.train.Supervisor crash-restart,
    SURVEY.md §5.3): every step is orbax-checkpointed by ALL processes
    (synchronous save ends in a cross-process barrier, so when any worker's
    ``save`` returns the checkpoint is committed globally); with
    ``crash_at >= 0`` worker 1 SIGKILLs itself right after that step's save
    returns — no cleanup, no coordination, exactly how a preempted worker
    dies.  On restart the same entrypoint restores the latest committed
    step and continues from the matching batch index."""
    import os
    import signal

    import flax.serialization
    import jax
    import numpy as np

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.core import checkpoints as ckpt_lib
    from learnablepoolingmethods_tpu.core import optimizers, step as step_lib
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib

    batches = _materialize_packed_batches(pid, data_pattern, cache_dir, RESUME_STEPS)
    model, mcfg, tcfg = model_setup()
    mesh = mesh_lib.create_mesh()
    repl = mesh_lib.replicated_sharding(mesh)

    params, batch_stats = step_lib.init_model_variables(
        model, batches[0], frame_features=True, seed=0
    )
    tx = optimizers.create_optimizer(tcfg)
    state = TrainState.create(params, batch_stats, tx)
    mngr = ckpt_lib.CheckpointManager(ckpt_dir)
    host_tree = jax.device_get(ckpt_lib.state_to_tree(state))
    restored = mngr.restore_latest(ckpt_lib.abstract_like(host_tree))
    if restored is not None:
        state = ckpt_lib.tree_to_state(restored, tx)
    start = int(np.asarray(jax.device_get(state.step)))
    state = jax.device_put(jax.tree.map(np.asarray, state), repl)
    rng = jax.jit(lambda: jax.random.key(0), out_shardings=repl)()
    step = jax.jit(
        step_lib.make_train_step(
            model, losses.CrossEntropyLoss(), tcfg, mcfg, frame_features=True
        ),
        donate_argnums=0,
    )

    def put(b):
        b = mesh_lib.pad_batch_to_multiple(b, jax.device_count())
        return mesh_lib.put_batch_global(b, mesh)

    for i in range(start, RESUME_STEPS):
        state, metrics = step(state, put(batches[i]), rng)
        assert np.isfinite(float(metrics["loss"]))
        step_num = int(np.asarray(jax.device_get(state.step)))
        assert step_num == i + 1, (step_num, i)
        mngr.save(step_num, jax.device_get(ckpt_lib.state_to_tree(state)))
        if pid == 1 and crash_at == step_num:
            os.kill(os.getpid(), signal.SIGKILL)
    mngr.close()
    params = jax.device_get(state.params)
    with open(os.path.join(out_dir, f"params_{pid}.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    print(f"worker {pid} resume OK start={start}", flush=True)


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    data_pattern, cache_dir, out_dir = sys.argv[3], sys.argv[4], sys.argv[5]
    source = sys.argv[6] if len(sys.argv) > 6 else "packed"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib

    mesh_lib.distributed_init(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    import os

    import flax.serialization
    import numpy as np

    if source == "resume":
        run_resume(
            pid, data_pattern, cache_dir, out_dir, sys.argv[7], int(sys.argv[8])
        )
        return

    if source == "grain":
        # grain's ShardByJaxProcess path (flags.py#input_iterator
        # shard_by_process=True under --use_grain)
        from learnablepoolingmethods_tpu.data.grain_pipeline import (
            grain_batch_iterator,
        )

        batches, ids = [], []
        for b in grain_batch_iterator(
            data_pattern, LOCAL_BATCH, frame_level=True, num_epochs=1,
            shuffle=False, shard_by_process=True,
            feature_sizes=(RGB, AUD), feature_names=("rgb", "audio"),
            num_classes=V, max_frames=MAXF,
        ):
            ids.extend(
                v.decode() if isinstance(v, bytes) else str(v)
                for v in b["video_id"]
            )
            batches.append({k: v for k, v in b.items() if k != "video_id"})
        with open(os.path.join(out_dir, f"ids_{pid}.txt"), "w") as f:
            f.write("\n".join(ids))
        # execution coverage: run the sharded steps on this source too
        batches = batches[:STEPS] * ((STEPS // max(len(batches), 1)) + 1)
        batches = batches[:STEPS]
    else:
        batches = _materialize_packed_batches(pid, data_pattern, cache_dir, STEPS)
    assert len(batches) == STEPS

    model, mcfg, tcfg = model_setup()
    mesh = mesh_lib.create_mesh()

    def put(b):
        b = mesh_lib.pad_batch_to_multiple(b, jax.device_count())
        return mesh_lib.put_batch_global(b, mesh)

    params, losses_seen = run_steps(model, mcfg, tcfg, mesh, batches, put)
    with open(os.path.join(out_dir, f"params_{pid}.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    np.save(os.path.join(out_dir, f"losses_{pid}.npy"), np.asarray(losses_seen))
    print(f"worker {pid} OK losses={losses_seen}", flush=True)


if __name__ == "__main__":
    main()
