"""Train entrypoint (ref: train.py#main / #Trainer.run / #build_graph).

Flag-compatible with the reference:

    python -m learnablepoolingmethods_tpu.train \
        --model=NetVLADModelLF --frame_features=True \
        --feature_names="rgb,audio" --feature_sizes="1024,128" \
        --train_data_pattern='gs://.../train*.tfrecord' --train_dir=/tmp/model

Architecture (TPU-native, SURVEY.md §7): host reader threads → fixed-shape
uint8 batches → one fused jit program per step (device dequantize +
ℓ2-normalize + forward + backward + per-leaf clip + update) over a
``jax.sharding`` data mesh; gradients all-reduce over ICI via GSPMD.  The
reference's parameter-server/Supervisor machinery collapses into orbax
checkpoint/resume + synchronous data parallelism (SURVEY.md §2.4, §5.4).
"""

from __future__ import annotations

import os
import shutil
import time

import jax
import numpy as np
from absl import app, flags, logging

from learnablepoolingmethods_tpu import flags as lpm_flags
from learnablepoolingmethods_tpu.core import checkpoints as ckpt_lib
from learnablepoolingmethods_tpu.core import observability
from learnablepoolingmethods_tpu.core import optimizers, step as step_lib
from learnablepoolingmethods_tpu.core.train_state import TrainState
from learnablepoolingmethods_tpu.data import pipeline
from learnablepoolingmethods_tpu.metrics import eval_util
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib

FLAGS = flags.FLAGS


def define_flags():
    flags.DEFINE_string(
        "train_data_pattern", "", "File glob for the training TFRecords."
    )
    flags.DEFINE_string("train_dir", "/tmp/yt8m_model/", "Model/checkpoint dir.")
    flags.DEFINE_bool(
        "start_new_model",
        False,
        "If set, wipe train_dir and train from scratch (ref: --start_new_model).",
    )
    flags.DEFINE_integer("shuffle_buffer", 1024, "Shuffle buffer size.")
    flags.DEFINE_string(
        "profile_dir", "", "If set, capture a jax.profiler trace here."
    )
    flags.DEFINE_bool(
        "use_native_reader",
        False,
        "Parse TFRecords with the C++ loader on a thread pool "
        "(--num_readers workers) instead of the Python reader.",
    )
    lpm_flags.define_data_flags()
    lpm_flags.define_model_flags()
    lpm_flags.define_training_flags()


class Trainer:
    """Single-controller trainer (ref: train.py#Trainer)."""

    def __init__(self, train_dir: str):
        self.train_dir = train_dir

    def run(self):
        fcfg = lpm_flags.feature_config_from_flags()
        mcfg = lpm_flags.model_config_from_flags()
        tcfg = lpm_flags.training_config_from_flags()
        if tcfg.presample_frames:
            import dataclasses

            # the train step gathers sampled uint8 frames itself; the model
            # skips its internal sampling (config.py#presampled)
            mcfg = dataclasses.replace(mcfg, presampled=True)
        reader = lpm_flags.make_reader(fcfg, mcfg.vocab_size)
        model = create_model(FLAGS.model, mcfg)
        loss_obj = lpm_flags.get_loss_by_name(tcfg.label_loss)
        tx = optimizers.create_optimizer(tcfg)
        lr_schedule = optimizers.learning_rate_schedule(tcfg)

        if FLAGS.start_new_model and os.path.exists(self.train_dir):
            logging.info("%s: removing existing train dir", task_as_string())
            shutil.rmtree(self.train_dir)
        os.makedirs(self.train_dir, exist_ok=True)

        devices = jax.devices()
        mesh = mesh_lib.create_mesh(
            devices,
            model_parallelism=FLAGS.model_parallelism,
            dcn_parallelism=FLAGS.dcn_parallelism,
        )
        n_dev = len(devices)
        logging.info(
            "%s: mesh %s over %d %s device(s)", task_as_string(),
            dict(zip(mesh.axis_names, mesh.devices.shape)), n_dev,
            devices[0].platform,
        )

        num_epochs = tcfg.num_epochs if tcfg.num_epochs > 0 else None
        n_sources = sum(
            bool(x)
            for x in (FLAGS.use_grain, FLAGS.use_native_reader, FLAGS.packed_cache_dir)
        )
        if n_sources > 1:
            raise ValueError(
                "--use_grain, --use_native_reader and --packed_cache_dir are "
                "mutually exclusive input sources"
            )
        if FLAGS.use_grain or FLAGS.packed_cache_dir:
            batches = lpm_flags.input_iterator(
                FLAGS.train_data_pattern,
                tcfg.batch_size,
                num_epochs=num_epochs,
                shuffle=True,
                seed=FLAGS.seed,
                shard_by_process=True,
            )
        elif FLAGS.use_native_reader:
            batches = pipeline.native_batch_iterator(
                FLAGS.train_data_pattern,
                tcfg.batch_size,
                frame_level=fcfg.frame_features,
                feature_sizes=fcfg.feature_sizes,
                feature_names=fcfg.feature_names,
                num_classes=mcfg.vocab_size,
                max_frames=fcfg.max_frames,
                num_epochs=num_epochs,
                shuffle=True,
                seed=FLAGS.seed + jax.process_index(),
                num_workers=FLAGS.num_readers,
                shard_index=jax.process_index(),
                num_shards=jax.process_count(),
            )
        else:
            batches = pipeline.batch_iterator(
                reader,
                FLAGS.train_data_pattern,
                tcfg.batch_size,
                num_epochs=num_epochs,
                shuffle=True,
                shuffle_buffer=FLAGS.shuffle_buffer,
                seed=FLAGS.seed + jax.process_index(),
                shard_index=jax.process_index(),
                num_shards=jax.process_count(),
            )
        try:
            first_batch = next(batches)
        except StopIteration:
            raise IOError("training data pattern matched no records")

        params, batch_stats = step_lib.init_model_variables(
            model, first_batch, fcfg.frame_features, seed=FLAGS.seed
        )
        state = TrainState.create(params, batch_stats, tx)

        keep = tcfg.keep_checkpoint_max if tcfg.keep_checkpoint_max > 0 else None
        mngr = ckpt_lib.CheckpointManager(self.train_dir, keep=keep)
        restored = mngr.restore_latest(
            ckpt_lib.abstract_like(ckpt_lib.state_to_tree(state))
        )
        if restored is not None:
            state = ckpt_lib.tree_to_state(restored, tx)
            logging.info(
                "%s: restored checkpoint at step %d",
                task_as_string(),
                int(state.step),
            )

        repl = mesh_lib.replicated_sharding(mesh)
        if jax.process_count() > 1:
            # multi-process: placement onto a global (partly non-addressable)
            # sharding accepts HOST arrays only — committed jax.Arrays raise
            # "must represent addressable devices"
            state = jax.tree.map(np.asarray, state)
        if FLAGS.model_parallelism > 1:
            # shard the large matrices' output axis over the model axis.
            # The optimizer state goes through the SAME rule: its big leaves
            # (Adam moments, the fp32 master) mirror the params — pinning
            # them replicated would put the full fp32 optimizer copy of the
            # 285M-param hidden FC on every chip, defeating the flag.
            state = state.replace(
                params=mesh_lib.shard_params(state.params, mesh),
                batch_stats=jax.device_put(state.batch_stats, repl),
                opt_state=mesh_lib.shard_params(state.opt_state, mesh),
                step=jax.device_put(state.step, repl),
            )
        else:
            state = jax.device_put(state, repl)
        if jax.process_count() > 1:
            # key arrays can't be device_put onto a global sharding; create
            # the (identical) key inside an SPMD computation instead
            rng = jax.jit(
                lambda: jax.random.key(FLAGS.seed), out_shardings=repl
            )()
        else:
            rng = jax.device_put(jax.random.key(FLAGS.seed), repl)

        train_step = jax.jit(
            step_lib.make_train_step(model, loss_obj, tcfg, mcfg, fcfg.frame_features),
            donate_argnums=0,
        )

        def put(batch):
            batch = mesh_lib.pad_batch_to_multiple(batch, n_dev)
            return mesh_lib.put_batch_global(
                {k: v for k, v in batch.items() if k != "video_id"}, mesh
            )

        writer = observability.MetricWriter(self.train_dir)
        log_every = max(FLAGS.log_every_n_steps, 1)
        last_log_time, last_log_step = time.time(), int(state.step)
        if FLAGS.profile_dir:
            jax.profiler.start_trace(FLAGS.profile_dir)
        batch = first_batch
        metrics = None
        labels_for_log = None
        # Host-side step counter: reading int(state.step) inside the loop
        # would block on the step just dispatched (async dispatch means the
        # donated state materializes only when the device finishes), stalling
        # the device through every host-side put()/log pass.  The counter is
        # seeded from the restored state once and advances in lockstep with
        # the device increment (state.apply_gradients adds exactly 1).
        step_num = int(state.step)
        # Pipeline-depth bound: without any sync between log/checkpoint
        # intervals, the host can dispatch arbitrarily far ahead and every
        # queued device_batch holds HBM (~1.4 GB at B=4096 uint8 frames) on
        # configs already near the OOM line.  Blocking on the PREVIOUS step's
        # loss scalar before dispatching the next step caps in-flight steps
        # at two (dispatch N while N-1 executes) at the cost of one cheap
        # scalar D2H per iteration.
        prev_loss = None
        while True:
            if tcfg.max_steps and step_num >= tcfg.max_steps:
                break
            device_batch = put(batch)
            labels_for_log = batch["labels"]
            if prev_loss is not None:
                jax.block_until_ready(prev_loss)
            state, metrics = train_step(state, device_batch, rng)
            prev_loss = metrics["loss"]
            step_num += 1

            if step_num % log_every == 0:
                loss_val = float(metrics["loss"])
                preds_arr = metrics["predictions"]
                if jax.process_count() > 1:
                    # the global predictions array is not fully addressable;
                    # this process's shards are exactly its own input rows
                    # (put_batch_global concatenation order), each
                    # replicated across any model axis
                    preds_np = mesh_lib.assemble_local_rows(preds_arr)
                else:
                    preds_np = np.asarray(preds_arr)
                preds = preds_np[: labels_for_log.shape[0]]
                gap = eval_util.calculate_gap(preds, labels_for_log)
                hit1 = eval_util.calculate_hit_at_one(preds, labels_for_log)
                perr = eval_util.calculate_precision_at_equal_recall_rate(
                    preds, labels_for_log
                )
                now = time.time()
                eps = (
                    (step_num - last_log_step)
                    * tcfg.batch_size
                    / max(now - last_log_time, 1e-9)
                )
                last_log_time, last_log_step = now, step_num
                logging.info(
                    "%s: training step %d | Loss: %.4f Hit@1: %.4f PERR: %.4f "
                    "GAP: %.4f | %.1f examples/sec | lr %.6f",
                    task_as_string(), step_num, loss_val, hit1, perr, gap, eps,
                    float(lr_schedule(step_num)),
                )
                writer.global_step_summary(step_num, hit1, perr, gap, loss_val, eps)

            if step_num % tcfg.save_checkpoint_every_n_steps == 0:
                # The save blocks on the state anyway; verify the host
                # counter is still in lockstep with the device step so a
                # future train_step variant that skips/repeats the increment
                # fails loudly instead of misnumbering checkpoints.
                device_step = int(state.step)
                if device_step != step_num:
                    raise AssertionError(
                        f"host step counter {step_num} drifted from device "
                        f"state.step {device_step}; train_step must "
                        "increment step by exactly 1"
                    )
                mngr.save(step_num, ckpt_lib.state_to_tree(state))
                logging.info("%s: saved checkpoint at step %d", task_as_string(), step_num)

            if tcfg.export_model_steps and step_num % tcfg.export_model_steps == 0:
                self._export(step_num, state, mcfg, fcfg)

            try:
                batch = next(batches)
            except StopIteration:
                break

        if FLAGS.profile_dir:
            jax.profiler.stop_trace()
            logging.info("%s: profiler trace in %s", task_as_string(), FLAGS.profile_dir)
        final_step = int(state.step)
        mngr.save(final_step, ckpt_lib.state_to_tree(state))
        logging.info("%s: done; final checkpoint at step %d", task_as_string(), final_step)
        writer.flush()
        mngr.close()
        return state

    def _export(self, step_num, state, mcfg, fcfg):
        from learnablepoolingmethods_tpu import export_model as export_lib

        export_dir = os.path.join(
            self.train_dir, "export", f"step_{step_num}"
        )
        export_lib.export_model(
            export_dir,
            FLAGS.model,
            mcfg,
            fcfg,
            jax.device_get(state.params),
            jax.device_get(state.batch_stats),
        )
        logging.info("%s: exported model to %s", task_as_string(), export_dir)


def task_as_string():
    return f"/job:master/task:{jax.process_index()}"


def main(unused_argv):
    logging.set_verbosity(logging.INFO)
    logging.info("%s: JAX version: %s", task_as_string(), jax.__version__)
    Trainer(FLAGS.train_dir).run()


define_flags()


def run():
    """Console-script entry point (``lpm-train``, pyproject [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    app.run(main)
