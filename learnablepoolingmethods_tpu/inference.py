"""Inference entrypoint (ref: inference.py#main / #inference / #format_lines).

Streams input TFRecords through the jit'd forward + on-device top-k
(ops hot loop — the north-star throughput path) and writes the Kaggle
submission CSV ``VideoId,LabelConfidencePairs``.
"""

from __future__ import annotations

import time

import jax
import numpy as np
from absl import app, flags, logging

from learnablepoolingmethods_tpu import flags as lpm_flags
from learnablepoolingmethods_tpu.core import checkpoints as ckpt_lib
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib
# format_lines lives in utils/misc.py (flag-free import for tests/tools);
# re-exported here to keep the reference module surface
from learnablepoolingmethods_tpu.utils.misc import InFlight, format_lines

FLAGS = flags.FLAGS


def define_flags():
    flags.DEFINE_string("input_data_pattern", "", "File glob for input TFRecords.")
    flags.DEFINE_string("train_dir", "/tmp/yt8m_model/", "Checkpoint directory.")
    flags.DEFINE_string("output_file", "", "Destination CSV path.")
    flags.DEFINE_integer("top_k", 20, "How many predictions to write per video.")
    flags.DEFINE_bool(
        "fast_infer",
        False,
        "Use the fused inference path (BN folding, Pallas kernels, bf16) "
        "for every model with a registered fast path (ops/fast_dispatch.py: "
        "NetVLAD/DBoF/NetFV/NetRVLAD/SoftDbof/NeXtVLAD/Transformer/"
        "AttentionNetVLAD).",
    )
    lpm_flags.define_int8_hidden_flag()
    flags.DEFINE_string(
        "reference_checkpoint",
        "",
        "Run inference from a reference-trained TF checkpoint (TF1 Saver "
        "format) instead of --train_dir (core/checkpoint_import.py).",
    )
    flags.DEFINE_integer(
        "pipeline_depth",
        2,
        "Batches kept in flight before fetching results — overlaps host "
        "parse/format and transfers with device compute (1 = synchronous).",
    )
    lpm_flags.define_data_flags()
    lpm_flags.define_model_flags()
    lpm_flags.define_training_flags()


def inference(train_dir, data_pattern, out_file_location, batch_size, top_k):
    if jax.process_count() > 1:
        # single-controller by design (mirrors eval.py): the CSV writer and
        # plain device_put batch placement are not multi-process-aware
        raise RuntimeError(
            "inference runs single-process; launch it outside "
            f"jax.distributed (process_count={jax.process_count()})"
        )
    fcfg = lpm_flags.feature_config_from_flags()
    mcfg = lpm_flags.model_config_from_flags()
    model = create_model(FLAGS.model, mcfg)

    if FLAGS.reference_checkpoint:
        from learnablepoolingmethods_tpu.core import checkpoint_import

        tree = checkpoint_import.tree_from_reference_checkpoint(
            FLAGS.reference_checkpoint, FLAGS.model, mcfg, fcfg
        )
        logging.info("imported reference checkpoint %s", FLAGS.reference_checkpoint)
    else:
        mngr = ckpt_lib.CheckpointManager(train_dir)
        step_num = mngr.latest_step()
        if step_num is None:
            raise IOError(f"no checkpoint found in {train_dir}")
        tree = mngr.restore(step_num)
        logging.info("restored checkpoint at step %d", step_num)

    mesh = mesh_lib.create_mesh(
        model_parallelism=FLAGS.model_parallelism,
        dcn_parallelism=FLAGS.dcn_parallelism,
    )
    n_dev = int(np.prod(mesh.devices.shape))
    repl = mesh_lib.replicated_sharding(mesh)
    # honor --model_parallelism here too (review finding: a model trained
    # sharded because it outgrows one chip must not be replicated at eval)
    if FLAGS.model_parallelism > 1:
        params = mesh_lib.shard_params(tree["params"], mesh)
    else:
        params = jax.device_put(tree["params"], repl)
    batch_stats = jax.device_put(tree["batch_stats"], repl)

    if FLAGS.int8_hidden:
        from learnablepoolingmethods_tpu.ops.fast_dispatch import (
            int8_capable_models,
        )

        if not FLAGS.fast_infer or FLAGS.model not in int8_capable_models():
            raise ValueError(
                "--int8_hidden requires --fast_infer with one of "
                f"{int8_capable_models()}"
            )
    if FLAGS.fast_infer:
        variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
        # honor --model_parallelism on the fast tree too: a model sharded
        # because it outgrows one chip must not be silently replicated here.
        # shard_params replicates everything when the model axis is 1; the
        # Pallas kernels don't compose with GSPMD partitioning, so the
        # sharded configuration takes the identical-math jnp route.
        model_par = FLAGS.model_parallelism > 1
        place = (
            (lambda t: mesh_lib.shard_params(t, mesh)) if model_par
            else (lambda t: jax.device_put(t, repl))
        )
        use_pallas = jax.default_backend() == "tpu" and not model_par
        if model_par:
            logging.info(
                "--fast_infer with --model_parallelism=%d: fast params "
                "sharded over the model axis; Pallas kernels disabled "
                "(jnp path, identical math)", FLAGS.model_parallelism,
            )
        from learnablepoolingmethods_tpu.ops.fast_dispatch import (
            fast_path_models,
            get_fast_path,
        )

        path = get_fast_path(FLAGS.model)
        if path is None:
            raise ValueError(
                f"--fast_infer supports {fast_path_models()}, "
                f"got {FLAGS.model!r}"
            )
        if FLAGS.int8_hidden and model_par:
            raise ValueError(
                "--int8_hidden with --model_parallelism > 1 is not "
                "supported (int8 targets single-chip HBM; a sharded "
                "model already halves per-chip weight traffic)"
            )
        fp = place(
            path.prepare(variables, mcfg, int8_hidden=FLAGS.int8_hidden)
        )
        # Mosaic kernels need real TPU; elsewhere the identical jnp path
        fast = path.build(mcfg, top_k=top_k, use_pallas=use_pallas)
        fast_jit = jax.jit(fast, static_argnames=("presampled",))
        base_key = jax.random.key(0)

        def predict_step(params, batch_stats, feats, nf, rng):
            return fast_jit(fp, feats, nf, rng)

    else:
        base_key = jax.random.key(0)
        predict_step = jax.jit(
            step_lib.make_predict_step(model, mcfg, fcfg.frame_features, top_k=top_k)
        )

    from learnablepoolingmethods_tpu.data import native_loader

    use_native_csv = native_loader.is_available()
    pipe = InFlight(getattr(FLAGS, "pipeline_depth", 1))
    num_examples_processed = 0
    start_time = time.time()

    def flush_one(out_file, item):
        nonlocal num_examples_processed
        vids, real, values, indices = item
        # np.asarray blocks until the device results are ready
        vals_np, idx_np = np.asarray(values)[real], np.asarray(indices)[real]
        num_examples_processed += int(real.sum())
        if use_native_csv:
            # C formatter (native/csv_formatter.cc) — byte-identical to
            # format_lines, keeps the host side ahead of the device rate
            out_file.write(native_loader.format_csv(vids, vals_np, idx_np))
        else:
            out_file.writelines(
                line.encode() for line in format_lines(vids, vals_np, idx_np)
            )
        elapsed = time.time() - start_time
        logging.info(
            "num examples processed: %d | elapsed seconds: %.2f (%.1f ex/s)",
            num_examples_processed, elapsed,
            num_examples_processed / max(elapsed, 1e-9),
        )

    with open(out_file_location, "wb") as out_file:
        out_file.write(b"VideoId,LabelConfidencePairs\n")
        for batch_idx, batch in enumerate(
            lpm_flags.input_iterator(data_pattern, batch_size, num_epochs=1)
        ):
            batch = mesh_lib.pad_batch_to_multiple(batch, n_dev)
            # fresh sampling key per batch (reference samples new frames each
            # batch; advisor round-1 finding)
            rng_key = jax.random.fold_in(base_key, batch_idx)
            feats = jax.device_put(
                batch["features"], mesh_lib.batch_sharding(mesh)
            )
            nf = (
                jax.device_put(batch["num_frames"], mesh_lib.batch_sharding(mesh))
                if "num_frames" in batch
                else None
            )
            # dispatch is async: queue the result futures and only block on
            # them once `depth` batches are in flight — host parse/format of
            # batch i overlaps device compute of batches i+1..i+depth
            values, indices = predict_step(params, batch_stats, feats, nf, rng_key)
            w = np.asarray(batch["weights"])
            real = w > 0
            vids = [v for v, keep in zip(batch["video_id"], real) if keep]
            done = pipe.add((vids, real, values, indices))
            if done is not None:
                flush_one(out_file, done)
        for done in pipe.drain():
            flush_one(out_file, done)
    logging.info("done; wrote %s", out_file_location)


def main(unused_argv):
    logging.set_verbosity(logging.INFO)
    if not FLAGS.output_file:
        raise ValueError("'output_file' was not specified. Unable to continue with inference.")
    if not FLAGS.input_data_pattern:
        raise ValueError("'input_data_pattern' was not specified. Unable to continue with inference.")
    inference(
        FLAGS.train_dir,
        FLAGS.input_data_pattern,
        FLAGS.output_file,
        FLAGS.batch_size,
        FLAGS.top_k,
    )


define_flags()


def run():
    """Console-script entry point (``lpm-infer``, pyproject [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    app.run(main)
