"""Eval entrypoint (ref: eval.py#main / #evaluation_loop).

Restores the latest checkpoint from ``--train_dir``, streams the validation
records once, and reports epoch GAP / Hit@1 / PERR / loss.  Two paths:

- default: reference-parity accumulator (host ``EvaluationMetrics``, exact
  heap/tie-break semantics, includes per-class APs);
- ``--fast_eval``: on-device partials (top-k, Hit@1, PERR inside jit;
  SURVEY.md §5.5) + one vectorized host sort per epoch.

``--run_once`` evaluates once; otherwise polls for new checkpoints like the
reference's evaluation loop.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags, logging

from learnablepoolingmethods_tpu import flags as lpm_flags
from learnablepoolingmethods_tpu.core import checkpoints as ckpt_lib
from learnablepoolingmethods_tpu.core import observability
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.metrics import eval_util
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib
from learnablepoolingmethods_tpu.utils.misc import InFlight

FLAGS = flags.FLAGS


def define_flags():
    flags.DEFINE_string("eval_data_pattern", "", "File glob for eval TFRecords.")
    flags.DEFINE_string("train_dir", "/tmp/yt8m_model/", "Checkpoint directory.")
    flags.DEFINE_bool("run_once", False, "Evaluate once instead of polling.")
    flags.DEFINE_integer("top_k", 20, "How many predictions to keep per video.")
    flags.DEFINE_bool(
        "fast_eval", False, "Use on-device metric partials (no per-class APs)."
    )
    flags.DEFINE_bool(
        "fast_forward",
        False,
        "Run the BN-folded fused forward (Pallas on TPU) instead of the "
        "flax model — every model with a registered fast path "
        "(ops/fast_dispatch.py: NetVLAD/DBoF/NetFV/NetRVLAD/SoftDbof/"
        "NeXtVLAD/Transformer/AttentionNetVLAD).",
    )
    lpm_flags.define_int8_hidden_flag()
    flags.DEFINE_integer(
        "poll_interval_secs", 30, "Seconds between checkpoint polls."
    )
    flags.DEFINE_string(
        "reference_checkpoint",
        "",
        "Evaluate a reference-trained TF checkpoint (TF1 Saver format) "
        "instead of polling --train_dir (core/checkpoint_import.py).",
    )
    flags.DEFINE_integer(
        "pipeline_depth",
        2,
        "Batches kept in flight before fetching results — overlaps the host "
        "metric accumulation and transfers with device compute.",
    )
    lpm_flags.define_data_flags()
    lpm_flags.define_model_flags()
    lpm_flags.define_training_flags()


def evaluate_checkpoint(step_num, tree, model, loss_obj, fcfg, mcfg):
    if jax.process_count() > 1:
        # eval is single-controller by design (the reference's eval.py is a
        # single machine); its host-side metric accumulation and plain
        # device_put batch placement are not multi-process-aware — running
        # it under jax.distributed would silently drop data (the train
        # path's put_batch_global fix does not apply to the host-side
        # accumulator).  Fail loudly instead.
        raise RuntimeError(
            "eval runs single-process; launch it outside jax.distributed "
            f"(process_count={jax.process_count()})"
        )
    mesh = mesh_lib.create_mesh(
        model_parallelism=FLAGS.model_parallelism,
        dcn_parallelism=FLAGS.dcn_parallelism,
    )
    n_dev = np.prod(mesh.devices.shape)
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

        if not FLAGS.fast_forward or FLAGS.model not in int8_capable_models():
            raise ValueError(
                "--int8_hidden requires --fast_forward with one of "
                f"{int8_capable_models()}"
            )
    if FLAGS.fast_forward:
        from learnablepoolingmethods_tpu.ops import metrics_ops

        variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
        # honor --model_parallelism on the fast tree (mirrors inference.py):
        # shard the folded weights over the model axis and take the
        # identical-math jnp route (Pallas doesn't compose with GSPMD).
        model_par = FLAGS.model_parallelism > 1
        place = (
            (lambda t: mesh_lib.shard_params(t, mesh)) if model_par
            else (lambda t: jax.device_put(t, repl))
        )
        use_pallas = jax.default_backend() == "tpu" and not model_par
        from learnablepoolingmethods_tpu.ops.fast_dispatch import (
            fast_path_models,
            get_fast_path,
        )

        path = get_fast_path(FLAGS.model)
        if path is None:
            raise ValueError(
                f"--fast_forward supports {fast_path_models()}, "
                f"got {FLAGS.model!r}"
            )
        if FLAGS.int8_hidden and model_par:
            raise ValueError(
                "--int8_hidden with --model_parallelism > 1 is not "
                "supported (see inference.py)"
            )
        fp = place(
            path.prepare(variables, mcfg, int8_hidden=FLAGS.int8_hidden)
        )
        fast_fwd = path.build(mcfg, use_pallas=use_pallas, return_probs=True)

        def _fast_eval_step(fp, params, batch_stats, batch, rng=None):
            # fp is an ARGUMENT, never a closure constant: closed-over
            # weight trees inline into the HLO and blow the remote-compile
            # payload (CLAUDE.md environment rules; HTTP 413)
            predictions = fast_fwd(
                fp,
                batch["features"],
                batch["num_frames"],
                rng if rng is not None else jax.random.key(0),
            ).astype(jnp.float32)
            labels = batch["labels"].astype(jnp.float32)
            weights = batch["weights"]
            per_ex = loss_obj.calculate_per_example_loss(predictions, labels)
            loss = step_lib.weighted_mean(per_ex, weights)
            partials = metrics_ops.batch_topk_partials(
                predictions, labels, weights, top_k=FLAGS.top_k
            )
            return {"predictions": predictions, "loss": loss, "partials": partials}

        _fast_jit = jax.jit(_fast_eval_step)

        def eval_step(params, batch_stats, batch, rng=None):
            return _fast_jit(fp, params, batch_stats, batch, rng)
    else:
        eval_step = jax.jit(
            step_lib.make_eval_step(
                model, loss_obj, mcfg, fcfg.frame_features, top_k=FLAGS.top_k
            )
        )

    use_fast = FLAGS.fast_eval
    if use_fast:
        sgap = eval_util.StreamingGAP()
        hit_sum = perr_sum = loss_sum = w_sum = 0.0
    else:
        em = eval_util.EvaluationMetrics(mcfg.vocab_size, FLAGS.top_k)

    examples = 0
    t0 = time.time()
    base_key = jax.random.key(0)
    pipe = InFlight(getattr(FLAGS, "pipeline_depth", 1))

    def accumulate_one(item):
        nonlocal examples, hit_sum, perr_sum, loss_sum, w_sum
        w, labels_host, out = item
        real = int(w.sum())
        examples += real
        if use_fast:
            p = out["partials"]
            sgap.accumulate(
                np.asarray(p.topk_scores)[w > 0],
                np.asarray(p.topk_labels)[w > 0],
                float(p.num_positives),
            )
            hit_sum += float(p.hit_at_one_sum)
            perr_sum += float(p.perr_sum)
            loss_sum += float(out["loss"]) * real
            w_sum += real
        else:
            preds = np.asarray(out["predictions"])[w > 0]
            em.accumulate(preds, labels_host[w > 0], float(out["loss"]))

    for batch_idx, batch in enumerate(
        lpm_flags.input_iterator(
            FLAGS.eval_data_pattern, FLAGS.batch_size, num_epochs=1
        )
    ):
        batch = mesh_lib.pad_batch_to_multiple(batch, n_dev)
        device_batch = {
            k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
            for k, v in batch.items()
            if k != "video_id"
        }
        # fresh sampling key per batch (advisor round-1 finding); dispatch is
        # async — block on results only once `depth` batches are in flight,
        # so host metric accumulation overlaps device compute
        out = eval_step(
            params, batch_stats, device_batch, jax.random.fold_in(base_key, batch_idx)
        )
        done = pipe.add((np.asarray(batch["weights"]), batch["labels"], out))
        if done is not None:
            accumulate_one(done)
    for done in pipe.drain():
        accumulate_one(done)

    dt = time.time() - t0
    if use_fast:
        info = {
            "avg_hit_at_one": hit_sum / max(w_sum, 1),
            "avg_perr": perr_sum / max(w_sum, 1),
            "avg_loss": loss_sum / max(w_sum, 1),
            "gap": sgap.get(),
            "aps": None,
        }
    else:
        info = em.get()
    logging.info(
        "epoch/eval number %d | Avg_Hit@1: %.5f | Avg_PERR: %.5f | MAP: %s | "
        "GAP: %.5f | Avg_Loss: %.5f | %d examples in %.1fs (%.1f ex/s)",
        step_num,
        info["avg_hit_at_one"],
        info["avg_perr"],
        "%.5f" % float(np.mean([a for a in info["aps"]])) if info["aps"] else "n/a",
        info["gap"],
        info["avg_loss"],
        examples,
        dt,
        examples / max(dt, 1e-9),
    )
    return info


def evaluation_loop():
    fcfg = lpm_flags.feature_config_from_flags()
    mcfg = lpm_flags.model_config_from_flags()
    model = create_model(FLAGS.model, mcfg)
    loss_obj = lpm_flags.get_loss_by_name(FLAGS.label_loss)

    if FLAGS.reference_checkpoint:
        from learnablepoolingmethods_tpu.core import checkpoint_import

        tree = checkpoint_import.tree_from_reference_checkpoint(
            FLAGS.reference_checkpoint, FLAGS.model, mcfg, fcfg
        )
        logging.info("imported reference checkpoint %s", FLAGS.reference_checkpoint)
        return evaluate_checkpoint(0, tree, model, loss_obj, fcfg, mcfg)

    mngr = ckpt_lib.CheckpointManager(FLAGS.train_dir)
    writer = observability.MetricWriter(FLAGS.train_dir + "/eval")
    last_step = None
    while True:
        step_num = mngr.latest_step()
        if step_num is None:
            logging.info("No checkpoint yet in %s", FLAGS.train_dir)
        elif step_num != last_step:
            tree = mngr.restore(step_num)
            info = evaluate_checkpoint(
                step_num, tree, model, loss_obj, fcfg, mcfg
            )
            writer.epoch_summary(step_num, info)
            writer.flush()
            last_step = step_num
            if FLAGS.run_once:
                return info
        if FLAGS.run_once:
            return None
        time.sleep(FLAGS.poll_interval_secs)


def main(unused_argv):
    logging.set_verbosity(logging.INFO)
    evaluation_loop()


define_flags()


def run():
    """Console-script entry point (``lpm-eval``, pyproject [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    app.run(main)
