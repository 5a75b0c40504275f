"""Train the full-Willow-dimension GAP-drill checkpoints ON THE TPU.

The fullshape drill (tests/integration/test_gap_parity_drill_fullshape.py)
needs checkpoints that have actually *trained* — e.g. the 285M-parameter
NetVLADModelLF at F=300/K=256/V=3862 with YT-8M-sparse labels stays at
chance GAP in the ~40 CPU steps a pytest run can afford (measured: 29 min of
CPU training → GAP 2.5e-5).  This tool trains the drill model/config on the
real chip (thousands of steps fit in seconds of device time), gates on a
non-vacuous train-set GAP, and exports the TF1-Saver checkpoint under
reference variable names (core/checkpoint_import.py#export_reference_layout,
ref lineage: train.py#build_graph variable scopes).

``--model`` selects the drill arm (NetVLADModelLF / DbofModel /
NetFVModelLF / NetRVLADModelLF — gap_drill_common.FULLSHAPE_MODEL_FLAGS);
all arms share one
fixture file.  The fixture spec and each checkpoint's model flags are
fingerprinted into the drill dir so a stale data+checkpoint pair is
rebuilt/refused rather than silently evaluated against the wrong spec.

The dataset stays DEVICE-RESIDENT (one 66 MB upload) and each step gathers
its batch rows on-device from a host-chosen index vector — dispatching raw
[B, 300, 1152] uint8 batches through the axon tunnel would move ~11 MB per
step and dominate the wall clock.

Usage (then run the pytest eval arms on CPU):

    python tools/drill_train_fullshape_tpu.py --dir /tmp/fullshape_drill \
        [--model NetVLADModelLF]
    LPM_FULL_SHAPE=1 LPM_DRILL_DIR=/tmp/fullshape_drill \
        python -m pytest tests/integration/test_gap_parity_drill_fullshape.py -q -s
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="drill dir (data + ckpt)")
    ap.add_argument(
        "--model", default="NetVLADModelLF",
        help="drill model (key of gap_drill_common.FULLSHAPE_MODEL_FLAGS)",
    )
    ap.add_argument(
        "--max_steps", type=int, default=None,
        help="default: FULLSHAPE_DIMS.train_steps",
    )
    ap.add_argument("--chunk", type=int, default=500, help="steps per GAP check")
    ap.add_argument("--gap_target", type=float, default=0.5)
    ap.add_argument(
        "--lr", type=float, default=None,
        help="default: FULLSHAPE_DIMS.train_lr (lr only affects how trained "
        "the checkpoint gets, not the parity semantics; the lr actually used "
        "is recorded in the docs/drill_runs/ record)",
    )
    ap.add_argument(
        "--export_anyway", action="store_true",
        help="export + exit 0 even if the GAP target is missed (the CPU eval "
        "stage would fail its non-vacuity asserts; default is to refuse)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"[trainer] devices: {jax.devices()}", flush=True)

    from tests.integration import gap_drill_common as gd

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.config import TrainingConfig
    from learnablepoolingmethods_tpu.core import checkpoint_import as ci
    from learnablepoolingmethods_tpu.core import optimizers
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.data import pipeline, readers
    from learnablepoolingmethods_tpu.models import create_model

    if args.model not in gd.FULLSHAPE_MODEL_FLAGS:
        ap.error(
            f"--model must be one of {sorted(gd.FULLSHAPE_MODEL_FLAGS)}, "
            f"got {args.model!r}"
        )
    dims = gd.fullshape_dims_for(args.model)
    if args.max_steps is None:
        args.max_steps = dims.train_steps
    if args.chunk < 1 or args.max_steps < args.chunk:
        ap.error(
            f"need max_steps >= chunk >= 1, got max_steps={args.max_steps} "
            f"chunk={args.chunk}"
        )

    os.makedirs(args.dir, exist_ok=True)
    data = os.path.join(args.dir, "val0.tfrecord")
    fixture_stale = gd.check_fingerprint(args.dir, "fixture", gd.FULLSHAPE_FIXTURE)
    if os.path.exists(data) and fixture_stale:
        print(f"[trainer] rebuilding fixture: {fixture_stale}", flush=True)
        os.remove(data)
    if not os.path.exists(data):
        t0 = time.time()
        gd.make_fullshape_fixture(data)
        gd.write_fingerprint(args.dir, "fixture", gd.FULLSHAPE_FIXTURE)
        print(f"[trainer] fixture {time.time() - t0:.0f}s", flush=True)

    # Load every video once through the real reader (identical parse to the
    # train CLI), then pin the whole set on device.
    reader = readers.YT8MFrameFeatureReader(
        num_classes=dims.v,
        feature_sizes=(dims.rgb, dims.aud),
        feature_names=("rgb", "audio"),
        max_frames=dims.maxf,
    )
    batches = pipeline.batch_iterator(
        reader, data, dims.n_videos, num_epochs=1, shuffle=False
    )
    full = next(batches)
    n = full["features"].shape[0]
    assert n == dims.n_videos, n
    feats = jax.device_put(full["features"])  # [N, F, D] uint8
    labels = jax.device_put(full["labels"].astype(np.float32))  # [N, V]
    nf = jax.device_put(full["num_frames"].astype(np.int32))  # [N]

    lr = dims.train_lr if args.lr is None else args.lr
    mcfg = gd.mcfg_for(dims)
    tcfg = TrainingConfig(batch_size=dims.train_batch, base_learning_rate=lr)
    model = create_model(args.model, mcfg)
    params, bs = step_lib.init_model_variables(
        model, {k: full[k] for k in ("features", "num_frames")},
        frame_features=True, seed=0,
    )
    state = TrainState.create(params, bs, optimizers.create_optimizer(tcfg))
    step = step_lib.make_train_step(
        model, losses.CrossEntropyLoss(), tcfg, mcfg, frame_features=True
    )

    # device-resident arrays as jit ARGUMENTS (never closure constants —
    # inlined constants blow the remote-compile payload, CLAUDE.md)
    def gstep(st, feats_a, labels_a, nf_a, idx, rng):
        batch = {
            "features": jnp.take(feats_a, idx, axis=0),
            "labels": jnp.take(labels_a, idx, axis=0),
            "num_frames": jnp.take(nf_a, idx, axis=0),
        }
        return step(st, batch, rng)

    gstep_j = jax.jit(gstep, donate_argnums=0)

    ct = jnp.dtype(mcfg.compute_dtype)

    def fwd(p, b, feats_a, nf_a):
        x = step_lib.preprocess_input(feats_a, ct)
        out = model.apply(
            {"params": p, "batch_stats": b}, x, training=False, num_frames=nf_a
        )
        return out["predictions"].astype(jnp.float32)

    fwd_j = jax.jit(fwd)

    labels_np = np.asarray(full["labels"], np.float32)
    rng = jax.random.key(0)
    host_rng = np.random.default_rng(0)
    b = dims.train_batch
    total = 0
    t0 = time.time()
    while total < args.max_steps:
        for _ in range(args.chunk):
            idx = jnp.asarray(
                host_rng.integers(0, n, size=(b,)).astype(np.int32)
            )
            state, metrics = gstep_j(state, feats, labels, nf, idx, rng)
        total += args.chunk
        loss = float(metrics["loss"])
        preds = np.asarray(fwd_j(state.params, state.batch_stats, feats, nf))
        gap = float(gd.tf_stack_metrics(dims, preds, labels_np)["gap"])
        print(
            f"[trainer] step {total}: loss {loss:.4f} train-GAP {gap:.4f} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        if not np.isfinite(loss):
            raise SystemExit(f"loss diverged at step {total}")
        if gap >= args.gap_target:
            break
    if gap < args.gap_target and not args.export_anyway:
        raise SystemExit(
            f"[trainer] GAP {gap:.4f} < target {args.gap_target} after "
            f"{total} steps — refusing to export (the CPU eval stage's "
            f"non-vacuity asserts would fail after ~35 min; pass "
            f"--export_anyway to override, or raise --max_steps / tune lr)"
        )

    params_host = jax.device_get(state.params)
    bs_host = jax.device_get(state.batch_stats)
    ref_vars = ci.export_reference_layout(params_host, bs_host, dims.v)
    ckpt = gd.save_reference_ckpt(
        ref_vars, os.path.join(args.dir, f"{args.model}.ckpt")
    )
    gd.write_fingerprint(args.dir, args.model, gd.fullshape_fingerprint(args.model))
    record = gd.record_drill_run(
        f"fullshape_train_{args.model}",
        {
            "train_gap": gap,
            "steps": total,
            "lr": lr,
            "final_loss": loss,
            "seconds": round(time.time() - t0, 1),
            "gap_target": args.gap_target,
        },
    )
    print(
        f"[trainer] exported {ckpt} (train-GAP {gap:.4f}); recorded {record}",
        flush=True,
    )


if __name__ == "__main__":
    main()
