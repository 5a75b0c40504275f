"""Training-semantics parity spot-check at FULL Willow dimensions.

The toy-dim drill (test_train_parity_drill.py) measures the training-stack
semantics (TF1 Adam ε placement, slim BN 0.999 updates, per-tensor clip,
reg scaling) at MAXF=10/K=8/hidden=16/V=32.  This spot-check re-runs the
identical captured-batch protocol at the production shape — F=300, K=256,
hidden=1024, V=3862, the 285M-parameter NetVLADModelLF — where the hidden
FC accumulates ~2000×-longer dot products, to confirm the step-1 rel-Δloss
stays at the f32 linalg-stack floor at real width and the short trajectory
tracks (round-4 verdict weak #6).

Five steps at B=16 keep the two CPU stacks tractable (~285M params × 3 Adam
slots × 2 stacks ≈ 7 GB, a few s/step); the toy drill remains the
trajectory/final-GAP oracle — this arm pins the widths.

Reuses the fullshape drill fixture (LPM_DRILL_DIR/val0.tfrecord, fingerprint
validated).  Run:

    LPM_FULL_SHAPE=1 LPM_DRILL_DIR=/tmp/fullshape_drill \
        python -m pytest tests/integration/test_train_parity_drill_fullshape.py -q -s

Measured results are recorded in BASELINE.md ("full Willow dimensions" rows)
and date-stamped in docs/drill_runs/.
"""

import dataclasses
import os

import numpy as np
import pytest

from tests.integration import gap_drill_common as gd

pytestmark = pytest.mark.skipif(
    not os.environ.get("LPM_FULL_SHAPE"),
    reason="full-Willow-dimension drill (tens of minutes); set LPM_FULL_SHAPE=1",
)

STEPS = 5

DIMS = dataclasses.replace(
    gd.fullshape_dims_for("NetVLADModelLF"),
    train_steps=STEPS,
    train_batch=16,  # keeps the TF CPU stack tractable (verdict weak #6)
    train_lr=0.001,
)


def test_fullshape_loss_trajectory_spot_check():
    root = os.environ.get("LPM_DRILL_DIR", "")
    data = os.path.join(root, "val0.tfrecord")
    if not (root and os.path.exists(data)):
        pytest.skip(
            "prebuilt drill dir required: run `python "
            "tools/drill_train_fullshape_tpu.py --dir <dir>` and set "
            "LPM_DRILL_DIR=<dir>"
        )
    stale = gd.check_fingerprint(root, "fixture", gd.FULLSHAPE_FIXTURE)
    if stale:
        pytest.skip(f"stale drill dir (re-run the trainer): {stale}")

    batches = gd.capture_train_batches(DIMS, data, STEPS)
    our_losses, init_vars, _final = gd.our_train_run(
        DIMS, "NetVLADModelLF", batches
    )
    trainer = gd.TfReferenceTrainer(
        DIMS, init_vars, base_lr=DIMS.train_lr, batch_size=DIMS.train_batch
    )
    tf_losses = [trainer.step(b) for b in batches]

    our = np.asarray(our_losses)
    ref = np.asarray(tf_losses)
    rel = np.abs(our - ref) / np.maximum(np.abs(ref), 1e-6)
    print(
        f"\n[fullshape:traindrill] step-1 rel Δloss {rel[0]:.2e}, "
        f"max over {STEPS} steps {rel.max():.2e}\n"
        f"[fullshape:traindrill] ours {list(np.round(our, 6))}\n"
        f"[fullshape:traindrill] tf   {list(np.round(ref, 6))}"
    )
    # step 1: identical params, identical batch — only f32 linalg-stack
    # accumulation-order noise, now at the 278528-row accumulation length.
    # Same 1e-5 budget as the toy drill (measured there: 8.1e-8).
    assert rel[0] <= 1e-5, (our[0], ref[0])
    # 5-step envelope: semantics bugs show as O(1e-1) divergence.
    assert rel.max() <= 1e-3, list(zip(our.tolist(), ref.tolist()))
    gd.record_drill_run(
        "fullshape_train_parity_NetVLADModelLF",
        {
            "steps": STEPS,
            "batch": DIMS.train_batch,
            "rel_dloss_step1": float(rel[0]),
            "rel_dloss_max": float(rel.max()),
            "our_losses": [float(x) for x in our],
            "tf_losses": [float(x) for x in ref],
        },
    )
