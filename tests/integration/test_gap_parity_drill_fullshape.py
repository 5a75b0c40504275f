"""GAP-parity drill at FULL Willow dimensions (round-4 verdict item 1).

The toy-dim drill (test_gap_parity_drill.py) proves the two-stack protocol
at MAXF=10/K=8/V=32; this instantiation proves the same 1e-3 budget at the
production shape the claim is actually about — F=300, D=1152, K=256,
hidden=1024, V=3862, where the 285M-parameter hidden FC accumulates ~2000×
longer dot products and the bf16/int8 deltas are accumulation-length-
dependent (round-3 VERDICT "missing #2").

Four measured deltas (each budget ≤ 1e-3):

1. Δ_default  = |GAP_tf − GAP_ours(default)|       — exact-math parity,
   deterministic window sampling, directly vs the TF full-graph
   transcription;
2. Δ_fast_eval = |GAP_tf − GAP_ours(--fast_eval)|  — on-device metric
   partials vs the reference-semantics accumulator, same forward;
3. Δ_bf16 = |GAP_default(iid, key) − GAP_fused(--fast_forward, iid, key)| —
   the fused bf16 path only supports iid sampling, but both paths draw
   identical frame indices from the identical per-batch eval key
   (models/model_utils.py samplers share one distribution and one uniform
   draw), so this isolates EXACTLY the bf16 numerics of the fused path at
   full accumulation length;
4. Δ_int8 = |GAP_fused_bf16 − GAP_fused(--int8_hidden)| (identical keys) —
   the int8 hidden-FC quantization error at the real [278528, 1024] shape.

Gated behind LPM_FULL_SHAPE=1: one run takes tens of minutes on this
1-core host (the default suite budget is ~20 min total).  Run:

    LPM_FULL_SHAPE=1 python -m pytest \
        tests/integration/test_gap_parity_drill_fullshape.py -q -s

Measured results are recorded in BASELINE.md ("full Willow dimensions"
rows).
"""

import os
import time

import pytest

from learnablepoolingmethods_tpu.data.fixtures import (
    make_learnable_synthetic_frame_level,
)
from tests.integration import gap_drill_common as gd

pytestmark = pytest.mark.skipif(
    not os.environ.get("LPM_FULL_SHAPE"),
    reason="full-Willow-dimension drill (tens of minutes); set LPM_FULL_SHAPE=1",
)

N_VIDEOS = 200
V, RGB, AUD, MAXF = 3862, 1024, 128, 300

DIMS = gd.DrillDims(
    n_videos=N_VIDEOS,
    v=V,
    rgb=RGB,
    aud=AUD,
    maxf=MAXF,
    train_steps=40,
    train_batch=32,
    train_lr=0.02,
    eval_batch=32,
    model_flags=dict(
        iterations=MAXF,
        sample_random_frames=False,
        netvlad_cluster_size=256,   # Willow config 4 (BASELINE.json)
        netvlad_hidden_size=1024,
        moe_num_mixtures=2,
    ),
)


@pytest.fixture(scope="module")
def drill(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gapdrill_full"))
    data = os.path.join(root, "val0.tfrecord")
    t0 = time.time()
    # label_threshold ≈ 2.96 σ (σ = sqrt(D) ≈ 33.9) → YT-8M-like sparse
    # labels (~a few per video out of 3862) instead of the ~50% density the
    # toy drill uses at V=32; min_labels keeps every video scoreable.
    make_learnable_synthetic_frame_level(
        data, num_videos=N_VIDEOS, num_classes=V, rgb_size=RGB,
        audio_size=AUD, max_frames=MAXF, seed=7,
        label_threshold=100.0, min_labels=3,
    )
    x, labels, nf = gd.tf_parse_dataset(DIMS, data)
    assert x.shape == (N_VIDEOS, MAXF, DIMS.d)
    print(f"\n[fullshape] fixture+parse {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    ckpt = gd.train_and_export(
        DIMS, "NetVLADModelLF", data, os.path.join(root, "NetVLADModelLF.ckpt")
    )
    print(f"[fullshape] train+export {time.time() - t0:.0f}s", flush=True)
    return data, ckpt, x, labels, nf


def test_gap_parity_full_willow_dims(drill):
    data, ckpt, x, labels, nf = drill
    model_name = "NetVLADModelLF"

    t0 = time.time()
    tf_preds = gd.tf_eval_netvlad(DIMS, ckpt, x, nf, batch=64)
    tf_info = gd.tf_stack_metrics(DIMS, tf_preds, labels)
    print(f"[fullshape] TF stack {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    our_info = gd.our_stack_metrics(DIMS, data, ckpt, model_name, False)
    fast_info = gd.our_stack_metrics(DIMS, data, ckpt, model_name, True)
    print(f"[fullshape] our default+fast_eval {time.time() - t0:.0f}s", flush=True)

    d_default = abs(tf_info["gap"] - our_info["gap"])
    d_fast = abs(tf_info["gap"] - fast_info["gap"])

    # Arms 3/4: iid sampling, identical per-batch keys across runs.
    t0 = time.time()
    iid_flax = gd.our_stack_metrics(
        DIMS, data, ckpt, model_name, False, sample_random_frames=True
    )
    ff_bf16 = gd.our_stack_metrics(
        DIMS, data, ckpt, model_name, False,
        fast_forward=True, sample_random_frames=True,
    )
    ff_i8 = gd.our_stack_metrics(
        DIMS, data, ckpt, model_name, False,
        fast_forward=True, int8_hidden=True, sample_random_frames=True,
    )
    print(f"[fullshape] iid flax+fused+int8 {time.time() - t0:.0f}s", flush=True)

    d_bf16 = abs(iid_flax["gap"] - ff_bf16["gap"])
    d_int8 = abs(ff_bf16["gap"] - ff_i8["gap"])

    print(
        f"[fullshape] GAP: TF={tf_info['gap']:.6f} "
        f"default={our_info['gap']:.6f} (Δ={d_default:.2e}) "
        f"fast_eval={fast_info['gap']:.6f} (Δ={d_fast:.2e})\n"
        f"[fullshape] iid: flax={iid_flax['gap']:.6f} "
        f"fused_bf16={ff_bf16['gap']:.6f} (Δ_bf16={d_bf16:.2e}) "
        f"int8={ff_i8['gap']:.6f} (Δ_int8={d_int8:.2e})",
        flush=True,
    )

    # non-vacuity: trained model must beat chance on the sparse-label set
    # (chance GAP@20 at ~5/3862 positives is ≈ 0.001)
    assert tf_info["gap"] > 0.05, f"drill model did not train (GAP {tf_info['gap']})"
    assert ff_bf16["gap"] > 0.05
    assert d_default <= 1e-3, (tf_info["gap"], our_info["gap"])
    assert d_fast <= 1e-3, (tf_info["gap"], fast_info["gap"])
    assert d_bf16 <= 1e-3, (iid_flax["gap"], ff_bf16["gap"])
    assert d_int8 <= 1e-3, (ff_bf16["gap"], ff_i8["gap"])
    assert abs(tf_info["avg_hit_at_one"] - our_info["avg_hit_at_one"]) <= 1e-3
    assert abs(tf_info["avg_perr"] - our_info["avg_perr"]) <= 1e-3
