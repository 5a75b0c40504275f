"""Metric correctness: hand-computed cases + property tests (SURVEY.md §4 item 3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from learnablepoolingmethods_tpu.metrics import (
    AveragePrecisionCalculator,
    MeanAveragePrecisionCalculator,
    eval_util,
)
from learnablepoolingmethods_tpu.metrics.average_precision_calculator import ap_vectorized


# ---------- AveragePrecisionCalculator ----------

def test_ap_perfect_ranking():
    # positives ranked first: AP = 1
    preds = np.array([0.9, 0.8, 0.2, 0.1])
    actuals = np.array([1, 1, 0, 0])
    assert AveragePrecisionCalculator.ap(preds, actuals) == 1.0


def test_ap_hand_computed():
    # ranking: pos@1, neg@2, pos@3 → AP = (1/1 + 2/3)/2 = 5/6
    preds = np.array([0.9, 0.5, 0.4])
    actuals = np.array([1, 0, 1])
    np.testing.assert_allclose(AveragePrecisionCalculator.ap(preds, actuals), 5.0 / 6.0)


def test_ap_at_n_caps_pool_and_recall():
    preds = np.array([0.9, 0.8, 0.7, 0.1])
    actuals = np.array([0, 0, 0, 1])
    # top-2 pool misses the only positive → AP@2 = 0
    assert AveragePrecisionCalculator.ap_at_n(preds, actuals, n=2) == 0.0


def test_streaming_equals_oneshot(rng):
    preds = rng.uniform(size=100)
    actuals = (rng.uniform(size=100) < 0.3).astype(float)
    calc = AveragePrecisionCalculator()
    for i in range(0, 100, 17):
        calc.accumulate(preds[i : i + 17], actuals[i : i + 17])
    one_shot = AveragePrecisionCalculator.ap(preds, actuals)
    np.testing.assert_allclose(calc.peek_ap_at_n(), one_shot, rtol=1e-12)


def test_bounded_heap_keeps_top_n(rng):
    calc = AveragePrecisionCalculator(top_n=5)
    preds = rng.uniform(size=50)
    actuals = (rng.uniform(size=50) < 0.3).astype(float)
    calc.accumulate(preds, actuals)
    assert calc.heap_size == 5


def test_ap_vectorized_matches_reference_no_ties(rng):
    preds = rng.permutation(np.linspace(0.01, 0.99, 200))  # distinct scores
    actuals = (rng.uniform(size=200) < 0.25).astype(float)
    ref = AveragePrecisionCalculator.ap(preds, actuals)
    fast = ap_vectorized(preds, actuals)
    np.testing.assert_allclose(fast, ref, rtol=1e-10)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=2, max_value=60), st.integers(min_value=0, max_value=10**6))
def test_ap_in_unit_interval(n, seed):
    r = np.random.default_rng(seed)
    preds = r.uniform(size=n)
    actuals = (r.uniform(size=n) < 0.4).astype(float)
    ap = AveragePrecisionCalculator.ap(preds, actuals)
    assert 0.0 <= ap <= 1.0 + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=2, max_value=40), st.integers(min_value=0, max_value=10**6))
def test_ap_permutation_invariant(n, seed):
    r = np.random.default_rng(seed)
    preds = r.permutation(np.linspace(0.0, 1.0, n))  # distinct → order-free
    actuals = (r.uniform(size=n) < 0.4).astype(float)
    perm = r.permutation(n)
    ap1 = AveragePrecisionCalculator.ap(preds, actuals)
    ap2 = AveragePrecisionCalculator.ap(preds[perm], actuals[perm])
    np.testing.assert_allclose(ap1, ap2, rtol=1e-12)


# ---------- Hit@1 / PERR ----------

def test_hit_at_one_hand_computed():
    preds = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
    actuals = np.array([[1, 0], [1, 0], [0, 1]])
    np.testing.assert_allclose(eval_util.calculate_hit_at_one(preds, actuals), 1.0 / 3.0)


def test_perr_hand_computed():
    # row0: 2 labels, top-2 preds = classes {0,1}, both true → precision 1
    # row1: 1 label, top-1 pred = class 0, false → precision 0
    preds = np.array([[0.9, 0.8, 0.1], [0.9, 0.2, 0.1]])
    actuals = np.array([[1, 1, 0], [0, 0, 1]])
    np.testing.assert_allclose(
        eval_util.calculate_precision_at_equal_recall_rate(preds, actuals), 0.5
    )


# ---------- top_k / GAP ----------

def test_top_k_by_class_pool_size():
    preds = np.random.default_rng(1).uniform(size=(6, 30))
    labels = (np.random.default_rng(2).uniform(size=(6, 30)) < 0.2).astype(float)
    sp, sl, npos = eval_util.top_k_by_class(preds, labels, k=5)
    assert sum(len(p) for p in sp) == 6 * 5
    assert sum(len(p) for p in sl) == 6 * 5
    np.testing.assert_array_equal(npos, labels.sum(0))


def test_gap_perfect_predictions():
    rng_l = np.random.default_rng(3)
    labels = (rng_l.uniform(size=(10, 50)) < 0.1).astype(float)
    labels[0, 0] = 1  # ensure ≥1 positive
    preds = labels * 0.9 + 0.01  # positives strictly above negatives
    gap = eval_util.calculate_gap(preds, labels, top_k=20)
    np.testing.assert_allclose(gap, 1.0, atol=1e-9)


def test_gap_matches_manual_pool(rng):
    preds = rng.uniform(size=(8, 40))
    labels = (rng.uniform(size=(8, 40)) < 0.15).astype(float)
    gap = eval_util.calculate_gap(preds, labels, top_k=7)

    # manual: pool every row's top-7, one AP with total positives
    pool_p, pool_l = [], []
    for i in range(8):
        idx = np.argsort(-preds[i])[:7]
        pool_p.extend(preds[i][idx])
        pool_l.extend(labels[i][idx])
    manual = AveragePrecisionCalculator()
    manual.accumulate(pool_p, pool_l, num_positives=int(labels.sum()))
    np.testing.assert_allclose(gap, manual.peek_ap_at_n(), rtol=1e-12)


# ---------- EvaluationMetrics accumulator ----------

def test_evaluation_metrics_epoch(rng):
    em = eval_util.EvaluationMetrics(num_class=30, top_k=5)
    all_preds, all_labels = [], []
    for _ in range(3):
        preds = rng.uniform(size=(4, 30))
        labels = (rng.uniform(size=(4, 30)) < 0.2).astype(float)
        labels[:, 0] = 1
        em.accumulate(preds, labels, loss=np.float32(1.5))
        all_preds.append(preds)
        all_labels.append(labels)
    out = em.get()
    assert set(out) == {"avg_hit_at_one", "avg_perr", "avg_loss", "aps", "gap"}
    assert 0 <= out["gap"] <= 1
    np.testing.assert_allclose(out["avg_loss"], 1.5, rtol=1e-6)
    assert len(out["aps"]) == 30
    # epoch GAP == GAP over pooled top-k of all batches
    P, L = np.concatenate(all_preds), np.concatenate(all_labels)
    np.testing.assert_allclose(out["gap"], eval_util.calculate_gap(P, L, top_k=5), rtol=1e-12)


def test_streaming_gap_matches_eval_metrics(rng):
    preds = rng.uniform(size=(16, 50))
    labels = (rng.uniform(size=(16, 50)) < 0.1).astype(float)
    labels[:, 3] = 1
    ref_gap = eval_util.calculate_gap(preds, labels, top_k=20)

    sg = eval_util.StreamingGAP()
    for i in range(0, 16, 4):
        p, l = preds[i : i + 4], labels[i : i + 4]
        idx = np.argsort(-p, axis=1)[:, :20]
        sg.accumulate(
            np.take_along_axis(p, idx, 1), np.take_along_axis(l, idx, 1), int(l.sum())
        )
    # identical up to tie-ordering; random uniforms have no ties
    np.testing.assert_allclose(sg.get(), ref_gap, rtol=1e-9)


def test_fast_gap_bitexact_on_same_pool(rng):
    """ap_vectorized (with the seed-0 tie shuffle) must be BIT-EXACT with the
    reference ap_at_n on the same pool, even with heavy ties (VERDICT
    round-1 item 8; fixes the stable-sort tie bias this test originally
    caught at 2.2e-3)."""
    from learnablepoolingmethods_tpu.metrics.average_precision_calculator import (
        AveragePrecisionCalculator,
        ap_vectorized,
    )

    pool_p = np.round(rng.uniform(size=4000) * 5.0) / 5.0  # 6 distinct scores
    pool_l = (rng.uniform(size=4000) < 0.2).astype(float)
    numpos = float(pool_l.sum())
    fast = ap_vectorized(pool_p, pool_l, numpos)
    ref = AveragePrecisionCalculator.ap_at_n(
        pool_p, pool_l, n=None, total_num_positives=numpos
    )
    np.testing.assert_allclose(fast, ref, rtol=1e-12)

    # all-tied degenerate pool: still bit-exact
    pool_p = np.full(2000, 0.5)
    pool_l = (rng.uniform(size=2000) < 0.3).astype(float)
    fast = ap_vectorized(pool_p, pool_l, float(pool_l.sum()))
    ref = AveragePrecisionCalculator.ap_at_n(
        pool_p, pool_l, n=None, total_num_positives=float(pool_l.sum())
    )
    np.testing.assert_allclose(fast, ref, rtol=1e-12)


def test_fast_gap_tie_break_bound():
    """Pipeline-level tie bound (SURVEY.md 7 GAP-parity hard part): the fast
    path pools per-video top-k on device (video-major order) while the
    reference pools class-major through a heap, so under score ties the two
    orders differ.  At realistic quantization (>=64 score levels) the GAP
    difference must stay inside the 1e-3 parity budget.

    Heavier tying has NO well-defined 1e-3 target: the reference disagrees
    with ITSELF by ~5e-3 at 6-level quantization when the same data is
    accumulated in different batch splits (heap insertion order changes the
    seed-0 tie shuffle input) -- measured in this test at the looser bound.
    """
    from learnablepoolingmethods_tpu.metrics.average_precision_calculator import (
        ap_vectorized,
    )

    top_k = 20
    for levels, bound in ((63, 1e-3), (255, 1e-3), (5, 1e-2)):
        for seed in range(3):
            r = np.random.default_rng(seed)
            preds = np.round(r.uniform(size=(256, 40)) * levels) / levels
            labels = (r.uniform(size=(256, 40)) < 0.15).astype(float)
            labels[:, 1] = 1
            ref_gap = eval_util.calculate_gap(preds, labels, top_k=top_k)
            idx = np.argsort(-preds, axis=1)[:, :top_k]
            fast = ap_vectorized(
                np.take_along_axis(preds, idx, 1).ravel(),
                np.take_along_axis(labels, idx, 1).ravel(),
                float(labels.sum()),
            )
            assert abs(fast - ref_gap) < bound, (levels, seed, fast, ref_gap)

    # document the reference's own tie-order sensitivity (batch-split effect)
    r = np.random.default_rng(1)
    preds = np.round(r.uniform(size=(256, 40)) * 5) / 5
    labels = (r.uniform(size=(256, 40)) < 0.15).astype(float)
    labels[:, 1] = 1
    g_full = eval_util.calculate_gap(preds, labels, top_k=top_k)
    em = eval_util.EvaluationMetrics(40, top_k)
    for i in range(0, 256, 32):
        em.accumulate(preds[i : i + 32], labels[i : i + 32], 0.0)
    assert abs(g_full - em.get()["gap"]) > 1e-3  # ties make even ref-vs-ref drift
