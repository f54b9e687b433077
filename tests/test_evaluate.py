"""Linkage evaluation operators (operators/evaluate.py).

Hand-computed expectations on tiny synthetic pair sets; the sweep's
scale contract (buckets-then-window, never window-over-pairs) is
asserted on the plan.
"""

from __future__ import annotations

import pytest

from rlr_spark.operators.evaluate import blocking_quality, threshold_sweep


@pytest.fixture(scope="module")
def scored(spark):
    # 8 pairs, 3 distinct scores; truth = 4 of them
    rows = [
        (1, 2, 3.0), (1, 3, 3.0),            # high bucket
        (2, 3, 1.0), (2, 4, 1.0), (2, 5, 1.0),  # mid bucket
        (3, 4, -1.0), (3, 5, -1.0), (4, 5, -1.0),  # low bucket
    ]
    return spark.createDataFrame(rows, "l_id long, r_id long, fs_score double")


@pytest.fixture(scope="module")
def truth(spark):
    rows = [(1, 2), (1, 3), (2, 3), (9, 10)]  # (9,10) never surfaced
    return spark.createDataFrame(rows, "l_id long, r_id long")


def test_threshold_sweep_values(spark, scored, truth):
    out = {r["threshold"]: r for r in threshold_sweep(scored, truth).collect()}
    assert set(out) == {3.0, 1.0, -1.0}
    # t=3.0: pred 2, tp 2 -> P=1, R=2/4
    assert (out[3.0]["predicted_pos"], out[3.0]["true_pos"]) == (2, 2)
    assert out[3.0]["precision"] == 1.0 and out[3.0]["recall"] == 0.5
    # t=1.0: pred 5, tp 3 -> P=0.6, R=0.75
    assert (out[1.0]["predicted_pos"], out[1.0]["true_pos"]) == (5, 3)
    assert out[1.0]["precision"] == 0.6 and out[1.0]["recall"] == 0.75
    f1 = 2 * 0.6 * 0.75 / (0.6 + 0.75)
    assert abs(out[1.0]["f1"] - round(f1, 6)) < 1e-9
    # t=-1.0: everything predicted positive; the blocked-away truth
    # pair (9,10) still caps recall below 1
    assert (out[-1.0]["predicted_pos"], out[-1.0]["true_pos"]) == (8, 3)
    assert out[-1.0]["recall"] == 0.75


def test_threshold_sweep_counts_missed_truth_in_recall(spark, scored, truth):
    # drop the never-surfaced truth pair -> recall at the loosest
    # threshold reaches 1.0; with it, recall is capped at 0.75 (above)
    t2 = truth.where("l_id != 9")
    out = {r["threshold"]: r for r in threshold_sweep(scored, t2).collect()}
    assert out[-1.0]["recall"] == 1.0


def test_threshold_sweep_window_runs_over_buckets_not_pairs(spark, scored, truth):
    plan = (
        threshold_sweep(scored, truth)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the Window node's child must already be the bucket aggregation —
    # a window directly over the joined pair relation would be the
    # non-scalable shape (global sort of all pairs)
    w = plan.index("Window")
    assert "Aggregate" in plan[w:], plan


def test_blocking_quality_values(spark, scored, truth):
    cand = scored.select("l_id", "r_id").where("l_id <= 2")  # 5 of 8 pairs
    out = blocking_quality(cand, truth, n_records=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_candidates"] == 5 and r["n_truth"] == 4
    assert r["true_in_candidates"] == 3
    assert r["pairs_completeness"] == 0.75
    assert r["reduction_ratio"] == 0.5  # 1 - 5 / C(5,2)=10


def test_blocking_quality_dedups_inputs(spark, scored, truth):
    cand = scored.select("l_id", "r_id").unionAll(scored.select("l_id", "r_id"))
    out = blocking_quality(cand, truth.unionAll(truth), n_records=5).collect()[0]
    assert out["n_candidates"] == 8 and out["n_truth"] == 4


def test_adjusted_rand_perfect_and_known_values(spark):
    from rlr_spark.operators.evaluate import adjusted_rand

    pred = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20)], "doc_id long, entity_id long"
    )
    assert adjusted_rand(pred, pred).collect()[0].ari == 1.0

    # classic anti-correlated example: ARI = -0.5
    truth = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 10), (4, 20)], "doc_id long, entity_id long"
    )
    assert adjusted_rand(pred, truth).collect()[0].ari == -0.5


def test_adjusted_rand_chance_correction(spark):
    """All-in-one-cluster predictions score ~0, not high (the failure
    mode pairwise recall and unadjusted Rand both reward)."""
    from rlr_spark.operators.evaluate import adjusted_rand

    rows = [(i, i % 5) for i in range(50)]
    truth = spark.createDataFrame(rows, "doc_id long, entity_id long")
    allone = spark.createDataFrame(
        [(i, 0) for i in range(50)], "doc_id long, entity_id long"
    )
    ari = adjusted_rand(allone, truth).collect()[0].ari
    assert abs(ari) < 1e-9  # exactly 0 for the one-cluster degenerate


def test_adjusted_rand_degenerate_agreement(spark):
    from rlr_spark.operators.evaluate import adjusted_rand

    # both all-singletons: denominator 0, defined as 1.0
    singles = spark.createDataFrame(
        [(i, i) for i in range(6)], "doc_id long, entity_id long"
    )
    assert adjusted_rand(singles, singles).collect()[0].ari == 1.0
