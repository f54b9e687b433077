"""Blocking-scheme learning (operators/schemes.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _fixture(spark):
    # 8 records; true pairs: (1,2) share zip+phon, (3,4) share zip only,
    # (5,6) share phon only, (7,8) share nothing
    rows = [
        (1, "11111", "SM0"), (2, "11111", "SM0"),
        (3, "22222", "AAA"), (4, "22222", "BBB"),
        (5, "33333", "CC0"), (6, "44444", "CC0"),
        (7, "55555", "DDD"), (8, "66666", "EEE"),
    ]
    records = spark.createDataFrame(rows, ["rec_id", "zip", "phon"])
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], ["l_id", "r_id"]
    )
    preds = {"zip": F.col("zip"), "phon": F.col("phon")}
    return records, truth, preds


def test_predicate_stats_pair_mass(spark):
    from rlr_spark.operators.schemes import predicate_stats

    records, _, preds = _fixture(spark)
    stats = predicate_stats(records, preds)
    # zip: blocks {11111:2, 22222:2} -> 1+1 = 2 candidate pairs
    assert stats["zip"] == 2
    # phon: {SM0:2, CC0:2} -> 2
    assert stats["phon"] == 2


def test_truth_coverage(spark):
    from rlr_spark.operators.schemes import truth_coverage

    records, truth, preds = _fixture(spark)
    cov = {
        (r["l_id"], r["r_id"], r["predicate"])
        for r in truth_coverage(records, truth, preds).collect()
    }
    assert cov == {(1, 2, "zip"), (1, 2, "phon"), (3, 4, "zip"), (5, 6, "phon")}


def test_greedy_scheme_and_budget(spark):
    from rlr_spark.operators.schemes import learn_blocking_scheme

    records, truth, preds = _fixture(spark)
    scheme = learn_blocking_scheme(records, truth, preds)
    # both predicates cover 2 truth pairs; tie breaks on name asc ->
    # phon first (covers (1,2),(5,6)), then zip adds (3,4)
    assert [c.name for c in scheme] == ["phon", "zip"]
    assert scheme[0].new_true_pairs == 2
    assert scheme[1].new_true_pairs == 1
    assert scheme[1].cum_true_pairs == 3  # (7,8) uncoverable -> stops there

    # a budget of 3 candidate pairs forbids the second predicate
    tight = learn_blocking_scheme(records, truth, preds, budget_pairs=3)
    assert [c.name for c in tight] == ["phon"]
