"""Sparse TF-IDF cosine all-pairs (functions/tfidf.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rlr_spark.functions.tfidf import all_pairs_cosine, doc_token_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_cosine_one(spark):
    d = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon")],
    )
    out = {
        (r.l_id, r.r_id): r.cosine
        for r in all_pairs_cosine(d, threshold=0.99).collect()
    }
    assert out == {(1, 2): 1.0}


def test_disjoint_docs_never_pair(spark):
    d = _docs(spark, [(1, "aa bb"), (2, "cc dd"), (3, "ee ff")])
    assert all_pairs_cosine(d, threshold=0.01).count() == 0


def test_weights_are_unit_vectors(spark):
    d = _docs(
        spark,
        [(1, "x x y z"), (2, "y z z q"), (3, "q r s t u v")],
    )
    norms = (
        doc_token_weights(d)
        .groupBy("_id")
        .agg(F.sum(F.col("w") * F.col("w")).alias("sq"))
        .collect()
    )
    for r in norms:
        assert abs(r.sq - 1.0) < 1e-12


def test_max_df_prunes_stopwords_and_renormalizes(spark):
    # "the" appears in every doc; with max_df=2 it is dropped from the
    # index and the remaining weights still form unit vectors
    d = _docs(
        spark,
        [(1, "the cat"), (2, "the dog"), (3, "the cat dog")],
    )
    w = doc_token_weights(d, max_df=2)
    assert w.where(F.col("tok") == "the").count() == 0
    sq = (
        w.groupBy("_id").agg(F.sum(F.col("w") * F.col("w")).alias("sq")).collect()
    )
    assert all(abs(r.sq - 1.0) < 1e-12 for r in sq)
    # pruning the shared token must LOWER pairwise cosine for docs whose
    # only overlap was the stopword
    full = {
        (r.l_id, r.r_id): r.cosine
        for r in all_pairs_cosine(d, threshold=0.0).collect()
    }
    pruned = {
        (r.l_id, r.r_id): r.cosine
        for r in all_pairs_cosine(d, threshold=0.0, max_df=2).collect()
    }
    assert (1, 2) in full and (1, 2) not in pruned  # only overlap was "the"
    assert pruned[(1, 3)] > 0  # real overlap survives


def test_null_and_empty_text_ignored(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "   "), (4, "alpha beta")],
        "doc_id long, text string",
    )
    out = all_pairs_cosine(d, threshold=0.5).collect()
    assert {(r.l_id, r.r_id) for r in out} == {(1, 4)}


def test_plan_has_no_cartesian(spark):
    d = _docs(spark, [(1, "a b"), (2, "b c"), (3, "c d")])
    plan = (
        all_pairs_cosine(d, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
