"""Benchmark decontamination: planted contamination, hash/string parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rlr_spark.functions.decontam import decontaminate, token_ngrams


BENCH_DOC = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


@pytest.fixture()
def corpora(spark):
    bench = spark.createDataFrame(
        [(100, BENCH_DOC), (101, "one two three four five six seven")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # fully lifted from the benchmark doc: every 5-gram matches
            (1, BENCH_DOC),
            # a 5-token span of the benchmark inside fresh text:
            # exactly one of its 5-grams is the planted one
            (2, "x1 x2 alpha beta gamma delta epsilon y1 y2"),
            # clean
            (3, "red orange yellow green blue indigo violet"),
            # too short for any 5-gram
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    return train, bench


def test_planted_contamination(spark, corpora):
    train, bench = corpora
    out = {
        r.doc_id: r
        for r in decontaminate(train, bench, n=5, threshold=0.1).collect()
    }
    assert out[1].contamination == 1.0 and out[1].is_contaminated
    # doc 2: tokens 9 -> 5 grams, exactly 1 lifted
    assert out[2].n_grams == 5 and out[2].n_overlap == 1
    assert out[2].contamination == 0.2 and out[2].is_contaminated
    assert out[3].n_overlap == 0 and not out[3].is_contaminated
    # short doc: present, zero grams, not flagged
    assert out[4].n_grams == 0 and out[4].contamination == 0.0
    assert not out[4].is_contaminated
    assert set(out) == {1, 2, 3, 4}  # every training doc reported


def test_hashed_and_string_paths_agree(spark, corpora):
    train, bench = corpora
    a = decontaminate(train, bench, n=5, hash_grams=True).collect()
    b = decontaminate(train, bench, n=5, hash_grams=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_token_ngrams_short_and_empty(spark):
    df = spark.createDataFrame(
        [("a b c d e f",), ("a b",), ("",), (None,)], "text string"
    )
    rows = df.select(token_ngrams(F.col("text"), 5).alias("g")).collect()
    assert rows[0].g == ["a b c d e", "b c d e f"]
    assert rows[1].g == [] and rows[2].g == [] and rows[3].g == []
