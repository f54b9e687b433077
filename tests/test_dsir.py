"""DSIR importance resampling: weights verified against a NumPy-free
pure-Python reimplementation of the hashed-bucket LM math."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from rlr_spark.functions.sampling import dsir_log_weights, dsir_sample

DOCS = [
    # target domain: "code"-flavored; raw mixes in prose
    (0, "def return class import def lambda", "code"),
    (1, "class def import yield return async", "code"),
    (2, "the cat sat on the mat quietly", "prose"),
    (3, "rain in spain falls on the plain", "prose"),
    (4, "def import the return on lambda", "mixed"),
    (5, "", "prose"),  # empty doc: excluded (no evidence)
]

B = 16


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B


def _py_weights():
    raw, tgt = Counter(), Counter()
    for _, text, src in DOCS:
        for t in text.lower().split():
            b = _bucket(t)
            raw[b] += 1
            if src == "code":
                tgt[b] += 1
    nr, nt = sum(raw.values()), sum(tgt.values())
    out = {}
    for doc_id, text, _ in DOCS:
        toks = text.lower().split()
        if not toks:
            continue
        lw = sum(
            math.log((tgt[_bucket(t)] + 1) / (nt + B))
            - math.log((raw[_bucket(t)] + 1) / (nr + B))
            for t in toks
        )
        out[doc_id] = (len(toks), lw)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_log_weights_match_bruteforce(docs_df):
    got = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in dsir_log_weights(
            docs_df, F.col("source") == "code", n_buckets=B
        ).collect()
    }
    want = _py_weights()
    assert set(got) == set(want)  # doc 5 (empty) excluded on both sides
    for d, (n, lw) in want.items():
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(lw, abs=1e-9)


def test_target_docs_rank_above_prose(docs_df):
    lw = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(
            docs_df, F.col("source") == "code", n_buckets=B
        ).collect()
    }
    assert min(lw[0], lw[1]) > max(lw[2], lw[3])  # code >> prose
    assert lw[2] < 0 and lw[0] > 0


def test_sample_is_deterministic_topk(docs_df):
    a = dsir_sample(docs_df, F.col("source") == "code", k=3, n_buckets=B).collect()
    b = dsir_sample(docs_df, F.col("source") == "code", k=3, n_buckets=B).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert len(a) == 3
    keys = [r.samp_key for r in a]
    assert keys == sorted(keys, reverse=True)


def test_sample_extends_consistently(docs_df):
    # top-2 is a prefix of top-4 (same keys, bigger k)
    k2 = [r.doc_id for r in dsir_sample(docs_df, F.col("source") == "code", 2, n_buckets=B).collect()]
    k4 = [r.doc_id for r in dsir_sample(docs_df, F.col("source") == "code", 4, n_buckets=B).collect()]
    assert k4[:2] == k2
