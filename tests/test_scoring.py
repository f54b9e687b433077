import math

from pyspark.sql import functions as F

from rlr_spark import LABEL_MATCH, LABEL_NONMATCH, LABEL_UNCERTAIN
from rlr_spark.operators.scoring import FSWeights, estimate_mu, fs_score, score_and_label


def test_fs_score_arithmetic(spark):
    w = FSWeights(groups={"s1": (0.9, 0.1), "s2": (0.8, 0.2)}, agree_threshold=0.5)
    df = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 0.0), (0.0, 0.0)], "s1 double, s2 double"
    )
    rows = fs_score(df, w).orderBy(F.desc("s1"), F.desc("s2")).collect()
    agree1, dis1 = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)
    agree2, dis2 = math.log2(0.8 / 0.2), math.log2(0.2 / 0.8)
    assert math.isclose(rows[0].fs_score, agree1 + agree2, abs_tol=1e-9)
    assert math.isclose(rows[1].fs_score, agree1 + dis2, abs_tol=1e-9)
    assert math.isclose(rows[2].fs_score, dis1 + dis2, abs_tol=1e-9)


def test_label_trichotomy(spark):
    w = FSWeights(groups={"s": (0.9, 0.1)}, agree_threshold=0.5, upper=1.0, lower=-1.0)
    df = spark.createDataFrame([(1.0,), (0.0,)], "s double")
    rows = score_and_label(df, w).collect()
    by_s = {r.s: r for r in rows}
    assert by_s[1.0].rlr_label == LABEL_MATCH
    assert by_s[0.0].rlr_label == LABEL_NONMATCH
    assert all(r.rlr_label_ind == 1 for r in rows)
    # uncertain band
    w2 = FSWeights(groups={"s": (0.9, 0.1)}, upper=100.0, lower=-100.0)
    got = score_and_label(df, w2).collect()
    assert all(r.rlr_label == LABEL_UNCERTAIN for r in got)


def test_estimate_mu(spark):
    df = spark.createDataFrame(
        [
            (0.9, LABEL_MATCH),
            (0.95, LABEL_MATCH),
            (0.2, LABEL_MATCH),
            (0.1, LABEL_NONMATCH),
            (0.9, LABEL_NONMATCH),
            (0.0, LABEL_NONMATCH),
            (0.0, LABEL_NONMATCH),
        ],
        "sim double, rlr_label string",
    )
    mu = estimate_mu(df, ["sim"], agree_threshold=0.8)
    m, u = mu["sim"]
    assert math.isclose(m, 2 / 3, abs_tol=1e-9)
    assert math.isclose(u, 1 / 4, abs_tol=1e-9)


def test_estimate_mu_em_recovers_planted(spark):
    """EM over agreement patterns recovers m >> u on a mixture where 10%
    of pairs are matches that mostly agree and 90% are nonmatches that
    mostly disagree (two correlated fields)."""
    import numpy as np

    from rlr_spark.operators.scoring import estimate_mu_em

    rng = np.random.RandomState(11)
    rows = []
    for _ in range(5000):
        is_match = rng.random_sample() < 0.1
        if is_match:
            s1 = 1.0 if rng.random_sample() < 0.95 else 0.0
            s2 = 1.0 if rng.random_sample() < 0.85 else 0.0
        else:
            s1 = 1.0 if rng.random_sample() < 0.05 else 0.0
            s2 = 1.0 if rng.random_sample() < 0.15 else 0.0
        rows.append((s1, s2))
    df = spark.createDataFrame(rows, "s1 double, s2 double")
    mu, p = estimate_mu_em(df, ["s1", "s2"], agree_threshold=0.5)
    assert 0.05 < p < 0.2
    m1, u1 = mu["s1"]
    m2, u2 = mu["s2"]
    assert m1 > 0.8 and u1 < 0.15
    assert m2 > 0.7 and u2 < 0.25


def test_pattern_diagnostics_counts_and_expectation(spark):
    from rlr_spark.operators.scoring import pattern_diagnostics

    # 10 pairs: 4x (1,1), 3x (1,0), 2x (0,1), 1x (0,0)
    rows = [(1, 1)] * 4 + [(1, 0)] * 3 + [(0, 1)] * 2 + [(0, 0)]
    df = spark.createDataFrame(rows, "g1 int, g2 int")
    m, u, p = [0.9, 0.8], [0.1, 0.3], 0.5
    out = {
        (r.g1, r.g2): (r.n_pairs, r.expected)
        for r in pattern_diagnostics(df, ["g1", "g2"], m, u, p).collect()
    }
    assert {k: v[0] for k, v in out.items()} == {
        (1, 1): 4, (1, 0): 3, (0, 1): 2, (0, 0): 1
    }
    # hand expectation for (1,1): N * (p*m1*m2 + (1-p)*u1*u2)
    want = round(10 * (0.5 * 0.9 * 0.8 + 0.5 * 0.1 * 0.3), 4)
    assert out[(1, 1)][1] == want
    # expectations over all patterns sum to N
    assert abs(sum(v[1] for v in out.values()) - 10) < 1e-3


def test_pattern_diagnostics_validates_lengths(spark):
    import pytest as _pytest

    from rlr_spark.operators.scoring import pattern_diagnostics

    df = spark.createDataFrame([(1, 1)], "g1 int, g2 int")
    with _pytest.raises(ValueError):
        pattern_diagnostics(df, ["g1", "g2"], [0.9], [0.1, 0.2], 0.5)
