import math

from pyspark.sql import functions as F

from rlr_spark.datagen import VAR_SCHEMA_FIRM, generate_firm_fixtures
from rlr_spark.functions.similarity import jaro_winkler_py, token_jaccard, levenshtein_sim
from rlr_spark.operators.compare import comparison_vectors, text_pair_similarity


def test_token_jaccard(spark):
    df = spark.createDataFrame(
        [
            ("a b c", "a b c", 1.0),
            ("a b c d", "c d e f", 2.0 / 6.0),
            ("", "", 0.0),
            ("x", "y", 0.0),
            ("A  B", "a b", 1.0),  # case/whitespace normalization
        ],
        "l string, r string, want double",
    )
    rows = df.withColumn("got", token_jaccard(F.col("l"), F.col("r"))).collect()
    for r in rows:
        assert math.isclose(r.got, r.want, abs_tol=1e-9), (r.l, r.r)


def test_levenshtein_sim(spark):
    df = spark.createDataFrame([("kitten", "sitting")], "l string, r string")
    got = df.select(levenshtein_sim(F.col("l"), F.col("r")).alias("s")).collect()[0].s
    assert math.isclose(got, 1 - 3 / 7, abs_tol=1e-9)


def test_jaro_winkler_known_values():
    # classic published examples
    assert math.isclose(jaro_winkler_py("martha", "marhta"), 0.9611, abs_tol=1e-3)
    assert math.isclose(jaro_winkler_py("dwayne", "duane"), 0.84, abs_tol=1e-2)
    assert jaro_winkler_py("same", "same") == 1.0
    assert jaro_winkler_py("abc", "xyz") == 0.0
    assert jaro_winkler_py(None, "x") == 0.0


def test_comparison_vectors_firm(spark):
    data_l, data_r, pairs_pd = generate_firm_fixtures()
    L = spark.createDataFrame(data_l)
    R = spark.createDataFrame(data_r.where(data_r.notna(), None))
    P = spark.createDataFrame(pairs_pd).withColumnRenamed("ein", "l_id").withColumnRenamed(
        "ui_num", "r_id"
    )
    out = comparison_vectors(
        P, L, R, "ein", "ui_num", VAR_SCHEMA_FIRM, metrics=("exact", "jaccard")
    )
    rows = {(r.l_id, r.r_id): r for r in out.collect()}
    # row 0: names differ only by case/space -> exact bit 1
    assert rows[(100, 500)].cmp_name_exact == 1.0
    # row 3: right name replaced entirely -> 0
    assert rows[(103, 503)].cmp_name_exact == 0.0
    # vector has one slot per group, first-metric (exact)
    assert len(rows[(100, 500)].comparison_vector) == len(VAR_SCHEMA_FIRM)
    # pair with l_id 999 absent from L -> null-joined row still present
    assert (999, 507) in rows


def test_text_pair_similarity(spark):
    pages = spark.createDataFrame(
        [("u1", "alpha beta gamma delta"), ("u2", "alpha beta gamma epsilon"), ("u3", "zzz")],
        "url string, text string",
    )
    pairs = spark.createDataFrame([("u1", "u2"), ("u1", "u3")], "l_id string, r_id string")
    rows = {
        (r.l_id, r.r_id): r
        for r in text_pair_similarity(pairs, pages).collect()
    }
    assert math.isclose(rows[("u1", "u2")].sim_jaccard, 3 / 5, abs_tol=1e-9)
    assert rows[("u1", "u2")].cmp_text_exact == 0.0
    assert rows[("u1", "u3")].sim_jaccard == 0.0
