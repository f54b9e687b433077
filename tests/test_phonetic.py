"""American Soundex (functions/phonetic.py) — canonical values and
Spark <-> DuckDB parity (the blocking-key reproducibility claim)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from rlr_spark.functions.phonetic import soundex_col, soundex_sql

# the canonical test vector: census examples (Tymczak, Pfister,
# Ashcraft exercise the vowel-separation, first-letter-dup and H/W
# transparency rules respectively)
CANON = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Wu": "W000",
    "H": "H000",
    "": "",
    "123-456": "",
    "O'Brien": "O165",
    "Aardvark": "A631",
    "WC": "W200",
    "smith": "S530",
    "SMYTH": "S530",
}


def test_soundex_canonical_values(spark):
    df = spark.createDataFrame([(k,) for k in CANON], "nm string")
    got = {
        r.nm: r.code
        for r in df.select("nm", soundex_col(F.col("nm")).alias("code")).collect()
    }
    assert got == CANON


def test_soundex_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "nm string")
    assert df.select(soundex_col(F.col("nm")).alias("c")).collect()[0].c is None


def test_soundex_spark_duckdb_parity(spark):
    """Fuzz parity: every generated name string codes identically in
    both engines — the property that makes it a portable block key."""
    import random

    rng = random.Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyzHW '-éµ0"
    names = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 20)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(n,) for n in names], "nm string")
    got_spark = [
        r.code
        for r in df.select(soundex_col(F.col("nm")).alias("code"))
        .orderBy("nm")
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        row[0]
        for row in con.execute(
            f"SELECT {soundex_sql('nm')} FROM (SELECT unnest(?) AS nm) ORDER BY nm",
            [sorted(names)],
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_soundex_is_codegen_friendly(spark):
    """No UDF, no python round-trip: the key must stay JVM-side."""
    df = spark.createDataFrame([("Smith",)], "nm string")
    plan = (
        df.select(soundex_col(F.col("nm")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
