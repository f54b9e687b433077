"""Token standardization (functions/standardize.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_replace_tokens_spark_duckdb_parity(spark):
    from rlr_spark.functions.standardize import (
        NICKNAMES,
        replace_tokens,
        replace_tokens_sql,
    )

    rows = [("Bob Smith",), ("LIZ  taylor",), ("unknown name",), ("",)]
    df = spark.createDataFrame(rows, ["n"])
    got = [
        r["o"] for r in df.select(replace_tokens(F.col("n"), NICKNAMES).alias("o")).collect()
    ]
    assert got[0] == "robert smith"
    assert got[1] == "elizabeth taylor"
    assert got[2] == "unknown name"  # unmapped passthrough
    con = duckdb.connect()
    expr = replace_tokens_sql("n", NICKNAMES)
    for (raw,), want in zip(rows, got):
        if "  " in raw:
            continue  # single-space split convention differs on runs of spaces
        assert con.execute(f"SELECT {expr} FROM (SELECT ? AS n)", [raw]).fetchone()[0] == want


def test_standardize_address(spark):
    from rlr_spark.functions.standardize import standardize_address

    df = spark.createDataFrame([("12 Main St Apt 4",), ("Oak Ave NW",)], ["a"])
    got = [r["o"] for r in df.select(standardize_address(F.col("a")).alias("o")).collect()]
    assert got[0] == "12 main street apartment 4"
    assert got[1] == "oak avenue northwest"


def test_replace_tokens_rejects_empty_mapping(spark):
    from rlr_spark.functions.standardize import replace_tokens

    with pytest.raises(ValueError):
        replace_tokens(F.col("x"), {})
