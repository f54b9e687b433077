"""Iceberg-path contract tests.

The sandbox image ships no iceberg-spark-runtime jars, so the real
Iceberg branch (catalog writeTo / MERGE INTO) cannot execute here; the
BASELINE input shape is an Iceberg table, so that branch must not be
dead code. These tests (a) assert the capability probe is honest,
(b) drive the identifier and MERGE INTO SQL generation through a mocked
catalog so the statements the engine would submit are pinned, and
(c) run the real branch end-to-end IF jars ever appear (skip-with-reason
otherwise).
"""

from __future__ import annotations

import pytest

from rlr_spark.catalog import Catalog, iceberg_available


def test_probe_is_honest(spark):
    avail = iceberg_available(spark)
    # catalog must agree with the probe: no iceberg_catalog when the
    # class is absent, even if the caller asks for one
    cat = Catalog(spark, "/tmp/ice_probe_wh", iceberg_catalog="rlr")
    assert (cat.iceberg_catalog == "rlr") == avail


class _RecordingSpark:
    """Captures spark.sql text; presents just enough surface for the
    Iceberg branches of Catalog/merge_upsert."""

    def __init__(self):
        self.statements: list[str] = []

    def sql(self, text: str):
        self.statements.append(text)

    class catalog:  # noqa: N801 — mimics spark.catalog
        @staticmethod
        def tableExists(ident: str) -> bool:
            return True


def _mock_iceberg_catalog() -> Catalog:
    cat = Catalog.__new__(Catalog)
    cat.spark = _RecordingSpark()
    cat.root = "/tmp/ice_mock_wh"
    cat.namespace = "rlr"
    cat.iceberg_catalog = "ice"
    return cat


def test_identifier_shape():
    cat = _mock_iceberg_catalog()
    assert cat._ident("pairs") == "ice.rlr.pairs"
    assert cat.exists("pairs") is True


def test_drop_emits_drop_table():
    cat = _mock_iceberg_catalog()
    cat.drop("score")
    assert cat.spark.statements == ["DROP TABLE IF EXISTS ice.rlr.score"]


def test_merge_upsert_emits_merge_into(spark):
    """merge_upsert's Iceberg branch must build a well-formed MERGE INTO
    over the real update DataFrame (temp-view registration included)."""
    from rlr_spark.sources.writers import merge_upsert

    updates = spark.createDataFrame(
        [(1, "Match")], "pair_id int, rlr_label string"
    )

    captured: list[str] = []

    class _SqlSpy:
        def sql(self, text):
            captured.append(text)

    cat = Catalog.__new__(Catalog)
    cat.spark = _SqlSpy()
    cat.root = "/tmp/ice_mock_wh"
    cat.namespace = "rlr"
    cat.iceberg_catalog = "ice"

    merge_upsert(cat, "pairs", updates, ["pair_id"], ["rlr_label"])
    assert len(captured) == 1
    stmt = " ".join(captured[0].split())
    assert stmt == (
        "MERGE INTO ice.rlr.pairs t USING _rlr_updates s "
        "ON t.pair_id = s.pair_id "
        "WHEN MATCHED THEN UPDATE SET t.rlr_label = s.rlr_label"
    )
    # the update relation must be registered under the name the MERGE uses
    assert spark.catalog.tableExists("_rlr_updates")


def test_iceberg_roundtrip_real(spark, tmp_path):
    """Real write/read/MERGE against an Iceberg warehouse — runs whenever
    the jars are on the classpath, skips with reason otherwise."""
    if not iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime jars not shipped in this image; start the "
            "session with spark.jars.packages=org.apache.iceberg:"
            "iceberg-spark-runtime-<spark_ver> to enable this test"
        )
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "ice_wh"))
    from pyspark.sql import functions as F

    from rlr_spark.sources.writers import merge_upsert

    cat = Catalog(spark, str(tmp_path / "ice_wh"), iceberg_catalog="ice")
    df = spark.createDataFrame(
        [(1, ""), (2, "")], "pair_id int, rlr_label string"
    )
    cat.write(df, "pairs")
    assert cat.exists("pairs")
    upd = spark.createDataFrame([(2, "Match")], "pair_id int, rlr_label string")
    merge_upsert(cat, "pairs", upd, ["pair_id"], ["rlr_label"])
    got = {r.pair_id: r.rlr_label for r in cat.read("pairs").collect()}
    assert got == {1: "", 2: "Match"}
    assert cat.read("pairs").where(F.col("rlr_label") == "Match").count() == 1
