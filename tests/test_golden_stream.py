"""Incremental survivorship (streaming/golden.py): per-batch folded
golden records must equal batch survivorship over everything seen,
including entity merges and replayed batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rlr_spark.streaming.entities import EntityState
from rlr_spark.streaming.golden import GoldenState

RULES = {
    "n_members": ("count",),
    "first_seen": ("min", "ts"),
    "best_name": ("max_by", "name", "quality"),
}


def _members(spark, rows):
    return spark.createDataFrame(
        rows, "entity long, ts long, name string, quality long"
    )


def test_fold_across_batches(spark, tmp_path):
    gs = GoldenState(spark, str(tmp_path / "g"), RULES, buckets=4)
    gs.update(_members(spark, [(1, 10, "aa", 5), (1, 20, "bb", 9)]), None, 0)
    gs.update(_members(spark, [(1, 5, "cc", 7), (2, 50, "dd", 1)]), None, 1)
    got = {r.entity: (r.n_members, r.first_seen, r.best_name)
           for r in gs.golden().collect()}
    assert got == {1: (3, 5, "bb"), 2: (1, 50, "dd")}


def test_merge_folds_and_tombstones(spark, tmp_path):
    gs = GoldenState(spark, str(tmp_path / "g"), RULES, buckets=4)
    gs.update(_members(spark, [(1, 10, "aa", 5)]), None, 0)
    gs.update(_members(spark, [(2, 3, "bb", 9)]), None, 1)
    # batch 2: entity 2 merges into 1, no new members for either
    merges = spark.createDataFrame([(2, 1)], "old_entity long, new_entity long")
    gs.update(_members(spark, []), merges, 2)
    rows = gs.golden().collect()
    got = {r.entity: (r.n_members, r.first_seen, r.best_name) for r in rows}
    # survivor carries both; merged-away entity no longer surfaces
    assert got == {1: (2, 3, "bb")}


def test_replay_is_idempotent(spark, tmp_path):
    gs = GoldenState(spark, str(tmp_path / "g"), RULES, buckets=4)
    gs.update(_members(spark, [(1, 10, "aa", 5)]), None, 0)
    gs.update(_members(spark, [(1, 20, "bb", 9)]), None, 1)
    # replay batch 1 (marker present -> no-op)
    gs.update(_members(spark, [(1, 20, "bb", 9)]), None, 1)
    got = gs.golden().collect()
    assert len(got) == 1 and got[0].n_members == 2


def test_bad_rule_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        GoldenState(spark, str(tmp_path / "g"), {"x": ("mode", "c")})


def test_composed_with_entity_state_matches_batch_survivorship(spark, tmp_path):
    """Full composition: EntityState assigns + merges, GoldenState folds —
    final golden rows must equal a from-scratch batch aggregation of all
    records under the final entity assignment."""
    st = EntityState(spark, str(tmp_path / "ents"), buckets=8)
    gs = GoldenState(spark, str(tmp_path / "g"), RULES, buckets=8)

    batches = [
        # (records: (node, ts, name, quality), pairs)
        ([("a", 10, "A0", 3), ("b", 11, "B0", 8)], []),
        ([("c", 12, "C0", 5)], [("a", "b")]),       # a-b merge
        ([("d", 13, "D0", 9)], [("c", "d"), ("b", "c")]),  # all into one
        ([("e", 14, "E0", 1)], []),
    ]
    all_records = []
    for bid, (recs, pairs) in enumerate(batches):
        all_records.extend(recs)
        nodes = spark.createDataFrame([(r[0],) for r in recs], "node string")
        pdf = spark.createDataFrame(pairs or [], "l_id string, r_id string")
        st.update(nodes, pdf, bid)
        # this batch's members with their CURRENT entity assignment
        recs_df = spark.createDataFrame(
            recs, "node string, ts long, name string, quality long"
        )
        assigned = recs_df.join(st.assignments(), "node").select(
            "entity", "ts", "name", "quality"
        )
        this_batch_merges = (
            st._alias()
            .where(F.col("_batch_id") == bid)
            .select("old_entity", "new_entity")
        )
        gs.update(assigned, this_batch_merges, bid)

    got = {
        r.entity: (r.n_members, r.first_seen, r.best_name)
        for r in gs.golden().collect()
    }
    # batch oracle: aggregate all records under the FINAL assignment
    recs_df = spark.createDataFrame(
        all_records, "node string, ts long, name string, quality long"
    )
    want_df = (
        recs_df.join(st.assignments(), "node")
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("fs"),
            F.max_by("name", "quality").alias("bn"),
        )
    )
    want = {r.entity: (r.n, r.fs, r.bn) for r in want_df.collect()}
    assert got == want
    # and the merged-away entities are not surfaced
    assert len(got) == len(want)
