"""Incremental survivorship: golden records maintained per micro-batch.

Batch survivorship (operators/cluster.py `golden_records`) re-reads
every member record of every entity. In the streaming ER path
(streaming/entities.py `EntityState`) that would mean a corpus-sized
scan per micro-batch — exactly the shape that design forbids. This
module keeps golden records CURRENT with per-batch work proportional
to the batch, by restricting survivorship to *associative* rules
(count / min / max / min_by / max_by): each entity's golden row is a
foldable aggregate state, so

    golden(entity, all records) = fold(golden(prior), agg(new records))

and a merge of entities folds their two states. Mode-style rules are
deliberately NOT offered here — mode is not associative without a
full per-value count table; use the batch `golden_records` for that.

State layout mirrors EntityState: parquet partitioned by
(_gb = entity-uid bucket, _batch_id), one row per (entity, version).
Every update writes a CUMULATIVE row (prior fold + batch partial)
under this batch's partition, so the read API is "latest version per
entity" — no re-folding across batches (which would double count) and
replayed batches overwrite only their own partitions (same
marker + dynamic-overwrite idempotency as EntityState).

Per-batch cost: one batch-sized groupBy, one bucket-pruned semi-join
read of prior rows for TOUCHED entities only, one bucket-shuffled
write. Nothing scans untouched state.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rlr_spark.streaming.state import (
    advance_watermark,
    guard_renumbered_stream,
    marker_exists,
    overwrite_batch_partition,
    resolve_effective_batch,
    write_marker,
)

Rule = tuple  # ("count",) | ("min"|"max", col) | ("min_by"|"max_by", val, key)

_VALID = {"count", "min", "max", "min_by", "max_by"}


class GoldenState:
    """Associative golden-record state over a streaming entity feed.

    ``rules``: {out_name: ("count",) | ("min", col) | ("max", col) |
    ("min_by", value_col, key_col) | ("max_by", value_col, key_col)}.
    min_by/max_by keep the value whose key is smallest/largest across
    ALL records ever seen for the entity (ties resolved by the
    engine's min_by, deterministic when keys are distinct — use a
    unique key like a record uid to make survivorship reproducible).
    """

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        rules: dict[str, Rule],
        buckets: int = 64,
    ):
        for name, r in rules.items():
            if not r or r[0] not in _VALID:
                raise ValueError(f"bad rule for {name!r}: {r!r}")
        self.spark = spark
        self.work_dir = work_dir
        self.rules = dict(rules)
        self.buckets = buckets
        self.golden_dir = os.path.join(work_dir, "golden")
        self.applied_dir = os.path.join(work_dir, "applied")
        os.makedirs(self.applied_dir, exist_ok=True)

    # -- expression builders ---------------------------------------------------

    def _partial_exprs(self) -> list[Column]:
        """Aggregate raw member rows into one state row per entity."""
        out: list[Column] = []
        for name, r in self.rules.items():
            kind = r[0]
            if kind == "count":
                out.append(F.count(F.lit(1)).alias(name))
            elif kind == "min":
                out.append(F.min(r[1]).alias(name))
            elif kind == "max":
                out.append(F.max(r[1]).alias(name))
            elif kind == "min_by":
                out.append(F.min_by(r[1], r[2]).alias(name))
                out.append(F.min(r[2]).alias(f"{name}__key"))
            elif kind == "max_by":
                out.append(F.max_by(r[1], r[2]).alias(name))
                out.append(F.max(r[2]).alias(f"{name}__key"))
        return out

    def _merge_exprs(self) -> list[Column]:
        """Fold two or more state rows of one entity (associative)."""
        out: list[Column] = []
        for name, r in self.rules.items():
            kind = r[0]
            if kind == "count":
                out.append(F.sum(name).alias(name))
            elif kind == "min":
                out.append(F.min(name).alias(name))
            elif kind == "max":
                out.append(F.max(name).alias(name))
            elif kind == "min_by":
                out.append(F.min_by(name, f"{name}__key").alias(name))
                out.append(F.min(f"{name}__key").alias(f"{name}__key"))
            elif kind == "max_by":
                out.append(F.max_by(name, f"{name}__key").alias(name))
                out.append(F.max(f"{name}__key").alias(f"{name}__key"))
        return out

    def _state_cols(self) -> list[str]:
        cols: list[str] = []
        for name, r in self.rules.items():
            cols.append(name)
            if r[0] in ("min_by", "max_by"):
                cols.append(f"{name}__key")
        return cols

    def _bucket(self, entity: Column) -> Column:
        return F.pmod(entity, F.lit(self.buckets)).cast("int")

    def _read_state(self) -> DataFrame | None:
        if not os.path.isdir(self.golden_dir):
            return None
        return self.spark.read.parquet(self.golden_dir)

    @staticmethod
    def _latest_per_entity(state: DataFrame, cols: list[str]) -> DataFrame:
        """Each update row is cumulative, so only the newest version of
        each entity is live; earlier versions are subsumed history.
        A latest row that is a tombstone means the entity merged away —
        its state lives inside the survivor — so it is dropped."""
        all_cols = [*cols, "_tomb"]
        picked = F.max_by(F.struct(*all_cols), F.col("_batch_id")).alias("_s")
        g = state.groupBy("entity").agg(picked)
        return (
            g.where(~F.col("_s._tomb"))
            .select("entity", *[F.col(f"_s.{c}").alias(c) for c in cols])
        )

    # -- write path -------------------------------------------------------------

    def update(
        self,
        members: DataFrame,
        merges: DataFrame | None,
        batch_id: int,
        entity_col: str = "entity",
    ) -> None:
        """Fold one micro-batch of member rows (and entity merges) in.

        ``members``: (entity_col, attribute columns...) — this batch's
        NEW records, already assigned to their (resolved) entity by
        EntityState. ``merges``: (old_entity, new_entity) — this
        batch's alias rows, so the states of merged entities fold into
        the survivor. Idempotent per batch_id.
        """
        if int(batch_id) < 0:
            raise ValueError("batch_id must be >= 0 (negative ids are reserved)")
        # same effective-id discipline as EntityState (ADVICE r6): raw
        # ids are only unique per CHECKPOINT, so a wiped/relocated
        # checkpoint restarting at 0 must not dynamic-overwrite old
        # batch-0 golden partitions — the generation token + watermark
        # offset new-generation ids past everything ever applied, and
        # the guard refuses out-of-band renumbering.
        bid = resolve_effective_batch(self.work_dir, self.applied_dir, batch_id)
        if marker_exists(self.applied_dir, f"golden_{bid}"):
            advance_watermark(self.work_dir, bid)
            return
        guard_renumbered_stream(
            self.work_dir, self.applied_dir, bid, marker_prefix="golden"
        )
        cols = self._state_cols()
        m = (
            members.withColumnRenamed(entity_col, "entity")
            if entity_col != "entity"
            else members
        )
        partial = m.groupBy("entity").agg(*self._partial_exprs())
        mg = (
            merges.select("old_entity", "new_entity").localCheckpoint(eager=True)
            if merges is not None and merges.columns
            else None
        )
        touched = partial.select("entity")
        if mg is not None:
            touched = touched.unionByName(
                mg.select(F.col("old_entity").alias("entity"))
            ).unionByName(mg.select(F.col("new_entity").alias("entity")))
        touched = touched.distinct().localCheckpoint(eager=True)

        prior = self._read_state()
        if prior is not None:
            prior = prior.where(F.col("_batch_id") != bid)
            tb = [
                r.b
                for r in touched.select(self._bucket(F.col("entity")).alias("b"))
                .distinct()
                .collect()
            ]
            if len(tb) < self.buckets:
                prior = prior.where(F.col("_gb").isin(tb))
            prior = self._latest_per_entity(
                prior.join(touched, "entity", "left_semi"), cols
            )
            if mg is not None:
                # remap merged-away entities onto their survivor before
                # folding; single-hop is enough because EntityState
                # aliases within one batch already point at roots
                prior = (
                    prior.join(
                        mg, prior["entity"] == mg["old_entity"], "left"
                    )
                    .select(
                        F.coalesce(F.col("new_entity"), F.col("entity")).alias(
                            "entity"
                        ),
                        *cols,
                    )
                )
            folded = (
                prior.unionByName(partial)
                .groupBy("entity")
                .agg(*self._merge_exprs())
            )
        else:
            folded = partial
        out = folded.withColumn("_tomb", F.lit(False))
        if mg is not None:
            # tombstone every merged-away entity AT THIS VERSION: its
            # state is now inside the survivor's folded row, and the
            # read path must stop surfacing its older live rows —
            # without this, a merge would double-expose (and a read-
            # time remap would double-COUNT) the old entity's state
            tombs = mg.select(F.col("old_entity").alias("entity")).distinct()
            for c in cols:
                tombs = tombs.withColumn(c, F.lit(None))
            out = out.unionByName(tombs.withColumn("_tomb", F.lit(True)))
        out = out.withColumn("_gb", self._bucket(F.col("entity")))
        overwrite_batch_partition(out, self.golden_dir, bid, bucket_cols=("_gb",))
        write_marker(self.applied_dir, f"golden_{bid}")
        advance_watermark(self.work_dir, bid)

    # -- read path --------------------------------------------------------------

    def golden(self) -> DataFrame:
        """Current golden rows: latest live version per entity.
        Merges are fully applied at update time (fold + tombstone), so
        no read-time remapping is needed — and none would be safe: the
        survivor's row already contains the merged state, so remapping
        stale rows onto it would double-count."""
        state = self._read_state()
        cols = self._state_cols()
        if state is None:
            raise FileNotFoundError(f"no golden state at {self.golden_dir}")
        return self._latest_per_entity(state, cols)
