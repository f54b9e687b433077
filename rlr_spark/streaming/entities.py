"""Incremental entity resolution: cluster maintenance across micro-batches.

The batch pipeline resolves entities by running connected components
over the WHOLE match graph. In the streaming world new pages (and
therefore new match edges) arrive continuously, and recomputing global
CC per micro-batch is a full-corpus job — the one thing incremental
ingestion exists to avoid. This module maintains cluster assignments
with per-batch work proportional to the BATCH, not the corpus:

  assign/  (node, entity)  — one row per node, written once, in the
           batch the node arrived; hive-bucketed by pmod(xxhash64(node))
           so probes prune to the buckets a batch touches.
  alias/   (old_entity, new_entity) — appended when a batch's edges
           MERGE previously separate entities; the stored member rows
           of the merged entity are never rewritten (that would be a
           corpus-sized write); readers resolve chains instead.

Per batch (``EntityState.update``): probe prior assignments for the
batch's touched nodes only (bucket-pruned), resolve their entities
through the accumulated alias chains, then run CC over the TOUCHED
subgraph — the batch's edges plus one ``(node_uid, prior_entity)`` edge
per previously-known endpoint. A prior entity id participates as a
graph node, so when two old entities are bridged by a new edge the
component's canonical id (min uid — the same rule as the batch
pipeline) covers both, and each non-canonical old id gets ONE alias
row. Entity ids only ever decrease along alias chains (min-rule), so
chains are acyclic; ``assignments()`` resolves them with pointer
doubling (O(log depth) small-table self-joins), and
``compact_aliases`` folds chains flat at epoch boundaries.

Delivery semantics mirror ``incremental_neardup_stream``: per-batch
dynamic partition overwrite + marker files inside the state dir, and
every state read EXCLUDES the current batch's own partitions — a
replayed half-written batch reads exactly the pre-batch state and
rewrites its own partitions byte-identically (effectively exactly-once
under foreachBatch's at-least-once contract).

Node ids are hashed to 64-bit uids (``xxhash64``) — the same trade the
batch pipeline makes at default settings; its uid128 mode is the answer
when 10^12-node collision odds matter.

Composition: call ``update(nodes, match_pairs, batch_id)`` inside the
same ``foreachBatch`` that produced the pairs (e.g. after
``incremental_pairs_batch`` + verification), or replay a pairs table's
``_batch_id`` partitions in order — tested both ways.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _uid(c: Column) -> Column:
    return F.xxhash64(c)


class EntityState:
    """Incremental cluster-assignment state under ``work_dir``."""

    def __init__(self, spark: SparkSession, work_dir: str, buckets: int = 64):
        self.spark = spark
        self.work_dir = work_dir
        self.buckets = buckets
        self.assign_dir = os.path.join(work_dir, "assign")
        self.alias_dir = os.path.join(work_dir, "alias")
        self.applied_dir = os.path.join(work_dir, "_applied")
        os.makedirs(self.applied_dir, exist_ok=True)

    # -- state IO ----------------------------------------------------------

    def _read_or_empty(self, path: str, schema: str) -> DataFrame:
        if os.path.isdir(path):
            for _root, _dirs, files in os.walk(path):
                if any(f.endswith(".parquet") for f in files):
                    return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], schema)

    def _assign(self) -> DataFrame:
        return self._read_or_empty(
            self.assign_dir, "node string, entity long, _nb int, _batch_id int"
        )

    def _alias(self) -> DataFrame:
        return self._read_or_empty(
            self.alias_dir, "old_entity long, new_entity long, _batch_id int"
        )

    def _overwrite(self, df: DataFrame, path: str, batch_id: int) -> None:
        part_cols = [c for c in ("_nb",) if c in df.columns] + ["_batch_id"]
        (
            df.withColumn("_batch_id", F.lit(int(batch_id)).cast("int"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .parquet(path)
        )

    # -- alias resolution ---------------------------------------------------

    @staticmethod
    def _resolve_roots(alias: DataFrame, max_doubling: int = 20) -> DataFrame:
        """(old_entity, root) with chains followed to their end — pointer
        doubling, so depth d needs ~log2(d) self-joins. The alias
        relation is merges-sized (small next to the corpus); each
        doubling is a small-table join + one count. Ids strictly
        decrease along chains (min-rule), so no cycles."""
        cur = alias.select("old_entity", F.col("new_entity").alias("root"))
        for _ in range(max_doubling):
            cur = cur.localCheckpoint(eager=True)
            step = cur.select(
                F.col("old_entity").alias("o"), F.col("root").alias("r")
            )
            nxt = cur.join(
                step.withColumnRenamed("o", "root_o"),
                cur["root"] == F.col("root_o"),
                "left",
            ).select(
                "old_entity", F.coalesce("r", "root").alias("root")
            )
            # converged when no root is itself an aliased id
            pending = nxt.join(
                alias.select(F.col("old_entity").alias("root")), "root", "left_semi"
            ).count()
            cur = nxt
            if pending == 0:
                break
        else:  # pragma: no cover - 2^20-deep chains don't occur
            print("[EntityState] alias chains deeper than 2^20?", file=sys.stderr)
        return cur

    # -- the per-batch update ------------------------------------------------

    def update(
        self, nodes: DataFrame, pairs: DataFrame, batch_id: int,
        id_col: str = "node", l_col: str = "l_id", r_col: str = "r_id",
    ) -> None:
        """Fold one micro-batch into the state.

        ``nodes``: this batch's NEW nodes (one column ``id_col``);
        ``pairs``: this batch's verified match edges (``l_col``,
        ``r_col`` — may reference nodes from any earlier batch).
        Idempotent per ``batch_id`` (marker + partition overwrite +
        prior-state reads excluding this batch's own partitions).
        """
        marker = os.path.join(self.applied_dir, f"batch_{batch_id}")
        if os.path.exists(marker):
            return
        B = self.buckets
        bid = int(batch_id)

        edges = pairs.select(
            F.col(l_col).alias("l"), F.col(r_col).alias("r")
        ).localCheckpoint(eager=True)
        touched = (
            nodes.select(F.col(id_col).alias("node"))
            .unionByName(edges.select(F.col("l").alias("node")))
            .unionByName(edges.select(F.col("r").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )

        # prior state, EXCLUDING this batch's own (possibly half-written)
        # partitions, pruned to the buckets the batch touches
        assign = self._assign().where(F.col("_batch_id") != bid)
        tb = [
            r.b
            for r in touched.select(
                F.pmod(_uid(F.col("node")), F.lit(B)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        ]
        if len(tb) < B:
            assign = assign.where(F.col("_nb").isin(tb))
        prior = assign.join(touched, "node", "left_semi").select("node", "entity")

        alias = self._alias().where(F.col("_batch_id") != bid).select(
            "old_entity", "new_entity"
        )
        roots = self._resolve_roots(alias)
        prior_res = (
            prior.join(roots, prior["entity"] == roots["old_entity"], "left")
            .select(
                "node",
                F.coalesce(F.col("root"), F.col("entity")).alias("entity"),
            )
            .localCheckpoint(eager=True)
        )

        # CC over the touched subgraph: batch edges + one (uid, entity)
        # edge per previously-known endpoint — prior entities join the
        # graph as nodes, so merges surface as components spanning them
        from rlr_spark.operators.cluster import connected_components

        num_edges = (
            edges.select(_uid(F.col("l")).alias("u"), _uid(F.col("r")).alias("v"))
            .unionByName(
                prior_res.select(
                    _uid(F.col("node")).alias("u"), F.col("entity").alias("v")
                )
            )
        )
        comp = connected_components(num_edges).localCheckpoint(eager=True)

        # new nodes: assignment = component of their uid, else own uid
        new_nodes = touched.join(prior_res.select("node"), "node", "left_anti")
        assign_new = (
            new_nodes.withColumn("_uid", _uid(F.col("node")))
            .join(comp, F.col("_uid") == comp["node"], "left")
            .select(
                new_nodes["node"],
                F.coalesce(comp["entity_id"], F.col("_uid")).alias("entity"),
            )
            .withColumn("_nb", F.pmod(_uid(F.col("node")), F.lit(B)).cast("int"))
        )
        # merged prior entities: entity id participated as a graph node
        # and landed in a component with a smaller canonical id
        alias_new = (
            prior_res.select(F.col("entity").alias("old_entity"))
            .distinct()
            .join(comp, F.col("old_entity") == comp["node"], "inner")
            .where(F.col("entity_id") != F.col("old_entity"))
            .select("old_entity", F.col("entity_id").alias("new_entity"))
        )

        self._overwrite(assign_new, self.assign_dir, bid)
        self._overwrite(alias_new, self.alias_dir, bid)
        with open(marker + ".tmp", "w") as f:
            f.write("applied")
        os.replace(marker + ".tmp", marker)

    # -- read API -------------------------------------------------------------

    def assignments(self) -> DataFrame:
        """(node, entity) with alias chains fully resolved."""
        assign = self._assign().select("node", "entity")
        roots = self._resolve_roots(self._alias().select("old_entity", "new_entity"))
        return assign.join(
            roots, assign["entity"] == roots["old_entity"], "left"
        ).select(
            "node", F.coalesce(F.col("root"), F.col("entity")).alias("entity")
        )

    def compact_aliases(self, batch_id: int) -> None:
        """Epoch maintenance: rewrite the alias table with every chain
        flattened to its root, as this batch's single partition — reads
        after compaction resolve in one hop, and the per-batch alias
        partition listing collapses. Same overwrite+marker discipline
        (idempotent per batch_id); assign rows are never rewritten."""
        marker = os.path.join(self.applied_dir, f"compact_{batch_id}")
        if os.path.exists(marker):
            return
        alias = self._alias().select("old_entity", "new_entity")
        flat = self._resolve_roots(alias).select(
            "old_entity", F.col("root").alias("new_entity")
        )
        tmp = self.alias_dir + ".next"
        (
            flat.withColumn("_batch_id", F.lit(int(batch_id)).cast("int"))
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .parquet(tmp)
        )
        import shutil

        old = self.alias_dir + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(self.alias_dir):
            os.replace(self.alias_dir, old)
        os.replace(tmp, self.alias_dir)
        with open(marker + ".tmp", "w") as f:
            f.write("applied")
        os.replace(marker + ".tmp", marker)
        shutil.rmtree(old, ignore_errors=True)
