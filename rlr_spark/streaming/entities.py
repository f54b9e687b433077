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


#: the alias partition compaction rewrites into — NEGATIVE so a stream
#: batch_id (>= 0 always; asserted) can never collide with it: update's
#: "exclude my own partitions" read would otherwise drop the ENTIRE
#: compacted alias table in the batch whose id equals a past epoch
_COMPACTED_PARTITION = -1


class EntityState:
    """Incremental cluster-assignment state under ``work_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        buckets: int = 64,
        auto_compact_rounds: int | None = 1,
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.buckets = buckets
        # alias maintenance on the MEASURED signal (the _resolve_roots
        # docstring has always said deployments should trigger on
        # last_resolve_rounds rather than a fixed epoch): when a batch's
        # chain resolution needed more than this many pointer-doubling
        # rounds, fold the chains flat right after the batch commits.
        # The default (1) compacts as soon as any chain reaches depth
        # >= 3: r rounds cover depth 2^r, so update-time resolves stay
        # <= 2 rounds and a post-batch read never exceeds 2 either
        # (depth at most trigger-depth + 1). The alias table is
        # merges-sized, so the fold is cheap next to the 2 driver-
        # blocking jobs every extra resolve round costs each batch.
        # Each round is a driver-blocking checkpoint + count, so letting
        # depth drift costs every subsequent batch AND the final read;
        # compaction is idempotent/crash-safe and content-preserving.
        # None disables (callers that schedule their own epochs).
        self.auto_compact_rounds = auto_compact_rounds
        self.assign_dir = os.path.join(work_dir, "assign")
        self.alias_dir = os.path.join(work_dir, "alias")
        self.applied_dir = os.path.join(work_dir, "_applied")
        os.makedirs(self.applied_dir, exist_ok=True)
        # scheme guard (same invariant as the near-dup stream's): the
        # assign table's _nb partitioning is a function of the bucket
        # count, so reopening existing state with a different `buckets`
        # would silently misroute every prior-assignment probe — stale
        # entities, lost merges, duplicate assign rows. Refuse instead.
        scheme = f"entities-uid64-B{buckets}"
        scheme_path = os.path.join(work_dir, "_scheme")
        if os.path.exists(scheme_path):
            with open(scheme_path) as f:
                existing = f.read().strip()
            if existing != scheme:
                raise ValueError(
                    f"entity state at {work_dir} was built with scheme "
                    f"'{existing}', incompatible with '{scheme}' — probes "
                    "would miss prior assignments (silently wrong clusters)."
                    " Rebuild the state or use a fresh work_dir."
                )
        else:
            with open(scheme_path + ".tmp", "w") as f:
                f.write(scheme)
            os.replace(scheme_path + ".tmp", scheme_path)
        self._recover_compaction()

    # -- state IO (shared exactly-once discipline: streaming/state.py) ----

    def _assign(self) -> DataFrame:
        from rlr_spark.streaming.state import read_or_empty

        return read_or_empty(
            self.spark,
            self.assign_dir,
            "node string, entity long, _nb int, _batch_id int",
        )

    def _alias(self) -> DataFrame:
        from rlr_spark.streaming.state import read_or_empty

        return read_or_empty(
            self.spark,
            self.alias_dir,
            "old_entity long, new_entity long, _batch_id int",
        )

    def _overwrite(self, df: DataFrame, path: str, batch_id: int) -> None:
        from rlr_spark.streaming.state import overwrite_batch_partition

        overwrite_batch_partition(df, path, batch_id, bucket_cols=("_nb",))

    def _recover_compaction(self) -> None:
        """Finish or discard a compaction interrupted by a crash — see
        :meth:`compact_aliases` for the window analysis. Runs at init
        so a restarted process never reads a half-swapped alias dir."""
        import shutil

        nxt, old = self.alias_dir + ".next", self.alias_dir + ".old"
        if not os.path.isdir(self.alias_dir) and os.path.isdir(nxt):
            # crashed between the two swaps: the new table is complete
            # (it is written before any swap) — install it
            os.replace(nxt, self.alias_dir)
        if os.path.isdir(self.alias_dir):
            # crashed before the first swap (stale .next) or after the
            # second (leftover .old): both are safe to discard
            shutil.rmtree(nxt, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)

    # -- alias resolution ---------------------------------------------------

    def _resolve_roots(self, alias: DataFrame, max_doubling: int = 20) -> DataFrame:
        """(old_entity, root) with chains followed to their end — pointer
        doubling, so depth d needs ~log2(d) self-joins. The alias
        relation is merges-sized (small next to the corpus); each
        doubling is a small-table join + one count. Ids strictly
        decrease along chains (min-rule), so no cycles.

        COMPACTION CADENCE: every doubling round is a driver-blocking
        count + localCheckpoint, so per-batch update latency grows with
        log2(max chain depth since the last :meth:`compact_aliases`).
        Depth grows at most 1 per batch, and ONLY when a batch re-roots
        an existing cluster onto a new smaller-UID node (entity ids are
        xxhash64 uids, so a new node wins the min-rule with probability
        ~1/cluster-members-seen — random arrival orders grow depth
        ~log(merges), measured 1-2 rounds across 50 random batches).
        After r rounds the resolver covers chains of depth 2^r, and
        compaction flattens everything to depth 1 — so compacting every
        <= 3 merge-heavy batches guarantees <= 2 rounds even against an
        adversarial uid-descending arrival order, and an epoch of ~16 is
        in practice still 1-2 rounds. Measured, both regimes:
        tests/test_entities.py::test_compaction_cadence_bounds_rounds.
        The rounds used by the latest resolve are exposed as
        ``self.last_resolve_rounds`` so deployments can trigger
        compaction on the measured signal instead of a fixed epoch.
        """
        cur = alias.select("old_entity", F.col("new_entity").alias("root"))
        self.last_resolve_rounds = 0
        if alias.isEmpty():  # the common no-merges-yet path: skip the
            return cur       # checkpoint/join/count jobs entirely
        for _ in range(max_doubling):
            self.last_resolve_rounds += 1
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
        from rlr_spark.streaming.state import (
            advance_watermark,
            guard_renumbered_stream,
            marker_exists,
            resolve_effective_batch,
            write_marker,
        )

        if int(batch_id) < 0:
            raise ValueError("batch_id must be >= 0 (negative ids are reserved)")
        # map the checkpoint-scoped id to a state-lifetime-unique one:
        # markers may be relocated into a streaming checkpoint (see
        # incremental_neardup_stream) and share its fate, but the
        # generation token + watermark live in THIS state dir — a wiped
        # checkpoint starts a new generation whose ids offset past
        # everything ever applied, so a renumbered stream can never
        # collide with retained _batch_id partitions (streaming/state.py)
        bid = resolve_effective_batch(self.work_dir, self.applied_dir, batch_id)
        if marker_exists(self.applied_dir, f"batch_{bid}"):
            # re-raise the watermark: a crash BETWEEN the marker write
            # and the watermark advance replays here, and the watermark
            # must still catch up (monotonic, so a no-op otherwise)
            advance_watermark(self.work_dir, bid)
            return
        # backstop against out-of-band tampering (cannot fire for wipe
        # or crash-replay scenarios — see guard docstring)
        guard_renumbered_stream(self.work_dir, self.applied_dir, bid)
        B = self.buckets

        # lazy checkpoints: each still materializes exactly once (at
        # its first consuming job) and truncates lineage, but skips the
        # synchronous stand-alone job an eager checkpoint runs — three
        # fewer driver round-trips per micro-batch on tiny relations
        edges = pairs.select(
            F.col(l_col).alias("l"), F.col(r_col).alias("r")
        ).localCheckpoint(eager=False)
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
            .localCheckpoint(eager=False)
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
        comp = connected_components(num_edges).localCheckpoint(eager=False)

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
        write_marker(self.applied_dir, f"batch_{bid}")
        advance_watermark(self.work_dir, bid)
        # measured-signal alias maintenance: this batch's resolve needed
        # > auto_compact_rounds doubling rounds, so chains have drifted
        # deep enough to tax every later resolve — flatten now (safe
        # here: foreachBatch is synchronous and this batch is committed;
        # the marker keys idempotency on the effective batch id)
        if (
            self.auto_compact_rounds is not None
            and self.last_resolve_rounds > self.auto_compact_rounds
        ):
            self.compact_aliases(f"auto_{bid}")

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

    def compact_aliases(self, epoch_id: int) -> None:
        """Epoch maintenance: rewrite the alias table with every chain
        flattened to its root — reads after compaction resolve in one
        hop, and the per-batch alias partition listing collapses.
        Assign rows are never rewritten.

        The flattened table lands under the RESERVED partition
        ``_batch_id = -1`` (never a stream batch id, which are >= 0),
        so a later ``update`` whose batch_id happens to equal a past
        epoch can't exclude the whole alias table from its prior-state
        read. ``epoch_id`` only names the idempotency marker.

        Crash-safe swap: the new table is fully written to ``.next``
        BEFORE any swap; the only window with ``alias/`` missing is
        between the two renames, where ``.next`` is complete —
        :meth:`_recover_compaction` (run at init) installs it. A crash
        earlier leaves ``alias/`` untouched with a stale ``.next`` to
        discard; a crash after the second rename leaves only ``.old``
        litter.
        """
        import shutil

        from rlr_spark.streaming.state import marker_exists, write_marker

        self._recover_compaction()
        if marker_exists(self.applied_dir, f"compact_{epoch_id}"):
            return
        alias = self._alias().select("old_entity", "new_entity")
        flat = self._resolve_roots(alias).select(
            "old_entity", F.col("root").alias("new_entity")
        )
        nxt, old = self.alias_dir + ".next", self.alias_dir + ".old"
        (
            flat.withColumn(
                "_batch_id", F.lit(_COMPACTED_PARTITION).cast("int")
            )
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .parquet(nxt)
        )
        if os.path.isdir(self.alias_dir):
            os.replace(self.alias_dir, old)
        os.replace(nxt, self.alias_dir)
        write_marker(self.applied_dir, f"compact_{epoch_id}")
        shutil.rmtree(old, ignore_errors=True)
