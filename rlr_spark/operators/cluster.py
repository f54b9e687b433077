"""Transitive clustering: large-star/small-star connected components.

Implements Kiveris et al., "Connected Components in MapReduce and
Beyond" (SOCC'14) directly in DataFrame ops — GraphFrames is an external
package and GraphX has no Python API (SURVEY.md §2.3). Converges in
O(log^2 n) rounds on pathological graphs; planted duplicate clusters
(tiny diameter) converge in 2-3 rounds.

    large-star: for each node u (edges made bidirectional), let
        m = min(N(u) ∪ {u}); emit (v, m) for every neighbor v > u.
    small-star: orient edges large→small; let m = min(N(u) ∪ {u});
        emit (v, m) for v ∈ N(u) ∪ {u}, v ≠ m.

Fixpoint when the canonical edge set stops changing. Each round is
``localCheckpoint``-ed (or written through the catalog when provided) to
truncate lineage — Catalyst has no recursion and an uncheckpointed loop
grows the plan exponentially (north_star: "checkpointed frontier
DataFrames").

Output: assignment (node, entity_id) with entity_id = min node id of the
component — deterministic, golden-comparable (never
``monotonically_increasing_id``, SURVEY.md §7.3).

Nodes are ``long``; string keys (urls) are mapped through a dictionary
beforehand (:func:`cluster_pairs`) because 8-byte shuffle keys beat
200-byte urls at 10^12 scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (u>v) ordered pairs, no self-loops, deduped."""
    return (
        edges.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    bidir = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least(F.col("_mn"), F.col("u")).alias("m"))
    )
    return (
        bidir.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = _canonical(edges)  # u > v: from larger to smaller
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    neighbor_links = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    center_links = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        neighbor_links.unionByName(center_links)
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def _local_components(edges: DataFrame) -> DataFrame:
    """Driver-side connected components for edge sets that fit in memory.

    Arrow collect (toPandas), then fully-vectorized min-label
    propagation in numpy: hook every edge endpoint to the min label,
    pointer-jump (``L = L[L]``) to a fixpoint, repeat until every edge
    is monochrome. entity_id = min node id of the component --
    bit-identical to the distributed path's output. A row-at-a-time
    Python union-find was seconds at 10^6 edges; this is ~0.2 s.
    """
    import numpy as np
    import pandas as pd

    spark = edges.sparkSession
    pdf = edges.toPandas()
    if pdf.empty:
        return spark.createDataFrame([], "node long, entity_id long")
    u = pdf["u"].to_numpy(np.int64, copy=False)
    v = pdf["v"].to_numpy(np.int64, copy=False)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        mn = np.minimum(label[ui], label[vi])
        np.minimum.at(label, ui, mn)
        np.minimum.at(label, vi, mn)
        while True:
            jumped = label[label]
            if np.array_equal(jumped, label):
                break
            label = jumped
        if np.array_equal(label[ui], label[vi]):
            break
    assign = pd.DataFrame({"node": nodes, "entity_id": nodes[label]})
    # Arrow upload: two int64 buffers, not 10^6 pickled rows
    return spark.createDataFrame(assign)


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    rounds_per_check: int = 2,
    local_threshold: int = 8_000_000,
) -> DataFrame:
    """edges(u long, v long) -> assignment(node long, entity_id long).

    Singleton nodes (no edges) are the caller's concern — join the
    result back with a coalesce to self (see :func:`cluster_pairs`).

    Size-gated hybrid (the CC analogue of AQE's broadcast-join cutover):
    when the deduped edge set is at most ``local_threshold`` rows
    (16 bytes/edge — two 64 MB Arrow int64 buffers at the default, a
    few hundred MB of numpy working set against a 16 GB driver), the
    O(log^2 n) distributed star loop is pure scheduler latency, so the
    components finish driver-side with vectorized min-label propagation
    (same min-id entity ids, one Arrow collect). Measured at the 2.4M-
    page corpus (3.16M match edges): the star loop took 24.3 s of
    round-trip-bound wall; the local path is ~1 s. Above the threshold
    — the 10^12-row regime where the match graph has billions of edges
    — the distributed large-star/small-star loop runs.

    ``rounds_per_check`` star-rounds run between checkpoints/convergence
    fingerprints: each fingerprint is a driver round-trip, and the loop
    is latency-bound, so batching rounds per job halves the fixed cost;
    star rounds on a converged graph are idempotent, so the possible
    extra round is harmless.
    """
    spark = edges.sparkSession
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")

    # The fixpoint loop is latency-bound, not throughput-bound: each star
    # round is a shuffle over the (shrinking) edge set, and at web scale
    # the match-edge set is orders of magnitude smaller than the pair
    # table. The loop therefore minimizes *jobs per round*: checkpoints
    # are lazy (eager=False) and the per-round fingerprint aggregation is
    # the single job that materializes the checkpoint, checks
    # convergence, AND supplies the edge count — one job per round
    # instead of three. try/finally restores the session's shuffle
    # parallelism even if an executor loss aborts mid-iteration.
    try:
        cur = _canonical(edges).localCheckpoint(eager=False)
        n_edges, _ = _fingerprint(cur)
        if n_edges <= local_threshold:
            return _local_components(cur)
        # size the loop's shuffle parallelism to the (small) edge set
        # instead of inheriting the pair-stage setting — hundreds of
        # near-empty reduce tasks per round dominate wall-clock otherwise
        loop_sp = max(1, min(int(old_sp), n_edges // 200_000 + 1))
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_sp))

        prev_fp: tuple[int, int] | None = None
        for _ in range(max_iter):
            nxt = cur
            for _r in range(max(rounds_per_check, 1)):
                nxt = _small_star(_large_star(nxt))
            nxt = nxt.localCheckpoint(eager=False)
            fp = _fingerprint(nxt)
            if fp == prev_fp:
                cur = nxt
                break
            prev_fp = fp
            cur = nxt
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)

    # converged: star graphs, every edge points member -> component min
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("entity_id"))
    centers = cur.select(F.col("v").alias("node"), F.col("v").alias("entity_id")).distinct()
    return (
        members.unionByName(centers)
        .groupBy("node")
        .agg(F.min("entity_id").alias("entity_id"))
    )


def _dense_ids(ids: DataFrame) -> DataFrame:
    """Exact dense dictionary (_id, _nid): DISTRIBUTED range-sort +
    zipWithIndex — deterministic given the global sort order.

    The collision fallback for the xxhash64 node dictionary. A
    row_number() over an unpartitioned window would pull every id
    through one reducer — a driver-killer at 10^9+ ids, where a 64-bit
    birthday collision is in fact expected.
    """
    rdd = ids.sort("_id").rdd.zipWithIndex()
    return (
        rdd.map(lambda t: (t[0]["_id"], int(t[1])))
        .toDF(["_id", "_nid"])
        .select("_id", F.col("_nid").cast("long").alias("_nid"))
    )


def node_dictionary(ids: DataFrame) -> DataFrame:
    """ids(_id) -> exact (_id, _nid long) node dictionary.

    Integral ids pass through (the id IS the node: no hash, no check,
    zero extra jobs). Anything else — strings, 128-bit uid structs —
    gets xxhash64 labels with ONE fused count/countDistinct collision
    check (a hash collision would MERGE two entities, so the dictionary
    must be exact) and the sorted ``_dense_ids`` fallback on the ~never
    collision. Shared by :func:`cluster_pairs` and the pipeline's
    128-bit-uid cluster stage — one copy of a correctness-critical
    check.
    """
    if isinstance(ids.schema["_id"].dataType, (T.LongType, T.IntegerType)):
        return ids.select("_id", F.col("_id").cast("long").alias("_nid"))
    hashed = ids.select("_id", F.xxhash64("_id").alias("_nid"))
    # ONE pass over the dictionary (count + countDistinct fuse into a
    # single aggregation job) — at 10^12 ids a second full scan just to
    # detect the ~never collision would double the cost
    counts = hashed.agg(
        F.count("*").alias("n"), F.countDistinct("_nid").alias("nh")
    ).collect()[0]
    if int(counts.nh) != int(counts.n):
        return _dense_ids(ids)
    return hashed


def cluster_pairs(
    match_pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "url",
    entity_col: str = "entity_id",
) -> DataFrame:
    """match_pairs(l_id, r_id string) + all_ids(id) -> (id, entity_id long).

    Builds the string→long node dictionary deterministically
    (dense rank over sorted ids via ``zipWithIndex``-free hashing is
    unsafe; we use xxhash64 of the id — collisions at 10^12 keys are
    ~1e-14 per pair and clustering only merges, never splits, on a
    collision... no: a hash collision would *merge* two entities. So the
    dictionary is exact: min-id-per-hash is validated and the rare
    collision falls back to a row_number dictionary).

    In practice: xxhash64(url) is used as the node id after an explicit
    collision check; on collision (detected by one aggregation) we fall
    back to a sorted ``row_number`` dictionary, which costs one global
    sort but is exact.

    Integral id columns skip the dictionary entirely: the id IS the
    node (already 8 bytes, already distinct), so no hash, no
    collision check, and zero extra jobs — the pipeline path (uid =
    xxhash64(url), validated unique at the extract stage) lands here.
    """
    ids = all_ids.select(F.col(id_col).alias("_id")).distinct()
    hashed = node_dictionary(ids)

    le = hashed.select(F.col("_id").alias("l_id"), F.col("_nid").alias("u"))
    re_ = hashed.select(F.col("_id").alias("r_id"), F.col("_nid").alias("v"))
    edges = match_pairs.join(le, "l_id").join(re_, "r_id").select("u", "v")

    assign = connected_components(edges)
    out = (
        hashed.join(assign, hashed["_nid"] == assign["node"], "left")
        .select(
            F.col("_id"),
            F.coalesce(F.col("entity_id"), F.col("_nid")).alias("_eid"),
        )
    )
    # entity ids are component-min *node* ids; remap to the component's
    # min original id's hash is already stable, but for golden comparison
    # we expose the min *string* id per entity as entity_key as well.
    min_key = out.groupBy("_eid").agg(F.min("_id").alias("entity_key"))
    return (
        out.join(min_key, "_eid")
        .select(
            F.col("_id").alias(id_col),
            F.col("_eid").alias(entity_col),
            F.col("entity_key"),
        )
    )


def golden_records(
    assign: DataFrame,
    records: DataFrame,
    id_col: str,
    entity_col: str = "entity_id",
    longest_col: str | None = None,
    length_col: str | None = None,
    mode_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Survivorship: one canonical ("golden") row per entity — the merge
    step that follows clustering in every MDM/ER pipeline (the reference
    stops at human labels; the canonical-record construction is what
    those labels feed downstream).

    Deterministic rules, one aggregation, no UDFs:

    - ``entity_key``: min member id (the same canonical-id rule the
      cluster stage uses),
    - ``n_members``: cluster size,
    - ``longest_col``: the value whose ``length_col`` is greatest
      (ties -> smallest member id) via ``min_by`` over a
      (-length, id) struct — lexicographic struct comparison keeps it
      ONE aggregation (not a window + filter re-shuffle), and negating
      the numeric LENGTH rather than the id keeps the tie-break valid
      for string ids (the cluster stage's url-keyed assignments),
    - each of ``mode_cols``: the most frequent non-NULL value (ties ->
      smallest value) via ``F.mode(col, deterministic=True)`` — the
      deterministic variant pins exactly our tie rule (lowest value),
      and as a plain aggregate it rides the SAME groupBy as everything
      else.

    Scale shape: ONE groupBy on the entity key, no matter how many mode
    columns golden records carry — round-5 shipped one count-groupBy +
    one join per mode column (3 extra shuffles per attribute, ruinous
    for wide golden records); ``mode``'s per-group state is a
    value->count map bounded by cluster size x per-column cardinality.
    NULLs: aggregates skip NULL inputs, so a mode column's golden value
    is the most frequent value among members that HAVE one — an
    all-NULL column yields NULL (survivorship wants a non-null canonical
    value whenever any member supplies one).
    """
    joined = records.join(assign, id_col)
    aggs = [
        F.min(id_col).alias("entity_key"),
        F.count("*").alias("n_members"),
    ]
    if longest_col is not None:
        if length_col is None:
            raise ValueError("longest_col needs length_col")
        aggs.append(
            F.min_by(
                F.col(longest_col),
                F.struct(
                    (-F.col(length_col).cast("double")).alias("_neglen"),
                    F.col(id_col),
                ),
            ).alias(f"{longest_col}_golden")
        )
    aggs.extend(
        F.mode(F.col(c), deterministic=True).alias(f"{c}_golden")
        for c in mode_cols
    )
    return joined.groupBy(entity_col).agg(*aggs)
