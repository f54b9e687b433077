"""Meta-blocking: blocking-graph edge weighting + pruning.

Redundancy-positive blocking (token/shingle blocking) casts a wide net —
every shared key is a block — so at web scale the candidate set is
dominated by redundant (same pair in many blocks) and superfluous
(non-matching) comparisons. Meta-blocking (Papadakis et al., TKDE 2014,
"Meta-Blocking: Taking Entity Resolution to the Next Level"; parallel
formulation in Efthymiou et al., ICDE 2017) re-reads the block
collection as a graph — nodes are records, edges connect records
co-occurring in >=1 block — weights each edge with a cheap
co-occurrence statistic, and prunes low-weight edges BEFORE any
pairwise comparator runs.

Reference anchor: RLR walks every supplied candidate pair wholesale
(backend/rlr.py:231-260); meta-blocking is the web-scale front end that
keeps that review queue tractable.

Everything here is pure DataFrame ops (no UDFs, one shuffle per
aggregation):

- **block purging** caps block size, so the per-block self-join is
  bounded quadratic (cap^2): a stop-word key ("the") never generates
  pairs. At 10^12 docs the co-occurrence explode is
  ``sum_b |b|^2 <= purge_cap * sum_b |b|`` — linear in posting volume
  with a constant chosen by ``purge_cap``, and per-block skew is
  bounded by the same cap, so no salting is needed (contrast
  blocking.block_pairs, whose domain blocks are uncapped and salted).
- **edge weights** are groupBy aggregates over the exploded
  (block, l, r) co-occurrence rows:
    CBS  = #common blocks,
    JS   = CBS / (|B_l| + |B_r| - CBS)            (Jaccard of block sets),
    ECBS = CBS * ln(B/|B_l|) * ln(B/|B_r|)        (entity-IDF adjusted),
    ARCS = sum over common blocks of 1/C(|b|,2)   (small blocks count more).
- **WEP** (weight-edge pruning) keeps edges >= the global mean weight —
  one scalar aggregate, broadcast back.
- **WNP** (weighted-node pruning) keeps an edge if it reaches the local
  mean weight of either endpoint (``mode="or"``, redundancy-positive)
  or of both (``mode="and"``, reciprocal WNP — higher precision) — one
  extra shuffle keyed on node id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rlr_spark.operators.blocking import hashed_shingle_col

SCHEMES = ("cbs", "js", "ecbs", "arcs")


def shingle_blocks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_block: int = 2,
    purge_cap: int = 64,
) -> DataFrame:
    """Blocking keys = distinct k-token shingle identities per record,
    with block purging: keys kept only when 2 <= block size <= purge_cap
    (size-1 blocks generate no pairs; oversize blocks are the
    non-discriminative stop-shingles purging exists to kill).

    Returns ``(block_key, id, block_size)``. ``block_key`` is the
    xxhash64 shingle identity (blocking.hashed_shingle_col) — block
    membership statistics are those of the string shingles, at a third
    of the cost.
    """
    posts = df.select(
        F.col(id_col).alias("id"),
        F.explode(hashed_shingle_col(F.col(text_col), k=k)).alias("block_key"),
    ).localCheckpoint(eager=False)  # consumed twice: sizes agg + join
    sizes = posts.groupBy("block_key").agg(F.count("*").alias("block_size"))
    return posts.join(
        sizes.where(
            (F.col("block_size") >= min_block) & (F.col("block_size") <= purge_cap)
        ),
        "block_key",
    )


def blocking_graph(blocks: DataFrame, scheme: str = "cbs") -> DataFrame:
    """Weighted blocking graph from ``(block_key, id, block_size)`` rows.

    Returns edges ``(l_id, r_id, weight)`` with ``l_id < r_id`` — every
    pair co-occurring in >=1 surviving block, weighted per ``scheme``.
    The self-join is per-block (bounded by the purge cap); the groupBy
    collapses a pair's multiple co-occurrences into one edge, which is
    also where all redundant-comparison elimination happens.
    """
    if scheme not in SCHEMES:
        raise ValueError(f"scheme must be one of {SCHEMES}, got {scheme!r}")

    left = blocks.select(
        "block_key", F.col("id").alias("l_id"), F.col("block_size").alias("_nb")
    )
    right = blocks.select("block_key", F.col("id").alias("r_id"))
    co = left.join(right, "block_key").where(F.col("l_id") < F.col("r_id"))

    edges = co.groupBy("l_id", "r_id").agg(
        F.count("*").alias("_cbs"),
        # ARCS: 1 / C(|b|, 2) per common block
        F.sum(F.lit(2.0) / (F.col("_nb") * (F.col("_nb") - F.lit(1.0)))).alias(
            "_arcs"
        ),
    )

    if scheme == "cbs":
        return edges.select(
            "l_id", "r_id", F.col("_cbs").cast("double").alias("weight")
        )
    if scheme == "arcs":
        return edges.select("l_id", "r_id", F.col("_arcs").alias("weight"))

    # JS / ECBS need per-node block counts (and ECBS the total block count)
    node_blocks = blocks.groupBy("id").agg(F.count("*").alias("_nbi"))
    edges = (
        edges.join(
            node_blocks.select(F.col("id").alias("l_id"), F.col("_nbi").alias("_bl")),
            "l_id",
        )
        .join(
            node_blocks.select(F.col("id").alias("r_id"), F.col("_nbi").alias("_br")),
            "r_id",
        )
    )
    if scheme == "js":
        return edges.select(
            "l_id",
            "r_id",
            (
                F.col("_cbs").cast("double")
                / (F.col("_bl") + F.col("_br") - F.col("_cbs")).cast("double")
            ).alias("weight"),
        )
    # ECBS; total #blocks is one scalar — computed as a 1-row aggregate and
    # cross-joined (Catalyst broadcasts the single row)
    n_blocks = blocks.select("block_key").distinct().agg(
        F.count("*").cast("double").alias("_nb_total")
    )
    return edges.crossJoin(F.broadcast(n_blocks)).select(
        "l_id",
        "r_id",
        (
            F.col("_cbs").cast("double")
            * F.log(F.col("_nb_total") / F.col("_bl"))
            * F.log(F.col("_nb_total") / F.col("_br"))
        ).alias("weight"),
    )


def prune_wep(edges: DataFrame) -> DataFrame:
    """Weight-edge pruning: keep edges with weight >= the global mean.

    The mean is a single-row aggregate; Catalyst broadcasts it — no
    second pass over the edges and no driver collect.
    """
    mean = edges.agg(F.avg("weight").alias("_thr"))
    return (
        edges.crossJoin(F.broadcast(mean))
        .where(F.col("weight") >= F.col("_thr"))
        .drop("_thr")
    )


def prune_wnp(edges: DataFrame, mode: str = "or") -> DataFrame:
    """Weighted-node pruning: local mean per endpoint.

    ``mode="or"``: an edge survives if it reaches the mean weight of
    EITHER endpoint (redundancy-positive WNP — recall-oriented).
    ``mode="and"``: BOTH endpoints (reciprocal WNP — precision-oriented).

    One union+groupBy keyed on node id computes every node's local mean;
    two joins bring the two thresholds back to each edge.
    """
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    by_node = (
        edges.select(F.col("l_id").alias("node"), "weight")
        .unionByName(edges.select(F.col("r_id").alias("node"), "weight"))
        .groupBy("node")
        .agg(F.avg("weight").alias("_thr"))
    )
    out = (
        edges.join(
            by_node.select(F.col("node").alias("l_id"), F.col("_thr").alias("_tl")),
            "l_id",
        )
        .join(
            by_node.select(F.col("node").alias("r_id"), F.col("_thr").alias("_tr")),
            "r_id",
        )
    )
    keep_l = F.col("weight") >= F.col("_tl")
    keep_r = F.col("weight") >= F.col("_tr")
    cond = (keep_l | keep_r) if mode == "or" else (keep_l & keep_r)
    return out.where(cond).select("l_id", "r_id", "weight")


def meta_blocking_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scheme: str = "js",
    prune: str = "wnp",
    mode: str = "or",
    k: int = 3,
    min_block: int = 2,
    purge_cap: int = 64,
) -> DataFrame:
    """Full pipeline: shingle blocks -> purge -> weighted graph -> prune.

    Returns the retained candidate pairs ``(l_id, r_id, weight)``.

    Plan shape: ``blocks`` is consumed by three subtrees of
    :func:`blocking_graph` (both sides of the co-occurrence join +
    per-node block counts) and ``edges`` by three subtrees of
    :func:`prune_wnp` (two arms of the node union + the edge join) —
    without a materialization barrier Catalyst re-computes the whole
    shingle/co-occurrence pipeline once per consumer (measured: 40
    parquet scans / 68 exchanges in one plan, wall 2-3x). Lazy
    localCheckpoints materialize each relation exactly once; the input
    is rebalanced first because a compact parquet input lands in fewer
    splits than cores while shingling is CPU-heavy per byte.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(par // 3, 4):
        df = df.repartition(par)
    blocks = shingle_blocks(
        df, id_col=id_col, text_col=text_col, k=k,
        min_block=min_block, purge_cap=purge_cap,
    ).localCheckpoint(eager=False)
    edges = blocking_graph(blocks, scheme=scheme)
    if prune in ("wep", "wnp"):
        edges = edges.localCheckpoint(eager=False)
    if prune == "wep":
        return prune_wep(edges)
    if prune == "wnp":
        return prune_wnp(edges, mode=mode)
    if prune is None or prune == "none":
        return edges
    raise ValueError(f"prune must be 'wep', 'wnp' or 'none', got {prune!r}")
