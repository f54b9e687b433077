"""Deterministic sampling for corpus curation.

Weighted sampling without replacement via the Efraimidis–Spirakis
exponential-key trick: each row draws a deterministic pseudo-uniform
``u`` from an md5 hash of its id and competes on ``ln(u)/w`` — the
top-k keys ARE a weighted sample without replacement. Fully
deterministic (same ids → same sample), embarrassingly parallel (the
key is a per-row expression; top-k is ``TakeOrderedAndProject``), and
bit-mirrorable in ANSI SQL, unlike ``rand()``-seeded sampling whose
stream depends on partitioning.

Scale shape (100 TB): no shuffle at all until the final top-k heap
merge of k rows. This is how a trillion-document corpus draws a
quality-weighted training subset reproducibly: the sample is a PURE
FUNCTION of (ids, weights, k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unit_hash(id_col: Column) -> Column:
    """Deterministic u in (0, 1): first 8 md5 hex chars over 2^32, with
    a +1/+2 offset so u is never exactly 0 or 1 (ln(0) guard)."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    return (h + F.lit(1.0)) / F.lit(float(2**32 + 2))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` weighted sample without replacement (Efraimidis–
    Spirakis): row i wins with probability proportional to ``weight``
    among remaining rows. ``weight`` must be > 0; rows with NULL or
    non-positive weight are excluded (documented, not silent: they have
    zero selection probability by definition).

    Returns (id, weight, samp_key) ordered by key desc — ``samp_key =
    ln(u)/w`` is exposed so downstream re-draws can extend the sample
    (take more rows) without recomputing.
    """
    w = weight.cast("double")
    key = F.log(_unit_hash(F.col(id_col))) / w
    return (
        df.where(w > 0)
        .select(
            F.col(id_col),
            w.alias("weight"),
            F.round(key, 6).alias("samp_key"),
        )
        .orderBy(F.col("samp_key").desc(), F.col(id_col))
        .limit(k)
    )


def weighted_sample_sql(
    k: int,
    weight_expr: str,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`weighted_sample` — identical hash draw,
    key formula, rounding, and (key desc, id) ordering."""
    u = (
        f"(('0x' || substr(md5({id_col}::VARCHAR), 1, 8))::BIGINT + 1.0)"
        f" / {float(2**32 + 2)}"
    )
    return f"""
        SELECT {id_col}, ({weight_expr})::DOUBLE AS weight,
               round(ln({u}) / ({weight_expr})::DOUBLE, 6) AS samp_key
        FROM {table}
        WHERE ({weight_expr})::DOUBLE > 0
        ORDER BY samp_key DESC, {id_col}
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------

def dsir_log_weights(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-document DSIR importance log-weights.

    Features are hashed unigrams: every token lands in one of
    ``n_buckets`` via an md5-derived bucket (deterministic and
    bit-mirrorable in ANSI SQL, unlike xxhash64). Two bucket-level
    unigram models are fit — the TARGET distribution over rows matching
    ``target_pred`` and the RAW distribution over all rows, both
    Laplace-smoothed (+1) — and a document's log importance weight is
    ``sum over its tokens of [ln p_target(bucket) - ln p_raw(bucket)]``:
    large where the document's hashed-feature profile looks like the
    target domain, negative where it doesn't.

    Scale shape (100 TB): the bucket models are ``n_buckets``-row
    aggregates (broadcast back); per-document work is one explode +
    one groupBy(id, bucket) + a broadcast join — no corpus-sized shuffle
    beyond the per-doc token collapse, and token duplicates are counted
    (not distincted), as the LM requires.

    Returns ``(id_col, n_feats, log_weight)`` for every row with >=1
    token (empty docs carry no evidence and are excluded, documented).
    """
    toks = df.select(
        F.col(id_col),
        target_pred.alias("_is_tgt"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("_tok"),
    ).where(F.col("_tok") != "")
    bucketed = toks.select(
        F.col(id_col),
        "_is_tgt",
        (
            F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("_b"),
    )
    # bucket-level token counts: raw = all rows, target = predicate rows.
    # One pass, conditional aggregation.
    model = bucketed.groupBy("_b").agg(
        F.count("*").alias("_cr"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0)).alias("_ct"),
    )
    totals = model.agg(
        F.sum("_cr").cast("double").alias("_nr"),
        F.sum("_ct").cast("double").alias("_nt"),
    )
    llr = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "_b",
            (
                F.log((F.col("_ct") + 1.0) / (F.col("_nt") + float(n_buckets)))
                - F.log((F.col("_cr") + 1.0) / (F.col("_nr") + float(n_buckets)))
            ).alias("_llr"),
        )
    )
    per_doc = bucketed.groupBy(id_col, "_b").agg(F.count("*").alias("_cnt"))
    return (
        per_doc.join(F.broadcast(llr), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("n_feats"),
            F.sum(F.col("_cnt") * F.col("_llr")).alias("log_weight"),
        )
    )


def dsir_sample(
    df: DataFrame,
    target_pred: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR selection: Gumbel-top-k over the importance log-weights.

    Sampling with probability proportional to the importance weight
    ``exp(log_weight)`` without replacement == taking the top-k of
    ``log_weight + Gumbel`` (the Gumbel-max trick); the Gumbel draw is
    deterministic per id (md5-derived uniform, 'dsir:' salt so it is
    independent of weighted_sample's draw on the same ids). Top-k
    compiles to TakeOrderedAndProject — per-partition heaps, O(k)
    driver memory at 10^12 documents.

    Returns ``(id_col, n_feats, log_weight, samp_key)`` for the k
    selected rows, ordered (samp_key desc, id).
    """
    lw = dsir_log_weights(
        df, target_pred, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    u = _unit_hash(F.concat(F.lit("dsir:"), F.col(id_col).cast("string")))
    key = F.col("log_weight") - F.log(-F.log(u))
    # order on the UNROUNDED key (the rounded value is display-only; an
    # oracle ordering on the same unrounded expression then agrees on
    # the k-th boundary)
    top = (
        lw.select(F.col(id_col), "n_feats", "log_weight", key.alias("_k"))
        .orderBy(F.col("_k").desc(), F.col(id_col))
        .limit(k)
    )
    return top.select(
        F.col(id_col),
        "n_feats",
        F.round("log_weight", 6).alias("log_weight"),
        F.round("_k", 6).alias("samp_key"),
    )
