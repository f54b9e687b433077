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
