"""Sequence packing for LLM training data — concat-and-chunk offsets.

Training pipelines concatenate documents (in a deterministic order) and
slice the token stream into fixed-length context windows ("sequences").
The GPT-style concat-and-chunk variant never pads and never discards:
a document landing on a window boundary is split across the adjacent
sequences. The operator here computes, per document, WHERE it lands —
shard, token start offset within the shard's stream, and the first/last
sequence indexes it touches — which is exactly the index a distributed
writer needs to emit the packed windows themselves.

Scale shape (100 TB): a single global concatenation order would be one
total ordering — an anti-pattern. Instead documents are first assigned
to ``n_shards`` deterministic shards (md5-gated, like the stratified
sampler, so the DuckDB oracle mirrors the gate bit-exactly) and the
cumulative offsets run per shard: ``Window.partitionBy(shard)`` is a
hash-shuffle plus per-partition sort, every shard independent. On a
real cluster n_shards is sized to executors (thousands), each shard's
stream is one writer task, and no stage ever sees a global order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_of(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard in [0, n_shards): first 8 md5 hex chars of the
    stringified id, mod n_shards — mirrorable bit-exactly in ANSI SQL."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )


def pack_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_len: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Concat-and-chunk packing index: per document, its shard, token
    count, start offset in the shard's concatenated token stream, and
    the first/last ``ctx_len``-token sequence it occupies.

    Documents concatenate in ``id_col`` order within their shard (any
    deterministic order works; ids make the oracle trivial). Empty docs
    carry 0 tokens — they consume no stream space and land "at" their
    neighbor's boundary (first_seq == the sequence the next token would
    open; last_seq is capped to first_seq so the span stays well-formed).

    Returns (id, shard, n_tokens, start_off, first_seq, last_seq).
    """
    t = F.trim(F.col(text_col))
    n_tok = F.when(
        t.isNull() | (t == ""), F.lit(0)
    ).otherwise(F.size(F.split(t, r"\s+"))).cast("long")

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    base = df.select(
        F.col(id_col),
        shard_of(F.col(id_col), n_shards).alias("shard"),
        n_tok.alias("n_tokens"),
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = base.select(
        id_col,
        "shard",
        "n_tokens",
        start.alias("start_off"),
    )
    # floor (not cast-truncate): the empty-doc-at-offset-0 edge puts
    # start_off + n_tokens - 1 at -1, where truncation and floor differ
    # between engines; greatest() then caps the span either way
    first = F.floor(F.col("start_off") / ctx_len).cast("long")
    last = F.greatest(
        first,
        F.floor((F.col("start_off") + F.col("n_tokens") - 1) / ctx_len).cast("long"),
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_off",
        first.alias("first_seq"),
        last.alias("last_seq"),
    )
