"""Benchmark decontamination: flag training docs overlapping an eval set.

The standard LLM-corpus hygiene op (the reference has no analogue; this
is part of the training-data suite): a training document is contaminated
when a large-enough fraction of its n-grams also appear in a benchmark /
eval corpus. The usual published setup is 13-gram overlap on whitespace
tokens; ``n`` is a parameter because short-document corpora want smaller
grams.

100 TB design — O(docs), never all-pairs:
- both sides explode to DISTINCT per-doc n-grams (token arrays stay on
  the record side; one pass per side);
- grams are hashed to 8-byte longs (``xxhash64``) before the join, so
  shuffle/broadcast volume is 8 bytes per gram instead of ~80-byte
  strings;
- the benchmark gram set (eval suites are small — thousands of docs) is
  deduplicated and BROADCAST; the probe is a broadcast LEFT SEMI join,
  so the training corpus is never shuffled at all;
- per-doc overlap is a single groupBy over the training corpus's grams.

A benchmark too large to broadcast degrades gracefully: drop the
``broadcast()`` hint and the same plan runs as a shuffled semi-join on
the 8-byte gram key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_ngrams(text: Column, n: int) -> Column:
    """Distinct whitespace-token n-grams of ``text``, space-joined.

    Empty/short documents (< n tokens) yield an empty array.
    """
    t = F.trim(F.coalesce(text, F.lit("")))
    toks = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    # guard short docs explicitly: F.sequence(1, 0) yields a DESCENDING
    # [1, 0] (not an empty array), and slice position 0 is a runtime
    # error. Single-arg lambda closing over constants (two-arg binds
    # the array index).
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams)


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    threshold: float = 0.1,
    hash_grams: bool = True,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-training-doc benchmark overlap: (id, n_grams, n_overlap,
    contamination, is_contaminated).

    ``contamination`` is the fraction of the doc's DISTINCT n-grams that
    occur anywhere in the benchmark corpus; ``is_contaminated`` applies
    ``threshold``. Docs with fewer than ``n`` tokens have 0 grams and
    contamination 0.0 (nothing to match on — callers wanting those
    flagged should lower ``n``).

    ``hash_grams`` (default) runs the join on ``xxhash64(gram)`` longs —
    the at-scale representation. A cross-side collision inflating a
    doc's overlap needs two distinct grams with equal 64-bit hashes
    (~1e-9 even at billions of grams per side).

    ``broadcast_benchmark`` (default) hints the distinct benchmark gram
    set to every executor — right whenever it fits in memory (typical
    eval suites are ≤ millions of grams = tens of MB hashed). Pass
    ``False`` for a benchmark too large to broadcast: the join degrades
    to a shuffled left join on the 8-byte gram key instead of OOMing
    the executors.
    """
    gram = token_ngrams(F.col(text_col), n)
    key: Column = F.col("_gram")
    if hash_grams:
        key = F.xxhash64(key)

    train_grams = (
        train.select(F.col(id_col), F.explode_outer(gram).alias("_gram"))
        .select(id_col, F.when(F.col("_gram").isNull(), None).otherwise(key).alias("_g"))
    )
    bench_grams = (
        benchmark.select(F.explode(gram).alias("_gram"))
        .select(key.alias("_g"))
        .distinct()
    )

    bench_side = bench_grams.withColumn("_hit", F.lit(1))
    if broadcast_benchmark:
        bench_side = F.broadcast(bench_side)
    flagged = train_grams.join(bench_side, "_g", "left")
    per_doc = flagged.groupBy(id_col).agg(
        F.count("_g").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_overlap"),
    )
    contamination = F.when(
        F.col("n_grams") == 0, F.lit(0.0)
    ).otherwise(F.col("n_overlap").cast("double") / F.col("n_grams").cast("double"))
    return per_doc.select(
        F.col(id_col),
        "n_grams",
        "n_overlap",
        F.round(contamination, 6).alias("contamination"),
        (contamination >= F.lit(threshold)).alias("is_contaminated"),
    )
