"""Incremental ingest: stream new web pages through extract + blocking.

The reference is batch-only (SURVEY.md §2.1: "no streaming of any
kind"), but the 10^12-document target is append-heavy: new WARC drops
arrive continuously. This module gives the pipeline's front half a
Structured Streaming shape:

  readStream(web_pages dir) -> extract text (same Arrow UDF as batch)
  -> assign blocking keys -> append to the extract/keys tables

Candidate *pair* generation stays micro-batch via ``foreachBatch``
(joining a stream against itself for LSH buckets would need full-state
symmetric joins; batch-joining each micro-batch's keys against the
accumulated key table is the standard incremental-ER design and is what
``incremental_pairs_batch`` implements).

Also includes the watermarked windowed-aggregation shape over the
events table, demonstrating late-data handling for monitoring streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rlr_spark.operators.blocking import normalized_domain
from rlr_spark.operators.extract import _extract_udf

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over a web_pages parquet directory."""
    return (
        spark.readStream.format("parquet")
        .schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .load(input_dir)
    )


def extract_and_key(pages: DataFrame) -> DataFrame:
    """Streaming-safe projection: extract text (Arrow UDF), domain key.
    Narrow ops only — runs identically on batch and stream frames."""
    return (
        pages.withColumn("text", _extract_udf(F.col("html")))
        .withColumn("blk_key", normalized_domain(F.col("url")))
        .drop("html")
    )


def incremental_pairs_batch(
    new_keys: DataFrame, accumulated_keys: DataFrame
) -> DataFrame:
    """One micro-batch of incremental candidate pairs: new rows vs
    (accumulated ∪ new), canonicalized. Used inside foreachBatch, where
    ``accumulated_keys`` is the keyed table as of the previous batch."""
    left = new_keys.select(F.col("url").alias("l_id"), "blk_key")
    right = (
        accumulated_keys.select("url", "blk_key")
        .unionByName(new_keys.select("url", "blk_key"))
        .select(F.col("url").alias("r_id"), "blk_key")
    )
    return (
        left.join(right, "blk_key")
        .where(F.col("l_id") != F.col("r_id"))
        .select(
            F.least("l_id", "r_id").alias("l_id"),
            F.greatest("l_id", "r_id").alias("r_id"),
        )
        .dropDuplicates(["l_id", "r_id"])
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation over events(ts, event_type, value):
    late rows beyond the watermark are dropped, state is bounded."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def incremental_neardup_stream(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    shingle_k: int = 1,
    bands: int = 32,
    rows_per_band: int = 2,
):
    """Streaming near-dup detection: readStream -> foreachBatch
    incremental MinHash-LSH -> verified pairs, append-only state.

    Per micro-batch: band-key the NEW docs, join them against the
    accumulated key table (plus themselves), verify candidates by exact
    token jaccard, append verified pairs, then append the new keys/docs
    to the accumulated tables. The probe side is only the new rows, so
    a pair is computed in the batch where its second member arrives;
    state is two append-only parquet tables — the batch analogue of the
    bounded-state rule, and the standard incremental-ER shape (joining a
    stream against itself inside LSH buckets would need full-state
    symmetric stream-stream joins).

    Delivery semantics: ``foreachBatch`` is AT-LEAST-ONCE on restart, so
    two guards make the state effectively idempotent: (a) a per-batch
    marker file skips batch_ids whose appends all completed — markers
    live INSIDE the checkpoint dir, so wiping/relocating the checkpoint
    (which renumbers batch_ids from 0) can never match a stale marker
    against brand-new data — and (b) new urls are anti-joined against
    the accumulated docs table, so a replayed batch whose docs append
    DID land (or a url recurring in a later input file) never
    duplicates state or re-emits its pairs. The remaining window — a
    crash INSIDE the append sequence (pairs -> keys -> docs) — can
    leave duplicate rows in the pairs table, and in the keys table when
    the crash lands between the keys and docs appends; candidate
    generation dedups (l_id, r_id) so results stay correct, but
    consumers should ``dropDuplicates`` on read, or the sinks should be
    an ACID table format in production.

    The accumulated keys table is tied to the banding scheme: a
    ``_scheme`` marker in ``work_dir`` records (shingle_k, bands, rows,
    key-derivation version) and a mismatch raises instead of silently
    missing every cross-epoch pair.

    Returns the StreamingQuery; pairs land under ``work_dir + '/pairs'``.
    """
    import os

    from rlr_spark.functions.dedup import _verify_token_jaccard
    from rlr_spark.operators.blocking import lsh_band_keys

    keys_dir = os.path.join(work_dir, "keys")
    docs_dir = os.path.join(work_dir, "docs")
    pairs_dir = os.path.join(work_dir, "pairs")
    ckpt_dir = os.path.join(work_dir, "_ckpt")
    applied_dir = os.path.join(ckpt_dir, "_applied")
    os.makedirs(applied_dir, exist_ok=True)

    scheme = f"minhash-k{shingle_k}-b{bands}-r{rows_per_band}-hashed-shingles-v2"
    scheme_path = os.path.join(work_dir, "_scheme")
    if os.path.exists(scheme_path):
        with open(scheme_path) as f:
            existing = f.read().strip()
        if existing != scheme:
            raise ValueError(
                f"work_dir {work_dir} holds keys built with scheme "
                f"'{existing}', incompatible with '{scheme}' — new docs "
                "would never collide with accumulated keys (silent recall "
                "loss). Rebuild the state or use a fresh work_dir."
            )
    else:
        with open(scheme_path + ".tmp", "w") as f:
            f.write(scheme)
        os.replace(scheme_path + ".tmp", scheme_path)

    def _read_or_empty(path: str, schema: str) -> DataFrame:
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return spark.read.parquet(path)
        return spark.createDataFrame([], schema)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(applied_dir, f"batch_{batch_id}")
        if os.path.exists(marker):  # fully-applied batch replayed: skip
            return
        acc_docs = _read_or_empty(docs_dir, "url string, text string")
        batch = (
            batch_df.select("url", F.col(text_col).alias("text"))
            .dropDuplicates(["url"])
            # recurring or partially-replayed urls are already state
            .join(acc_docs.select("url"), "url", "left_anti")
            .localCheckpoint(eager=True)
        )
        new_keys = lsh_band_keys(
            batch, "url", "text", shingle_k=shingle_k, bands=bands,
            rows_per_band=rows_per_band,
        ).localCheckpoint(eager=True)
        acc_keys = _read_or_empty(keys_dir, "url string, blk_key long")
        cand = incremental_pairs_batch(new_keys, acc_keys)
        all_docs = acc_docs.unionByName(batch.select("url", "text"))
        verified = _verify_token_jaccard(
            cand, all_docs, "url", "text", jaccard_threshold
        )
        verified.write.mode("append").parquet(pairs_dir)
        new_keys.write.mode("append").parquet(keys_dir)
        batch.select("url", "text").write.mode("append").parquet(docs_dir)
        with open(marker + ".tmp", "w") as f:
            f.write("applied")
        os.replace(marker + ".tmp", marker)  # atomic: kill-safe

    return (
        spark.readStream.format("parquet")
        .schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
