"""Structured Streaming smoke: memory sink + processAllAvailable drives
file-source micro-batches to completion synchronously."""

import os

from pyspark.sql import functions as F

from rlr_spark.streaming.ingest import (
    extract_and_key,
    incremental_pairs_batch,
    stream_pages,
    windowed_event_counts,
)


def test_stream_extract_and_key(spark, tmp_path, web_pages_small):
    pages, _ = web_pages_small
    src = str(tmp_path / "stream_src")
    pages.limit(60).write.parquet(src)

    out = extract_and_key(stream_pages(spark, src))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_pages_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM stream_pages_out")
    assert got.count() == 60
    assert {"url", "text", "blk_key", "lang"} <= set(got.columns)
    # extraction in the stream matches the batch text byte-for-byte
    joined = got.select("url", F.col("text").alias("stream_text")).join(
        pages.select("url", "text"), "url"
    )
    assert joined.where(F.col("stream_text") != F.col("text")).count() == 0


def test_incremental_pairs_batch(spark):
    acc = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k2")], "url string, blk_key string"
    )
    new = spark.createDataFrame([("d", "k1"), ("e", "k9")], "url string, blk_key string")
    got = {(r.l_id, r.r_id) for r in incremental_pairs_batch(new, acc).collect()}
    # new node d pairs with existing k1 members only; e has no partner
    assert got == {("a", "d"), ("b", "d")}


def test_windowed_event_counts(spark, tmp_path):
    events = spark.createDataFrame(
        [
            ("2024-01-01 00:00:30", "click", 1.0),
            ("2024-01-01 00:01:10", "click", 2.0),
            ("2024-01-01 00:07:00", "view", 5.0),
        ],
        "ts_s string, event_type string, value double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = (
        spark.readStream.format("parquet")
        .schema("ts timestamp, event_type string, value double")
        .load(src)
    )
    agg = windowed_event_counts(stream, window="5 minutes")
    # complete mode so a single static micro-batch emits all windows;
    # append mode would wait for the watermark to pass a window's end,
    # which a one-batch file source never advances far enough for
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("event_counts_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (str(r.window_start), r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM event_counts_out").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 00:05:00", "view")] == (1, 5.0)


def test_stateful_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState: only the first doc per content hash passes;
    later exact duplicates are counted into state, across micro-batches."""
    from rlr_spark.streaming.stateful import first_seen_dedup_stream

    # two files -> two micro-batches (maxFilesPerTrigger=1)
    src = str(tmp_path / "dedup_src")
    b1 = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h1")], "url string, text_md5 string"
    )
    b2 = spark.createDataFrame(
        [("u4", "h1"), ("u5", "h3")], "url string, text_md5 string"
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.format("parquet")
        .schema("url string, text_md5 string")
        .option("maxFilesPerTrigger", 1)
        .load(src + "/*")
    )
    out = first_seen_dedup_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("first_seen_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM first_seen_out").collect()
    per_hash = {}
    for r in rows:
        per_hash.setdefault(r.text_md5, []).append(r.url)
    # each hash emitted exactly once, with its first-seen url
    assert all(len(v) == 1 for v in per_hash.values())
    assert set(per_hash) == {"h1", "h2", "h3"}


def test_incremental_neardup_stream(spark, tmp_path):
    """foreachBatch incremental MinHash-LSH: a near-dup arriving in a
    later micro-batch pairs with its batch-1 original exactly once."""
    from rlr_spark.streaming.ingest import incremental_neardup_stream

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("kappa", "lambda")  # token-jaccard 9/11 ≈ 0.818
    far = "one two three four five six seven eight nine ten"

    src = str(tmp_path / "nd_src")
    b1 = spark.createDataFrame(
        [("u1", base), ("u2", far)], "url string, text string"
    ).selectExpr(
        "url", "cast(null as timestamp) warc_ts", "cast(null as binary) html",
        "text", "cast(null as string) lang",
    )
    b2 = spark.createDataFrame(
        [("u3", near), ("u4", base)], "url string, text string"
    ).selectExpr(
        "url", "cast(null as timestamp) warc_ts", "cast(null as binary) html",
        "text", "cast(null as string) lang",
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    b2.coalesce(1).write.parquet(src + "/f2")

    work = str(tmp_path / "nd_work")
    q = incremental_neardup_stream(spark, src + "/*", work, jaccard_threshold=0.8)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.l_id, r.r_id)
        for r in spark.read.parquet(work + "/pairs").collect()
    }
    # u4 == base exactly; u3 is the near-dup; u2 pairs with nothing
    assert got == {("u1", "u3"), ("u1", "u4"), ("u3", "u4")}
    # exactly-once: no duplicated pair rows across batches
    assert spark.read.parquet(work + "/pairs").count() == 3

    # --- at-least-once replay guards -------------------------------------
    # a restart with a WIPED checkpoint replays every batch; the
    # per-batch markers + the anti-join against accumulated docs must
    # keep pairs and state byte-identical (no duplicate emission)
    import shutil

    shutil.rmtree(work + "/_ckpt")
    # a recurring url (u1 again) plus one genuinely new unrelated doc
    b3 = spark.createDataFrame(
        [("u1", base), ("u5", "mu nu xi omicron pi rho sigma tau")],
        "url string, text string",
    ).selectExpr(
        "url", "cast(null as timestamp) warc_ts", "cast(null as binary) html",
        "text", "cast(null as string) lang",
    )
    b3.coalesce(1).write.parquet(src + "/f3")
    q2 = incremental_neardup_stream(spark, src + "/*", work, jaccard_threshold=0.8)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(work + "/pairs").count() == 3  # nothing re-emitted
    # recurring u1 was anti-joined away: state holds one row per url
    docs = spark.read.parquet(work + "/docs")
    assert docs.count() == docs.select("url").distinct().count() == 5
