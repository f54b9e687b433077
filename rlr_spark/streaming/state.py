"""Shared exactly-once state-table discipline for streaming modules.

One copy of the correctness-critical machinery that
``incremental_neardup_stream`` and :class:`EntityState` both rely on —
per-batch dynamic partition overwrite, the empty-or-parquet read probe,
and the atomic marker idiom — so a fix lands in one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """The state table at ``path``, or an empty frame of ``schema``.

    Only COMMITTED parquet counts: Spark's job-attempt scratch dirs
    (``_temporary``, ``_spark_metadata``, dot-prefixed) are skipped — a
    crash during the very first write must leave the table readable as
    empty, not wedge every replay on 'unable to infer schema'. Plain
    underscore-prefixed names are NOT skipped wholesale: the state
    tables' partition directories are named ``_nb=…``/``_batch_id=…``
    on purpose and must count.
    """
    skip = {"_temporary", "_spark_metadata"}
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if d not in skip and not d.startswith(".")]
            if any(f.endswith(".parquet") for f in files):
                return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def overwrite_batch_partition(
    df: DataFrame, path: str, batch_id: int, bucket_cols: tuple[str, ...] = ()
) -> None:
    """Dynamic partition overwrite of this batch's partitions: only the
    (bucket..., _batch_id) leaves PRESENT in ``df`` are replaced, so a
    replayed batch rewrites its own output and touches nothing else."""
    part_cols = [c for c in bucket_cols if c in df.columns] + ["_batch_id"]
    (
        df.withColumn("_batch_id", F.lit(int(batch_id)).cast("int"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*part_cols)
        .parquet(path)
    )


def marker_path(applied_dir: str, name: str) -> str:
    return os.path.join(applied_dir, name)


def marker_exists(applied_dir: str, name: str) -> bool:
    return os.path.exists(marker_path(applied_dir, name))


def write_marker(applied_dir: str, name: str) -> None:
    """Atomic (tmp + rename): a marker either exists complete or not
    at all — a kill inside the write can't leave a half-marker."""
    p = marker_path(applied_dir, name)
    with open(p + ".tmp", "w") as f:
        f.write("applied")
    os.replace(p + ".tmp", p)
