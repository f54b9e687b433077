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
    replayed batch rewrites its own output and touches nothing else.

    The write is pre-shuffled onto its partition columns (the same move
    compact_state makes): without it every write task opens a file in
    every bucket leaf it sees — up to tasks x buckets tiny files per
    batch, and task time goes to file opens/commits, not compute
    (profiled: 5.3 s median task wall vs 0.25 s CPU on the pairs-stage
    write). Keyed on the bucket column, each leaf gets exactly one
    file and the per-batch file count drops from O(tasks x buckets) to
    O(buckets) — which is also what keeps the state directory's listing
    growth per batch flat. The shuffle itself is tiny (batch-sized)."""
    present = [c for c in bucket_cols if c in df.columns]
    part_cols = present + ["_batch_id"]
    out = df.withColumn("_batch_id", F.lit(int(batch_id)).cast("int"))
    if present:
        out = out.repartition(*[F.col(c) for c in present])
    else:
        # no bucket level: a handful of files beats one-per-task
        out = out.coalesce(8)
    (
        out.write.mode("overwrite")
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


def _atomic_write(path: str, text: str) -> None:
    with open(path + ".tmp", "w") as f:
        f.write(text)
    os.replace(path + ".tmp", path)


def resolve_effective_batch(state_dir: str, applied_dir: str, batch_id: int) -> int:
    """Map a stream's raw batch_id to an id that is unique across the
    LIFETIME of the state, surviving checkpoint wipes.

    The per-batch idempotency story (marker + ``_batch_id != bid``
    prior-state exclusion + dynamic partition overwrite) assumes a
    replayed id refers to the SAME logical batch. That holds within one
    streaming checkpoint, but wiping/relocating the checkpoint restarts
    batch ids from 0 while the state dir still holds partitions under
    the old ids — a genuinely-new batch 0 would then dynamic-overwrite
    old batch 0's rows in every (bucket, _batch_id) leaf it touches,
    and the ``!= 0`` exclusion would hide the old batch's legitimate
    rows from its own prior-state read.

    Fix (the id-offset scheme): a random generation token is written to
    BOTH the checkpoint-side marker dir (shares fate with the
    checkpoint) and the state dir (shares fate with the state). While
    the tokens agree, raw ids map through a fixed per-generation
    offset; when they disagree — fresh checkpoint over retained state —
    a new generation starts with ``offset = watermark + 1``, so every
    effective id is strictly greater than anything ever applied and can
    never collide with a retained partition. Replays of the SAME
    checkpoint keep the same token, hence the same offset, hence
    byte-identical effective ids — the idempotency story is untouched.
    Crash between the two token writes (state first, checkpoint second)
    just re-derives the same offset on restart: nothing was applied in
    between, so the watermark didn't move.

    The legitimate wiped-checkpoint workflows keep working: replayed
    old files land under fresh effective ids where the docs anti-join
    reduces them to empty writes, and genuinely new files get ids past
    the watermark. Cost: two tiny driver-side file reads per batch.
    """
    import uuid

    bid = int(batch_id)
    state_gen = os.path.join(state_dir, "_gen_offset")
    ckpt_gen = os.path.join(applied_dir, "_gen")
    ckpt_tok = None
    if os.path.exists(ckpt_gen):
        with open(ckpt_gen) as f:
            ckpt_tok = f.read().strip()
    if os.path.exists(state_gen):
        with open(state_gen) as f:
            tok, off_txt = f.read().split()
        if ckpt_tok == tok:
            return bid + int(off_txt)
    off = applied_watermark(state_dir) + 1
    tok = uuid.uuid4().hex
    _atomic_write(state_gen, f"{tok} {off}")
    _atomic_write(ckpt_gen, tok)
    return bid + off


def applied_watermark(state_dir: str) -> int:
    """Highest batch_id ever marked applied for the state under
    ``state_dir``, or -1.

    Stored as a single ``_watermark`` file (atomic tmp+rename writes)
    in the STATE dir — deliberately NOT next to the per-batch markers,
    which live inside the streaming checkpoint: the failure this pair
    detects is precisely "checkpoint wiped, state retained", so the
    watermark must share fate with the state, not the checkpoint.
    Markers answer "was THIS batch applied"; the watermark answers "how
    far has this state ever advanced" — together they distinguish a
    legitimate replay (id <= watermark, marker present) from a
    renumbered stream (id <= watermark, marker MISSING), which happens
    when the checkpoint is wiped/relocated while the state dir is
    retained and batch ids restart from 0.
    """
    p = os.path.join(state_dir, "_watermark")
    if os.path.exists(p):
        with open(p) as f:
            txt = f.read().strip()
        return int(txt) if txt else -1
    return -1


def advance_watermark(state_dir: str, batch_id: int) -> None:
    """Raise the applied watermark to ``batch_id`` (monotonic, atomic)."""
    if int(batch_id) <= applied_watermark(state_dir):
        return
    p = os.path.join(state_dir, "_watermark")
    with open(p + ".tmp", "w") as f:
        f.write(str(int(batch_id)))
    os.replace(p + ".tmp", p)


def guard_renumbered_stream(
    state_dir: str, applied_dir: str, batch_id: int, marker_prefix: str = "batch"
) -> None:
    """Backstop: refuse an EFFECTIVE batch id at/below the state
    watermark whose applied marker is missing.

    With :func:`resolve_effective_batch` in front, this cannot fire for
    any checkpoint-wipe scenario (a new generation's ids start past the
    watermark) or any crash-replay scenario (a crashed batch never
    advanced the watermark; a marker-then-crash replay short-circuits
    on the marker and only catches the watermark up). What remains is
    state tampered with out-of-band — a hand-deleted marker, a
    hand-edited watermark, two live streams sharing one state dir —
    where proceeding would dynamic-overwrite another batch's rows in
    every touched (bucket, _batch_id) leaf and the ``!= bid`` exclusion
    would hide that batch's rows from the prior-state read. Corruption
    beats availability here: refuse loudly.
    """
    bid = int(batch_id)
    wm = applied_watermark(state_dir)
    if bid <= wm and not marker_exists(applied_dir, f"{marker_prefix}_{bid}"):
        raise ValueError(
            f"effective batch_id {bid} is at/below the applied watermark "
            f"{wm} of state dir {state_dir} but has no applied marker in "
            f"{applied_dir}: the stream appears to have been renumbered "
            "behind the generation scheme's back (hand-deleted marker? two "
            "streams sharing a state dir?). Processing it would overwrite "
            "unrelated prior-batch state — refusing."
        )
