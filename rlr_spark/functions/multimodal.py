"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators. The decode step itself
is STUBBED — the sandbox image ships no codec libraries — behind a
clearly-marked ``NotImplementedError`` plus a deterministic fake
featurizer, so the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested while the codec call is a
drop-in replacement point.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_image(payload: bytes) -> "np.ndarray":
    """Real codec hook — intentionally unimplemented in this image.

    Swap in PIL/libvips here; everything downstream (batch shape,
    schema, partitioning) already handles the real thing.
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_features() for plumbing tests"
    )


def fake_features(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in featurizer: md5-seeded values in [0,1).

    A pure function of the payload bytes, so tests can assert exact
    outputs and the pipeline is reproducible end-to-end.
    """
    if payload is None:
        return [0.0] * dim
    d = hashlib.md5(payload).digest()
    out = []
    for i in range(dim):
        b = hashlib.md5(d + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(b[:4], "big") / 2**32)
    return out


def extract_features(
    media: DataFrame, dim: int = FEATURE_DIM, batch_note_col: str | None = None
) -> DataFrame:
    """media(media_id, kind, payload, meta) -> + features array<double>.

    ``mapInPandas``: Arrow batches in, Arrow batches out — the payload
    bytes never round-trip through per-row Python dispatch. At scale the
    input is repartitioned by size (AQE) and each task decodes its batch
    locally; no shuffle is introduced.
    """
    out_schema = T.StructType(
        media.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf["payload"].map(lambda p: fake_features(p, dim))
            yield pdf

    return media.mapInPandas(op, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Explode a video row into frame-sample rows (timestamps only — the
    decode of each frame is the stubbed codec call). Shows the intended
    physical shape: one row per (media_id, frame_ts), partitionable by
    media_id for parallel decode."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
