import pytest

from rlr_spark.functions.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_image,
    extract_features,
    fake_features,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", (64, 64, None, "image/png")),
        (2, "image", b"\x89PNG other bytes", (32, 32, None, "image/png")),
        (3, "video", b"\x00\x00vid", (640, 480, 3500, "video/mp4")),
        (4, "audio", None, (None, None, 2000, "audio/wav")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"anything")


def test_fake_features_deterministic():
    a = fake_features(b"payload")
    b = fake_features(b"payload")
    c = fake_features(b"other")
    assert a == b and a != c
    assert len(a) == FEATURE_DIM and all(0.0 <= x < 1.0 for x in a)
    assert fake_features(None) == [0.0] * FEATURE_DIM


def test_extract_features_plumbing(spark):
    media = _media(spark)
    out = extract_features(media)
    assert out.schema["features"].dataType.simpleString() == "array<double>"
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1].features == fake_features(b"\x89PNG fake bytes")
    assert rows[4].features == [0.0] * FEATURE_DIM
    # metadata struct survives the mapInPandas round-trip
    assert rows[3].meta.duration_ms == 3500


def test_frame_sample_plan(spark):
    media = _media(spark)
    frames = frame_sample_plan(media, every_ms=1000).collect()
    got = sorted((r.media_id, r.frame_ts_ms) for r in frames)
    assert got == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]
