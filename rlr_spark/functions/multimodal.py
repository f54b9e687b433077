"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators.

Decode is REAL for the web's dominant image formats and uncompressed
audio — binary P6 PPM and RIFF/PCM WAV parse with pure Python + numpy
(header structs + ``np.frombuffer``), PNG decodes with stdlib ``zlib``
(deflate) plus per-scanline un-filtering (None/Sub/Up/Average/Paeth)
across the full layout matrix (grey 1/2/4/8/16-bit, RGB/RGBA 8/16,
palette 1/2/4/8, Adam7 interlacing), GIF decodes via pure-Python LZW,
and JFIF/JPEG — baseline, non-interleaved multi-scan, AND progressive
(SOF2 with spectral selection + successive approximation) — decodes
through a pure-numpy Huffman + IDCT pipeline
(:mod:`rlr_spark.functions.jpeg`) — so ``image_stats`` /
``audio_stats`` / ``resize_nearest`` run end-to-end on real bytes.
Lossless WebP (VP8L) decodes through a pure-Python Huffman + LZ77 +
spatial-transform pipeline (:mod:`rlr_spark.functions.vp8l`). The
remaining codecs (lossy-WebP VP8/AVIF/MP3/H.264) stay a clearly-marked
``NotImplementedError`` — the sandbox ships no codec library — with
the dispatch sniffing magic bytes so dropping in PIL/libsndfile
upgrades those branches without touching the operators.
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


# ---------------------------------------------------------------------------
# Real decoders for uncompressed containers (no codec library required)
# ---------------------------------------------------------------------------

def encode_ppm(img: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 -> binary P6 PPM bytes (test-data synthesis)."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> "np.ndarray":
    """Binary P6 PPM -> (h, w, 3) uint8 array. Pure header parse +
    ``np.frombuffer`` — a real image decode with no codec library."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3)


def resize_nearest(img: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbour resize by index sampling — real, numpy-only."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def encode_wav_pcm16(
    samples: "np.ndarray", sample_rate: int = 16_000, channels: int = 1
) -> bytes:
    """int16 samples -> RIFF/WAVE PCM bytes (test-data synthesis)."""
    import struct

    raw = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    data = struct.pack("<4sI", b"data", len(raw)) + raw
    return struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data


def parse_wav(payload: bytes) -> tuple[dict, "np.ndarray"]:
    """RIFF/WAVE PCM16 -> ({sample_rate, channels, duration_ms}, samples).

    Walks the RIFF chunk list (fmt / data, skipping others) — a real
    audio decode for the uncompressed case.
    """
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, meta, samples = 12, None, None
    while i + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, i)
        i += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", payload, i)
            bits = struct.unpack_from("<H", payload, i + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 wav supported")
            meta = {"sample_rate": rate, "channels": channels}
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=i)
        i += size + (size % 2)  # chunks are word-aligned
    if meta is None or samples is None:
        raise ValueError("wav missing fmt/data chunk")
    n_frames = len(samples) // meta["channels"]
    meta["duration_ms"] = int(n_frames * 1000 // meta["sample_rate"])
    return meta, samples


PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG scanline filter ids (RFC 2083 §6)
_PNG_NONE, _PNG_SUB, _PNG_UP, _PNG_AVG, _PNG_PAETH = range(5)


# Adam7 pass grid: (x0, y0, dx, dy) per pass (RFC 2083 §2, §8.2)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_passes(w: int, h: int, interlace: int):
    """(x0, y0, dx, dy, pass_w, pass_h) sub-images of the raster.

    Non-interlaced is the single identity pass; Adam7 yields up to 7,
    skipping passes that are empty at this geometry (per spec such a
    pass contributes NO scanline bytes at all, not zero-length rows).
    """
    if interlace == 0:
        return [(0, 0, 1, 1, w, h)]
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def _pack_scanline_bytes(a: "np.ndarray", depth: int) -> "np.ndarray":
    """(h, w, ch) samples -> (h, row_bytes) uint8 raw scanline bytes.

    depth 8: identity; depth 16: big-endian sample pairs; sub-byte
    depths (channels must be 1): MSB-first bit packing, rows padded to
    a byte boundary with zero bits — the exact PNG serialization.
    """
    h, w, ch = a.shape
    if depth == 8:
        return np.ascontiguousarray(a.astype(np.uint8)).reshape(h, -1)
    if depth == 16:
        be = np.ascontiguousarray(a.astype(">u2"))
        return be.view(np.uint8).reshape(h, -1)
    bits = np.unpackbits(
        a.astype(np.uint8)[:, :, 0, None], axis=2, count=8
    )[:, :, 8 - depth :]
    return np.packbits(bits.reshape(h, -1), axis=1)


def _filter_scanlines(
    rows: "np.ndarray", bpp: int, filters: list[int]
) -> bytearray:
    """Apply per-scanline PNG filters at BYTE level (filter distance =
    ``bpp`` bytes, RFC 2083 §6) — the exact inverse of
    :func:`_unfilter_scanlines`. ``rows``: (h, row_bytes) uint8."""
    h, row_bytes = rows.shape
    raw = bytearray()
    prev = np.zeros(row_bytes, dtype=np.int16)
    for y in range(h):
        cur = rows[y].astype(np.int16)
        left = np.zeros_like(cur)
        left[bpp:] = cur[:-bpp]
        up_left = np.zeros_like(prev)
        up_left[bpp:] = prev[:-bpp]
        f = filters[y]
        if f == _PNG_NONE:
            enc = cur
        elif f == _PNG_SUB:
            enc = cur - left
        elif f == _PNG_UP:
            enc = cur - prev
        elif f == _PNG_AVG:
            enc = cur - (left + prev) // 2
        elif f == _PNG_PAETH:
            enc = cur - _paeth_predict(left, prev, up_left)
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = cur
    return raw


def encode_png(
    img: "np.ndarray",
    row_filters: list[int] | None = None,
    depth: int = 8,
    interlace: bool = False,
    palette: "np.ndarray | None" = None,
) -> bytes:
    """ndarray -> PNG bytes (test-data synthesis). Stdlib zlib + crc32.

    Layouts (mirroring everything :func:`decode_png` claims, so every
    decode path is driven with real bytes):

    - default: (h, w, 2|3|4) or (h, w) uint8, ``depth=8`` (2 channels =
      grey+alpha, color type 4)
    - ``depth=16``: same shapes, uint16 samples, big-endian
    - ``depth`` 1/2/4: greyscale (h, w) with values in [0, 2^depth)
    - ``palette=(n, 3) uint8``: ``img`` is an (h, w) index raster,
      color type 3, ``depth`` in {1, 2, 4, 8}
    - ``interlace=True``: Adam7 — scanlines serialized per pass

    ``row_filters`` picks per-scanline filter types; under Adam7 the
    list is consumed across the concatenated pass scanlines (cycled),
    so interlaced bytes exercise every un-filter branch too.
    """
    import struct
    import zlib

    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if palette is not None:
        if ch != 1 or depth not in (1, 2, 4, 8):
            raise ValueError("palette pngs are (h, w) indices, depth 1/2/4/8")
        color_type = 3
    elif depth in (1, 2, 4):
        if ch != 1:
            raise ValueError("sub-byte depth is greyscale-only")
        color_type = 0
    elif depth in (8, 16):
        ct_by_ch = {1: 0, 2: 4, 3: 2, 4: 6}  # grey, grey+alpha, RGB, RGBA
        if ch not in ct_by_ch:
            raise ValueError(f"unsupported channel count {ch}")
        color_type = ct_by_ch[ch]
    else:
        raise ValueError(f"bad depth {depth}")
    bpp = max(1, ch * depth // 8)
    raw = bytearray()
    passes = _png_passes(w, h, 1 if interlace else 0)
    scan = 0
    for x0, y0, dx, dy, pw, ph in passes:
        rows = _pack_scanline_bytes(a[y0::dy, x0::dx], depth)
        filters = (
            [row_filters[(scan + y) % len(row_filters)] for y in range(ph)]
            if row_filters
            else [0] * ph
        )
        raw.extend(_filter_scanlines(rows, bpp, filters))
        scan += ph

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color_type, 0, 0, 1 if interlace else 0
    )
    plte = (
        chunk(b"PLTE", np.ascontiguousarray(palette.astype(np.uint8)).tobytes())
        if palette is not None
        else b""
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _paeth_predict(
    left: "np.ndarray", up: "np.ndarray", up_left: "np.ndarray"
) -> "np.ndarray":
    p = left + up - up_left
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
    return np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left)
    )


def _unfilter_scanlines(
    raw: bytes, h: int, row_bytes: int, bpp: int
) -> "np.ndarray":
    """Filtered scanline bytes -> (h, row_bytes) uint8 reconstructed.

    Filters operate on BYTES with filter distance ``bpp`` bytes (RFC
    2083 §6) regardless of bit depth, so this one helper serves every
    depth/color-type/pass combination. Sub and Up are vectorized (Sub
    is a per-lane prefix sum -> ``np.cumsum``; Up a running row add);
    Average/Paeth are inherently sequential in the left neighbour and
    run as a plain-int Python scan per row — real encoders pick them
    for most photographic rows, so this path is the common one and
    avoids per-pixel numpy dispatch (~20x slower, measured).
    """
    if len(raw) != h * (1 + row_bytes):
        raise ValueError("png scanline data truncated")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + row_bytes)
    filters = rows[:, 0]
    lanes = row_bytes // bpp  # row_bytes is a multiple of bpp by construction
    data = rows[:, 1:].reshape(h, lanes, bpp).astype(np.int16)
    out = np.zeros((h, lanes, bpp), dtype=np.int16)
    prev = np.zeros((lanes, bpp), dtype=np.int16)
    for y in range(h):
        f, cur = int(filters[y]), data[y]
        if f == _PNG_NONE:
            rec = cur.copy()
        elif f == _PNG_SUB:
            rec = np.cumsum(cur, axis=0, dtype=np.int64) % 256
        elif f == _PNG_UP:
            rec = (cur + prev) % 256
        elif f in (_PNG_AVG, _PNG_PAETH):
            n = row_bytes
            cur_l = cur.reshape(-1).tolist()
            prev_l = prev.reshape(-1).tolist()
            rec_l = [0] * n
            if f == _PNG_AVG:
                for x in range(n):
                    left = rec_l[x - bpp] if x >= bpp else 0
                    rec_l[x] = (cur_l[x] + ((left + prev_l[x]) >> 1)) & 0xFF
            else:
                for x in range(n):
                    left = rec_l[x - bpp] if x >= bpp else 0
                    up = prev_l[x]
                    ul = prev_l[x - bpp] if x >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    rec_l[x] = (cur_l[x] + pred) & 0xFF
            rec = np.array(rec_l, dtype=np.int16).reshape(lanes, bpp)
        else:
            raise ValueError(f"bad png filter byte {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, row_bytes)


def _unpack_samples(
    rec: "np.ndarray", pw: int, channels: int, depth: int
) -> "np.ndarray":
    """(ph, row_bytes) reconstructed bytes -> (ph, pw, channels) uint8.

    depth 16 keeps the high byte (the standard 8-bit projection —
    identical to ``round(v * 255 / 65535)`` for all but ~0.4% of values,
    each off by 1); sub-byte depths unpack MSB-first and are SCALED to
    8-bit for greyscale by the caller (palette indices stay raw).
    """
    ph = rec.shape[0]
    if depth == 8:
        return rec[:, : pw * channels].reshape(ph, pw, channels)
    if depth == 16:
        return rec[:, : pw * channels * 2].reshape(ph, pw, channels, 2)[..., 0]
    bits = np.unpackbits(rec, axis=1)[:, : pw * depth].reshape(ph, pw, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2).astype(np.uint8)[:, :, None]


def decode_png(payload: bytes) -> "np.ndarray":
    """PNG -> (h, w, 3) uint8, pure stdlib ``zlib`` + numpy.

    PNG is deflate-compressed scanlines behind per-row filters — no
    codec *library* needed: IHDR parse, IDAT inflate, un-filter
    None/Sub/Up/Average/Paeth per scanline (RFC 2083 §6), sample
    unpack. Covers the full web-common matrix: greyscale (depths
    1/2/4/8/16), RGB/RGBA and grey+alpha (8/16), palette (PLTE, depths
    1/2/4/8), and Adam7 interlacing (each pass is its own filtered
    sub-image, deinterlaced by strided scatter). 16-bit samples project
    to their high byte; sub-byte greys scale to 8-bit (255/85/17 per
    level — exact); greyscale replicates to 3 channels and alpha is
    dropped (tRNS ignored likewise), so every image lands in the same
    (h, w, 3) shape the stats/resize operators consume. Chunk CRCs are
    not verified (a corrupt payload fails parse anyway, and the
    ``image_stats`` contract maps any failure to ``decoded=false``).
    """
    import struct
    import zlib

    if not payload.startswith(PNG_SIG):
        raise ValueError("not a PNG payload")
    i = len(PNG_SIG)
    ihdr = None
    idat = bytearray()
    plte = None
    while i + 8 <= len(payload):
        (length,), tag = struct.unpack_from(">I", payload, i), payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        i += 12 + length  # len + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("png missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"bad color type {color_type}")
    legal_depths = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color_type, (8, 16))
    if depth not in legal_depths:
        raise ValueError(f"depth {depth} illegal for color type {color_type}")
    if color_type == 3 and plte is None:
        raise ValueError("palette png missing PLTE")
    bpp = max(1, channels * depth // 8)
    raw = zlib.decompress(bytes(idat))
    out = np.zeros((h, w, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy, pw, ph in _png_passes(w, h, interlace):
        row_bytes = (pw * channels * depth + 7) // 8
        nbytes = ph * (1 + row_bytes)
        rec = _unfilter_scanlines(raw[pos : pos + nbytes], ph, row_bytes, bpp)
        pos += nbytes
        out[y0::dy, x0::dx] = _unpack_samples(rec, pw, channels, depth)
    if pos != len(raw):
        raise ValueError("png scanline data has trailing bytes")
    if color_type == 3:
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if depth < 8:  # greyscale sub-byte: scale levels to 8-bit (exact)
        out = out * np.uint8(255 // ((1 << depth) - 1))
    if channels == 1:
        return np.repeat(out, 3, axis=2)
    if channels == 2:  # grey + alpha: replicate grey, drop alpha
        return np.repeat(out[:, :, :1], 3, axis=2)
    return out[:, :, :3]  # RGB, or RGBA with alpha dropped


def decode_image(payload: bytes) -> "np.ndarray":
    """Dispatch on magic bytes: P6 PPM, PNG, GIF, JPEG (baseline AND
    progressive), and lossless WebP all decode for real (PPM is a
    header parse; PNG is stdlib zlib + per-scanline un-filtering; GIF
    is pure-Python LZW; JPEG is a pure-numpy Huffman + IDCT pipeline,
    :mod:`rlr_spark.functions.jpeg`; VP8L is pure-Python Huffman +
    LZ77 + spatial transforms, :mod:`rlr_spark.functions.vp8l`); the
    remaining formats (lossy WebP/AVIF/...) raise until a codec
    library is dropped in — everything downstream (batch shape,
    schema, partitioning) already handles the real thing."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(PNG_SIG):
        return decode_png(payload)
    if payload.startswith(b"\xff\xd8"):
        from rlr_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from rlr_spark.functions.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        # Lossless (VP8L) decodes natively; lossy VP8 (boolean
        # arithmetic coder + prediction DSP) is out of pure-Python
        # scope and raises inside decode_webp. The VP8L 2D distance
        # map is the one spec table with no independent local
        # cross-check — validation boundary documented in
        # rlr_spark/functions/vp8l.py (same class as progressive JPEG).
        from rlr_spark.functions.vp8l import decode_webp

        return decode_webp(payload)
    raise NotImplementedError(
        "image codec not available for this format (avif/...); "
        "P6 PPM, PNG (all depths/color types incl. palette and Adam7), "
        "JPEG (baseline + progressive + multi-scan), GIF (incl. "
        "animations), and lossless WebP (VP8L) decode natively"
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


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("decoded", T.BooleanType(), False),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode image payloads (real for P6 PPM) and emit per-image
    dimensions + channel means; undecodable payloads yield nulls with
    ``decoded = false`` — never a task failure. Arrow-batched
    ``mapInPandas``, no shuffle."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = decode_image(bytes(payload))
                    m = img.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (mid, img.shape[1], img.shape[0],
                         round(float(m[0]), 6), round(float(m[1]), 6),
                         round(float(m[2]), 6), True)
                    )
                except Exception:  # noqa: BLE001 — contract: a malformed
                    # payload yields decoded=false, NEVER a task failure
                    # (struct.error, ZeroDivisionError, truncation...)
                    rows.append((mid, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "mean_r", "mean_g", "mean_b", "decoded",
                ],
            )

    return media.where(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        op, schema=IMAGE_STATS_SCHEMA
    )


ANIMATION_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("delay_ms", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("decoded", T.BooleanType(), False),
    ]
)


def animation_frame_stats(media: DataFrame, max_frames: int = 16) -> DataFrame:
    """REAL frame sampling for animated payloads (GIF): decode up to
    ``max_frames`` composited frames per animation and emit one row per
    (media_id, frame_idx) with the frame's delay and channel means —
    the materialized form of :func:`frame_sample_plan`'s timestamp
    grid, for the formats the sandbox can decode. Same shape as every
    media operator here: Arrow-batched ``mapInPandas``, no shuffle.
    Payloads without a GIF signature emit NO rows (they are not
    animations — a 6-byte check, no per-row exception); a payload that
    claims GIF but is malformed yields one decoded=false row, never a
    task failure. ``max_frames`` bounds per-row work — the decoder stops
    reading the stream after that many frames, so sampling never pays
    for a long animation's tail."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rlr_spark.functions.gif import GIF_MAGICS, decode_gif_frames

        cols = [f.name for f in ANIMATION_FRAMES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if b[:6] not in GIF_MAGICS:
                    # not an animation container at all — emit nothing,
                    # so decoded=false keeps meaning "malformed
                    # animation", and non-GIF payloads (the bulk of a
                    # real media table) skip on a 6-byte check instead
                    # of paying a Python exception each
                    continue
                try:
                    frames, delays = decode_gif_frames(b, max_frames=max_frames)
                    for k in range(frames.shape[0]):
                        m = frames[k].reshape(-1, 3).mean(axis=0)
                        rows.append(
                            (mid, k, delays[k], frames.shape[2], frames.shape[1],
                             round(float(m[0]), 6), round(float(m[1]), 6),
                             round(float(m[2]), 6), True)
                        )
                except Exception:  # noqa: BLE001 — same contract as image_stats
                    rows.append((mid, None, None, None, None, None, None, None, False))
            yield pd.DataFrame(rows, columns=cols)

    return (
        media.where(F.col("kind").isin("image", "video"))
        .select("media_id", "payload")
        .mapInPandas(op, schema=ANIMATION_FRAMES_SCHEMA)
    )


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("decoded", T.BooleanType(), False),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode audio payloads (real for RIFF/PCM16 WAV): sample rate,
    channels, duration, RMS amplitude. Same failure contract as
    :func:`image_stats`."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    meta, samples = parse_wav(bytes(payload))
                    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                    rows.append(
                        (mid, meta["sample_rate"], meta["channels"],
                         meta["duration_ms"], round(rms, 6), True)
                    )
                except Exception:  # noqa: BLE001 — same contract: a truncated
                    # RIFF (struct.error) or zero-rate fmt (ZeroDivisionError)
                    # must yield decoded=false, never kill the task
                    rows.append((mid, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "channels", "duration_ms", "rms", "decoded",
                ],
            )

    return media.where(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        op, schema=AUDIO_STATS_SCHEMA
    )


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
