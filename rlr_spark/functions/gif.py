"""Pure-Python GIF codec (LZW) — stills AND animations, plus encoders.

GIF is the last web-common image format decodable without a codec
library: the pixel data is LZW-compressed palette indices, and GIF's
LZW variant (variable code width 3..12 bits, clear/end codes, 4096-entry
dictionary) is tractable in plain Python. Mirrors the role of
:mod:`rlr_spark.functions.jpeg` / ``decode_png``: real bytes for the
multimodal operators (reference parity target: RLR has no media path;
this is part of the LLM-data suite, SURVEY.md §6), honest
``ValueError`` for malformed streams.

Scope: GIF87a/GIF89a, global/local color tables, interlaced or not,
and full GIF89a ANIMATION semantics (:func:`decode_gif_frames`):
per-frame graphic-control extensions — delay, transparent index
(delta frames leave covered pixels unchanged), disposal methods
none/leave/restore-background/restore-previous — composited onto the
logical screen; :func:`decode_gif` returns the first composited frame.
Encoders exist for both stills (:func:`encode_gif`) and animations
(:func:`encode_gif_frames`, incl. transparent-delta and sub-rect
frames) so every decode path runs on real bytes. Plain-text extensions
are skipped; truncated/invalid streams raise ``ValueError``.

Spec: GIF89a specification (CompuServe, public), esp. Appendix F (LZW).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, mcs: int, expected: int) -> list[int]:
    """GIF-LZW decompress ``data`` to ``expected`` palette indices.

    Variable code width starting at ``mcs+1``; the width grows when the
    dictionary reaches ``1 << width`` (capped at 12 bits / 4096 codes,
    after which the stream must send a clear code to add entries).
    """
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    base = [[i] for i in range(clear)] + [None, None]  # clear/end slots
    table = list(base)
    out: list[int] = []
    prev: list[int] | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width and pos < n:
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            raise ValueError("gif LZW stream truncated")
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("gif LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if entry is None:
                raise ValueError("gif LZW: clear/end code used as data")
            if len(table) < 4096:
                table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("gif LZW: code beyond dictionary")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("gif pixel data truncated")
    return out[:expected]


def _lzw_encode(indices: "np.ndarray | list[int]", mcs: int) -> bytes:
    """GIF-LZW compress palette indices (real dictionary compression —
    the encoder exists to drive the decoder's dictionary/width-growth
    paths with genuine streams, so no uncompressed-GIF shortcut).

    Width bookkeeping mirrors the DECODER's view: the decoder adds one
    entry per code except the first after a clear, so its table lags the
    encoder's by one — ``dec_size`` tracks the decoder's table size and
    the write width grows exactly when the decoder's read width will.
    """
    clear = 1 << mcs
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    dec_size = clear + 2  # decoder's table size before any data code
    first_after_clear = True

    emit(clear, width)
    buf: tuple[int, ...] = ()
    for px in map(int, indices):
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if first_after_clear:
            first_after_clear = False
        else:
            dec_size += 1
        if dec_size == (1 << width) and width < 12:
            width += 1
        if next_code < 4096:  # 12-bit code space: 0..4095
            table[cand] = next_code
            next_code += 1
        else:
            # dictionary full — reset both sides with a clear code (the
            # decoder's table lags by one and saturates on its own)
            emit(clear, width)
            width = mcs + 1
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            dec_size = clear + 2
            first_after_clear = True
        buf = (px,)
    if buf:
        emit(table[buf], width)
        if not first_after_clear:
            dec_size += 1
        if dec_size == (1 << width) and width < 12:
            width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) rows


def _deinterlace(rows: "np.ndarray") -> "np.ndarray":
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(payload: bytes) -> "np.ndarray":
    """GIF -> (h, w, 3) uint8 RGB; first composited frame. See module
    docstring for scope."""
    frames, _ = decode_gif_frames(payload, max_frames=1)
    return frames[0]


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> "tuple[np.ndarray, list[int]]":
    """GIF (still or animated) -> ((n, h, w, 3) uint8 frames, delays).

    Full GIF89a animation semantics: each image descriptor composites
    onto the logical-screen canvas (background-colored when a global
    table exists); graphic-control extensions supply per-frame delay
    (returned in milliseconds), a transparent index (those pixels leave
    the canvas unchanged — how animations encode deltas), and the
    disposal method applied AFTER the frame is emitted (1/0 leave, 2
    restore background in the frame rect, 3 restore the pre-frame
    pixels). ``max_frames`` stops decoding early — frame sampling never
    pays for the tail of a long animation.
    """
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    try:
        frames: list[np.ndarray] = []
        delays: list[int] = []
        for canvas, delay_ms in _iter_gif_frames(payload):
            frames.append(canvas)
            delays.append(delay_ms)
            if max_frames is not None and len(frames) >= max_frames:
                break
        if not frames:
            raise ValueError("gif has no image data")
        return np.stack(frames), delays
    except (struct.error, IndexError) as e:  # ran off the payload end
        raise ValueError(f"gif truncated or malformed: {e}") from None


def _iter_gif_frames(payload: bytes):
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n

    bg = (
        gct[bg_idx]
        if gct is not None and bg_idx < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg
    gce: tuple[int, int | None, int] | None = None  # (disposal, tidx, delay_ms)

    while i < len(payload):
        block = payload[i]
        i += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            label = payload[i]
            i += 1
            if label == 0xF9 and payload[i] >= 4:  # graphic control
                gpacked, delay_cs, tidx = struct.unpack_from("<BHB", payload, i + 1)
                gce = (
                    (gpacked >> 2) & 0x7,
                    tidx if (gpacked & 1) else None,
                    delay_cs * 10,
                )
            while payload[i] != 0:  # skip sub-blocks (incl. the GCE's)
                i += 1 + payload[i]
            i += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected gif block 0x{block:02x}")

        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, i)
        i += 9
        if fx + fw > sw or fy + fh > sh:
            raise ValueError("gif frame rect outside logical screen")
        lct = None
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            lct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("gif image has no color table")
        mcs = payload[i]
        i += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad gif LZW min code size {mcs}")
        data = bytearray()
        while payload[i] != 0:
            ln = payload[i]
            data += payload[i + 1 : i + 1 + ln]
            i += 1 + ln
        i += 1

        idx = np.array(_lzw_decode(bytes(data), mcs, fw * fh), dtype=np.int64)
        if (idx >= len(palette)).any():
            raise ValueError("gif pixel index beyond palette")
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)

        disposal, tidx, delay_ms = gce or (0, None, 0)
        gce = None
        region = canvas[fy : fy + fh, fx : fx + fw]
        saved = region.copy() if disposal == 3 else None
        colored = palette[idx]
        if tidx is not None:
            mask = idx != tidx
            region[mask] = colored[mask]
        else:
            region[:, :] = colored
        yield canvas.copy(), delay_ms
        if disposal == 2:  # restore background color in the frame rect
            region[:, :] = bg
        elif disposal == 3 and saved is not None:  # restore previous
            region[:, :] = saved


def encode_gif_frames(
    frames: "list[np.ndarray]",
    delays_ms: "list[int] | None" = None,
    rects: "list[tuple[int, int]] | None" = None,
    disposals: "list[int] | None" = None,
    transparent_delta: bool = False,
) -> bytes:
    """Animated GIF89a from (h, w, 3) uint8 frames (test synthesis).

    One global palette over all frames' distinct colors (≤255 so a
    transparent slot stays reservable). Each frame gets a
    graphic-control extension with its ``delays_ms`` entry and
    ``disposals`` method. ``rects`` places frame k (its full array) at
    (x, y) on the logical screen — frame 0 sizes the screen and must be
    at (0, 0). ``transparent_delta`` encodes frames 2+ with pixels
    equal to the previous frame as the transparent index (the standard
    animation delta; requires full-rect frames and disposal 1).
    """
    if not frames:
        raise ValueError("no frames")
    first = np.ascontiguousarray(frames[0].astype(np.uint8))
    h, w = first.shape[:2]
    rects = rects or [(0, 0)] * len(frames)
    disposals = disposals or [1] * len(frames)
    delays_ms = delays_ms or [100] * len(frames)
    if rects[0] != (0, 0) or frames[0].shape[:2] != (h, w):
        raise ValueError("frame 0 must cover the logical screen at (0, 0)")
    if transparent_delta and (
        any(r != (0, 0) for r in rects)
        or any(f.shape[:2] != (h, w) for f in frames)
        or any(d != 1 for d in disposals[:-1])
    ):
        raise ValueError("transparent_delta needs full-rect frames, disposal 1")

    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 255:
        raise ValueError(f"gif encoder: {len(colors)} colors > 255 (no quantizer)")
    tidx = len(colors)  # reserved transparent slot
    n_bits = max(int(np.ceil(np.log2(max(tidx + 1, 2)))), 1)
    n_entries = 1 << n_bits
    mcs = max(n_bits, 2)
    pal = np.zeros((n_entries, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): k for k, c in enumerate(colors)}

    def indices_of(f: "np.ndarray") -> "np.ndarray":
        fl = f.reshape(-1, 3)
        return np.array([lut[tuple(px)] for px in fl], dtype=np.int64).reshape(
            f.shape[:2]
        )

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((n_bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    prev = None
    for k, f in enumerate(frames):
        fa = np.ascontiguousarray(f.astype(np.uint8))
        fh, fw = fa.shape[:2]
        fx, fy = rects[k]
        if fx + fw > w or fy + fh > h:
            raise ValueError("frame rect outside logical screen")
        idx = indices_of(fa)
        trans = False
        if transparent_delta and prev is not None:
            same = (fa == prev).all(axis=2)
            idx[same] = tidx
            trans = bool(same.any())
        gpacked = ((disposals[k] & 0x7) << 2) | (1 if trans else 0)
        out += struct.pack(
            "<BBBBHBB", 0x21, 0xF9, 4, gpacked, delays_ms[k] // 10, tidx, 0
        )
        out += struct.pack("<BHHHHB", 0x2C, fx, fy, fw, fh, 0)
        out.append(mcs)
        lzw = _lzw_encode(idx.reshape(-1), mcs)
        for j in range(0, len(lzw), 255):
            chunk = lzw[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
        prev = fa if rects[k] == (0, 0) and fa.shape[:2] == (h, w) else None
    out += b"\x3b"
    return bytes(out)


def encode_gif(img: "np.ndarray", interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB (≤256 distinct colors) -> GIF89a bytes.

    Palette-builds from the image's distinct colors; raises ``ValueError``
    beyond 256 (quantization is out of scope — this encoder exists to
    synthesize test bytes, like :func:`encode_jpeg`). ``interlace``
    writes the four-pass row order so the decoder's de-interlacer is
    driven with real bytes.
    """
    a = np.ascontiguousarray(img.astype(np.uint8))
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"gif encoder: {len(colors)} colors > 256 (no quantizer)")
    # GCT size field stores 2^(n+1) entries; LZW mcs must be >= 2
    n_bits = max(int(np.ceil(np.log2(max(len(colors), 2)))), 1)
    n_entries = 1 << n_bits
    mcs = max(n_bits, 2)
    pal = np.zeros((n_entries, 3), dtype=np.uint8)
    pal[: len(colors)] = colors

    idx = inverse.reshape(h, w)
    if interlace:
        rows = [idx[y] for s, st in _INTERLACE_PASSES for y in range(s, h, st)]
        stream = np.concatenate(rows) if rows else idx.reshape(-1)
    else:
        stream = idx.reshape(-1)
    lzw = _lzw_encode(stream.reshape(-1), mcs)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((n_bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    for j in range(0, len(lzw), 255):
        chunk = lzw[j : j + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
