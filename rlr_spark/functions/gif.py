"""Pure-Python GIF codec (LZW) — first-frame decode + encoder for tests.

GIF is the last web-common image format decodable without a codec
library: the pixel data is LZW-compressed palette indices, and GIF's
LZW variant (variable code width 3..12 bits, clear/end codes, 4096-entry
dictionary) is tractable in plain Python. Mirrors the role of
:mod:`rlr_spark.functions.jpeg` / ``decode_png``: real bytes for the
multimodal operators (reference parity target: RLR has no media path;
this is part of the LLM-data suite, SURVEY.md §6), honest
``NotImplementedError`` for out-of-scope variants.

Scope: GIF87a/GIF89a, global/local color tables, interlaced or not,
FIRST frame of an animation (composited onto the background-colored
logical screen when the frame rect is smaller). Transparency is ignored
(the frame is returned opaque — documented, deterministic). Later
frames, disposal methods, and plain-text extensions are out of scope;
truncated/invalid streams raise ``ValueError``.

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
    """GIF -> (h, w, 3) uint8 RGB; first frame, composited onto the
    background-colored logical screen if smaller. See module docstring
    for scope."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(payload)
    except (struct.error, IndexError) as e:  # ran off the payload end
        raise ValueError(f"gif truncated or malformed: {e}") from None


def _decode_gif_body(payload: bytes) -> "np.ndarray":
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n

    while i < len(payload):
        block = payload[i]
        i += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("gif has no image data")
        if block == 0x21:  # extension: label + sub-blocks, skipped
            i += 1  # label
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected gif block 0x{block:02x}")

        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, i)
        i += 9
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
        frame = palette[idx].reshape(fh, fw, 3)
        if fpacked & 0x40:
            frame = _deinterlace(frame)
        if (fx, fy, fw, fh) == (0, 0, sw, sh):
            return np.ascontiguousarray(frame)
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        if gct is not None and bg_idx < len(gct):
            canvas[:, :] = gct[bg_idx]
        canvas[fy : fy + fh, fx : fx + fw] = frame
        return canvas
    raise ValueError("gif truncated before image data")


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
