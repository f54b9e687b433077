"""Baseline JPEG codec in pure Python + numpy — no codec library.

The reference treats media as opaque payloads; this engine decodes the
web's dominant formats for real (SURVEY.md §2.6). PNG needed only
stdlib zlib; baseline JFIF/JPEG (SOI/DQT/SOF0/DHT/SOS, 8-bit, Huffman,
non-progressive — the overwhelming majority of web images) needs no
library at all: every stage is spec arithmetic (ITU-T T.81):

  entropy-coded segments --Huffman--> (run,size) symbols
  --dequantize + un-zigzag--> 8x8 DCT coefficient blocks
  --IDCT (one orthonormal matrix multiply per block)--> samples
  --YCbCr -> RGB (BT.601 full-range, JFIF Annex)--> pixels

The encoder exists for test synthesis (decode(encode(x)) must land
within quantization distance of x) and writes 4:4:4 / 4:2:2 / 4:2:0,
grayscale, restart intervals, quality-scaled Annex-K tables, standard
Annex-K Huffman tables — every layout the decoder claims is driven
with real bytes. The decoder handles 1- or 3-component scans, the
common subsamplings, restart markers, fill bytes, either table
arrangement, non-interleaved multi-scan baseline files, AND
progressive (SOF2) files — spectral selection, successive
approximation, DC/AC refinement scans, EOB runs — via a unified
coefficient-buffer architecture (every scan accumulates into
per-component quantized-coefficient arrays; dequantize + IDCT run once
at the end, vectorized). :func:`encode_jpeg_progressive` and
:func:`encode_jpeg_multiscan_baseline` synthesize those layouts so the
paths are driven with real bytes too. Arithmetic coding, lossless /
hierarchical SOFs raise ``NotImplementedError`` explicitly.

Decode runs inside Arrow-batched ``mapInPandas`` operators
(multimodal.image_stats): per-payload Python is the right shape there —
the payload is an opaque blob; no column expression can decode it.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K) — public standard tables
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

LUM_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

CHROM_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# (bits[1..16], huffval) — Annex K.3
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II matrix: coeffs = T @ block @ T.T, block = T.T @ c @ T
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _T[_u, _x] = (0.5 if _u else 1 / np.sqrt(8)) * (
            np.cos((2 * _x + 1) * _u * np.pi / 16) if _u else 1.0
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for MSB-first bit-at-a-time decoding."""
    return {
        (length, code): sym for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quant table (public formula)."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Bit IO with 0xFF byte stuffing
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.i >= len(self.data):
            raise ValueError("jpeg entropy data exhausted")
        b = self.data[self.i]
        self.i += 1
        if b == 0xFF:
            nxt = self.data[self.i] if self.i < len(self.data) else None
            if nxt == 0x00:
                self.i += 1  # stuffed byte
            else:
                # marker inside entropy data (e.g. EOI reached early)
                raise ValueError("unexpected marker in entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.n = 0
        self.acc = 0


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read_bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


# --------------------------------------------------------------------------
# Encoder (test synthesis)
# --------------------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    coeffs = _T @ (block - 128.0) @ _T.T
    quant = np.round(coeffs / q).astype(np.int64)
    zz = quant.reshape(-1)[ZIGZAG]

    def put(sym_codes, sym, val, s):
        code, length = sym_codes[sym]
        w.write(code, length)
        if s:
            w.write(val if val >= 0 else val + (1 << s) - 1, s)

    diff = int(zz[0]) - pred
    s = int(abs(diff)).bit_length()
    put(dc_codes, s, diff, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            put(ac_codes, 0xF0, 0, 0)  # ZRL
            run -= 16
        s = int(abs(v)).bit_length()
        put(ac_codes, (run << 4) | s, v, s)
        run = 0
    if run:
        put(ac_codes, 0x00, 0, 0)  # EOB
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    grayscale: bool = False,
    sos_order: tuple[int, ...] = (1, 2, 3),
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (Annex-K Huffman
    tables, IJG quality scaling). Pure numpy; test synthesis and the
    inverse proof for :func:`decode_jpeg`.

    ``subsampling``: ``"444"`` (one 8x8 MCU, chroma full-res), ``"420"``
    (16x16 MCU: 4 Y blocks + 2x2-mean-downsampled Cb, Cr — the web's
    dominant layout), or ``"422"`` (16x8 MCU: 2 Y blocks + horizontally
    halved chroma). ``restart_interval`` > 0 emits a DRI segment and an
    RSTn marker every that-many MCUs (DC predictors reset, bitstream
    byte-aligned). ``grayscale`` encodes a single luma component (the
    decoder's 1-component path). Together these drive every sampling
    layout the decoder claims, with real bytes.

    ``sos_order``: component interleaving order of the scan, as a
    permutation of ``(1, 2, 3)`` (component ids Y, Cb, Cr). T.81 lets
    the SOS list components in any order and the MCU data follows THAT
    order — a non-identity value (4:4:4 color only) exercises the
    decoder's SOS-order handling with bytes whose scan order genuinely
    differs from SOF order.
    """
    if tuple(sorted(sos_order)) != (1, 2, 3):
        raise ValueError("sos_order must be a permutation of (1, 2, 3)")
    if sos_order != (1, 2, 3) and (grayscale or subsampling != "444"):
        raise ValueError("custom sos_order supported for 4:4:4 color only")
    a = np.ascontiguousarray(img.astype(np.uint8))
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w0 = a.shape[:2]
    samp = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}
    if subsampling not in samp:
        raise ValueError("subsampling must be '444', '422', or '420'")
    sh, sv = (1, 1) if grayscale else samp[subsampling]
    mcu_w, mcu_h = 8 * sh, 8 * sv
    lq = _quality_scale(LUM_Q, quality)
    cq = _quality_scale(CHROM_Q, quality)

    ycc = _rgb_to_ycbcr(a)
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w0 // mcu_w) * mcu_w
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w0), (0, 0)), mode="edge")
    y_plane = padded[..., 0]
    if sh > 1 or sv > 1:
        # sv x sh mean chroma downsample — the standard decimation
        cb = padded[..., 1].reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        cr = padded[..., 2].reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
    else:
        cb, cr = padded[..., 1], padded[..., 2]

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    bw = _BitWriter()
    preds = [0, 0, 0]
    entropy = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(0, ph, mcu_h):
        for mx in range(0, pw, mcu_w):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                entropy += bw.flush()
                bw = _BitWriter()
                entropy += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for comp_id in (1,) if grayscale else sos_order:
                if comp_id == 1:
                    for by in range(sv):  # Y blocks, raster order in the MCU
                        for bx in range(sh):
                            preds[0] = _encode_block(
                                bw,
                                y_plane[
                                    my + by * 8 : my + by * 8 + 8,
                                    mx + bx * 8 : mx + bx * 8 + 8,
                                ],
                                lq, dc_l, ac_l, preds[0],
                            )
                else:
                    cy, cx = my // sv, mx // sh
                    plane = cb if comp_id == 2 else cr
                    preds[comp_id - 1] = _encode_block(
                        bw, plane[cy : cy + 8, cx : cx + 8], cq, dc_c, ac_c,
                        preds[comp_id - 1],
                    )
            mcu_count += 1
    entropy += bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in q.reshape(-1)[ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    samp_y = (sh << 4) | sv
    if grayscale:
        sof = seg(
            0xFFC0,
            struct.pack(">BHHB", 8, h, w0, 1) + bytes([1, 0x11, 0]),
        )
        sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        tables = dqt(0, lq) + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS) + dht(
            1, 0, AC_LUM_BITS, AC_LUM_VALS
        )
    else:
        sof = seg(
            0xFFC0,
            struct.pack(">BHHB", 8, h, w0, 3)
            + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        comp_tids = {1: 0x00, 2: 0x11, 3: 0x11}
        sos_body = bytes([3]) + b"".join(
            bytes([cid, comp_tids[cid]]) for cid in sos_order
        ) + bytes([0, 63, 0])
        sos = seg(0xFFDA, sos_body)
        tables = (
            dqt(0, lq) + dqt(1, cq)
            + dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
            + dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
            + dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
            + dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return b"\xff\xd8" + app0 + tables + dri + sof + sos + bytes(entropy) + b"\xff\xd9"


# --------------------------------------------------------------------------
# Progressive / multi-scan encoder (test synthesis)
#
# Shares the forward DCT + quantization with the baseline encoder but
# computes ALL quantized coefficient blocks up front (vectorized), then
# serializes any scan script over them: interleaved or non-interleaved
# DC scans, spectral-selection AC scans, successive-approximation DC/AC
# refinement scans with EOB runs, restart intervals. Huffman tables are
# built flat (every emitted symbol at code length 9) — canonically
# valid, compression-indifferent, and they keep the table side trivial;
# the decoder exercises exactly the same table machinery either way.
# --------------------------------------------------------------------------

def _component_coefficients(img, quality, subsampling, grayscale):
    """-> (h, w, comps_meta, [(bh, bw, 64) int32 zigzag coef arrays], quants).

    Identical preprocessing to :func:`encode_jpeg` (YCbCr, edge-pad to
    the MCU grid, mean chroma decimation), but the forward DCT +
    quantization runs vectorized over every block at once and the
    result is kept, because progressive scans revisit coefficients.
    """
    a = np.ascontiguousarray(img.astype(np.uint8))
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w0 = a.shape[:2]
    samp = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}
    if subsampling not in samp:
        raise ValueError("subsampling must be '444', '422', or '420'")
    sh, sv = (1, 1) if grayscale else samp[subsampling]
    mcu_w, mcu_h = 8 * sh, 8 * sv
    lq = _quality_scale(LUM_Q, quality)
    cq = _quality_scale(CHROM_Q, quality)
    ycc = _rgb_to_ycbcr(a)
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w0 // mcu_w) * mcu_w
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w0), (0, 0)), mode="edge")
    if grayscale:
        planes = [(padded[..., 0], lq)]
        comps = [{"id": 1, "h": 1, "v": 1, "q": 0}]
    else:
        if sh > 1 or sv > 1:
            cb = padded[..., 1].reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            cr = padded[..., 2].reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        else:
            cb, cr = padded[..., 1], padded[..., 2]
        planes = [(padded[..., 0], lq), (cb, cq), (cr, cq)]
        comps = [
            {"id": 1, "h": sh, "v": sv, "q": 0},
            {"id": 2, "h": 1, "v": 1, "q": 1},
            {"id": 3, "h": 1, "v": 1, "q": 1},
        ]
    coefs = []
    for plane, q in planes:
        bh_, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh_, 8, bw_, 8).transpose(0, 2, 1, 3) - 128.0
        cf = np.einsum("ab,yxbc,cd->yxad", _T, blocks, _T.T)
        quant = np.round(cf / q).astype(np.int32)
        coefs.append(quant.reshape(bh_, bw_, 64)[..., ZIGZAG])
    return h, w0, comps, coefs, (lq, cq)


class _OpSink:
    """Collects entropy ops per scan and the symbol sets per Huffman
    table, so tables can be built after all scans are scripted."""

    def __init__(self) -> None:
        self.ops: list[tuple] = []
        self.symbols: dict[tuple[int, int], set[int]] = {}

    def sym(self, cls: int, tid: int, s: int) -> None:
        self.symbols.setdefault((cls, tid), set()).add(s)
        self.ops.append(("s", (cls, tid), s))

    def bits(self, v: int, n: int) -> None:
        if n:
            self.ops.append(("b", v, n))

    def rst(self) -> None:
        self.ops.append(("r",))


def _flat_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """All symbols at canonical code length 9 — valid for any set of
    <= 256 symbols (the all-ones code is never assigned)."""
    vals = sorted(symbols)
    bits = [0] * 16
    bits[8] = len(vals)
    return bits, vals


def _blocks_of(frame_geom, comps, coefs, cis):
    """Yield (restart_unit_index, ci, by, bx) in scan order: MCU
    interleaving when the scan has several components, the component's
    own unpadded block grid otherwise (T.81 scan geometry)."""
    h, w0 = frame_geom
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if len(cis) > 1:
        mcux = -(-w0 // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in cis:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            yield n, ci, my * c["v"] + by, mx * c["h"] + bx
                n += 1
    else:
        ci = cis[0]
        c = comps[ci]
        cw = -(-w0 * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        n = 0
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield n, ci, by, bx
                n += 1


def _emit_dc_scan(sink, frame_geom, comps, coefs, cis, ah, al, ri):
    preds = [0] * len(comps)
    last_n = 0
    for n, ci, by, bx in _blocks_of(frame_geom, comps, coefs, cis):
        if ri and n != last_n and n % ri == 0:
            sink.rst()
            preds = [0] * len(comps)
        last_n = n
        dc = int(coefs[ci][by, bx, 0])
        if ah == 0:
            v = dc >> al  # arithmetic shift: DC point transform
            diff = v - preds[ci]
            preds[ci] = v
            s = abs(diff).bit_length()
            sink.sym(0, 0 if comps[ci]["q"] == 0 else 1, s)
            sink.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        else:  # refinement: one raw bit (bit Al of the DC value)
            sink.bits((dc >> al) & 1, 1)


def _emit_ac_scan(sink, frame_geom, comps, coefs, ci, ss, se, ah, al, ri):
    tid = 0 if comps[ci]["q"] == 0 else 1
    eob = 0
    pend: list[int] = []

    def flush_eob():
        nonlocal eob, pend
        if eob:
            rr = eob.bit_length() - 1
            sink.sym(1, tid, rr << 4)
            sink.bits(eob - (1 << rr), rr)
            eob = 0
        for b in pend:
            sink.bits(b, 1)
        pend = []

    last_n = 0
    for n, ci_, by, bx in _blocks_of(frame_geom, comps, coefs, (ci,)):
        if ri and n != last_n and n % ri == 0:
            flush_eob()
            sink.rst()
        last_n = n
        blk = coefs[ci_][by, bx]
        if ah == 0:  # first scan at this Al: (run, size) + EOB runs
            vals = []
            for k in range(ss, se + 1):
                t = int(blk[k])
                m = abs(t) >> al  # AC point transform truncates toward 0
                vals.append(m if t > 0 else -m)
            if not any(vals):
                eob += 1
                if eob == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last_nz = max(j for j, v in enumerate(vals) if v)
            for j, v in enumerate(vals):
                if j > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    sink.sym(1, tid, 0xF0)  # ZRL
                    run -= 16
                s = abs(v).bit_length()
                sink.sym(1, tid, (run << 4) | s)
                sink.bits(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < se - ss:
                eob = 1
        else:  # refinement scan (G.1.2.3 encoder side)
            mags = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            signs = [int(blk[k]) > 0 for k in range(ss, se + 1)]
            newly = [j for j, m in enumerate(mags) if m == 1]
            if not newly:
                # whole block absorbed into the EOB run; its history
                # correction bits queue up behind the eventual EOBn
                eob += 1
                pend.extend(m & 1 for m in mags if m >= 2)
                if eob == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            # events since the last emitted symbol, in positional order:
            # ("z",) zero-history position / ("h", bit) history correction.
            # A symbol's coverage mirrors the decoder's walk exactly —
            # ZRL consumes the first 16 zero-history events plus the
            # history bits interleaved before its 16th zero; a (run, 1)
            # symbol consumes the remainder up to the newly position.
            ev: list[tuple] = []
            for j, m in enumerate(mags):
                if m >= 2:
                    ev.append(("h", m & 1))
                elif m == 0:
                    ev.append(("z",))
                else:  # newly significant at this level
                    while sum(1 for e in ev if e[0] == "z") >= 16:
                        sink.sym(1, tid, 0xF0)  # ZRL
                        zseen = 0
                        cut = 0
                        for idx, e in enumerate(ev):
                            if e[0] == "z":
                                zseen += 1
                                if zseen == 16:
                                    cut = idx + 1
                                    break
                            else:
                                sink.bits(e[1], 1)
                        ev = ev[cut:]
                    run = sum(1 for e in ev if e[0] == "z")
                    sink.sym(1, tid, (run << 4) | 1)
                    sink.bits(1 if signs[j] else 0, 1)
                    for e in ev:
                        if e[0] == "h":
                            sink.bits(e[1], 1)
                    ev = []
            if ev:  # trailing positions after the last newly: EOB covers
                eob = 1
                pend = [e[1] for e in ev if e[0] == "h"]
    flush_eob()


def _serialize_ops(ops, codes) -> bytes:
    bw = _BitWriter()
    out = bytearray()
    rst = 0
    for op in ops:
        if op[0] == "s":
            code, length = codes[op[1]][op[2]]
            bw.write(code, length)
        elif op[0] == "b":
            bw.write(op[1], op[2])
        else:  # restart: byte-align with 1-fill, emit RSTn
            out += bw.flush()
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
    out += bw.flush()
    return bytes(out)


#: default progressive scan script (component-index, Ss, Se, Ah, Al) —
#: the classic shape: coarse DC, luma AC bands, chroma AC, then
#: successive-approximation refinements down to full precision
_PROG_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)
_PROG_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
    scans: tuple | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive (SOF2) JFIF bytes.

    ``scans`` is a script of ``(component_indices, Ss, Se, Ah, Al)``
    tuples; the default is the classic coarse-to-fine script (DC at
    Al=1, luma AC in two spectral bands at Al=2, chroma AC at Al=1,
    then refinement scans down to Al=0 — exercising DC refinement, AC
    refinement, EOB runs, and spectral selection). A script with only
    Ah=Al=0 scans produces a spectral-selection-only file. The
    reconstruction is IDENTICAL to :func:`encode_jpeg` at the same
    quality/subsampling — the quantized coefficients are the same,
    only the entropy serialization differs (tested).
    """
    h, w0, comps, coefs, (lq, cq) = _component_coefficients(
        img, quality, subsampling, grayscale
    )
    if scans is None:
        scans = _PROG_SCRIPT_GRAY if grayscale else _PROG_SCRIPT_COLOR
    sinks = []
    for cis, ss, se, ah, al in scans:
        if ss > 0 and len(cis) != 1:
            raise ValueError("AC scans must be single-component")
        sink = _OpSink()
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan must have Se=0")
            _emit_dc_scan(sink, (h, w0), comps, coefs, cis, ah, al, restart_interval)
        else:
            _emit_ac_scan(
                sink, (h, w0), comps, coefs, cis[0], ss, se, ah, al, restart_interval
            )
        sinks.append(sink)
    return _write_multiscan(
        h, w0, comps, coefs, (lq, cq), scans, sinks, restart_interval, sof=0xFFC2
    )


def encode_jpeg_multiscan_baseline(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Non-interleaved multi-scan BASELINE file: SOF0 with one full
    (DC+AC) scan per component over its own unpadded block grid — the
    T.81-legal layout some encoders emit for 3-component images, here
    synthesized so the decoder's non-interleaved path runs on real
    bytes. Reconstruction is identical to :func:`encode_jpeg` at the
    same parameters (tested)."""
    h, w0, comps, coefs, (lq, cq) = _component_coefficients(
        img, quality, subsampling, grayscale
    )
    sinks = []
    scans = []
    for ci in range(len(comps)):
        sink = _OpSink()
        tid = 0 if comps[ci]["q"] == 0 else 1
        # full-block scan = DC diffs + sequential AC over the
        # component's own geometry; expressed as a DC emit interleaved
        # with an AC emit per block (can't reuse the scan emitters
        # directly because baseline blocks carry both in one pass)
        preds = 0
        last_n = 0
        for n, ci_, by, bx in _blocks_of((h, w0), comps, coefs, (ci,)):
            if restart_interval and n != last_n and n % restart_interval == 0:
                sink.rst()
                preds = 0
            last_n = n
            blk = coefs[ci_][by, bx]
            dc = int(blk[0])
            diff = dc - preds
            preds = dc
            s = abs(diff).bit_length()
            sink.sym(0, tid, s)
            sink.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            nz = [k for k in range(1, 64) if blk[k]]
            for k in range(1, (nz[-1] + 1) if nz else 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    sink.sym(1, tid, 0xF0)
                    run -= 16
                s = abs(v).bit_length()
                sink.sym(1, tid, (run << 4) | s)
                sink.bits(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if not nz or nz[-1] < 63:
                sink.sym(1, tid, 0x00)  # EOB
        sinks.append(sink)
        scans.append(((ci,), 0, 63, 0, 0))
    return _write_multiscan(
        h, w0, comps, coefs, (lq, cq), scans, sinks, restart_interval, sof=0xFFC0
    )


def _write_multiscan(h, w0, comps, coefs, quants, scans, sinks, ri, sof):
    """Assemble the file: tables (flat Huffman from the collected
    symbol sets), SOF, then each scan's SOS header + entropy bytes."""
    lq, cq = quants

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in q.reshape(-1)[ZIGZAG]))

    # union symbol sets across scans per (class, tid); build flat tables
    all_syms: dict[tuple[int, int], set[int]] = {}
    for sink in sinks:
        for key, syms in sink.symbols.items():
            all_syms.setdefault(key, set()).update(syms)
    codes = {}
    dhts = b""
    for (cls, tid), syms in sorted(all_syms.items()):
        bits, vals = _flat_table(syms)
        codes[(cls, tid)] = _canonical_codes(bits, vals)
        dhts += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    gray = len(comps) == 1
    sof_body = struct.pack(">BHHB", 8, h, w0, len(comps))
    for c in comps:
        sof_body += bytes([c["id"], (c["h"] << 4) | c["v"], c["q"]])
    tables = dqt(0, lq) + (b"" if gray else dqt(1, cq)) + dhts
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", ri)) if ri else b""
    out = bytearray(b"\xff\xd8" + app0 + tables + dri + seg(sof, sof_body))
    for (cis, ss, se, ah, al), sink in zip(scans, sinks):
        body = bytes([len(cis)])
        for ci in cis:
            tid = 0 if comps[ci]["q"] == 0 else 1
            body += bytes([comps[ci]["id"], (tid << 4) | tid])
        body += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, body)
        out += _serialize_ops(sink.ops, codes)
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder — unified coefficient-buffer architecture
#
# Every scan (baseline interleaved, baseline non-interleaved multi-scan,
# progressive DC/AC first/refinement) decodes into per-component
# quantized-coefficient buffers; dequantization + IDCT + color convert
# run ONCE at the end over all blocks (a single vectorized einsum per
# component — faster than the old per-block matrix multiplies too).
# This is the standard progressive-decoder shape (T.81 Annex G): later
# scans refine coefficients earlier scans created, so pixels cannot be
# produced until the last scan lands.
# --------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF/JPEG -> (h, w, 3) uint8 RGB, pure numpy.

    Supports SOF0/SOF1 (baseline/extended sequential Huffman) including
    non-interleaved multi-scan files, and SOF2 (progressive Huffman:
    spectral selection + successive approximation, DC and AC refinement
    scans, EOB runs) — together the whole of web JPEG. 1 or 3
    components, 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers, fill
    bytes, either table arrangement. Arithmetic coding, lossless and
    hierarchical SOFs, and 12-bit precision raise
    ``NotImplementedError`` — honestly out of scope, dispatched cleanly.

    The entropy decode is bit-at-a-time Python — correct and fine for
    thumbnails/test payloads; for bulk production decode of large
    photographs a codec library still wins by orders of magnitude
    (drop one into :func:`decode_image`'s dispatch and this path
    becomes the fallback).

    VALIDATION BOUNDARY (round-5 ADVICE): progressive decoding is
    verified against this module's own progressive encoder plus
    baseline-reconstruction identity, and the refinement-bit
    interleaving was manually checked against T.81 G.1.2 / libjpeg
    semantics — but no INDEPENDENTLY-produced progressive bytes are
    exercised, because this container has no other JPEG producer
    (no PIL/libjpeg/cjpeg/imagemagick/cv2; re-checked round 6). A
    symmetric convention bug would survive round-trip testing. When
    independent bytes become available, add them as fixtures with
    expected pixel hashes next to tests/test_multimodal.py.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    coefs = None
    restart_interval = 0
    scanned = False
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad marker alignment")
        # optional 0xFF fill bytes before a marker are legal
        # (ITU-T T.81 B.1.1.2) and emitted by some encoder stacks
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers (TEM/RSTn): no length field
            continue
        length = struct.unpack_from(">H", payload, i + 2)[0]
        body = payload[i + 4 : i + 2 + length]
        i += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                qtables[tid] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2 (progressive)
            prec, h, w0, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"h": h, "w": w0, "comps": comps, "progressive": marker == 0xC2}
            # per-component quantized-coefficient buffers, MCU-padded,
            # zigzag index order (the entropy-coded order)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w0 // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/lossless/hierarchical) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}  # insertion-ordered: SOS component order
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tids >> 4, tids & 0xF)
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            scan = {"sel": sel, "ss": ss, "se": se, "ah": a >> 4, "al": a & 0xF}
            _validate_scan(frame, scan)
            j = _entropy_end(payload, i)
            _decode_scan_entropy(
                payload[i:j], frame, scan, coefs, htables, restart_interval
            )
            scanned = True
            i = j
        # other markers (APPn, COM, DNL): skipped
    if frame is None or not scanned:
        raise ValueError("jpeg has no scan")
    return _assemble(frame, coefs, qtables)


def _entropy_end(payload: bytes, i: int) -> int:
    """Index of the first true marker after entropy data at ``i`` —
    skipping stuffed 0x00 bytes, RSTn markers, and 0xFF fill bytes."""
    n = len(payload)
    j = i
    while j + 1 < n:
        if payload[j] == 0xFF:
            b = payload[j + 1]
            if b == 0x00 or 0xD0 <= b <= 0xD7:
                j += 2
                continue
            if b == 0xFF:  # fill byte before a marker
                j += 1
                continue
            return j
        j += 1
    return n


def _validate_scan(frame, scan) -> None:
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    if frame["progressive"]:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan["sel"]) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (0 <= ss <= se <= 63):
            raise ValueError("bad spectral range")
        if ah and ah != al + 1:
            raise ValueError("refinement scan must have Ah = Al + 1")
    elif (ss, se, ah) != (0, 63, 0) or al != 0:
        raise ValueError("sequential scan must have Ss=0 Se=63 Ah=Al=0")


def _decode_scan_entropy(data, frame, scan, coefs, htables, restart_interval):
    comps = frame["comps"]
    # MCU data is interleaved in SOS order, which T.81 allows to differ
    # from SOF order — iterate the scan's order, not the frame's
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    try:
        order = [by_id[cid] for cid in scan["sel"]]
    except KeyError as e:
        raise ValueError(f"SOS references unknown component {e}") from None
    prog = frame["progressive"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    if not prog:
        ss, al = 1, 0  # DC handled inline; full spectral range
    r = _BitReader(data)
    preds = [0] * len(comps)
    st = {"eob": 0}

    def restart():
        r.byte_align()
        while (
            r.i + 1 < len(r.data)
            and r.data[r.i] == 0xFF
            and 0xD0 <= r.data[r.i + 1] <= 0xD7
        ):
            r.i += 2
        for ci in range(len(preds)):
            preds[ci] = 0
        st["eob"] = 0

    def block(ci, by, bx):
        blk = coefs[ci][by, bx]
        td, ta = scan["sel"][comps[ci]["id"]]
        if prog and ss == 0:  # DC scan
            if ah == 0:
                dc_t = htables.get((0, td))
                if dc_t is None:
                    raise ValueError("missing huffman table")
                s = _decode_symbol(r, dc_t)
                preds[ci] += _receive_extend(r, s)
                blk[0] = preds[ci] << al
            elif r.read_bit():  # DC refinement: one raw bit per block
                blk[0] = int(blk[0]) | (1 << al)
            return
        ac_t = htables.get((1, ta))
        if ac_t is None:
            raise ValueError("missing huffman table")
        if prog and ah > 0:  # AC refinement
            _ac_refine_block(r, ac_t, blk, ss, se, al, st)
            return
        if not prog:  # sequential: DC precedes AC in the same block
            dc_t = htables.get((0, td))
            if dc_t is None:
                raise ValueError("missing huffman table")
            s = _decode_symbol(r, dc_t)
            preds[ci] += _receive_extend(r, s)
            blk[0] = preds[ci]
        # AC first scan (or sequential AC): EOB-run semantics — in
        # sequential data the EOB symbol (rrrr=0) yields eob=0, i.e.
        # plain end-of-block, so one loop serves both frame types
        if st["eob"]:
            st["eob"] -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_symbol(r, ac_t)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr == 15:
                    k += 16  # ZRL
                    continue
                st["eob"] = (1 << rr) - 1 + (r.read_bits(rr) if rr else 0)
                break
            k += rr
            if k > se:
                raise ValueError("AC run past spectral end")
            blk[k] = _receive_extend(r, s) << al
            k += 1

    ri = restart_interval
    if len(order) > 1:  # interleaved: MCUs of the scan's components
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-frame["w"] // (8 * hmax))
        mcuy = -(-frame["h"] // (8 * vmax))
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and n and n % ri == 0:
                    restart()
                for ci in order:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block(ci, my * c["v"] + by, mx * c["h"] + bx)
                n += 1
    else:  # non-interleaved: the component's own (unpadded) block grid
        ci = order[0]
        c = comps[ci]
        hmax = max(cc["h"] for cc in comps)
        vmax = max(cc["v"] for cc in comps)
        cw = -(-frame["w"] * c["h"] // hmax)  # ceil(w * h_i / hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        n = 0
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                if ri and n and n % ri == 0:
                    restart()
                block(ci, by, bx)
                n += 1


def _ac_refine_block(r, ac_t, blk, ss, se, al, st):
    """One block of an AC successive-approximation refinement scan
    (T.81 G.1.2.3): already-nonzero coefficients receive a correction
    bit as the scan passes them; newly significant coefficients appear
    as ±2^Al; EOB runs cover blocks with no new significant coefs."""
    p1 = 1 << al

    def correct(k):
        c = int(blk[k])
        if r.read_bit() and not (c & p1):
            blk[k] = c + p1 if c > 0 else c - p1

    if st["eob"]:
        st["eob"] -= 1
        for k in range(ss, se + 1):
            if blk[k]:
                correct(k)
        return
    k = ss
    while k <= se:
        rs = _decode_symbol(r, ac_t)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr != 15:  # EOBn: run of blocks with no new significants
                st["eob"] = (1 << rr) - 1 + (r.read_bits(rr) if rr else 0)
                for k2 in range(k, se + 1):  # corrections for the rest
                    if blk[k2]:
                        correct(k2)
                return
            val = 0  # ZRL: skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("bad AC refinement symbol")
            val = p1 if r.read_bit() else -p1
        # advance over rr zero-history positions, correcting nonzero ones
        while k <= se:
            if blk[k]:
                correct(k)
            else:
                if rr == 0:
                    break
                rr -= 1
            k += 1
        if val and k <= se:
            blk[k] = val
        k += 1


def _assemble(frame, coefs, qtables):
    """Dequantize + IDCT every component's coefficient buffer (one
    vectorized einsum per component), upsample chroma, color-convert."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["q"])
        if q is None:
            raise ValueError("missing quantization table")
        qz = q.reshape(-1)[ZIGZAG].astype(np.float64)  # zigzag-order quant
        zz = coefs[ci].astype(np.float64) * qz
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz  # un-zigzag to natural order
        bh_, bw_ = nat.shape[:2]
        blocks = nat.reshape(bh_, bw_, 8, 8)
        pix = np.einsum("ab,yxbc,cd->yxad", _T.T, blocks, _T) + 128.0
        planes.append(pix.transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8))
    h, w0 = frame["h"], frame["w"]
    if len(comps) == 1:
        y = np.clip(planes[0][:h, :w0] + 0.5, 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    # upsample chroma to luma grid (nearest — the JFIF common case)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = p.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        full.append(p[: mcuy * 8 * vmax, : mcux * 8 * hmax])
    ycc = np.stack(full, axis=-1)[:h, :w0]
    return _ycbcr_to_rgb(ycc)
