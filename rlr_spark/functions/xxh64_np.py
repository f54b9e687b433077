"""Vectorized numpy implementation of Spark's ``xxhash64`` primitives.

Spark's ``XxHash64`` expression (catalyst XXH64) hashes fixed-width
values with two scalar rounds — ``hashLong`` / ``hashInt`` — and folds
multiple children by chaining: ``result = hash(child, result)`` starting
from seed 42.  An ``array<long>`` child is likewise a chained
``hashLong`` fold over its elements.  Both rounds are branch-free
multiply/rotate/xor sequences over 64-bit lanes, so they vectorize
directly as numpy ``uint64`` ufuncs — THE property the Arrow minhash
signature kernel exploits (operators/blocking.py): where the JVM
struct-fold pays a 48-field struct copy per shingle element, the numpy
form is 48 flat vector passes over a cache-resident batch with zero
per-element structure.

Bit-identity with the JVM is load-bearing (tests assert exact equality
of band keys between the fold and Arrow implementations), so the
constants and operation order below mirror
``org.apache.spark.sql.catalyst.expressions.XXH64`` exactly.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = np.uint64(42)

_U64 = np.uint64
_M64 = (1 << 64) - 1


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = _U64(r)
    return (x << r_) | (x >> _U64(64 - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _P2
    h = h ^ (h >> _U64(29))
    h = h * _P3
    h = h ^ (h >> _U64(32))
    return h


def hash_long(value: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashLong — ``value`` uint64 array, ``seed`` scalar or array."""
    h = seed + (_P5 + _U64(8))
    h = h ^ (_rotl(value * _P2, 31) * _P1)
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def hash_int(value: int, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64.hashInt for a SCALAR int input against an array of seeds —
    the shape the permutation loop needs (seed varies per element, the
    permutation index j is a literal)."""
    h = seed + (_P5 + _U64(4))
    h = h ^ _U64(((value & 0xFFFFFFFF) * 0x9E3779B185EBCA87) & _M64)
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)


def xxhash64_longs(values: list[int] | np.ndarray, seed: int = 42) -> int:
    """Reference scalar helper: Spark ``xxhash64(bigint, bigint, ...)`` —
    chained hashLong over the values.  For tests and tiny driver-side
    parity checks only; the kernels below are the vectorized paths."""
    with np.errstate(over="ignore"):  # numpy warns on SCALAR wraparound only
        h = _U64(seed)
        for v in np.asarray(values, dtype=np.int64).view(np.uint64):
            h = hash_long(v, h)
        return int(np.uint64(h).astype(np.int64))
