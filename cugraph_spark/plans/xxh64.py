"""Driver-side replica of Spark's ``xxhash64`` expression (vectorized).

Every iterative operator draws its deterministic per-round randomness
from ``F.xxhash64(...)`` (counter-based hashing — SURVEY.md §4.2), so a
driver-local tail (``plans/local_tail.py``) can only be *bit-identical*
to the distributed loop if it evaluates the very same hash. This module
re-implements the two code paths Spark's ``XxHash64`` expression uses
for the engine's hash inputs — 8-byte longs and 4-byte ints — from the
public xxHash specification (XXH64, Yann Collet,
https://github.com/Cyan4973/xxHash — spec is public domain), matching
``org.apache.spark.sql.catalyst.expressions.XxHash64`` semantics:

- the expression threads the running hash through each child: starting
  from seed 42, ``h = hash_child(value_i, seed=h)``;
- integral types int/short/byte take the 4-byte path, longs (and
  doubles via ``doubleToLongBits``) the 8-byte path;
- the result is the raw signed 64-bit hash (no finalization beyond the
  avalanche).

All functions are numpy-vectorized over uint64 with modular wraparound
(the dtype's native overflow semantics), so a local tail hashing a few
hundred thousand vertex ids costs microseconds. Exactness vs the JVM
expression is pinned in ``tests/test_local_tail.py`` over random
positive/negative inputs and multi-column chains.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

_SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    h = h ^ (h >> np.uint64(32))
    return h


def _as_u64(values) -> np.ndarray:
    a = np.asarray(values)
    if a.dtype != np.uint64:
        a = a.astype(np.int64, copy=False).view(np.uint64)
    return a


def hash_long(values, seed) -> np.ndarray:
    """XXH64 of a single 8-byte (long) input per row. ``seed`` may be a
    scalar or a per-row uint64 array (the running hash)."""
    with np.errstate(over="ignore"):
        v = _as_u64(values)
        seed = seed if isinstance(seed, np.ndarray) else np.uint64(seed)
        acc = seed + _P5 + np.uint64(8)
        k1 = _rotl(v * _P2, 31) * _P1
        acc = acc ^ k1
        acc = _rotl(acc, 27) * _P1 + _P4
        return _avalanche(acc)


def hash_int(values, seed) -> np.ndarray:
    """XXH64 of a single 4-byte (int) input per row (Spark's path for
    IntegerType literals such as round counters)."""
    with np.errstate(over="ignore"):
        a = np.asarray(values)
        if a.dtype != np.uint64:
            a = a.astype(np.int32, copy=False).astype(np.uint32).astype(np.uint64)
        else:
            a = a & np.uint64(0xFFFFFFFF)
        seed = seed if isinstance(seed, np.ndarray) else np.uint64(seed)
        acc = seed + _P5 + np.uint64(4)
        acc = acc ^ (a * _P1)
        acc = _rotl(acc, 23) * _P2 + _P3
        return _avalanche(acc)


def xxhash64(*cols) -> np.ndarray:
    """Replica of ``F.xxhash64(c1, c2, ...)`` over numpy columns,
    returned as signed int64 (Spark's LongType result).

    Each element of ``cols`` is either an array/scalar (hashed on the
    long path — use for vertex-id columns) or a tuple ``("int", v)`` /
    ``("long", v)`` selecting the width explicitly. Python ``int``
    literals passed bare follow Spark's ``F.lit`` typing rule: int path
    when they fit in 32 bits, long otherwise.
    """
    n = None
    for c in cols:
        v = c[1] if isinstance(c, tuple) else c
        if isinstance(v, np.ndarray):
            n = len(v)
            break
    h: np.ndarray | np.uint64 = (
        np.full(n, _SPARK_SEED, dtype=np.uint64) if n is not None else _SPARK_SEED
    )
    for c in cols:
        if isinstance(c, tuple):
            kind, v = c
        else:
            v = c
            if isinstance(v, (int, np.integer)) and not isinstance(v, np.ndarray):
                kind = "int" if -(2**31) <= int(v) < 2**31 else "long"
            else:
                kind = "long"
        h = hash_int(v, h) if kind == "int" else hash_long(v, h)
    return np.asarray(h, dtype=np.uint64).view(np.int64)


def pmod2(hashes: np.ndarray) -> np.ndarray:
    """``F.pmod(h, 2)`` for signed int64 hashes: the non-negative
    remainder."""
    return np.mod(hashes, 2)
