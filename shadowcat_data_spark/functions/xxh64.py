"""Driver-side XXH64 — the hash `F.xxhash64` evaluates in the JVM.

Why this exists (optimization round 11): every index/bloom PROBE needs the
hash of a handful of driver-side constants (the probed terms' bucket ids,
a bounded id-set's bloom bit positions). Evaluating those through
``spark.createDataFrame([...]).select(F.xxhash64(...)).collect()`` launches
a full Spark job — ``parallelize`` fans the 3-row probe into
defaultParallelism empty tasks (measured: one 32-task job per probe,
0.1-0.8 s of pure scheduling at local[32]) — to hash a few dozen bytes.
Guide §1.2: don't spend a cluster job on constant-size driver work.

This module reimplements the exact function Spark evaluates, so the probe
side computes bucket ids / bit positions in microseconds with NO job. It
is the standard public XXH64 algorithm (Yann Collet's xxHash, BSD; the
same spec Spark's ``org.apache.spark.unsafe.hash.XXH64`` implements):

- ``xxh64_string(s, seed)``  == ``xxhash64(lit(s))`` with that seed over
  the UTF-8 bytes (Spark hashes UTF8String bytes; default seed 42).
- ``xxh64_int(i, seed)``     == the IntegerType chain step — Spark's
  ``hashInt``, i.e. XXH64 of the 4-byte little-endian value.
- ``xxh64_long(l, seed)``    == the LongType chain step (``hashLong``).

Multi-column ``F.xxhash64(a, b, ...)`` is the seed-42 fold of these steps:
thread each value's step output as the next step's seed (callers do this
inline, e.g. ``xxh64_int(s, xxh64_string(v))`` in the bloom probe).

Parity with the JVM is pinned by ``tests/test_xxh64_parity.py``, which
compares every helper against the live ``F.xxhash64`` over random tokens,
lengths 0-200, all chain shapes used in-repo. Any drift fails the suite —
and would also fail every pruned-probe oracle in the sweep, since a wrong
bucket id reads the wrong files.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

DEFAULT_SEED = 42  # Spark's xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64_bytes(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """Unsigned XXH64 of ``data`` — the reference algorithm: 32-byte
    stripes into 4 accumulators, then 8/4/1-byte tail, little-endian."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (
                _round(v1, k1),
                _round(v2, k2),
                _round(v3, k3),
                _round(v4, k4),
            )
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, i)
        h ^= (k1 * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_string(s: str, seed: int = DEFAULT_SEED) -> int:
    """== Spark ``xxhash64`` over a StringType value (UTF-8 bytes)."""
    return xxh64_bytes(s.encode("utf-8"), seed)


def xxh64_int(i: int, seed: int = DEFAULT_SEED) -> int:
    """== Spark's IntegerType step (``hashInt``): XXH64 of the 4-byte
    little-endian two's-complement value."""
    seed &= _M
    h = (seed + _P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxh64_long(l: int, seed: int = DEFAULT_SEED) -> int:
    """== Spark's LongType step (``hashLong``): XXH64 of the 8-byte
    little-endian two's-complement value."""
    seed &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((l & _M) * _P2 & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def to_signed(h: int) -> int:
    """The unsigned hash as the signed 64-bit long Spark returns."""
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod64(h: int, m: int) -> int:
    """``F.pmod(xxhash64(...), lit(m))`` on the unsigned hash: pmod of
    the signed value, always in [0, m)."""
    return to_signed(h) % m
