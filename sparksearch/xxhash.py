"""Pure-Python xxHash64, bit-identical to Spark's `xxhash64` expression.

Spark's XxHash64 expression hashes a string column's UTF-8 bytes with
xxHash64 (public algorithm, github.com/Cyan4973/xxHash spec) at seed 42 and
returns a signed 64-bit value. The index layout keys bucket directories by
`pmod(xxhash64(term), n_buckets)`, so the driver can compute a term's bucket
without launching a Spark job per query — query planning (bucket pruning,
WAND) becomes zero-job. Parity with the JVM expression is pinned by
tests/test_xxhash.py over adversarial inputs.

NOTE Spark detail: for a STRING input Spark hashes the raw bytes via
XxHash64Function.hash(UTF8String) which processes 8-byte words with
little-endian reads — the standard xxh64 byte-stream algorithm.
"""

from __future__ import annotations

import struct

__all__ = ["xxhash64", "spark_bucket"]

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """xxh64 of `data`, returned as a SIGNED 64-bit int (Spark semantics)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            w = struct.unpack_from("<4Q", data, i)
            v1, v2 = _round(v1, w[0]), _round(v2, w[1])
            v3, v4 = _round(v3, w[2]), _round(v4, w[3])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        (w,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, w)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        (w,) = struct.unpack_from("<I", data, i)
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_bucket(term: str, n_buckets: int) -> int:
    """pmod(xxhash64(term), n_buckets) — the index's bucket id for a term."""
    return xxhash64(term.encode("utf-8")) % n_buckets
