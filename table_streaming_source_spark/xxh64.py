"""From-scratch XXH64 (the public xxHash spec,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) plus
the exact composition Spark's ``xxhash64(...)`` expression applies —
so manifest Bloom fingerprints built by a SPARK job
(``F.xxhash64(col, F.lit(j))``) can be probed from PYTHON with a
single literal value (``snapshot_files(point=)``) and vice versa.

Spark's expression chains one XXH64 per argument: the running hash is
the next argument's SEED, starting at 42
(``org.apache.spark.sql.catalyst.expressions.XxHash64`` — public
Apache-2.0 source; a LONG hashes as its 8 little-endian bytes, a
STRING as its UTF-8 bytes).  Cross-checked against the live Spark
expression in ``tests/test_table_format.py``.  Lives at package top
level (not under ``functions/``) so executor-side Python workers can
import it without the session-requiring pandas-UDF package init."""

from __future__ import annotations

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


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
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
    return h


def _as_bytes(value) -> bytes:
    if isinstance(value, bool):
        raise TypeError("bool keys are not bloom-indexable")
    if isinstance(value, int):
        return (value & _M).to_bytes(8, "little")
    if isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, bytes):
        return value
    raise TypeError(
        f"bloom fingerprints support int/string keys, got {type(value)}"
    )


def spark_xxhash64(*values, seed: int = 42) -> int:
    """The SIGNED result of Spark's ``xxhash64(v1, v2, ...)``: one
    XXH64 per argument, each seeded with the running hash (initial
    seed 42)."""
    h = seed & _M
    for v in values:
        h = xxh64(_as_bytes(v), h)
    return h - (1 << 64) if h >= (1 << 63) else h
