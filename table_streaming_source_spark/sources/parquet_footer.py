"""From-scratch Parquet footer reader: Thrift Compact Protocol walk.

Parquet's file metadata (parquet-format ``FileMetaData``) sits at the
tail of every file: ``[data] [FileMetaData (thrift compact)] [4-byte LE
footer length] [b"PAR1"]``.  This module implements the THRIFT COMPACT
PROTOCOL (public spec: thrift-compact-protocol.md) from scratch —
varints, zigzag, short/long-form field headers, nested structs, lists,
binary — and walks ``FileMetaData`` for the fields an engine's planner
actually uses (parquet-format parquet.thrift, public):

    1: i32  version
    2: list<SchemaElement> schema      (leaf count = columns)
    3: i64  num_rows
    4: list<RowGroup> row_groups       (each: 2: total_byte_size,
                                              3: num_rows)
    6: binary created_by

Footer-only I/O is the point at scale: the reader seeks to ``EOF-8``,
reads the length word, then reads exactly ``len`` bytes — a 100 TB
table's planning pass touches kilobytes per file, never row data.

No third-party parquet library is involved anywhere in this module.
"""

from __future__ import annotations

from table_streaming_source_spark.malformed import quarantinable

import struct
from dataclasses import dataclass

# thrift compact type ids (spec §"Struct encoding")
_CT_STOP = 0x0
_CT_TRUE = 0x1
_CT_FALSE = 0x2
_CT_BYTE = 0x3
_CT_I16 = 0x4
_CT_I32 = 0x5
_CT_I64 = 0x6
_CT_DOUBLE = 0x7
_CT_BINARY = 0x8
_CT_LIST = 0x9
_CT_SET = 0xA
_CT_MAP = 0xB
_CT_STRUCT = 0xC


def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint overflow")


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _parse_value(buf: bytes, pos: int, ctype: int):
    """One thrift-compact value of compact-type ``ctype`` → (value, pos)."""
    if ctype == _CT_TRUE:
        return True, pos
    if ctype == _CT_FALSE:
        return False, pos
    if ctype == _CT_BYTE:
        return struct.unpack_from("b", buf, pos)[0], pos + 1
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        u, pos = _uvarint(buf, pos)
        return _zigzag(u), pos
    if ctype == _CT_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ctype == _CT_BINARY:
        n, pos = _uvarint(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if ctype in (_CT_LIST, _CT_SET):
        header = buf[pos]
        pos += 1
        size = (header >> 4) & 0xF
        etype = header & 0xF
        if size == 0xF:
            size, pos = _uvarint(buf, pos)
        items = []
        for _ in range(size):
            # bool list elements are full bytes (1 = true, 2 = false)
            if etype in (_CT_TRUE, _CT_FALSE):
                items.append(buf[pos] == 1)
                pos += 1
            else:
                v, pos = _parse_value(buf, pos, etype)
                items.append(v)
        return items, pos
    if ctype == _CT_MAP:
        size, pos = _uvarint(buf, pos)
        if size == 0:
            return {}, pos
        kv = buf[pos]
        pos += 1
        ktype, vtype = (kv >> 4) & 0xF, kv & 0xF
        out = {}
        for _ in range(size):
            k, pos = _parse_value(buf, pos, ktype)
            v, pos = _parse_value(buf, pos, vtype)
            out[k] = v
        return out, pos
    if ctype == _CT_STRUCT:
        return _parse_struct(buf, pos)
    raise ValueError(f"unknown compact type {ctype}")


def _parse_struct(buf: bytes, pos: int) -> tuple[dict[int, object], int]:
    """Thrift-compact struct → {field_id: value} (unknown fields kept —
    the walk is schema-agnostic; callers pick the ids they know)."""
    fields: dict[int, object] = {}
    prev_id = 0
    while True:
        b = buf[pos]
        pos += 1
        if b == _CT_STOP:
            return fields, pos
        delta = (b >> 4) & 0xF
        ctype = b & 0xF
        if delta == 0:
            u, pos = _uvarint(buf, pos)
            fid = _zigzag(u)
        else:
            fid = prev_id + delta
        prev_id = fid
        fields[fid], pos = _parse_value(buf, pos, ctype)


@dataclass(frozen=True)
class FooterInfo:
    version: int
    num_rows: int
    n_row_groups: int
    n_leaf_columns: int
    rowgroup_rows_sum: int
    total_byte_size: int
    created_by: str
    footer_len: int


@quarantinable("parquet footer")
def parse_footer(footer: bytes) -> FooterInfo:
    """Parse a raw ``FileMetaData`` thrift blob (magic/length stripped)."""
    meta, _ = _parse_struct(footer, 0)
    schema = meta.get(2, [])
    # leaf = SchemaElement with no/zero num_children (field 5); the first
    # element is the message root and never a column
    leaves = sum(
        1 for el in schema[1:] if not el.get(5)
    )
    row_groups = meta.get(4, [])
    return FooterInfo(
        version=int(meta.get(1, 0)),
        num_rows=int(meta.get(3, 0)),
        n_row_groups=len(row_groups),
        n_leaf_columns=leaves,
        rowgroup_rows_sum=sum(int(rg.get(3, 0)) for rg in row_groups),
        total_byte_size=sum(int(rg.get(2, 0)) for rg in row_groups),
        created_by=(meta.get(6, b"") or b"").decode("utf-8", "replace"),
        footer_len=len(footer),
    )


def read_footer(path: str) -> FooterInfo:
    """Footer-only read: tail magic + length word, then exactly the
    metadata bytes — never row data."""
    with open(path, "rb") as fh:
        fh.seek(-8, 2)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"not a parquet file (bad magic): {path}")
        (flen,) = struct.unpack("<I", tail[:4])
        fh.seek(-(8 + flen), 2)
        return parse_footer(fh.read(flen))
