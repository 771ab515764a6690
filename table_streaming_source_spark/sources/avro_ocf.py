"""Pure-Python Avro Object Container File (OCF) reader/writer + a
distributed Spark reader on top of the built-in ``binaryFile`` source.

The reference's data model is Avro-schema-centric: its config declares an
Avro-flavoured JSON schema parsed at configure time (reference
`src/main/java/io/cdap/plugin/table/streaming/TableStreamingSourceConfig.java:101-107`)
and :mod:`..avro_schema` already bridges that schema language to Spark
``StructType`` (A6).  This module closes the FORMAT loop: actual
``.avro`` container files in and out of DataFrames, written to the
public Apache Avro 1.11 spec, with no spark-avro jar (absent in this
environment) and no external Python package.

Scope (documented, validated): **flat record schemas** over the primitive
types null / boolean / int / long / float / double / bytes / string, the
``timestamp-micros``/``timestamp-millis`` logical types, and
nullable-as-``["null", T]`` unions — the reference's wire surface.
Codecs: ``null`` and ``deflate``.  Nested records/arrays/maps raise a
clear error (the schema BRIDGE supports them; the binary decoder scope
is the flat-event shape every fixture and the reference's docs use).

Scale: the Spark reader is ``binaryFile`` → Arrow ``mapInPandas`` —
file-granular parallelism, each container decoding on an executor with
payloads never crossing the driver.  Avro blocks inside one file decode
sequentially (an OCF is sync-marker-splittable in principle; per-file
granularity is the standard first cut and matches how event pipelines
land many medium files).
"""

from __future__ import annotations

from table_streaming_source_spark.malformed import (
    bounded_inflate,
    quarantinable,
)

import io
import json
import struct
import zlib
from typing import Any, Callable, Iterator

MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic sync marker for reproducible files

_PRIMITIVES = ("null", "boolean", "int", "long", "float", "double",
               "bytes", "string")


# ---------------------------------------------------------------------------
# binary primitives (Avro spec "Binary encoding")
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: bytearray, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    z, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(z), pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _field_writer(ftype: Any) -> Callable[[bytearray, Any], None]:
    if isinstance(ftype, dict):
        ftype = ftype.get("type")  # logical types ride the physical type
    if isinstance(ftype, list):  # union — nullable ["null", T] only
        if len(ftype) != 2 or "null" not in ftype:
            raise ValueError(f"only [null, T] unions supported: {ftype}")
        inner = _field_writer(next(t for t in ftype if t != "null"))
        null_idx = ftype.index("null")

        def w_union(out: bytearray, v: Any) -> None:
            if v is None:
                write_long(out, null_idx)
            else:
                write_long(out, 1 - null_idx)
                inner(out, v)

        return w_union
    if ftype in ("long", "int"):
        return lambda out, v: write_long(out, int(v))
    if ftype == "string":
        def w_str(out: bytearray, v: Any) -> None:
            b = str(v).encode("utf-8")
            write_long(out, len(b))
            out.extend(b)
        return w_str
    if ftype == "bytes":
        def w_bytes(out: bytearray, v: Any) -> None:
            b = bytes(v)
            write_long(out, len(b))
            out.extend(b)
        return w_bytes
    if ftype == "double":
        return lambda out, v: out.extend(struct.pack("<d", float(v)))
    if ftype == "float":
        return lambda out, v: out.extend(struct.pack("<f", float(v)))
    if ftype == "boolean":
        return lambda out, v: out.append(1 if v else 0)
    if ftype == "null":
        return lambda out, v: None
    raise ValueError(f"unsupported Avro type for flat records: {ftype!r}")


def _field_reader(ftype: Any) -> Callable[[bytes, int], tuple[Any, int]]:
    logical = None
    if isinstance(ftype, dict):
        logical = ftype.get("logicalType")
        ftype = ftype.get("type")
    if isinstance(ftype, list):
        if len(ftype) != 2 or "null" not in ftype:
            raise ValueError(f"only [null, T] unions supported: {ftype}")
        inner = _field_reader(next(t for t in ftype if t != "null"))
        null_idx = ftype.index("null")

        def r_union(buf: bytes, pos: int) -> tuple[Any, int]:
            idx, pos = read_long(buf, pos)
            if idx == null_idx:
                return None, pos
            return inner(buf, pos)

        return r_union
    if ftype in ("long", "int"):
        if logical in ("timestamp-micros", "timestamp-millis"):
            scale = 1 if logical == "timestamp-micros" else 1000

            def r_ts(buf: bytes, pos: int) -> tuple[Any, int]:
                v, pos = read_long(buf, pos)
                return v * scale, pos  # normalized to µs since epoch

            return r_ts
        return read_long
    if ftype == "string":
        def r_str(buf: bytes, pos: int) -> tuple[Any, int]:
            n, pos = read_long(buf, pos)
            return buf[pos : pos + n].decode("utf-8"), pos + n
        return r_str
    if ftype == "bytes":
        def r_bytes(buf: bytes, pos: int) -> tuple[Any, int]:
            n, pos = read_long(buf, pos)
            return buf[pos : pos + n], pos + n
        return r_bytes
    if ftype == "double":
        return lambda buf, pos: (
            struct.unpack_from("<d", buf, pos)[0],
            pos + 8,
        )
    if ftype == "float":
        return lambda buf, pos: (
            struct.unpack_from("<f", buf, pos)[0],
            pos + 4,
        )
    if ftype == "boolean":
        return lambda buf, pos: (buf[pos] == 1, pos + 1)
    if ftype == "null":
        return lambda buf, pos: (None, pos)
    raise ValueError(f"unsupported Avro type for flat records: {ftype!r}")


def _record_fields(schema: Any) -> list:
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    return schema["fields"]


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def write_ocf(
    schema_json: str,
    rows: "Iterator[tuple] | list",
    *,
    codec: str = "deflate",
    records_per_block: int = 4096,
) -> bytes:
    """Serialize ``rows`` (tuples in field order) into one Avro OCF."""
    schema = json.loads(schema_json)
    writers = [_field_writer(f["type"]) for f in _record_fields(schema)]

    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        write_long(out, len(kb))
        out.extend(kb)
        write_long(out, len(v))
        out.extend(v)
    write_long(out, 0)  # metadata map terminator
    out.extend(_SYNC)

    rows = list(rows)
    for start in range(0, len(rows), records_per_block):
        chunk = rows[start : start + records_per_block]
        payload = bytearray()
        for row in chunk:
            for w, v in zip(writers, row):
                w(payload, v)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            payload = comp.compress(bytes(payload)) + comp.flush()
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out.extend(payload)
        out.extend(_SYNC)
    return bytes(out)


@quarantinable("Avro OCF")
def decode_ocf(blob: bytes) -> tuple[dict, list]:
    """Decode one OCF into ``(schema_dict, rows)`` (tuples in field
    order, timestamps normalized to µs since epoch)."""
    if blob[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(blob, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count → abs count + byte size follows
            n = -n
            _, pos = read_long(blob, pos)
        # a corrupt varint can declare billions of entries; each real
        # entry needs >= 2 bytes, so bound the loop by what remains
        # (the fuzz sweep's infinite-spin case)
        if n > len(blob) - pos:
            raise ValueError("OCF metadata count exceeds buffer")
        for _ in range(n):
            klen, pos = read_long(blob, pos)
            if klen < 0 or pos + klen > len(blob):
                raise ValueError("OCF metadata key overruns buffer")
            k = blob[pos : pos + klen].decode()
            pos += klen
            vlen, pos = read_long(blob, pos)
            if vlen < 0 or pos + vlen > len(blob):
                raise ValueError("OCF metadata value overruns buffer")
            meta[k] = blob[pos : pos + vlen]
            pos += vlen
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    readers = [_field_reader(f["type"]) for f in _record_fields(schema)]
    sync = blob[pos : pos + 16]
    pos += 16

    rows: list = []
    while pos < len(blob):
        n_rec, pos = read_long(blob, pos)
        n_bytes, pos = read_long(blob, pos)
        if n_bytes < 0 or pos + n_bytes > len(blob):
            raise ValueError("OCF block overruns buffer")
        payload = blob[pos : pos + n_bytes]
        pos += n_bytes
        if codec == "deflate":
            payload = bounded_inflate(payload, fmt="Avro OCF block")
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        # every record costs >= 1 byte per field — a corrupt count must
        # not drive a billion-iteration decode loop
        if n_rec < 0 or n_rec > len(payload) + 1:
            raise ValueError("OCF record count exceeds block size")
        p = 0
        for _ in range(n_rec):
            row = []
            for r in readers:
                v, p = r(payload, p)
                row.append(v)
            rows.append(tuple(row))
        if blob[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch — corrupt container")
        pos += 16
    return schema, rows


#: binaryFile's fixed output schema — needed explicitly on the STREAMING
#: reader (file stream sources require a user schema)
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def _arrow_decoder(schema_json: str):
    """Build the shared Arrow ``mapInPandas`` decoder for ``schema_json``:
    returns ``(decode_batches, struct_type)``.  The declared schema (the
    reference's configure-time contract) is validated against every
    file's embedded writer schema — mismatched field names/order raise
    rather than silently misalign."""
    import pandas as pd

    from table_streaming_source_spark.avro_schema import parse_avro_json

    declared = json.loads(schema_json)
    declared_fields = [
        (f["name"], json.dumps(f["type"], sort_keys=True))
        for f in _record_fields(declared)
    ]
    struct_type = parse_avro_json(schema_json)
    names = [f.name for f in struct_type.fields]
    ts_cols = {
        f.name
        for f in struct_type.fields
        if f.dataType.typeName().startswith("timestamp")
    }

    def decode_batches(
        batches: "Iterator[pd.DataFrame]",
    ) -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            all_rows: list = []
            for blob in pdf["content"]:
                schema, rows = decode_ocf(bytes(blob))
                got = [
                    (f["name"], json.dumps(f["type"], sort_keys=True))
                    for f in _record_fields(schema)
                ]
                if got != declared_fields:
                    raise ValueError(
                        "writer schema does not match declared schema: "
                        f"{got} != {declared_fields}"
                    )
                all_rows.extend(rows)
            out = pd.DataFrame(all_rows, columns=names)
            for c in ts_cols:
                out[c] = pd.to_datetime(out[c], unit="us")
            yield out

    return decode_batches, struct_type


def read_avro(spark, path: str, schema_json: str):
    """Distributed OCF read: ``binaryFile`` scan → Arrow ``mapInPandas``
    decode, one container per executor task, payloads never on the
    driver.  Returns a DataFrame with the Spark translation of
    ``schema_json`` (via :func:`..avro_schema.parse_avro_json`)."""
    decode_batches, struct_type = _arrow_decoder(schema_json)
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(decode_batches, schema=struct_type)
    )


def stream_avro(spark, path: str, schema_json: str, **reader_options):
    """STREAMING OCF ingest — the reference's concept end to end: Avro
    containers land in a directory, each micro-batch decodes the newly
    arrived files (same Arrow decoder as :func:`read_avro`, stateless →
    partition-preserving), downstream operators see typed rows.
    ``reader_options`` pass through to the file stream source
    (``maxFilesPerTrigger`` controls batch granularity)."""
    decode_batches, struct_type = _arrow_decoder(schema_json)
    reader = spark.readStream.format("binaryFile")
    for k, v in reader_options.items():
        reader = reader.option(k, str(v))
    return (
        reader.schema(_BINARYFILE_SCHEMA)
        .load(path)
        .select("content")
        .mapInPandas(decode_batches, schema=struct_type)
    )


def write_ocf_pandas(events_pdf, schema_json: str, dest: str) -> None:
    """Write one pandas frame (with a ``ts`` datetime column) as one
    Avro object container at ``dest`` — the per-shard fixture writer
    the batch and streaming Avro entries hand to
    ``plans/_fixtures.write_sharded`` (each executor task writes its
    residue shard through this)."""
    events_pdf = events_pdf.copy()
    events_pdf["ts"] = events_pdf["ts"].astype("int64") // 1000  # ns → µs
    with open(dest, "wb") as fh:
        fh.write(
            write_ocf(
                schema_json,
                list(events_pdf.itertuples(index=False, name=None)),
            )
        )
