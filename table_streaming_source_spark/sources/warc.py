"""WARC (Web ARChive, ISO 28500) ingestion — the wire format web-scale
corpora arrive in (Common Crawl et al.).  A pure-Python record walker
over Spark's ``binaryFile`` source: each WARC file is one task (the
same work-unit granularity real pipelines get from one gzip member
stream per file), records are parsed with an Arrow-batched
``mapInPandas``, and only the parsed fields leave the executor — the
raw archive bytes never shuffle.

Record grammar implemented (WARC/1.0): a header block of
``Name: value`` lines terminated by CRLF CRLF, a payload of exactly
``Content-Length`` bytes, then CRLF CRLF before the next record.  For
``response`` records the payload is an HTTP/1.1 message; the HTTP
header block is split off and the entity body returned as text.

Scale: parsing is stateless and per-file; a 100 TB crawl is just more
files (binaryFile lists and splits by file), and the decode chain has
zero exchanges until the caller aggregates.  Reference semantics:
the reference ingests prepared tables (`SnapshotConfig.scala:24`);
WARC ingestion is the §2B⁺ corpus-side extension of the same
source-to-table contract.
"""

from __future__ import annotations

from table_streaming_source_spark.malformed import quarantinable

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_CRLF = b"\r\n"


def write_warc(path: str, records: list[tuple[str, str, str]]) -> None:
    """Write one WARC file of ``response`` records.  ``records`` is
    ``[(record_id, target_uri, body_text), ...]``; the HTTP envelope is
    the canonical minimal 200 response."""
    with open(path, "wb") as fh:
        for record_id, uri, body in records:
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/plain\r\n\r\n"
                + body.encode("utf-8")
            )
            header = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Record-ID: <{record_id}>\r\n".encode()
                + f"WARC-Target-URI: {uri}\r\n".encode()
                + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                + b"Content-Type: application/http; msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n".encode()
                + _CRLF
            )
            fh.write(header + http + _CRLF + _CRLF)


@quarantinable("WARC")
def parse_warc_bytes(
    payload: bytes,
) -> list[tuple[str, str, str, int, str]]:
    """Walk one WARC stream → ``[(record_id, warc_type, target_uri,
    content_length, body_text), ...]``.  Malformed framing raises
    ``ValueError`` (the caller's quarantine path)."""
    out = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC magic at offset {pos}")
        head_end = payload.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        for line in payload[pos:head_end].split(_CRLF)[1:]:
            name, _, value = line.decode("utf-8").partition(":")
            headers[name.strip().lower()] = value.strip()
        clen = int(headers["content-length"])
        body_start = head_end + 4
        block = payload[body_start : body_start + clen]
        if len(block) != clen:
            raise ValueError("truncated WARC payload")
        rec_id = headers.get("warc-record-id", "").strip("<>")
        rec_type = headers.get("warc-type", "")
        uri = headers.get("warc-target-uri", "")
        if rec_type == "response" and block.startswith(b"HTTP/"):
            http_end = block.find(_CRLF + _CRLF)
            body = block[http_end + 4 :] if http_end >= 0 else b""
        else:
            body = block
        out.append(
            (rec_id, rec_type, uri, clen, body.decode("utf-8"))
        )
        pos = body_start + clen
        # consume the record separator (two CRLFs)
        while payload[pos : pos + 2] == _CRLF:
            pos += 2
    return out


WARC_SCHEMA = StructType(
    [
        StructField("record_id", StringType(), False),
        StructField("warc_type", StringType(), False),
        StructField("target_uri", StringType(), False),
        StructField("content_length", LongType(), False),
        StructField("body", StringType(), False),
    ]
)


def _record_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batch adapter shared by the batch and streaming readers:
    raw archive bytes in, parsed record fields out."""
    for pdf in it:
        rows: dict[str, list] = {
            k: [] for k in (
                "record_id", "warc_type", "target_uri",
                "content_length", "body",
            )
        }
        for content in pdf["content"]:
            for rid, rtype, uri, clen, body in parse_warc_bytes(
                bytes(content)
            ):
                rows["record_id"].append(rid)
                rows["warc_type"].append(rtype)
                rows["target_uri"].append(uri)
                rows["content_length"].append(clen)
                rows["body"].append(body)
        yield pd.DataFrame(rows)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``binaryFile`` scan → per-file record walk.  One archive file =
    one parse task; fields only (never raw archives) flow downstream."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select("content").mapInPandas(
        _record_batches, schema=WARC_SCHEMA
    )


_BINARYFILE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("modificationTime", TimestampType(), False),
        StructField("length", LongType(), False),
        StructField("content", BinaryType(), True),
    ]
)


def stream_warc(spark: SparkSession, path: str, **reader_options) -> DataFrame:
    """STREAMING WARC ingest: archives land in a directory, each
    micro-batch walks only the newly arrived files (same stateless
    record parser as :func:`read_warc` — partition-preserving), and
    downstream operators see typed records.  ``reader_options`` pass
    through to the file stream source (``maxFilesPerTrigger`` controls
    batch granularity) — the continuous form of crawl ingestion, where
    a fetcher drops finished archives and the pipeline tails them."""
    reader = spark.readStream.format("binaryFile")
    for k, v in reader_options.items():
        reader = reader.option(k, str(v))
    raw = reader.schema(_BINARYFILE_SCHEMA).load(path)
    return raw.select("content").mapInPandas(
        _record_batches, schema=WARC_SCHEMA
    )
