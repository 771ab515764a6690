"""A Spark 4 Python BATCH ``DataSource`` for a fixed-width binary record
format ("TSR1") — the batch sibling of the streaming
``SimpleDataSourceStreamReader`` in ``streaming/fidelity_source.py``,
completing the Python DataSource API surface (custom format + SPLIT
PLANNING: ``partitions()`` returns byte-range splits, so a 100 TB file
fans out across executors instead of funneling through the driver).

Format spec (defined here, fixed-width so ranges split exactly):

    magic  b"TSR1"
    u32 LE record_count
    records: (i64 key, i64 group, f64 value) × count — 24 bytes each

The reader plans ``ceil(count / records_per_split)`` partitions; each
executor seeks straight to its range — no shared state, no driver I/O.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_MAGIC = b"TSR1"
_REC = struct.Struct("<qqd")

TSR_SCHEMA = "key bigint, grp bigint, value double"


def write_tsr(path: str, rows: Sequence[tuple[int, int, float]]) -> int:
    """Write rows to a TSR1 file; returns the record count."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(struct.pack("<I", len(rows)))
        for k, g, v in rows:
            fh.write(_REC.pack(int(k), int(g), float(v)))
    return len(rows)


class _RangePartition(InputPartition):
    def __init__(self, start: int, count: int):
        self.start = start
        self.count = count


class FixedWidthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tsr source requires option 'path'")
        self.records_per_split = int(
            options.get("recordsPerSplit", 4096)
        )
        with open(self.path, "rb") as fh:
            if fh.read(4) != _MAGIC:
                raise ValueError(f"not a TSR1 file: {self.path}")
            (self.n,) = struct.unpack("<I", fh.read(4))

    def partitions(self):
        per = self.records_per_split
        return [
            _RangePartition(start, min(per, self.n - start))
            for start in range(0, self.n, per)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        with open(self.path, "rb") as fh:
            fh.seek(8 + _REC.size * partition.start)
            for _ in range(partition.count):
                yield _REC.unpack(fh.read(_REC.size))


class FixedWidthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tsr"

    def schema(self) -> str:
        return TSR_SCHEMA

    def reader(self, schema: StructType) -> FixedWidthReader:
        return FixedWidthReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FixedWidthDataSource)
