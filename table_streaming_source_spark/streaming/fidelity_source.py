"""Fidelity-mode streaming source: the full table snapshot, every batch.

A Spark 4 Python streaming ``DataSource`` reproducing the reference's
``TableInputDStream`` semantics exactly (`TableInputDStream.scala:26-62`):

- every micro-batch receives the **entire current table contents**, not a
  delta (`scala:51-54`);
- the snapshot is re-scanned only when wall-clock passes the next
  epoch-aligned multiple of ``refreshInterval`` (`scala:57-58` — the same
  arithmetic as :func:`table_streaming_source_spark.snapshot._aligned_threshold`);
- a (re)started reader always scans fresh (`scala:42-45`).

This mode deliberately fights Structured Streaming's incremental model
(every batch re-emits everything ⇒ downstream watermarking is
meaningless), which is why it is the fidelity/demo path; production
enrichment uses :mod:`.enrichment`.  Scan and emission flow through the
driver (``SimpleDataSourceStreamReader``), which matches the use case: the
table is a lookup/dimension table, small by contract
(`TableStreamingSource.java:49-51` — "to provide lookup-like
functionality").
"""

from __future__ import annotations

import os
import time
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from table_streaming_source_spark.config import parse_duration_ms


def _scan_parquet_rows(path: str, schema: StructType) -> list[tuple]:
    """Driver-side snapshot scan of a parquet table dir via pyarrow."""
    import pyarrow.dataset as ds

    table = ds.dataset(path, format="parquet").to_table(
        columns=list(schema.fieldNames())
    )
    cols = [table.column(name).to_pylist() for name in schema.fieldNames()]
    return list(zip(*cols)) if cols else []


class SnapshotStreamReader(SimpleDataSourceStreamReader):
    """Emits the whole table per trigger with TTL-cached re-scan."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        self._interval_ms = parse_duration_ms(
            options.get("refreshinterval") or options.get("refreshInterval")
        )
        # start() semantics (`TableInputDStream.scala:42-45`): fresh reader
        # → lastRefreshTime = 0 → first batch always scans.
        self._last_refresh_ms = 0
        self._cache: list[tuple] = []

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def _refresh_if_needed(self) -> None:
        now_ms = int(time.time() * 1000)
        threshold = (
            self._last_refresh_ms
            + self._interval_ms
            - self._last_refresh_ms % self._interval_ms
        )
        if self._last_refresh_ms == 0 or now_ms > threshold:
            self._cache = _scan_parquet_rows(self._path, self._schema)
            self._last_refresh_ms = now_ms

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        self._refresh_if_needed()
        return iter(self._cache), {"batch": start["batch"] + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay: snapshots are not retained per-offset (the reference's
        # state is @transient and not checkpointed either,
        # `TableInputDStream.scala:38-39`); replay returns the current
        # snapshot.
        return iter(self._cache or _scan_parquet_rows(self._path, self._schema))


class SnapshotTableDataSource(DataSource):
    """``spark.readStream.format("snapshot_table")`` — options:

    - ``path``: parquet table directory (required)
    - ``refreshInterval``: ``<n><d|h|m|s>`` TTL, default 1h
    - ``schema``: optional DDL string; inferred from the parquet footer
      otherwise
    """

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self):
        import pyarrow.dataset as ds
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path or not os.path.exists(path):
            raise ValueError(f"snapshot_table: path not found: {path!r}")
        return from_arrow_schema(ds.dataset(path, format="parquet").schema)

    def simpleStreamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(schema, dict(self.options))


def register_snapshot_source(spark) -> None:
    spark.dataSource.register(SnapshotTableDataSource)
