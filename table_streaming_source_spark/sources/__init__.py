"""Source surface of the engine — one import point for every way data
enters a plan.

- **Batch snapshot scan** (:func:`load_snapshot`): schema-projected,
  rowField-validated table read — the reference's A1+A3
  (`TableInputDStream.scala:51-59`, `TableStreamingSource.java:95-118`).
- **TTL-managed snapshot** (:class:`SnapshotManager`): the reference's A2
  refresh/cache semantics for the static side of enrichment joins.
- **Fixture tables** (:func:`load_table`, :data:`TABLES`): the shared
  TPC-H-ish test corpus with a process-level snapshot cache.
- **Streaming fidelity source** (:func:`register_snapshot_source`):
  Spark 4 Python ``DataSource`` emitting the full snapshot per trigger —
  the literal DStream behavior (demo mode; enrichment mode in
  :mod:`..streaming` is the production path).

Everything else is `spark.read.parquet` / `spark.table` / `spark.readStream`
— the engine deliberately adds no bespoke connector layer on top of Spark's.
"""

from table_streaming_source_spark.io import TABLES, load_table, load_tables
from table_streaming_source_spark.snapshot import SnapshotManager, load_snapshot
from table_streaming_source_spark.streaming.fidelity_source import (
    SnapshotTableDataSource,
    register_snapshot_source,
)

__all__ = [
    "TABLES",
    "SnapshotManager",
    "SnapshotTableDataSource",
    "load_snapshot",
    "load_table",
    "load_tables",
    "register_snapshot_source",
]
