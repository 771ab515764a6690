"""Structured Streaming surface of the engine.

Two product modes re-expressing the reference's semantics (SURVEY.md §7):

- **enrichment mode** (:mod:`.enrichment`) — the documented use case
  (`docs/Table-streamingsource.md:10-14`): a TTL-refreshed dimension
  snapshot joined to a live stream inside ``foreachBatch``.  Production
  path; idiomatic Structured Streaming.
- **fidelity mode** (:mod:`.fidelity_source`) — the literal
  emit-the-whole-table-every-batch behavior of the reference's
  ``TableInputDStream`` (`TableInputDStream.scala:26-28`), as a Spark 4
  Python streaming ``DataSource``.
"""

from table_streaming_source_spark.streaming.enrichment import start_enriched_stream
from table_streaming_source_spark.streaming.fidelity_source import (
    SnapshotTableDataSource,
    register_snapshot_source,
)
from table_streaming_source_spark.streaming.joins import interval_join
from table_streaming_source_spark.streaming.stateful import running_totals_stream

__all__ = [
    "start_enriched_stream",
    "SnapshotTableDataSource",
    "register_snapshot_source",
    "running_totals_stream",
    "interval_join",
]
