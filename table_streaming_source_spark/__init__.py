"""table_streaming_source_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
CDAP "Refreshable Table Streaming Source" plugin (reference:
`src/main/java/io/cdap/plugin/table/streaming/TableStreamingSource.java:47-51`),
re-expressed Spark-first:

- the reference's TTL-refreshed full-table snapshot source becomes a
  ``SnapshotManager`` (persist/unpersist-swapped static DataFrame) plus a
  Structured Streaming fidelity source;
- its Avro-JSON schema + collected validation become
  :mod:`table_streaming_source_spark.avro_schema` and
  :mod:`table_streaming_source_spark.config`;
- the relational operator surface the reference delegates to its host
  pipeline (join/filter/aggregate/window/…) is provided natively in
  :mod:`table_streaming_source_spark.operators`;
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) live in :mod:`table_streaming_source_spark.functions`.

Everything is built on the public PySpark 4.x DataFrame / SQL / Structured
Streaming API; Catalyst + Tungsten pick the physical strategies.
"""

from table_streaming_source_spark.avro_schema import (
    avro_json_to_struct,
    struct_to_avro_json,
)
from table_streaming_source_spark.config import (
    FailureCollector,
    SourceConfig,
    ValidationException,
    contains_macro,
    parse_duration_ms,
    resolve_macros,
)
from table_streaming_source_spark.pipeline import configure_pipeline, start_stream
from table_streaming_source_spark.snapshot import SnapshotManager, load_snapshot

__all__ = [
    "avro_json_to_struct",
    "struct_to_avro_json",
    "FailureCollector",
    "SourceConfig",
    "ValidationException",
    "contains_macro",
    "parse_duration_ms",
    "resolve_macros",
    "configure_pipeline",
    "start_stream",
    "SnapshotManager",
    "load_snapshot",
]

__version__ = "0.1.0"
