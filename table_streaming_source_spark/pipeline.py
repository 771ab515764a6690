"""The reference plugin's two lifecycle entry points as explicit functions.

``configure_pipeline`` re-expresses ``TableStreamingSource.configurePipeline``
(`TableStreamingSource.java:60-70`): collected validation, schema
resolution, and create-table-if-absent — with the macro branch: when
``name`` is still an unresolved ``${...}`` placeholder the table creation
is *deferred* (`TableStreamingSource.java:67-69` ``if
(!config.containsMacro("name"))``), because the real name is only known at
runtime.

``start_stream`` re-expresses ``TableStreamingSource.getStream``
(`TableStreamingSource.java:72-96`): resolve macros, re-validate, create
the table defensively (race-tolerant, `java:81-87`), and hand back the
TTL-refreshed snapshot manager that feeds the enrichment stream.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from table_streaming_source_spark.config import FailureCollector, SourceConfig
from table_streaming_source_spark.ddl import ensure_table
from table_streaming_source_spark.snapshot import SnapshotManager


def configure_pipeline(
    spark: SparkSession,
    config: SourceConfig,
    *,
    location: str | None = None,
) -> Optional[StructType]:
    """Configure-time hook: validate everything validatable now, declare
    the output schema, create the table if — and only if — its name is
    already concrete.

    Returns the declared output schema (``None`` when no schema is
    configured, matching the reference's nullable schema property).  A
    macro-valued ``name`` defers DDL to :func:`start_stream`; every other
    validation rule still runs, so a bad refresh interval or rowField
    fails the deploy even for a late-bound table.
    """
    collector = FailureCollector()
    config.validate(collector)
    collector.get_or_throw()
    schema = config.get_schema() if config.schema_json else None
    if schema is not None and not config.contains_macro(config.PROP_NAME):
        ensure_table(
            spark,
            config.name,
            schema,
            row_field=config.row_field,
            location=location,
        )
    return schema


def start_stream(
    spark: SparkSession,
    config: SourceConfig,
    *,
    variables: dict[str, str] | None = None,
    location: str | None = None,
    clock_ms: Optional[Callable[[], int]] = None,
    **kwargs,
) -> SnapshotManager:
    """Runtime hook: macro resolution + re-validation + defensive DDL +
    snapshot stream construction.

    *variables* supplies the macro bindings (the reference framework's
    runtime arguments); an unresolved placeholder raises before any DDL or
    scan.  The create here is the reference's runtime defensive create
    (`TableStreamingSource.java:81-87`) — deploy-time creation may have
    been skipped for a macro name, or another instance may race; both are
    absorbed by ``CREATE TABLE IF NOT EXISTS``.
    """
    resolved = config.resolved(variables or {})
    collector = FailureCollector()
    resolved.validate(collector)
    collector.get_or_throw()
    schema = resolved.get_schema() if resolved.schema_json else None
    if schema is not None:
        ensure_table(
            spark,
            resolved.name,
            schema,
            row_field=resolved.row_field,
            location=location,
        )
    return SnapshotManager.from_config(spark, resolved, clock_ms=clock_ms, **kwargs)
