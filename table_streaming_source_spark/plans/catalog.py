"""Unified query catalog: name → (Spark callable, optional DuckDB oracle).

This is the single source of truth consumed by ``__spark_entry__.py``
(driver contract), ``scripts/check_oracle.py`` (local correctness gate)
and ``bench.py`` (performance gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from table_streaming_source_spark.plans import (
    extensions,
    relational,
    streaming_queries,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **relational.QUERIES,
    **extensions.QUERIES,
    **streaming_queries.QUERIES,
}

ORACLES: dict[str, str] = {
    **relational.ORACLES,
    **extensions.ORACLES,
    **streaming_queries.ORACLES,
}

# every oracle key must have a query; queries without an oracle are the
# documented rows-only checks (approx sketches, bit-level fingerprints)
assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))

ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))
