"""Shared helpers for catalog queries.

Oracle-parity conventions (SURVEY.md §7 "oracle parity"):

- **Money/quantity sums go through DECIMAL.**  Double summation order
  differs between engines (partial aggregation vs sequential), so we cast
  addends to ``DECIMAL(18,s)`` — exact, associative — then cast the total
  back to DOUBLE.  Both engines produce bit-identical doubles.
- **Per-row double arithmetic needs no rounding** (IEEE, deterministic);
  only *aggregated* or *libm-dependent* (ln/exp/stddev) floats are rounded.
- **Every computed column is aliased identically** in the Spark plan and
  the SQL string — the driver sorts columns by name before hashing.
- **Counts are BIGINT on both sides.**
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from table_streaming_source_spark.io import load_table

    return load_table(spark, sf_dir, name)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal-path sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal-path mean: double(SUM(decimal)) / COUNT(*)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT(*)"
