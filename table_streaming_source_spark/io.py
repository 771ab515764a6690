"""Fixture-table loading helpers shared by queries, tests and bench."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (TESTDATA.md contract).

    ``events.parquet`` stores nanosecond timestamps, which Spark's parquet
    reader rejects by default; we read them as longs
    (``spark.sql.legacy.parquet.nanosAsLong``, a dynamic conf) and convert
    to microsecond timestamps with exact integer division (``div`` — a
    double-path division would lose low bits above 2^53 ns).  DuckDB
    truncates ns→µs the same way, so oracle comparison is exact.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in (names or TABLES)]
