"""Fixture-drift guard: pin the exact Spark schema of every loaded table.

The driver regenerates /root/testdata between rounds; a silent storage
change there surfaces as obscure downstream failures (round 2 example:
``events.ts`` moved from int64-nanos to tz-naive timestamp[us], which the
default parquet reader maps to TIMESTAMP_NTZ — rejected by watermarks).
These assertions fail loudly at the contract boundary instead.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from table_streaming_source_spark.io import TABLES, load_table

# every (table, column) the engine's plans rely on, with the loaded type
_REQUIRED = {
    "events": {
        "event_id": LongType(),
        # TimestampType, NOT TimestampNTZType: watermarks require it, and
        # the UTC session zone makes wall-clock values oracle-identical
        "ts": TimestampType(),
        "user_id": LongType(),
        "event_type": StringType(),
        "value": DoubleType(),
        "props": StringType(),
    },
    "documents": {
        "doc_id": LongType(),
        "text": StringType(),
        "lang": StringType(),
        "source": StringType(),
        "n_chars": LongType(),
    },
    "embeddings": {
        "vec_id": LongType(),
        "embedding": ArrayType(FloatType()),
    },
    # the numeric join/aggregate columns every oracle-compared TPC-H plan
    # relies on: a storage-type drift (e.g. l_quantity double→decimal)
    # must fail here, not as an obscure hash mismatch downstream
    "region": {"r_regionkey": IntegerType(), "r_name": StringType()},
    "nation": {
        "n_nationkey": IntegerType(),
        "n_name": StringType(),
        "n_regionkey": IntegerType(),
    },
    "customer": {
        "c_custkey": LongType(),
        "c_nationkey": IntegerType(),
        "c_acctbal": DoubleType(),
        "c_mktsegment": StringType(),
    },
    "supplier": {
        "s_suppkey": LongType(),
        "s_nationkey": IntegerType(),
        "s_acctbal": DoubleType(),
    },
    "part": {
        "p_partkey": LongType(),
        "p_brand": StringType(),
        "p_type": StringType(),
        "p_size": IntegerType(),
        "p_retailprice": DoubleType(),
    },
    "orders": {
        "o_orderkey": LongType(),
        "o_custkey": LongType(),
        "o_totalprice": DoubleType(),
        "o_orderdate": TimestampType(),
        "o_orderpriority": StringType(),
    },
    "lineitem": {
        "l_orderkey": LongType(),
        "l_partkey": LongType(),
        "l_suppkey": LongType(),
        "l_quantity": DoubleType(),
        "l_extendedprice": DoubleType(),
        "l_discount": DoubleType(),
        "l_tax": DoubleType(),
        "l_returnflag": StringType(),
        "l_shipdate": TimestampType(),
    },
}


@pytest.mark.parametrize("table", sorted(_REQUIRED))
def test_loaded_schema_matches_contract(spark, sf_dir, table):
    schema = load_table(spark, sf_dir, table).schema
    for col, dtype in _REQUIRED[table].items():
        assert col in schema.names, f"{table}.{col} missing from fixture"
        got = schema[col].dataType
        assert got == dtype, f"{table}.{col}: fixture drifted to {got}"


def test_all_tables_load_nonempty(spark, sf_dir):
    for table in TABLES:
        assert load_table(spark, sf_dir, table).limit(1).count() == 1, table


def test_read_table_restores_session_confs(spark, sf_dir):
    """_read_table must not leak its parquet-reader conf overrides into
    an externally-owned session (ADVICE round 2)."""
    from table_streaming_source_spark.io import load_table

    ntz = "spark.sql.parquet.inferTimestampNTZ.enabled"
    nanos = "spark.sql.legacy.parquet.nanosAsLong"
    old_ntz, old_nanos = spark.conf.get(ntz), spark.conf.get(nanos)
    try:
        spark.conf.set(ntz, "true")
        spark.conf.set(nanos, "false")
        load_table(spark, sf_dir, "orders", cached=False)
        load_table(spark, sf_dir, "events", cached=False)
        assert spark.conf.get(ntz) == "true"
        # current fixtures store µs timestamps → the legacy nanos path is
        # inactive and the conf must be restored
        assert spark.conf.get(nanos) == "false"
    finally:
        spark.conf.set(ntz, old_ntz)
        spark.conf.set(nanos, old_nanos)


def test_read_table_restores_unset_confs(spark, sf_dir):
    """The unset-prior case (ADVICE round 3): a conf that was never set
    must come back UNSET after the read, not pinned to the override —
    ``conf.get(key, None) is None`` both before and after."""
    from table_streaming_source_spark.io import load_table

    ntz = "spark.sql.parquet.inferTimestampNTZ.enabled"
    nanos = "spark.sql.legacy.parquet.nanosAsLong"
    old_ntz = spark.conf.get(ntz, None)
    old_nanos = spark.conf.get(nanos, None)
    try:
        spark.conf.unset(ntz)
        spark.conf.unset(nanos)
        load_table(spark, sf_dir, "orders", cached=False)
        load_table(spark, sf_dir, "events", cached=False)
        assert spark.conf.get(ntz, None) is None, "ntz leaked as set"
        assert spark.conf.get(nanos, None) is None, "nanos leaked as set"
    finally:
        for key, old in ((ntz, old_ntz), (nanos, old_nanos)):
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
