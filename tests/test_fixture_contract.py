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
    "orders": {"o_orderdate": TimestampType()},
    "lineitem": {"l_shipdate": TimestampType()},
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
