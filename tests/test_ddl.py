"""Create-table-if-absent DDL (reference A8, `TableStreamingSource.java:
66-69`, `:81-87`): idempotent creation, rowField property recording,
row-field validation, and race tolerance."""

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from table_streaming_source_spark.ddl import ensure_table, table_row_field

SCHEMA = StructType(
    [
        StructField("key", LongType(), nullable=False),
        StructField("label", StringType(), nullable=True),
    ]
)


def test_ensure_table_idempotent_and_records_row_field(spark, tmp_path):
    name = "tsss_ddl_t1"
    loc = str(tmp_path / "t1")
    ensure_table(spark, name, SCHEMA, row_field="key", location=loc)
    # defensive runtime re-create (reference does both) — must be a no-op
    ensure_table(spark, name, SCHEMA, row_field="key", location=loc)
    try:
        assert spark.table(name).schema["key"].dataType == LongType()
        assert table_row_field(spark, name) == "key"
        # usable end to end
        spark.createDataFrame([(1, "a")], SCHEMA).write.insertInto(name)
        assert spark.table(name).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ensure_table_validates_row_field(spark, tmp_path):
    with pytest.raises(ValueError, match="must be present"):
        ensure_table(
            spark, "tsss_ddl_bad", SCHEMA, row_field="nope",
            location=str(tmp_path / "b"),
        )
    with pytest.raises(ValueError, match="cannot be nullable"):
        ensure_table(
            spark, "tsss_ddl_bad", SCHEMA, row_field="label",
            location=str(tmp_path / "b"),
        )
