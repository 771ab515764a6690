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


# ---------------------------------------------------------------------------
# configure-time macro branch (`TableStreamingSource.java:67-69`) + runtime
# resolution (`java:72-96`) via the pipeline entry points
# ---------------------------------------------------------------------------

def _simple_schema_json():
    import json

    return json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "k", "type": "string"},
                {"name": "v", "type": ["null", "long"]},
            ],
        }
    )


def test_configure_pipeline_skips_create_for_macro_name(spark):
    from table_streaming_source_spark.config import SourceConfig
    from table_streaming_source_spark.pipeline import configure_pipeline

    cfg = SourceConfig(
        name="${runtime.table}", schema_json=_simple_schema_json(), row_field="k"
    )
    before = {t.name for t in spark.catalog.listTables()}
    schema = configure_pipeline(spark, cfg)
    assert schema is not None and schema.fieldNames() == ["k", "v"]
    # no table materialized — the name is late-bound
    assert {t.name for t in spark.catalog.listTables()} == before


def test_configure_pipeline_creates_for_concrete_name(spark):
    from table_streaming_source_spark.config import SourceConfig
    from table_streaming_source_spark.ddl import table_row_field
    from table_streaming_source_spark.pipeline import configure_pipeline

    name = "t_macro_concrete"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        cfg = SourceConfig(
            name=name, schema_json=_simple_schema_json(), row_field="k"
        )
        configure_pipeline(spark, cfg)
        assert spark.catalog.tableExists(name)
        assert table_row_field(spark, name) == "k"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_start_stream_resolves_macro_and_creates(spark):
    from table_streaming_source_spark.config import SourceConfig
    from table_streaming_source_spark.pipeline import configure_pipeline, start_stream

    cfg = SourceConfig(
        name="t_macro_${env}", schema_json=_simple_schema_json(), row_field="k"
    )
    configure_pipeline(spark, cfg)  # defers DDL
    assert not spark.catalog.tableExists("t_macro_rt")
    try:
        mgr = start_stream(spark, cfg, variables={"env": "rt"})
        assert spark.catalog.tableExists("t_macro_rt")
        df = mgr.current()
        assert df.count() == 0  # fresh empty table, snapshot works
        mgr.stop()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_macro_rt")


def test_start_stream_raises_on_unbound_macro(spark):
    import pytest

    from table_streaming_source_spark.config import SourceConfig
    from table_streaming_source_spark.pipeline import start_stream

    cfg = SourceConfig(name="t_${missing}", schema_json=_simple_schema_json())
    with pytest.raises(ValueError, match="missing"):
        start_stream(spark, cfg, variables={})
