"""Avro-JSON ⇄ StructType translator tests (SURVEY.md §1.2 type table)."""

import json

import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from table_streaming_source_spark.avro_schema import (
    AvroSchemaError,
    avro_json_to_struct,
    parse_avro_json,
    struct_to_avro_json,
)


def test_docs_example_schema():
    # the docs example wire format (`docs/Table-streamingsource.md:43-52`):
    # record with long id (rowField, non-null), string name/email.
    schema = parse_avro_json(
        json.dumps(
            {
                "type": "record",
                "name": "event",
                "fields": [
                    {"name": "id", "type": "long"},
                    {"name": "name", "type": ["null", "string"]},
                    {"name": "email", "type": ["null", "string"]},
                ],
            }
        )
    )
    assert schema == StructType(
        [
            StructField("id", LongType(), False),
            StructField("name", StringType(), True),
            StructField("email", StringType(), True),
        ]
    )


@pytest.mark.parametrize(
    ("avro", "spark"),
    [
        ("boolean", BooleanType()),
        ("int", IntegerType()),
        ("long", LongType()),
        ("float", FloatType()),
        ("double", DoubleType()),
        ("bytes", BinaryType()),
        ("string", StringType()),
    ],
)
def test_primitives(avro, spark):
    struct = avro_json_to_struct(
        {"type": "record", "name": "r", "fields": [{"name": "f", "type": avro}]}
    )
    assert struct["f"].dataType == spark
    assert struct["f"].nullable is False


def test_nullable_union():
    struct = avro_json_to_struct(
        {
            "type": "record",
            "name": "r",
            "fields": [{"name": "f", "type": ["null", "double"]}],
        }
    )
    assert struct["f"].dataType == DoubleType()
    assert struct["f"].nullable is True


def test_complex_types():
    struct = avro_json_to_struct(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "arr", "type": {"type": "array", "items": "float"}},
                {"name": "m", "type": {"type": "map", "values": ["null", "long"]}},
                {
                    "name": "nested",
                    "type": {
                        "type": "record",
                        "name": "inner",
                        "fields": [{"name": "x", "type": "int"}],
                    },
                },
                {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A"]}},
                {"name": "fx", "type": {"type": "fixed", "name": "F", "size": 16}},
            ],
        }
    )
    assert struct["arr"].dataType == ArrayType(FloatType(), containsNull=False)
    assert struct["m"].dataType == MapType(StringType(), LongType(), True)
    assert struct["nested"].dataType == StructType(
        [StructField("x", IntegerType(), False)]
    )
    assert struct["e"].dataType == StringType()
    assert struct["fx"].dataType == BinaryType()


def test_logical_types():
    struct = avro_json_to_struct(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "d", "type": {"type": "int", "logicalType": "date"}},
                {
                    "name": "ts",
                    "type": {"type": "long", "logicalType": "timestamp-micros"},
                },
                {
                    "name": "dec",
                    "type": {
                        "type": "bytes",
                        "logicalType": "decimal",
                        "precision": 18,
                        "scale": 2,
                    },
                },
            ],
        }
    )
    assert struct["d"].dataType == DateType()
    assert struct["ts"].dataType == TimestampType()
    assert struct["dec"].dataType == DecimalType(18, 2)


def test_roundtrip():
    original = StructType(
        [
            StructField("id", LongType(), False),
            StructField("name", StringType(), True),
            StructField("scores", ArrayType(DoubleType(), True), True),
            StructField(
                "meta", MapType(StringType(), StringType(), True), True
            ),
            StructField(
                "nested",
                StructType([StructField("x", IntegerType(), False)]),
                False,
            ),
            StructField("when", TimestampType(), True),
            StructField("amount", DecimalType(18, 2), False),
        ]
    )
    assert avro_json_to_struct(struct_to_avro_json(original)) == original


@pytest.mark.parametrize(
    "bad",
    [
        "test",  # `ConfigTest.java:119-131`
        "{not json",
        '{"type": "record", "name": "r", "fields": [{"name": "f"}]}',
        '{"type": "wat"}',
        '"string"',  # non-record top level
    ],
)
def test_invalid_schemas(bad):
    with pytest.raises(AvroSchemaError):
        parse_avro_json(bad)


def test_multi_type_union_rejected():
    with pytest.raises(AvroSchemaError):
        avro_json_to_struct(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "f", "type": ["string", "long"]}],
            }
        )
