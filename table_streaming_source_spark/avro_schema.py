"""Avro-JSON schema ⇄ Spark ``StructType`` translation.

The reference declares its output schema as an Avro-flavoured JSON string
parsed at configure time (reference
`src/main/java/io/cdap/plugin/table/streaming/TableStreamingSourceConfig.java:101-107`;
wire format example in `docs/Table-streamingsource.md:43-52`).  Our engine
speaks Spark ``StructType``; this module is the bridge.

Supported type surface (the CDAP schema language is Avro-like — see
SURVEY.md §1.2): null / boolean / int / long / float / double / bytes /
string primitives, record / array / map / union / enum / fixed complex
types, nullable-as-union-with-null, and the common logical types
(date, timestamp-millis/micros, time-millis/micros, decimal).
"""

from __future__ import annotations

import json
from typing import Any, Union

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    NullType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_PRIMITIVES: dict[str, DataType] = {
    "null": NullType(),
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "bytes": BinaryType(),
    "string": StringType(),
}

_LOGICAL: dict[str, DataType] = {
    "date": DateType(),
    "timestamp-millis": TimestampType(),
    "timestamp-micros": TimestampType(),
    "time-millis": IntegerType(),
    "time-micros": LongType(),
}


class AvroSchemaError(ValueError):
    """Raised when an Avro-JSON schema string cannot be translated."""


def parse_avro_json(schema_json: str) -> StructType:
    """Parse an Avro-JSON schema *string* into a ``StructType``.

    Mirrors ``TableStreamingSourceConfig.getSchema`` (reference
    `TableStreamingSourceConfig.java:101-107`): raises :class:`AvroSchemaError`
    with a descriptive message on unparseable input.
    """
    try:
        obj = json.loads(schema_json)
    except (TypeError, json.JSONDecodeError) as exc:
        raise AvroSchemaError(f"Invalid schema: {exc}") from exc
    return avro_json_to_struct(obj)


def avro_json_to_struct(schema: Union[dict, str, list]) -> StructType:
    """Translate a parsed Avro schema object (top-level ``record``) to
    ``StructType``."""
    dtype, nullable = _to_spark(schema)
    if not isinstance(dtype, StructType):
        raise AvroSchemaError(
            f"Top-level Avro schema must be a record, got: {schema!r}"
        )
    if nullable:
        raise AvroSchemaError("Top-level record schema must not be nullable")
    return dtype


def _to_spark(schema: Any) -> tuple[DataType, bool]:
    """Return ``(spark_type, nullable)`` for an Avro schema node."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _PRIMITIVES[schema], schema == "null"
        raise AvroSchemaError(f"Unknown Avro type name: {schema!r}")

    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        nullable = len(non_null) != len(schema)
        if len(non_null) == 1:
            dtype, inner_nullable = _to_spark(non_null[0])
            return dtype, nullable or inner_nullable
        raise AvroSchemaError(
            f"Only unions of one type with null are supported, got: {schema!r}"
        )

    if isinstance(schema, dict):
        logical = schema.get("logicalType")
        if logical:
            if logical == "decimal":
                return (
                    DecimalType(
                        int(schema.get("precision", 38)),
                        int(schema.get("scale", 0)),
                    ),
                    False,
                )
            if logical in _LOGICAL:
                return _LOGICAL[logical], False

        avro_type = schema.get("type")
        if avro_type in _PRIMITIVES:
            return _PRIMITIVES[avro_type], avro_type == "null"
        if avro_type == "record":
            fields = []
            for f in schema.get("fields", []):
                if "name" not in f or "type" not in f:
                    raise AvroSchemaError(f"Malformed record field: {f!r}")
                dtype, nullable = _to_spark(f["type"])
                fields.append(StructField(f["name"], dtype, nullable))
            return StructType(fields), False
        if avro_type == "array":
            item_type, item_nullable = _to_spark(schema["items"])
            return ArrayType(item_type, containsNull=item_nullable), False
        if avro_type == "map":
            val_type, val_nullable = _to_spark(schema["values"])
            return (
                MapType(StringType(), val_type, valueContainsNull=val_nullable),
                False,
            )
        if avro_type == "enum":
            return StringType(), False
        if avro_type == "fixed":
            return BinaryType(), False
        raise AvroSchemaError(f"Unsupported Avro type: {schema!r}")

    raise AvroSchemaError(f"Unsupported Avro schema node: {schema!r}")


def struct_to_avro_json(
    struct: StructType, name: str = "record", namespace: str | None = None
) -> dict:
    """Translate a ``StructType`` back to an Avro-JSON schema object
    (round-trip partner of :func:`avro_json_to_struct`)."""
    out: dict[str, Any] = {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": _from_spark(f.dataType, f.nullable, f.name)}
            for f in struct.fields
        ],
    }
    if namespace:
        out["namespace"] = namespace
    return out


def _from_spark(dtype: DataType, nullable: bool, name: str) -> Any:
    base: Any
    if isinstance(dtype, NullType):
        return "null"
    if isinstance(dtype, BooleanType):
        base = "boolean"
    elif isinstance(dtype, IntegerType):
        base = "int"
    elif isinstance(dtype, LongType):
        base = "long"
    elif isinstance(dtype, FloatType):
        base = "float"
    elif isinstance(dtype, DoubleType):
        base = "double"
    elif isinstance(dtype, BinaryType):
        base = "bytes"
    elif isinstance(dtype, StringType):
        base = "string"
    elif isinstance(dtype, DateType):
        base = {"type": "int", "logicalType": "date"}
    elif isinstance(dtype, TimestampType):
        base = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dtype, DecimalType):
        base = {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dtype.precision,
            "scale": dtype.scale,
        }
    elif isinstance(dtype, ArrayType):
        base = {
            "type": "array",
            "items": _from_spark(
                dtype.elementType, dtype.containsNull, f"{name}_item"
            ),
        }
    elif isinstance(dtype, MapType):
        base = {
            "type": "map",
            "values": _from_spark(
                dtype.valueType, dtype.valueContainsNull, f"{name}_value"
            ),
        }
    elif isinstance(dtype, StructType):
        base = struct_to_avro_json(dtype, name=name)
    else:
        raise AvroSchemaError(f"Unsupported Spark type: {dtype!r}")
    return ["null", base] if nullable else base
