"""Avro object-container-file codec tests (sources/avro_ocf.py): the
pure-Python implementation of the public Apache Avro 1.11 binary spec
that backs the ``source_avro`` catalog entry."""

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from table_streaming_source_spark.sources.avro_ocf import (
    decode_ocf,
    read_long,
    write_long,
    write_ocf,
)

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "event_type", "type": "string"},
            {"name": "value", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "note", "type": ["null", "string"]},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
        ],
    }
)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_zigzag_roundtrip(n):
    buf = bytearray()
    write_long(buf, n)
    got, pos = read_long(bytes(buf), 0)
    assert got == n and pos == len(buf)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=40),
            st.floats(allow_nan=False),
            st.booleans(),
            st.one_of(st.none(), st.text(max_size=10)),
            st.integers(min_value=0, max_value=2**52),
        ),
        max_size=50,
    ),
    st.sampled_from(["null", "deflate"]),
    st.integers(min_value=1, max_value=7),
)
def test_ocf_roundtrip_property(rows, codec, block):
    blob = write_ocf(SCHEMA, rows, codec=codec, records_per_block=block)
    schema, got = decode_ocf(blob)
    assert got == rows
    assert schema["name"] == "event"


def test_ocf_detects_corrupt_sync():
    rows = [(1, "a", 1.0, True, None, 5)]
    blob = bytearray(write_ocf(SCHEMA, rows))
    blob[-3] ^= 0xFF
    with pytest.raises(ValueError, match="sync|varint|corrupt"):
        decode_ocf(bytes(blob))


def test_ocf_rejects_non_record_and_nested():
    from table_streaming_source_spark.sources.avro_ocf import _field_writer

    with pytest.raises(ValueError, match="record"):
        write_ocf('"long"', [])
    with pytest.raises(ValueError, match="unsupported"):
        _field_writer({"type": "array", "items": "long"})


def test_read_avro_distributed_and_schema_gate(spark, tmp_path):
    """binaryFile + mapInPandas read: values and µs timestamps decode
    exactly; a file whose writer schema disagrees with the declared
    schema fails loudly instead of misaligning fields."""
    from table_streaming_source_spark.sources.avro_ocf import read_avro

    rows = [
        (1, "click", 1.25, True, None, 1_700_000_000_000_000),
        (2, "view", -2.5, False, "x", 1_700_000_000_500_000),
    ]
    path = tmp_path / "avro"
    path.mkdir()
    (path / "a.avro").write_bytes(write_ocf(SCHEMA, rows[:1]))
    (path / "b.avro").write_bytes(write_ocf(SCHEMA, rows[1:], codec="null"))

    df = read_avro(spark, str(path), SCHEMA)
    got = sorted(df.collect(), key=lambda r: r.event_id)
    assert [r.event_id for r in got] == [1, 2]
    assert got[0].value == 1.25 and got[1].note == "x"
    assert got[1].ts.microsecond == 500_000
    assert df.schema["ts"].dataType.typeName().startswith("timestamp")

    other = SCHEMA.replace("event_id", "row_id")
    (path / "c.avro").write_bytes(write_ocf(other, [(9, "z", 0.0, True, None, 0)]))
    with pytest.raises(Exception, match="does not match declared"):
        read_avro(spark, str(path), SCHEMA).collect()
