"""Protobuf wire-format tests (`sources/protobuf_wire.py`): varint and
ZigZag boundary values, packed repeated fields, nested messages,
unknown-field skipping, delimited framing, and quarantine."""

import pytest

from table_streaming_source_spark.sources.protobuf_wire import (
    META_FIELDS,
    ORDERS_FIELDS,
    decode_fields,
    decode_message,
    decode_varint,
    encode_message,
    encode_varint,
    read_delimited,
    write_delimited,
    zigzag_decode,
    zigzag_encode,
)


@pytest.mark.parametrize(
    "value", [0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**63]
)
def test_varint_roundtrip_boundaries(value):
    buf = encode_varint(value)
    got, pos = decode_varint(buf, 0)
    if value < 0:
        value += 1 << 64  # wire carries two's-complement
    assert got == value and pos == len(buf)


@pytest.mark.parametrize(
    "value,wire",
    [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)],
)
def test_zigzag_spec_examples(value, wire):
    assert zigzag_encode(value) == wire
    assert zigzag_decode(wire) == value


def test_unknown_fields_of_every_wire_type_are_skipped():
    msg = encode_message(
        {
            1: ("varint", 7),
            90: ("fixed64", 123),
            91: ("fixed32", 45),
            92: ("bytes", b"opaque"),
            93: ("varint", 999),
        }
    )
    got = decode_message(msg, {1: ("x", "varint")})
    assert got == {"x": 7}


def test_packed_and_nested_roundtrip():
    msg = encode_message(
        {
            7: ("message", {1: ("varint", 5), 2: ("string", "b5")}),
            8: ("packed_varint", [0, 127, 128, 300]),
        }
    )
    fields = decode_fields(msg)
    nested = next(v for n, _w, v in fields if n == 7)
    assert decode_message(nested, META_FIELDS) == {
        "bucket": 5,
        "tag": "b5",
    }
    got = decode_message(msg, {8: ("packed", "packed_varint")})
    assert got["packed"] == [0, 127, 128, 300]


def test_delimited_framing_roundtrip(tmp_path):
    msgs = [encode_message({1: ("varint", i)}) for i in range(300)]
    p = str(tmp_path / "t.pb")
    write_delimited(p, msgs)
    assert read_delimited(open(p, "rb").read()) == msgs


def test_quarantine_truncations():
    with pytest.raises(ValueError, match="truncated varint"):
        decode_varint(b"\x80", 0)
    with pytest.raises(ValueError, match="too long"):
        decode_varint(b"\xff" * 11, 0)
    with pytest.raises(ValueError, match="length-delimited"):
        decode_fields(bytes([1 << 3 | 2]) + encode_varint(100) + b"xx")
    with pytest.raises(ValueError, match="delimited record"):
        read_delimited(encode_varint(10) + b"abc")


def test_orders_schema_field_9_is_reserved_unknown():
    assert 9 not in ORDERS_FIELDS  # the forward-compat fixture contract
