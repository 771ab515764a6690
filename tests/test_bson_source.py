"""BSON codec edge coverage: width selection, nesting, quarantine."""

import pytest

from table_streaming_source_spark.sources.bson_file import (
    decode_document,
    encode_document,
)


def test_roundtrip_all_types():
    d = {
        "i32": 7,
        "i64": 2**40,
        "neg": -(2**35),
        "s": "héllo☃",
        "f": 3.5,
        "b": True,
        "arr": [1, "x", False],
        "doc": {"inner": {"deep": 1}},
    }
    enc = encode_document(d)
    back, end = decode_document(enc)
    assert back == d and end == len(enc)
    # int width selection on the wire
    assert b"\x10i32\x00" in enc and b"\x12i64\x00" in enc


def test_quarantine_paths():
    enc = encode_document({"a": 1})
    with pytest.raises(ValueError, match="overrun"):
        decode_document(enc[:-2])
    bad = bytearray(enc)
    bad[4] = 0x7F
    with pytest.raises(ValueError, match="0x7f"):
        decode_document(bytes(bad))
    no_nul = bytearray(enc)
    no_nul[-1] = 1
    with pytest.raises(ValueError, match="NUL"):
        decode_document(bytes(no_nul))


def test_dbf_soft_delete_and_quarantine():
    from table_streaming_source_spark.sources.dbf_file import (
        dbf_records,
        write_dbf,
    )

    write_dbf(
        "/tmp/dbfq/x.dbf",
        [("ID", "N", 10, 0), ("NAME", "C", 6, 0), ("OK", "L", 1, 0)],
        [(1, "aa", True), (2, "bb", False), (3, "cc", True)],
        deleted_rows={1},
    )
    blob = bytearray(open("/tmp/dbfq/x.dbf", "rb").read())
    fields, rows = dbf_records(bytes(blob))
    assert [r["ID"] for r in rows] == [1, 3]  # soft-deleted row skipped
    assert rows[0]["NAME"] == "aa" and rows[1]["OK"] is True
    blob[0] = 0x7F  # unsupported version byte
    with pytest.raises(ValueError, match="version"):
        dbf_records(bytes(blob))
    blob[0] = 0x03
    blob[10] -= 1  # record size vs descriptors mismatch
    with pytest.raises(ValueError, match="record size"):
        dbf_records(bytes(blob))
