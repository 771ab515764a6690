"""WARC source unit tests: framing round-trip, header parsing, the
HTTP envelope split, and the malformed-stream quarantine contract
(`sources/warc.py`)."""

import pytest

from table_streaming_source_spark.sources.warc import (
    parse_warc_bytes,
    write_warc,
)


def _roundtrip(records, tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, records)
    with open(p, "rb") as fh:
        return parse_warc_bytes(fh.read())


def test_roundtrip_preserves_bodies_and_headers(tmp_path):
    recs = [
        ("urn:doc:1", "https://a.example/1", "hello world"),
        ("urn:doc:2", "https://b.example/2", "παράδειγμα κείμενο"),
        ("urn:doc:3", "https://c.example/3", ""),
    ]
    out = _roundtrip(recs, tmp_path)
    assert [(r[0], r[2], r[4]) for r in out] == [
        (rid, uri, body) for rid, uri, body in recs
    ]
    # content-length covers the HTTP envelope (45 bytes) + UTF-8 body
    for (rid, uri, body), parsed in zip(recs, out):
        assert parsed[3] == 45 + len(body.encode("utf-8"))
        assert parsed[1] == "response"


def test_multibyte_content_length_is_byte_exact(tmp_path):
    body = "héllo…"  # 6 chars, 9 UTF-8 bytes
    out = _roundtrip([("urn:x", "https://x/1", body)], tmp_path)
    assert out[0][3] == 45 + 9
    assert out[0][4] == body


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")


def test_truncated_payload_raises(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, [("urn:x", "https://x/1", "some body text")])
    with open(p, "rb") as fh:
        data = fh.read()
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(data[:-10])


def test_non_response_record_body_is_raw():
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:info>\r\n"
        b"Content-Length: 7\r\n"
        b"\r\n"
        b"format!"
        b"\r\n\r\n"
    )
    out = parse_warc_bytes(rec)
    assert out == [("urn:info", "warcinfo", "", 7, "format!")]
