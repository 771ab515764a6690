"""From-scratch PDF reader tests (`sources/pdf.py`): writer/reader
round-trip, every literal-string escape form, hex strings, TJ arrays,
indirect /Length, multi-section xref via /Prev, and the quarantine
contract."""

import zlib

import pytest

from table_streaming_source_spark.sources.pdf import (
    _extract_text,
    _Parser,
    pdf_page_texts,
    write_pdf,
)


def test_roundtrip_escapes_unicode_and_empty(tmp_path):
    pages = [
        "plain ascii text",
        "",
        "parens (nested (deep)) and \\ backslash",
        "newline\nand\rreturn\tand tab",
        "unicode: παράδειγμα 你好 ✓ émoji",
        "x" * 3000,  # long page → large content stream
    ]
    p = str(tmp_path / "t.pdf")
    write_pdf(p, pages)
    assert pdf_page_texts(open(p, "rb").read()) == pages


def test_literal_string_escapes_per_spec():
    p = _Parser(rb"(octal \101\102\66 short \7 cont\
inuation \q unknown)")
    got = p.value()
    # \101\102 = AB, \66 = 6, \7 = BEL, escaped newline vanishes,
    # unknown escape drops the backslash
    assert got == b"octal AB6 short \x07 continuation q unknown"


def test_hex_string_with_whitespace_and_odd_length():
    p = _Parser(b"<48 65 6C 6C 6F 2>")
    assert p.value() == b"Hello "  # odd final digit padded with 0


def test_tj_array_mixes_strings_and_kerning():
    content = b"BT [ (A) -120 <4243> 55 (D) ] TJ (E) Tj ET"
    assert _extract_text(content) == b"ABCDE"


def test_indirect_length_and_flate(tmp_path):
    # write_pdf emits indirect /Length for even pages — make sure a
    # 1-page (index 0 → indirect) file parses
    p = str(tmp_path / "t.pdf")
    write_pdf(p, ["only page"])
    payload = open(p, "rb").read()
    assert b"/Length" in payload and b"0 R /Filter" in payload
    assert pdf_page_texts(payload) == ["only page"]


def test_incremental_update_prev_chain(tmp_path):
    """Append an incremental update (new xref section with /Prev):
    object 1 stays, page text of page 1 is REPLACED by a new content
    stream object — newest xref section must win."""
    p = str(tmp_path / "t.pdf")
    write_pdf(p, ["old text"])
    base = open(p, "rb").read()
    old_xref_at = int(base.rsplit(b"startxref", 1)[1].split()[0])
    new_body = b"BT (new text) Tj ET"
    comp = zlib.compress(new_body)
    obj = (
        b"4 0 obj\n<< /Length "
        + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + comp
        + b"\nendstream\nendobj\n"
    )
    off = len(base)
    upd = (
        obj
        + b"xref\n0 1\n0000000000 65535 f \n4 1\n"
        + f"{off:010d} 00000 n \n".encode()
        + b"trailer\n<< /Size 6 /Root 1 0 R /Prev "
        + str(old_xref_at).encode()
        + b" >>\nstartxref\n"
        + str(off + len(obj)).encode()
        + b"\n%%EOF\n"
    )
    assert pdf_page_texts(base + upd) == ["new text"]


def test_quarantine_bad_header_and_bad_stream(tmp_path):
    p = str(tmp_path / "t.pdf")
    write_pdf(p, ["page"])
    payload = open(p, "rb").read()
    with pytest.raises(ValueError, match="header"):
        pdf_page_texts(b"XX" + payload)
    corrupt = payload.replace(b"stream\n", b"stream\n\x00\x01", 1)
    with pytest.raises(ValueError):
        pdf_page_texts(corrupt)


def test_spark_reader_end_to_end(spark, tmp_path):
    from table_streaming_source_spark.sources.pdf import read_pdf_pages

    for shard in range(2):
        write_pdf(
            str(tmp_path / f"p{shard}.pdf"),
            [f"shard {shard} page {i}" for i in range(5)],
        )
    df = read_pdf_pages(spark, str(tmp_path))
    got = sorted((r.file, r.page_no, r.text) for r in df.collect())
    assert len(got) == 10
    assert got[0] == ("p0.pdf", 0, "shard 0 page 0")
    assert got[-1] == ("p1.pdf", 4, "shard 1 page 4")
