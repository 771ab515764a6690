"""Malformed-bytes fuzz over the file-format source parsers.

Same contract as `tests/test_decoder_fuzz.py` (see
`table_streaming_source_spark/malformed.py`): on corrupt input a
parser returns or raises ``ValueError`` — never a leaked low-level
exception, never an unbounded count-driven loop (the Avro OCF
metadata spin the sweep found).  Pure Python — each target builds its
valid payload with the module's own writer, then runs a seeded
truncation/flip/splice regime against the parser.
"""

import os
import random
import signal
import sqlite3
import zlib

import pytest

from table_streaming_source_spark.sources import (
    archive,
    avro_ocf,
    bson_file,
    dbf_file,
    mime,
    parquet_footer,
    pdf,
    protobuf_wire,
    sqlite_file,
    warc,
    xlsx,
)


def _fread(p):
    with open(p, "rb") as fh:
        return fh.read()


def _targets(tmp):
    p = os.path.join(tmp, "t.tar")
    archive.write_tar(p, [("a.txt", b"hello"), ("b/c.bin", bytes(range(64)))])
    yield "tar_entries", archive._tar_entries, _fread(p)

    p = os.path.join(tmp, "t.zip")
    archive.write_zip(p, [("a.txt", b"hello world"), ("d/e.txt", b"x" * 100)])
    yield "zip_entries", archive.zip_entries, _fread(p)

    doc = {"a": 1, "b": "text", "c": 2.5, "d": True}
    yield "bson_decode", bson_file.decode_document, bson_file.encode_document(doc)

    p = os.path.join(tmp, "t.dbf")
    dbf_file.write_dbf(
        p,
        [("NAME", "C", 10, 0), ("QTY", "N", 8, 0)],
        [("ab", 3), ("cd", 4), ("ef", 5)],
    )
    yield "dbf_records", dbf_file.dbf_records, _fread(p)

    yield "qp_decode", mime.qp_decode, mime.qp_encode(
        "héllo=world ".encode() * 10
    )

    msg = mime.build_message(
        from_addr="a@b.c", subject="Tést", text="hello", html="<b>h</b>"
    )
    yield "parse_message", mime.parse_message, msg

    p = os.path.join(tmp, "t.mbox")
    mime.write_mbox(p, [msg, msg])
    yield "mbox_messages", mime.mbox_messages, _fread(p)

    p = os.path.join(tmp, "ics")
    mime.write_ics(
        p,
        [(1, [{
            "uid": "u1", "dtstart": "20260101T000000Z", "minutes": 30,
            "summary": "s" * 40, "description": "x" * 90,
        }])],
    )
    yield "parse_ics", mime.parse_ics, _fread(os.path.join(p, "cal-1.ics"))

    import pyarrow as pa
    import pyarrow.parquet as pq

    pqp = os.path.join(tmp, "t.parquet")
    pq.write_table(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}), pqp)
    raw = _fread(pqp)
    flen = int.from_bytes(raw[-8:-4], "little")
    yield "parse_footer", parquet_footer.parse_footer, raw[-8 - flen:]

    p = os.path.join(tmp, "t.pdf")
    pdf.write_pdf(p, ["page one text", "page two text"])
    yield "pdf_page_texts", pdf.pdf_page_texts, _fread(p)

    yield "pb_decode_fields", protobuf_wire.decode_fields, (
        protobuf_wire.encode_message({
            1: ("varint", 42), 2: ("bytes", b"hi"), 3: ("fixed32", 7),
            4: ("string", "yo"), 5: ("packed_varint", [1, 2, 300]),
        })
    )

    sp = os.path.join(tmp, "t.sqlite")
    con = sqlite3.connect(sp)
    con.execute("CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, f"doc {i}") for i in range(20)]
    )
    con.commit()
    con.close()
    yield "sqlite_rows", (
        lambda b: sqlite_file.sqlite_rows(b, "docs", rowid_alias_col=0)
    ), _fread(sp)

    p = os.path.join(tmp, "t.warc")
    warc.write_warc(
        p, [("id1", "http://x/1", "hello body"), ("id2", "http://x/2", "b" * 80)]
    )
    yield "parse_warc", warc.parse_warc_bytes, _fread(p)

    p = os.path.join(tmp, "t.xlsx")
    xlsx.write_xlsx(p, ["k", "v"], [[1, "a"], [2, "b"], [3, "c"]])
    yield "xlsx_records", xlsx.xlsx_records, _fread(p)

    schema = (
        '{"type":"record","name":"r","fields":'
        '[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    )
    yield "decode_ocf", avro_ocf.decode_ocf, avro_ocf.write_ocf(
        schema, [(1, "x"), (2, "y")]
    )

    from table_streaming_source_spark.sources import fasta_file, srec_file

    yield "parse_srec", srec_file.parse_srec, srec_file.synth_srec(5).encode()
    yield (
        "parse_fasta",
        fasta_file.parse_fasta,
        fasta_file.synth_fasta(5).encode(),
    )

    from table_streaming_source_spark.sources import (
        m3u_playlist,
        pcap_file,
        vcf_file,
        wkt_geom,
    )

    from table_streaming_source_spark.sources import robots_txt

    yield "parse_pcap", pcap_file.parse_pcap, pcap_file.synth_pcap(5)
    yield (
        "parse_robots",
        robots_txt.parse_robots,
        robots_txt.synth_robots(5).encode(),
    )
    yield "parse_vcf", vcf_file.parse_vcf, vcf_file.synth_vcf(5).encode()
    yield "parse_wkt", wkt_geom.parse_wkt, wkt_geom.synth_wkt(5).encode()
    yield "parse_m3u", m3u_playlist.parse_m3u, m3u_playlist.synth_m3u(5).encode()

    from table_streaming_source_spark.sources import gff3_file, obj_mesh

    yield "parse_gff3", gff3_file.parse_gff3, gff3_file.synth_gff3(5).encode()
    yield "parse_obj", obj_mesh.parse_obj, obj_mesh.synth_obj(5).encode()

    from table_streaming_source_spark.sources import bencode

    yield "parse_bencode", bencode.parse_bencode, bencode.synth_bencode(5)


class _ParseHang(Exception):
    pass


@pytest.fixture(scope="module")
def source_targets(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("srcfuzz"))
    return {name: (fn, bytes(valid)) for name, fn, valid in _targets(tmp)}


_NAMES = [
    "tar_entries", "zip_entries", "bson_decode", "dbf_records",
    "qp_decode", "parse_message", "mbox_messages", "parse_ics",
    "parse_footer", "pdf_page_texts", "pb_decode_fields", "sqlite_rows",
    "parse_warc", "xlsx_records", "decode_ocf",
    "parse_srec", "parse_fasta",
    "parse_pcap", "parse_vcf", "parse_wkt", "parse_m3u",
    "parse_robots", "parse_gff3", "parse_obj", "parse_bencode",
]


@pytest.mark.parametrize("name", _NAMES)
def test_source_parser_quarantines_malformed_bytes(name, source_targets):
    fn, valid = source_targets[name]
    fn(valid)  # the intact payload must parse
    rnd = random.Random(zlib.crc32(name.encode()))
    n = len(valid)
    cases = []
    cuts = range(n) if n <= 120 else sorted(rnd.sample(range(n), 120))
    for i in cuts:
        cases.append(valid[:i])
    for _ in range(120):
        i = rnd.randrange(n)
        x = rnd.choice((0xFF, 0x80, 0x01, 0x7F))
        cases.append(valid[:i] + bytes([valid[i] ^ x]) + valid[i + 1:])
    for _ in range(20):
        i = rnd.randrange(n)
        cases.append(
            valid[:i] + bytes(rnd.randrange(256) for _ in range(4))
            + valid[i + 4:]
        )
    # structural corruption — different hole class than byte flips
    for _ in range(30):
        mode = rnd.randrange(3)
        a = rnd.randrange(n)
        b = rnd.randrange(n)
        a, b = min(a, b), max(a, b)
        ln = rnd.choice((4, 8, 16, 32, 64))
        if mode == 0:  # duplicate an aligned slice (two IHDRs, ...)
            cases.append(valid[:b] + valid[a:a + ln] + valid[b:])
        elif mode == 1:  # delete a slice (a vanished chunk)
            cases.append(valid[:a] + valid[a + ln:])
        elif a + ln <= b:  # swap two slices (reordered records)
            s1, s2 = valid[a:a + ln], valid[b:b + ln]
            cases.append(
                valid[:a] + s2 + valid[a + ln:b] + s1 + valid[b + ln:]
            )
    cases.append(valid + valid)  # self-concatenation
    cases.append(valid[::-1])

    def _on_alarm(sig, frame):
        raise _ParseHang(name)

    old = signal.signal(signal.SIGALRM, _on_alarm)
    try:
        for case in cases:
            signal.alarm(10)
            try:
                fn(bytes(case))
            except (ValueError, NotImplementedError):
                pass  # the quarantine contract
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)


def test_zip_bomb_rejected_before_inflating():
    """A member whose stream inflates past its DECLARED size must be
    rejected while inflating (max_length = declared + 1), not after
    materializing the bomb — `malformed.bounded_inflate`."""
    import struct

    bomb_raw = b"\x00" * (8 * 1024 * 1024)
    comp = zlib.compress(bomb_raw, 9)[2:-4]  # raw deflate
    crc = zlib.crc32(bomb_raw)

    def make_zip(usize):
        name = b"a.bin"
        lh = (
            b"PK\x03\x04"
            + struct.pack(
                "<HHHHHIIIHH", 20, 0, 8, 0, 0, crc, len(comp), usize,
                len(name), 0,
            )
            + name + comp
        )
        cd = (
            b"PK\x01\x02"
            + struct.pack(
                "<HHHHHHIIIHHHHHII", 20, 20, 0, 8, 0, 0, crc,
                len(comp), usize, len(name), 0, 0, 0, 0, 0, 0,
            )
            + name
        )
        eocd = b"PK\x05\x06" + struct.pack(
            "<HHHHIIH", 0, 0, 1, 1, len(cd), len(lh), 0
        )
        return lh + cd + eocd

    with pytest.raises(ValueError, match="declared"):
        archive.zip_entries(make_zip(100))  # lies small → fail fast
    (name, data), = archive.zip_entries(make_zip(len(bomb_raw)))
    assert data == bomb_raw  # honest declaration still inflates


def test_bounded_inflate_contract():
    from table_streaming_source_spark.malformed import (
        MAX_INFLATE_BYTES, bounded_inflate,
    )

    raw = b"payload" * 1000
    comp = zlib.compress(raw)[2:-4]
    assert bounded_inflate(comp, declared=len(raw)) == raw
    with pytest.raises(ValueError, match="declared"):
        bounded_inflate(comp, declared=len(raw) - 1)
    with pytest.raises(ValueError, match="declared"):
        bounded_inflate(comp, declared=len(raw) + 1)
    assert bounded_inflate(comp) == raw  # capped mode
    assert MAX_INFLATE_BYTES >= 1 << 28


def test_xlsx_bad_xml_and_entity_bomb_quarantine(tmp_path):
    """XML failures inside a CRC-VALID zip must still read as
    ValueError: byte-flip fuzz can't reach the XML layer (the member
    CRC fails first), so pin it directly — malformed XML, and a
    billion-laughs entity bomb (rejected by expat's amplification
    guard; the rejection must wear the quarantine type)."""
    import struct as _struct  # noqa: F401  (parity with module style)

    p = str(tmp_path / "t.xlsx")
    xlsx.write_xlsx(p, ["k"], [[1]])
    entries = dict(archive.zip_entries(_fread(p)))

    def rezip(name, content):
        d = dict(entries)
        d[name] = content
        p2 = str(tmp_path / "x.xlsx")
        archive.write_zip(p2, sorted(d.items()))
        return _fread(p2)

    with pytest.raises(ValueError):
        xlsx.xlsx_records(rezip("xl/workbook.xml", b"<open><unclosed>"))
    bomb = (
        b'<?xml version="1.0"?><!DOCTYPE l [<!ENTITY a "aaaaaaaaaa">'
        + b"".join(
            b'<!ENTITY %s "%s">'
            % (
                b"e%d" % i,
                (b"&e%d;" % (i - 1) if i else b"&a;") * 10,
            )
            for i in range(8)
        )
        + b"]><workbook xmlns=\"http://schemas.openxmlformats.org/"
        + b"spreadsheetml/2006/main\"><sheets><sheet name=\"&e7;\"/>"
        + b"</sheets></workbook>"
    )
    with pytest.raises(ValueError):
        xlsx.xlsx_records(rezip("xl/workbook.xml", bomb))
