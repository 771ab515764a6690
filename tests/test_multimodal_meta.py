"""Container-walk edge cases for the AU / ISO-BMFF / SMF metadata
parsers — the malformed-input quarantine contract and the size-form
variants the fixture formulas don't hit uniformly."""

import pandas as pd
import pytest

from table_streaming_source_spark.operators import multimodal as M

# NB: use the shared conftest session — creating one here with a
# different shuffle_partitions would MUTATE the session-wide SQL conf
# (builder configs apply to an existing session) and poison
# order-dependent assertions elsewhere (seen: the AQE skew-split gate)


def _run(spark, fn, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "key long, payload binary",
    )
    return fn(df).collect()


def test_au_roundtrip_and_quarantine(spark):
    rows = _run(spark, M.au_stats, [M.synth_au(5), M.synth_au(131)])
    assert {r.key for r in rows} == {0, 1}
    assert all(r.n_samples == 64 + k % 200 for r, k in zip(sorted(rows, key=lambda r: r.key), (5, 131)))
    with pytest.raises(Exception, match="magic"):
        _run(spark, M.au_stats, [b"RIFF" + b"\x00" * 40])
    bad_enc = bytearray(M.synth_au(5))
    bad_enc[15] = 3  # encoding -> 3 (PCM16), unsupported here
    with pytest.raises(Exception, match="encoding"):
        _run(spark, M.au_stats, [bytes(bad_enc)])


def test_mp4_largesize_and_overrun(spark):
    # key 7 -> largesize mdat; key 3 -> normal
    rows = _run(spark, M.mp4_meta, [M.synth_mp4(7), M.synth_mp4(3)])
    by_mdat = sorted(rows, key=lambda r: r.key)
    assert by_mdat[0].mdat_bytes == 7 % 50 and by_mdat[1].mdat_bytes == 3
    assert all(r.major_brand == "isom" for r in rows)
    truncated = M.synth_mp4(3)[:-4]
    with pytest.raises(Exception, match="overrun|truncated"):
        _run(spark, M.mp4_meta, [truncated])


def test_midi_varint_and_length_check(spark):
    # deltas >= 128 exercise the continuation bit
    assert M._midi_varint(0) == b"\x00"
    assert M._midi_varint(127) == b"\x7f"
    assert M._midi_varint(128) == b"\x81\x00"
    assert M._midi_varint(0x0FFFFFFF) == b"\xff\xff\xff\x7f"
    rows = _run(spark, M.midi_meta, [M.synth_midi(12)])
    assert rows[0].n_tracks == 1 + 12 % 4 and rows[0].division == 480
    corrupt = bytearray(M.synth_midi(12))
    # inflate the first MTrk declared length -> walked end mismatches
    corrupt[14 + 7] += 1
    with pytest.raises(Exception, match="MTrk|length"):
        _run(spark, M.midi_meta, [bytes(corrupt)])


def test_ogg_crc_and_sequence_enforced(spark):
    rows = _run(spark, M.ogg_meta, [M.synth_ogg(5), M.synth_ogg(8)])
    assert all(r.crc_ok for r in rows)
    corrupted = bytearray(M.synth_ogg(5))
    corrupted[40] ^= 0xFF  # flip a lacing/payload byte -> CRC mismatch
    with pytest.raises(Exception, match="CRC"):
        _run(spark, M.ogg_meta, [bytes(corrupted)])


def test_gzip_trailer_verification():
    from table_streaming_source_spark.sources.archive import (
        gzip_members,
        write_gzip_members,
    )

    write_gzip_members("/tmp/gzq/x.gz", [("a.txt", b"payload bytes")])
    blob = bytearray(open("/tmp/gzq/x.gz", "rb").read())
    assert gzip_members(bytes(blob)) == [("a.txt", b"payload bytes")]
    blob[-8] ^= 0xFF  # CRC trailer
    with pytest.raises(ValueError, match="CRC"):
        gzip_members(bytes(blob))
    blob[-8] ^= 0xFF
    blob[-1] ^= 0xFF  # ISIZE trailer
    with pytest.raises(ValueError, match="ISIZE"):
        gzip_members(bytes(blob))


def test_html_table_parser_edge_cases():
    from table_streaming_source_spark.operators.text import (
        _parse_html_tables,
        synth_html_table,
    )

    # implied end tags (valid HTML: <td>/<tr> close on the next opener)
    messy = "<table><tr><td>1<td>2<tr><td>3<td>4</table>"
    assert _parse_html_tables(messy) == [[["1", "2"], ["3", "4"]]]
    # entities + inline markup + attributes
    page = '<table id="x"><tr><td class="a">a &amp; <b>b</b></td></tr></table>'
    assert _parse_html_tables(page) == [[["a & b"]]]
    # two tables on one page; text outside tables ignored
    two = "<p>noise</p>" + synth_html_table(3, "s") + synth_html_table(8, "s")
    assert len(_parse_html_tables(two)) == 2
    # no tables -> empty
    assert _parse_html_tables("<html><p>plain</p></html>") == []


def test_aiff_f80_and_quarantine(spark):
    from table_streaming_source_spark.operators.multimodal import (
        _f80_decode_int,
        _f80_encode,
    )

    # the AIFF spec's canonical 44.1 kHz vector
    assert _f80_encode(44100).hex() == "400eac44000000000000"
    assert _f80_decode_int(bytes.fromhex("400eac44000000000000")) == 44100
    rows = _run(spark, M.aiff_stats, [M.synth_aiff(3), M.synth_aiff(13)])
    assert {r.samplerate for r in rows} == {8000, 11025}
    bad = bytearray(M.synth_aiff(3))
    bad[4] ^= 0x01  # FORM length corrupt
    with pytest.raises(Exception, match="length"):
        _run(spark, M.aiff_stats, [bytes(bad)])


def test_ebml_vint_and_unknown_skip(spark):
    from table_streaming_source_spark.operators.multimodal import (
        _ebml_elem,
        _ebml_read_vint,
        synth_mkv,
    )

    # vint widths: 1-byte and 2-byte forms, marker stripped for sizes
    assert _ebml_read_vint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert _ebml_read_vint(b"\x40\x2c", 0, keep_marker=False) == (44, 2)
    rows = _run(spark, M.mkv_meta, [synth_mkv(6)])
    assert rows[0].doctype == "matroska" and rows[0].n_tracks == 1
    # an UNKNOWN element inside Segment must be skipped by size, not
    # choke the walk: splice one in front of Info
    base = synth_mkv(6)
    seg_id = b"\x18\x53\x80\x67"
    i = base.index(seg_id)
    from table_streaming_source_spark.operators.multimodal import (
        _ebml_vint_size,
    )
    # decode the original segment size vint
    size, p = _ebml_read_vint(base, i + 4, keep_marker=False)
    inner = base[p : p + size]
    unknown = _ebml_elem(b"\xec", b"\x00\x01\x02")  # Void-like filler
    new_inner = unknown + inner
    rebuilt = (
        base[:i]
        + seg_id
        + _ebml_vint_size(len(new_inner))
        + new_inner
    )
    rows2 = _run(spark, M.mkv_meta, [rebuilt])
    assert rows2[0].n_tracks == rows[0].n_tracks
    assert rows2[0].timestamp_scale == rows[0].timestamp_scale
    # overrun raises
    bad = bytearray(synth_mkv(6))
    bad[-1:] = b""  # truncate last byte
    with pytest.raises(Exception, match="overrun|index|trailing"):
        _run(spark, M.mkv_meta, [bytes(bad)])
