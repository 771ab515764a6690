"""Archive-source unit tests: tar/WebDataset round-trip and the ZIP
central-directory + CRC quarantine contract (`sources/archive.py`)."""

import struct
import zlib

import pytest

from table_streaming_source_spark.sources.archive import (
    _tar_entries,
    write_tar,
    write_zip,
    zip_entries,
)


def test_tar_roundtrip_preserves_names_order_and_bytes(tmp_path):
    entries = [
        ("000000001.txt", "hello world".encode()),
        ("000000001.json", b'{"lang": "en"}'),
        ("000000001.cls", b"en"),
        ("000000002.txt", "παράδειγμα".encode()),
        ("a/nested/path.bin", bytes(range(200))),
        ("empty.txt", b""),
    ]
    p = str(tmp_path / "t.tar")
    write_tar(p, entries)
    with open(p, "rb") as fh:
        got = _tar_entries(fh.read())
    assert got == entries


def test_tar_is_standard_compatible(tmp_path):
    """Our writer must produce archives Python's tarfile accepts (and
    vice versa): cross-validate against the standard library."""
    import io
    import tarfile

    entries = [("x.txt", b"abc"), ("y.bin", bytes(300))]
    p = str(tmp_path / "t.tar")
    write_tar(p, entries)
    with tarfile.open(p) as tf:
        assert [
            (m.name, tf.extractfile(m).read()) for m in tf.getmembers()
        ] == entries
    # and read a stdlib-written archive with our walker
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in entries:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    assert _tar_entries(buf.getvalue()) == entries


def test_truncated_tar_raises():
    p_entries = [("x.txt", b"some payload here")]
    import io
    buf = io.BytesIO()
    # hand-build then truncate mid-payload
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.tar")
        write_tar(p, p_entries)
        with open(p, "rb") as fh:
            data = fh.read()
    with pytest.raises(ValueError, match="truncated"):
        _tar_entries(data[:520])


def test_zip_roundtrip_and_stdlib_compat(tmp_path):
    import zipfile

    entries = [
        ("docs/1.txt", "first body".encode()),
        ("docs/2.txt", "χαίρετε".encode()),
        ("docs/empty.txt", b""),
    ]
    p = str(tmp_path / "t.zip")
    write_zip(p, entries)
    with open(p, "rb") as fh:
        assert zip_entries(fh.read()) == entries
    # the standard library agrees our archive is valid
    with zipfile.ZipFile(p) as zf:
        assert [(n, zf.read(n)) for n in zf.namelist()] == entries
    # and our reader handles a stdlib-written archive
    p2 = str(tmp_path / "t2.zip")
    with zipfile.ZipFile(p2, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in entries:
            zf.writestr(n, d)
    with open(p2, "rb") as fh:
        assert zip_entries(fh.read()) == entries


def test_zip_crc_mismatch_routes_to_quarantine(tmp_path):
    p = str(tmp_path / "t.zip")
    write_zip(p, [("a.txt", b"payload payload payload")])
    with open(p, "rb") as fh:
        data = bytearray(fh.read())
    # corrupt one byte of the compressed stream (after the 30-byte
    # local header + 5-byte name)
    data[40] ^= 0xFF
    with pytest.raises(ValueError):
        zip_entries(bytes(data))


def test_zip_without_eocd_raises():
    with pytest.raises(ValueError, match="end-of-central-directory"):
        zip_entries(b"PK\x03\x04 not a complete zip")


# ---------------------------------------------------------------------------
# XLSX (built on the ZIP walker + stdlib XML)
# ---------------------------------------------------------------------------


def test_xlsx_roundtrip_types_sparse_and_escaping(tmp_path):
    from table_streaming_source_spark.sources.xlsx import (
        write_xlsx,
        xlsx_records,
    )

    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        ["id", "lang", "text"],
        [
            [17, "en", 'a <b> & "c"  d'],
            [18, "zh", "你好"],
            [19, "de", ""],
            [20, None, "sparse"],
        ],
        sheet_name="data",
    )
    recs = xlsx_records(open(p, "rb").read())
    assert [r[0] for r in recs] == ["data"] * 4
    assert recs[0][2] == {
        "id": "17", "lang": "en", "text": 'a <b> & "c"  d'
    }
    assert recs[1][2]["text"] == "你好"
    assert recs[2][2]["text"] == ""
    assert "lang" not in recs[3][2]  # sparse cell absent, not ''


def test_xlsx_is_standard_zip_package(tmp_path):
    import zipfile

    from table_streaming_source_spark.sources.xlsx import write_xlsx

    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, ["a"], [[1]])
    z = zipfile.ZipFile(p)
    assert z.testzip() is None
    assert "[Content_Types].xml" in z.namelist()
    assert "xl/worksheets/sheet1.xml" in z.namelist()


def test_xlsx_quarantines_malformed_packages(tmp_path):
    import zipfile

    from table_streaming_source_spark.sources.archive import write_zip
    from table_streaming_source_spark.sources.xlsx import (
        write_xlsx,
        xlsx_records,
    )

    # a ZIP that is not a spreadsheet package
    p = str(tmp_path / "notx.zip")
    write_zip(p, [("readme.txt", b"hi")])
    with pytest.raises(ValueError, match="workbook"):
        xlsx_records(open(p, "rb").read())
    # an unsupported cell type routes to the named error
    p2 = str(tmp_path / "t.xlsx")
    write_xlsx(p2, ["a"], [[1]])
    parts = dict(
        __import__(
            "table_streaming_source_spark.sources.archive",
            fromlist=["zip_entries"],
        ).zip_entries(open(p2, "rb").read())
    )
    bad_sheet = parts["xl/worksheets/sheet1.xml"].replace(
        b't="n"', b't="e"'
    )
    parts["xl/worksheets/sheet1.xml"] = bad_sheet
    p3 = str(tmp_path / "bad.xlsx")
    write_zip(p3, list(parts.items()))
    with pytest.raises(ValueError, match="cell type"):
        xlsx_records(open(p3, "rb").read())
