"""From-scratch SQLite reader tests (`sources/sqlite_file.py`):
cross-validated against files written by the stdlib ``sqlite3``
engine itself — round-trip across page sizes (overflow chains,
multi-level b-trees), serial-type coverage, rowid aliasing, and the
malformed-input quarantine contract."""

import sqlite3

import pytest

from table_streaming_source_spark.sources.sqlite_file import (
    _varint,
    sqlite_rows,
)


def _make_db(path, rows, page_size=512):
    con = sqlite3.connect(path)
    con.execute(f"PRAGMA page_size={page_size}")
    con.execute("PRAGMA journal_mode=OFF")
    con.execute(
        "CREATE TABLE documents(doc_id INTEGER PRIMARY KEY, lang TEXT,"
        " source TEXT, text TEXT, n_chars INTEGER, quality REAL)"
    )
    con.executemany(
        "INSERT INTO documents VALUES(?,?,?,?,?,?)", rows
    )
    con.commit()
    con.close()


@pytest.mark.parametrize("page_size", [512, 4096])
def test_roundtrip_overflow_and_interior_pages(tmp_path, page_size):
    rows = [
        (
            i,
            "en" if i % 3 else "de",
            "cc",
            f"word{i} " * (1 + (i * 37) % 400),  # up to ~3 KB → overflow
            (1 + (i * 37) % 400) * (6 + len(str(i))),
            i + 0.25,
        )
        for i in range(400)
    ]
    p = str(tmp_path / "d.db")
    _make_db(p, rows, page_size=page_size)
    got = sqlite_rows(open(p, "rb").read(), "documents", rowid_alias_col=0)
    assert [tuple(r) for r in got] == rows


def test_serial_types_negative_large_null_and_constants(tmp_path):
    rows = [
        (-5, None, "x", None, -(1 << 40), 1.0),
        (1 << 40, "a", "b", "c", 0, 0.0),
        (7, "", "", "", 1, None),
    ]
    p = str(tmp_path / "d.db")
    _make_db(p, rows)
    got = sqlite_rows(open(p, "rb").read(), "documents", rowid_alias_col=0)
    # sqlite stores integral REALs as ints on disk (integer-as-real);
    # the raw row walker surfaces what is stored — affinity conversion
    # is the typed reader's job
    # rows come back in rowid order: -5, 7, 1<<40; the pk slot is NULL
    # in the record and patched in from the cell rowid
    assert [r[0] for r in got] == [-5, 7, 1 << 40]
    assert got[0][4] == -(1 << 40)
    assert float(got[0][5]) == 1.0
    assert got[1][5] is None


def test_varint_boundaries():
    # 9-byte varint carries a full 64-bit two's-complement value
    assert _varint(bytes([0x00]), 0) == (0, 1)
    assert _varint(bytes([0x7F]), 0) == (127, 1)
    assert _varint(bytes([0x81, 0x00]), 0) == (128, 2)
    nine = bytes([0xFF] * 9)
    assert _varint(nine, 0) == (-1, 9)


def test_missing_table_and_bad_magic_quarantine(tmp_path):
    p = str(tmp_path / "d.db")
    _make_db(p, [(1, "a", "b", "c", 1, 0.5)])
    payload = open(p, "rb").read()
    with pytest.raises(ValueError, match="not found"):
        sqlite_rows(payload, "nope")
    with pytest.raises(ValueError, match="magic"):
        sqlite_rows(b"garbage" + payload, "documents")


def test_spark_reader_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from table_streaming_source_spark.sources.sqlite_file import (
        read_sqlite_documents,
    )

    rows = [
        (i, "en", "cc", f"t{i} " * (i % 50), (i % 50) * (3 + len(str(i))),
         i / 4.0)
        for i in range(120)
    ]
    for shard in range(3):
        _make_db(
            str(tmp_path / f"part-{shard}.db"),
            [r for r in rows if r[0] % 3 == shard],
        )
    df = read_sqlite_documents(spark, str(tmp_path)).orderBy("doc_id")
    got = df.collect()
    assert len(got) == 120
    assert [r.doc_id for r in got] == list(range(120))
    assert got[17].quality == 17 / 4.0
    assert got[17].n_chars == rows[17][4]
