"""Batch Python DataSource (sources/fixed_width.py): split planning,
range-exact reads, and format validation."""

import struct

import pytest

from table_streaming_source_spark.sources import fixed_width as FW


def test_write_read_roundtrip_and_split_fanout(spark, tmp_path):
    path = str(tmp_path / "t.tsr")
    rows = [(i, i % 7, i * 1.5) for i in range(10_000)]
    FW.write_tsr(path, rows)
    FW.register(spark)
    df = (
        spark.read.format("tsr")
        .option("path", path)
        .option("recordsPerSplit", 1024)
        .load()
    )
    # split planning: ceil(10000/1024) = 10 partitions, no funnel
    assert df.rdd.getNumPartitions() == 10
    got = sorted((r["key"], r["grp"], r["value"]) for r in df.collect())
    assert got == rows


def test_reader_ranges_partition_the_file_exactly(tmp_path):
    path = str(tmp_path / "t.tsr")
    FW.write_tsr(path, [(i, 0, 0.0) for i in range(100)])
    reader = FW.FixedWidthReader({"path": path, "recordsPerSplit": "33"})
    parts = reader.partitions()
    assert [(p.start, p.count) for p in parts] == [
        (0, 33), (33, 33), (66, 33), (99, 1),
    ]
    keys = [r[0] for p in parts for r in reader.read(p)]
    assert keys == list(range(100))


def test_reader_rejects_wrong_magic(tmp_path):
    path = str(tmp_path / "bad.tsr")
    with open(path, "wb") as fh:
        fh.write(b"NOPE" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="not a TSR1 file"):
        FW.FixedWidthReader({"path": path})


def test_empty_file_yields_one_empty_partition(tmp_path):
    path = str(tmp_path / "e.tsr")
    FW.write_tsr(path, [])
    reader = FW.FixedWidthReader({"path": path})
    parts = reader.partitions()
    assert len(parts) == 1 and parts[0].count == 0
    assert list(reader.read(parts[0])) == []
