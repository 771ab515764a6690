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


def test_writer_commit_protocol_and_directory_read(spark, tmp_path):
    """The custom writer stages per-task files and publishes them only
    at commit; the directory reader sees exactly the committed files
    and staging residue is invisible."""
    import os

    from table_streaming_source_spark.sources import fixed_width as FW

    out = str(tmp_path / "out")
    FW.register(spark)
    df = spark.range(1000).selectExpr(
        "id AS key", "id % 7 AS grp", "CAST(id AS DOUBLE) AS value"
    ).repartition(4)
    df.write.format("tsr").mode("overwrite").option("path", out).save()
    files = [n for n in os.listdir(out) if n.endswith(".tsr")]
    assert len(files) == 4  # one published file per task
    assert not [n for n in os.listdir(out) if n.endswith(".tmp")]
    # crash residue: a stray staged file must be invisible to the read
    FW.write_tsr(os.path.join(out, "part-dead.tsr.tmp"), [(1, 1, 1.0)])
    back = (
        spark.read.format("tsr").option("path", out).load()
    )
    assert back.count() == 1000
    assert back.agg({"key": "sum"}).collect()[0][0] == 999 * 1000 // 2
    # overwrite clears previous output AND residue
    df.limit(10).repartition(1).write.format("tsr").mode(
        "overwrite"
    ).option("path", out).save()
    assert (
        spark.read.format("tsr").option("path", out).load().count()
        == 10
    )
    assert not [n for n in os.listdir(out) if n.endswith(".tmp")]
