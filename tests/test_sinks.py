"""Partitioned-write + compaction sink tests: directory layout, file
counts, dynamic partition overwrite, and round-trip fidelity — the data
layout discipline docs/SCALE.md prescribes for 100 TB fact tables."""

import glob
import os

from pyspark.sql import functions as F

from table_streaming_source_spark.io import load_table
from table_streaming_source_spark.sinks import compact, write_partitioned


def _parquet_files(path):
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def _events_with_dt(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "dt", F.to_date("ts")
    )


def test_write_partitioned_layout_and_roundtrip(spark, sf_dir, tmp_path):
    events = _events_with_dt(spark, sf_dir)
    out = str(tmp_path / "events_by_dt")
    write_partitioned(events, out, partition_by=["dt"], sort_within=["ts"])

    # one directory per date, hive-style
    days = {d for d in os.listdir(out) if d.startswith("dt=")}
    n_days = events.select("dt").distinct().count()
    assert len(days) == n_days

    # repartition-by-key keeps files per partition bounded (1 task owns
    # each partition → 1 file, not one per input task)
    for d in days:
        files = _parquet_files(os.path.join(out, d))
        assert len(files) == 1, (d, files)

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # decimal-path sum: double addition order differs across layouts
    dsum = F.sum(F.col("value").cast("decimal(18,6)"))
    assert back.agg(dsum).first()[0] == events.agg(dsum).first()[0]

    # partition pruning: a dt filter must read only that directory
    one_day = sorted(days)[0].split("=", 1)[1]
    pruned = back.filter(F.col("dt") == one_day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan


def test_dynamic_overwrite_touches_only_incoming_partitions(
    spark, sf_dir, tmp_path
):
    events = _events_with_dt(spark, sf_dir)
    out = str(tmp_path / "events_dyn")
    write_partitioned(events, out, partition_by=["dt"])
    days = sorted(d for d in os.listdir(out) if d.startswith("dt="))
    target_day = days[0].split("=", 1)[1]

    # overwrite ONE day with doubled values; other days must be intact
    patch = events.filter(F.col("dt") == target_day).withColumn(
        "value", F.col("value") * 2
    )
    write_partitioned(patch, out, partition_by=["dt"])

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    dsum = F.sum(F.col("value").cast("decimal(18,6)"))
    doubled = back.filter(F.col("dt") == target_day).agg(dsum).first()[0]
    original = events.filter(F.col("dt") == target_day).agg(dsum).first()[0]
    assert doubled == 2 * original
    untouched_day = days[1].split("=", 1)[1]
    assert (
        back.filter(F.col("dt") == untouched_day).count()
        == events.filter(F.col("dt") == untouched_day).count()
    )


def test_compact_reduces_file_count_preserves_rows(spark, sf_dir, tmp_path):
    events = _events_with_dt(spark, sf_dir)
    out = str(tmp_path / "events_fragmented")
    # simulate many small incremental appends: 8 round-robin tasks all
    # writing into every partition
    events.repartition(8).write.mode("overwrite").partitionBy("dt").parquet(
        out
    )
    before = len(_parquet_files(out))
    n_days = events.select("dt").distinct().count()
    assert before > n_days  # genuinely fragmented

    compact(spark, out, partition_by=["dt"])
    after = len(_parquet_files(out))
    assert after == n_days  # one file per partition

    back = spark.read.parquet(out)
    assert back.count() == events.count()
    dsum = F.sum(F.col("value").cast("decimal(18,6)"))
    assert back.agg(dsum).first()[0] == events.agg(dsum).first()[0]


def test_upsert_sink_merges_and_replays_idempotently(spark, tmp_path):
    """The versioned stage-and-swap upsert sink: batches merge in order,
    the pointer always names fully-committed state, and re-running a
    batch (at-least-once delivery) rewrites the same version without
    double-applying."""
    from table_streaming_source_spark.sinks import upsert_sink

    state_dir = str(tmp_path / "state")
    import os

    os.makedirs(state_dir)
    on_batch, current = upsert_sink(spark, state_dir, key="k")

    b0 = spark.createDataFrame(
        [(1, "I", "a", 10.0), (2, "I", "b", 20.0)],
        "k int, op string, s string, v double",
    )
    b1 = spark.createDataFrame(
        [(1, "U", "aa", 99.0), (2, "D", None, None), (3, "I", "c", 30.0)],
        "k int, op string, s string, v double",
    )
    on_batch(b0, 0)
    assert sorted(map(tuple, current().collect())) == [
        (1, "a", 10.0),
        (2, "b", 20.0),
    ]
    on_batch(b1, 1)
    want = [(1, "aa", 99.0), (3, "c", 30.0)]
    assert sorted(map(tuple, current().collect())) == want
    # replay batch 1 (restart after crash-before-checkpoint): the merge
    # re-reads v1 and rewrites v2 — state unchanged, not double-applied
    on_batch(b1, 1)
    assert sorted(map(tuple, current().collect())) == want
    # replay window: only the two newest versions remain on disk
    versions = sorted(n for n in os.listdir(state_dir) if n.startswith("v"))
    assert versions == ["v1", "v2"]
