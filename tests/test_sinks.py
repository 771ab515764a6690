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


def test_upsert_sink_replay_after_pointer_flip_reads_by_batch_id(
    spark, tmp_path
):
    """The crash-between-flip-and-checkpoint window: after batch 1's
    pointer flip, its replay must read v1 (by batch id), not the live
    pointer (which names the replay's own output directory)."""
    import os

    from table_streaming_source_spark.sinks import upsert_sink

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    on_batch, current = upsert_sink(spark, state_dir, key="k")
    b0 = spark.createDataFrame(
        [(1, "I", "a", 1.0)], "k int, op string, s string, v double"
    )
    b1 = spark.createDataFrame(
        [(1, "U", "aa", 2.0), (2, "I", "b", 3.0)],
        "k int, op string, s string, v double",
    )
    on_batch(b0, 0)
    on_batch(b1, 1)  # pointer now at v2
    want = sorted(map(tuple, current().collect()))
    on_batch(b1, 1)  # replay AFTER the flip
    assert sorted(map(tuple, current().collect())) == want


def test_upsert_sink_refuses_fresh_stream_over_state(spark, tmp_path):
    import os

    import pytest as _pytest

    from table_streaming_source_spark.sinks import upsert_sink

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    on_batch, _ = upsert_sink(spark, state_dir, key="k")
    b = spark.createDataFrame(
        [(1, "I", "a", 1.0)], "k int, op string, s string, v double"
    )
    on_batch(b, 0)
    on_batch(b, 1)  # live = v2
    with _pytest.raises(RuntimeError, match="fresh stream"):
        on_batch(b, 0)  # a new checkpoint restarting over old state


def test_upsert_sink_compacts_duplicate_ops_with_sequence(spark, tmp_path):
    """A raw CDC micro-batch with several ops for one key compacts
    latest-wins under upsert semantics — which IS sequential
    application for full-row-image feeds: insert-then-update lands the
    update, anything-then-delete lands the delete, and out-of-order
    sequence numbers inside the batch resolve by sequence, not by row
    order."""
    import os

    from table_streaming_source_spark.sinks import upsert_sink

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    on_batch, current = upsert_sink(
        spark, state_dir, key="k", sequence_col="seq"
    )
    b0 = spark.createDataFrame(
        # key 1: insert then update → final image a2/2.0
        # key 2: insert then delete → absent
        # key 4: out-of-order seq — 31 wins over 29 regardless of order
        [(1, 10, "I", "a", 1.0), (1, 11, "U", "a2", 2.0),
         (2, 12, "I", "b", 3.0), (2, 13, "D", None, None),
         (4, 31, "U", "d2", 2.0), (4, 29, "I", "x", 9.0)],
        "k int, seq int, op string, s string, v double",
    )
    on_batch(b0, 0)
    assert sorted(map(tuple, current().collect())) == [
        (1, "a2", 2.0),
        (4, "d2", 2.0),
    ]
    b1 = spark.createDataFrame(
        # update existing key 1; delete key 4; re-insert key 2
        [(1, 20, "U", "a3", 5.0), (4, 21, "D", None, None),
         (2, 22, "I", "b2", 7.0)],
        "k int, seq int, op string, s string, v double",
    )
    on_batch(b1, 1)
    assert sorted(map(tuple, current().collect())) == [
        (1, "a3", 5.0),
        (2, "b2", 7.0),
    ]


def test_upsert_sink_random_batch_sequence_vs_model(spark, tmp_path):
    """End-to-end randomized run: six seeded-random CDC micro-batches
    (duplicate keys inside batches, upsert semantics via sequence_col)
    applied through the sink, with the final state compared against a
    dict model that applies every op in sequence order."""
    import os
    import random

    from table_streaming_source_spark.sinks import upsert_sink

    rng = random.Random(4)
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    on_batch, current = upsert_sink(
        spark, state_dir, key="k", sequence_col="seq"
    )
    model: dict = {}
    seq = 0
    for b in range(6):
        rows = []
        for _ in range(rng.randrange(5, 25)):
            k = rng.randrange(30)
            op = rng.choice("IUD")
            rows.append((k, seq, op, f"s{seq}", float(seq)))
            seq += 1
        batch = spark.createDataFrame(
            rows, "k int, seq int, op string, s string, v double"
        )
        on_batch(batch, b)
        # model: latest op per key within the batch, upsert semantics
        last = {}
        for k, sq, op, s, v in rows:
            last[k] = (op, s, v)
        for k, (op, s, v) in last.items():
            if op in ("I", "U"):
                model[k] = (s, v)
            elif k in model:
                del model[k]
    got = {r.k: (r.s, r.v) for r in current().collect()}
    assert got == model


def test_clustered_write_produces_disjoint_sorted_files(spark, sf_dir):
    """The data-skipping contract of q_sink_clustered's layout:
    repartitionByRange gives files whose [min,max] l_shipdate ranges
    are pairwise disjoint, and sortWithinPartitions makes row-group
    stats tight (each file's row groups are internally ordered) — both
    read straight from the parquet footers, which is exactly what a
    pruning scan consults."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from table_streaming_source_spark.plans import _scratch
    from table_streaming_source_spark.plans.common import t

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("l_shipdate")
    )  # DATE: INT96 timestamps carry no footer stats
    path = _scratch.scratch_dir("sink_clustered_test", sf_dir, fresh=True)
    (
        li.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate", "l_orderkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        col = None
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                if c.path_in_schema == "l_shipdate":
                    stats = c.statistics
                    assert stats is not None and stats.has_min_max
                    lo, hi = stats.min, stats.max
                    # row groups within a file are ordered (sorted write)
                    if col is not None:
                        assert lo >= col
                    col = hi
                    ranges.append((f, lo, hi))
    assert len(ranges) >= 2, "expected multiple files/row groups"
    # per-file ranges pairwise disjoint (range partitioning)
    by_file = {}
    for f, lo, hi in ranges:
        cur = by_file.get(f)
        by_file[f] = (
            (min(lo, cur[0]), max(hi, cur[1])) if cur else (lo, hi)
        )
    spans = sorted(by_file.values())
    for (_lo_prev, hi_prev), (lo_next, _hi_next) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, spans


def test_scd2_apply_chains_multiple_changes_within_one_batch(spark):
    """Two changes for one key inside a single batch must chain into
    consecutive intervals (first closes the open row, second closes the
    first) — the behavior that distinguishes SCD2 from a latest-wins
    upsert, which would keep only the second."""
    from table_streaming_source_spark.sinks import scd2_apply

    dim = spark.createDataFrame(
        [(1, "a", "2020-01-01", None), (2, "z", "2020-01-01", None)],
        "k int, seg string, valid_from string, valid_to string",
    ).selectExpr(
        "k", "seg",
        "CAST(valid_from AS TIMESTAMP) AS valid_from",
        "CAST(valid_to AS TIMESTAMP) AS valid_to",
    )
    changes = spark.createDataFrame(
        [(1, "b", "2021-01-01"), (1, "c", "2022-01-01"),
         (3, "n", "2021-06-01")],
        "k int, seg string, change_ts string",
    ).selectExpr("k", "seg", "CAST(change_ts AS TIMESTAMP) AS change_ts")
    out = scd2_apply(
        dim, changes, key="k", attr_cols=["seg"], ts_col="change_ts"
    )
    rows = sorted(
        (r.k, r.seg, str(r.valid_from), str(r.valid_to))
        for r in out.collect()
    )
    assert rows == [
        (1, "a", "2020-01-01 00:00:00", "2021-01-01 00:00:00"),
        (1, "b", "2021-01-01 00:00:00", "2022-01-01 00:00:00"),
        (1, "c", "2022-01-01 00:00:00", "None"),
        (2, "z", "2020-01-01 00:00:00", "None"),   # untouched key
        (3, "n", "2021-06-01 00:00:00", "None"),   # history starts
    ]
