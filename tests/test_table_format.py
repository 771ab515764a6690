"""Contract tests for the minimal log-structured table format
(`table_format.py`): snapshot isolation (uncommitted files invisible),
optimistic-concurrency conflicts, time travel, and lossless manifest
pruning."""

import os

import pytest
from pyspark.sql import functions as F

from table_streaming_source_spark import table_format as TF


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    TF.create_table(path)
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("int").alias("bucket"),
        (F.col("id") * 2).alias("v"),
    )
    TF.commit_append(
        spark, path, df.filter("bucket < 5"), stat_cols=["bucket"]
    )
    TF.commit_append(
        spark, path, df.filter("bucket >= 5"), stat_cols=["bucket"]
    )
    return path, df


def test_snapshot_is_exactly_the_committed_union(spark, table):
    path, df = table
    got = TF.read_table(spark, path).count()
    assert got == df.count()


def test_uncommitted_files_are_invisible(spark, table):
    """A data file written WITHOUT a commit (a crashed writer's orphan)
    must not appear in any snapshot — readers resolve the log, never
    the directory."""
    path, df = table
    stray = os.path.join(path, "data", "orphan")
    df.limit(7).write.parquet(stray)  # crashed writer: no commit
    assert TF.read_table(spark, path).count() == df.count()


def test_commit_conflict_raises_and_table_is_untouched(spark, table):
    path, df = table
    head = TF.latest_version(path)
    # two writers both read `head` and race the same next version
    TF.commit_append(
        spark, path, df.limit(3), stat_cols=["bucket"],
        expected_version=head,
    )
    with pytest.raises(TF.CommitConflict):
        TF.commit_append(
            spark, path, df.limit(5), stat_cols=["bucket"],
            expected_version=head,
        )
    # winner's commit landed; loser changed nothing
    assert TF.latest_version(path) == head + 1
    assert TF.read_table(spark, path).count() == df.count() + 3


def test_time_travel_reads_exact_old_snapshots(spark, table):
    path, df = table
    assert TF.read_table(spark, path, version=1).count() == df.filter(
        "bucket < 5"
    ).count()
    v2 = TF.read_table(spark, path, version=2)
    assert v2.count() == df.count()
    # a later commit does not change the old snapshot
    TF.commit_append(spark, path, df.limit(9), stat_cols=["bucket"])
    assert TF.read_table(spark, path, version=2).count() == df.count()


def test_manifest_pruning_skips_files_and_loses_nothing(spark, table):
    path, df = table
    files, kept, total = TF.snapshot_files(path, prune=("bucket", 7, 8))
    assert kept < total, "pruning never skipped a file"
    pruned = (
        TF.read_table(spark, path, prune=("bucket", 7, 8))
        .filter("bucket BETWEEN 7 AND 8")
    )
    direct = df.filter("bucket BETWEEN 7 AND 8")
    assert sorted(r.k for r in pruned.collect()) == sorted(
        r.k for r in direct.collect()
    )


def test_pruning_keeps_files_without_stats(spark, tmp_path):
    """A column missing from the recorded stats must never prune — the
    safe direction when a writer didn't (or couldn't) record footer
    stats for it."""
    path = str(tmp_path / "nostats")
    TF.create_table(path)
    df = spark.range(10).select(F.col("id").alias("k"))
    TF.commit_append(spark, path, df, stat_cols=["k"])
    _, kept, total = TF.snapshot_files(
        path, prune=("not_a_stat_col", 0, 1)
    )
    assert kept == total


def test_format_entry_prunes_more_than_half_the_files(spark, sf_dir):
    """The catalog entry's pruning claim, asserted from the manifest:
    the bucket ∈ [5, 9] read touches commits 1 and 2 only — at most
    half of the four commits' files."""
    from table_streaming_source_spark.plans import _scratch
    from table_streaming_source_spark.plans.common import t

    path = _scratch.scratch_dir("format_pruning_test", sf_dir, fresh=True)
    TF.create_table(path)
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 16).cast("int").alias("bucket"),
        "o_totalprice",
    )
    for i in range(4):
        TF.commit_append(
            spark, path,
            o.filter(
                (F.col("bucket") >= 4 * i) & (F.col("bucket") < 4 * i + 4)
            ),
            stat_cols=["bucket"],
        )
    _, kept, total = TF.snapshot_files(path, prune=("bucket", 5, 9))
    assert total >= 4
    assert kept <= total / 2, (kept, total)


def test_compact_preserves_content_and_time_travel(spark, table):
    path, df = table
    before_files, _, total_before = TF.snapshot_files(path)
    v = TF.commit_compact(spark, path, stat_cols=["bucket"])
    files, kept, total = TF.snapshot_files(path)
    assert total < total_before  # fewer, larger files
    got = TF.read_table(spark, path)
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in df.collect()
    )
    # time travel still resolves the pre-compaction snapshot
    assert TF.read_table(spark, path, version=v - 1).count() == df.count()


def test_vacuum_sweeps_orphans_keeps_retained_snapshots(spark, table):
    path, df = table
    # lost-race orphan: data files written, commit never landed
    import os as _os

    stray = _os.path.join(path, "data", "lost-race")
    df.limit(5).write.parquet(stray)
    TF.commit_compact(spark, path, stat_cols=["bucket"])
    removed, kept = TF.vacuum(path, retain_versions=2)
    assert removed > 0  # the orphan (at least) went
    # both retained snapshots still read clean
    head = TF.latest_version(path)
    assert TF.read_table(spark, path, version=head).count() == df.count()
    assert TF.read_table(spark, path, version=head - 1).count() == (
        df.count()
    )
    # vacuum with retention 1 retires the pre-compaction files
    removed2, _ = TF.vacuum(path, retain_versions=1)
    assert removed2 > 0
    assert TF.read_table(spark, path).count() == df.count()


def test_merge_rewrites_only_stat_overlapping_files(spark, sf_dir):
    """Copy-on-write minimality: a CDC batch touching only keys <= 600
    over a key-clustered table must rewrite far fewer files than the
    snapshot holds — the manifest's per-file key ranges prove the other
    files cannot contain a changed key."""
    from table_streaming_source_spark.plans import _scratch
    from table_streaming_source_spark.plans.common import t

    path = _scratch.scratch_dir("format_merge_test", sf_dir, fresh=True)
    TF.create_table(path)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    TF.commit_append(
        spark, path,
        o.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
        stat_cols=["o_orderkey"],
    )
    changes = o.filter("o_orderkey <= 600 AND o_orderkey % 4 = 0").select(
        "o_orderkey",
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
    )
    _v, rewritten, total = TF.commit_merge(
        spark, path, changes, key="o_orderkey", stat_cols=["o_orderkey"]
    )
    assert total >= 4
    assert rewritten <= total / 2, (rewritten, total)
    # value check: only the touched keys changed
    got = TF.read_table(spark, path)
    assert got.count() == o.count()
    changed = got.join(o.withColumnRenamed("o_totalprice", "orig"),
                       "o_orderkey")
    n_diff = changed.filter("o_totalprice <> orig").count()
    assert n_diff == changes.count()


def test_format_tail_is_incremental_across_restarts(spark, sf_dir, tmp_path):
    """The commit-version offset must survive the checkpoint: after a
    first drain of 3 commits, a 4th commit and a RESTARTED query (same
    checkpoint) emit only the 4th commit's rows — no re-emission, no
    loss."""
    from pyspark.sql import functions as F

    from table_streaming_source_spark.plans.common import t
    from table_streaming_source_spark.streaming.format_tail import (
        register_format_tail,
    )

    path = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    TF.create_table(path)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    for i in range(3):
        TF.commit_append(
            spark, path, o.filter(F.col("o_orderkey") % 4 == i),
            stat_cols=["o_orderkey"],
        )
    register_format_tail(spark)

    def drain():
        stream = spark.readStream.format("format_tail").option(
            "path", path
        ).load()
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()

    drain()
    first = spark.read.parquet(out).count()
    assert first == o.filter("o_orderkey % 4 < 3").count()
    TF.commit_append(
        spark, path, o.filter("o_orderkey % 4 = 3"),
        stat_cols=["o_orderkey"],
    )
    drain()  # restart from the same checkpoint
    total = spark.read.parquet(out).count()
    assert total == o.count()  # exactly the 4th slice added, no dupes


def test_zorder_prunes_on_both_dimensions(spark, sf_dir):
    """Z-order's promise, measured from the manifest: files clustered
    on the morton interleave have tight ranges in BOTH dimensions, so
    a range read on EITHER prunes files; single-key clustering (sorted
    by d1 alone) prunes d1 but NOT d2."""
    from pyspark.sql import functions as F

    from table_streaming_source_spark.operators.hof import morton_key
    from table_streaming_source_spark.plans import _scratch
    from table_streaming_source_spark.plans.common import t

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 64).cast("int").alias("d1"),
        (F.col("o_custkey") % 64).cast("int").alias("d2"),
    ).withColumn("zkey", morton_key(F.col("d1"), F.col("d2"), bits=6))

    def build(df, order_col):
        path = _scratch.scratch_dir(
            f"format_z_{order_col}", sf_dir, fresh=True
        )
        TF.create_table(path)
        TF.commit_append(
            spark, path,
            df.repartitionByRange(16, order_col).sortWithinPartitions(
                order_col
            ),
            stat_cols=["d1", "d2"],
        )
        return path

    zpath = build(o, "zkey")
    dpath = build(o, "d1")
    for col in ("d1", "d2"):
        _, kept, total = TF.snapshot_files(zpath, prune=(col, 8, 15))
        assert kept < total, f"z-order failed to prune on {col}"
    # the single-key layout prunes its own key but not the other
    _, kept_d1, total_d1 = TF.snapshot_files(dpath, prune=("d1", 8, 15))
    assert kept_d1 < total_d1
    _, kept_d2, total_d2 = TF.snapshot_files(dpath, prune=("d2", 8, 15))
    assert kept_d2 == total_d2, "d1-sorted layout should NOT prune d2"


def test_incremental_read_returns_only_the_range(spark, table):
    """(from, to] semantics: files from commits ≤ from_version are
    excluded, each emitted row is attributed to the commit that
    introduced its file."""
    path, df = table  # v1: bucket<5, v2: bucket>=5
    inc = TF.read_incremental(spark, path, from_version=1, to_version=2)
    rows = inc.collect()
    assert all(r["commit_version"] == 2 for r in rows)
    assert sorted(r["k"] for r in rows) == sorted(
        r["k"] for r in df.filter("bucket >= 5").collect()
    )


def test_incremental_read_empty_range_raises(spark, table):
    path, _ = table
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty incremental range"):
        TF.read_incremental(spark, path, from_version=2, to_version=2)


def test_incremental_read_reemits_rewrites_carryover(spark, table):
    """A full-snapshot commit (compact) inside the range re-emits the
    rows it rewrote — the documented changelog-scan carryover caveat:
    stated, not hidden."""
    path, df = table
    TF.commit_compact(spark, path, stat_cols=["bucket"])  # v3 rewrites all
    inc = TF.read_incremental(spark, path, from_version=2, to_version=3)
    rows = inc.collect()
    assert all(r["commit_version"] == 3 for r in rows)
    assert len(rows) == df.count()


def test_incremental_io_is_proportional_to_the_change(spark, table):
    """Manifest-only resolution: the (1, 2] range opens only commit 2's
    files — never the whole table's."""
    path, _ = table
    pairs = TF.incremental_files(path, from_version=1, to_version=2)
    all_files = TF._snapshot_file_dicts(path, 2)
    assert 0 < len(pairs) < len(all_files)
    assert {v for v, _ in pairs} == {2}


def test_cluster_evolution_prunes_new_layout_keeps_old(spark, sf_dir):
    """The format_cluster_evolution claim, asserted from the manifest:
    a bucket-range read keeps EVERY era-1 file (no bucket stats —
    pruning cannot prove absence) and prunes era-2 files outside the
    range."""
    from table_streaming_source_spark.plans import _scratch
    from table_streaming_source_spark.plans.common import t

    path = _scratch.scratch_dir("format_cluster_evo_test", sf_dir, fresh=True)
    TF.create_table(path)
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 16).cast("int").alias("bucket"),
        "o_totalprice",
    )
    TF.commit_append(
        spark, path,
        o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(4, "o_orderkey"),
        stat_cols=["o_orderkey"],
    )
    era1 = {f["path"] for f in TF._snapshot_file_dicts(path, 1)}
    TF.commit_append(
        spark, path,
        o.filter(F.col("o_orderkey") % 2 == 1).repartitionByRange(4, "bucket"),
        stat_cols=["bucket"],
    )
    kept_paths, kept, total = TF.snapshot_files(path, prune=("bucket", 3, 5))
    import os as _os

    kept_rel = {_os.path.relpath(p, path) for p in kept_paths}
    # every era-1 file survives (no stats for the prune column)
    assert era1 <= kept_rel
    # at least one era-2 file is pruned (4 range files cover 16 buckets;
    # a 3-bucket range cannot touch them all)
    assert kept < total, (kept, total)


def test_checked_commit_rejects_before_any_write(spark, tmp_path):
    """A violating batch is rejected with ZERO files staged (the check
    runs before the write), and the table head is untouched."""
    import os as _os

    path = str(tmp_path / "ck")
    TF.create_table(path)
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") - 5).alias("v")
    )
    with pytest.raises(TF.ConstraintViolation, match="positive_v"):
        TF.commit_append_checked(
            spark, path, df,
            stat_cols=["k"], constraints=[("positive_v", "v > 0")],
        )
    assert TF.latest_version(path) == 0
    files = [
        n
        for _r, _d, ns in _os.walk(_os.path.join(path, "data"))
        for n in ns
        if n.endswith(".parquet")
    ]
    assert files == []  # rejection cost zero write I/O


def test_checked_commit_publishes_clean_batches(spark, tmp_path):
    path = str(tmp_path / "ck2")
    TF.create_table(path)
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("v")
    )
    v = TF.commit_append_checked(
        spark, path, df,
        stat_cols=["k"],
        constraints=[("positive_v", "v > 0"), ("k_bound", "k < 100")],
    )
    assert v == 1
    assert TF.read_table(spark, path).count() == 10


def test_staged_commit_is_invisible_until_published(spark, table):
    path, df = table
    TF.commit_stage(
        spark, path, df.limit(5).select("k", "bucket", "v"),
        stat_cols=["bucket"], audit_id="aud1",
    )
    assert TF.latest_version(path) == 2  # unchanged by staging
    assert TF.read_table(spark, path).count() == df.count()
    # the audit view sees table + staged
    assert (
        TF.read_staged(spark, path, audit_id="aud1").count()
        == df.count() + 5
    )
    TF.commit_publish(path, audit_id="aud1")
    assert TF.latest_version(path) == 3
    assert TF.read_table(spark, path).count() == df.count() + 5


def test_abandoned_stage_leaves_orphans_for_vacuum(spark, table):
    import os as _os

    path, df = table
    TF.commit_stage(
        spark, path, df.limit(3).select("k", "bucket", "v"),
        stat_cols=["bucket"], audit_id="aud2",
    )
    TF.commit_abandon(path, audit_id="aud2")
    with pytest.raises(FileNotFoundError):
        TF.read_staged(spark, path, audit_id="aud2")
    removed, kept = TF.vacuum(path, retain_versions=10)
    assert removed >= 1  # the abandoned files swept
    assert TF.read_table(spark, path).count() == df.count()


def test_publish_loses_race_like_any_commit(spark, table):
    path, df = table
    TF.commit_stage(
        spark, path, df.limit(2).select("k", "bucket", "v"),
        stat_cols=["bucket"], audit_id="aud3",
    )
    # another writer lands version 3 first
    TF.commit_append(
        spark, path, df.limit(1).select("k", "bucket", "v"),
        stat_cols=["bucket"],
    )
    with pytest.raises(TF.CommitConflict):
        TF.commit_publish(path, audit_id="aud3")
