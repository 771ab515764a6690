"""Sink surface of the engine: partitioned parquet layout + compaction.

The reference has no sink of its own (its tests use the host framework's
MockSink, `PipelineTest.java:92`); a standalone engine needs one.  Two
concerns dominate at 100 TB:

- **Partition layout.**  Downstream reads prune on the partition column
  (`WHERE dt = ...` never touches other directories), so facts are laid
  out by their natural query key — usually a date derived from event
  time.  Cardinality discipline: a partition column must stay in the
  thousands of values, never a user id.
- **File sizing.**  A 1000-executor write of a skewed day produces
  thousands of KB-sized files per partition; each file is a task + a
  name-node entry on every future read.  Repartitioning by the partition
  column with AQE coalescing yields one-to-few files per partition;
  :func:`compact` rewrites an existing layout that has already
  fragmented (the maintenance job every table format schedules —
  Iceberg/Delta `OPTIMIZE` reduced to its parquet essence).

Both writes go through Spark's committer, so a failed job never
publishes partial files (rename-on-commit), and ``mode="overwrite"``
with dynamic partition overwrite replaces only the partitions present
in the incoming batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
    sort_within: list[str] | None = None,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by``.

    The frame is repartitioned on the partition columns first, so every
    task writes at most the partitions it owns (no small-file explosion:
    without this, each of N tasks can open a file in each of P
    partitions → N×P files).  ``sort_within`` optionally orders rows
    inside each file to improve parquet min/max pruning on those columns.

    ``dynamic=True`` sets dynamic partition-overwrite for this write:
    an overwrite only replaces partitions present in ``df`` — the
    idempotent daily-backfill pattern.
    """
    spark = df.sparkSession
    out = df.repartition(*[F.col(c) for c in partition_by])
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode).partitionBy(*partition_by)
    if dynamic:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            writer.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
    else:
        writer.parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    *,
    partition_by: list[str],
    target_files_per_partition: int = 1,
) -> None:
    """Rewrite a fragmented partitioned parquet layout with
    ``target_files_per_partition`` files per partition.

    Spark (rightly) refuses to overwrite a path it is lazily reading, so
    the rewrite stages into ``<path>__compacting`` and then swaps
    directories with two filesystem renames — the same
    stage-and-swap every table-format maintenance job performs, reduced
    to its parquet essence.  The swap window is the only moment readers
    can race; table formats close it with a metadata pointer flip, which
    is exactly what they add over raw parquet.  Run after many small
    incremental appends.
    """
    df = spark.read.parquet(path)
    keys = [F.col(c) for c in partition_by]
    if target_files_per_partition == 1:
        out = df.repartition(*keys)
    else:
        # secondary spread key splits each partition into target_files
        # buckets without skew (row-hash, not data-dependent)
        bucket = F.pmod(
            F.xxhash64(*df.columns), F.lit(target_files_per_partition)
        )
        out = df.repartition(*keys, bucket)
    staging = path.rstrip("/") + "__compacting"
    retired = path.rstrip("/") + "__retired"
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(staging)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    fs.rename(hpath, jvm.org.apache.hadoop.fs.Path(retired))
    fs.rename(jvm.org.apache.hadoop.fs.Path(staging), hpath)
    fs.delete(jvm.org.apache.hadoop.fs.Path(retired), True)


def upsert_sink(
    spark: SparkSession,
    state_dir: str,
    *,
    key: str,
    op_col: str = "op",
    sequence_col: str | None = None,
):
    """``foreachBatch`` sink that maintains the *current state* of a keyed
    table under ``state_dir`` by MERGE-ing every CDC micro-batch into it
    (`snapshot.py::merge_into`) — the streaming half of the table-format
    upsert story (Delta ``MERGE`` in ``foreachBatch``, reduced to its
    parquet essence).

    Layout: state version ``n`` lives at ``state_dir/v{n}``; the single
    pointer file ``state_dir/_CURRENT`` names the live version and flips
    via atomic rename.  Batch ``b`` reads **``v{b}``** (the state its
    predecessor produced — NOT the live pointer), merges, writes
    ``v{b + 1}``, then flips the pointer:

    - **Readers never see partial state** — they resolve the pointer to a
      fully-committed directory.
    - **Replays are idempotent** — a restarted batch ``b`` re-reads the
      same ``v{b}`` even when the pointer already moved to ``v{b+1}``
      (the crash-between-flip-and-checkpoint window): reading by batch
      id rather than by pointer is what keeps the replay from consuming
      — and overwriting in place — its own previous output.  Pruning
      keeps the two newest versions, so ``v{b}`` survives its own
      replay window.
    - A fresh stream (batch 0) over a state dir that already has a
      committed pointer raises instead of silently re-bootstrapping
      empty state over it; a missing ``v{b}`` mid-stream (pruned too
      deep, manual deletion) also raises rather than merging into
      nothing.

    ``sequence_col`` (the CDC feed's LSN / offset) is forwarded to
    ``merge_into`` so a micro-batch carrying several ops for one key is
    compacted latest-wins before the merge — raw streaming CDC batches
    routinely do.  Giving a sequence column also switches the merge to
    ``upsert=True`` (insert/update treated as insert-or-update): that
    is the mode under which latest-wins compaction is equivalent to
    sequential application, so an insert-then-update key inside one
    batch lands correctly instead of compacting to a lone no-op
    update.

    The pointer protocol uses local-filesystem primitives
    (``os.replace``); for an HDFS/S3 state root this sink's pointer is
    exactly the piece a table format's metadata log replaces — the
    parquet/merge shape is unchanged (`docs/SCALE.md` §9b).

    Returns ``(on_batch, current)``: pass ``on_batch`` to
    ``writeStream.foreachBatch``; call ``current()`` after the drain for
    the live state DataFrame.  First batch bootstraps the state from the
    batch's own schema (minus ``op_col``/``sequence_col``) — no priming
    write needed.
    """
    import os

    from table_streaming_source_spark.snapshot import merge_into

    pointer = os.path.join(state_dir, "_CURRENT")

    def _live_version() -> int | None:
        try:
            with open(pointer) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None
        except ValueError as e:
            # half-written pointer content is corruption, not absence
            raise RuntimeError(
                f"corrupt state pointer {pointer!r}"
            ) from e
        # any other OSError (EIO, EACCES, non-local path…) propagates:
        # treating it as "no state yet" would silently re-bootstrap
        # empty state over committed data

    def _vdir(v: int) -> str:
        return os.path.join(state_dir, f"v{v}")

    def current(version: int | None = None) -> DataFrame:
        v = version if version is not None else _live_version()
        if v is None:
            raise FileNotFoundError(f"no committed state under {state_dir}")
        return spark.read.parquet(_vdir(v))

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        live = _live_version()
        drop_cols = [op_col] + (
            [sequence_col] if sequence_col is not None else []
        )
        if batch_id == 0:
            # live == 1 is batch 0's own output → legitimate replay of
            # batch 0, which re-bootstraps empty identically; anything
            # newer means a FRESH stream pointed at an established state
            if live is not None and live > 1:
                raise RuntimeError(
                    f"fresh stream (batch 0) over committed state v{live} "
                    f"at {state_dir} — refusing to re-bootstrap; clear the "
                    f"state dir or resume from the original checkpoint"
                )
            state = batch_df.sparkSession.createDataFrame(
                [], batch_df.drop(*drop_cols).schema
            )
        elif os.path.isdir(_vdir(batch_id)):
            # read by BATCH ID, not by pointer: on replay after a flip
            # the pointer names this batch's own output
            state = current(batch_id)
        else:
            raise RuntimeError(
                f"state v{batch_id} missing under {state_dir} "
                f"(live={live}) — replay window exceeded"
            )
        merged = merge_into(
            state, batch_df, key=key, op_col=op_col,
            sequence_col=sequence_col,
            upsert=sequence_col is not None,
        )
        new_v = batch_id + 1
        merged.write.mode("overwrite").parquet(_vdir(new_v))
        tmp = pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, pointer)  # atomic pointer flip
        # prune all but the two newest committed versions (replay window)
        import re
        import shutil

        versions = sorted(
            int(m.group(1))
            for n in os.listdir(state_dir)
            if (m := re.fullmatch(r"v(\d+)", n))
        )
        for old in versions[:-2]:
            shutil.rmtree(_vdir(old), ignore_errors=True)

    return on_batch, current


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    attr_cols: list[str],
    ts_col: str = "change_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply a batch of attribute changes to a Type-2 slowly-changing
    dimension: each tracked key's open row (``valid_to IS NULL``)
    closes at its first incoming change, and the changes chain into new
    validity intervals (``lead`` over the per-key change order), the
    last one open.  Keys without changes, and all historical rows, pass
    through untouched; a change for an unseen key starts its history.

    Several changes for one key in one batch are handled exactly — the
    per-key ``lead`` window chains them in ``ts_col`` order, which is
    what distinguishes this from a latest-wins upsert (SCD2 keeps every
    interval).  All arithmetic is timestamp comparison: no floats, so
    the output is bit-stable under any partitioning.

    Plan shape: one window over the (small) change batch, one hash join
    of the dimension's OPEN rows against the per-key first-change
    timestamps, one anti-join for pass-through — the dimension's
    history never shuffles more than once, and at 100 TB the join keys
    are dimension keys, not fact keys.
    """
    w = F.lead(F.col(ts_col)).over(
        __import__("pyspark").sql.Window.partitionBy(key).orderBy(ts_col)
    )
    new_rows = changes.select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias(valid_from),
        w.alias(valid_to),
    )
    first_change = changes.groupBy(key).agg(
        F.min(ts_col).alias("__first_change")
    )
    open_rows = dim.filter(F.col(valid_to).isNull())
    historical = dim.filter(F.col(valid_to).isNotNull())
    closed = (
        open_rows.join(first_change, key)
        .select(
            F.col(key),
            *[F.col(c) for c in attr_cols],
            F.col(valid_from),
            F.col("__first_change").alias(valid_to),
        )
    )
    untouched_open = open_rows.join(first_change, key, "left_anti")
    return (
        historical.unionByName(untouched_open)
        .unionByName(closed)
        .unionByName(new_rows)
    )


def scd2_sink(
    spark: SparkSession,
    state_dir: str,
    *,
    key: str,
    attr_cols: list[str],
    ts_col: str = "change_ts",
):
    """``foreachBatch`` sink maintaining a Type-2 dimension under the
    same versioned pointer protocol as :func:`upsert_sink` (state
    version per batch, atomic pointer flip, replay-idempotent reads by
    batch id): each CDC micro-batch of attribute changes is applied via
    :func:`scd2_apply` and committed as the next immutable version.
    This is the streaming dimension-maintenance job that feeds the
    ``join_scd2`` validity-window join.

    Returns ``(on_batch, current)`` like :func:`upsert_sink`.
    """
    import os

    pointer = os.path.join(state_dir, "_CURRENT")

    def _vdir(n: int) -> str:
        return os.path.join(state_dir, f"v{n}")

    def current() -> DataFrame:
        with open(pointer) as fh:
            return spark.read.parquet(_vdir(int(fh.read().strip())))

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        version = batch_id + 1
        if batch_id == 0:
            if os.path.exists(pointer):
                raise RuntimeError(
                    "fresh stream over existing scd2 state; "
                    "remove the state dir or resume the old checkpoint"
                )
            prev = batch_df.sparkSession.createDataFrame(
                [],
                batch_df.select(
                    key, *attr_cols
                ).withColumns(
                    {
                        "valid_from": F.lit(None).cast("timestamp"),
                        "valid_to": F.lit(None).cast("timestamp"),
                    }
                ).schema,
            )
        else:
            prev = spark.read.parquet(_vdir(batch_id))
        changes = batch_df.select(key, *attr_cols, ts_col)
        nxt = scd2_apply(
            prev, changes, key=key, attr_cols=attr_cols, ts_col=ts_col
        )
        nxt.write.mode("overwrite").parquet(_vdir(version))
        tmp = pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, pointer)
        versions = sorted(
            int(n[1:]) for n in os.listdir(state_dir) if n.startswith("v")
        )
        import shutil

        for old in versions[:-2]:
            shutil.rmtree(_vdir(old), ignore_errors=True)

    return on_batch, current
