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
