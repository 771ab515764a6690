"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the settings
below are chosen to also be the right *defaults* for a multi-executor
cluster at 100 TB — AQE handles runtime partition coalescing and skew
splitting, shuffle partitions are sized by environment, and Arrow keeps any
Python-side batch work vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Size the local-mode JVM to the machine instead of a constant.

    In ``local[n]`` ONE JVM holds the driver, every executor thread's
    execution memory, the block manager (snapshot caches + checkpoint
    blocks), and all broadcasts.  The old fixed 8g default left a
    full 67-query bench session memory-bound on a 128 GiB box: cached
    and checkpointed blocks accumulate across queries faster than the
    ContextCleaner's GC-driven release, and the measured effect was a
    ~15 % whole-bench inflation with the heaviest shuffle/iteration
    queries (pagerank, connected components, minhash verify) up to
    1.8× their isolated times (OPTIMIZATION_r15.md, round 15).
    Default: a quarter of physical RAM, clamped to [8g, 24g] — small
    boxes keep the old behavior, big boxes stop thrashing; any cluster
    deploy (or A/B) still pins ``SPARK_DRIVER_MEMORY`` explicitly."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    total_kb = int(line.split()[1])
                    break
            else:
                return "8g"
    except OSError:
        return "8g"
    quarter_gb = total_kb // (4 * 1024 * 1024)
    return f"{min(24, max(8, quarter_gb))}g"


def get_spark(
    app_name: str = "table_streaming_source_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic broadcast conversion — essential at 100 TB where static
        # partition counts are always wrong for some stage.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing mode, MEASURED round 15 (OPTIMIZATION_r15.md):
        # size-based coalescing (parallelismFirst=false, the setting
        # Spark's config reference recommends for byte-bound production
        # stages) was A/B'd over the 14 heaviest bench queries and
        # REGRESSED the local bench 39.0s → 50.9s (+30%) — at test SFs
        # the hot stages are CPU-bound on KB-scale shuffles, and
        # respecting the 64 MB advisory collapses them to one task.
        # Default stays parallelism-first; a cluster deploy whose
        # reducers are byte-bound flips the env knobs instead of
        # editing code.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY_SIZE", "64m"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Broadcast threshold sized to executor memory, not the 10 MB
        # legacy default: on 100+ GiB executors a 64 MB dimension is cheap
        # to ship and saves a full shuffle of the fact side; genuinely
        # large relations still exceed it and fall back to sort-merge.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_BROADCAST_THRESHOLD", "64m"),
        )
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_BROADCAST_THRESHOLD", "64m"),
        )
        # Arrow for any pandas-UDF / toPandas path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown: the table-format batch
        # source (sources/format_batch.py) prunes manifest files from
        # pushed predicates; without this conf a reader overriding
        # pushFilters errors at plan time.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Deterministic timestamp semantics for oracle comparison.  The
        # fixture parquet stores tz-naive timestamps (isAdjustedToUTC=false);
        # reading them as TIMESTAMP_NTZ would break watermarks (Spark
        # requires TIMESTAMP event time), so read them as UTC instants —
        # identical wall-clock under the UTC session zone below.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
