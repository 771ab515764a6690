#!/usr/bin/env python
"""Break down the format_cdf_read lifecycle: wall time + Spark job count
per table-format call (guide §1 — find where the time actually goes)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from table_streaming_source_spark.session import get_spark
from table_streaming_source_spark import table_format as TF
from table_streaming_source_spark.plans import _scratch
from table_streaming_source_spark.plans.relational import t, dsum

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="cdf-breakdown")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
tracker = sc.statusTracker()

# warm the arrow pool like bench.py does
spark.range(64).repartition(int(sc.defaultParallelism)) \
    .mapInPandas(lambda it: it, "id long") \
    .write.format("noop").mode("overwrite").save()


def jobs() -> int:
    return len(tracker.getJobIdsForGroup(None) or []) + len(
        sc._jsc.sc().statusTracker().getJobIdsForGroup() or []
    )


def njobs() -> int:
    return int(sc._jsc.sc().dagScheduler().nextJobId())


def run_once(label_prefix: str):
    steps = {}

    def step(name, fn):
        sc.setJobDescription(f"{label_prefix}:{name}")
        j0 = njobs()
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        steps[name] = (round(dt, 3), njobs() - j0)
        return out

    path = _scratch.scratch_dir("format_cdf", sf_dir, fresh=True)
    TF.create_table(path)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    step("append", lambda: TF.commit_append(
        spark, path,
        o.repartitionByRange(8, "o_orderkey").sortWithinPartitions("o_orderkey"),
        stat_cols=["o_orderkey"],
    ))
    low = o.filter(k <= 600)
    changes = (
        low.filter((k % 4 == 0) & (k % 10 != 0)).select(
            "o_orderkey", F.lit("U").alias("op"),
            (F.col("o_totalprice") + 5.0).alias("o_totalprice"))
        .unionByName(low.filter(k % 10 == 0).select(
            "o_orderkey", F.lit("D").alias("op"),
            F.lit(None).cast("double").alias("o_totalprice")))
        .unionByName(low.filter((k % 7 == 0) & (k > 0)).select(
            (-k).alias("o_orderkey"), F.lit("I").alias("op"), "o_totalprice"))
    )
    step("merge", lambda: TF.commit_merge(
        spark, path, changes, key="o_orderkey", stat_cols=["o_orderkey"]))
    step("pos_where", lambda: TF.positions_where(
        spark, path, "o_orderkey > 600 AND o_orderkey % 9 = 0"))
    pos = TF.positions_where(spark, path, "o_orderkey > 600 AND o_orderkey % 9 = 0")
    step("del_pos", lambda: TF.commit_delete_positions(spark, path, pos))
    step("del_keys", lambda: TF.commit_delete_keys(
        spark, path, o.filter((k > 600) & (k % 11 == 0)), key="o_orderkey"))
    step("compact", lambda: TF.commit_compact(spark, path, stat_cols=["o_orderkey"]))
    step("read_cdf_build", lambda: TF.read_cdf(spark, path, from_version=0))
    cdf = TF.read_cdf(spark, path, from_version=0)
    agg = (cdf.groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price")))
    step("cdf_agg_ckpt", lambda: agg.localCheckpoint(eager=True))
    return steps


for i in range(3):
    steps = run_once(f"run{i}")
    tot = sum(v[0] for v in steps.values())
    print(f"--- run {i}: total {tot:.3f}s")
    for name, (dt, nj) in steps.items():
        print(f"  {name:16s} {dt:7.3f}s  jobs={nj}")
spark.stop()
