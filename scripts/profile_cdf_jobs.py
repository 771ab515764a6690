#!/usr/bin/env python
"""Dump every Spark job (description + duration) fired by one
format_cdf_read lifecycle — finds the per-commit jobs worth removing
(guide §1/§7.1: read the UI programmatically)."""
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from table_streaming_source_spark.session import get_spark
from table_streaming_source_spark import table_format as TF
from table_streaming_source_spark.plans import _scratch
from table_streaming_source_spark.plans.relational import t, dsum

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="cdf-jobs",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"},
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

spark.range(64).repartition(int(sc.defaultParallelism)) \
    .mapInPandas(lambda it: it, "id long") \
    .write.format("noop").mode("overwrite").save()


def lifecycle(label):
    path = _scratch.scratch_dir("format_cdf", sf_dir, fresh=True)
    TF.create_table(path)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    sc.setJobDescription(f"{label}:append")
    TF.commit_append(
        spark, path,
        o.repartitionByRange(8, "o_orderkey").sortWithinPartitions("o_orderkey"),
        stat_cols=["o_orderkey"],
    )
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
    sc.setJobDescription(f"{label}:merge")
    TF.commit_merge(spark, path, changes, key="o_orderkey",
                    stat_cols=["o_orderkey"])
    sc.setJobDescription(f"{label}:del_pos")
    TF.commit_delete_positions(
        spark, path,
        TF.positions_where(spark, path, "o_orderkey > 600 AND o_orderkey % 9 = 0"))
    sc.setJobDescription(f"{label}:del_keys")
    TF.commit_delete_keys(
        spark, path, o.filter((k > 600) & (k % 11 == 0)), key="o_orderkey")
    sc.setJobDescription(f"{label}:compact")
    TF.commit_compact(spark, path, stat_cols=["o_orderkey"])
    sc.setJobDescription(f"{label}:cdf_agg")
    (TF.read_cdf(spark, path, from_version=0)
        .groupBy(F.col("_change_type").alias("change_type"),
                 F.col("_commit_version").alias("commit_version"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price"))
        .localCheckpoint(eager=True))


lifecycle("warm")   # cold run: populates snapshot cache, JIT
lifecycle("timed")  # the run we dump

app_id = sc.applicationId
with urllib.request.urlopen(
    f"http://localhost:4048/api/v1/applications/{app_id}/jobs?status=succeeded"
) as r:
    jobs = json.load(r)

from datetime import datetime


def ms(j):
    f = "%Y-%m-%dT%H:%M:%S.%f%Z"
    a = datetime.strptime(j["submissionTime"], f)
    b = datetime.strptime(j["completionTime"], f)
    return (b - a).total_seconds() * 1e3


for j in sorted(jobs, key=lambda j: j["jobId"]):
    d = j.get("description", "")
    if d.startswith("timed:"):
        print(f"job {j['jobId']:4d}  {ms(j):8.0f}ms  tasks={j['numTasks']:4d}  "
              f"{d}  name={j.get('name', '')[:90]}")
spark.stop()
