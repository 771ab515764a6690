#!/usr/bin/env python
"""Dump every Spark job (duration + task count + description) fired by
one warm run of a catalog query — generalizes profile_cdf_jobs.py to
any entry (guide §1/§7.1: read the UI programmatically).

Usage: python scripts/profile_query_jobs.py <query_name> [sf_dir]
"""
import json
import os
import sys
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from table_streaming_source_spark.session import get_spark
from table_streaming_source_spark.plans.catalog import QUERIES

name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(
    app_name="query-jobs",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

spark.range(64).repartition(int(sc.defaultParallelism)) \
    .mapInPandas(lambda it: it, "id long") \
    .write.format("noop").mode("overwrite").save()

fn = QUERIES[name]
sc.setJobDescription(f"warm:{name}")
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
sc.setJobDescription(f"timed:{name}")
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
sc.setJobDescription(None)

app_id = sc.applicationId
with urllib.request.urlopen(
    f"http://localhost:4049/api/v1/applications/{app_id}/jobs"
    "?status=succeeded"
) as r:
    jobs = json.load(r)


def ms(j):
    f = "%Y-%m-%dT%H:%M:%S.%f%Z"
    a = datetime.strptime(j["submissionTime"], f)
    b = datetime.strptime(j["completionTime"], f)
    return (b - a).total_seconds() * 1e3


total = 0.0
for j in sorted(jobs, key=lambda j: j["jobId"]):
    d = j.get("description", "")
    if d.startswith("timed:"):
        total += ms(j)
        print(f"job {j['jobId']:4d}  {ms(j):8.0f}ms  "
              f"tasks={j['numTasks']:4d}")
print(f"timed jobs total: {total:.0f}ms")
spark.stop()
