#!/usr/bin/env python
"""Stage-level breakdown of one or more headline queries (guide §7.1:
the UI knows; here we read its REST API programmatically).

Runs each named query against the noop sink on a UI-enabled session,
then dumps that query's stages sorted by total task time: name, task
count, executor run/CPU time, shuffle read/write bytes, input bytes.

Usage: python scripts/profile_stages.py q1[,q2,...] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from table_streaming_source_spark.plans.catalog import QUERIES
    from table_streaming_source_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="tsss-profile-stages",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # arrow worker-pool warmup, same as bench.py
    spark.range(64).repartition(int(sc.defaultParallelism)) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    app_id = sc.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return json.load(r)

    for name in names:
        fn = QUERIES[name]
        # warm run (un-timed, fills fixture caches), then timed runs
        best, best_window = None, None
        for i in range(n_runs + 1):
            pre = {s["stageId"] for s in stages()}
            sc.setJobDescription(f"{name}#run{i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            post = [s for s in stages() if s["stageId"] not in pre]
            sc.setJobDescription(None)
            if i == 0:
                continue
            if best is None or dt < best:
                best, best_window = dt, post
        rows = sorted(
            best_window, key=lambda s: -s.get("executorRunTime", 0)
        )
        print(f"\n=== {name}: best {best:.3f}s, "
              f"{len(best_window)} stages, "
              f"{sum(s['numCompleteTasks'] for s in best_window)} tasks")
        for s in rows[:14]:
            nm = s.get("name", "?").split("\n")[0][:72]
            print(
                f"  run={s.get('executorRunTime', 0)/1e3:7.2f}s "
                f"cpu={s.get('executorCpuTime', 0)/1e9:7.2f}s "
                f"tasks={s['numCompleteTasks']:4d} "
                f"in={s.get('inputBytes', 0)/1e6:8.1f}MB "
                f"sr={s.get('shuffleReadBytes', 0)/1e6:7.1f}MB "
                f"sw={s.get('shuffleWriteBytes', 0)/1e6:7.1f}MB  {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
