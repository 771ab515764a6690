#!/usr/bin/env python
"""Round-16 streaming fixed-cost accounting (VERDICT r15 item #4):
attach a StreamingQueryListener and break one warm invocation of each
streaming bench entry into the engine's own per-batch phase timings
(durationMs: addBatch / getBatch / latestOffset / queryPlanning /
walCommit / commitOffsets / triggerExecution), so the gap between wall
clock and Spark-job time is attributed instead of guessed.

Usage: python scripts/profile_streaming_r16.py [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from table_streaming_source_spark.session import get_spark
from table_streaming_source_spark.plans.catalog import QUERIES

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = sys.argv[1:] or [
    "streaming_interval_join",
    "streaming_session_agg",
    "streaming_session_agg_update",
    "streaming_format_tail",
]


class Collector(StreamingQueryListener):
    def __init__(self):
        self.progress = []
        self.lifecycle = []  # (event, wallclock)

    def onQueryStarted(self, event):
        self.lifecycle.append(("start", time.time()))

    def onQueryProgress(self, event):
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.lifecycle.append(("stop", time.time()))


def main():
    spark = get_spark(app_name="profile-streaming-r16")
    spark.sparkContext.setLogLevel("ERROR")
    col = Collector()
    spark.streams.addListener(col)
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    for name in ENTRIES:
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        col.progress.clear()
        col.lifecycle.clear()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        phases: dict[str, float] = {}
        n_batches = 0
        rows = 0
        for p in col.progress:
            n_batches += 1
            rows += p.get("numInputRows", 0) or 0
            for k, v in (p.get("durationMs") or {}).items():
                phases[k] = phases.get(k, 0.0) + v / 1e3
        trig = phases.get("triggerExecution", 0.0)
        print(f"\n=== {name}: wall {wall:.3f}s, {n_batches} batches, "
              f"{rows} rows")
        print(f"  triggerExecution total {trig:.3f}s "
              f"(wall - trigger = {wall - trig:.3f}s of start/stop + "
              f"build + non-trigger overhead)")
        for k in sorted(phases, key=lambda k: -phases[k]):
            if k != "triggerExecution":
                print(f"    {k:24s} {phases[k]:7.3f}s")
        if col.lifecycle:
            starts = [t for e, t in col.lifecycle if e == "start"]
            stops = [t for e, t in col.lifecycle if e == "stop"]
            if starts and stops:
                span = max(stops) - min(starts)
                print(f"  listener query span {span:.3f}s "
                      f"(wall - span = {wall - span:.3f}s outside the "
                      f"stream: fixture/build/result)")
    spark.streams.removeListener(col)
    spark.stop()


if __name__ == "__main__":
    main()
