#!/usr/bin/env python
"""Round-16 cached/uncached pairs (VERDICT r15 item #8): time the 10
heaviest bench entries once with the snapshot cache ON (the bench
default — warm-table query compute) and once with
``SPARK_GRAFT_SNAPSHOT_CACHE=0`` (straight parquet reads), so scan-side
regressions (recorded schemas, file sizing) stay measurable outside the
warm cache.  Each mode runs in its OWN process (the cache is per-process
and sticky once populated); bench protocol per entry (noop sink, min of
3 after one warm run).

Usage: python scripts/uncached_pairs_r16.py --cache 0|1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVIEST = [
    "format_cdf_read", "streaming_format_tail", "streaming_interval_join",
    "dedup_components", "graph_pagerank", "join_fuzzy_levenshtein",
    "format_sql_merge", "sim_ivfpq_search", "sim_ivf_search",
    "dedup_minhash_lsh",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True, choices=["0", "1"])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_SNAPSHOT_CACHE"] = args.cache

    from table_streaming_source_spark.plans.catalog import QUERIES
    from table_streaming_source_spark.session import get_spark

    spark = get_spark(app_name=f"uncached-pairs-cache{args.cache}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    out = {}
    for name in HEAVIEST:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"pairs {name} warm")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(3):
            spark.sparkContext.setJobDescription(f"pairs {name} r{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}", flush=True)
    print(json.dumps({"cache": args.cache, "queries": out,
                      "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
