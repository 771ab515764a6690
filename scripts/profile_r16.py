#!/usr/bin/env python
"""Round-15 optimization measurement harness.

Dumps `.explain("formatted")` for headline queries into plans/r16/ and
(optionally) times each query with the noop sink (guide §1.4), labeling
jobs (guide §1.5) and recording the Spark job count per query — the
job count is the cheap proxy for "how many actions / checkpoints does
this query fire" that wall-clock alone hides.

Usage:
    python scripts/profile_r16.py plans [suffix]        # dump plans only
    python scripts/profile_r16.py time [n_runs]         # time + job counts
    python scripts/profile_r16.py both [suffix]
    SPARK_GRAFT_PROFILE_ONLY=q1,q2 ...                  # subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    from table_streaming_source_spark.plans.catalog import QUERIES
    from table_streaming_source_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = os.environ.get("SPARK_GRAFT_PROFILE_ONLY")
    names = only.split(",") if only else list(HEADLINE)

    spark = get_spark(app_name="tsss-profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same untimed prelude as bench.py: pay the Arrow worker-pool spinup
    spark.range(64).repartition(int(sc.defaultParallelism)) \
        .mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        if mode in ("plans", "both"):
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
        if mode in ("time", "both"):
            sc.setJobDescription(f"r16-profile: {name} warm")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold = time.time() - t0
            best = float("inf")
            n_runs = int(sys.argv[2]) if (mode == "time" and len(sys.argv) > 2) else 3
            for i in range(n_runs):
                sc.setJobDescription(f"r16-profile: {name} run{i}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results[name] = {"cold": round(cold, 3), "best": round(best, 3)}
            sc.setJobDescription(None)
            print(f"{name}: cold={cold:.3f} best={best:.3f}", flush=True)

    if results:
        out = {
            "total_best": round(sum(r["best"] for r in results.values()), 3),
            "queries": results,
        }
        print(json.dumps(out))
        with open(f"/tmp/r16_profile_{suffix}.json", "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
