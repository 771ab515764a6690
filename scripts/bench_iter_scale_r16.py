#!/usr/bin/env python
"""Round-16 scale sweep for the three heaviest iterative operators
(VERDICT r15 item #7): graph_pagerank, dedup_components, sim_ivf_search
at 1x and 10x the sf0.1 fixture (the sf1-equivalent row count), timing
the full operator chain and counting Spark jobs — flat jobs + roughly
linear seconds mean per-iteration cost is data-proportional and nothing
re-derives across rounds after the r15 pins.

Replicas are constructed so the operators' candidate spaces scale
linearly, not quadratically, in the multiplier (the output contract of
the sweep, not of the entries):
- pagerank: disjoint vertex-id-shifted subgraph copies;
- dedup_components / sim_ivf_search: distinct vec_ids AND per-replica
  label salting, so blocks never span replicas.

Usage: python scripts/bench_iter_scale_r16.py [--mults 1,10] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mults", default="1,10")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from table_streaming_source_spark.operators import similarity as S
    from table_streaming_source_spark.operators.dedup import (
        connected_components,
    )
    from table_streaming_source_spark.operators.graph import pagerank
    from table_streaming_source_spark.session import get_spark

    spark = get_spark(app_name="iter-scale-r16")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def emb(mult: int):
        e = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
            "vec_id", "label", "embedding"
        )
        if mult == 1:
            return e
        n = e.count()
        reps = spark.range(mult).select(F.col("id").alias("__rep"))
        return e.crossJoin(reps).select(
            (F.col("vec_id") + F.col("__rep") * (n * 10)).alias("vec_id"),
            F.concat_ws(
                "_", F.col("label"), F.col("__rep").cast("string")
            ).alias("label"),
            "embedding",
        )

    def graph(mult: int):
        o = spark.read.parquet(f"{args.sf}/orders.parquet")
        l = spark.read.parquet(f"{args.sf}/lineitem.parquet")
        c = spark.read.parquet(f"{args.sf}/customer.parquet")
        s = spark.read.parquet(f"{args.sf}/supplier.parquet")
        edges = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"),
            )
            .distinct()
        )
        verts = c.select((F.col("c_custkey") * 2).alias("v")).union(
            s.select((F.col("s_suppkey") * 2 + 1).alias("v"))
        )
        if mult == 1:
            return verts, edges
        shift = 100_000_000
        reps = spark.range(mult).select(F.col("id").alias("__rep"))
        edges = edges.crossJoin(reps).select(
            (F.col("src") + F.col("__rep") * shift).alias("src"),
            (F.col("dst") + F.col("__rep") * shift).alias("dst"),
        )
        verts = verts.crossJoin(reps).select(
            (F.col("v") + F.col("__rep") * shift).alias("v")
        )
        return verts, edges

    def run_pagerank(mult: int):
        verts, edges = graph(mult)
        return pagerank(verts, edges, key="v", damping=0.85, n_iter=3)

    def run_components(mult: int):
        e = emb(mult)
        pairs = S.cosine_pairs_blocked(
            e, block_col="label", threshold=0.35, round_digits=6
        )
        return connected_components(
            e, pairs, key="vec_id", src="key_a", dst="key_b"
        )

    def run_ivf(mult: int):
        e = emb(mult)
        cells = S.kmeans_refine(
            e, num_cells=8, dim=64, n_iter=2
        ).select("vec_id", "cell")
        blocked = e.join(cells, "vec_id")
        return S.cosine_pairs_blocked(
            blocked, block_col="cell", threshold=0.3, round_digits=6,
            max_block=200, mega_block="star",
        )

    OPS = {
        "graph_pagerank": run_pagerank,
        "dedup_components": run_components,
        "sim_ivf_search": run_ivf,
    }
    mults = [int(m) for m in args.mults.split(",")]
    out: dict[str, dict] = {}
    for name, fn in OPS.items():
        out[name] = {}
        for mult in mults:
            sc.setJobDescription(f"iter-scale {name} x{mult} warm")
            fn(mult).write.format("noop").mode("overwrite").save()  # warm
            best, jobs = float("inf"), None
            for i in range(args.reps):
                sc.setJobDescription(f"iter-scale {name} x{mult} r{i}")
                j0 = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
                n0 = len(j0)
                t0 = time.time()
                fn(mult).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                n1 = len(
                    sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
                )
                if dt < best:
                    best, jobs = dt, n1 - n0
            out[name][f"x{mult}"] = {
                "sec": round(best, 3), "jobs": jobs,
            }
            print(f"{name} x{mult}: {best:.3f}s jobs={jobs}", flush=True)
        if len(mults) == 2 and all(f"x{m}" in out[name] for m in mults):
            a, b = (out[name][f"x{m}"]["sec"] for m in mults)
            ratio = b / a if a else float("inf")
            out[name]["sec_ratio"] = round(ratio, 2)
            print(f"{name}: x{mults[1]}/x{mults[0]} sec ratio "
                  f"{ratio:.2f} (data ratio {mults[1] / mults[0]:.0f})",
                  flush=True)
    print(json.dumps(out))
    with open("/tmp/r16_iter_scale.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
