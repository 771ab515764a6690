#!/usr/bin/env python
"""Adjudicate the round-13 pipeline_shard_export perf mark with data:
time the OLD single-task global-window prefix sum against the NEW
bucketed two-pass `operators.ranks.global_rank_prefix` on the shard
assignment, at sf0.1 and at a ~10x replicated corpus, interleaved
min-of-N — the crossover measurement VERDICT r13 #4 asked for.

The old plan is cheap at 60k fixture rows (one task, no partials leg)
and IS the query at 100x: every row moves through ONE task.  The new
plan pays a bounds/partials leg that amortizes with scale.  This
script records where the lines cross.

Usage: python scripts/bench_rank_crossover.py [--sf DIR] [--reps N]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from table_streaming_source_spark.operators.ranks import (
        global_rank_prefix,
    )
    from table_streaming_source_spark.session import get_spark

    spark = get_spark(app_name="rank-crossover")

    def corpus(mult: int):
        docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+"))
            .cast("bigint")
            .alias("n_tokens"),
        )
        if mult > 1:
            docs = docs.crossJoin(
                spark.range(mult).select(F.col("id").alias("__rep"))
            ).select(
                (F.col("doc_id") * mult + F.col("__rep")).alias("doc_id"),
                "n_tokens",
            )
        return docs

    def new_plan(docs):
        return global_rank_prefix(
            docs, "doc_id", sum_cols=["n_tokens"]
        ).withColumn(
            "shard",
            F.floor(
                (F.col("cum_n_tokens") - F.col("n_tokens")) / F.lit(20000)
            ).cast("bigint"),
        )

    def old_plan(docs):
        w = Window.orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
        return docs.withColumn(
            "cum_n_tokens", F.sum("n_tokens").over(w)
        ).withColumn(
            "shard",
            F.floor(
                (F.col("cum_n_tokens") - F.col("n_tokens")) / F.lit(20000)
            ).cast("bigint"),
        )

    def run(plan_fn, docs) -> float:
        t0 = time.time()
        # drive the full shard assignment + a checksum aggregate (the
        # parquet write is identical in both variants — excluded)
        plan_fn(docs).groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("s"),
        ).agg(
            F.count(F.lit(1)), F.sum("n"), F.sum("s")
        ).collect()
        return time.time() - t0

    results: dict[str, dict[str, list[float]]] = {}
    for mult in (1, args.mult):
        key = f"x{mult}"
        results[key] = {"old": [], "new": []}
        docs = corpus(mult).localCheckpoint(eager=True)  # equal input
        run(new_plan, docs)  # warm both paths once
        run(old_plan, docs)
        for _ in range(args.reps):
            results[key]["old"].append(run(old_plan, docs))
            results[key]["new"].append(run(new_plan, docs))
        docs.unpersist()
        print(
            f"{key}: old min {min(results[key]['old']):.2f}s "
            f"new min {min(results[key]['new']):.2f}s "
            f"(old {results[key]['old']} new {results[key]['new']})"
        )
    print(json.dumps({
        k: {p: round(min(v), 3) for p, v in d.items()}
        for k, d in results.items()
    }))


if __name__ == "__main__":
    main()
