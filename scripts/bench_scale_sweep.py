#!/usr/bin/env python
"""Scaling-behavior evidence for the flagship corpus operators: run
each on 1x / 4x / 16x replicas of the sf0.1 documents/embeddings
corpus (replicated with distinct ids and salted texts so the dedup
candidate spaces scale realistically) and record wall seconds.  A
scale-sound operator shows near-linear growth; a quadratic candidate
space or a single-task bottleneck shows super-linear growth long
before 100 TB would.  Results recorded in docs/SCALE.md.

Usage: python scripts/bench_scale_sweep.py [--sf DIR] [--reps N]
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
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--mults", default="1,4,16")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from table_streaming_source_spark.operators import dedup as D
    from table_streaming_source_spark.operators import similarity as S
    from table_streaming_source_spark.operators import text as X
    from table_streaming_source_spark.session import get_spark

    spark = get_spark(app_name="scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def docs(mult: int):
        d = spark.read.parquet(f"{args.sf}/documents.parquet").select(
            "doc_id", "text"
        )
        if mult > 1:
            # distinct ids per replica, and EVERY TOKEN salted with the
            # replica id: replicas must be mutually DISSIMILAR, else
            # every doc gains mult near-identical twins and the true
            # near-dup pair OUTPUT (not the operator's work) grows
            # quadratically in mult — the first sweep run showed
            # exactly that artifact
            d = d.crossJoin(
                spark.range(mult).select(F.col("id").alias("__rep"))
            ).select(
                (F.col("doc_id") * mult + F.col("__rep")).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("$1"), F.col("__rep").cast("string")),
                ).alias("text"),
            )
        return d

    def embs(mult: int):
        e = spark.read.parquet(f"{args.sf}/embeddings.parquet")
        if mult > 1:
            e = e.crossJoin(
                spark.range(mult).select(F.col("id").alias("__rep"))
            ).select(
                (F.col("vec_id") * mult + F.col("__rep")).alias("vec_id"),
                "embedding",
            )
        return e

    OPS = {
        "dedup_minhash_lsh": lambda m: D.minhash_lsh_pairs(
            docs(m), "text", "doc_id"
        ),
        "dedup_cdc_chunking": lambda m: D.cdc_chunk_stats(
            docs(m), "text", "doc_id"
        ),
        "text_tfidf_top_terms": lambda m: X.tfidf_top_terms(
            docs(m), "text", "doc_id", top_n=3
        ),
        "dedup_simhash": lambda m: D.simhash(docs(m), "text", "doc_id"),
        "sim_ivf_assign": lambda m: embs(m)
        .transform(
            lambda df: S.ivf_assign(
                df, vec_col="embedding", key="vec_id", num_cells=16
            )
        )
        .groupBy("cell")
        .count(),
    }

    results: dict[str, dict[str, float]] = {}
    for mult in [int(m) for m in args.mults.split(",")]:
        for name, fn in OPS.items():
            try:
                plan = fn(mult)
            except Exception as exc:
                print(f"SKIP {name} x{mult}: {type(exc).__name__}: {exc}")
                continue
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                plan.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results.setdefault(name, {})[f"x{mult}"] = round(best, 2)
            print(f"{name} x{mult}: {best:.2f}s")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
