#!/usr/bin/env python
"""Same-session interleaved A/B for the round-15 text-query rewrites
(text_importance_weight, text_rouge_eval): the OLD formulations are
inlined here verbatim; NEW comes from the catalog.  Interleaved
old/new rounds in one session cancel box drift (OPTIMIZATION_r15.md
methodology note)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from table_streaming_source_spark.session import get_spark
from table_streaming_source_spark.plans.catalog import QUERIES
from table_streaming_source_spark.plans.relational import t

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_importance(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(F.filter(F.split(F.trim("text"), r"\s+"),
                           lambda x: F.length(x) > 0)).alias("token"),
    )
    uni_g = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cg"))
    uni_t = (toks.filter(F.col("lang") == "en")
             .groupBy("token").agg(F.count(F.lit(1)).alias("ct")))
    totals = toks.agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
        F.countDistinct("token").alias("v"),
    )
    lr = F.round(
        F.log(((F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
               / (F.col("nt") + F.col("v")))
              / ((F.col("cg") + 1.0) / (F.col("ng") + F.col("v")))),
        9,
    ).cast("decimal(18,9)")
    return (
        toks.join(uni_g, "token").join(uni_t, "token", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.round(F.sum(lr).cast("double") / F.count(F.lit(1)), 6)
             .alias("importance"))
    )


def old_rouge(spark, sf_dir):
    docs = (
        t(spark, sf_dir, "documents")
        .select("lang", "doc_id",
                F.split(F.trim("text"), r"\s+").alias("ref_toks"))
        .withColumn("cand_toks",
                    F.expr("filter(ref_toks, (tok, i) -> (i + 1) % 5 != 0)"))
    )

    def grams_all(col):
        return F.expr(
            f"flatten(transform(sequence(1, 2), n -> "
            f"transform(sequence(1, greatest(size({col}) - n + 1, 0)), "
            f"i -> named_struct('n', n, "
            f"'g', concat_ws(' ', slice({col}, i, n))))))")

    def gram_counts(col, out):
        return (docs.select("lang", "doc_id",
                            F.explode(grams_all(col)).alias("ng"))
                .select("lang", "doc_id", "ng.n", "ng.g")
                .groupBy("lang", "doc_id", "n", "g")
                .agg(F.count(F.lit(1)).alias(out)))

    cand = gram_counts("cand_toks", "c_cnt")
    ref = gram_counts("ref_toks", "r_cnt")
    orders = (
        ref.join(cand, ["lang", "doc_id", "n", "g"], "full_outer")
        .select("lang", "n",
                F.least(F.coalesce(F.col("c_cnt"), F.lit(0)),
                        F.coalesce(F.col("r_cnt"), F.lit(0))).alias("m"),
                F.coalesce(F.col("r_cnt"), F.lit(0)).alias("r_cnt"),
                F.coalesce(F.col("c_cnt"), F.lit(0)).alias("c_cnt"))
        .groupBy("lang", "n")
        .agg(F.sum("m").cast("bigint").alias("match_n"),
             F.sum("r_cnt").cast("bigint").alias("ref_total"),
             F.sum("c_cnt").cast("bigint").alias("cand_total"))
    )
    p = F.col("match_n").cast("double") / F.col("cand_total").cast("double")
    r = F.col("match_n").cast("double") / F.col("ref_total").cast("double")
    f1 = F.lit(2.0) * p * r / (p + r)
    return orders.select(
        "lang", F.col("n").cast("int").alias("n"), "match_n",
        "cand_total", "ref_total",
        F.round(p, 9).alias("rouge_p"),
        F.round(r, 9).alias("rouge_r"),
        F.round(F.when(F.col("match_n") > 0, f1).otherwise(F.lit(0.0)), 9)
        .alias("rouge_f1"))


PAIRS = {
    "text_importance_weight": (old_importance,
                               QUERIES["text_importance_weight"]),
    "text_rouge_eval": (old_rouge, QUERIES["text_rouge_eval"]),
}


def main():
    spark = get_spark(app_name="ab-r15-text")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for name, (old, new) in PAIRS.items():
        for fn in (old, new):  # warm both
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = {"old": float("inf"), "new": float("inf")}
        for _ in range(rounds):
            for tag, fn in (("old", old), ("new", new)):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best[tag] = min(best[tag], time.time() - t0)
        print(f"{name}: old={best['old']:.3f} new={best['new']:.3f}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
