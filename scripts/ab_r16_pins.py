#!/usr/bin/env python
"""Round-16 driver-protocol A/B re-confirmation of the four round-15
changes whose single-run driver numbers regressed (VERDICT r15 item #1):

  - join_fuzzy_levenshtein : banded levenshtein(a,b,3) vs the full DP
  - dedup_minhash_lsh      : pin_verify on vs off (SPARK_GRAFT_MINHASH_PIN)
  - dedup_embedding        : cosine input pin forced vs auto-skip
                             (SPARK_GRAFT_COSINE_PIN)
  - streaming_session_agg  : untouched — measured in both arms to
                             bracket the box noise band

Methodology = the bench's own protocol (noop sink, min of 3 after one
warm run) interleaved A/B/A/B in ONE session so host drift cancels
(OPTIMIZATION_r15.md "box drift" note).
"""

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


def old_fuzzy(spark, sf_dir):
    """Pre-r15 form: full O(len^2) levenshtein, filtered after."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand",
        F.split(F.col("p_name"), " ")[0].alias("__w1"),
    )
    a = p.select(
        F.col("p_partkey").alias("a_partkey"),
        F.col("p_name").alias("a_name"),
        F.col("p_brand").alias("__brand"), F.col("__w1"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_partkey"),
        F.col("p_name").alias("b_name"),
        F.col("p_brand").alias("__brand"), F.col("__w1"),
    )
    lev = F.levenshtein(F.col("a_name"), F.col("b_name"))
    return (
        a.join(b, ["__w1", "__brand"])
        .filter(F.col("a_partkey") < F.col("b_partkey"))
        .select("a_partkey", "b_partkey", "a_name", "b_name",
                lev.alias("lev"))
        .filter((F.col("lev") >= 0) & (F.col("lev") <= 3))
    )


def env_variant(name: str, env: str, value: str | None):
    """Catalog entry built under an env toggle (read at build time)."""
    def fn(spark, sf_dir):
        old = os.environ.pop(env, None)
        if value is not None:
            os.environ[env] = value
        try:
            return QUERIES[name](spark, sf_dir)
        finally:
            os.environ.pop(env, None)
            if old is not None:
                os.environ[env] = old
    return fn


PAIRS = {
    # (A = old / pin-off, B = new / pin-on = current catalog default)
    "join_fuzzy_levenshtein": (old_fuzzy, QUERIES["join_fuzzy_levenshtein"]),
    "dedup_minhash_lsh": (
        env_variant("dedup_minhash_lsh", "SPARK_GRAFT_MINHASH_PIN", "0"),
        env_variant("dedup_minhash_lsh", "SPARK_GRAFT_MINHASH_PIN", "1"),
    ),
    "dedup_embedding": (
        env_variant("dedup_embedding", "SPARK_GRAFT_COSINE_PIN", "1"),
        QUERIES["dedup_embedding"],  # auto: cached input skips the pin
    ),
    "streaming_session_agg": (
        QUERIES["streaming_session_agg"], QUERIES["streaming_session_agg"],
    ),
}


def timed(spark, fn) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main():
    only = sys.argv[2:] if len(sys.argv) > 2 else list(PAIRS)
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-r16-pins")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    for name in only:
        a, b = PAIRS[name]
        for fn in (a, b):  # warm both
            timed(spark, fn)
        best = {"A": float("inf"), "B": float("inf")}
        samples = {"A": [], "B": []}
        for _ in range(rounds):
            for tag, fn in (("A", a), ("B", b)):
                s = min(timed(spark, fn) for _ in range(3))
                samples[tag].append(round(s, 3))
                best[tag] = min(best[tag], s)
        print(f"{name}: A(old/off)={best['A']:.3f} B(new/on)={best['B']:.3f}"
              f"  samples A={samples['A']} B={samples['B']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
