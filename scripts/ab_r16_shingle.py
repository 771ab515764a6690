#!/usr/bin/env python
"""Round-16 interleaved A/B of the shingle-explode pin in
``operators/dedup.py::_shingle_intersections`` (guide §2.4): the
explode feeds four consumers (self-join sides + two size legs), so B
pins it (and the doc-scale sizes agg) with lazy localCheckpoints;
A = ``SPARK_GRAFT_SHINGLE_PIN=0`` (the old four-explode shape)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from table_streaming_source_spark.session import get_spark
from table_streaming_source_spark.plans.catalog import QUERIES

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ENTRIES = ["dedup_ngram_jaccard", "dedup_containment"]


def timed(spark, name: str, pin: bool) -> float:
    os.environ["SPARK_GRAFT_SHINGLE_PIN"] = "1" if pin else "0"
    try:
        spark.sparkContext.setJobDescription(f"ab-shingle {name} pin={pin}")
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        return time.time() - t0
    finally:
        os.environ.pop("SPARK_GRAFT_SHINGLE_PIN", None)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-r16-shingle")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    for name in ENTRIES:
        for pin in (False, True):  # warm both arms
            timed(spark, name, pin)
        samples = {"A": [], "B": []}
        for _ in range(rounds):
            for tag, pin in (("A", False), ("B", True)):
                samples[tag].append(
                    round(min(timed(spark, name, pin) for _ in range(3)), 3)
                )
        print(
            f"{name}: A(no pin)={min(samples['A']):.3f} "
            f"B(pin)={min(samples['B']):.3f}  "
            f"samples A={samples['A']} B={samples['B']}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
