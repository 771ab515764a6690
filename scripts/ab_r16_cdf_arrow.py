#!/usr/bin/env python
"""Round-16 interleaved A/B of the CDF Python-source Arrow emission
(guide §4): ``ChangesReader.read`` / ``CdfStreamReader.read`` yielding
``pyarrow.RecordBatch`` (B, the new default) vs the legacy per-row
pickled tuples (A, ``SPARK_GRAFT_CDF_ARROW=0``).

The hatch is read on the DRIVER at reader-construction time, which for
every consumer happens inside the catalog entry call — so flipping the
env between interleaved arms in ONE session is valid (host drift
cancels; single runs per arm because the entries are lifecycle-heavy).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from table_streaming_source_spark.session import get_spark
from table_streaming_source_spark.plans.catalog import QUERIES

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = [
    "format_changes_sql",        # batch SQL change feed (heaviest non-bench)
    "streaming_format_cdf",      # streaming CDF drain
    "streaming_cdf_compaction",  # CDF under OPTIMIZE
]


def timed(spark, name: str, arrow: bool) -> float:
    old = os.environ.pop("SPARK_GRAFT_CDF_ARROW", None)
    os.environ["SPARK_GRAFT_CDF_ARROW"] = "1" if arrow else "0"
    try:
        spark.sparkContext.setJobDescription(
            f"ab-cdf-arrow {name} arrow={arrow}"
        )
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        return time.time() - t0
    finally:
        os.environ.pop("SPARK_GRAFT_CDF_ARROW", None)
        if old is not None:
            os.environ["SPARK_GRAFT_CDF_ARROW"] = old


def main():
    only = sys.argv[2:] if len(sys.argv) > 2 else ENTRIES
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="ab-r16-cdf-arrow")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long") \
        .write.format("noop").mode("overwrite").save()
    for name in only:
        for arrow in (False, True):  # warm both arms
            timed(spark, name, arrow)
        samples = {"A": [], "B": []}
        for _ in range(rounds):
            for tag, arrow in (("A", False), ("B", True)):
                samples[tag].append(round(timed(spark, name, arrow), 3))
        print(
            f"{name}: A(tuples)={min(samples['A']):.3f} "
            f"B(arrow)={min(samples['B']):.3f}  "
            f"samples A={samples['A']} B={samples['B']}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
