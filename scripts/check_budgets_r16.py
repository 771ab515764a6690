#!/usr/bin/env python
"""Round-16 budget audit: recompute every catalog entry's shuffle-
exchange count with the RECURSIVE counter (tests/test_plans.py::
plan_exchange_count — final adaptive plan + each lazily pinned
subtree's own, rendered at capture time) and print the entries whose
count exceeds the pinned budget, plus a paste-ready update dict.

Usage: python scripts/check_budgets_r16.py [--sf DIR] [--only a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from tests.test_plans import _ALL_BUDGETS, plan_exchange_count
    from table_streaming_source_spark.plans import catalog
    from table_streaming_source_spark.session import get_spark
    from table_streaming_source_spark.config import EnvironmentGatedError

    spark = get_spark(app_name="check-budgets", shuffle_partitions=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(_ALL_BUDGETS)
    if args.only:
        names = [n for n in args.only.split(",") if n]
    over: dict[str, tuple[int, int]] = {}
    errors: dict[str, str] = {}
    t_start = time.time()
    for i, name in enumerate(names):
        try:
            n, _ = plan_exchange_count(
                catalog.QUERIES[name], spark, args.sf
            )
        except EnvironmentGatedError as exc:
            print(f"SKIP {name}: {exc.reason}", flush=True)
            continue
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"
            print(f"ERR  {name}: {errors[name][:200]}", flush=True)
            continue
        if n > _ALL_BUDGETS[name]:
            over[name] = (_ALL_BUDGETS[name], n)
            print(
                f"OVER {name}: budget {_ALL_BUDGETS[name]} -> actual {n}",
                flush=True,
            )
        if (i + 1) % 50 == 0:
            print(f"[{i + 1}/{len(names)}] {time.time() - t_start:.0f}s",
                  flush=True)

    print("\n# proposed updates:")
    print("{")
    for name in sorted(over):
        b, n = over[name]
        print(f"    {name!r}: {n},  # was {b}")
    print("}")
    if errors:
        print(f"# errors ({len(errors)}): {sorted(errors)}")


if __name__ == "__main__":
    main()
