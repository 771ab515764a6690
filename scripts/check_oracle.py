#!/usr/bin/env python
"""Local replay of the driver's correctness gate: run every catalog query
on Spark and its DuckDB oracle side by side, compare row count + schema +
order-insensitive values (exact equality after column-name sort).

Usage:
    python scripts/check_oracle.py [--sf /root/testdata/sf0.001]
                                   [--only name1,name2] [--verbose]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # dates, decimals → canonical string
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind(s: "pd.Series") -> str:
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    return "obj"


def compare(name, spark_pdf, duck_pdf, verbose=False, strict_dtypes=False):
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if strict_dtypes:
        # the driver's value-hash is dtype-sensitive: a DuckDB HUGEINT /
        # DECIMAL fetched as float64 against a Spark int64 hashes
        # differently even when every value matches (the exact failure mode
        # of round 1's window_range_frame).  Flag kind mismatches that the
        # value comparison below would normalize away.
        for c in spark_pdf.columns:
            sk, dk = _dtype_kind(spark_pdf[c]), _dtype_kind(duck_pdf[c])
            if sk != dk:
                problems.append(
                    f"dtype-kind col {c}: spark={spark_pdf[c].dtype}({sk}) "
                    f"duck={duck_pdf[c].dtype}({dk}) — driver hash would "
                    "diverge; cast the oracle (or the Spark side) explicitly"
                )
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if len(s) == len(d):
        for c in s.columns:
            sv, dv = s[c], d[c]
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                sa = sv.astype(float).to_numpy()
                da = dv.astype(float).to_numpy()
                both_nan = np.isnan(sa) & np.isnan(da)
                eq = (sa == da) | both_nan
                if not eq.all():
                    bad = np.flatnonzero(~eq)[:3]
                    close = np.isclose(sa, da, rtol=1e-9, atol=1e-12, equal_nan=True).all()
                    problems.append(
                        f"col {c}: {len(np.flatnonzero(~eq))} diffs"
                        f" (close={close}) e.g. {[(sa[i], da[i]) for i in bad]}"
                    )
            else:
                eq = (sv.astype(str).fillna("\0") == dv.astype(str).fillna("\0"))
                if not eq.all():
                    bad = eq[~eq].index[:3]
                    problems.append(
                        f"col {c}: {int((~eq).sum())} diffs e.g. "
                        f"{[(sv[i], dv[i]) for i in bad]}"
                    )
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--strict-dtypes",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="flag dtype-kind mismatches (int vs float) that the "
        "driver's value-hash would reject even when values agree.  "
        "DEFAULT ON — this class caused the only official reds in two "
        "of six rounds (scalar_variant r4, pipeline_dataset_card r6); "
        "use --no-strict-dtypes only for exploration",
    )
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="run on a BARE SparkSession (master + memory only, none of "
        "session.py's confs) — the driver's environment.  Flushes "
        "conf-coupling bugs like round 13's format_sql_ref_read, which "
        "passed every gate under session.py but died on the driver's "
        "vanilla session",
    )
    args = ap.parse_args()

    from table_streaming_source_spark.plans.catalog import ORACLES, QUERIES, ROWS_ONLY

    if args.vanilla:
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
        spark = (
            SparkSession.builder.appName("check-oracle-vanilla")
            .master(f"local[{cpus}]")
            .config("spark.driver.memory", "8g")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from table_streaming_source_spark.session import get_spark

        spark = get_spark(app_name="check-oracle", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    names = list(QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n]

    from table_streaming_source_spark.config import EnvironmentGatedError

    passed, failed, skipped = [], [], []
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = QUERIES[name](spark, args.sf).toPandas()
        except EnvironmentGatedError as exc:
            skipped.append(name)
            print(f"SKIP {name}: {exc.reason}")
            continue
        except Exception as exc:
            failed.append(name)
            print(f"FAIL {name}: spark error: {type(exc).__name__}: {exc}")
            continue
        if name not in ORACLES:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows  ({time.time()-t0:.1f}s)")
            passed.append(name)
            continue
        try:
            duck_pdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as exc:
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = compare(
            name, spark_pdf, duck_pdf, args.verbose,
            strict_dtypes=args.strict_dtypes,
        )
        if problems:
            failed.append(name)
            print(f"FAIL {name} ({len(spark_pdf)} vs {len(duck_pdf)} rows):")
            for p in problems:
                print(f"   - {p}")
        else:
            passed.append(name)
            print(f"OK   {name}: {len(spark_pdf)} rows  ({time.time()-t0:.1f}s)")

    print(
        f"\n{len(passed)}/{len(names)} passed"
        + (f"; env-gated skips: {skipped}" if skipped else "")
        + (f"; rows-only: {ROWS_ONLY}" if not args.only else "")
    )
    if failed:
        print("failed:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
