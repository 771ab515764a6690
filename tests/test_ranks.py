"""`operators/ranks.py` — the distributed exact rank/prefix helper
behind the round-13 unpartitioned-window rewrites.  Parity is checked
against the naive single-task window formulation (bit-identical ranks,
prefix sums, running mins, NTILE tiles) and the plan shape is pinned:
ONE parallel hash exchange on the bucket id, and the only
SinglePartition windows run over bounded inputs (the 1-row bounds
aggregate and the checkpointed partials, visible as ExistingRDD)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from table_streaming_source_spark.operators.ranks import (
    global_rank_prefix,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def base(spark):
    # deterministic skew-free key + tied dense key + doubles
    return spark.range(1, 4001).select(
        F.col("id").alias("k"),
        (F.col("id") % 17).alias("dense"),
        ((F.col("id") * 7919) % 1000).alias("v"),
        ((F.col("id") * 104729) % 997).cast("double").alias("d"),
    ).localCheckpoint(eager=False)


def test_range_mode_matches_naive_window(base):
    w = Window.orderBy("k")
    naive = base.select(
        "k",
        F.row_number().over(w).alias("rn"),
        F.sum("v").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum_v"),
    ).toPandas().sort_values("k").reset_index(drop=True)
    got = (
        global_rank_prefix(base, "k", sum_cols=["v"], with_totals=True)
        .select("k", "rn", "cum_v", "n_total", "tot_v")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert (got["rn"].values == naive["rn"].values).all()
    assert (got["cum_v"].values == naive["cum_v"].values).all()
    assert (got["n_total"] == len(naive)).all()
    assert (got["tot_v"] == naive["cum_v"].iloc[-1]).all()


def test_dense_mode_desc_and_running_min(base):
    wn = Window.orderBy(F.desc("dense"), "k")
    naive = base.select(
        "k",
        F.row_number().over(wn).alias("rn"),
        F.min("d").over(
            wn.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("run_min_d"),
    ).toPandas().sort_values("k").reset_index(drop=True)
    got = (
        global_rank_prefix(
            base.withColumn("negdense", -F.col("dense")),
            "negdense",
            tiebreak=["k"],
            min_cols=["d"],
            dense_key=True,
            n_buckets=8,
        )
        .select("k", "rn", "run_min_d")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert (got["rn"].values == naive["rn"].values).all()
    assert (got["run_min_d"].values == naive["run_min_d"].values).all()


def test_dense_mode_requires_tiebreak(base):
    with pytest.raises(ValueError, match="dense_key"):
        global_rank_prefix(base, "dense", dense_key=True)


@pytest.mark.parametrize("k", [3, 5, 8])
def test_ntile_parity_with_native(base, k):
    naive = base.select(
        "k",
        F.ntile(k).over(Window.orderBy("v", "k")).alias("t"),
    ).toPandas().sort_values("k").reset_index(drop=True)
    r = global_rank_prefix(base, "v", tiebreak=["k"], with_totals=True)
    got = r.select(
        "k",
        ntile_from_rank(F.col("rn"), F.col("n_total"), k).alias("t"),
    ).toPandas().sort_values("k").reset_index(drop=True)
    assert (got["t"].values == naive["t"].values).all()


def test_ntile_more_tiles_than_rows(spark):
    tiny = spark.range(1, 4).select(F.col("id").alias("k"))
    naive = tiny.select(
        "k", F.ntile(5).over(Window.orderBy("k")).alias("t")
    ).toPandas().sort_values("k")
    r = global_rank_prefix(tiny, "k", with_totals=True)
    got = r.select(
        "k", ntile_from_rank(F.col("rn"), F.col("n_total"), 5).alias("t")
    ).toPandas().sort_values("k")
    assert (got["t"].values == naive["t"].values).all()


def test_constant_key_degenerates_to_one_bucket(spark):
    const = spark.range(1, 101).select(
        F.lit(7).alias("k"), F.col("id").alias("tb"), F.lit(1).alias("v")
    )
    got = (
        global_rank_prefix(const, "k", tiebreak=["tb"], sum_cols=["v"])
        .select("tb", "rn", "cum_v")
        .toPandas().sort_values("tb").reset_index(drop=True)
    )
    assert list(got["rn"]) == list(range(1, 101))
    assert list(got["cum_v"]) == list(range(1, 101))


def test_plan_one_parallel_exchange_bounded_global_windows(base):
    got = global_rank_prefix(base, "k", sum_cols=["v"])
    got.write.format("noop").mode("overwrite").save()
    plan = (
        got._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    import importlib

    tp = importlib.import_module("test_plans")
    # the generic gate sees no unbounded SinglePartition window
    assert tp._global_window_violations(plan) == [], plan
    # exactly one data-proportional exchange: the bucket hash partition
    import re

    hashes = re.findall(r"Exchange hashpartitioning\(__b", plan)
    assert len(hashes) == 1, plan
    # the offsets window runs over the checkpointed partials
    assert "ExistingRDD" in plan, plan
