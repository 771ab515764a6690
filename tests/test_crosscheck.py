"""Third-implementation cross-checks: a handful of round-6 statistical
entries re-derived in plain pandas/numpy (NOT DuckDB — an independent
third implementation) and compared value-for-value against the Spark
catalog entries.  Catches the failure mode oracle parity can't: both
engines agreeing on the same mis-derived formula."""

import math
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest

from table_streaming_source_spark.plans.catalog import QUERIES


@pytest.fixture(scope="module")
def lineitem(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def events(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    df["d"] = df.ts.dt.floor("D")
    return df


def _dsum6(values):
    return float(sum(Decimal(f"{v:.6f}") for v in values))


def test_welch_ttest_matches_numpy(spark, sf_dir, lineitem):
    r = lineitem[lineitem.l_returnflag == "R"].l_extendedprice.to_numpy()
    n_ = lineitem[lineitem.l_returnflag == "N"].l_extendedprice.to_numpy()
    se = math.sqrt(r.var(ddof=1) / len(r) + n_.var(ddof=1) / len(n_))
    t_direct = (r.mean() - n_.mean()) / se
    [row] = QUERIES["agg_welch_ttest"](spark, sf_dir).collect()
    assert row["n1"] == len(r) and row["n2"] == len(n_)
    assert abs(row["t_stat"] - t_direct) < 1e-4


def test_market_basket_matches_pandas(spark, sf_dir, lineitem):
    from collections import Counter

    items = lineitem[["l_orderkey", "l_partkey"]].drop_duplicates()
    cnt = items.groupby("l_partkey").size()
    fi = items[items.l_partkey.isin(set(cnt[cnt >= 20].index))]
    pair_c = Counter()
    for _, grp in fi.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_c[(ps[i], ps[j])] += 1
    n_baskets = items.l_orderkey.nunique()
    expect = {
        k: (v, round(v * n_baskets / (cnt[k[0]] * cnt[k[1]]), 6))
        for k, v in pair_c.items()
        if v >= 3
    }
    got = {
        (r["part_a"], r["part_b"]): (r["n_ab"], r["lift"])
        for r in QUERIES["market_basket"](spark, sf_dir).collect()
    }
    assert got == expect


def test_theil_sen_matches_direct_median(spark, sf_dir, events):
    got = {
        r["event_type"]: (r["n_pairs"], r["theil_slope"])
        for r in QUERIES["ts_theil_sen"](spark, sf_dir).collect()
    }
    for et, grp in events.groupby("event_type"):
        daily = grp.groupby("d").value.apply(_dsum6)
        days = sorted(daily.index)
        slopes = sorted(
            (daily[days[j]] - daily[days[i]]) / (days[j] - days[i]).days
            for i in range(len(days))
            for j in range(i + 1, len(days))
        )
        nn = len(slopes)
        med = (
            slopes[(nn + 1) // 2 - 1]
            + slopes[math.ceil((nn + 1) / 2) - 1]
        ) / 2
        n_pairs, slope = got[et]
        assert n_pairs == nn
        assert abs(slope - med) < 1e-6, (et, slope, med)


def test_delta_method_ci_matches_numpy(spark, sf_dir, events):
    per_user = events.groupby("user_id").agg(
        x=("event_id", "count"),
        y=(
            "value",
            lambda s: _dsum6(
                s[events.loc[s.index, "event_type"] == "purchase"]
            ),
        ),
    )
    n = len(per_user)
    X = per_user.x.to_numpy(float)
    Y = per_user.y.to_numpy(float)
    r = Y.sum() / X.sum()
    mx = X.mean()
    vx, vy = X.var(ddof=1), Y.var(ddof=1)
    cxy = np.cov(X, Y, ddof=1)[0, 1]
    se = math.sqrt((vy - 2 * r * cxy + r * r * vx) / (n * mx * mx))
    [row] = QUERIES["agg_delta_method_ci"](spark, sf_dir).collect()
    assert row["n_users"] == n
    assert abs(row["ratio"] - r) < 1e-6
    assert abs(row["se"] - se) < 1e-6


def test_chi_square_matches_numpy(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    tab = pd.crosstab(orders.o_orderpriority, orders.o_orderstatus)
    total = tab.values.sum()
    rows = QUERIES["agg_chi_square"](spark, sf_dir).collect()
    for r in rows:
        n = tab.loc[r["o_orderpriority"], r["o_orderstatus"]]
        e = (
            tab.loc[r["o_orderpriority"]].sum()
            * tab[r["o_orderstatus"]].sum()
            / total
        )
        assert r["n"] == n
        assert abs(r["expected_n"] - e) < 1e-5
        assert abs(r["chi2_term"] - (n - e) ** 2 / e) < 1e-5
