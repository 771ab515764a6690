"""Third-implementation cross-checks for the round-7 fourth-wave
entries: each statistic/metric re-derived in plain pandas/numpy (an
implementation independent of BOTH Spark and the DuckDB oracles) and
compared value-for-value — the guard against both engines agreeing on
the same mis-derived formula."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from table_streaming_source_spark.plans.catalog import QUERIES


@pytest.fixture(scope="module")
def lineitem(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def customer(sf_dir):
    return pd.read_parquet(f"{sf_dir}/customer.parquet")


@pytest.fixture(scope="module")
def documents(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_kruskal_wallis_matches_numpy(spark, sf_dir, lineitem):
    v = lineitem.l_quantity.astype("int64")
    ranks = pd.Series(v).rank(method="average")
    n = len(v)
    groups = lineitem.l_returnflag
    s = sum(
        ranks[groups == g].sum() ** 2 / (groups == g).sum()
        for g in ("A", "N", "R")
    )
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    ties = pd.Series(v).value_counts()
    c = 1.0 - float(((ties**3 - ties).sum())) / (n**3 - n)
    [row] = QUERIES["agg_kruskal_wallis"](spark, sf_dir).collect()
    assert row["n_total"] == n
    assert abs(row["h_stat"] - h) < 1e-6
    assert abs(row["h_tie_corrected"] - h / c) < 1e-6


def test_spearman_matches_pandas(spark, sf_dir, lineitem):
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_spearman"](spark, sf_dir).collect()
    }
    for g, grp in lineitem.groupby("l_returnflag"):
        # pandas' method="spearman" requires scipy (absent here): rank
        # with average ties, then plain Pearson over the ranks
        rx = grp.l_quantity.astype("int64").rank(method="average")
        ry = (
            (grp.l_extendedprice * 100)
            .round()
            .astype("int64")
            .rank(method="average")
        )
        rho = np.corrcoef(rx, ry)[0, 1]
        assert abs(rows[g]["spearman_rho"] - rho) < 1e-9
        assert rows[g]["n"] == len(grp)


def test_hodges_lehmann_matches_numpy(spark, sf_dir, customer):
    rows = {
        r["c_nationkey"]: r
        for r in QUERIES["agg_hodges_lehmann"](spark, sf_dir).collect()
    }
    for nk, grp in customer.groupby("c_nationkey"):
        cents = (grp.c_acctbal * 100).round().astype("int64").to_numpy()
        cents = np.sort(cents)
        sums = (cents[:, None] + cents[None, :])[
            np.triu_indices(len(cents))
        ]
        sums.sort()
        m = len(sums)
        k = (m + 1) // 2
        assert rows[nk]["m_pairs"] == m
        assert rows[nk]["hl_x2_cents"] == sums[k - 1]


def test_bh_fdr_matches_direct(spark, sf_dir, documents):
    ids = documents.doc_id.to_numpy()
    p = ((ids * 2654435761) % 1000003) / 1000003.0
    order = np.lexsort((ids, p))
    m = len(p)
    raw = p[order] * m / np.arange(1, m + 1)
    adj = np.minimum(1.0, np.minimum.accumulate(raw[::-1])[::-1])
    direct = dict(zip(ids[order], adj))
    got = {
        r["doc_id"]: r["p_adjusted"]
        for r in QUERIES["agg_bh_fdr"](spark, sf_dir).collect()
    }
    assert len(got) == m
    for k, v in got.items():
        assert abs(v - direct[k]) < 1e-8


def test_trimmed_winsorized_matches_numpy(spark, sf_dir, customer):
    rows = {
        r["c_nationkey"]: r
        for r in QUERIES["agg_trimmed_mean"](spark, sf_dir).collect()
    }
    for nk, grp in customer.groupby("c_nationkey"):
        cents = np.sort((grp.c_acctbal * 100).round().astype("int64"))
        n = len(cents)
        k = n // 10
        mid = cents[k : n - k]
        trimmed_micro = int(
            ((mid.sum() + len(mid) * 10**6) * 10**6) // len(mid) - 10**12
        )
        wins = mid.sum() + k * cents[k] + k * cents[n - k - 1]
        wins_micro = int(((wins + n * 10**6) * 10**6) // n - 10**12)
        assert rows[nk]["trimmed_mean_microcents"] == trimmed_micro
        assert rows[nk]["winsorized_mean_microcents"] == wins_micro


def test_hits_matches_numpy_matmul(spark, sf_dir, lineitem):
    e = lineitem[["l_partkey", "l_suppkey"]].drop_duplicates()
    parts = sorted(e.l_partkey.unique())
    supps = sorted(e.l_suppkey.unique())
    pi = {p: i for i, p in enumerate(parts)}
    si = {s: i for i, s in enumerate(supps)}
    A = np.zeros((len(parts), len(supps)), dtype=np.int64)
    for p, s in e.itertuples(index=False):
        A[pi[p], si[s]] = 1
    a1 = A.sum(axis=0)          # indegree of suppliers
    h1 = A @ a1                 # hub score round 1
    a2 = A.T @ h1               # authority round 2
    h2 = A @ a2                 # hub round 2
    got = {
        (r["role"], r["id"]): (r["score_1"], r["score_2"])
        for r in QUERIES["graph_hits"](spark, sf_dir).collect()
    }
    for p in parts:
        assert got[("hub", p)] == (h1[pi[p]], h2[pi[p]])
    for s in supps:
        assert got[("auth", s)] == (a1[si[s]], a2[si[s]])


def test_clustering_coeff_matches_sets(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    a = np.minimum(orders.o_custkey % 40, orders.o_orderkey % 40)
    b = np.maximum(orders.o_custkey % 40, orders.o_orderkey % 40)
    edges = {(int(x), int(y)) for x, y in zip(a, b) if x != y}
    adj: dict[int, set[int]] = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    got = {
        r["node"]: r
        for r in QUERIES["graph_clustering"](spark, sf_dir).collect()
    }
    for v, nbrs in adj.items():
        tri = sum(
            1
            for u in nbrs
            for w in nbrs
            if u < w and w in adj[u]
        )
        d = len(nbrs)
        assert got[v]["degree"] == d
        assert got[v]["n_triangles"] == tri
        assert got[v]["wedges"] == d * (d - 1) // 2
        if d >= 2:
            assert abs(
                got[v]["clustering_coeff"] - tri / (d * (d - 1) / 2)
            ) < 1e-9


def _rouge_direct(documents, order):
    match = Counter()
    cand_tot = Counter()
    ref_tot = Counter()
    for _, row in documents.iterrows():
        ref = row.text.strip().split()
        cand = [tok for i, tok in enumerate(ref) if (i + 1) % 5 != 0]
        rg = Counter(
            tuple(ref[i : i + order]) for i in range(len(ref) - order + 1)
        )
        cg = Counter(
            tuple(cand[i : i + order]) for i in range(len(cand) - order + 1)
        )
        match[row.lang] += sum(min(cg[g], rg[g]) for g in cg)
        cand_tot[row.lang] += sum(cg.values())
        ref_tot[row.lang] += sum(rg.values())
    return match, cand_tot, ref_tot


def test_rouge_matches_counter(spark, sf_dir, documents):
    got = {
        (r["lang"], r["n"]): r
        for r in QUERIES["text_rouge_eval"](spark, sf_dir).collect()
    }
    for order in (1, 2):
        match, cand_tot, ref_tot = _rouge_direct(documents, order)
        for lang in match:
            row = got[(lang, order)]
            assert row["match_n"] == match[lang]
            assert row["cand_total"] == cand_tot[lang]
            assert row["ref_total"] == ref_tot[lang]


def test_chrf_matches_counter(spark, sf_dir, documents):
    got = {
        r["lang"]: r
        for r in QUERIES["text_chrf_eval"](spark, sf_dir).collect()
    }
    per = {}
    for _, row in documents.iterrows():
        toks = row.text.strip().split()
        ref = "".join(toks)
        cand = "".join(
            tok for i, tok in enumerate(toks) if (i + 1) % 5 != 0
        )
        d = per.setdefault(row.lang, Counter())
        for n in (1, 2, 3):
            rg = Counter(ref[i : i + n] for i in range(len(ref) - n + 1))
            cg = Counter(
                cand[i : i + n] for i in range(len(cand) - n + 1)
            )
            d[f"m{n}"] += sum(min(cg[g], rg[g]) for g in cg)
            d[f"c{n}"] += sum(cg.values())
            d[f"r{n}"] += sum(rg.values())
    for lang, d in per.items():
        row = got[lang]
        for kcol in ("m1", "m2", "m3", "c1", "c2", "c3", "r1", "r2", "r3"):
            assert row[kcol] == d[kcol], (lang, kcol)
        p = sum(d[f"m{n}"] / d[f"c{n}"] for n in (1, 2, 3)) / 3
        r = sum(d[f"m{n}"] / d[f"r{n}"] for n in (1, 2, 3)) / 3
        assert abs(row["chrf2"] - 5 * p * r / (4 * p + r)) < 1e-9
