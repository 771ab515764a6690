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


def test_substring_dedup_matches_brute_force(spark, sf_dir):
    """Corpus-wide brute force in plain Python: every 40-char window
    hashed into a dict, repeated windows marked, per-doc islands merged
    — must equal the engine's spans exactly."""
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    K = 40
    counts = Counter()
    wins = {}
    for did, text in zip(docs.doc_id, docs.text):
        ws = [text[i : i + K] for i in range(len(text) - K + 1)]
        wins[did] = ws
        counts.update(ws)
    expect = {}
    for did, text in zip(docs.doc_id, docs.text):
        marked = [
            i for i, w in enumerate(wins.get(did, [])) if counts[w] >= 2
        ]
        spans = []
        for i in marked:
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + K)
            else:
                spans.append([i, i + K])
        dup = sum(e - s for s, e in spans)
        expect[did] = (len(spans), dup)
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_chars"])
        for r in QUERIES["text_substring_dedup"](spark, sf_dir).collect()
    }
    assert got == expect


def test_bitmap_distinct_equals_nunique(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    expect = orders.groupby("o_orderpriority").o_custkey.nunique()
    for r in QUERIES["agg_bitmap_distinct"](spark, sf_dir).collect():
        assert r["n_distinct"] == expect[r["o_orderpriority"]]


def test_kcore_matches_direct_peeling(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    e = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    edges = {
        (int(c), -(int(s) + 1))
        for c, s in zip(e.o_custkey, e.l_suppkey)
    }
    for _ in range(3):
        from collections import Counter

        deg = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= 10}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    from collections import Counter

    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    got = {
        r["node"]: r["degree"]
        for r in QUERIES["graph_kcore"](spark, sf_dir).collect()
    }
    assert got == dict(deg)


def test_interval_overlap_matches_direct(spark, sf_dir):
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    d = orders.o_orderdate.dt.floor("D")
    a = orders[orders.o_orderkey % 2 == 0].assign(s=d, e=d + pd.Timedelta(days=7))
    b = orders[orders.o_orderkey % 2 == 1].assign(s=d, e=d + pd.Timedelta(days=5))
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    bs = sorted(zip(b.s, b.e))
    import bisect

    starts = [x[0] for x in bs]
    for k, sa, ea in zip(a.o_orderkey, a.s, a.e):
        # only b-intervals with s < ea can overlap; scan that prefix
        hi = bisect.bisect_left(starts, ea)
        for sb, eb in bs[:hi]:
            if sb < ea and sa < eb:
                ov = (min(ea, eb) - max(sa, sb)).days
                agg[int(k)][0] += 1
                agg[int(k)][1] += ov
    got = {
        r["o_orderkey"]: (r["n_overlaps"], r["overlap_days"])
        for r in QUERIES["join_interval_overlap_agg"](spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_sample_weighted_matches_direct_priority_ranking(spark, sf_dir):
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs.n_chars > 0]
    pri = []
    for did, w in zip(docs.doc_id, docs.n_chars):
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(1 << 60)
        pri.append((round(round(math.log(u), 9) / w, 12), int(did)))
    expect = sorted(pri, key=lambda t: (-t[0], t[1]))[:50]
    got = [
        (r["priority"], r["doc_id"])
        for r in QUERIES["sample_weighted"](spark, sf_dir).collect()
    ]
    got = sorted(got, key=lambda t: (-t[0], t[1]))
    assert [(d, p) for p, d in got] == [(d, p) for p, d in expect]


def test_dataset_card_matches_pandas(spark, sf_dir):
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["digest"] = docs.text.map(
        lambda t: hashlib.md5(t.encode()).hexdigest()
    )
    for r in QUERIES["pipeline_dataset_card"](spark, sf_dir).collect():
        g = docs[(docs.lang == r["lang"]) & (docs.source == r["source"])]
        assert r["n_docs"] == len(g)
        assert r["total_chars"] == g.n_chars.sum()
        assert r["n_unique"] == g.digest.nunique()
        assert abs(
            r["dup_rate"] - (len(g) - g.digest.nunique()) / len(g)
        ) < 1e-5


def test_scalar_ip_roundtrip_matches_python(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, None, None])
    for uid in ev.user_id:
        ip = (int(uid) * 2654435761) % 4294967296
        o1, o2 = ip >> 24, (ip >> 16) & 255
        net = f"{o1}.{o2}.0.0/16"
        priv = o1 == 10 or (o1 == 172 and 16 <= o2 <= 31) or (
            o1 == 192 and o2 == 168
        )
        a = agg[net]
        a[0] += 1
        a[1] += int(priv)
        a[2] = ip if a[2] is None else min(a[2], ip)
        a[3] = ip if a[3] is None else max(a[3], ip)
    got = {
        r["net16"]: (r["n"], r["n_private"], r["min_ip"], r["max_ip"])
        for r in QUERIES["scalar_ip"](spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# ---------------------------------------------------------------------------
# round 7: rank statistics, survival, decay, quantization, export
# ---------------------------------------------------------------------------


def _avg_ranks(values):
    """Average ranks (1-based, ties share the mean rank) — direct
    O(n log n) numpy derivation, no engine involved."""
    values = np.asarray(values)
    order = np.argsort(values, kind="mergesort")
    ranks = np.empty(len(values), dtype=float)
    sorted_v = values[order]
    i = 0
    while i < len(values):
        j = i
        while j + 1 < len(values) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j + 2) / 2.0  # mean of 1-based
        i = j + 1
    return ranks


def test_mann_whitney_matches_direct_ranks(spark, sf_dir, events):
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_mann_whitney"](spark, sf_dir).collect()
    }
    for et, g in events.groupby("event_type"):
        a = g[g.event_id % 2 == 0].value.to_numpy()
        b = g[g.event_id % 2 == 1].value.to_numpy()
        pooled = np.concatenate([a, b])
        ranks = _avg_ranks(pooled)
        r1 = ranks[: len(a)].sum()
        u1 = r1 - len(a) * (len(a) + 1) / 2.0
        row = rows[et]
        assert row["n1"] == len(a) and row["n2"] == len(b)
        assert row["u1_x2"] == round(2 * u1)
        # tie-corrected z
        n = len(a) + len(b)
        _, t_counts = np.unique(pooled, return_counts=True)
        tie = (t_counts**3 - t_counts).sum() / (n * (n - 1.0))
        var = len(a) * len(b) / 12.0 * ((n + 1) - tie)
        z = (u1 - len(a) * len(b) / 2.0) / math.sqrt(var)
        assert abs(row["z"] - z) < 1e-5, et


def test_survival_km_matches_direct_product(spark, sf_dir, events):
    per_user = events.groupby("user_id").ts.agg(["min", "max"])
    horizon = events.ts.max()
    lifetime = (
        per_user["max"].dt.floor("D") - per_user["min"].dt.floor("D")
    ).dt.days
    churned = per_user["max"] < horizon - pd.Timedelta(days=7)
    df = pd.DataFrame({"t": lifetime, "churn": churned.astype(int)})
    rows = sorted(
        QUERIES["agg_survival_km"](spark, sf_dir).collect(),
        key=lambda r: r["lifetime"],
    )
    n_at_risk = len(df)
    s = 1.0
    for r in rows:
        grp = df[df.t == r["lifetime"]]
        d = int(grp.churn.sum())
        c = int(len(grp) - d)
        assert (r["d"], r["c"]) == (d, c), r["lifetime"]
        assert r["n_at_risk"] == n_at_risk
        s *= (n_at_risk - d) / n_at_risk if n_at_risk else 0.0
        n_at_risk -= d + c
        assert abs(r["survival"] - s) < 1e-5, r["lifetime"]


def test_auc_matches_direct_rank_formula(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = {
        r["source"]: r
        for r in QUERIES["text_auc_eval"](spark, sf_dir).collect()
    }
    for src, g in docs.groupby("source"):
        pos = (g.lang == "en").to_numpy()
        if pos.sum() == 0 or (~pos).sum() == 0:
            assert src not in rows
            continue
        ranks = _avg_ranks(g.n_chars.to_numpy())
        r_pos = ranks[pos].sum()
        n1, n2 = int(pos.sum()), int((~pos).sum())
        auc = (r_pos - n1 * (n1 + 1) / 2.0) / (n1 * n2)
        row = rows[src]
        assert (row["n_pos"], row["n_neg"]) == (n1, n2)
        assert abs(row["auc"] - auc) < 1e-8, src


def test_ewma_decay_matches_direct_loop(spark, sf_dir, events):
    daily = (
        events.groupby(["event_type", "d"])
        .value.apply(lambda v: _dsum6(v))
        .reset_index(name="v")
    )
    got = {
        (r["event_type"], pd.Timestamp(r["d"])): r
        for r in QUERIES["ts_ewma_decay"](spark, sf_dir).collect()
    }
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("d").reset_index(drop=True)
        for i, row in g.iterrows():
            s = 0.0
            for j in range(len(g)):
                delta = (row.d - g.d[j]).days
                if 0 <= delta <= 13:
                    s += g.v[j] * 2.0 ** (-delta)
            r = got[(et, row.d)]
            assert abs(r["daily_v"] - row.v) < 1e-6
            assert abs(r["decayed"] - s) < 1e-4, (et, row.d)


def test_binary_quant_matches_numpy_hamming(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    bits = np.stack(
        [(np.asarray(v) > 0) for v in emb.embedding]
    )  # (n, 64) bool
    ids = emb.vec_id.to_numpy()
    got = QUERIES["sim_binary_quant"](spark, sf_dir).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_query.items():
        qi = int(np.flatnonzero(ids == qid)[0])
        ham = (bits ^ bits[qi]).sum(axis=1)
        order = sorted(
            (int(h), int(i))
            for h, i in zip(ham, ids)
            if i != qid
        )[:3]
        rows = sorted(rows, key=lambda r: r["rank"])
        assert [(r["hamming"], r["neighbor_id"]) for r in rows] == order


def test_shard_export_matches_pandas_cumsum(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").sort_values(
        "doc_id"
    )
    toks = (
        docs.text.str.strip()
        .str.split(r"\s+", regex=True)
        .map(len)
        .to_numpy()
    )
    before = np.concatenate([[0], np.cumsum(toks)[:-1]])
    shard = before // 20000
    direct = (
        pd.DataFrame(
            {"shard": shard, "n": 1, "tok": toks, "doc": docs.doc_id}
        )
        .groupby("shard")
        .agg(
            n_docs=("n", "sum"),
            total_tokens=("tok", "sum"),
            min_doc=("doc", "min"),
            max_doc=("doc", "max"),
        )
    )
    got = {
        r["shard"]: r
        for r in QUERIES["pipeline_shard_export"](spark, sf_dir).collect()
    }
    assert set(got) == set(direct.index)
    for sh, row in direct.iterrows():
        g = got[sh]
        assert (
            g["n_docs"],
            g["total_tokens"],
            g["min_doc"],
            g["max_doc"],
        ) == (
            row.n_docs,
            row.total_tokens,
            row.min_doc,
            row.max_doc,
        )


def test_uuid3_matches_hashlib(spark, sf_dir):
    import hashlib

    rows = QUERIES["scalar_uuid3"](spark, sf_dir).collect()
    for r in rows[:50]:
        h = hashlib.md5(f"tss-doc:{r['doc_id']}".encode()).hexdigest()
        variant = format((int(h[16], 16) & 3) | 8, "x")
        expect = (
            f"{h[0:8]}-{h[8:12]}-3{h[13:16]}-{variant}{h[17:20]}"
            f"-{h[20:32]}"
        )
        assert r["doc_uuid"] == expect
        assert r["doc_uuid"][14] == "3"  # version nibble
        assert r["doc_uuid"][19] in "89ab"  # RFC variant


def test_dtw_matches_direct_dp(spark, sf_dir, events):
    """ts_dtw vs a plain-python O(mn) DP over the same cents series —
    the textbook recurrence, independently derived."""
    cents = (
        events.assign(
            c=lambda d: (
                d.value.map(lambda v: int(Decimal(f"{v:.2f}") * 100))
            )
        )
        .groupby(["event_type", "d"])["c"]
        .sum()
    )
    series = {
        et: cents.loc[et].sort_index().to_list()
        for et in cents.index.get_level_values(0).unique()
    }

    def dtw(a, b):
        inf = float("inf")
        D = [[inf] * (len(b) + 1) for _ in range(len(a) + 1)]
        D[0][0] = 0
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                D[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                    D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
                )
        return D[len(a)][len(b)]

    rows = QUERIES["ts_dtw"](spark, sf_dir).collect()
    assert len(rows) == len(series) * (len(series) - 1) // 2
    for r in rows:
        expect = dtw(series[r["type_a"]], series[r["type_b"]])
        assert r["dtw_cents"] == expect, (r["type_a"], r["type_b"])
        assert r["n_a"] == len(series[r["type_a"]])
