"""Scale-strategy tests: bucketed co-located joins (no shuffle), salted
join/agg equivalence — executable proof of docs/SCALE.md's claims."""

import shutil

import pytest
from pyspark.sql import functions as F

from table_streaming_source_spark.io import load_table
from table_streaming_source_spark.operators.skew import salted_agg, salted_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return load_table(spark, sf_dir, "customer")


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, orders):
    """Writing both fact tables bucketed on the join key makes the
    fact ⋈ fact sort-merge join exchange-free — the recurring-key layout
    recommendation of docs/SCALE.md §3/§11."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    n_buckets = 4
    for name, df, key in (
        ("t_lineitem_b", lineitem, "l_orderkey"),
        ("t_orders_b", orders, "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    # disable broadcast so the join strategy under test is sort-merge (the
    # 100 TB fact ⋈ fact shape — tiny fixtures would otherwise broadcast)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        lb, ob = spark.table("t_lineitem_b"), spark.table("t_orders_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        got = sorted(map(tuple, joined.collect()))
        # final adaptive plan only (strip AQE's echoed pre-optimization tree)
        plan = _plan(joined).split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        # nothing below the join may shuffle: bucket co-location feeds
        # both sides directly (SelectedBucketsCount in the scans)
        below_join = plan.split("SortMergeJoin", 1)[-1]
        assert "Exchange" not in below_join, below_join
        assert "SelectedBucketsCount" in below_join
        # and it computes the same thing as the unbucketed plan
        expected = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert got == sorted(map(tuple, expected.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_salted_join_matches_plain_join(orders, customer):
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )
    salted = salted_join(
        orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
        on=["o_custkey"], salt=5,
    ).select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "c_mktsegment"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_agg_matches_plain_agg(orders):
    plain = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )
    salted = salted_agg(
        orders,
        ["o_orderpriority"],
        {
            "n": ("count", "o_orderkey"),
            "total": ("sum", F.col("o_totalprice").cast("decimal(18,2)")),
            "first_date": ("min", "o_orderdate"),
            "last_date": ("max", "o_orderdate"),
        },
        salt=7,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_agg_rejects_non_algebraic(orders):
    with pytest.raises(ValueError, match="not algebraic"):
        salted_agg(orders, ["o_orderpriority"], {"bad": ("avg", "o_totalprice")})


def test_bloom_runtime_filter_prunes_fact_scan(spark, sf_dir):
    """When a selective fact⋈fact join cannot broadcast, Spark's runtime
    Bloom filter (built from the selective side's join keys) must reach
    the big side as a `might_contain` pre-filter — row-level scan pruning
    the 100 TB shape depends on.  Values are unchanged (the filter only
    skips rows the join would drop)."""
    from table_streaming_source_spark.io import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        l = load_table(spark, sf_dir, "lineitem", cached=False)
        o = load_table(spark, sf_dir, "orders", cached=False).filter(
            F.col("o_totalprice") > 450_000
        )
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _plan(j)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan

        got = {(r.l_returnflag, r.n) for r in j.collect()}
        for k, v in confs.items():  # plain plan, no bloom/no-broadcast bans
            spark.conf.unset(k)
        plain = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert {(r.l_returnflag, r.n) for r in plain.collect()} == got
    finally:
        for k, v in old.items():
            if v is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark):
    """docs/SCALE.md §11 claims AQE's skew-join handles moderate skew
    without manual salting — prove it: a deliberately hot key (20% of
    the fact on one key) through a forced sort-merge join must show
    ``skew=true`` on the executed SortMergeJoin, and the values must
    equal the plain join's.  Thresholds are lowered so fixture-sized
    data exhibits the same runtime re-plan a 100 TB hot partition would."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 500_000).select(
            F.when(F.col("id") % 5 == 0, F.lit(0))
            .otherwise(F.pmod("id", 5_000))
            .alias("k"),
            F.lpad(F.col("id").cast("string"), 32, "x").alias("payload"),
        )
        small = spark.range(0, 5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        # collect() executes joined's own queryExecution, so the final
        # adaptive plan we assert on is the one that actually ran (count()
        # would run a different plan and leave this one isFinalPlan=false)
        joined = big.hint("merge").join(small, "k").select(F.lit(1).alias("one"))
        n = len(joined.collect())
        plan = _plan(joined).split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, plan
        assert n == 500_000
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_improves_file_skipping(spark, sf_dir, tmp_path):
    """Z-ordered layout lets BOTH dimensions prune: with 16
    range-partitioned files, a box on dim_a skips most z-ordered files
    (each file pins the high bits of both dims) while the layout sorted
    on dim_b alone cannot skip any — proven on real parquet footer
    min/max stats.  Dims are hash-spread so both cover their full range
    at every SF."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from table_streaming_source_spark.io import load_table
    from table_streaming_source_spark.operators.hof import morton_key

    dim_a = F.pmod(F.xxhash64(F.col("o_custkey")), F.lit(1024)).cast("long")
    dim_b = F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(1024)).cast("long")
    base = (
        load_table(spark, sf_dir, "orders")
        .select(
            dim_a.alias("dim_a"),
            dim_b.alias("dim_b"),
        )
        .withColumn(
            "zkey", morton_key(F.col("dim_a"), F.col("dim_b"), bits=10)
        )
    )

    def write_layout(order_col, path):
        (
            base.repartitionByRange(16, F.col(order_col))
            .sortWithinPartitions(order_col)
            .write.mode("overwrite")
            .parquet(path)
        )

    zpath, npath = str(tmp_path / "zorder"), str(tmp_path / "naive")
    write_layout("zkey", zpath)
    write_layout("dim_b", npath)

    def files_overlapping_box(path):
        hits = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            if md.num_rows == 0:
                continue
            total += 1
            cols = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.num_columns)
            }
            amin = min(
                md.row_group(rg).column(cols["dim_a"]).statistics.min
                for rg in range(md.num_row_groups)
            )
            if amin <= 127:  # box: dim_a < 128
                hits += 1
        return hits, total

    z_hits, z_total = files_overlapping_box(zpath)
    n_hits, n_total = files_overlapping_box(npath)
    assert z_total >= 8 and n_total >= 8
    assert n_hits == n_total          # dim_b sort cannot prune dim_a
    assert z_hits <= z_total // 2     # z-order skips most files


def test_bloom_prefilter_join_exact_and_pruning(spark, sf_dir):
    """The explicit Bloom pre-filter is value-invisible (no false
    negatives; false positives die in the exact join) and the membership
    filter lands on the fact side BEFORE its join exchange."""
    from table_streaming_source_spark.operators.joins import (
        bloom_prefilter_join,
    )

    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    bloomed = bloom_prefilter_join(o, c, "custkey")
    plain = o.join(c, "custkey")
    assert sorted(map(tuple, bloomed.collect())) == sorted(
        map(tuple, plain.collect())
    )

    # the xxhash64 membership filter must prune the fact relation before
    # any exchange (that is the point: rows that cannot match never
    # shuffle)
    plan = bloomed._jdf.queryExecution().executedPlan().toString()
    filter_pos = plan.find("xxhash64")
    assert filter_pos != -1, plan
    # at least the pre-filter count is bounded: every surviving row is a
    # bloom hit, and all true matches survive
    n_pruned = bloom_prefilter_join(o, c, "custkey", how="left_semi").count()
    assert plain.select("custkey").count() <= n_pruned <= o.count()


def test_minhash_verify_gate_both_branches(spark, sf_dir):
    """The verify-prefilter broadcast is count-gated
    (minhash_lsh_pairs ``verify_broadcast_max_keys``): under the gate the
    semi-join is a hinted broadcast (corpus side never shuffles); with
    the gate forced to zero the SAME query plans the shuffled semi-join
    fallback — the branch a pathologically duplicated corpus takes
    instead of OOMing.  Results are identical either way."""
    from table_streaming_source_spark.operators.dedup import (
        _VERIFY_GATE_MEMO,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def plan_of(**kw):
        _VERIFY_GATE_MEMO.clear()
        df = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=8, bands=4, threshold=0.5,
            # keep the verify semi-join visible in the final plan (the
            # round-15 pin_verify checkpoint otherwise hides it)
            pin_verify=False,
            **kw,
        )
        return df, df._jdf.queryExecution().executedPlan().toString()

    hinted_df, _ = plan_of()
    fallback_df, _ = plan_of(verify_broadcast_max_keys=0)

    def semi_nodes(df):
        return [
            ln
            for ln in df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("\n")
            if "LeftSemi" in ln
        ]

    # gate open → the semi-join builds a broadcast side
    assert any("Broadcast" in ln for ln in semi_nodes(hinted_df)), (
        semi_nodes(hinted_df)
    )
    # gate closed → no broadcast semi-join anywhere in the prepared plan
    # (AQE may still convert at RUNTIME, which is exactly the intended
    # degradation: no forced hint bypassing the threshold)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _VERIFY_GATE_MEMO.clear()
        forced = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=8, bands=4, threshold=0.5,
            verify_broadcast_max_keys=0, pin_verify=False,
        )
        assert not any("Broadcast" in ln for ln in semi_nodes(forced))
    finally:
        spark.conf.unset("spark.sql.adaptive.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    _VERIFY_GATE_MEMO.clear()

    a = sorted(map(tuple, hinted_df.collect()))
    b = sorted(map(tuple, fallback_df.collect()))
    assert a == b and a  # same pairs from both branches


def test_minhash_pin_verify_is_pure_materialization(spark, sf_dir):
    """The round-15 ``pin_verify`` checkpoint (candidate-shingle table
    consumed once instead of once per verify-join leg) changes only the
    physical materialization: pair set and jaccard values are identical
    with the pin on (catalog default) and off (the plan-introspection
    mode the gate test uses)."""
    from table_streaming_source_spark.operators.dedup import (
        _VERIFY_GATE_MEMO,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(pin):
        _VERIFY_GATE_MEMO.clear()
        return sorted(
            map(
                tuple,
                minhash_lsh_pairs(
                    docs, "text", "doc_id", num_hashes=8, bands=4,
                    threshold=0.5, pin_verify=pin,
                ).collect(),
            )
        )

    pinned, unpinned = run(True), run(False)
    assert pinned == unpinned and pinned
