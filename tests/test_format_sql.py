"""SQL-text DML router (`sources/format_sql.py`): grammar routing,
WHERE-range prune extraction, receipt contents, and conflict semantics
reusing the table-format torture rules (expected_version mismatch →
CommitConflict, exactly-one-winner races handled by the commit layer)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from table_streaming_source_spark import table_format as TF
from table_streaming_source_spark.sources.format_sql import (
    _extract_prune,
    _split_top_level,
    format_sql,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "fsql")
    TF.create_table(path)
    df = spark.range(1, 101).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).cast("double").alias("val"),
    )
    # three files with disjoint k ranges so stats pruning is observable
    for lo, hi in ((1, 30), (31, 60), (61, 100)):
        TF.commit_append(
            spark, path,
            df.filter((F.col("k") >= lo) & (F.col("k") <= hi))
            .coalesce(1),
            stat_cols=["k"],
        )
    return path


def test_split_top_level_respects_parens_and_quotes():
    assert _split_top_level("a = f(x, y), b = 'p,q', c = 1") == [
        "a = f(x, y)", "b = 'p,q'", "c = 1"
    ]


def test_extract_prune_conjuncts():
    assert _extract_prune("k >= 10 AND k <= 20 AND v = 'x'", ["k"]) == (
        "k", 10.0, 20.0
    )
    assert _extract_prune("k BETWEEN 5 AND 9", ["k"]) == ("k", 5.0, 9.0)
    got = _extract_prune("k <= 7 AND k % 3 = 0", ["k"])
    assert got == ("k", -math.inf, 7.0)
    # non-stat columns and OR-shaped text never prune
    assert _extract_prune("z <= 7", ["k"]) is None
    assert _extract_prune("k <= 7 OR k >= 90", ["k"]) is None


def test_update_routes_and_prunes(spark, table):
    r = format_sql(
        spark,
        "UPDATE t SET val = val + 1 WHERE k % 2 = 0 AND k <= 30",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "UPDATE"
    assert r["files_rewritten"] == 1 and r["files_total"] == 3
    got = (
        TF.read_table_mor(spark, table)
        .agg(F.sum("val"))
        .collect()[0][0]
    )
    base = sum(i * 10 for i in range(1, 101))
    assert got == base + 15  # 15 even keys <= 30


def test_delete_routes_to_deletion_vectors(spark, table):
    v0 = TF.latest_version(table)
    r = format_sql(
        spark,
        "DELETE FROM t WHERE k BETWEEN 10 AND 12",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "DELETE"
    assert r["files_rewritten"] == 0  # MOR: no data file rewrites
    assert TF.latest_version(table) == v0 + 1
    keys = {
        row["k"]
        for row in TF.read_table_mor(spark, table)
        .select("k").collect()
    }
    assert keys == set(range(1, 101)) - {10, 11, 12}


def test_merge_upsert_and_receipt(spark, table):
    spark.range(1, 6).select(
        F.col("id").alias("k"),
        F.lit(0.5).alias("val"),
    ).unionByName(
        spark.range(200, 203).select(
            F.col("id").alias("k"), F.lit(7.0).alias("val")
        )
    ).createOrReplaceTempView("fsql_test_src")
    r = format_sql(
        spark,
        "MERGE INTO t USING fsql_test_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "MERGE"
    # matched keys 1-5 live in file 1 only; inserts outside all ranges
    assert r["files_rewritten"] == 1 and r["files_total"] == 3
    out = {
        row["k"]: row["val"]
        for row in TF.read_table_mor(spark, table).collect()
    }
    assert all(out[k] == 0.5 for k in range(1, 6))
    assert all(out[k] == 7.0 for k in range(200, 203))
    assert len(out) == 103


def test_merge_delete_only(spark, table):
    spark.range(95, 99).select(
        F.col("id").alias("k"),
        F.lit(None).cast("double").alias("val"),
    ).createOrReplaceTempView("fsql_del_src")
    format_sql(
        spark,
        "MERGE INTO t USING fsql_del_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE",
        tables={"t": table},
    ).collect()
    keys = {
        row["k"]
        for row in TF.read_table_mor(spark, table).select("k").collect()
    }
    assert keys == set(range(1, 101)) - {95, 96, 97, 98}


def test_merge_rejects_mixed_delete(spark, table):
    with pytest.raises(ValueError, match="cannot combine"):
        format_sql(
            spark,
            "MERGE INTO t USING x AS s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED THEN INSERT *",
            tables={"t": table},
        )


def test_insert_history_optimize_vacuum(spark, table):
    spark.range(500, 510).select(
        F.col("id").alias("k"),
        F.lit(1.0).alias("val"),
    ).createOrReplaceTempView("fsql_ins_test")
    r = format_sql(
        spark,
        "INSERT INTO t SELECT k, val FROM fsql_ins_test",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "INSERT"
    hist = format_sql(
        spark, "DESCRIBE HISTORY t", tables={"t": table}
    )
    assert hist.count() == 5  # create + 3 appends + insert
    ro = format_sql(spark, "OPTIMIZE t", tables={"t": table}).collect()[0]
    assert ro["operation"] == "OPTIMIZE"
    rows = TF.read_table_mor(spark, table).count()
    assert rows == 110
    rv = format_sql(
        spark, "VACUUM t RETAIN 2 VERSIONS", tables={"t": table}
    ).collect()[0]
    assert rv["operation"] == "VACUUM"
    assert TF.read_table_mor(spark, table).count() == 110


def test_conflict_on_stale_expected_version(spark, table):
    head = TF.latest_version(table)
    with pytest.raises(TF.CommitConflict):
        format_sql(
            spark,
            "UPDATE t SET val = 0 WHERE k <= 5",
            tables={"t": table},
            expected_version=head - 1,
        )


def test_unknown_table_and_statement_errors(spark, table):
    with pytest.raises(ValueError, match="unknown table"):
        format_sql(spark, "OPTIMIZE missing", tables={"t": table})
    with pytest.raises(ValueError, match="unrecognized statement"):
        format_sql(spark, "TRUNCATE TABLE t", tables={"t": table})


def test_merge_conditional_delete_cdc_shape(spark, table):
    """WHEN MATCHED AND cond THEN DELETE + UPDATE SET * + INSERT * —
    the delete-flag CDC application: flagged rows delete, the rest
    upsert, unmatched insert."""
    spark.range(1, 9).select(
        F.col("id").alias("k"),
        F.lit(9.0).alias("val"),
        (F.col("id") % 2 == 0).cast("int").alias("is_del"),
    ).unionByName(
        spark.range(300, 302).select(
            F.col("id").alias("k"), F.lit(3.0).alias("val"),
            F.lit(0).alias("is_del"),
        )
    ).createOrReplaceTempView("fsql_cdc_src")
    format_sql(
        spark,
        "MERGE INTO t USING fsql_cdc_src AS s ON t.k = s.k "
        "WHEN MATCHED AND is_del = 1 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"t": table},
    ).collect()
    out = {
        r["k"]: r["val"]
        for r in TF.read_table_mor(spark, table).collect()
    }
    # evens 2,4,6,8 deleted; odds 1,3,5,7 updated; 300,301 inserted
    assert all(k not in out for k in (2, 4, 6, 8))
    assert all(out[k] == 9.0 for k in (1, 3, 5, 7))
    assert out[300] == 3.0 and out[301] == 3.0
    assert len(out) == 100 - 4 + 2


def test_merge_conditional_delete_requires_update_clause(spark, table):
    with pytest.raises(ValueError, match="fallback"):
        format_sql(
            spark,
            "MERGE INTO t USING x AS s ON t.k = s.k "
            "WHEN MATCHED AND is_del = 1 THEN DELETE",
            tables={"t": table},
        )


def test_extract_prune_never_reads_literal_content():
    # a literal containing AND/BETWEEN text must not fabricate bounds
    assert _extract_prune(
        "note = 'x AND k <= 5 AND y'", ["k"]
    ) is None
    assert _extract_prune(
        "note = 'k BETWEEN 1 AND 2' AND k >= 40", ["k"]
    ) == ("k", 40.0, math.inf)
    # literal containing OR text: bailing (None) would also be safe,
    # but masked scanning keeps the genuine conjunct
    assert _extract_prune(
        "note = 'a OR b' AND k <= 7", ["k"]
    ) == ("k", -math.inf, 7.0)


def test_delete_fully_pruned_range_is_a_no_op(spark, table):
    v0 = TF.latest_version(table)
    r = format_sql(
        spark,
        "DELETE FROM t WHERE k >= 5000 AND k <= 6000",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "DELETE"
    assert r["files_rewritten"] == 0
    assert TF.latest_version(table) == v0  # no commit published
    assert TF.read_table_mor(spark, table).count() == 100


def test_merge_using_subquery_with_parens_in_on_and_when(spark, table):
    # ')' inside the ON/WHEN text must not confuse the USING capture
    spark.range(1, 3).select(
        (F.col("id") + 200).alias("k"),
        F.lit(1.5).alias("val"),
    ).createOrReplaceTempView("fsql_paren_src")
    r = format_sql(
        spark,
        "MERGE INTO t USING (SELECT k, val FROM fsql_paren_src "
        "WHERE (k > 0)) AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "MERGE"
    assert TF.read_table_mor(spark, table).count() == 102


def test_merge_not_matched_by_source_delete_full_sync(spark, table):
    # source holds keys 1..50 → full sync deletes 51..100
    spark.range(1, 51).select(
        F.col("id").alias("k"),
        (F.col("id") * 100).cast("double").alias("val"),
    ).createOrReplaceTempView("fsql_sync_src")
    r = format_sql(
        spark,
        "MERGE INTO t USING fsql_sync_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "MERGE"
    got = TF.read_table_mor(spark, table)
    assert got.count() == 50
    assert got.agg(F.max("k")).collect()[0][0] == 50
    # matched rows took the source values
    assert got.filter("k = 1").collect()[0]["val"] == 100.0


def test_merge_not_matched_by_source_update(spark, table):
    spark.range(1, 51).select(
        F.col("id").alias("k"), F.lit(0.0).alias("val")
    ).createOrReplaceTempView("fsql_stale_src")
    r = format_sql(
        spark,
        "MERGE INTO t USING fsql_stale_src AS s ON t.k = s.k "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET val = -1.0",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "MERGE"
    got = TF.read_table_mor(spark, table)
    assert got.count() == 100
    # keys the source lacks (51..100) were flagged; matched keys kept
    assert got.filter("val = -1.0").count() == 50
    assert got.filter("k = 10").collect()[0]["val"] == 100.0


def test_merge_rejects_two_nmbs_clauses(spark, table):
    with pytest.raises(ValueError, match="at most one"):
        format_sql(
            spark,
            "MERGE INTO t USING src ON t.k = src.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET val = 1 "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE",
            tables={"t": table},
        )


def test_alter_rename_column_routes(spark, table):
    r = format_sql(
        spark,
        "ALTER TABLE t RENAME COLUMN val TO price",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "ALTER"
    got = TF.read_table(spark, table)
    assert "price" in got.columns and "val" not in got.columns
    assert got.count() == 100
    # the router's UPDATE on a renamed table works WITHOUT compaction
    # (round 15: the rewriters are era-aware)
    r2 = format_sql(
        spark,
        "UPDATE t SET price = price + 1 WHERE k <= 3",
        tables={"t": table},
    ).collect()[0]
    assert r2["operation"] == "UPDATE"
    got2 = TF.read_table(spark, table)
    assert got2.filter("k <= 3").agg(
        F.sum("price")
    ).collect()[0][0] == sum(i * 10 + 1 for i in (1, 2, 3))
    assert got2.count() == 100


def test_alter_widen_column_routes(spark, table):
    r = format_sql(
        spark,
        "ALTER TABLE t ALTER COLUMN k TYPE bigint",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "ALTER"
    got = TF.read_table(spark, table)
    assert dict(got.dtypes)["k"] == "bigint"
    assert got.count() == 100


def test_select_route_registers_views_and_reads(spark, table):
    got = format_sql(
        spark,
        "SELECT COUNT(*) AS n, CAST(SUM(val) AS DOUBLE) AS s FROM t",
        tables={"t": table},
    ).collect()[0]
    assert got["n"] == 100
    assert got["s"] == float(sum(i * 10 for i in range(1, 101)))
    # WITH-prefixed reads route the same way
    got2 = format_sql(
        spark,
        "WITH big AS (SELECT * FROM t WHERE k > 90) "
        "SELECT COUNT(*) AS n FROM big",
        tables={"t": table},
    ).collect()[0]
    assert got2["n"] == 10


def test_select_route_drops_its_temp_views(spark, table):
    """The SELECT/WITH route used to leak a session-scoped temp view
    per tables= key; a leaked view would later shadow same-named
    sources resolved by spark.table() in MERGE USING or user code.
    The views are dropped in a finally block — and because analysis
    resolves them into the returned plan, the result stays
    collectable after the drop."""
    df = format_sql(
        spark,
        "SELECT COUNT(*) AS n FROM leakcheck_t",
        tables={"leakcheck_t": table},
    )
    assert not any(
        v.name == "leakcheck_t" for v in spark.catalog.listTables()
    )
    assert df.collect()[0]["n"] == 100  # still executable post-drop
    # a failing statement must also clean up (finally path)
    with pytest.raises(Exception):
        format_sql(
            spark,
            "SELECT no_such_col FROM leakcheck_t",
            tables={"leakcheck_t": table},
        ).collect()
    assert not any(
        v.name == "leakcheck_t" for v in spark.catalog.listTables()
    )


def test_select_version_as_of_time_travel(spark, table, tmp_path):
    """Delta-style SQL time travel: ``t VERSION AS OF n`` reads the
    pinned snapshot while bare ``t`` in the SAME statement reads the
    head — the rewrite pins per-occurrence, not per-session."""
    head = TF.latest_version(table)
    format_sql(
        spark,
        "DELETE FROM t WHERE k <= 10",
        tables={"t": table},
    )
    got = format_sql(
        spark,
        f"SELECT (SELECT COUNT(*) FROM t) AS now_n, "
        f"(SELECT COUNT(*) FROM t VERSION AS OF {head}) AS then_n",
        tables={"t": table},
    ).collect()[0]
    assert got["now_n"] == 90 and got["then_n"] == 100
    # literal content must never be read as a travel clause
    lit = format_sql(
        spark,
        f"SELECT 't VERSION AS OF {head}' AS s, COUNT(*) AS n FROM t "
        f"GROUP BY s",
        tables={"t": table},
    ).collect()[0]
    assert lit["n"] == 90 and str(head) in lit["s"]


def test_ctas_creates_new_root(spark, table, tmp_path):
    """CREATE TABLE ... AS SELECT materializes into a new root; the
    new table is immediately readable/mutable through the router, and
    a second CTAS on the same root refuses."""
    new_root = str(tmp_path / "ctas_tbl")
    r = format_sql(
        spark,
        "CREATE TABLE big AS SELECT k, val FROM t WHERE k > 50",
        tables={"t": table, "big": new_root},
    ).collect()[0]
    assert r["operation"] == "CREATE TABLE AS SELECT"
    got = format_sql(
        spark,
        "SELECT COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS s FROM big",
        tables={"big": new_root},
    ).collect()[0]
    assert got["n"] == 50
    assert got["s"] == sum(i * 10 for i in range(51, 101))
    # stats recorded -> manifest pruning works on the new table
    _, n_kept, n_total = TF.snapshot_files(
        new_root, prune=("k", 200, 300)
    )
    assert n_kept == 0 and n_total > 0
    with pytest.raises(ValueError, match="already exists"):
        format_sql(
            spark,
            "CREATE TABLE big AS SELECT k FROM t",
            tables={"t": table, "big": new_root},
        )


def test_router_adversarial_statements(spark, table):
    """Robustness sweep: statements crafted to confuse the shape
    regexes either execute with the DOCUMENTED semantics or raise a
    clean ValueError — never silently misroute.  Quote-masked spans
    must keep SQL keywords inside string literals inert."""
    # WHERE text inside a SET literal must not leak into prune
    # extraction or split the SET list
    r = format_sql(
        spark,
        "UPDATE t SET val = CASE WHEN 'WHERE k BETWEEN 1 AND 5, x' "
        "IS NOT NULL THEN 999.0 ELSE val END WHERE k = 1",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "UPDATE"
    got = format_sql(
        spark, "SELECT val FROM t WHERE k = 1", tables={"t": table}
    ).collect()
    assert got[0]["val"] == 999.0
    # DELETE without WHERE: refuse (the full-table footgun), not a
    # silent wipe
    with pytest.raises(ValueError, match="unrecognized"):
        format_sql(spark, "DELETE FROM t", tables={"t": table})
    # INSERT ... VALUES is not the documented subset: clean refusal
    with pytest.raises(ValueError, match="unrecognized"):
        format_sql(
            spark, "INSERT INTO t VALUES (1, 2)", tables={"t": table}
        )
    # garbage: clean refusal
    with pytest.raises(ValueError, match="unrecognized"):
        format_sql(spark, "FROBNICATE t", tables={"t": table})
    # unknown table name: names the known keys
    with pytest.raises(ValueError, match="unknown table"):
        format_sql(
            spark, "OPTIMIZE nosuch", tables={"t": table}
        )
    # VERSION AS OF on an UNKNOWN identifier inside SELECT is left
    # verbatim for Spark to reject (never silently pinned)
    with pytest.raises(Exception):
        format_sql(
            spark,
            "SELECT COUNT(*) FROM ghost VERSION AS OF 1",
            tables={"t": table},
        ).collect()


def test_select_route_refuses_to_clobber_user_temp_view(spark, table):
    """Advisor repro (round 14): the SELECT route's CREATE OR REPLACE
    + finally-drop would silently DESTROY a pre-existing user temp
    view sharing a tables= name.  It now refuses up front with a
    clear error and the user's view survives untouched."""
    spark.range(3).createOrReplaceTempView("mine_t")
    try:
        with pytest.raises(ValueError, match="already exist"):
            format_sql(
                spark,
                "SELECT COUNT(*) AS n FROM mine_t",
                tables={"mine_t": table},
            )
        # the user's view is intact (neither replaced nor dropped)
        assert spark.table("mine_t").count() == 3
    finally:
        spark.catalog.dropTempView("mine_t")


def test_version_pin_view_name_collision_refuses(spark, table, tmp_path):
    """A caller mapping a table literally named like a pinned view
    (``t__v1``) used to have its root silently replaced by the
    time-travel view of ``t`` — wrong data, no error.  Now raises."""
    other = str(tmp_path / "other_root")
    TF.create_table(other)
    TF.commit_append(
        spark, other,
        spark.range(5).selectExpr("id as k", "cast(id as double) as val"),
        stat_cols=["k"],
    )
    with pytest.raises(ValueError, match="collides"):
        format_sql(
            spark,
            "SELECT COUNT(*) AS n FROM t VERSION AS OF 1, t__v1",
            tables={"t": table, "t__v1": other},
        )


def test_ctas_over_partially_created_root(spark, table, tmp_path):
    """A root whose _log directory exists but holds NO commit json (a
    crashed create) used to surface FileNotFoundError('no commit log')
    from the existence probe; CTAS now treats it as non-existent and
    creates the table."""
    import os

    root = str(tmp_path / "partial_root")
    os.makedirs(os.path.join(root, "_log"))  # dir, no 0.json
    r = format_sql(
        spark,
        "CREATE TABLE fresh AS SELECT k, val FROM t WHERE k <= 5",
        tables={"t": table, "fresh": root},
    ).collect()[0]
    assert r["operation"] == "CREATE TABLE AS SELECT"
    assert TF.read_table(spark, root).count() == 5


def test_merge_unconsumed_when_clause_raises(spark, table):
    """Round 15 (found by end-to-end drive): a MERGE whose WHEN clause
    the shape regexes do NOT support — per-column ``UPDATE SET col =
    expr`` instead of the documented full-row ``UPDATE SET *`` — used
    to be silently DROPPED: with an INSERT * clause also present the
    statement committed as insert-only and matched rows silently kept
    their target values.  Unconsumed WHEN text now raises."""
    with pytest.raises(ValueError, match="unsupported MERGE WHEN"):
        format_sql(
            spark,
            "MERGE INTO t USING (SELECT 5 AS k, CAST(1.5 AS DOUBLE) "
            "AS val) s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET val = s.val "
            "WHEN NOT MATCHED THEN INSERT *",
            tables={"t": table},
        )
    # the documented full-row shape still routes
    r = format_sql(
        spark,
        "MERGE INTO t USING (SELECT CAST(5 AS BIGINT) AS k, "
        "CAST(1.5 AS DOUBLE) AS val) s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"t": table},
    ).collect()[0]
    assert r["operation"] == "MERGE"
    assert TF.read_table(spark, table).filter("k = 5").collect()[0][
        "val"
    ] == 1.5
