"""Read-lineage extraction (reference A9, `TableStreamingSource.java:88`):
the plan's scan set is the lineage, post-pruning."""

from pyspark.sql import functions as F

from table_streaming_source_spark.io import load_table
from table_streaming_source_spark.lineage import read_paths, register_lineage


def test_read_paths_lists_every_scanned_fixture(spark, sf_dir):
    from table_streaming_source_spark.io import clear_snapshot_cache

    clear_snapshot_cache(spark)  # observe real FileScans, not cache hits
    c = load_table(spark, sf_dir, "customer", cached=False)
    n = load_table(spark, sf_dir, "nation", cached=False)
    j = c.join(n, c.c_nationkey == n.n_nationkey).select("c_name", "n_name")
    got = read_paths(j)
    assert any("customer.parquet" in p for p in got)
    assert any("nation.parquet" in p for p in got)
    assert len(got) == 2


def test_register_lineage_passthrough(spark, sf_dir):
    from table_streaming_source_spark.io import clear_snapshot_cache

    clear_snapshot_cache(spark)
    registry: list[str] = []
    df = register_lineage(
        load_table(spark, sf_dir, "region", cached=False), registry
    )
    assert df.count() > 0  # unchanged frame
    assert any("region.parquet" in p for p in registry)
