"""Unit coverage for the from-scratch Thrift-compact parquet footer
reader (`sources/parquet_footer.py`) — cross-validated against pyarrow's
own metadata object (an independent implementation of the same public
format), including a multi-row-group file, which the fixture tables
don't exercise."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from table_streaming_source_spark.sources.parquet_footer import (
    parse_footer,
    read_footer,
)


@pytest.fixture(scope="module")
def multi_rowgroup_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pqf") / "multi.parquet")
    tbl = pa.table(
        {
            "a": pa.array(range(10_000), type=pa.int64()),
            "b": pa.array([f"s{i % 97}" for i in range(10_000)]),
            "c": pa.array([i / 7.0 for i in range(10_000)]),
        }
    )
    pq.write_table(tbl, path, row_group_size=1024)
    return path


def test_footer_matches_pyarrow(multi_rowgroup_file):
    fi = read_footer(multi_rowgroup_file)
    md = pq.ParquetFile(multi_rowgroup_file).metadata
    assert fi.num_rows == md.num_rows == 10_000
    assert fi.n_row_groups == md.num_row_groups
    assert fi.n_row_groups == 10  # 10_000 / 1024 → 10 groups
    assert fi.n_leaf_columns == md.num_columns == 3
    assert fi.rowgroup_rows_sum == md.num_rows
    assert fi.created_by == md.created_by
    assert fi.version in (1, 2)


def test_fixture_tables_num_rows():
    import duckdb

    con = duckdb.connect()
    for name in ("region", "nation", "supplier", "documents"):
        path = f"/root/testdata/sf0.001/{name}.parquet"
        fi = read_footer(path)
        truth = con.execute(f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        assert fi.num_rows == truth
        assert fi.rowgroup_rows_sum == truth
        assert fi.n_row_groups >= 1


def test_nested_schema_leaf_count(tmp_path):
    # structs nest in the flattened SchemaElement list: num_children on
    # the group node, leaves counted beneath it
    path = str(tmp_path / "nested.parquet")
    tbl = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "s": pa.array(
                [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}],
                type=pa.struct([("x", pa.int32()), ("y", pa.string())]),
            ),
        }
    )
    pq.write_table(tbl, path)
    fi = read_footer(path)
    md = pq.ParquetFile(path).metadata
    assert fi.n_leaf_columns == md.num_columns  # 3 leaves: id, s.x, s.y
    assert fi.num_rows == 2


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_footer(str(p))


def test_truncated_footer_raises(multi_rowgroup_file, tmp_path):
    raw = open(multi_rowgroup_file, "rb").read()
    with pytest.raises(Exception):
        parse_footer(raw[-100:-8])  # mid-struct slice → malformed
