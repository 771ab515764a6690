"""Streaming tail of the table-format commit log — incremental
processing over `table_format.py` tables (the Delta-streaming-source
pattern): each micro-batch emits exactly the rows introduced by commits
since the last processed version, and the offset IS the commit version,
so replay is deterministic (commits are immutable — unlike a directory
tail, which races in-flight writers).

Contract: append-only tailing.  An append commit's new files are
emitted once; a full-snapshot commit (compaction, copy-on-write merge)
rewrites data, and a change-tailing consumer there needs CDC semantics
(per-row change files) — this source, like Delta's default, is for the
append pipeline and documents that boundary.

Rows flow through the driver (``SimpleDataSourceStreamReader``) via a
pyarrow scan — matching the Spark 4 simple-reader API; a
partition-distributed variant implements ``DataSourceStreamReader`` with
per-file partitions, same offset algebra.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from table_streaming_source_spark import table_format as TF


def _commit_new_files(path: str, version: int) -> list[str]:
    """Data files INTRODUCED by commit ``version``: its file list minus
    its LOGICAL PREDECESSOR's snapshot (the ``parent``, or the ``prev``
    a full-snapshot commit records — never ``version - 1``, which on a
    branched table can belong to a different lineage and would diff two
    unrelated snapshots).  Full-snapshot commits carry forward
    untouched files, which must not re-emit.  MAINTENANCE commits
    (compaction — flagged ``maintenance: true`` in the log) introduce
    no logical rows, only a rewritten layout, so the tail skips them
    entirely: a live reader sees maintenance as a no-op, which is what
    lets OPTIMIZE run against a table that streams are consuming."""
    commit = TF._read_commit(path, version)
    if commit.get("maintenance"):
        return []
    cur = {
        f["path"] for f in TF._snapshot_file_dicts(path, version)
    }
    base = commit["parent"] if commit["parent"] is not None else (
        commit.get("prev")
    )
    prev = (
        {f["path"] for f in TF._snapshot_file_dicts(path, base)}
        if base is not None
        else set()
    )
    return [os.path.join(path, p) for p in sorted(cur - prev)]


def _lineage_commits(path: str, start_v: int, end_v: int) -> list[int]:
    """The commits of ``end_v``'s LINEAGE with version > ``start_v``,
    oldest first — the tail's batch window.  Walking the parent/prev
    chain (instead of ``range(start+1, end+1)``) is what keeps a
    branch's commits out of another branch's tail: versions come from
    one shared namespace, so consecutive integers can interleave
    lineages, but each chain is internally version-monotone."""
    out: list[int] = []
    v: int | None = end_v
    while v is not None and v > start_v:
        commit = TF._read_commit(path, v)
        out.append(v)
        v = commit["parent"] if commit["parent"] is not None else (
            commit.get("prev")
        )
    return sorted(out)


def _scan_rows(files: list[str], schema: StructType) -> list[tuple]:
    import pyarrow.dataset as ds

    if not files:
        return []
    table = ds.dataset(files, format="parquet").to_table(
        columns=list(schema.fieldNames())
    )
    cols = [table.column(n).to_pylist() for n in schema.fieldNames()]
    return list(zip(*cols)) if cols else []


class CommitLogStreamReader(SimpleDataSourceStreamReader):
    """Offset = last processed commit version; a batch is the rows of
    every commit in ``(start, head]``."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]
        # the ref whose lineage this tail follows (Iceberg semantics:
        # you tail a BRANCH).  Default None = main when refs exist,
        # else the linear head — unbranched tables are unchanged.
        self._ref = options.get("ref")

    def initialOffset(self) -> dict:
        return {"version": 0}  # v0 is the empty create-table commit

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        head = TF.resolve_ref(self._path, self._ref)
        rows: list[tuple] = []
        for v in _lineage_commits(self._path, start["version"], head):
            rows.extend(
                _scan_rows(
                    _commit_new_files(self._path, v), self._schema
                )
            )
        return iter(rows), {"version": head}

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        # deterministic replay: commits are immutable and the end
        # offset pins the lineage, so the same window always yields
        # the same rows
        rows: list[tuple] = []
        for v in _lineage_commits(
            self._path, start["version"], end["version"]
        ):
            rows.extend(
                _scan_rows(
                    _commit_new_files(self._path, v), self._schema
                )
            )
        return iter(rows)


class CommitLogDataSource(DataSource):
    """``spark.readStream.format("format_tail")`` — options:

    - ``path``: table-format root (required; must have a ``_log``)
    - ``ref``: branch/tag whose lineage to tail (default: main when
      refs exist, else the linear head)
    """

    @classmethod
    def name(cls) -> str:
        return "format_tail"

    def schema(self):
        import pyarrow.dataset as ds
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        files, _, _ = TF.snapshot_files(path)
        if not files:
            raise ValueError(
                "format_tail: empty table; pass an explicit schema"
            )
        return from_arrow_schema(
            ds.dataset(files, format="parquet").schema
        )

    def simpleStreamReader(
        self, schema: StructType
    ) -> CommitLogStreamReader:
        return CommitLogStreamReader(schema, dict(self.options))


def register_format_tail(spark) -> None:
    spark.dataSource.register(CommitLogDataSource)
