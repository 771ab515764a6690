"""Distributed fixture materialization for the source-format entries.

Every ``source_*`` oracle entry round-trips a driver table through a
from-scratch file format before parsing it back.  The MEASURED operator
is the parse; the fixture write is prep — but prep must not be a
corpus-proportional ``.toPandas()`` round-trip through the driver
(round-8 verdict: the ``source_python_batch`` fixture got the
distributed treatment; this module generalizes it to every sharded
fixture writer).

:func:`write_sharded` keeps the write on the executors: rows hash to
their shard (``key % n_shards``) with one exchange, each task writes
its residue groups through the caller's plain-Python ``write_shard``
callback (the same per-format writers the parsers are tested against),
and the driver sees ONE summary row per shard — O(shards), never
O(rows).  Writes land on a filesystem all tasks share (local[n] here;
a cluster would point at the shared scratch volume), exactly like any
file sink.

Determinism contract: within a shard, rows are sorted by ``key`` before
the callback — the same order the old global-sort-then-filter driver
loop produced, byte-identical fixture files."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def write_sharded(
    df: DataFrame,
    *,
    key: str,
    n_shards: int,
    write_shard: Callable,
) -> int:
    """Write ``df`` as ``n_shards`` fixture files on the executors.

    ``write_shard(shard: int, pdf: pandas.DataFrame)`` is called once
    per residue class ``key % n_shards`` with that shard's rows sorted
    by ``key`` (the ``__shard`` helper column already dropped).  Each
    residue hashes to exactly one partition, so no two tasks ever
    write the same shard.  Returns the total row count written (the
    action that forces the job)."""
    from pyspark.sql import functions as F

    part = df.withColumn(
        "__shard", F.pmod(F.col(key), F.lit(n_shards)).cast("int")
    ).repartition(n_shards, "__shard")

    def _write(batches):
        import pandas as pd

        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for shard, grp in pdf.groupby("__shard"):
            rows = grp.sort_values(key).drop(columns="__shard")
            rows = rows.reset_index(drop=True)
            write_shard(int(shard), rows)
            yield pd.DataFrame(
                {"shard": [int(shard)], "rows": [len(rows)]}
            )

    summary = part.mapInPandas(_write, "shard int, rows bigint")
    return sum(r["rows"] for r in summary.collect())
