"""Shared expression/plan helpers for operators."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: memoized partition counts keyed by (session id, analyzed-plan semantic
#: hash): ``df.rdd`` builds a physical plan + RDD DAG per call, which is
#: pure overhead when the same logical input is probed repeatedly
#: (k-means iterations, multi-branch dedup plans)
_SPREAD_NPART_CACHE: dict[tuple[int, int], int] = {}


def spread(df: DataFrame, parallelism: Optional[int] = None) -> DataFrame:
    """Round-robin repartition before CPU-heavy row-local compute — only
    when the input is underparallelized.

    Single-file fixture tables arrive as one input partition; per-row
    signature/dot-product work then runs on one core.  If the input is
    already spread (e.g. a cached snapshot from ``io.load_table``), this
    is a no-op — no extra exchange.  At 100 TB inputs arrive in thousands
    of splits and this never fires.  ``parallelism=0`` disables.

    The partition probe (``df.rdd.getNumPartitions()``) materializes a
    physical plan, so its result is memoized per (session, semantic hash)
    — repeat calls on the same logical input are free.
    """
    if parallelism == 0:
        return df
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    try:
        key = (
            id(df.sparkSession._jsparkSession),
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
        nparts = _SPREAD_NPART_CACHE.get(key)
        if nparts is None:
            nparts = df.rdd.getNumPartitions()
            _SPREAD_NPART_CACHE[key] = nparts
        if nparts >= max(2, n // 2):
            return df
    except Exception:
        pass
    return df.repartition(n)


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` exactly once per row and pass the result to ``fn``
    as a higher-order-function lambda variable.

    Catalyst's CollapseProject inlines intermediate projection columns into
    the lambdas that reference them, so an expensive array expression
    "materialized" in its own ``select`` is still re-evaluated once per
    element of any outer ``transform``/``aggregate`` that uses it.  Binding
    through ``transform(array(e), v -> fn(v))[0]`` forces single
    evaluation: ArrayTransform evaluates its argument once, then runs the
    lambda over the one element.
    """
    return F.transform(F.array(expr), fn)[0]


def morton_key(a, b, *, bits: int = 10):
    """Morton (Z-order) interleave of two ``bits``-wide nonnegative
    integer columns: ``a``'s bit *i* lands at position ``2i``, ``b``'s at
    ``2i+1``.  Row-local integer arithmetic; sorting by the result
    co-locates both dimensions for min/max data skipping
    (``tests/test_scale_strategies.py`` proves the pruning on real
    parquet footers)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z
