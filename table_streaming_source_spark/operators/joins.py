"""Join operators beyond plain ``df.join``: as-of (point-in-time) join.

Spark has no native as-of join; we compose one from an equi/range join plus
a per-left-row window top-1 — all Catalyst built-ins, so predicate pushdown
and AQE still apply (SURVEY.md §2B "Joins — theta/range/interval/as-of").

Scale notes (100 TB): the range condition makes the join a *band* join; at
scale the win is to keep the equi-key (`on`) in the condition so Spark uses
a shuffled hash / sort-merge join partitioned by that key rather than a
nested-loop.  The window that follows re-uses the same hash partitioning
(partitionBy includes the left key), so AQE coalesces without an extra
shuffle of the joined relation.  For highly skewed keys enable AQE skew-join
(on by default in our session factory).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    *,
    tolerance: Optional[str] = None,
    right_tiebreakers: Sequence[str] = (),
    how: str = "inner",
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right_time <= left_time`` (``<`` when ``strict``) sharing the
    equi-key ``on``.

    ``tolerance`` (an INTERVAL string like ``'30 days'``) additionally
    requires ``right_time >= left_time - tolerance`` — which also bounds the
    band-join's blow-up at scale.  ``right_tiebreakers`` make the pick
    deterministic when several right rows share the as-of time.
    ``how='left'`` keeps unmatched left rows with nulls.  ``strict`` is the
    self-as-of mode (previous row, excluding simultaneous ones).
    """
    on = list(on)
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on] + [
        rt < lt if strict else rt <= lt
    ]
    if tolerance is not None:
        cond.append(rt >= lt - F.expr(f"INTERVAL {tolerance}"))

    # unique left-row id so duplicate left rows each keep their match
    l = left.withColumn("__lid", F.monotonically_increasing_id()).alias("l")
    r = right.alias("r")
    joined = l.join(r, cond, "left" if how == "left" else "inner")

    # deterministic top-1 per left row: latest right_time, then tiebreakers
    order = [F.col(f"r.{right_time}").desc()] + [
        F.col(f"r.{c}").desc() for c in right_tiebreakers
    ]
    w = Window.partitionBy(F.col("l.__lid")).orderBy(*order)
    ranked = joined.withColumn("__rn", F.row_number().over(w))

    right_cols = [
        F.col(f"r.{c}").alias(c + suffix if c in left.columns else c)
        for c in right.columns
    ]
    return (
        ranked.filter(F.col("__rn") == 1)
        .select([F.col(f"l.{c}").alias(c) for c in left.columns] + right_cols)
    )
