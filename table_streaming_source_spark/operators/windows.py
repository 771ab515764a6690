"""Time-window operators usable in both batch and streaming plans.

Tumbling/sliding windows are Spark's ``F.window``; session windows are
``F.session_window``.  Both work unchanged in Structured Streaming with a
watermark (see streaming.pipeline).  ``sessionize`` additionally provides
the explicit gaps-and-islands formulation — same semantics, useful when a
downstream needs the session id on every event row rather than the
collapsed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    ts_col: str,
    key: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign a session id to every event: a new session starts when the
    gap to the previous event of the same ``key`` exceeds ``gap``.

    Equivalent to ``F.session_window`` but keeps event granularity.
    The two shuffles (window partitionBy key) collapse into one exchange —
    both windows share the same partitioning.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr)
    ).cast("int")
    return df.withColumn("__new_session", new_session).withColumn(
        "session_seq",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__new_session")


def session_aggregate(
    df: DataFrame,
    *,
    ts_col: str,
    key: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Collapsed per-session aggregate via gaps-and-islands:
    ``(key, session_start, session_end, n_events)``."""
    s = sessionize(df, ts_col=ts_col, key=key, gap=gap)
    return s.groupBy(key, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
