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


def funnel(
    events: DataFrame,
    steps: "list[str]",
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-sequence funnel: for each user, the earliest time of step
    1, then the earliest step-2 event at-or-after it, and so on — the
    conversion-path primitive of event analytics (strictly ordered, so a
    purchase *before* the first view does not count as conversion).

    Shape: one filtered aggregate per step, each joined on the user key;
    every aggregate and join partitions on ``user_col``, so after the
    first shuffle the chain is co-partitioned — step count adds plan
    depth, not new shuffle keys.  The fact table is scanned once per
    step with a pushed-down type predicate (at 100 TB, partition events
    by type or day so each step reads its slice).

    Returns one row per user who reached step 1: ``(user_col,
    t_<step>...)`` with nulls from the first unreached step on, plus
    ``stage`` = number of steps reached.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    t_cols: list[str] = []
    out = None
    for step in steps:
        t_col = f"t_{step}"
        matching = events.filter(F.col(type_col) == step)
        if out is None:
            out = matching.groupBy(
                F.col(user_col).alias(user_col)
            ).agg(F.min(ts_col).alias(t_col))
        else:
            prev = t_cols[-1]
            nxt = (
                matching.join(
                    out.select(user_col, prev),
                    [user_col],
                )
                .filter(F.col(ts_col) >= F.col(prev))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(t_col))
            )
            out = out.join(nxt, [user_col], "left")
        t_cols.append(t_col)
    stage = F.lit(1)
    for t_col in t_cols[1:]:
        stage = stage + F.col(t_col).isNotNull().cast("int")
    return out.select(user_col, *t_cols, stage.cast("int").alias("stage"))
