"""Stream–stream interval join.

The reference feeds a downstream Joiner (`TableStreamingSource.java:49-51`)
but only ever supplies the *static* side; joining two live streams is the
capability its host framework reserves for itself.  Structured Streaming
implements it natively as a symmetric hash join: both sides are buffered
in keyed state, each arriving row probes the opposite buffer, and the
event-time range condition plus watermarks bound how much state is
retained (state for a left row is freed once the watermark passes
``left.ts + upper_bound``).

Scale shape: state is partitioned by the join key, so a 1000-executor
cluster holds ``state/1000`` per node; the watermark delay is the knob
that trades completeness against state size.  With the RocksDB state
store provider (see ``docs/SCALE.md`` §10) the buffers spill off-heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    upper_bound: str,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join two streaming DataFrames on ``key`` where
    ``left_ts <= right_ts <= left_ts + upper_bound``.

    ``how`` is ``inner``, ``left_outer``, or ``full_outer``.  Outer
    emission is watermark-driven: an unmatched row is emitted (with
    nulls) only once the watermark passes its eviction bound — in a
    bounded replay, advance the watermark past the data (e.g. a
    sentinel row) or the unmatched rows stay buffered forever.  Under
    ``full_outer`` the kept ``key`` column is the COALESCE of both
    sides (right-only rows would otherwise carry a null left key).
    Beware predicate pushdown
    when draining: a post-join filter that references pre-join columns
    is pushed into the source scan and will eat such sentinels (filter
    the *sink output* instead).

    Both sides get ``watermark`` as their event-time watermark — it must
    be at least the expected disorder of the input; rows later than the
    watermark are dropped and buffered state older than
    ``watermark + upper_bound`` is reclaimed.  For a bounded replay where
    completeness is asserted (tests, oracles), pass a watermark longer
    than the stream's whole time span: the join is then exactly the batch
    interval join.

    Column collision rule: ``key`` is kept once (from the left); all other
    columns must already be disambiguated by the caller.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"unsupported interval join type: {how!r}")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper_bound}"))
    )
    joined = lw.join(rw, cond, how)
    if how == "full_outer":
        return joined.select(
            F.coalesce(lw[key], rw[key]).alias(key),
            *[lw[c] for c in left.columns if c != key],
            *[rw[c] for c in right.columns if c != key],
        )
    return joined.drop(rw[key])
