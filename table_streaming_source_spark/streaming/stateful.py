"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2B "Stateful ops") — the extension point for per-key streaming
state that watermarked built-ins can't express.

Scale: state lives in the state store keyed by the group columns — bounded
by key cardinality × state size, not stream length; with the RocksDB state
store provider it spills off-heap.  Each micro-batch touches only keys
present in the batch.  The operator below keeps one (count, sum, last_ts)
triple per key — O(1) state per key, the shape any custom accumulator
should follow (store aggregates, never raw events).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "n LONG, cents LONG"
_OUTPUT_SCHEMA = "user_id LONG, n LONG, total DOUBLE"


def _accumulate(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Running (count, sum) per key across micro-batches.

    The sum accumulates in integer cents: double addition is not
    associative, and batch/row order is an execution detail — integer
    state makes the emitted totals bit-identical under any batching,
    which is what lets a value oracle check the drained stream."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "total": [cents / 100.0]}
    )


def running_totals_stream(
    stream: DataFrame,
    *,
    key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) over an unbounded stream — a custom
    stateful accumulator on ``applyInPandasWithState``.

    Emits the updated running totals for every key seen in each
    micro-batch (update-style output); the *final* emission per key equals
    the batch ``groupBy(key).agg(count, sum)`` — which is how the tests
    check it.  Built-in alternatives cover the common cases
    (``window``/``session_window`` aggregation, ``dropDuplicates``); this
    operator is the template for semantics they can't express (decaying
    counters, custom sessionization, enrichment caches).
    """
    return (
        stream.selectExpr(f"{key} AS user_id", f"{value} AS value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_SESS_GAP_MS = 30 * 60 * 1000
_SESS_STATE_SCHEMA = "start_us LONG, last_us LONG, n LONG, cents LONG"
_SESS_OUTPUT_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, n_events LONG, sum_value DOUBLE"
)


def _session_frame(key, sessions):
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": pd.Series([key] * len(sessions), dtype="int64"),
            "session_start": pd.to_datetime(
                pd.Series([s[0] for s in sessions], dtype="int64") * 1000
            ),
            "n_events": pd.Series([s[1] for s in sessions], dtype="int64"),
            "sum_value": pd.Series(
                [s[2] / 100.0 for s in sessions], dtype="float64"
            ),
        }
    )


def _sessionize(key, pdfs, state: GroupState):
    """Gap-based sessionization in custom state with **event-time
    timeouts**: sessions closed by a later event are emitted in the batch
    that observes the gap; the open tail session lives in state with a
    timeout at ``last_ts + gap``, and is emitted by the state store when
    the watermark passes it (strictly — boundary verified empirically).
    State per key is one (start, last, n, cents) tuple — O(1), never raw
    events; sums accumulate in integer cents so emissions are
    bit-identical under any batching.

    Late tolerance (ADVICE round 3): an above-watermark straggler from an
    earlier batch may carry ``t < last_us``.  The state is late-tolerant:

    * ``start_us - gap ≤ t ≤ last_us + gap`` → merge into the open
      session, with ``start_us = min(start_us, t)`` and
      ``last_us = max(last_us, t)`` — the timeout horizon never moves
      backward and the session start reflects the true earliest event;
    * ``t < start_us - gap`` → resolved in a post-pass: straggler chains
      reaching within one gap of the batch's final session start merge
      into the open session; the rest fold among themselves by the gap
      rule and emit as closed sessions (see :func:`_advance_session`);
    * ``t > last_us + gap`` → normal gap close, new session starts.
    """
    import pandas as pd

    if state.hasTimedOut:
        start_us, last_us, n, cents = state.get
        state.remove()
        yield _session_frame(key[0], [(start_us, n, cents)])
        return

    pdf = pd.concat(list(pdfs)).sort_values("ts")
    ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    cents_arr = (
        (pdf["value"] * 100).round().astype("int64").to_numpy()
    )
    prior = state.get if state.exists else None
    closed, tup = _advance_session(prior, ts_us, cents_arr)
    state.update(tup)
    state.setTimeoutTimestamp(tup[1] // 1000 + _SESS_GAP_MS)
    yield _session_frame(key[0], closed)


def _advance_session(prior, ts_us, cents_arr):
    """The session state machine shared by BOTH stateful APIs
    (``applyInPandasWithState`` and ``transformWithStateInPandas``) —
    one implementation, so the modern-API twin is identical by
    construction.  ``prior`` is the stored ``(start_us, last_us, n,
    cents)`` tuple or ``None``; returns ``(closed_sessions, new_state)``
    with closed sessions as ``(start_us, n, cents)`` triples.

    Stragglers (events more than one gap before the open session's
    start) are COLLECTED during the scan and resolved in a post-pass
    against the batch's FINAL open-session start: any straggler chain
    reaching within one gap of the start merges into the open session
    (largest-first, so within-gap chains cascade correctly), and the
    rest fold among THEMSELVES by the same gap rule before emitting —
    two stragglers one second apart emit as one 2-event session, not
    two singletons."""
    gap_us = _SESS_GAP_MS * 1000
    if prior is not None:
        start_us, last_us, n, cents = (int(v) for v in prior)
    else:
        start_us, last_us, n, cents = 0, 0, 0, 0
    closed = []
    stale = []
    for t, c in zip(ts_us, cents_arr):
        t = int(t)
        if n == 0:
            start_us, last_us, n, cents = t, t, 1, int(c)
        elif t - last_us > gap_us:
            closed.append((start_us, n, cents))
            start_us, last_us, n, cents = t, t, 1, int(c)
        elif start_us - t > gap_us:
            stale.append((t, int(c)))
        else:
            start_us = min(start_us, t)
            last_us = max(last_us, t)
            n, cents = n + 1, cents + int(c)
    if stale:
        # largest-first: each merge moves start_us down, letting a
        # within-gap chain of stragglers cascade into the open session
        rest = []
        for t, c in sorted(stale, reverse=True):
            if n and start_us - t <= gap_us:
                start_us = t
                n, cents = n + 1, cents + c
            else:
                rest.append((t, c))
        # remaining stragglers fold among themselves (ascending)
        cur = None
        for t, c in sorted(rest):
            if cur is not None and t - cur[3] <= gap_us:
                cur = (cur[0], cur[1] + 1, cur[2] + c, t)
            else:
                if cur is not None:
                    closed.append(cur[:3])
                cur = (t, 1, c, t)
        if cur is not None:
            closed.append(cur[:3])
    return closed, (start_us, last_us, n, cents)


def timeout_sessions_stream(
    stream: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Custom sessionization on ``applyInPandasWithState`` with
    ``GroupStateTimeout.EventTimeTimeout`` — the stateful surface
    ``session_window`` can't express: arbitrary per-session state plus
    watermark-driven state EVICTION through timeouts (close callbacks,
    decaying state, enrichment caches all follow this template).

    Requires TIMESTAMP event time with a watermark on ``ts``.  Rows below
    the watermark are dropped like every stateful operator's; rows ABOVE
    the watermark but behind the per-key state (cross-batch stragglers)
    are handled late-tolerantly — merged into the open session when
    within the gap of either end (session start/end expand to cover
    them; the timeout horizon never shrinks), folded among themselves
    into closed sessions when older than the open session by more than
    the gap (see ``_sessionize``)."""
    return (
        stream.selectExpr(
            f"{key} AS user_id", f"{ts} AS ts", f"{value} AS value"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=_SESS_OUTPUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def timeout_sessions_stream_tws(
    stream: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`timeout_sessions_stream` — the Spark 4.x arbitrary-state API
    the platform is converging on (SPARK-45939 lineage: named state
    variables, first-class timers, TTL) expressing the SAME gap
    sessionization.  Both operators drive the one shared state machine
    (:func:`_advance_session`), so their session output is identical by
    construction; the differences are purely API-surface:

    * state lives in a named ``ValueState`` instead of the single
      implicit tuple;
    * the session-close callback is a registered event-time TIMER
      (``handleExpiredTimer``) instead of ``GroupStateTimeout`` +
      ``state.hasTimedOut`` — re-registration must delete the prior
      timer explicitly (timers accumulate; the legacy API's
      ``setTimeoutTimestamp`` replaced it implicitly);
    * requires the RocksDB state store provider (the HDFS-backed store
      does not implement the new operator's column families).

    Same contract as the legacy twin: TIMESTAMP event time with a
    watermark on ``ts``; below-watermark rows are dropped, above-
    watermark stragglers merge late-tolerantly via the shared machine.

    Environment gate: the transformWithStateInPandas Python worker
    requires ``google.protobuf`` (Spark's named-state wire protocol).
    This sandbox does not ship protobuf, so the operator is exercised by
    an importorskip-gated e2e test and excluded from the driver catalog;
    on a standard cluster (protobuf ships with every Spark distribution)
    it runs as-is.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", _SESS_STATE_SCHEMA)

        def handleInputRows(self, key_, rows, timerValues):
            import pandas as pd

            pdf = pd.concat(list(rows)).sort_values("ts")
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            cents_arr = (
                (pdf["value"] * 100).round().astype("int64").to_numpy()
            )
            prior = self._state.get() if self._state.exists() else None
            closed, tup = _advance_session(prior, ts_us, cents_arr)
            self._state.update(tup)
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(tup[1] // 1000 + _SESS_GAP_MS)
            yield _session_frame(key_[0], closed)

        def handleExpiredTimer(self, key_, timerValues, expiredTimerInfo):
            if self._state.exists():
                start_us, last_us, n, cents = self._state.get()
                self._state.clear()
                yield _session_frame(key_[0], [(start_us, n, cents)])

        def close(self) -> None:
            pass

    return (
        stream.selectExpr(
            f"{key} AS user_id", f"{ts} AS ts", f"{value} AS value"
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            _SessionProcessor(),
            outputStructType=_SESS_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
