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
