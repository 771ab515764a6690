"""Arrow-vectorized pandas UDFs, a grouped-agg pandas UDAF, and a Python
UDTF — the user-extension surface of the engine.

The reference has no UDF mechanism (its host pipeline supplies transforms
downstream of the snapshot source, `TableStreamingSource.java:49-51`); this
is part of the operator surface our engine provides natively (SURVEY.md
§2B).  Every function here documents the JVM-native expression a user
should prefer when the logic is expressible in builtins — Python is the
extension point, not the hot path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def discounted_revenue(
    price: pd.Series, discount: pd.Series, tax: pd.Series
) -> pd.Series:
    """Vectorized scalar pandas UDF: ``price·(1-discount)·(1+tax)``.

    Arrow-batched; arithmetic runs on numpy float64 arrays, so results are
    bit-identical to the JVM expression ``l_extendedprice * (1 -
    l_discount) * (1 + l_tax)`` (IEEE-754 per element, no reordering) —
    which is also what a user should write instead when, as here, the
    logic is pure arithmetic.
    """
    return price * (1.0 - discount) * (1.0 + tax)


@pandas_udf("double")
def weighted_avg(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas UDAF: ``Σ(value·weight) / Σ(weight)``.

    Used inside ``groupBy(...).agg(weighted_avg(col, w))``.  Spark feeds
    each group's full column as one pandas Series (no partial aggregation
    — the group's rows are shuffled to one task, unlike builtin aggregates
    which combine map-side).  Prefer ``sum(v*w)/sum(w)`` in builtins for
    the partial-agg plan; this exists to prove the UDAF surface.  Float
    summation order varies with partitioning, so oracle comparisons round
    the result.
    """
    num = float((value * weight).sum())
    den = float(weight.sum())
    return num / den if den != 0.0 else float("nan")


@udtf(returnType="pos int, token string")
class Tokenize:
    """Python UDTF: explode text into (position, token) rows via a lateral
    join — the table-function extension point (Spark 4 ``@udtf``).

    Equivalent JVM-native plan (preferred for plain tokenization):
    ``select(posexplode(split(trim(text), '\\s+')))``.  A real use case
    puts logic here that builtins can't express (custom tokenizers, BPE).
    """

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(t for t in re.split(r"\s+", text.strip()) if t):
            yield i, tok


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use (``LATERAL tokenize(text)``)."""
    spark.udtf.register("tokenize", Tokenize)
