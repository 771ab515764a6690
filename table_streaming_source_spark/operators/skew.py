"""Skew-mitigation operators: salted join and two-phase salted
aggregation (docs/SCALE.md §11).

AQE's skew-join splitting handles moderate skew automatically; these
helpers are for the pathological shapes it can't — a handful of keys
holding most of the data, where even a split partition's *build* side
replication is the answer (salted join), or a hot grouping key whose
partial aggregation still funnels into one reducer (salted agg).

Both are pure plan rewrites over built-ins: deterministic salt from a
row-content hash (no RNG — results and retries are reproducible), the
small side replicated ``salt`` times via ``explode``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``salt``
    sub-keys and ``small`` is replicated ``salt`` times.

    Each skewed row gets a deterministic salt from a hash of its full row
    content (`xxhash64` — partitioning-independent, so retries and AQE
    re-plans see the same assignment); the join key becomes
    ``(on..., salt)``, splitting each hot key's partition ``salt`` ways at
    the cost of a ``salt``× blow-up of the small side.  Semantically
    identical to ``skewed.join(small, on, how)``.

    Use when one key dominates; for the general case prefer AQE skew-join
    (on by default in :func:`~table_streaming_source_spark.session.get_spark`).
    """
    on = list(on)
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), salt)
    left = skewed.withColumn("__salt", salt_col.cast("int"))
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left.join(right, on + ["__salt"], how).drop("__salt")


_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}
# counts re-combine by summation; the rest by their own function
_FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial aggregate on
    ``(keys, salt)``, then final aggregate on ``keys``.

    ``aggs`` maps output name → ``(fn, column)`` with ``fn`` one of
    ``sum/count/min/max`` — the algebraic aggregates that survive
    two-phase composition (count re-combines by summation).  Catalyst's
    own partial aggregation usually makes this unnecessary — the win
    appears when a single hot key floods one reducer even after map-side
    combine, or when composing with operators that break partial
    aggregation.
    """
    keys = list(keys)
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(
                f"agg {name!r}: {fn!r} is not algebraic "
                f"(supported: {sorted(_PARTIAL)})"
            )
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), salt)
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _PARTIAL[fn](col).alias(name)
                for name, (fn, col) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _FINAL[fn](name).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
