"""Join operators beyond plain ``df.join``: as-of (point-in-time) join.

Spark has no native as-of join; the scalable formulation is the
**union + ordered window** one: interleave left probes and right events in
one relation partitioned by the equi-key and ordered by time, then carry
the most recent right payload forward with ``last(..., ignorenulls=True)``
(SURVEY.md §2B "Joins — theta/range/interval/as-of").

Scale notes (100 TB): the naive formulation — range join to *all* earlier
right rows, then top-1 per left row — explodes to O(k²) pairs for a key
with k rows and shuffles the exploded relation a second time for the
ranking window.  The union form shuffles each input row exactly once (hash
partition on the key), sorts within partitions, and emits exactly |left|
rows: linear in input, robust to keys with long histories.  Skewed keys
sort within one partition — the one shape AQE cannot split (order matters);
salt the key upstream when a single key's history exceeds task memory.
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
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the as-of right row sharing the
    equi-key ``on``: with ``direction='backward'`` (default) the most
    recent right row with ``right_time <= left_time`` (``<`` when
    ``strict``); ``'forward'`` the earliest right row at-or-after;
    ``'nearest'`` whichever of the two is closer in time (ties →
    backward) — the full pandas ``merge_asof`` direction surface.

    ``tolerance`` (an INTERVAL string like ``'30 days'``) bounds the
    match horizon on the search side (both sides for ``nearest``).
    ``right_tiebreakers`` make the pick deterministic when several right
    rows share the as-of time (the greatest tiebreaker tuple wins).
    ``how='left'`` keeps unmatched left rows with nulls; ``strict`` is
    the self-as-of mode (excludes simultaneous rows).

    Physical shape: one hash shuffle of ``left ∪ right`` on ``on``, one
    within-partition sort by ``(time, side, tiebreakers)``, one windowed
    ``last(right_payload, ignorenulls=True)`` pass — no pair explosion.
    ``nearest`` adds the opposite-direction sort over the *same*
    exchange (two window passes, still one shuffle).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported as-of direction: {direction!r}")
    on = list(on)
    right = right.filter(F.col(right_time).isNotNull())

    r_payload = F.struct(*[F.col(c) for c in right.columns])
    r_payload_type = right.select(r_payload.alias("__r")).schema["__r"].dataType

    # side priority at equal times: non-strict → rights first (visible to
    # same-time lefts); strict → rights after lefts (invisible)
    l_pri, r_pri = (0, 1) if strict else (1, 0)
    tb = [F.col(f"__tb{i}") for i in range(len(right_tiebreakers))]

    l2 = left.select(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(on)],
        F.col(left_time).alias("__t"),
        F.lit(l_pri).alias("__pri"),
        F.lit(True).alias("__is_l"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_payload_type).alias("__r"),
        # typed nulls: tiebreakers keep their native type so ordering is
        # numeric where the column is numeric
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb{i}")
          for i, c in enumerate(right_tiebreakers)],
    )
    r2 = right.select(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(on)],
        F.col(right_time).alias("__t"),
        F.lit(r_pri).alias("__pri"),
        F.lit(False).alias("__is_l"),
        F.lit(None).cast(l2.schema["__l"].dataType).alias("__l"),
        r_payload.alias("__r"),
        *[F.col(c).alias(f"__tb{i}")
          for i, c in enumerate(right_tiebreakers)],
    )

    keys = [F.col(f"__k{i}") for i in range(len(on))]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__pri").asc(), *[c.asc() for c in tb])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # descending time: "preceding" rows are the later ones, so the same
    # last(ignorenulls) carry-forward picks the earliest right row
    # at-or-after the probe — forward as-of over the same exchange
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__t").desc(), F.col("__pri").asc(), *[c.asc() for c in tb]
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    union = l2.unionByName(r2)

    def in_tolerance(m, fwd: bool):
        if tolerance is None:
            return m
        horizon = F.expr(f"INTERVAL {tolerance}")
        cond = (
            m[right_time] <= F.col("__t") + horizon
            if fwd
            else m[right_time] >= F.col("__t") - horizon
        )
        return F.when(cond, m)

    if direction == "nearest":
        matched = (
            union.withColumn("__mb", F.last("__r", ignorenulls=True).over(w_back))
            .withColumn("__mf", F.last("__r", ignorenulls=True).over(w_fwd))
            .filter(F.col("__is_l"))
        )
        mb = in_tolerance(F.col("__mb"), fwd=False)
        mf = in_tolerance(F.col("__mf"), fwd=True)
        d_back = F.unix_micros(F.col("__t")) - F.unix_micros(mb[right_time])
        d_fwd = F.unix_micros(mf[right_time]) - F.unix_micros(F.col("__t"))
        m = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(d_fwd < d_back, mf)
            .otherwise(mb)
        )
    else:
        w = w_fwd if direction == "forward" else w_back
        matched = union.withColumn(
            "__m", F.last("__r", ignorenulls=True).over(w)
        ).filter(F.col("__is_l"))
        m = in_tolerance(F.col("__m"), fwd=direction == "forward")
    matched = matched.withColumn("__m", m)
    if how != "left":
        matched = matched.filter(F.col("__m").isNotNull())

    right_cols = [
        F.col("__m")[c].alias(c + suffix if c in left.columns else c)
        for c in right.columns
    ]
    return matched.select(
        [F.col("__l")[c].alias(c) for c in left.columns] + right_cols
    )


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    m_bits: int = 1 << 16,
    num_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Explicit Bloom-filter semi-join reduction: prune the fact side
    *before* its shuffle using an ``m_bits``-bit fingerprint of the dim
    keys, then run the exact join.

    The 100 TB shape this exists for: the dim side is too big to
    broadcast (so the join is sort-merge, both sides shuffle), but its
    key *fingerprint* — here 8 KB at the defaults — broadcasts for
    free.  Fact rows that cannot match never enter the exchange; false
    positives (bounded by the classic ``(1-e^{-kn/m})^k``) merely ride
    along and are dropped by the exact join, so the operator is
    value-invisible — the result equals the plain join, which is
    exactly what the oracle states.  Spark's own runtime bloom
    (``spark.sql.optimizer.runtime.bloomFilter``) does this adaptively
    for selective joins; this surface is the *explicit* form for when
    the planner can't see the selectivity (e.g. the dim side is the
    output of an upstream pipeline stage).

    Build: ``num_hashes`` positions per key → distinct → OR-fold into
    64-bit words → one map row, broadcast.  All JVM bit arithmetic, no
    UDFs, no collect.
    """
    hashes = [
        F.pmod(F.xxhash64(F.col(key), F.lit(j)), F.lit(m_bits))
        for j in range(num_hashes)
    ]
    pos = dim.select(F.explode(F.array(*hashes)).alias("__p")).distinct()
    words = pos.groupBy(
        F.shiftright(F.col("__p"), 6).alias("__w")
    ).agg(
        F.expr(
            "bit_or(shiftleft(1L, cast(__p % 64 as int)))"
        ).alias("__bits")
    )
    bm = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("__w", "__bits"))
        ).alias("__bm")
    )
    pruned = fact.crossJoin(F.broadcast(bm))
    for j in range(num_hashes):
        # SQL form: shift amounts must be expressions, which the Python
        # shiftright/shiftleft helpers don't accept
        h = f"pmod(xxhash64(`{key}`, {j}), {m_bits})"
        pruned = pruned.filter(
            F.expr(
                f"(shiftright(coalesce(element_at(__bm, shiftright({h}, 6)),"
                f" 0L), cast({h} % 64 as int)) & 1) = 1"
            )
        )
    return pruned.drop("__bm").join(dim, key, how)
