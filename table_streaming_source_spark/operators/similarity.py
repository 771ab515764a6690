"""Vector similarity search over ``array<float>`` embedding columns.

Baseline is brute-force cosine top-k with the dot product computed JVM-side
via higher-order functions (``zip_with`` + ``aggregate``) — no Python in
the loop, whole-stage codegen applies.

Scale path (100 TB / billions of vectors):

- **Blocked search** (:func:`cosine_pairs_blocked`): restrict comparisons to
  a blocking key (coarse quantizer cell, LSH bucket, shard id).  This is the
  IVF pattern: the block column plays the role of the inverted-list id, the
  equi-join on it is a shuffled hash join on a low-cardinality key.
- **Broadcast the query set** in top-k search: queries are ~KBs-MBs, the
  corpus is the 100 TB side; ``broadcast(queries)`` makes the scan
  embarrassingly parallel with zero corpus shuffle.  The per-query top-k is
  a window over ``query_id`` — only ``k × |queries|`` rows survive the
  partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, JVM-evaluated, sequential fold (order
    deterministic → bit-reproducible across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<numeric>`` columns (double)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    key: str = "vec_id",
    k: int = 5,
    round_digits: int | None = 6,
) -> DataFrame:
    """Brute-force cosine top-k: for every query vector, the ``k`` nearest
    corpus vectors (excluding itself when ids collide).

    Returns ``(query_id, neighbor_id, cos_sim, rank)``.  The ranking is
    deterministic: ties broken by neighbor id.  ``round_digits`` rounds the
    similarity before ranking so results are reproducible across engines'
    float summation orders.
    """
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(key).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    sim = F.col("__sim")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    if round_digits is not None:
        scored = scored.withColumn("__sim", F.round(sim, round_digits))
    w = Window.partitionBy("query_id").orderBy(
        sim.desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            sim.alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_pairs_blocked(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    key: str = "vec_id",
    block_col: str = "label",
    threshold: float = 0.99,
    round_digits: int | None = 6,
) -> DataFrame:
    """Near-duplicate vector pairs within a blocking key (IVF-style).

    Compares only pairs sharing ``block_col`` — the scale answer to
    all-pairs cosine.  Returns ``(key_a, key_b, cos_sim)``, ``key_a <
    key_b``, ``cos_sim >= threshold``.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    a = df.select(
        F.col(block_col).alias("__blk"),
        F.col(key).alias("key_a"),
        F.col(vec_col).alias("__va"),
    )
    b = df.select(
        F.col(block_col).alias("__blk"),
        F.col(key).alias("key_b"),
        F.col(vec_col).alias("__vb"),
    )
    sim = cosine(F.col("__va"), F.col("__vb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.join(b, "__blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("key_a", "key_b", "cos_sim")
    )
