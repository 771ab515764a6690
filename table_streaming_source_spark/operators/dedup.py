"""Deduplication operators: exact, fingerprint, MinHash+LSH, SimHash,
n-gram Jaccard — the LLM-data-pipeline surface (SURVEY.md §2B ⁺ rows).

Design decisions for 100 TB:

- **Portable hashing.** Every hash is derived from ``md5`` of a salted
  string.  md5 is identical in every engine (and in the DuckDB correctness
  oracle), deterministic across partitions/executors, and JVM-evaluated via
  ``F.md5`` (no Python in the hot path).
- **Exact dedup** is a hash-aggregate on a digest — ``groupBy(md5(text))``
  shuffles 16-byte keys, not document bodies.  At 100 TB, shuffle bytes are
  the cost; never shuffle the payload to dedup it.
- **MinHash+LSH** replaces the quadratic all-pairs comparison with
  ``O(n·k)`` signature rows and a self-join on LSH band buckets — the
  standard shingle→minhash→band→bucket-join pipeline, entirely in
  explode/groupBy built-ins (whole-stage codegen, map-side partial aggs).
  Band buckets are the only shuffle key; huge buckets (boilerplate docs)
  are the skew risk — AQE skew-join handles moderate skew, and a bucket-size
  cap (``max_bucket``) guards the pathological case.
- **Verification joins back to shingle sets** only for candidate pairs
  (a tiny fraction of n²), computing exact Jaccard.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame,
    cols: Sequence[str],
    key: str,
) -> DataFrame:
    """Exact dedup: one canonical row id per distinct value of ``cols``.

    Returns ``(<digest>, keep_<key>, n_copies)`` — canonical = min key, so
    the result is deterministic (unlike raw ``dropDuplicates``).
    """
    digest = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in cols]))
    return (
        df.groupBy(digest.alias("digest"))
        .agg(
            F.min(key).alias(f"keep_{key}"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def fingerprint(df: DataFrame, text_col: str, key: str) -> DataFrame:
    """Content fingerprint + canonical assignment per fingerprint group.

    ``fingerprint`` = md5 of the normalized text (lower, collapsed
    whitespace); ``canonical_<key>`` = min key sharing it.  This is
    content-addressed dedup — the multimodal module reuses the same idea on
    binary payloads.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    with_fp = df.select(F.col(key), F.md5(norm).alias("fingerprint"))
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    return with_fp.withColumn("canonical_" + key, F.min(key).over(w))


def _shingles(text_col: str, n: int) -> "F.Column":
    """Distinct word ``n``-gram shingles of a text column (JVM-side:
    split + sequence + transform + array_distinct)."""
    toks = F.split(F.col(text_col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(F.filter(grams, lambda g: F.length(g) > F.lit(0)))


def shingle_table(
    df: DataFrame, text_col: str, key: str, n: int = 3
) -> DataFrame:
    """Explode documents into distinct ``(key, shingle)`` rows."""
    return df.select(
        F.col(key), F.explode(_shingles(text_col, n)).alias("shingle")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    key: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures as ``(key, h, minhash)`` rows.

    Hash family ``h`` (0..num_hashes-1) is simulated by salting:
    ``minhash(d, h) = min over shingles s of md5(h || ':' || s)`` — a string
    minimum, portable to any engine.  Equality of minima across documents
    estimates Jaccard similarity exactly as with integer minhash.
    """
    shingled = shingle_table(df, text_col, key, n)
    hashed = shingled.select(
        key,
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h"),
        F.col("shingle"),
    ).select(
        key,
        "h",
        F.md5(F.concat_ws(":", F.col("h"), F.col("shingle"))).alias("hv"),
    )
    return hashed.groupBy(key, "h").agg(F.min("hv").alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    key: str,
    *,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket: Optional[int] = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified with exact
    Jaccard.

    Pipeline: shingles → salted-md5 minhash signature (``num_hashes``
    values) → ``bands`` bands of ``num_hashes/bands`` rows each, band key =
    md5 of the concatenated band slice → self-join on (band, band_key) →
    exact Jaccard over shingle sets for the candidates → filter
    ``jaccard >= threshold``.

    Returns ``(key_a, key_b, jaccard)`` with ``key_a < key_b``.

    ``max_bucket`` drops LSH buckets larger than the cap (boilerplate
    explosion guard for web-scale corpora).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(
        df, text_col, key, n=n, num_hashes=num_hashes
    ).withColumn("band", F.col("h") / F.lit(rows_per_band))
    sig = sig.withColumn("band", F.floor("band").cast("int"))

    # band key: md5 of the band's minhashes in h order
    band_keys = (
        sig.groupBy(key, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("h", "minhash"))
                        ),
                        lambda s: s["minhash"],
                    ),
                )
            ).alias("band_key")
        )
    )

    if max_bucket is not None:
        from pyspark.sql import Window

        wb = Window.partitionBy("band", "band_key")
        band_keys = band_keys.withColumn(
            "__bucket_n", F.count(F.lit(1)).over(wb)
        ).filter(F.col("__bucket_n") <= max_bucket).drop("__bucket_n")

    a = band_keys.select(
        F.col(key).alias("key_a"), "band", "band_key"
    )
    b = band_keys.select(
        F.col(key).alias("key_b"), "band", "band_key"
    )
    candidates = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
    )

    # exact-Jaccard verification of candidates only
    shingled = shingle_table(df, text_col, key, n)
    sizes = shingled.groupBy(key).agg(F.count(F.lit(1)).alias("sz"))
    sh_a = shingled.select(F.col(key).alias("key_a"), "shingle")
    sh_b = shingled.select(F.col(key).alias("key_b"), "shingle")
    inter = (
        candidates.join(sh_a, "key_a")
        .join(sh_b, ["key_b", "shingle"])
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(key).alias("key_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(key).alias("key_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "key_a")
        .join(sz_b, "key_b")
        .select(
            "key_a",
            "key_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    key: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.

    The shingle equi-join prunes the n² pair space to pairs with non-zero
    intersection; at 100 TB use :func:`minhash_lsh_pairs` instead (this one
    is the exact oracle-checkable semantics).
    Returns ``(key_a, key_b, jaccard)`` with ``key_a < key_b``.
    """
    shingled = shingle_table(df, text_col, key, n)
    sizes = shingled.groupBy(key).agg(F.count(F.lit(1)).alias("sz"))
    a = shingled.select(F.col(key).alias("key_a"), "shingle")
    b = shingled.select(F.col(key).alias("key_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(key).alias("key_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(key).alias("key_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "key_a")
        .join(sz_b, "key_b")
        .select(
            "key_a",
            "key_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, text_col: str, key: str, *, bits: int = 60
) -> DataFrame:
    """SimHash document fingerprints (``bits``-bit, default 60 — the
    token hash is the first 15 hex chars of md5 = 60 usable bits).

    Token hash = first 16 hex chars of md5 (portable); each bit of each
    token hash votes ±1; fingerprint bit b is 1 iff the sum of votes is
    positive.  Entirely JVM-side: explode → conv(md5) → bit ops →
    groupBy(sum) → re-assemble.

    Returns ``(key, simhash)`` with the fingerprint as a bigint.
    Near-dup candidates are rows within small Hamming distance; pair
    generation over fingerprints should block on bit-bands like LSH.
    """
    toks = df.select(
        F.col(key),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), r"\s+"))
        ).alias("tok"),
    ).filter(F.length("tok") > 0)
    # 64-bit token hash from md5 hex (conv hex→dec, cast); conv returns
    # unsigned-ish string, cast to decimal then shift into signed range
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    toks = toks.withColumn("th", h)
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    votes = (
        toks.select(key, "th", bit)
        .withColumn(
            "vote",
            F.when(
                F.expr("shiftright(th, b) & 1") == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        .groupBy(key, "b")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.withColumn(
            "bitval",
            F.when(
                F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy(key)
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )
