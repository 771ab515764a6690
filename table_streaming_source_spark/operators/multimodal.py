"""Multimodal (image/audio/video) column support.

Model: media payloads are opaque ``binary`` columns accompanied by a typed
metadata struct — at rest this is parquet binary + struct columns, which
Spark scans with the payload column *pruned away* unless a query touches it
(column pruning is the whole game at 100 TB: metadata-only queries must
never read the bytes).

``decode_media`` is the decode/feature-extract step as an Arrow-batched
``mapInPandas`` pipeline.  The actual codec calls are STUBBED (image/audio
libraries are not in this container): ``decoder='fake'`` derives
deterministic pseudo-metadata from the payload bytes, ``decoder='real'``
raises ``NotImplementedError`` where Pillow/ffmpeg would plug in.  The
Spark-side plumbing — schema, batch iteration, partition-preserving
mapInPandas — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_payload(df: DataFrame, text_col: str, key: str) -> DataFrame:
    """Fixture adapter: materialize an opaque binary payload column (the
    utf-8 bytes of ``text_col``) plus media-type metadata, emulating an
    ingested media table.  Deterministic, so oracle-checkable."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(key),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        # round-robin media type from the key: deterministic fixture
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(key) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def with_content_address(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Content-address the payload: ``content_id = sha2-256(payload)``.

    Content-addressed dedup of media is an aggregate on the 32-byte digest;
    the payload itself never shuffles (same principle as text exact-dedup).
    """
    return df.withColumn(
        "content_id", F.sha2(F.col(payload_col), 256)
    )


DECODED_SCHEMA = StructType(
    [
        StructField("key", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derive (width, height, n_frames)
    from the payload digest.  Replace with Pillow/av in a real deployment."""
    d = hashlib.md5(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    n_frames = 1 + d[2] % 16
    return width, height, n_frames


def decode_media(
    df: DataFrame,
    *,
    key: str = "doc_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    decoder: str = "fake",
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    ``mapInPandas``.

    Batches stream through Python as pandas DataFrames (Arrow transfer);
    each batch is decoded row-wise inside the batch — the per-batch loop is
    where a vectorized codec (e.g. a GPU decoder taking a byte batch) slots
    in.  Partitioning is preserved: no shuffle is introduced by decode.
    """
    if decoder == "real":
        raise NotImplementedError(
            "Real media decoding requires Pillow/av/ffmpeg, not available "
            "in this environment; use decoder='fake' for the deterministic "
            "stub."
        )
    if decoder != "fake":
        raise ValueError(f"Unknown decoder {decoder!r}")

    cols = [key, payload_col, media_type_col]

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                {
                    "key": pdf[key].astype("int64"),
                    "media_type": pdf[media_type_col],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                }
            )
            # audio has no frames/geometry; video keeps frames; image is 1
            is_audio = out["media_type"] == "audio"
            out.loc[is_audio, ["width", "height"]] = -1
            out.loc[out["media_type"] == "image", "n_frames"] = 1
            yield out

    return df.select(cols).mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def sample_frames(
    decoded: DataFrame,
    *,
    every_nth: int = 4,
    key: str = "key",
) -> DataFrame:
    """Frame sampling over decoded video metadata: one row per kept frame
    (``frame_idx = 0, every_nth, 2·every_nth, …``).

    JVM-side ``explode(sequence(...))`` — the *plumbing* of frame
    extraction (row explosion, downstream per-frame processing) without
    touching payload bytes; an actual frame grab plugs into
    :func:`decode_media`'s batch loop and emits binary frames here
    instead.  Non-video rows pass through with ``frame_idx = 0`` (their
    single representation)."""
    idx = F.when(
        (F.col("media_type") == "video") & (F.col("n_frames") > 0),
        F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)
        ),
    ).otherwise(F.array(F.lit(0)))
    return decoded.select(
        F.col(key),
        "media_type",
        "n_frames",
        F.explode(idx).alias("frame_idx"),
    )


def resize_media(
    decoded: DataFrame,
    *,
    max_side: int = 128,
) -> DataFrame:
    """Resize-to-fit metadata transform via Arrow-batched ``mapInPandas``:
    scale (width, height) so the longer side is ``max_side``, preserving
    aspect ratio (floor semantics, min 1 px).  The pixel resample is
    stubbed exactly like :func:`decode_media`'s codec — a real deployment
    replaces the arithmetic with the image library call on the payload
    batch; the batch shape, schema, and partition-preservation are the
    real contract."""

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            geom = (out["width"] > 0) & (out["height"] > 0)
            longer = out[["width", "height"]].max(axis=1)
            scale = (max_side / longer).clip(upper=1.0)
            for c in ("width", "height"):
                out.loc[geom, c] = (
                    (out.loc[geom, c] * scale[geom]).astype(int).clip(lower=1)
                )
            yield out

    return decoded.mapInPandas(resize_batches, schema=decoded.schema)
