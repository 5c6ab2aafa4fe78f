"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (this container ships no image/audio
codecs): ``decode_image``/``extract_audio_features`` raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic hash-derived stand-in with the REAL schema/batching/
partitioning — so the Spark-side plumbing (what actually matters at
100 TB) is fully exercised and tested.

Scale notes:

* Binary payloads stay opaque to the JVM; only the Python worker touches
  bytes, in Arrow batches (``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds peak memory — lower it for multi-MB blobs).
* ``mapInPandas`` streams batch-iterators: constant memory per task even
  for skewed blob sizes.
* Feature extraction emits FIXED-WIDTH arrays (embedding-like), so the
  result table is shuffle/Parquet-friendly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_image",
    "image_features",
    "extract_audio_features",
    "extract_video_features",
    "frame_sample_plan",
]

# Canonical multimodal table schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: payload size and a content hash (for
    exact dedup of blobs without ever moving bytes to Python)."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_xxh", F.xxhash64(F.col(payload_col))
    )


_FEATURE_DIM = 16


def _fake_feature_vector(payload: bytes) -> list:
    """Deterministic stand-in for a decoded feature vector: bytes of the
    sha256 digest scaled to [0,1). Same payload => same vector, so tests
    and oracles are reproducible."""
    if payload is None:
        return None
    dig = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in dig[:_FEATURE_DIM]]


def decode_image(df: DataFrame, payload_col: str = "payload", *, fake: bool = False) -> DataFrame:
    """Decode image payloads to (height, width, channels) + feature
    vector via Arrow-batched ``mapInPandas``.

    Real decoding requires an image codec library not present in this
    environment — STUB: raises ``NotImplementedError`` unless
    ``fake=True`` (deterministic hash-derived features, real plumbing).
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library (e.g. PIL/cv2) not "
            "available in this environment; pass fake=True to exercise "
            "the pipeline with deterministic stand-in features"
        )

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("height", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            pdf = pdf.copy()
            # deterministic fake "decode": dimensions derived from size
            sizes = payloads.map(lambda b: len(b) if b is not None else None)
            pdf["height"] = sizes.map(lambda s: None if s is None else 16 + s % 16)
            pdf["width"] = sizes.map(lambda s: None if s is None else 16 + (s // 16) % 16)
            pdf["channels"] = sizes.map(lambda s: None if s is None else 3)
            pdf["features"] = payloads.map(_fake_feature_vector)
            yield pdf

    return df.mapInPandas(batches, out_schema)


def image_features(df: DataFrame, payload_col: str = "payload", *, fake: bool = False) -> DataFrame:
    """Feature-extraction-only variant: (media_id, features)."""
    decoded = decode_image(df, payload_col, fake=fake)
    return decoded.select("media_id", "features")


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload", *, fake: bool = False
) -> DataFrame:
    """Extract audio features (sample rate, sample count, fixed-width
    feature vector) via Arrow-batched ``mapInPandas`` — the audio twin of
    :func:`decode_image`.

    Real decoding requires an audio codec library not present in this
    environment — STUB: raises ``NotImplementedError`` unless
    ``fake=True`` (deterministic hash-derived features; the Spark-side
    schema/batching/partitioning is real and tested).
    """
    if not fake:
        raise NotImplementedError(
            "audio decoding requires a codec library (e.g. soundfile/"
            "librosa) not available in this environment; pass fake=True "
            "to exercise the pipeline with deterministic stand-in features"
        )

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            pdf = pdf.copy()
            sizes = payloads.map(lambda b: len(b) if b is not None else None)
            # deterministic fake "decode": 16-bit mono at a size-derived
            # standard rate
            pdf["sample_rate"] = sizes.map(
                lambda s: None if s is None else (16000 if s % 2 else 44100)
            )
            pdf["n_samples"] = sizes.map(
                lambda s: None if s is None else s // 2
            )
            pdf["features"] = payloads.map(_fake_feature_vector)
            yield pdf

    return df.mapInPandas(batches, out_schema)


def extract_video_features(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Per-sampled-frame feature extraction — the video leg of the
    multimodal trio (images: :func:`decode_image`, audio:
    :func:`extract_audio_features`). Composes :func:`frame_sample_plan`
    (cheap JVM fan-out of (media_id, frame_ts_ms) rows, which rebalances
    BEFORE the expensive decode) with an Arrow-batched ``mapInPandas``
    frame decoder.

    Real decoding requires a video codec library not present in this
    environment — STUB: raises ``NotImplementedError`` unless
    ``fake=True`` (deterministic features derived from (payload hash,
    frame ts); the fan-out, schema, and batching are real and tested).
    """
    if not fake:
        raise NotImplementedError(
            "video decoding requires a codec library (e.g. PyAV/ffmpeg) "
            "not available in this environment; pass fake=True to "
            "exercise the pipeline with deterministic stand-in features"
        )
    frames = frame_sample_plan(df, every_ms).join(
        df.select("media_id", payload_col), "media_id"
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), True),
            T.StructField("frame_ts_ms", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "features": [
                        None
                        if b is None
                        else _fake_feature_vector(
                            b + int(ts).to_bytes(8, "big")
                        )
                        for b, ts in zip(pdf[payload_col], pdf["frame_ts_ms"])
                    ],
                }
            )
            yield out

    return frames.mapInPandas(batches, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    to be decoded downstream. Pure JVM (sequence+explode) — the expensive
    decode fans out AFTER the cheap plan, so partitioning can rebalance
    on the exploded rows (a classic skew-buster for long videos)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
