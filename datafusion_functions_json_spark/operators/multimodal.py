"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

All three decode legs are REAL: ``decode_image`` uses PIL when
importable and falls back to pure-stdlib decoders (PNG via zlib+
unfilter, binary PPM/PGM, baseline JPEG full decode since round 16,
GIF header sniff — see :mod:`._codecs`); ``extract_audio_features``
parses WAV/PCM with the stdlib ``wave`` module;
``extract_video_features`` uses PyAV when importable (any ffmpeg
codec) and falls back to a pure-stdlib RIFF/AVI parser — full pixel
decode for uncompressed BI_RGB DIB frames AND baseline-MJPEG frames
(stdlib JPEG decoder; non-AVI containers need PyAV). Undecodable payloads
yield NULL fields per row — never a task failure. ``fake=True``
remains the deterministic hash-derived stand-in available for
reproducible oracle queries.

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
import io
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._codecs import (
    decode_avi_frame,
    decode_image_bytes,
    decode_wav_bytes,
    image_grid_features,
    parse_avi,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_image",
    "image_features",
    "image_dhash",
    "image_dup_pairs",
    "extract_audio_features",
    "audio_fingerprint_bits",
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


def _pil_decode(image_module, b):
    """Decode via PIL → (h, w, ch, pixels) or None to fall through to the
    stdlib decoders. Palette images convert to RGB (wider than the
    stdlib path, which reports palette dims only)."""
    try:
        img = image_module.open(io.BytesIO(bytes(b)))
        if img.mode == "P":
            img = img.convert("RGB")
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.dtype != np.uint8:
            return (img.height, img.width, arr.shape[2], None)
        return (arr.shape[0], arr.shape[1], arr.shape[2], arr)
    except Exception:
        return None


def decode_image(df: DataFrame, payload_col: str = "payload", *, fake: bool = False) -> DataFrame:
    """Decode image payloads to (height, width, channels) + a 16-dim
    4×4-luma-grid feature vector via Arrow-batched ``mapInPandas``.

    Real decode chain: PIL when importable on the worker, else the
    pure-stdlib decoders in :mod:`._codecs` (PNG, PPM/PGM, baseline
    JPEG full decode; progressive-JPEG/GIF dimension sniff → NULL
    features). Undecodable payloads →
    NULL fields for that row. ``fake=True`` keeps the deterministic
    hash-derived stand-in (same schema/batching) for reproducible
    oracle queries.
    """
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
        if not fake:
            try:
                from PIL import Image  # optional dependency
            except ImportError:
                Image = None
        for pdf in it:
            payloads = pdf[payload_col]
            pdf = pdf.copy()
            if fake:
                # deterministic fake "decode": dimensions derived from size
                sizes = payloads.map(lambda b: len(b) if b is not None else None)
                pdf["height"] = sizes.map(lambda s: None if s is None else 16 + s % 16)
                pdf["width"] = sizes.map(lambda s: None if s is None else 16 + (s // 16) % 16)
                pdf["channels"] = sizes.map(lambda s: None if s is None else 3)
                pdf["features"] = payloads.map(_fake_feature_vector)
            else:
                heights, widths, chans, feats = [], [], [], []
                for b in payloads:
                    got = None
                    if b is not None and Image is not None:
                        got = _pil_decode(Image, b)
                    if got is None:
                        got = decode_image_bytes(b)
                    h, w, c, px = got
                    heights.append(h)
                    widths.append(w)
                    chans.append(c)
                    feats.append(image_grid_features(px) if px is not None else None)
                pdf["height"] = pd.Series(heights, index=pdf.index, dtype=object)
                pdf["width"] = pd.Series(widths, index=pdf.index, dtype=object)
                pdf["channels"] = pd.Series(chans, index=pdf.index, dtype=object)
                pdf["features"] = pd.Series(feats, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(batches, out_schema)


def image_features(df: DataFrame, payload_col: str = "payload", *, fake: bool = False) -> DataFrame:
    """Feature-extraction-only variant: (media_id, features)."""
    decoded = decode_image(df, payload_col, fake=fake)
    return decoded.select("media_id", "features")


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload", *, fake: bool = False
) -> DataFrame:
    """Extract audio features (sample rate, sample count, 16 RMS-energy
    bins) via Arrow-batched ``mapInPandas`` — the audio twin of
    :func:`decode_image`.

    Real decode: WAV/PCM via the stdlib ``wave`` module (no third-party
    codec needed — :func:`._codecs.decode_wav_bytes`); non-WAV or
    malformed payloads → NULL fields for that row. ``fake=True`` keeps
    the deterministic size-derived stand-in for reproducible oracle
    queries.
    """
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
            if fake:
                sizes = payloads.map(lambda b: len(b) if b is not None else None)
                # deterministic fake "decode": 16-bit mono at a
                # size-derived standard rate
                pdf["sample_rate"] = sizes.map(
                    lambda s: None if s is None else (16000 if s % 2 else 44100)
                )
                pdf["n_samples"] = sizes.map(
                    lambda s: None if s is None else s // 2
                )
                pdf["features"] = payloads.map(_fake_feature_vector)
            else:
                decoded = [decode_wav_bytes(b) for b in payloads]
                pdf["sample_rate"] = pd.Series(
                    [d[0] for d in decoded], index=pdf.index, dtype=object
                )
                pdf["n_samples"] = pd.Series(
                    [d[1] for d in decoded], index=pdf.index, dtype=object
                )
                pdf["features"] = pd.Series(
                    [d[2] for d in decoded], index=pdf.index, dtype=object
                )
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

    Real decode chain (same call-time-optional-import pattern as
    :func:`decode_image`'s PIL arm):

    1. PyAV when importable on the worker — any ffmpeg codec;
       sequential scan, each requested timestamp gets the last frame
       at-or-before it (ffmpeg seek semantics).
    2. Pure-stdlib RIFF/AVI (:func:`._codecs.parse_avi`): full pixel
       decode for uncompressed BI_RGB 24/32-bit DIB frames AND
       baseline-MJPEG frames (stdlib JPEG decoder, round 16; PIL still
       tried first for exotic frame encodings). Frame index =
       ``ts * fps / 1000`` clamped to the stored frame list.
    3. Anything else (non-AVI container without PyAV, undecodable
       payload) → NULL features for that row — never a task failure.

    Per frame: the 16-dim 4×4-luma-grid feature vector
    (:func:`._codecs.image_grid_features`). ``fake=True`` keeps the
    deterministic hash-derived stand-in for reproducible oracle
    queries.
    """
    # ONE payload copy per video: aggregate the sampled timestamps per
    # media BEFORE attaching the blob — the earlier per-frame join
    # duplicated the full payload once per frame row (an hour-long
    # video at 1 fps shipped 3600 copies through the join output and
    # the Arrow transfer; the batch-local dedup only avoided
    # re-DECODING, not the bytes). Decode granularity was already
    # per-media inside a batch, so no parallelism is lost.
    plan = frame_sample_plan(df, every_ms).groupBy("media_id").agg(
        F.collect_list("frame_ts_ms").alias("_ts_list")
    )
    frames = plan.join(df.select("media_id", payload_col), "media_id")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), True),
            T.StructField("frame_ts_ms", T.LongType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def _avi_features(payload, ts_list, pil_image):
        """Stdlib path: parse once per media, decode per requested ts."""
        info = parse_avi(payload)
        if info is None or not info["frames"]:
            return [None] * len(ts_list)
        fps = info["fps"] or 1000.0 / max(every_ms, 1)
        out = []
        for ts in ts_list:
            idx = min(int(ts * fps / 1000.0), len(info["frames"]) - 1)
            px = decode_avi_frame(info, idx)
            if px is None:
                # compressed frame (e.g. MJPEG): try the image path
                fb = info["frames"][idx]
                got = _pil_decode(pil_image, fb) if pil_image else None
                if got is None:
                    got = decode_image_bytes(fb)
                px = got[3]
            out.append(image_grid_features(px) if px is not None else None)
        return out

    def _pyav_features(av_mod, payload, ts_list):
        """PyAV path: one sequential decode pass; each requested ts gets
        the last frame at-or-before it. Any failure → NULLs (per-row
        decode failure must never fail the task)."""
        container = None
        try:
            container = av_mod.open(io.BytesIO(bytes(payload)))
            wanted = sorted(set(int(t) for t in ts_list))
            got = {}
            last = None
            wi = 0
            for frame in container.decode(video=0):
                ms = float(frame.time or 0.0) * 1000.0
                arr = frame.to_ndarray(format="rgb24")
                while wi < len(wanted) and ms > wanted[wi]:
                    got[wanted[wi]] = last if last is not None else arr
                    wi += 1
                last = arr
                if wi >= len(wanted):
                    break
            while wi < len(wanted):
                got[wanted[wi]] = last
                wi += 1
            return [
                image_grid_features(got[int(t)]) if got.get(int(t)) is not None else None
                for t in ts_list
            ]
        except Exception:
            return [None] * len(ts_list)
        finally:
            # ffmpeg demuxer/decoder buffers are NATIVE allocations — an
            # early break or exception must not leave them to the GC on
            # a long-lived executor
            if container is not None:
                try:
                    container.close()
                except Exception:
                    pass

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        av_mod = pil_image = None
        if not fake:
            try:
                import av as av_mod  # optional dependency (ffmpeg codecs)
            except ImportError:
                av_mod = None
            try:
                from PIL import Image as pil_image  # for MJPEG frames
            except ImportError:
                pil_image = None
        for pdf in it:
            out_mid, out_ts, out_feat = [], [], []
            for mid, payload, ts_list in zip(
                pdf["media_id"], pdf[payload_col], pdf["_ts_list"]
            ):
                ts_list = [int(t) for t in ts_list]
                if fake:
                    fs = [
                        None
                        if payload is None
                        else _fake_feature_vector(
                            payload + int(ts).to_bytes(8, "big")
                        )
                        for ts in ts_list
                    ]
                elif payload is None:
                    fs = [None] * len(ts_list)
                elif av_mod is not None:
                    fs = _pyav_features(av_mod, payload, ts_list)
                else:
                    fs = _avi_features(payload, ts_list, pil_image)
                out_mid.extend([mid] * len(ts_list))
                out_ts.extend(ts_list)
                out_feat.extend(fs)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_mid, dtype="int64"),
                    "frame_ts_ms": pd.Series(out_ts, dtype="int64"),
                    "features": pd.Series(out_feat, dtype=object),
                }
            )

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


def _dhash_from_pixels(px) -> "int | None":
    """64-bit difference hash (dHash): luma → area-average 8x9 grid →
    horizontal gradient sign bits, MSB-first row-major, folded into a
    signed int64. Pure numpy on an already-decoded (h, w, ch) uint8
    array; deterministic (integer bin edges, float64 means)."""
    if px is None:
        return None
    a = np.asarray(px)
    if a.ndim == 3 and a.shape[2] >= 3:
        g = (
            0.299 * a[..., 0].astype(np.float64)
            + 0.587 * a[..., 1].astype(np.float64)
            + 0.114 * a[..., 2].astype(np.float64)
        )
    elif a.ndim == 3:
        g = a[..., 0].astype(np.float64)
    else:
        g = a.astype(np.float64)
    h, w = g.shape
    if h < 1 or w < 1:
        return None
    rows = np.linspace(0, h, 9).astype(int)
    cols = np.linspace(0, w, 10).astype(int)
    grid = np.empty((8, 9))
    for i in range(8):
        r0, r1 = rows[i], max(rows[i + 1], rows[i] + 1)
        for j in range(9):
            c0, c1 = cols[j], max(cols[j + 1], cols[j] + 1)
            grid[i, j] = g[r0:r1, c0:c1].mean()
    bits = grid[:, 1:] > grid[:, :-1]
    val = 0
    for bit in bits.flatten():
        val = (val << 1) | int(bit)
    return val - (1 << 64) if val >= (1 << 63) else val


def _fake_dhash(payload) -> "int | None":
    if payload is None:
        return None
    v = int.from_bytes(hashlib.sha256(bytes(payload)).digest()[:8], "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(
    df: DataFrame, payload_col: str = "payload", *, fake: bool = False
) -> DataFrame:
    """Attach a 64-bit perceptual difference hash (``dhash`` bigint,
    NULL for undecodable payloads) — the standard near-duplicate-image
    key: insensitive to uniform brightness shifts and re-encoding,
    sensitive to content. Same decode chain as :func:`decode_image`
    (PIL when importable, stdlib PNG/PPM fallback); Arrow-batched
    ``mapInPandas``, per-row failures → NULL, never a task failure.
    ``fake=True`` substitutes a deterministic payload-digest hash
    (exact duplicates still collide) for oracle-reproducible plumbing
    tests."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("dhash", T.LongType(), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            try:
                from PIL import Image  # optional dependency
            except ImportError:
                Image = None
        for pdf in it:
            pdf = pdf.copy()
            vals = []
            for b in pdf[payload_col]:
                if fake:
                    vals.append(_fake_dhash(b))
                    continue
                px = None
                if b is not None and Image is not None:
                    got = _pil_decode(Image, b)
                    if got is not None:
                        px = got[3]
                if px is None:
                    px = decode_image_bytes(b)[3]
                vals.append(_dhash_from_pixels(px))
            pdf["dhash"] = pd.Series(vals, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(batches, out_schema)


def image_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    *,
    max_distance: int = 0,
    fake: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate image pairs by dHash Hamming distance:
    ``(id_a, id_b, distance)``.

    ``max_distance=0`` is an exact-hash equi-self-join (shuffle keyed
    on the 64-bit hash — only colliding images co-locate, never
    all-pairs). ``1 <= max_distance <= 3`` uses the same pigeonhole
    discipline as SimHash blocking: the hash splits into four 16-bit
    blocks, candidates share at least one block (guaranteed recall for
    <= 3 flipped bits), and an exact JVM ``bit_count(xor)`` verifies.
    At 100 TB both paths are bucketed equi-joins; the block fan-out is
    a fixed 4x.

    Cache contract (same as :func:`~.dedup.simhash_dup_pairs`): the
    hashed base feeds BOTH sides of the self-join, and its lineage is
    the expensive per-image DECODE — without a persist each side
    re-decodes every image. ``materialize=True`` (default) caches the
    small (id, hash) base, computes the pairs eagerly, and unpersists
    before returning; ``materialize=False`` keeps the plan fully lazy
    (composition callers manage caching)."""
    if not 0 <= max_distance <= 3:
        raise ValueError("max_distance must be in [0, 3] (pigeonhole bound)")
    hashed = (
        image_dhash(df, payload_col, fake=fake)
        .filter(F.col("dhash").isNotNull())
        .select(F.col(id_col).alias("_id"), "dhash")
    )
    if materialize:
        hashed = hashed.persist()

    def _finish(pairs: DataFrame) -> DataFrame:
        if materialize:
            pairs = pairs.persist()
            pairs.count()  # force: pairs (small) cached, decode releasable
            hashed.unpersist()
        return pairs

    if max_distance == 0:
        a, b = hashed.alias("L"), hashed.alias("R")
        return _finish(
            a.join(b, F.col("L.dhash") == F.col("R.dhash"))
            .filter(F.col("L._id") < F.col("R._id"))
            .select(
                F.col("L._id").alias("id_a"),
                F.col("R._id").alias("id_b"),
                F.lit(0).alias("distance"),
            )
        )
    blocks = hashed.select(
        "_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_id"),
                        (
                            F.shiftrightunsigned(F.col("dhash"), 16 * i)
                            .bitwiseAND(F.lit(0xFFFF))
                        ).alias("block_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("blk"),
    ).select("_id", "dhash", "blk.block_id", "blk.block_val")
    return _finish(
        blocks.alias("L")
        .join(
            blocks.alias("R"),
            (F.col("L.block_id") == F.col("R.block_id"))
            & (F.col("L.block_val") == F.col("R.block_val")),
        )
        .filter(F.col("L._id") < F.col("R._id"))
        .select(
            F.col("L._id").alias("id_a"),
            F.col("R._id").alias("id_b"),
            F.col("L.dhash").alias("_ha"),
            F.col("R.dhash").alias("_hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("distance", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def audio_fingerprint_bits(features_col) -> "Column":
    """Compact audio fingerprint from the 16 RMS-energy bins of
    :func:`extract_audio_features`: one sign bit per adjacent band
    difference (bit i set iff band[i+1] > band[i]) — the time-domain
    analog of spectral fingerprinting's band-energy signs, robust to
    uniform gain changes (scaling every band preserves every
    comparison). 15-bit INT; NULL features → NULL.

    Pure Column expression over the already-decoded features — composes
    with the mapInPandas decode without a second Python hop."""
    f = F.col(features_col) if isinstance(features_col, str) else features_col
    total = F.lit(0)
    for i in range(_FEATURE_DIM - 1):
        total = total + F.when(
            F.element_at(f, i + 2) > F.element_at(f, i + 1), F.lit(1 << i)
        ).otherwise(F.lit(0))
    return F.when(f.isNull(), F.lit(None).cast("int")).otherwise(
        total.cast("int")
    )
