"""Structured Streaming composition.

The reference's functions are stateless deterministic scalars, so they
compose with Spark streaming for free (SURVEY.md §2.4) — these helpers
package the common shapes: JSON-parsing a stream, watermarked windowed
aggregation over an extracted field, and late-data handling.

All our JSON functions work unchanged on streaming DataFrames: pandas
UDFs are supported in streaming plans, and every function is
deterministic + stateless (no accumulated state per row)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import api as jsonf

__all__ = ["extract_json_stream", "windowed_json_counts"]


def extract_json_stream(
    stream: DataFrame,
    json_col: str,
    fields: dict,
    ts_col: str = "ts",
) -> DataFrame:
    """Project typed fields out of a JSON column on a (possibly
    streaming) DataFrame. ``fields``: {out_name: (kind, *path)} with kind
    in {str,int,float,bool,text}."""
    getters = {
        "str": jsonf.json_get_str,
        "int": jsonf.json_get_int,
        "float": jsonf.json_get_float,
        "bool": jsonf.json_get_bool,
        "text": jsonf.json_as_text,
    }
    cols = [F.col(ts_col)] if ts_col in stream.columns else []
    cols += [F.col(c) for c in stream.columns if c not in (json_col, ts_col)]
    for out_name, (kind, *path) in fields.items():
        cols.append(getters[kind](json_col, *path).alias(out_name))
    return stream.select(*cols)


def windowed_json_counts(
    stream: DataFrame,
    json_col: str,
    key_path: tuple,
    *,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts grouped by a JSON-extracted
    key: the canonical streaming composition (readStream → extract →
    withWatermark → window/groupBy). Late rows beyond the watermark are
    dropped by Spark's state store; state size stays bounded."""
    extracted = stream.withColumn(
        "_key", jsonf.json_as_text(json_col, *key_path)
    ).withWatermark(ts_col, watermark)
    return extracted.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col("_key")
    ).agg(F.count("*").alias("n"))
