"""Mergeable-sketch operators: bounded-memory frequent items.

The aggregation patterns here target the cardinality problem a 100 TB
corpus poses: a full ``groupBy(item).count()`` shuffles one row per
DISTINCT item, and a web-scale token/URL/domain column has billions of
distinct values even though the caller only wants the top-k. The
operators below bound executor memory AND the exchange with classic
mergeable summaries (Agarwal et al., "Mergeable Summaries", PODS'12),
then make the final answer EXACT with a second candidates-only pass —
the standard two-pass heavy-hitters discipline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["misra_gries_candidates", "heavy_hitters"]


def _mg_trim(counts: dict, capacity: int) -> dict:
    """Mergeable Misra-Gries trim: subtract the (capacity+1)-th largest
    count from everything and drop the non-positive remainder. Keeps at
    most ``capacity`` counters while preserving the MG lower-bound
    invariant (each surviving count underestimates the true partition
    count by at most the total decrement)."""
    if len(counts) <= capacity:
        return counts
    d = sorted(counts.values(), reverse=True)[capacity]
    return {i: c - d for i, c in counts.items() if c > d}


def misra_gries_candidates(
    df: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ``(item, lb)`` with at most
    ``capacity`` rows per partition, where ``lb`` lower-bounds the
    item's count within its partition.

    Guarantee (union over partitions): any item with global count
    > N/capacity survives in at least one partition's summary — if it
    were trimmed everywhere, its count would be at most
    sum_p(n_p/capacity) = N/capacity.

    Executor memory is O(capacity) regardless of the column's distinct
    cardinality — this is the piece a plain hash aggregation cannot
    promise on an unbounded-vocabulary column. Arrow-batched
    ``mapInPandas``; the summary dict lives across batches of one
    partition and is emitted once at iterator exhaustion.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    items = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )

    def mg(batches):
        counts: dict = {}
        for pdf in batches:
            for it, c in pdf["item"].value_counts().items():
                counts[it] = counts.get(it, 0) + int(c)
            counts = _mg_trim(counts, capacity)
        yield pd.DataFrame(
            {"item": list(counts.keys()), "lb": list(counts.values())}
        )

    return items.mapInPandas(mg, "item string, lb bigint")


def heavy_hitters(
    df: DataFrame, item_col: str, k: int, *, capacity: int | None = None
) -> DataFrame:
    """Top-k most frequent items with EXACT counts and bounded memory:
    (1) :func:`misra_gries_candidates` produces a per-partition
    candidate family (≤ capacity × partitions rows total), (2) the
    distinct candidates are broadcast back and only candidate
    occurrences are recounted exactly, (3) exact top-k by
    ``(count desc, item asc)`` via ``TakeOrderedAndProject``.

    Returns ``(item, cnt)``. The result equals the true top-k whenever
    the k-th most frequent item's count exceeds N/capacity (the MG
    union guarantee); otherwise it is the exact counts of a candidate
    superset's best k — callers size ``capacity`` (default ``8*k``)
    against their skew. Unlike ``groupBy.count().orderBy.limit``,
    neither executor memory nor the exchange ever scales with the
    column's distinct cardinality: the only full-data pass is the
    candidate semi-join (broadcast, map-side), and the recount
    aggregation carries candidate items only.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    capacity = capacity if capacity is not None else 8 * k
    items = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    cand = misra_gries_candidates(df, item_col, capacity).select("item").distinct()
    exact = (
        items.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
    )
    return exact.orderBy(F.col("cnt").desc(), F.col("item").asc()).limit(k)
