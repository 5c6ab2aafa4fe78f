"""Grouped top-k selection — the "best N examples per bucket" primitive
curation pipelines reach for constantly (top documents per language by
quality, top URLs per domain, hardest examples per class).

``top_k_per_group`` is the window formulation: ``row_number()`` over a
``(group) partitionBy / (order) orderBy`` window, filtered to ``<= k``.
At scale this is ONE hash exchange on the group key followed by a
per-partition sort — Spark pushes a ``WindowGroupLimit`` (partial top-k
per input partition BEFORE the shuffle, Spark 3.5+) when the window
function is ``row_number``/``rank`` under a ``<= k`` filter, so the
exchange moves at most ``k`` rows per group per map partition rather
than everything. That is the same partial-top-k shape as
``TakeOrderedAndProject`` for the global case (similarity.cosine_topk).

Determinism: callers must make the ordering total (tie-break columns)
if they need reproducible membership — same contract as SQL
``row_number``. ``rank``/``dense_rank`` modes keep ALL tied rows at the
boundary instead (output can exceed k; membership is deterministic
without a tie-break).

Reference scope note: the reference engine (datafusion-functions-json)
has no relational operators of its own — this belongs to the inherited
relational surface (SURVEY §2.4 composition) and the LLM-pipeline
extension suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_k_per_group"]

_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_k_per_group(
    df: DataFrame,
    group_cols,
    order_cols,
    k: int,
    *,
    mode: str = "row_number",
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``k`` rows of every group.

    Parameters
    ----------
    group_cols : str | list[str]
        Grouping key(s).
    order_cols : Column | str | list
        Ordering; pass descending Columns (``F.col("x").desc()``) for
        "largest first". Strings order ascending.
    k : int
        Rows kept per group (``rank`` modes may keep boundary ties).
    mode : "row_number" | "rank" | "dense_rank"
        row_number = exactly k rows (ties broken by sort order);
        rank/dense_rank = ties at the boundary all survive.
    rank_col : str | None
        When set, the 1-based rank is kept under this name; otherwise
        it is dropped from the output.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    try:
        ranker = _RANKERS[mode]
    except KeyError:
        raise ValueError(
            f"mode must be one of {sorted(_RANKERS)}, got {mode!r}"
        ) from None
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    orders = (
        [order_cols]
        if isinstance(order_cols, (str,)) or not isinstance(order_cols, (list, tuple))
        else list(order_cols)
    )
    w = Window.partitionBy(*groups).orderBy(*orders)
    name = rank_col or "__rk"
    out = df.withColumn(name, ranker().over(w)).filter(F.col(name) <= k)
    return out if rank_col else out.drop(name)
