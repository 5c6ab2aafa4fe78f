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

__all__ = ["top_k_per_group", "rrf_fuse"]

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


def rrf_fuse(
    rankings: list,
    id_cols,
    *,
    rank_col: str = "rnk",
    k: int = 60,
    score_col: str = "rrf_score",
    found_col: str | None = "n_lists",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists:
    ``score(d) = Σ_lists 1 / (k + rank_list(d))`` — the standard
    zero-tuning way to combine lexical (BM25) and semantic (embedding
    cosine) retrieval into one hybrid ranking, and the fusion rule most
    hybrid-search engines ship as the default.

    Each input frame carries the document key ``id_cols`` plus a
    1-based integer ``rank_col`` (produce them with
    :func:`top_k_per_group` / ``row_number``). Documents absent from a
    list simply contribute nothing (the top-k-truncated-list convention).
    ``found_col`` (optional) counts how many lists surfaced the doc —
    a useful confidence signal downstream.

    The score is ROUNDED to 9 decimals: each term 1/(k+r) is computed
    identically by any IEEE engine, but the SUM across lists is
    order-sensitive in the last bit once N > 2; terms are ≥ 1e-4-ish
    for sane k so a 1e-9 grain is far above the wobble and far below
    adjacent-score gaps.

    Scale shape: tag + union + one hash aggregation on the doc key —
    input volume is Σ list sizes (top-k truncated upstream), so this
    runs on candidate sets, never the corpus.
    """
    if not rankings:
        raise ValueError("rankings must be a non-empty list of DataFrames")
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    parts = [
        r.select(
            *ids,
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "_term"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    aggs = [F.round(F.sum("_term"), 9).alias(score_col)]
    if found_col is not None:
        aggs.append(F.count("*").cast("int").alias(found_col))
    return u.groupBy(*ids).agg(*aggs)
