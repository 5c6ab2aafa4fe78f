"""Grouped distribution statistics: exact and sketch-based percentiles.

``grouped_percentiles(exact=True)`` uses Spark's ``percentile`` — exact
linear interpolation (DuckDB ``quantile_cont`` semantics), but the
aggregation state holds every value per group, so memory is O(group
size): correct for oracle checks and small/medium groups, wrong for a
100 TB fact column. ``exact=False`` switches to ``percentile_approx``
(Greenwald-Khanna sketch): bounded state (O(accuracy) per group),
MERGEABLE partial aggregates — the map-side combine actually collapses,
and the answer is within ``1/accuracy`` rank error. That mergeability
is the whole scale story: sketches ride the normal partial/final
aggregation path, so the shuffle moves one small sketch per
(partition, group) instead of every value.

Reference scope note: the reference engine has no aggregate functions —
this belongs to the LLM-pipeline extension suite (curation thresholds,
length/score distribution monitoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_percentiles"]


def grouped_percentiles(
    df: DataFrame,
    group_cols,
    value_col: str,
    probs=(0.5, 0.9, 0.99),
    *,
    exact: bool = True,
    accuracy: int = 10000,
    round_decimals: int | None = 4,
) -> DataFrame:
    """One row per group with a ``p<prob>`` column per requested
    quantile, plus ``n`` (group size). ``exact=False`` uses the GK
    sketch with ``accuracy`` (rank error ≤ 1/accuracy) — the only
    memory-safe choice when groups can hold billions of rows."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(value_col)
    aggs = []
    for p in probs:
        frac = str(p).replace("0.", "").rstrip("0") or "0"
        name = f"p{frac.replace('.', '_')}"  # p=1.0 -> p1_, never a dotted name
        c = (
            F.percentile(v, F.lit(float(p)))
            if exact
            else F.percentile_approx(v, F.lit(float(p)), F.lit(int(accuracy)))
        )
        if round_decimals is not None:
            c = F.round(c, round_decimals)
        aggs.append(c.alias(name))
    aggs.append(F.count(v).alias("n"))
    return df.groupBy(*groups).agg(*aggs)
