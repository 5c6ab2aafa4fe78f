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

__all__ = ["grouped_percentiles", "cohort_retention"]


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
        # Deterministic, SQL-safe column names: fixed-decimal formatting
        # (never scientific notation — 1e-05 -> p00001) with float repr
        # artifacts truncated (0.30000000000000004 -> p3). 0.5 -> p5,
        # 0.99 -> p99, 1.0 -> p1_ (suffix keeps it distinct from 0.1's p1).
        s = f"{float(p):.10f}".rstrip("0").rstrip(".")
        if s.startswith("0."):
            name = "p" + s[2:]
        elif s == "0":
            name = "p0"
        else:
            name = "p" + s.replace(".", "_") + "_"
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


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period_seconds: int = 604800,
    max_offset: int = 3,
) -> DataFrame:
    """Cohort retention: ``(cohort_period, period_offset, n_users)`` —
    users grouped by the period of their FIRST event, counted as
    retained in each later period they appear in (offset 0 is the
    cohort size itself). The standard activation/decay view over an
    event stream, epoch-aligned periods (default weekly) so results are
    engine-reproducible.

    Plan shape: one user-keyed hash agg for first-seen (map-side
    partial), one shuffle join back on the user key (both sides hash on
    ``user`` — with AQE the exchange is reused), then a distinct-count
    agg on (cohort, offset) — Spark's two-phase distinct Expand. No
    window, no per-user loop; at 100 TB every step is a keyed
    partial-agg shuffle."""
    from pyspark.sql import types as T

    ts_dt = df.schema[ts_col].dataType
    tcol = F.col(ts_col)
    if isinstance(ts_dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        tcol = tcol.cast("timestamp")
    period = F.floor(tcol.cast("double") / float(period_seconds)).cast("long")
    ev = df.select(F.col(user_col).alias("user"), period.alias("w")).filter(
        F.col("user").isNotNull() & F.col("w").isNotNull()
    )
    first = ev.groupBy("user").agg(F.min("w").alias("cohort_period"))
    j = ev.join(first, "user").withColumn(
        "period_offset", F.col("w") - F.col("cohort_period")
    )
    return (
        j.filter(F.col("period_offset") <= max_offset)
        .groupBy("cohort_period", "period_offset")
        .agg(F.countDistinct("user").alias("n_users"))
    )
