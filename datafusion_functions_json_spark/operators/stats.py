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

__all__ = ["grouped_percentiles", "cohort_retention", "skew_report"]


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


def skew_report(df: DataFrame, key, k: int = 20) -> DataFrame:
    """Key-skew diagnosis for a planned shuffle: the top-``k`` hottest
    values of ``key`` with their row counts, share of the table, and
    the ratio to a perfectly uniform distribution — the numbers that
    decide between a plain shuffle join, :func:`~.joins.salted_join`,
    and AQE skew-split before you burn a 100 TB shuffle discovering a
    hot key the hard way.

    Returns one row per hot key, ordered by (n desc, key asc):
    ``(key, n, share, skew_vs_uniform, total_rows, distinct_keys)``
    with share and skew_vs_uniform = ``n / (total/distinct)`` rounded
    to 6 decimals (1.0 = perfectly uniform; 100 = this key is 100x a
    fair share — salt it). 6 decimals, not 2: coarse rounding lands
    ratios like 1.275 on a half-tie where engines disagree on the
    binary double's direction; at 6 the division's decimal expansion
    is usually exact and rounding is a no-op.

    Plan shape: one partial-agg count per key (map-side combine
    collapses the scan), one 1-row global agg over the count table,
    broadcast back (1 row), and a global top-k
    (TakeOrderedAndProject — no full sort). Scales as a count-distinct,
    never collects.
    """
    kc = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(kc.alias("key")).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_distinct")
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("share"),
            F.round(
                F.col("n") / (F.col("_total") / F.col("_distinct")), 6
            ).alias("skew_vs_uniform"),
            F.col("_total").alias("total_rows"),
            F.col("_distinct").alias("distinct_keys"),
        )
        .orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(k)
    )
