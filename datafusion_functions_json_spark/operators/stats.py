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

__all__ = [
    "grouped_percentiles",
    "cohort_retention",
    "skew_report",
    "distribution_drift",
    "grouped_drift",
    "psi",
]


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


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    *,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Token-distribution drift between two corpus snapshots: KL
    divergences (both directions), Jensen-Shannon divergence, and total
    variation distance over the smoothed unigram distributions — the
    monitoring complement to :func:`~.cdc.snapshot_diff` (that one says
    WHICH rows changed; this one says whether the corpus' language
    moved, e.g. after a merge wave or a source being turned off).

    Additive smoothing ``alpha`` over the UNION vocabulary keeps both
    KLs finite when a token exists on one side only. Returns one row:
    ``(n_tokens_old, n_tokens_new, vocab, kl_old_new, kl_new_old, js,
    tv)``, each divergence ROUNDED to ``round_to`` decimals (the
    vocab-sized log-sums differ in the last bits across engines).

    Scale shape: two token-count aggregations (map-side partial), one
    vocab-sized full-outer join on the token, one global agg — the
    corpus shuffles 8-byte counts keyed by token, never documents.
    Natural-log based (nats).
    """
    return _drift_impl(
        old, new, text_col, None, alpha=alpha, round_to=round_to
    )


def grouped_drift(
    old: DataFrame,
    new: DataFrame,
    group_col: str,
    text_col: str = "text",
    *,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Per-group :func:`distribution_drift` — one divergence row per
    ``group_col`` value (source, language, domain bucket), answering
    the question the global number can't: WHICH slice of the corpus
    moved. Groups present on only one side still report (the other
    side's distribution is the pure-smoothing uniform, so their
    divergence is large — a source turned off IS drift).

    Same arithmetic and smoothing as the global version; totals join
    keyed by group instead of broadcasting (group count is unbounded),
    so everything stays (group, token)-keyed partial aggregation."""
    return _drift_impl(
        old, new, text_col, group_col, alpha=alpha, round_to=round_to
    )


def _drift_impl(old, new, text_col, group_col, *, alpha, round_to):
    from . import text as _text

    gcols = [group_col] if group_col else []

    def counts(df, side):
        return (
            df.select(
                *gcols,
                F.explode(_text.tokens(F.col(text_col))).alias("tok"),
            )
            .groupBy(*gcols, "tok")
            .agg(F.count("*").alias(f"c_{side}"))
        )

    a = float(alpha)
    if a <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    # NULL-safe joins throughout: a NULL group value (unattributed
    # docs) is a legitimate slice. Plain equi-joins never match
    # NULL=NULL, so the full-outer would split the NULL slice's
    # c_old/c_new onto separate rows and the inner totals join would
    # then drop the slice entirely — the one slice you couldn't see
    # move.
    co, cn = counts(old, "old").alias("co"), counts(new, "new").alias("cn")
    keys = [*gcols, "tok"]
    cond = None
    for k in keys:
        c = F.col(f"co.{k}").eqNullSafe(F.col(f"cn.{k}"))
        cond = c if cond is None else (cond & c)
    j = co.join(cn, cond, "full_outer").select(
        *[F.coalesce(F.col(f"co.{g}"), F.col(f"cn.{g}")).alias(g) for g in gcols],
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    tot = j.groupBy(*gcols).agg(
        F.sum("c_old").alias("n_old"),
        F.sum("c_new").alias("n_new"),
        F.count("*").alias("v"),
    )
    if group_col:
        # group-keyed totals (groups unbounded), NULL-safe on the key
        jl, tl = j.alias("jl"), tot.alias("tl")
        gcond = None
        for g in gcols:
            c = F.col(f"jl.{g}").eqNullSafe(F.col(f"tl.{g}"))
            gcond = c if gcond is None else (gcond & c)
        jt = jl.join(tl, gcond).select(
            "jl.*", F.col("tl.n_old"), F.col("tl.n_new"), F.col("tl.v")
        )
    else:
        jt = j.crossJoin(F.broadcast(tot))  # 1-row totals broadcast
    p = (F.col("c_old") + a) / (F.col("n_old") + a * F.col("v"))
    q = (F.col("c_new") + a) / (F.col("n_new") + a * F.col("v"))
    m = (p + q) / 2
    return jt.groupBy(*gcols).agg(
        F.max("n_old").cast("bigint").alias("n_tokens_old"),
        F.max("n_new").cast("bigint").alias("n_tokens_new"),
        F.max("v").cast("bigint").alias("vocab"),
        F.round(F.sum(p * F.log(p / q)), round_to).alias("kl_old_new"),
        F.round(F.sum(q * F.log(q / p)), round_to).alias("kl_new_old"),
        F.round(
            F.sum(p * F.log(p / m) / 2 + q * F.log(q / m) / 2), round_to
        ).alias("js"),
        F.round(F.sum(F.abs(p - q)) / 2, round_to).alias("tv"),
    )


def psi(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Population stability index over a numeric column — the standard
    ML-monitoring drift score for scores/norms/lengths (the numeric twin
    of :func:`distribution_drift`): fixed ``bins`` equal-width buckets
    on ``[lo, hi)`` plus under/overflow buckets, additive-smoothed
    shares, ``PSI = Σ (p - q) · ln(p / q)``.

    Fixed EXPLICIT bounds, not data-derived quantiles: the bucketing
    must be identical across snapshots (and engines) for shares to be
    comparable — derive ``lo``/``hi`` once from the baseline and pin
    them in the monitor config. Rule-of-thumb reading: < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate.

    Returns one row ``(n_old, n_new, psi)`` plus the per-bucket table
    columns folded in via ``round_to`` rounding. NULL values are
    dropped (they carry no position on the axis; track the null RATE
    with :func:`~.validate.check_constraints`). Scale: one partial-agg
    histogram pass per side (bins+2 cells each), a cells-sized join —
    nothing corpus-sized moves.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got lo={lo}, hi={hi}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    w = (float(hi) - float(lo)) / bins

    def hist(df, side):
        v = F.col(value_col).cast("double")
        b = (
            F.when(v < F.lit(float(lo)), F.lit(-1))
            .when(v >= F.lit(float(hi)), F.lit(bins))
            .otherwise(
                F.floor((v - F.lit(float(lo))) / F.lit(w)).cast("int")
            )
        )
        return (
            df.filter(v.isNotNull())
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias(f"c_{side}"))
        )

    # full bucket spine (bins + under/overflow): a bucket EMPTY on both
    # sides still contributes its smoothed (p - q)·ln(p/q) term when the
    # corpus sizes differ — joining observed buckets only would silently
    # drop it
    spine = (
        old.sparkSession.range(-1, bins + 1)
        .select(F.col("id").cast("int").alias("bucket"))
    )
    j = (
        spine.join(hist(old, "old"), "bucket", "left")
        .join(hist(new, "new"), "bucket", "left")
        .select(
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
    )
    a = float(alpha)
    nb = bins + 2  # + under/overflow
    tot = j.agg(F.sum("c_old").alias("n_old"), F.sum("c_new").alias("n_new"))
    jt = j.crossJoin(F.broadcast(tot))
    p = (F.col("c_old") + a) / (F.col("n_old") + a * F.lit(nb))
    q = (F.col("c_new") + a) / (F.col("n_new") + a * F.lit(nb))
    return jt.agg(
        F.max("n_old").cast("bigint").alias("n_old"),
        F.max("n_new").cast("bigint").alias("n_new"),
        F.round(F.sum((p - q) * F.log(p / q)), round_to).alias("psi"),
    )
