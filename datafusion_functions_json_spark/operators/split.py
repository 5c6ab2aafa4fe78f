"""Dataset splitting and batch packing for training-data pipelines.

* ``hash_split`` — reproducible train/val/test assignment from a salted
  content hash. Stateless and shuffle-free: the split label is a pure
  projection over the id (scan-speed at 100 TB, no sampling pass, stable
  across reruns/engines — the property random ``df.sample`` lacks).
* ``stratified_sample`` — exact-count deterministic per-stratum sample
  (rank over the hash fraction; optional scan-side prefilter so huge
  strata never sort their full population).
* ``pack_batches`` — assign documents to fixed-token-budget batches.
  Packing is inherently sequential, so a *global* greedy pack would be a
  single-partition bottleneck; instead documents are sharded and packed
  shard-locally (one window per shard, all shards in parallel). The
  token budget is respected per batch boundary in prefix-sum terms:
  ``batch = floor(prefix_tokens_before / budget)`` — the standard
  deterministic approximation (a doc can straddle a boundary rather
  than open a fresh batch; over-long docs never stall packing).

Reference scope note: the reference engine has no pipeline operators —
this belongs to the LLM-pipeline extension suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cap_per_group",
    "hash_split",
    "leakage_safe_split",
    "split_fraction",
    "mixture_sample",
    "mixture_resample",
    "pack_batches",
    "pack_positions",
    "stratified_sample",
    "temperature_sample",
    "curriculum_rank",
    "weighted_sample",
]

_U32 = float(1 << 32)


def split_fraction(id_col, salt: str = "") -> Column:
    """Deterministic uniform-[0,1) fraction from a salted md5 of the id —
    the assignment primitive behind ``hash_split``. md5 (not xxhash64)
    so any engine can reproduce the exact split from the same ids."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(_U32)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    *,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Add a ``split`` label column assigning each row to one of the
    named fractions (dict order fixes the threshold order). Fractions
    must sum to 1 (±1e-9). Reproducible: same ids + salt ⇒ same split,
    on any engine, at any scale, regardless of partitioning."""
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bad = {k: v for k, v in splits.items() if not 0.0 <= v <= 1.0}
    if bad:
        # {'train': 1.5, 'val': -0.5} sums to 1 but assigns every row
        # to train — the sum check alone lets a typo corrupt the split
        raise ValueError(f"split fractions must be in [0, 1]: {bad}")
    frac = split_fraction(id_col, salt)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = frac < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    *,
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Compose a training mixture: keep each row with its source's
    sampling rate (``weights[source]``; unlisted sources keep
    ``default``). Deterministic — the keep/drop decision is
    ``split_fraction(id, salt) < rate``, a pure projection — so the
    same corpus + salt reproduces the same mixture on any engine, and
    re-runs (or a resumed 100 TB job) never re-roll the dice. Rates >
    1 are clamped (use duplication-free upsampling downstream).

    One broadcast map lookup + one filter: scan-speed, no shuffle.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    rate = _rate_expr(source_col, weights, default, clamp=True)
    return df.filter(split_fraction(id_col, salt) < rate)


def _rate_expr(source_col: str, weights: dict, default: float, clamp: bool):
    rate = None
    for name, w in weights.items():
        w = float(w)
        if clamp:
            w = min(w, 1.0)
        cond = F.col(source_col) == name
        rate = (
            F.when(cond, F.lit(w)) if rate is None else rate.when(cond, F.lit(w))
        )
    return rate.otherwise(F.lit(float(default)))


def mixture_resample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    *,
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """:func:`mixture_sample` with UPSAMPLING: rates above 1 duplicate
    rows — each row is emitted ``floor(rate)`` or ``ceil(rate)`` times
    (the salted hash fraction decides, so expected multiplicity equals
    the rate exactly and reruns are identical). Adds a 1-based ``copy``
    column so downstream exact-dedup can distinguish intentional
    duplicates. Zero-copy rows drop. Fan-out is a `sequence`+`explode`
    projection — no shuffle, no Python."""
    if not weights:
        raise ValueError("weights must be non-empty")
    rate = _rate_expr(source_col, weights, default, clamp=False)
    frac = split_fraction(id_col, salt)
    n = F.floor(rate) + (frac < (rate - F.floor(rate))).cast("bigint")
    copies = F.when(n >= 1, F.sequence(F.lit(1).cast("bigint"), n)).otherwise(
        F.array().cast("array<bigint>")
    )
    return df.withColumn("copy", F.explode(copies))


def pack_batches(
    df: DataFrame,
    id_col: str,
    n_tokens: Column | str,
    *,
    budget: int,
    shards: int = 32,
    shard_expr: Column | None = None,
    order_by: list | None = None,
) -> DataFrame:
    """Assign each row to ``(shard, batch_id)`` with ~``budget`` tokens
    per batch, packing shard-locally in id order.

    One hash shuffle keyed by shard, then a per-shard window prefix sum —
    ``shards`` bounds both the parallelism and the largest window
    partition (corpus_tokens / shards per task at 100 TB; raise
    ``shards`` with cluster size). Default shard key is
    ``pmod(xxhash64(id), shards)`` to decorrelate from id locality;
    pass ``shard_expr`` (e.g. ``pmod(id, shards)``) for cross-engine
    reproducibility. ``order_by`` (default ``[id_col]``) must be a
    unique key within each shard — a tie would make batch assignment
    nondeterministic (pass e.g. ``[doc_id, chunk_id]`` for chunked
    rows).
    """
    return _packed_prefix(
        df, id_col, n_tokens, budget, shards, shard_expr, order_by
    ).withColumn(
        "batch_id",
        F.floor(F.col("_prefix") / F.lit(budget)).cast("bigint"),
    ).drop("_prefix")


def _packed_prefix(
    df, id_col, n_tokens, budget, shards, shard_expr, order_by
) -> DataFrame:
    """Shared packing core for :func:`pack_batches` /
    :func:`pack_positions`: shard assignment + the per-shard token
    prefix sum as ``_prefix`` — ONE definition so the shard hashing and
    window semantics can never silently diverge between the two."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    tok = F.col(n_tokens) if isinstance(n_tokens, str) else n_tokens
    # caller-supplied shard keys keep their type (e.g. split-pure string
    # labels like 'train#7'); only the default hash shard is an int
    shard = (
        shard_expr
        if shard_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int")
    )
    out = df.withColumn("shard", shard).withColumn(
        "n_tokens", tok.cast("bigint")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(*(order_by or [id_col]))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return out.withColumn(
        "_prefix", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )


def pack_positions(
    df: DataFrame,
    id_col: str,
    n_tokens: Column | str,
    *,
    budget: int,
    shards: int = 32,
    shard_expr: Column | None = None,
    order_by: list | None = None,
) -> DataFrame:
    """:func:`pack_batches` plus the within-batch token span each
    document occupies: ``seq_start`` / ``seq_end`` (0-based, end
    exclusive) — exactly what loss masking and attention-boundary
    construction (block-diagonal masks, no cross-doc attention) need
    when documents are concatenated into fixed-budget sequences.

    Same single shard-keyed exchange and prefix-sum window as
    :func:`pack_batches` (the span is derived from the SAME prefix, no
    extra pass). Straddle semantics are inherited: a document crossing
    the budget boundary stays in the batch its first token landed in,
    so its ``seq_end`` may exceed ``budget`` — the trainer truncates or
    wraps; gaps never occur."""
    out = _packed_prefix(
        df, id_col, n_tokens, budget, shards, shard_expr, order_by
    )
    batch = F.floor(F.col("_prefix") / F.lit(budget)).cast("bigint")
    start = F.col("_prefix") - batch * F.lit(budget)
    return (
        out.withColumn("batch_id", batch)
        .withColumn("seq_start", start.cast("bigint"))
        .withColumn(
            "seq_end", (start + F.col("n_tokens")).cast("bigint")
        )
        .drop("_prefix")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    n_per_stratum: int | dict,
    *,
    salt: str = "",
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """Exact-count deterministic sample: the ``n`` rows per stratum with
    the smallest salted hash fractions (ties broken by id). Unlike
    ``df.sampleBy`` this is (a) an exact count, not an expected rate,
    and (b) reproducible on any engine from ids alone — the selection
    is a rank over :func:`split_fraction`, no RNG state.

    ``n_per_stratum`` is an int (same budget everywhere) or a
    ``{stratum: n}`` dict (unlisted strata are dropped).

    Plan shape: one hash shuffle on the stratum key + a per-stratum
    rank. At 100 TB the sort-within-stratum dominates; for big strata
    pass ``prefilter_fraction`` (≳ several × n/|stratum|) to cut rows
    by the pure hash projection BEFORE the shuffle — the window then
    ranks only the surviving sliver. The filter is over the same
    fraction the rank orders by, so any row it drops could never be
    selected: results are identical as long as each stratum keeps ≥ n
    rows (too-small a prefilter under-fills silently — size it
    generously; it is a pure scan-side projection, overshoot is cheap).
    """
    frac = split_fraction(id_col, salt)
    if prefilter_fraction is not None:
        df = df.filter(frac < float(prefilter_fraction))
    w = Window.partitionBy(strata_col).orderBy(
        frac.asc(), F.col(id_col).asc()
    )
    ranked = df.withColumn("_rank", F.row_number().over(w))
    if isinstance(n_per_stratum, dict):
        budget = None
        for name, n in n_per_stratum.items():
            cond = F.col(strata_col) == name
            budget = (
                F.when(cond, F.lit(int(n)))
                if budget is None
                else budget.when(cond, F.lit(int(n)))
            )
        budget = budget.otherwise(F.lit(0))
    else:
        budget = F.lit(int(n_per_stratum))
    return ranked.filter(F.col("_rank") <= budget).drop("_rank")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col,
    id_col: str,
    k: int,
    *,
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``k`` rows per ``group_col`` value, preferring the
    highest ``order_col`` (ties → min id; NULLs lose) — domain capping,
    the crawl-corpus balancing step that stops a handful of boilerplate
    domains from dominating the mixture while keeping each domain's
    best-quality documents. ``descending=False`` flips the preference.

    Deterministic (pure ordering, no RNG), unlike ``df.sampleBy``.
    Contrast :func:`stratified_sample`, which picks a hash-random subset
    per stratum; this picks the TOP-of-an-ordering subset.

    Plan shape: one hash shuffle on the group key, and the ``rank <= k``
    filter plans as WindowGroupLimit — Spark keeps a running top-k per
    group on the map side BEFORE the shuffle, so a 100 TB group never
    materializes, sorts, or even transfers more than ~k rows per input
    partition.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    o = F.col(order_col) if isinstance(order_col, str) else order_col
    first = o.desc_nulls_last() if descending else o.asc_nulls_last()
    w = Window.partitionBy(group_col).orderBy(first, F.col(id_col).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= F.lit(int(k)))
        .drop("_rank")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    k: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Weighted sample WITHOUT replacement of exactly ``k`` rows
    (fewer if the eligible input is smaller): the A-ES exponential-sort
    scheme (Efraimidis & Spirakis) — every row draws a key
    ``u^(1/w)`` with ``u`` uniform-[0,1), and the k largest keys win.
    Inclusion probability is proportional to weight, and because ``u``
    comes from :func:`split_fraction`'s salted md5 of the id, the
    selection is fully DETERMINISTIC: same ids + weights + salt pick
    the same rows on any engine, at any scale, under any partitioning —
    reproducible corpus subsampling you can re-derive years later.

    Plan shape: a pure projection computes the key, then a global
    top-k — ``TakeOrderedAndProject`` (per-partition partial top-k, no
    full sort, no shuffle of the data — only k rows per partition reach
    the driver-side merge). Rows with NULL, zero, or negative weight
    are excluded (their inclusion probability is 0).

    The ordering is computed in LOG space: ``u^(1/w)`` descending is
    equivalent to ``ln(-ln u) - ln w`` ascending, and the log key stays
    O(1)-magnitude for ANY weight scale — the direct ``pow`` key
    saturates to 1.0 once ``1 - u^(1/w)`` drops below rounding
    granularity (w ≳ 1e11), which would silently degrade the sample to
    id-order. The key is rounded to 12 decimals before ordering:
    ``log`` may differ in the last ulp across libm implementations, and
    an unrounded key would let that reorder near-tied rows at the k-th
    boundary on a different engine. After rounding, genuinely-close
    keys compare EQUAL everywhere and fall through to the deterministic
    id tie-break — that's what makes the "identical rows on any engine"
    guarantee hold (the oracle twin rounds identically).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # clamp u away from 0 (md5 prefix 00000000 happens once per ~4e9
    # ids): ln(0) is NULL on Spark and an error on DuckDB. Half the
    # u-grid spacing preserves the ordering of every nonzero draw and
    # gives the zero draw least priority, on both engines.
    u = F.greatest(split_fraction(id_col, salt), F.lit(0.5 / _U32))
    key = F.round(F.log(-F.log(u)) - F.log(w.cast("double")), 12)
    eligible = df.filter(w.isNotNull() & (w.cast("double") > 0))
    return (
        eligible.withColumn("__wkey", key)
        .orderBy(F.col("__wkey").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__wkey")
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    *,
    alpha: float = 0.5,
    budget: int = 1000,
    salt: str = "",
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual α-sampling
    of mT5/XLM-R, UniMax-style budgeting): source ``s`` with ``n_s``
    rows gets a target of ``floor(budget * n_s^alpha / Σ n^alpha)``
    rows (capped at ``n_s``), then the target count is drawn per source
    with the deterministic smallest-hash-fraction rank of
    :func:`stratified_sample`. ``alpha=1`` reproduces the natural
    distribution, ``alpha=0`` equalizes sources; 0.2-0.7 is the usual
    low-resource-upweighting band.

    Deterministic and engine-reproducible: selection is rank-over-md5;
    the per-source target rounds the α-weighted share to 9 decimals
    before ``floor`` so cross-engine ``pow`` last-ulp wobble cannot
    move a row across the floor boundary.

    Plan shape: one tiny per-source count aggregation (k sources) whose
    α-shares join back as a BROADCAST (k rows), then one shuffle on the
    source key for the rank window — same cost as one stratified
    sample. For 100 TB strata pass ``prefilter_fraction`` to cut the
    ranked population scan-side (same correctness condition as
    :func:`stratified_sample`).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = df.groupBy(F.col(source_col).alias("_src")).agg(
        F.count("*").alias("_n")
    )
    weighted = counts.withColumn(
        "_w", F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    )
    totals = weighted.agg(F.sum("_w").alias("_tot"))
    targets = (
        weighted.crossJoin(F.broadcast(totals))
        .withColumn(
            "_target",
            F.least(
                F.col("_n"),
                F.floor(
                    F.round(
                        F.lit(int(budget)) * F.col("_w") / F.col("_tot"), 9
                    )
                ),
            ),
        )
        .select("_src", "_target")
    )
    frac = split_fraction(id_col, salt)
    if prefilter_fraction is not None:
        df = df.filter(frac < float(prefilter_fraction))
    w = Window.partitionBy(source_col).orderBy(frac.asc(), F.col(id_col).asc())
    ranked = df.withColumn("_rank", F.row_number().over(w))
    return (
        ranked.join(
            F.broadcast(targets),
            ranked[source_col] == F.col("_src"),
        )
        .filter(F.col("_rank") <= F.col("_target"))
        .drop("_rank", "_src", "_target")
    )


def curriculum_rank(
    df: DataFrame,
    id_col: str,
    score_col,
    *,
    n_buckets: int = 64,
    lo: float = 0.0,
    hi: float = 1.0,
    out_col: str = "curriculum_rank",
) -> DataFrame:
    """Global 1-based curriculum position by ``(score, id)`` WITHOUT a
    global sort: the total order a curriculum schedule needs (easy →
    hard), built scale-first.

    A naive ``row_number() over (order by score)`` moves every row
    through ONE partition — the classic 100 TB bottleneck. Instead:

    1. rows bucket by fixed-width score range (``[lo, hi)`` split into
       ``n_buckets``; out-of-range clamps to the edge buckets) — a pure
       projection;
    2. each bucket ranks independently (window partitioned BY bucket —
       parallel across buckets);
    3. bucket sizes (an ``n_buckets``-row aggregate) turn into
       cumulative offsets with one tiny window, broadcast back;
    4. global position = bucket offset + within-bucket rank.

    Equals the single-partition ``row_number`` exactly (ties broken by
    id) at any partitioning. Bucket skew is score-distribution skew:
    pick ``n_buckets``/bounds so no single score range holds a
    disproportionate mass, or pre-transform the score."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if not hi > lo:
        raise ValueError("need hi > lo")
    s = F.col(score_col) if isinstance(score_col, str) else score_col
    bucket = F.least(
        F.greatest(
            F.floor((s - F.lit(float(lo))) / F.lit(float(hi - lo)) * n_buckets),
            F.lit(0).cast("bigint"),
        ),
        F.lit(int(n_buckets) - 1).cast("bigint"),
    )
    b = df.withColumn("_bkt", bucket).withColumn("_s", s.cast("double"))
    w = Window.partitionBy("_bkt").orderBy(F.col("_s").asc(), F.col(id_col).asc())
    ranked = b.withColumn("_r", F.row_number().over(w))
    sizes = b.groupBy("_bkt").agg(F.count("*").alias("_n"))
    off_w = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0))
    ).select("_bkt", "_off")
    return (
        ranked.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, (F.col("_off") + F.col("_r")).cast("bigint"))
        .drop("_bkt", "_s", "_r", "_off")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    edges: DataFrame,
    splits: dict[str, float] | None = None,
    *,
    src: str = "src",
    dst: str = "dst",
    salt: str = "",
    out_col: str = "split",
    group_col: str = "split_group",
) -> DataFrame:
    """:func:`hash_split` that cannot leak near-duplicates across
    splits: rows connected by ``edges`` (a near-dup pair list from
    MinHash/SimHash/embedding candidates) are first clustered with
    :func:`~.graph.connected_components`, and the split is assigned
    from the salted hash of the COMPONENT representative, so an entire
    duplicate cluster lands in one split. Rows absent from the edge
    list are their own singleton group (``coalesce(comp, id)``).

    This is the eval-integrity primitive: a plain per-id split puts one
    copy of a duplicated document in train and its twin in test, and
    the model gets judged on memorized text. Splitting by component
    closes that hole *transitively* (A~B, B~C ⇒ A, B, C together —
    exactly the chain one-shot pair dedup misses).

    Output adds ``group_col`` (the component representative driving the
    assignment) and ``out_col``. Scale shape: the component table is
    edge-vertex-sized (dup pairs only, not the corpus), the join back
    is keyed on the id, and the split label stays a pure projection —
    the corpus itself never shuffles on content.
    """
    from . import graph

    # internal names prefixed so a df that already carries node/comp
    # columns (it owns the vertex table too) can't collide
    comps = graph.connected_components(edges, src, dst).select(
        F.col("node").alias("__lss_node"), F.col("comp").alias("__lss_comp")
    )
    joined = (
        df.join(comps, df[id_col] == comps["__lss_node"], "left")
        .drop("__lss_node")
        .withColumn(
            group_col, F.coalesce(F.col("__lss_comp"), F.col(id_col))
        )
        .drop("__lss_comp")
    )
    return hash_split(joined, group_col, splits, salt=salt, out_col=out_col)
