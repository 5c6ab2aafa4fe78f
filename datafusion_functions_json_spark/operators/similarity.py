"""Similarity search over embedding columns (array<float>).

Two tiers:

* **Brute-force cosine top-k** — the exactness baseline. Dot products are
  pure JVM expressions (``zip_with`` + ``aggregate``); top-k compiles to
  ``TakeOrderedAndProject``, which computes PARTIAL top-k per partition
  map-side and merges k·num_partitions rows at the driver — no full sort,
  no full shuffle. This scales linearly: at 100 TB it is one scan.
* **Random-hyperplane LSH** — the sublinear path. Bucket signatures are
  computed at scan speed; a query probes only its own bucket (plus
  optional multiprobe neighbors). For self-join near-dup detection the
  bucket column is the shuffle key, same discipline as minhash banding.

Float math notes: embeddings are cast to double before accumulation so
results are stable across Spark/duckdb; accumulation order inside
``aggregate`` is left-to-right element order — deterministic.
"""

from __future__ import annotations

import math
import random
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "l2_normalize",
    "quantize_int8",
    "dequantize_int8",
    "cosine_to_query",
    "cosine_to_query_np",
    "pair_cosine_np",
    "projection_matrix",
    "random_project",
    "cosine_topk",
    "lsh_bucket",
    "add_lsh_buckets",
    "ann_topk",
    "recall_at_k",
    "ivf_build",
    "ivf_build_distributed",
    "ivf_topk",
    "embedding_dup_pairs",
    "knn_graph",
    "class_centroids",
    "centroid_assign",
    "kmeans_fit",
    "semantic_dedup",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _lit_vec(q: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)).cast("double") for x in q])


def _dvec(c) -> Column:
    return F.transform(_col(c), lambda x: x.cast("double"))


def _plan_size_bytes(df: DataFrame):
    """Shared helper — see :func:`~..plans.plan_size_bytes`. None when
    the JVM plan stats are unreachable (e.g. Spark Connect, where
    ``df._jdf`` does not exist); callers treat unknown as LARGE (the
    large-input code path is never catastrophically wrong on small
    inputs, the reverse is)."""
    from ..plans import plan_size_bytes

    return plan_size_bytes(df)


def dot(a, b) -> Column:
    """Dot product of two array<numeric> columns (JVM: zip_with+aggregate)."""
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_dvec(a), lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(a) -> Column:
    """Unit-normalize an embedding (array<double> out). Zero vectors pass
    through unchanged (divide-by-1 guard) rather than yielding NaNs.
    Per-element division is an interpreted HOF — fine at dim≲100; for
    hot loops over wide embeddings use the numpy tier
    (:func:`cosine_to_query_np` pattern)."""
    n = l2_norm(a)
    safe = F.when(n == 0.0, F.lit(1.0)).otherwise(n)
    return F.transform(_dvec(a), lambda x: x / safe)


def quantize_int8(a, *, scale: float = 127.0) -> Column:
    """Symmetric int8 quantization of a unit-scale embedding:
    ``clamp(floor(x*scale + 0.5), -127, 127)`` per element
    (array<tinyint>). 4× storage cut for ANN candidate stages; pair with
    :func:`dequantize_int8`. Values outside [-1, 1] saturate (ANSI-safe:
    clamp happens BEFORE the tinyint cast, so overflow can't throw).
    ``floor(x+0.5)`` rather than ``round`` pins one rounding mode across
    engines (half-to-even/half-away ambiguity on exact .5)."""
    s = F.lit(float(scale))
    return F.transform(
        _dvec(a),
        lambda x: F.least(
            F.greatest(F.floor(x * s + F.lit(0.5)), F.lit(-127).cast("bigint")),
            F.lit(127).cast("bigint"),
        ).cast("tinyint"),
    )


def dequantize_int8(a, *, scale: float = 127.0) -> Column:
    """Inverse of :func:`quantize_int8` (array<double>, lossy)."""
    s = F.lit(float(scale))
    return F.transform(_col(a), lambda x: x.cast("double") / s)


def cosine_to_query(vec_col, query: Sequence[float]) -> Column:
    """Cosine similarity of each row's vector to a constant query vector.
    The query's norm is folded at plan time (python float)."""
    qn = math.sqrt(sum(float(x) * float(x) for x in query)) or 1.0
    return dot(vec_col, _lit_vec(query)) / (l2_norm(vec_col) * F.lit(qn))


def cosine_to_query_np(vec_col, query: Sequence[float]) -> Column:
    """Vectorized twin of :func:`cosine_to_query`: one Arrow-batched
    numpy matmul per batch instead of a per-element expression walk;
    same math (double accumulation), same results.

    Tier economics RE-MEASURED on Spark 4.1 at sf100 (round 15, 2M x
    64f rows, interleaved min-of-passes): the HOF twin costs ~0.45
    µs/row marginal vs this path's ~1.2 µs/row (the Arrow transfer of
    the full vector column dominates once the scan is wide), while
    this path's FIXED cost is ~0.15 s lower (no Python worker
    round-trip) — numpy wins under ~200k rows, the HOF twin wins
    above (sf100: hof 1.32 s vs np 2.71 s; sf0.1: np 0.29 s vs hof
    0.48 s). A fully-unrolled 2*dim-term codegen expression
    (F.get-per-element) was also measured and LOST everywhere
    (3.1-4.3 s at sf100 — per-element bounds checks beat the HOF
    loop's locality) and is deliberately not shipped.
    :func:`cosine_topk`'s default ``impl='auto'`` picks by plan-stats
    size."""
    q = np.asarray([float(x) for x in query], dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0

    @F.pandas_udf("double")
    def _cos(v: pd.Series) -> pd.Series:
        # NULL-safe: a None vector yields SQL NULL like the HOF twin
        # (np.vstack over a 0-d nan would otherwise crash the task)
        vals = v.tolist()
        valid = [i for i, x in enumerate(vals) if x is not None]
        out = [None] * len(vals)
        if valid:
            m = np.vstack([np.asarray(vals[i], dtype=np.float64) for i in valid])
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = 1.0
            cos = (m @ q) / (norms * qn)
            for j, i in enumerate(valid):
                out[i] = float(cos[j])
        return pd.Series(out, dtype="object")

    # asNondeterministic: optimizer hint ONLY (deterministic in fact) —
    # stops Catalyst duplicating the kernel when a consumer filters on
    # the score (guide §4.4; round-17 plan audit: ann_recall evaluated
    # _cos twice, the pushed copy below the exchange)
    return _cos.asNondeterministic()(_col(vec_col))


def pair_cosine_np(a_col, b_col) -> Column:
    """Row-wise cosine of two embedding columns via one Arrow-batched
    numpy kernel — the pairwise twin of :func:`cosine_to_query_np`
    (interpreted ``zip_with``+``aggregate`` HOFs cost ~10× more per
    element; see that function's note). Zero-norm rows divide by 1."""

    @F.pandas_udf("double")
    def _pc(a: pd.Series, b: pd.Series) -> pd.Series:
        # NULL-safe: either side None -> SQL NULL (HOF-twin parity)
        av, bv = a.tolist(), b.tolist()
        valid = [
            i for i in range(len(av)) if av[i] is not None and bv[i] is not None
        ]
        out = [None] * len(av)
        if valid:
            ma = np.vstack([np.asarray(av[i], dtype=np.float64) for i in valid])
            mb = np.vstack([np.asarray(bv[i], dtype=np.float64) for i in valid])
            num = np.einsum("ij,ij->i", ma, mb)
            na = np.linalg.norm(ma, axis=1)
            nb = np.linalg.norm(mb, axis=1)
            na[na == 0.0] = 1.0
            nb[nb == 0.0] = 1.0
            cos = num / (na * nb)
            for j, i in enumerate(valid):
                out[i] = float(cos[j])
        return pd.Series(out, dtype="object")

    return _pc(_col(a_col), _col(b_col))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    id_cols: Sequence[str] = ("vec_id",),
    impl: str = "auto",
) -> DataFrame:
    """Exact cosine top-k: scan + per-partition partial top-k
    (TakeOrderedAndProject). Returns id columns + ``cosine`` descending,
    ties broken by the first id column for determinism.

    ``impl``: 'auto' (default — pick by the optimized plan's size
    statistic, free at plan time: 'hof' above ~64 MB of input, which is
    ~200k 64-dim float rows, 'vectorized' below), 'vectorized' (numpy
    pandas UDF — lower fixed cost, wins on small inputs), or 'hof'
    (pure JVM zip_with/aggregate — ~2.7x cheaper per row on Spark 4.1,
    no Python workers; the 100 TB path). Crossover measured round 15
    at sf0.1/sf1/sf100 — see :func:`cosine_to_query_np`. Both impls
    produce identical rounded results (verified at sf100)."""
    if impl == "auto":
        sz = _plan_size_bytes(df)
        impl = "hof" if sz is None or sz > (64 << 20) else "vectorized"
    score = (
        cosine_to_query_np(vec_col, query)
        if impl == "vectorized"
        else cosine_to_query(vec_col, query)
    )
    out = df.select(
        *[F.col(c) for c in id_cols],
        F.round(score, 6).alias("cosine"),
    )
    order = [F.col("cosine").desc()] + [F.col(id_cols[0]).asc()]
    return out.orderBy(*order).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int):
    rnd = random.Random(seed)
    return [
        [rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec_col, dim: int, *, n_planes: int = 12, seed: int = 42) -> Column:
    """Random-hyperplane (SRP) LSH bucket id: one bit per hyperplane =
    sign of the projection; INT bucket in [0, 2^n_planes). JVM-only."""
    v = _dvec(vec_col)
    bits = []
    for i, h in enumerate(_hyperplanes(dim, n_planes, seed)):
        proj = dot(v, _lit_vec(h))
        bits.append(
            F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def add_lsh_buckets(
    df: DataFrame, vec_col: str, dim: int, *, n_planes: int = 12, seed: int = 42
) -> DataFrame:
    """Attach the LSH bucket column. At warehouse scale, persist this
    table partitioned/bucketed by ``lsh_bucket`` so ANN probes become
    partition-pruned scans."""
    return df.withColumn(
        "lsh_bucket", lsh_bucket(vec_col, dim, n_planes=n_planes, seed=seed)
    )


def ann_topk(
    df: DataFrame,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    *,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
    id_cols: Sequence[str] = ("vec_id",),
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (+ all buckets at
    Hamming distance ≤ ``multiprobe``), then exact cosine within.

    The bucket filter is a plain predicate — with a bucket-partitioned
    table it prunes at the source; otherwise it's still a scan-speed
    filter that skips the dot product for non-candidates (lazy CASE).
    """
    dim = len(query)
    # driver-side query signature (pure python, mirrors lsh_bucket)
    qsig = 0
    for i, h in enumerate(_hyperplanes(dim, n_planes, seed)):
        proj = sum(float(a) * float(b) for a, b in zip(query, h))
        if proj >= 0:
            qsig |= 1 << i
    if multiprobe < 0:
        raise ValueError(f"multiprobe must be >= 0, got {multiprobe}")
    # all buckets at Hamming distance <= multiprobe — generated fully
    # (the first cut silently capped at distance 2, so raising
    # multiprobe past 2 bought no recall). sum(C(n_planes, r)) probes;
    # bounded so a huge (n_planes, multiprobe) pair fails loudly
    # instead of building a million-element isin list.
    import itertools

    n_probes = sum(math.comb(n_planes, r) for r in range(multiprobe + 1))
    if n_probes > 65536:
        raise ValueError(
            f"multiprobe={multiprobe} over n_planes={n_planes} probes "
            f"{n_probes} buckets; lower multiprobe or n_planes (or use "
            "the IVF path)"
        )
    probes = {qsig}
    for r in range(1, multiprobe + 1):
        for combo in itertools.combinations(range(n_planes), r):
            mask = 0
            for i in combo:
                mask |= 1 << i
            probes.add(qsig ^ mask)
    bucketed = add_lsh_buckets(df, vec_col, dim, n_planes=n_planes, seed=seed)
    cand = bucketed.filter(F.col("lsh_bucket").isin(*sorted(probes)))
    return cosine_topk(cand, vec_col, query, k, id_cols=id_cols)


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    *,
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Evaluate an ANN result against the exact top-k: one row
    ``(k, hits, recall)``. Pure DataFrame (semi-join + count agg — both
    inputs are k rows, so this is a driver-free broadcast join however
    large the underlying corpus was). The standard acceptance gate for a
    tuned (n_planes, multiprobe, nprobe) operating point."""
    hits = approx.select(id_col).join(
        F.broadcast(exact.select(id_col)), id_col, "left_semi"
    )
    return hits.agg(
        F.lit(k).alias("k"),
        F.count("*").alias("hits"),
        (F.count("*") / F.lit(float(k))).alias("recall"),
    )


def ivf_build(
    df: DataFrame,
    vec_col: str,
    dim: int,
    *,
    n_clusters: int = 16,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
):
    """Build an IVF (inverted-file) index: k-means centroids trained on a
    driver-side sample, then every row assigned to its nearest centroid.

    Returns ``(assigned_df, centroids)`` where assigned_df carries an
    ``ivf_cluster`` column. At warehouse scale, persist assigned_df
    partitioned by ``ivf_cluster`` so probes prune partitions — same
    storage discipline as the LSH bucket path, but data-adaptive.

    The training sample is UNIFORM: ``orderBy(rand(seed)).limit(n)``
    compiles to TakeOrderedAndProject (partial top-k per partition — one
    column scan, no global sort). A plain ``limit(n)`` would take the
    first rows of the first partitions, biasing centroids on
    sorted/partitioned data. The collect is bounded to ``sample`` rows;
    assignment is one numpy-vectorized pass.
    """
    rows = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())  # a NULL row would crash list()
        .orderBy(F.rand(seed))
        .limit(sample)
        .collect()
    )  # bounded, uniformly-random driver-side sample
    if not rows:
        raise ValueError(
            "ivf_build: no non-null vectors to train on (empty input?)"
        )
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(axis=0)
    centroids = [[float(x) for x in c] for c in cent]

    cmat = np.array(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        # one (chunk×k×dim) broadcasted distance computation per chunk —
        # elementwise identical arithmetic to the per-row form
        # ((cmat - x)**2).sum(axis=1), so assignments (incl. ties) are
        # bit-equal to the scalar loop, at numpy speed. Chunked at 2048
        # rows to bound the chunk×k×dim temporary (~16 MB at k=16 d=64).
        out = pd.Series([None] * len(vs), dtype=object)
        mask = vs.notna().to_numpy()
        idx = np.flatnonzero(mask)
        if len(idx):
            V = np.array([np.asarray(v, dtype=np.float64) for v in vs.iloc[idx]])
            labels = np.empty(len(V), dtype=np.int64)
            for s in range(0, len(V), 2048):
                chunk = V[s : s + 2048]
                d2 = ((chunk[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
                labels[s : s + 2048] = d2.argmin(axis=1)
            out.iloc[idx] = [int(c) for c in labels]
        return out

    # optimizer hint only — prevents §4.4 duplicate evaluation when a
    # consumer filters on the cluster id (round-17 plan audit)
    return (
        df.withColumn("ivf_cluster", _assign.asNondeterministic()(F.col(vec_col))),
        centroids,
    )


def ivf_build_distributed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_clusters: int = 16,
    iters: int = 2,
    salt: str = "ivf",
):
    """IVF index built with the DISTRIBUTED deterministic k-means
    (:func:`kmeans_fit`) instead of the driver-side numpy sample —
    the fully engine-reproducible build: md5-ranked seeds, rounded
    means, tie-stable assignment, so the index (and therefore every
    probe result) is identical on any engine and the driver oracle can
    replay it in SQL. Same return contract as :func:`ivf_build`:
    ``(assigned_df, centroids)`` with an ``ivf_cluster`` column and a
    positionally-indexed centroid list (kmeans labels are re-mapped to
    list positions, which matters when Lloyd dropout leaves label
    gaps).

    When to use which: ``ivf_build`` (sample+numpy) converges harder
    for the same wall-clock and is fine when reproducibility across
    engines/runs isn't required; this one is the auditable path —
    training cost is ``iters`` full passes (the MLlib pattern, one
    keyed partial-agg shuffle each). The k×dim centroid collect is the
    same bounded driver state kmeans_fit already documents.
    """
    assigned, cent = kmeans_fit(
        df, id_col, vec_col, n_clusters, iters=iters, salt=salt
    )
    rows = sorted(cent.collect(), key=lambda r: r["label"])
    centroids = [[float(x) for x in r["centroid"]] for r in rows]
    mapping = {r["label"]: i for i, r in enumerate(rows)}
    map_expr = F.create_map(
        *[F.lit(x) for kv in mapping.items() for x in kv]
    )
    out = (
        df.join(assigned.select(id_col, "pred_label"), id_col)
        .withColumn(
            "ivf_cluster", map_expr[F.col("pred_label")].cast("int")
        )
        .drop("pred_label")
    )
    return out, centroids


def ivf_topk(

    assigned_df: DataFrame,
    centroids,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    *,
    nprobe: int = 2,
    id_cols: Sequence[str] = ("vec_id",),
) -> DataFrame:
    """Probe the ``nprobe`` clusters nearest the query, exact cosine
    within — the IVF scale path: with cluster-partitioned storage this
    reads nprobe/n_clusters of the data."""
    q = np.asarray(list(query), dtype=np.float64)
    cmat = np.asarray(centroids, dtype=np.float64)
    order = ((cmat - q[None, :]) ** 2).sum(axis=1).argsort()[:nprobe]
    probes = [int(i) for i in order]
    cand = assigned_df.filter(F.col("ivf_cluster").isin(probes))
    return cosine_topk(cand, vec_col, query, k, id_cols=id_cols)


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    *,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 42,
    bucket_cap: int | str | None = "auto",
    materialize: bool = True,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket self-join (shuffle keyed
    by bucket — near-identical vectors land together) + exact cosine
    verification. Returns (id_a, id_b, cosine).

    ``bucket_cap`` (rows) bounds per-task memory against degenerate hot
    buckets (e.g. a corpus of near-identical or zero vectors collapsing
    into one bucket): groups over the cap are decomposed into block-pair
    sub-groups (:func:`_with_block_subgroups`) with the exact same pair
    set. ``"auto"`` sizes blocks so one sub-group's vectors stay ≈128 MB
    for this ``dim``; ``None`` disables.

    Cache contract (``materialize=True``, the dedup.py shape): the
    bucketed base feeds the cap's sizes aggregation AND the kernel
    branch; it is persisted while the verified pairs are forced
    eagerly (pairs stay cached for the caller's action — bounded by
    true near-dup volume, same contract as
    :func:`~.dedup.minhash_dup_pairs`), then released.
    ``materialize=False`` returns a fully lazy plan with no caching.

    Edge semantics (deliberate deltas from the old join formulation):
    NULL ids and NULL vectors produce no pairs (the join dropped them
    via inequality/NULL-bucket semantics; the kernel filters them up
    front), and ZERO vectors score cosine 0 against everything — two
    identical zero vectors never pair, where the join's
    ``dot/(norm*norm)`` raised DIVIDE_BY_ZERO under Spark 4's default
    ANSI mode (a zero embedding has no direction; failing the whole
    job over it helps nobody)."""
    sc = df.sparkSession.sparkContext
    from ..plans import needs_spread

    # cheap spread gate (round-17): see operators.dedup._spread
    if needs_spread(df, sc.defaultParallelism):
        df = df.repartition(sc.defaultParallelism)
    base = add_lsh_buckets(df, vec_col, dim, n_planes=n_planes, seed=seed).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "lsh_bucket"
    )
    # per-bucket Gram kernel (same treatment as knn_graph /
    # semantic_dedup): the bucket self-join ships two vectors per
    # candidate pair; the grouped kernel ships each vector once and
    # emits only the verified >= threshold pairs — output is bounded by
    # TRUE near-dup volume, so no top-k cut is needed. A vector lands
    # in exactly one bucket, so an id pair repeats only when an id
    # itself carries duplicate rows — max-agg dedup keeps that case
    # deterministic (the old join's dropDuplicates picked arbitrarily).
    cap = _auto_cap(dim) if bucket_cap == "auto" else bucket_cap
    _validate_cap(cap)  # BEFORE persist: a raise must not leak a cache
    if materialize:
        base = base.persist()
    pairs = (
        _bucket_dup_pairs(base, float(threshold), cap)
        .groupBy("id_a", "id_b")
        .agg(F.max("cosine").alias("cosine"))
    )
    if materialize:
        from .dedup import _eager_pairs

        pairs = _eager_pairs(pairs, base)
    return pairs


def _round6_half_up(x):
    """Spark's ``round(double, 6)`` emulated exactly: HALF_UP rounds
    halves AWAY FROM ZERO for both signs (``np.round`` is half-even;
    a bare ``floor(x*1e6+0.5)`` would round negative halves toward
    +inf: floor(-0.5+0.5)=0, while Spark gives -0.000001).

    Boundary exactness: Spark rounds ``BigDecimal.valueOf(double)`` —
    the double's SHORTEST decimal repr — so a value printing as exactly
    ``0.9999995`` rounds UP to 1.0 even though its binary expansion is
    0.99999949999…, where the scaled-floor fast path would round down.
    Elements within 1e-6 of a scaled half-integer (double error at the
    1e6 scale is ~1e-10, so the margin is generous; suspects are ~1e-6
    dense at worst) are therefore re-rounded through
    ``Decimal(repr(v))`` with HALF_UP — the same shortest-repr
    semantics as the JVM, pinned against ``F.round`` in
    TestRound6HalfUp."""
    x = np.asarray(x, dtype=np.float64)
    r = np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6
    scaled = np.abs(x) * 1e6
    suspect = np.abs(scaled - (np.floor(scaled) + 0.5)) < 1e-6
    if suspect.any():
        from decimal import ROUND_HALF_UP, Decimal

        grain = Decimal("0.000001")
        flat_x = x.reshape(-1)
        flat_r = r.reshape(-1)
        for pos in np.nonzero(suspect.reshape(-1))[0]:
            flat_r[pos] = float(
                Decimal(repr(float(flat_x[pos]))).quantize(
                    grain, rounding=ROUND_HALF_UP
                )
            )
    return r


def _gram_chunks(ids, V, chunk: int):
    """Shared pairwise-cosine chunk iterator for the grouped Gram
    kernels: yields ``(i0, cos_slab)`` where ``cos_slab[r, j]`` is the
    HALF_UP-6-rounded cosine of rows ``i0+r`` and ``j`` (zero-norm
    rows divide by 1). One BLAS matmul per slab; callers select pairs
    from the slab. ``ids`` rides along only for the callers' pair
    filters — pairs between rows carrying the SAME id are the
    callers' job to exclude (the join formulations used id
    inequality, not positional inequality).

    Used by the row-wise top-k caller (:func:`_bucket_topk_pairs`),
    which needs every row's FULL cosine vector to rank neighbors; the
    threshold-pair callers use :func:`_gram_tiles` instead (round 17:
    full-width slabs on a big bucket are ~33 MB plus same-sized
    divide/round temporaries — RAM-bandwidth-bound, and this VM's
    co-tenant collapses parallel bandwidth-bound work up to ~300x
    while pure-CPU work runs at normal efficiency).

    The slab is ASSEMBLED from the same L2-resident tiles
    :func:`_gram_tiles` iterates (matmul/outer/divide/round
    temporaries are all tile-sized, 2 MB): only the final rounded
    values stream through RAM, once, into one preallocated buffer —
    the slab's four slab-sized intermediate round-trips are gone while
    the caller still receives full cosine rows. Per element the
    arithmetic is unchanged (same BLAS dot over the unblocked vector
    axis, same outer/divide/round), so assembled slabs are bit-equal
    to the one-shot slab they replace (pinned by TestGramTiles against
    an independent naive full-width reference)."""
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0.0] = 1.0
    n = len(ids)
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        out = np.empty((i1 - i0, n), dtype=np.float64)
        for s0 in range(i0, i1, _GRAM_ITILE):
            s1 = min(s0 + _GRAM_ITILE, i1)
            for j0 in range(0, n, _GRAM_JTILE):
                j1 = min(j0 + _GRAM_JTILE, n)
                tile = (V[s0:s1] @ V.T[:, j0:j1]) / np.outer(
                    norms[s0:s1], norms[j0:j1]
                )
                out[s0 - i0 : s1 - i0, j0:j1] = _round6_half_up(tile)
        yield i0, out


# L2-resident Gram tile: itile x jtile float64 = 2 MB, vs the 33 MB
# full-width slab (plus same-sized outer/divide/round temporaries)
# _bucket_chunk sizes. Measured round 17 on a 5000-row sf10-shaped
# cluster, 32-way parallel, interleaved same-window: full-width
# 55.8-143.5 s vs tiled 7.7-11.8 s (7-12x), and 6.28 -> 0.59 s
# single-process — the full-width shape is memory-bandwidth-bound
# even uncontended, and cache-resident tiles additionally stay flat
# when co-tenant bandwidth pressure collapses RAM throughput.
_GRAM_ITILE = 256
_GRAM_JTILE = 1024


def _gram_tiles(ids, V, itile: int | None = None, jtile: int | None = None):
    """Cache-resident tiled variant of :func:`_gram_chunks` for the
    threshold-pair callers: yields ``(i0, j0, cos_tile)`` where
    ``cos_tile[r, c]`` is the HALF_UP-6-rounded cosine of rows
    ``i0+r`` and ``j0+c``. Arithmetic is IDENTICAL per element to the
    full-width slab — the same BLAS dot over the (unblocked, len-64ish)
    vector axis, divided by the same ``np.outer`` sub-block, rounded by
    the same helper — so every tile value is bit-equal to the slab
    value it replaces (pinned by TestGramTiles); only the slab SHAPE
    (and therefore the working-set size) changes."""
    itile = _GRAM_ITILE if itile is None else itile
    jtile = _GRAM_JTILE if jtile is None else jtile
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0.0] = 1.0
    n = len(ids)
    for i0 in range(0, n, itile):
        i1 = min(i0 + itile, n)
        for j0 in range(0, n, jtile):
            j1 = min(j0 + jtile, n)
            cos = (V[i0:i1] @ V.T[:, j0:j1]) / np.outer(
                norms[i0:i1], norms[j0:j1]
            )
            yield i0, j0, _round6_half_up(cos)


def _gram_tiles_thresh(ids, V, threshold, itile=None, jtile=None):
    """Threshold-pair Gram iterator (round 18, VERDICT r17 task 5 —
    the deferred float32 BLAS lever): yields ``(gi, gj, cos)`` global
    index arrays plus the HALF_UP-6-rounded float64 cosines of every
    pair with rounded cosine ``>= threshold``, tile by tile.

    Two-pass exactness scheme — float32 SCREENS, float64 DECIDES:

    1. Rows are normalized in float64 (zero norms -> 1, same as
       :func:`_gram_tiles`) and cast once to float32; each tile is ONE
       float32 GEMM — half the FLOPs and half the memory traffic of
       the float64 tile, and the 5-pass ``_round6_half_up`` over every
       tile element disappears entirely (only candidates are rounded).
    2. A pair is a CANDIDATE when its float32 cosine reads
       ``>= threshold - eps`` with ``eps = 8*(d+8)*2**-24 + 1e-6``.
       Error proof: with float64-normalized unit rows, the float32
       cast adds <= 2 ulp32 per element and the float32 dot
       accumulation <= gamma_d = d*2**-24 relative to Sum|a_i'b_i'|,
       which Cauchy-Schwarz bounds by 1 — so
       ``|cos32 - cos64| <= (d+4)*2**-24`` absolute; the ``+1e-6``
       term covers HALF_UP rounding lifting cos64 up to half a grain
       onto the threshold; the 8x factor is margin. A pair the screen
       drops therefore CANNOT have rounded float64 cosine >=
       threshold (false positives only cost the float64 recompute;
       false negatives are impossible within the bound — pinned by
       TestGramTilesThresh's engineered boundary cases).
    3. Candidates (sparse: dup pairs are a small fraction of n^2) are
       recomputed in float64 from the ORIGINAL vectors — pairwise dot
       / norm product, then ``_round6_half_up`` — and kept iff the
       rounded value clears the threshold. Emitted values come from
       this float64 arithmetic, the same dot/divide/round formula the
       float64 tiles used (summation order of a pairwise dot vs a GEMM
       row can differ in the last ulp — 1e-16-class, nine orders under
       the 1e-6 rounding grain, the same cross-order exposure the
       existing oracle match already tolerates between BLAS and the
       SQL engines' own summation orders).

    Inputs whose float32 normalization is non-finite (inf/NaN vectors
    — NaN comparisons would silently drop candidates) take the exact
    float64 tile path unchanged."""
    itile = _GRAM_ITILE if itile is None else itile
    jtile = _GRAM_JTILE if jtile is None else jtile
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0.0] = 1.0
    Vn32 = (V / norms[:, None]).astype(np.float32)
    if not np.all(np.isfinite(Vn32)):
        for i0, j0, cos in _gram_tiles(ids, V, itile=itile, jtile=jtile):
            ii, jj = np.nonzero(cos >= threshold)
            yield ii + i0, jj + j0, cos[ii, jj]
        return
    d = V.shape[1] if V.ndim == 2 else 1
    screen = np.float32(threshold - (8.0 * (d + 8) * 2.0**-24 + 1e-6))
    n = len(ids)
    for i0 in range(0, n, itile):
        i1 = min(i0 + itile, n)
        for j0 in range(0, n, jtile):
            j1 = min(j0 + jtile, n)
            t32 = Vn32[i0:i1] @ Vn32.T[:, j0:j1]
            ii, jj = np.nonzero(t32 >= screen)
            if len(ii) == 0:
                continue
            gi = ii + i0
            gj = jj + j0
            dots = np.einsum("ij,ij->i", V[gi], V[gj])
            cos = _round6_half_up(dots / (norms[gi] * norms[gj]))
            keep = cos >= threshold
            yield gi[keep], gj[keep], cos[keep]


def _bucket_chunk(n: int) -> int:
    """Chunk rows so a cos slab stays ≤ ~32 MB whatever the bucket
    holds (skew-safe)."""
    return max(1, min(1024, (1 << 22) // max(n, 1)))


# hot-bucket cap sizing policy — ONE definition for both the Python
# helper (static-dim callers) and the in-aggregation SQL expression
# (semantic_dedup's "auto"): blocks sized so one sub-group's vector
# matrix (two blocks × dim doubles) stays ≈ 128 MB
_CAP_FLOOR_ROWS = 4096
_CAP_BUDGET = 1 << 23


def _auto_cap(dim: int) -> int:
    """Default per-block row cap for the hot-bucket decomposition —
    dim 64 → 131072 rows, dim 768 → 10922."""
    return max(_CAP_FLOOR_ROWS, _CAP_BUDGET // max(dim, 1))


def _validate_cap(cap) -> None:
    """Reject a too-small explicit cap BEFORE any caller persists its
    base — a persist-then-raise would leak a CacheManager entry no
    caller's finally can reach (the round-9 _eager_pairs leak class)."""
    if cap is not None and cap != "auto" and cap < 2:
        raise ValueError(f"bucket_cap must be >= 2 rows, got {cap}")


def _with_block_subgroups(
    base: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    cap: int | str | None,
    vec_col: str | None = None,
):
    """Hot-group skew cap for the grouped Gram kernels: decompose any
    group holding more than ``cap`` rows into block-PAIR sub-groups so
    no single task ever materializes an unbounded vector matrix.

    Rows of a hot group are hashed into ``s = ceil(n / cap)`` blocks
    (``_blk``); each row is replicated into the ``s`` sub-groups
    ``(min(_blk, c), max(_blk, c))`` it participates in, and kernels
    group on ``group_cols + [_lo, _hi]``. Exactly-once pair coverage:
    an unordered row pair from blocks (b1, b2) co-occurs ONLY in
    sub-group (min,max)(b1, b2) when b1 != b2, but a SAME-block pair
    co-occurs in every sub-group containing its block — so kernels
    must emit a pair iff ``_lo == _hi`` (diagonal sub-group: all
    pairs) or the two rows' ``_blk`` differ (mixed sub-group: cross
    pairs only). Under that contract the decomposed pair set equals
    the uncapped one exactly (cosines too: each pair's dot/norms are
    computed from the same two rows regardless of slab shape).

    Scale math: a group of n rows becomes s + s(s-1)/2 sub-groups of
    ≤ ~2·cap rows — replication factor s on the hot group's rows only,
    in exchange for O(n·cap) per-task work instead of O(n²). Only hot
    groups pay anything: sizes are computed by one slim count
    aggregation, FILTERED to groups over the cap, and broadcast
    (#hot ≤ N/cap, slim rows), so cold groups take the `_gn IS NULL`
    branch with a constant (0,0) sub-group key. ``cap=None`` disables
    the machinery entirely (literal zero columns, no agg/join).

    ``cap="auto"`` (requires ``vec_col``) derives the per-group cap
    INSIDE the sizes aggregation from the group's own vector width —
    ``max(4096, 2^23 / dim)`` rows — so auto-capping costs zero extra
    actions (no driver-side dim peek).

    Returns ``(df, group_cols + ["_lo", "_hi"])`` with ``_blk``,
    ``_lo``, ``_hi`` columns appended to ``base``'s.
    """
    cols = list(base.columns)
    if cap is None:
        b = (
            base.withColumn("_blk", F.lit(0))
            .withColumn("_lo", F.lit(0))
            .withColumn("_hi", F.lit(0))
        )
        return b, list(group_cols) + ["_lo", "_hi"]
    _validate_cap(cap)
    if cap == "auto":
        if vec_col is None:
            raise ValueError('bucket_cap="auto" requires vec_col')
        # max(dim, 1) guard mirrors _auto_cap: a group of empty arrays
        # would otherwise divide to Infinity and error on the long cast
        # under Spark 4's ANSI default
        cap_agg = F.greatest(
            F.lit(_CAP_FLOOR_ROWS),
            (
                F.lit(_CAP_BUDGET)
                / F.greatest(F.max(F.size(F.col(vec_col))), F.lit(1))
            ).cast("long"),
        )
    else:
        cap_agg = F.max(F.lit(int(cap)))
    sizes = (
        base.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("_gn"), cap_agg.alias("_cap"))
        .filter(F.col("_gn") > F.col("_cap"))
    )
    b = base.join(F.broadcast(sizes), list(group_cols), "left")
    s = F.ceil(F.col("_gn") / F.col("_cap")).cast("int")
    b = b.withColumn(
        "_blk",
        F.when(
            F.col("_gn").isNotNull(),
            F.coalesce(F.pmod(F.xxhash64(F.col(id_col)), s).cast("int"), F.lit(0)),
        ).otherwise(F.lit(0)),
    )
    subs = F.when(
        F.col("_gn").isNotNull(),
        F.transform(
            F.sequence(F.lit(0), s - F.lit(1)),
            lambda c: F.struct(
                F.least(F.col("_blk"), c).alias("lo"),
                F.greatest(F.col("_blk"), c).alias("hi"),
            ),
        ),
    ).otherwise(F.array(F.struct(F.lit(0).alias("lo"), F.lit(0).alias("hi"))))
    b = b.withColumn("_sub", F.explode(subs)).select(
        *cols,
        "_blk",
        F.col("_sub.lo").alias("_lo"),
        F.col("_sub.hi").alias("_hi"),
    )
    return b, list(group_cols) + ["_lo", "_hi"]


def _bucket_dup_pairs(
    base: DataFrame, threshold: float, bucket_cap: int | None = None
) -> DataFrame:
    """Within-bucket verified near-dup pairs for
    :func:`embedding_dup_pairs`: grouped-pandas kernel over
    ``lsh_bucket`` computing all bucket cosines via chunked Gram
    matmuls and emitting ``(id_a, id_b, cosine)`` with ``id_a`` the
    smaller id, cosine HALF_UP-rounded to 6 decimals like ``F.round``,
    filtered at ``>= threshold``. NULL vectors and NULL buckets never
    pair (join-formulation parity). ``bucket_cap`` bounds per-task rows
    via :func:`_with_block_subgroups` (exact same pair set)."""
    from pyspark.sql import types as T

    id_type = base.schema["_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="object"),
            "id_b": pd.Series([], dtype="object"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )
    grouped, keys = _with_block_subgroups(
        base, ["lsh_bucket"], "_id", bucket_cap
    )

    def _grp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[
            pdf["_v"].notna()
            & pdf["lsh_bucket"].notna()
            & pdf["_id"].notna()
        ]
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        blk = pdf["_blk"].to_numpy()
        mixed = pdf["_lo"].iat[0] != pdf["_hi"].iat[0]
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        out_a, out_b, out_c = [], [], []
        for ii_g, jj_g, cosv in _gram_tiles_thresh(ids, V, threshold):
            # join-formulation parity: pair identity is by ID, not
            # position — strict id inequality (duplicate-id rows must
            # never emit a degenerate (x, x) pair), each unordered
            # pair once via position order
            keep = (ii_g < jj_g) & (ids[ii_g] != ids[jj_g])
            if mixed:
                # sub-group contract: mixed (lo != hi) sub-groups emit
                # CROSS-block pairs only — same-block pairs belong to
                # their diagonal sub-group (exactly-once coverage)
                keep &= blk[ii_g] != blk[jj_g]
            ii_g, jj_g, cosv = ii_g[keep], jj_g[keep], cosv[keep]
            if len(ii_g) == 0:
                continue
            ia, ib = ids[ii_g], ids[jj_g]
            out_a.extend(np.minimum(ia, ib).tolist())
            out_b.extend(np.maximum(ia, ib).tolist())
            out_c.extend(cosv.tolist())
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="object"),
                "id_b": pd.Series(out_b, dtype="object"),
                "cosine": pd.Series(out_c, dtype="float64"),
            }
        )

    return grouped.groupBy(*keys).applyInPandas(_grp, out_schema)


def class_centroids(
    df: DataFrame,
    label_col: str,
    vec_col: str,
    *,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Per-label mean embedding: ``(label, centroid array<double>)``.

    Plan shape: posexplode to ``(label, pos, x)`` then hash-aggregate on
    ``(label, pos)`` — the explode fans out N×dim rows, but partial
    (map-side) aggregation collapses each scan partition to at most
    labels×dim rows before the exchange, so the shuffle moves
    O(labels × dim × partitions), never O(N). A second tiny aggregation
    (labels rows) reassembles the arrays in ``pos`` order via
    ``array_sort(collect_list(struct(pos, m)))``.

    ``round_decimals`` pins the float summation's last-ulp wobble
    (summation order is engine/partitioning-dependent) so centroids are
    reproducible across runs and engines; pass ``None`` for raw doubles.
    """
    d = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(_dvec(vec_col)).alias("pos", "x"),
    )
    per = d.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return per.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: (
                F.round(s.getField("m"), round_decimals)
                if round_decimals is not None
                else s.getField("m")
            ),
        ).alias("centroid")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    *,
    iters: int = 5,
    salt: str = "kmeans",
) -> tuple:
    """Distributed Lloyd k-means over an embedding column. Returns
    ``(assignments, centroids)`` — ``(id, pred_label, dist)`` after the
    final assignment and the ``(label, centroid)`` table that produced
    it.

    Deterministic and engine-reproducible: seeds are the ``k`` vectors
    with the smallest salted md5 id-fractions (labels 0..k-1 in rank
    order, ties by id), assignment ties break toward the smallest
    label, and recomputed means are rounded (via
    :func:`class_centroids`) to pin summation-order wobble — the same
    corpus + salt yields the same model on any engine.

    Scale shape (the MLlib pattern): per iteration one full pass —
    broadcast centroids, map-side scoring, argmin partial agg, then the
    centroid recompute's shuffle is capped at k×dim rows per partition
    by partial aggregation. Centroids (k×dim doubles, KBs) are
    collected to the driver between iterations to keep the lineage
    flat — bounded driver state, never O(N). Clusters that lose all
    members drop out (standard Lloyd alternative to re-seeding,
    chosen for cross-engine determinism).
    """
    if k <= 0 or iters <= 0:
        raise ValueError("k and iters must be positive")
    from .split import split_fraction

    spark = df.sparkSession
    seeds = (
        df.select(
            F.col(id_col).alias("_id"),
            _dvec(vec_col).alias("centroid"),
            split_fraction(id_col, salt).alias("_f"),
        )
        .orderBy("_f", "_id")
        .limit(k)
    )
    w = Window.orderBy("_f", "_id")
    cent = seeds.withColumn("label", F.row_number().over(w) - 1).select(
        "label", "centroid"
    )
    assigned = None
    for i in range(iters):
        assigned = centroid_assign(df, id_col, vec_col, cent)
        if i < iters - 1:
            members = df.join(
                assigned.select(id_col, "pred_label"), id_col
            )
            cent = class_centroids(members, "pred_label", vec_col)
            # k×dim doubles — bounded driver state keeps lineage flat
            cent = spark.createDataFrame(
                cent.collect(), "label int, centroid array<double>"
            )
    return assigned, cent


def centroid_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    *,
    label_col: str = "label",
    centroid_col: str = "centroid",
    impl: str = "auto",
) -> DataFrame:
    """Nearest-centroid assignment (the classify/cluster-assign step of
    k-means or a prototype classifier): ``(id, pred_label, dist)`` with
    squared-L2 distance, ties broken by smallest label.

    ``impl="auto"`` (default, round 13) collects the centroid table
    (bounded k×dim driver state — the same collect the numpy kernel
    needs anyway) and picks the numpy kernel whenever the per-row SQL
    cost is non-trivial (``k >= 2 and k*dim >= 32`` — below that the
    interpreted fold is cheaper than an Arrow hop and the plan stays
    pure JVM); sessions with no Python workers should pass
    ``impl="sql"`` explicitly. Both the empty centroid table and a NULL
    centroid label raise a descriptive ``ValueError`` on the collecting
    paths (auto/numpy) instead of an opaque crash (round-13 ADVICE).

    ``impl="numpy"`` (round 12): one Arrow-batched pandas UDF
    computes every row's k distances against the collected k×dim
    centroid matrix with a SEQUENTIAL per-dimension fold (``acc +=
    (a_j - b_j)²`` in dimension order — the exact floating-point
    operation order of the SQL path's ``aggregate`` fold, so distances
    and therefore assignments and tie-breaks are BIT-IDENTICAL; pinned
    by the differential test). This replaces the ``impl="sql"``
    formulation — a broadcast crossJoin producing n×k rows each
    evaluating an interpreted ``zip_with``+``aggregate`` HOF — whose
    cost exploded once k scales with n (SemDeDup's derived k): the
    round-12 sf10 sweep measured semantic_dedup at 107 s, ~95 of them
    in this stage (200k rows × 40 centroids × 64 dims of interpreted
    lambda ops); the numpy fold does the same flops in ~1 s. The
    centroid collect is the same bounded k×dim driver state kmeans_fit
    already holds between iterations.

    Degenerate-vector envelope (both impls agree on ``pred_label``):
    NULL vectors and length-mismatched vectors yield ``(smallest
    label, NULL dist)`` on both paths. Vectors containing null / NaN /
    infinite ELEMENTS also predict the smallest label on both paths,
    but the numpy path reports dist NULL where the SQL fold would say
    NULL (null element), NaN (NaN element), or Infinity (inf element)
    — Arrow erases the null/NaN distinction before the UDF sees the
    batch, so all three collapse to the NULL-dist arm.

    ``impl="sql"`` keeps the pure-JVM formulation: zero Python workers,
    scan-shaped (map-side cross join + partial-agg argmin, no shuffle
    of the N-row side) — the right call when k is SMALL and fixed or
    Python workers are unavailable.
    """
    if impl == "sql":
        cent = F.broadcast(
            centroids.select(
                F.col(label_col).alias("_clabel"),
                F.col(centroid_col).alias("_cvec"),
            )
        )
        diff2 = F.aggregate(
            F.zip_with(
                _dvec(vec_col), _dvec("_cvec"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        scored = df.crossJoin(cent).select(
            F.col(id_col), F.col("_clabel"), diff2.alias("_d2")
        )
        best = scored.groupBy(id_col).agg(
            F.min(F.struct(F.col("_d2"), F.col("_clabel"))).alias("_best")
        )
        return best.select(
            id_col,
            F.col("_best").getField("_clabel").alias("pred_label"),
            F.col("_best").getField("_d2").alias("dist"),
        )
    if impl not in ("numpy", "auto"):
        raise ValueError(f"centroid_assign: unknown impl {impl!r}")
    rows = centroids.select(label_col, centroid_col).collect()
    if not rows:
        raise ValueError("centroid_assign: empty centroid table")
    if any(r[0] is None for r in rows):
        raise ValueError(
            "centroid_assign: NULL label in centroid table — every "
            "centroid row needs a non-null integer label"
        )
    if any(r[1] is None for r in rows) or any(
        x is None for r in rows for x in r[1]
    ):
        raise ValueError(
            "centroid_assign: NULL centroid vector (or NULL vector "
            "element) in centroid table — centroids must be dense"
        )
    if len({len(r[1]) for r in rows}) != 1:
        raise ValueError(
            "centroid_assign: centroid vectors have mixed lengths — "
            "all centroids must share one dimensionality"
        )
    rows = sorted(rows, key=lambda r: r[0])
    if impl == "auto":
        k = len(rows)
        dim0 = len(rows[0][1]) if rows[0][1] is not None else 0
        if k < 2 or k * dim0 < 32:
            return centroid_assign(
                df,
                id_col,
                vec_col,
                centroids,
                label_col=label_col,
                centroid_col=centroid_col,
                impl="sql",
            )
    labels = np.array([int(r[0]) for r in rows], dtype=np.int64)
    C = np.array([[float(x) for x in r[1]] for r in rows], dtype=np.float64)
    k, dim = C.shape
    min_label = int(labels[0])
    # bound the (chunk × k) accumulator to ~32 MB of doubles
    chunk_rows = max(1, (1 << 22) // max(k, 1))

    @F.pandas_udf("struct<pred_label: int, dist: double>")
    def _assign(vs: pd.Series) -> pd.DataFrame:
        n = len(vs)
        pred = np.full(n, min_label, dtype=np.int64)
        dist = pd.Series([None] * n, dtype=object)
        ok = []
        for i, v in enumerate(vs):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.shape != (dim,) or not np.isfinite(a).all():
                continue  # degenerate: (min_label, NULL) — see envelope
            ok.append((i, a))
        for s in range(0, len(ok), chunk_rows):
            part = ok[s : s + chunk_rows]
            V = np.stack([a for _, a in part])
            acc = np.zeros((len(part), k), dtype=np.float64)
            for j in range(dim):  # sequential fold == the SQL aggregate
                d = V[:, j, None] - C[None, :, j]
                acc += d * d
            am = acc.argmin(axis=1)  # first min == smallest label (sorted)
            dmin = acc[np.arange(len(part)), am]
            for (i, _), lbl, dv in zip(part, labels[am], dmin):
                pred[i] = lbl
                dist.iloc[i] = float(dv)
        return pd.DataFrame(
            {"pred_label": pd.Series(pred), "dist": dist}
        )

    # asNondeterministic: optimizer hint only (deterministic in fact) —
    # semantic_dedup's stage filters on the assignment, and Catalyst
    # otherwise duplicates this whole k×dim scoring pass below the
    # exchange (guide §4.4; round-17 plan audit: 3 evaluations)
    out = df.select(
        F.col(id_col), _assign.asNondeterministic()(_dvec(vec_col)).alias("_a")
    )
    return out.select(
        id_col,
        F.col("_a.pred_label").alias("pred_label"),
        F.col("_a.dist").alias("dist"),
    )


def knn_graph(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    *,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    bucket_cap: int | str | None = "auto",
    materialize: bool = True,
) -> DataFrame:
    """Approximate k-nearest-neighbor graph: ``(id, nbr_id, cosine)``
    with up to ``k`` neighbors per vector — the hard-negative-mining /
    contrastive-pair primitive of embedding training pipelines.

    Multi-table LSH: each of ``n_tables`` independent hyperplane sets
    buckets every vector once, candidates meet in a ``(table, bucket)``
    keyed equi-join — NEVER an all-pairs product — and a vector's
    recall misses in one table are caught by another (standard
    multi-table SRP trade: recall grows with ``n_tables``, candidate
    volume with ``n_tables / 2^n_planes``). Exact cosine re-ranks the
    union of candidates, and ``row_number <= k`` plans a
    WindowGroupLimit (partial per-partition top-k BEFORE the id-keyed
    exchange). Deterministic output: ties break by neighbor id. Rows
    with a NULL id or NULL embedding produce no edges in either
    direction (no meaningful identity/cosine), and zero vectors score
    cosine 0 against everything (the join formulation's norm division
    raised under ANSI instead). Duplicate-id rows: the id gets ONE
    neighbor list (per-neighbor best cosine, deterministic) and
    occupies at most one slot in other ids' lists.

    At 100 TB: shuffle volume is bounded by bucket-collision pairs;
    skewed buckets (dense regions) are aggregation/window keys that AQE
    and the partial top-k flatten. For repeated mining runs, persist
    the bucketed base once (:func:`add_lsh_buckets` note).
    ``bucket_cap`` ("auto" → ≈128 MB of vectors per task for this
    ``dim``) bounds per-task rows against degenerate hot buckets via
    block-pair decomposition — losslessly, see :func:`_bucket_topk_pairs`.

    Cache contract (``materialize=True``, the dedup.py shape): the
    bucketed union is read by BOTH the cap's sizes aggregation and the
    kernel branch — each would otherwise recompute the n_tables
    bucket-signature passes. The union is persisted, the slim scored
    edge table (≤ n_tables·N·k rows) is forced eagerly and stays
    cached for the caller's action, and the union is released before
    returning. ``materialize=False`` returns a fully lazy plan with no
    caching (the union recomputes per branch).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_tables < 1:
        raise ValueError("n_tables must be >= 1")
    sc = df.sparkSession.sparkContext
    from ..plans import needs_spread

    # cheap spread gate (round-17): see operators.dedup._spread
    if needs_spread(df, sc.defaultParallelism):
        df = df.repartition(sc.defaultParallelism)
    base = df.select(F.col(id_col).alias("_id"), _dvec(vec_col).alias("_v"))
    tables = []
    for t in range(n_tables):
        tables.append(
            base.withColumn(
                "_b", lsh_bucket("_v", dim, n_planes=n_planes, seed=seed + t)
            ).withColumn("_t", F.lit(t))
        )
    cand = tables[0]
    for t in tables[1:]:
        cand = cand.unionByName(t)
    # per-(table, bucket) Gram kernel: the bucket self-join formulation
    # shipped TWO dim-sized vectors per candidate pair through the
    # dedup shuffle and scored them with interpreted HOF folds —
    # O(pairs x dim) traffic, measured 57 s at 50k x 64 (4 tables, 256
    # buckets ⇒ ~39M candidate pairs x 1 KB each). The grouped kernel
    # ships each vector once per table, scores a bucket with one BLAS
    # matmul, and emits only each id's PER-BUCKET top-k (lossless: the
    # global top-k per id is a subset of the union of its per-bucket
    # top-k under the same (cosine desc, nbr_id asc) order) — ≤
    # n_tables x N x k slim rows into the cross-table dedup + final
    # top-k. Same double math, same HALF_UP 6-decimal rounding.
    # cross-table dedup by max-agg, not dropDuplicates: the same pair
    # is re-scored independently in every co-occurring (table, bucket)
    # with different slab shapes, so two computations may differ by
    # one rounding grain at a .5 boundary — max picks deterministically
    # where an arbitrary survivor could flip run-to-run
    cap = _auto_cap(dim) if bucket_cap == "auto" else bucket_cap
    _validate_cap(cap)  # BEFORE persist: a raise must not leak a cache
    if materialize:
        cand = cand.persist()
    scored = (
        _bucket_topk_pairs(cand, k, cap)
        .groupBy("id", "nbr_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    if materialize:
        from .dedup import _eager_pairs

        scored = _eager_pairs(scored, cand)
    from .rank import top_k_per_group

    return top_k_per_group(
        scored,
        "id",
        [F.col("cosine").desc(), F.col("nbr_id").asc()],
        k,
    )


def _row_topk(row, ids, cand_idx, k):
    """Positions of the top-k DISTINCT-id neighbors among ``cand_idx``
    under (cosine desc, nbr_id asc). A full lexsort per row is
    O(n log n) → O(n² log n) per bucket; instead argpartition narrows
    to a value-threshold superset (ALL candidates tied at the boundary
    included, so the id tie-break stays exact), growing until it
    covers k distinct ids, and only that small set is lexsorted.
    Module-level so tests pin the SAME function the kernel closes over
    (TestRowTopk randomized-equivalence vs a full-lexsort reference)."""
    vals = row[cand_idx]
    sel = cand_idx
    if len(cand_idx) > 4 * k + 16:
        m = 2 * k + 8
        while True:
            m = min(m, len(vals) - 1)
            thresh = vals[np.argpartition(-vals, m)[: m + 1]].min()
            keep = vals >= thresh
            if (
                m >= len(vals) - 1
                or len(np.unique(ids[cand_idx[keep]])) >= k
            ):
                sel = cand_idx[keep]
                break
            m *= 2
    order = sel[np.lexsort((ids[sel], -row[sel]))]
    nbr = ids[order]
    first = np.sort(np.unique(nbr, return_index=True)[1])[:k]
    return order[first]


def _bucket_topk_pairs(
    cand: DataFrame, k: int, bucket_cap: int | None = None
) -> DataFrame:
    """Per-(table, bucket) candidate scoring for :func:`knn_graph`:
    grouped-pandas kernel computing every within-bucket cosine via
    chunked Gram matmuls and emitting each id's top ``k`` neighbors in
    THIS bucket (cosine desc, ties by neighbor id asc — the same order
    the final global top-k uses, which makes the per-bucket cut
    lossless). Input needs ``_id``, ``_v``, ``_t``, ``_b``; NULL
    vectors and NULL buckets never pair (join-formulation parity:
    NULL buckets fail the equi-join, NULL vectors yield NULL cosine).
    ``bucket_cap`` bounds per-task rows via
    :func:`_with_block_subgroups` — the per-sub-group cut stays
    lossless for the SAME reason the per-bucket cut is: every
    candidate pair surfaces in exactly one sub-group, where a true
    global-top-k neighbor's rank can only be better."""
    from pyspark.sql import types as T

    id_type = cand.schema["_id"].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("nbr_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    empty = pd.DataFrame(
        {
            "id": pd.Series([], dtype="object"),
            "nbr_id": pd.Series([], dtype="object"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )
    grouped, keys = _with_block_subgroups(
        cand, ["_t", "_b"], "_id", bucket_cap
    )

    def _grp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["_v"].notna() & pdf["_b"].notna() & pdf["_id"].notna()]
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        blk = pdf["_blk"].to_numpy()
        mixed = pdf["_lo"].iat[0] != pdf["_hi"].iat[0]
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        out_i, out_j, out_c = [], [], []
        for i0, cos in _gram_chunks(ids, V, _bucket_chunk(n)):
            for r in range(cos.shape[0]):
                row = cos[r]
                gi = i0 + r
                # order: cosine desc, nbr_id asc; exclusion is by ID
                # (join-formulation parity: a duplicate-id row must
                # not create a degenerate self-edge), and the cut is k
                # DISTINCT neighbor ids — k ROWS would let a
                # duplicated id consume several slots and evict a true
                # k-th neighbor. First occurrence in rank order wins,
                # i.e. a duplicated neighbor contributes its best
                # cosine (deterministic; the join's dedup-then-score
                # picked an arbitrary duplicate row instead).
                elig = ids != ids[gi]
                if mixed:
                    # sub-group contract: cross-block pairs only
                    elig &= blk != blk[gi]
                cand_idx = np.nonzero(elig)[0]
                if len(cand_idx) == 0:
                    continue
                order = _row_topk(row, ids, cand_idx, k)
                out_i.extend([ids[gi]] * len(order))
                out_j.extend(ids[order].tolist())
                out_c.extend(row[order].tolist())
        if not out_i:
            return empty
        return pd.DataFrame(
            {
                "id": pd.Series(out_i, dtype="object"),
                "nbr_id": pd.Series(out_j, dtype="object"),
                "cosine": pd.Series(out_c, dtype="float64"),
            }
        )

    return grouped.groupBy(*keys).applyInPandas(_grp, out_schema)


def _semdedup_dropped_ids(
    base: DataFrame,
    threshold: float,
    chunk: int | None = None,
    bucket_cap: int | str | None = None,
) -> DataFrame:
    """Distinct ids :func:`semantic_dedup` drops, computed per cluster
    with one grouped-pandas kernel (:func:`_gram_tiles`): pairs at
    ``cos >= threshold`` resolved by the SemDeDup rule (drop the
    smaller rounded centroid distance; exact ties drop the larger id).
    ``chunk`` overrides the row-tile height (tests exercise odd
    tile-boundary geometry with it).
    Input ``base`` must carry ``_id``, ``_v`` (array<double>),
    ``cluster``, ``cent_dist``. NULL vectors never pair (cosine is SQL
    NULL in the join formulation — here they are excluded up front);
    same-id rows never pair (the join used strict id inequality).
    ``bucket_cap`` bounds per-task rows against a degenerate fat
    cluster via :func:`_with_block_subgroups`; the drop rule is
    per-pair independent, so the dropped-id UNION over sub-groups
    equals the uncapped one exactly."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField("_id", base.schema["_id"].dataType)]
    )
    grouped, keys = _with_block_subgroups(
        base, ["cluster"], "_id", bucket_cap, vec_col="_v"
    )

    def _drop(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["_v"].notna() & pdf["_id"].notna()]
        n = len(pdf)
        empty = pd.DataFrame({"_id": pd.Series([], dtype="object")})
        if n < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        blk = pdf["_blk"].to_numpy()
        mixed = pdf["_lo"].iat[0] != pdf["_hi"].iat[0]
        cd = pdf["cent_dist"].to_numpy(dtype=np.float64)
        V = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
        )
        dropped = set()
        for ii_g, jj_g, _cosv in _gram_tiles_thresh(
            ids, V, threshold, itile=chunk
        ):
            keep = (ii_g < jj_g) & (ids[ii_g] != ids[jj_g])
            if mixed:
                # sub-group contract: cross-block pairs only
                keep &= blk[ii_g] != blk[jj_g]
            ii_g, jj_g = ii_g[keep], jj_g[keep]
            if len(ii_g) == 0:
                continue
            da, db = cd[ii_g], cd[jj_g]
            ia, ja = ids[ii_g], ids[jj_g]
            loser = np.where(
                da < db, ia, np.where(db < da, ja, np.maximum(ia, ja))
            )
            dropped.update(loser.tolist())
        if not dropped:
            return empty
        return pd.DataFrame({"_id": pd.Series(sorted(dropped), dtype="object")})

    out = grouped.groupBy(*keys).applyInPandas(_drop, out_schema)
    if bucket_cap is not None:
        # an id can be dropped in several sub-groups of a decomposed hot
        # cluster; the caller left-joins on _id, so duplicates would
        # multiply its rows
        out = out.distinct()
    return out


def _semdedup_base(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int | None,
    target_cluster_size: int,
    iters: int,
    salt: str,
) -> DataFrame:
    """Stage-1 prefix of :func:`semantic_dedup` — k derivation +
    k-means fit + centroid-assignment join — factored out so the sf10
    gate can attribute the operator's three documented stages
    separately (the full-operator clean-window band spans 5x on this
    host, wide enough to hide a 2x single-stage regression; VERDICT
    r14 #1). Returns the UNPERSISTED base frame ``(_id, _v, cluster,
    cent_dist)``; :func:`semantic_dedup` owns the cache contract."""
    if k is None:
        if target_cluster_size < 1:
            raise ValueError(
                f"target_cluster_size must be >= 1, got {target_cluster_size}"
            )
        n = df.select(id_col).count()
        k = max(8, -(-n // target_cluster_size))  # ceil div
    assigned, _ = kmeans_fit(df, id_col, vec_col, k, iters=iters, salt=salt)
    return (
        df.select(F.col(id_col).alias("_id"), _dvec(vec_col).alias("_v"))
        .join(
            assigned.select(
                F.col(id_col).alias("_id"),
                F.col("pred_label").alias("cluster"),
                F.round(F.col("dist"), 4).alias("cent_dist"),
            ),
            "_id",
        )
    )


def semantic_dedup_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int | None = None,
    target_cluster_size: int = 5000,
    iters: int = 1,
    salt: str = "semdedup",
) -> DataFrame:
    """Cumulative stage-1 prefix of :func:`semantic_dedup` as a
    standalone query: the cluster assignment table ``(id, cluster,
    cent_dist)`` with identical values to the full decision table's
    first three columns (the vector column is projected away — the
    pairwise stage is what ships vectors). Exists for per-stage gate
    attribution AND as a user-facing intermediate (SemDeDup audits
    routinely inspect cluster geometry before choosing a threshold)."""
    base = _semdedup_base(
        df,
        id_col,
        vec_col,
        k=k,
        target_cluster_size=target_cluster_size,
        iters=iters,
        salt=salt,
    )
    return base.select(F.col("_id").alias(id_col), "cluster", "cent_dist")


def semantic_dedup_dropped(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int | None = None,
    target_cluster_size: int = 5000,
    iters: int = 1,
    threshold: float = 0.95,
    salt: str = "semdedup",
    bucket_cap: int | str | None = "auto",
) -> DataFrame:
    """Cumulative stage-2 prefix of :func:`semantic_dedup`: the
    distinct dropped-id set, with the exact cache lifecycle the full
    operator uses (persist base, eagerly force the small dropped
    table, release base) — so gate-timing this entry measures
    stage 1 + the per-cluster Gram pairwise + the drop rule, and the
    full-operator time minus this one attributes the final decision
    join. Values equal ``semantic_dedup(...).filter("dropped")``'s id
    column by construction (same helpers, same rounding grain)."""
    _validate_cap(bucket_cap)  # BEFORE persist (no cache-entry leak)
    base = _semdedup_base(
        df,
        id_col,
        vec_col,
        k=k,
        target_cluster_size=target_cluster_size,
        iters=iters,
        salt=salt,
    ).persist()
    dropped = _semdedup_dropped_ids(
        base, float(threshold), bucket_cap=bucket_cap
    )
    from .dedup import _eager_pairs

    dropped = _eager_pairs(dropped, base)
    return dropped.select(F.col("_id").alias(id_col))


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int | None = None,
    target_cluster_size: int = 5000,
    iters: int = 1,
    threshold: float = 0.95,
    salt: str = "semdedup",
    bucket_cap: int | str | None = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embeddings with deterministic k-means
    (:func:`kmeans_fit`), compare pairs ONLY within a cluster, and for
    every pair whose cosine >= ``threshold`` drop the member closer to
    its cluster centroid (SemDeDup keeps the low-centroid-similarity
    "outlier" copy, which preserves diversity). Returns the full
    decision table ``(id, cluster, cent_dist, dropped)`` — callers
    filter ``~dropped`` for the deduplicated corpus.

    Deterministic and engine-reproducible: k-means seeds/assignment are
    :func:`kmeans_fit`'s md5-ranked rules; the drop rule compares
    centroid distances ROUNDED to 4 decimals (cross-engine float-sum
    wobble is ~1e-12; a 6-decimal grain was observed to flip on a
    value sitting exactly on the .xxxxxx5 boundary, so the grain is
    4 — flip probability ~1e-8 per value) and breaks exact ties by
    dropping the larger id.

    100 TB shape — this is the entire point of SemDeDup vs naive
    near-dup search: the pairwise join is a keyed equi-join on the
    cluster id, never all-pairs. Cost is sum(|cluster|^2), controlled
    by ``k``. With ``k=None`` (default) it is DERIVED from the corpus:
    ``k = max(8, ceil(count / target_cluster_size))`` — the paper's
    k ~ N/target rule (SemDeDup uses 50k clusters for LAION-scale
    corpora), so each cluster holds ~``target_cluster_size`` rows and
    within-cluster pair volume stays ~N*target instead of going
    quadratic when a caller forgets to scale k with the corpus. The
    derivation costs one count() over the id column (metadata-cheap on
    parquet); pass an explicit ``k`` to skip it. AQE's skew-join
    handling splits any fat cluster. Assignment itself is
    broadcast-scored (k x dim KBs), one shuffle.
    """
    base = _semdedup_base(
        df,
        id_col,
        vec_col,
        k=k,
        target_cluster_size=target_cluster_size,
        iters=iters,
        salt=salt,
    )
    # per-cluster Gram-matrix kernel: the within-cluster pair volume
    # (sum |cluster|^2 x dim mults) is the hot loop, and a pair JOIN
    # materializes TWO dim-sized vectors per pair through the shuffle
    # and Arrow — O(pairs x dim) traffic, ~128 GB at 50k rows /
    # 5k-clusters / dim 64, measured 114 s on 32 cores. applyInPandas
    # over the cluster key ships each vector ONCE (O(N x dim)), does
    # the pair math as chunked BLAS matmuls, and emits only the
    # dropped ids — same double math, same HALF_UP 6-decimal rounding
    # as F.round, pinned equivalent to the join path by
    # TestSemanticDedupKernel. Per-group memory is one cluster's
    # vectors (~target_cluster_size x dim doubles) plus a
    # chunk x cluster slab — bounded, documented, AQE-independent.
    # hot-cluster cap: k is derived to keep clusters ~target size, but a
    # degenerate corpus (near-identical embeddings) can collapse k-means
    # into one fat cluster — the cap decomposes it into bounded-memory
    # block-pair sub-groups with the exact same dropped set. "auto"
    # derives the cap from the vector width inside the sizes agg (zero
    # extra actions).
    #
    # Cache contract (same shape as dedup.minhash_dup_pairs): base is
    # read by the cap's sizes aggregation, the kernel branch, AND the
    # final decision join — each branch would otherwise recompute the
    # k-means assignment join. Persist base, force the SMALL dropped-id
    # table eagerly (it stays cached for the caller's action), release
    # base before returning; the final join then recomputes base's
    # lineage once on the caller's action — the same total as the
    # pre-cap plan, with the sizes pass reading the cache for free.
    _validate_cap(bucket_cap)  # BEFORE persist (no cache-entry leak)
    base = base.persist()
    dropped_ids = _semdedup_dropped_ids(
        base, float(threshold), bucket_cap=bucket_cap
    )
    from .dedup import _eager_pairs

    dropped_ids = _eager_pairs(dropped_ids, base)
    return (
        base.join(
            dropped_ids.withColumn("_dropped", F.lit(True)), "_id", "left"
        )
        .select(
            F.col("_id").alias(id_col),
            "cluster",
            "cent_dist",
            F.coalesce(F.col("_dropped"), F.lit(False)).alias("dropped"),
        )
    )


def projection_matrix(dim: int, out_dim: int, seed: int = 42) -> list:
    """Seeded Gaussian random-projection matrix as a plain
    ``dim × out_dim`` nested list (row i = input dim i's weights) —
    exposed so tests/oracles can reproduce the exact projection.
    Deterministic: ``random.Random(seed)`` Gaussians scaled by
    1/sqrt(out_dim) (Johnson–Lindenstrauss normalization)."""
    rnd = random.Random(seed)
    scale = 1.0 / math.sqrt(out_dim)
    return [
        [rnd.gauss(0.0, 1.0) * scale for _ in range(out_dim)]
        for _ in range(dim)
    ]


def random_project(
    vec_col, dim: int, out_dim: int, *, seed: int = 42
) -> Column:
    """Johnson–Lindenstrauss random projection of an embedding column
    to ``out_dim`` dims (array<double>): the standard pre-LSH /
    pre-index width cut — pairwise distances are preserved within
    ~(1±ε) for out_dim = O(log n / ε²), and downstream banding/IVF cost
    drops with the width.

    One Arrow-batched numpy matmul per batch (the per-element HOF
    alternative interprets dim × out_dim multiplies per row);
    deterministic across runs and engines (the matrix derives from
    ``seed`` only — :func:`projection_matrix`)."""
    r = np.asarray(projection_matrix(dim, out_dim, seed), dtype=np.float64)

    @F.pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        # NULL-safe: None vector -> NULL projection, not a task crash
        vals = v.tolist()
        valid = [i for i, x in enumerate(vals) if x is not None]
        out = [None] * len(vals)
        if valid:
            m = np.vstack([np.asarray(vals[i], dtype=np.float64) for i in valid])
            proj = m @ r
            for j, i in enumerate(valid):
                out[i] = proj[j].tolist()
        return pd.Series(out, dtype=object)

    return _proj(_col(vec_col))
