"""End-to-end training-data curation: the operators composed the way a
100 TB pipeline would run them, cheapest-first so each stage shrinks the
data for the next.

Stage order (and why):

1. **quality gate** — scan-speed column expressions; drops garbage before
   anything shuffles.
2. **language filter** — still scan-speed.
3. **exact dedup** — one hash shuffle on the text (dropDuplicates).
4. **near dedup (MinHash)** — the only expensive stage, now running on
   the survivors only; banded self-join as in dedup.py.
5. **fingerprint + stats** — bookkeeping columns for downstream joins.

Each stage is also exposed separately; `curate` is the composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup, split as split_ops, text

__all__ = [
    "curate",
    "curate_balanced",
    "curate_strict",
    "curation_stats",
    "training_prep",
]


def _dedup_min_id(df: DataFrame, key_expr, id_col: str) -> DataFrame:
    """Exact dedup keeping the minimum ``id_col`` per ``key_expr``
    group — the digest-keyed window shared by :func:`curate` and
    :func:`curate_strict` (one definition, so a tie-break or key-
    handling fix reaches both)."""
    w = Window.partitionBy(key_expr).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def curate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    languages: tuple = ("en",),
    quality_threshold: float = 0.5,
    near_dedup: bool = True,
    minhash_kwargs: dict | None = None,
) -> DataFrame:
    """Filter + dedup a document table for training. Returns the kept
    rows with added columns: lang, quality, n_tokens, fingerprint."""
    enriched = docs.withColumn("n_tokens", text.token_count(text_col)).withColumn(
        "lang", text.lang_id(text_col)
    ).withColumn("quality", text.quality_score(text_col))

    kept = enriched.filter(
        (F.col("n_tokens") >= min_tokens)
        & F.col("lang").isin(*languages)
        & (F.col("quality") >= quality_threshold)
    )

    # exact dedup keeping the smallest id per identical text
    # (deterministic). The shuffle key is sha2(text) — a 32-byte digest —
    # never the document itself: at 100 TB, shuffling full documents as
    # keys is the difference between a dedup and a cluster outage. Equal
    # digest is treated as equal text (2^-256 collision odds).
    kept = _dedup_min_id(kept, F.sha2(F.col(text_col), 256), id_col)

    if near_dedup:
        kw = dict(num_perm=32, bands=8, mode="word", n=3, threshold=0.8)
        kw.update(minhash_kwargs or {})
        kept = dedup.minhash_dedup(kept, id_col, text_col, **kw)

    return kept.withColumn("fingerprint", text.fingerprint(text_col))


def training_prep(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: dict | None = None,
    salt: str = "",
    chunk_tokens: int = 512,
    overlap: int = 64,
    batch_budget: int | None = None,
    shards: int = 32,
    deterministic_shard: bool = False,
    **curate_kwargs,
) -> DataFrame:
    """The full prep a pretraining corpus needs, composed end-to-end:

    curate (quality/lang gate + dedup) → :func:`split.hash_split`
    (reproducible train/val/test) → :func:`text.chunk_documents`
    (context windows) → :func:`split.pack_batches` (token-budget
    batches, split-pure shards).

    Composition notes that matter at 100 TB:

    * The split label is recomputed from the doc id AFTER chunking — a
      pure projection — instead of joining chunk rows back to a label
      table (that join would shuffle the whole chunk set).
    * Batch shards embed the split name (``train#7``), so every batch
      is split-pure while one window pass packs all splits at once.
    * ``deterministic_shard`` uses ``id % shards`` (cross-engine
      reproducible, used by the oracle); default is xxhash64 sharding.

    Returns one row per chunk: id, chunk_id, tok_start, n_tokens,
    chunk_text, split (+ shard, batch_id when ``batch_budget`` is set).
    """
    kept = curate(docs, id_col=id_col, text_col=text_col, **curate_kwargs)
    chunks = text.chunk_documents(
        kept, id_col, text_col, chunk_tokens=chunk_tokens, overlap=overlap
    )
    lab = split_ops.hash_split(chunks, id_col, splits, salt=salt)
    if batch_budget is None:
        return lab
    idx = (
        F.pmod(F.col(id_col), F.lit(shards))
        if deterministic_shard
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    )
    shard = F.concat(F.col("split"), F.lit("#"), idx.cast("string"))
    return split_ops.pack_batches(
        lab,
        id_col,
        "n_tokens",
        budget=batch_budget,
        shards=shards,
        shard_expr=shard,
        order_by=[id_col, "chunk_id"],
    )


def curation_stats(docs: DataFrame, kept: DataFrame) -> DataFrame:
    """One-row summary: input/output counts and survival rate.

    Both counts ride ONE Spark job (a tagged union-aggregate), not two
    separate count() actions — still one full evaluation of the
    ``kept`` pipeline, which is inherent to counting a frame the caller
    built. When the stats should ride the SAME action that writes the
    output (zero extra passes), thread a
    :class:`~.metrics.StageMetrics` through :func:`curate_strict`'s
    ``stages`` hook instead — this helper is the simple after-the-fact
    convenience."""
    u = docs.select(
        F.lit(1).alias("_in"), F.lit(0).alias("_out")
    ).unionAll(kept.select(F.lit(0).alias("_in"), F.lit(1).alias("_out")))
    # coalesce: F.sum over ZERO rows is NULL, so an empty docs frame
    # must still yield a (0, 0, 0.0) row, not a TypeError on row.n_in
    row = u.agg(
        F.coalesce(F.sum("_in"), F.lit(0)).alias("n_in"),
        F.coalesce(F.sum("_out"), F.lit(0)).alias("n_out"),
    ).collect()[0]
    return docs.sparkSession.createDataFrame(
        [(row.n_in, row.n_out, round(row.n_out / max(row.n_in, 1), 6))],
        "n_in bigint, n_out bigint, survival_rate double",
    )


def curate_strict(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple = ("en",),
    min_tokens: int = 10,
    gopher_kwargs: dict | None = None,
    apply_c4: bool = False,
    classifier_threshold: float | None = None,
    benchmark: DataFrame | None = None,
    fuzzy_threshold: float = 0.7,
    stages=None,
) -> DataFrame:
    """The round-6 curation composition — the published-recipe gates
    chained cheapest-first:

    1. language + token floor (scan-speed projections);
    2. the full Gopher rule conjunction
       (:func:`~.text.gopher_quality_flags`, thresholds via
       ``gopher_kwargs``);
    3. optionally the C4 line cleaner (REWRITES ``text_col``);
    4. optionally the linear quality classifier floor;
    5. NORMALIZED exact dedup — case/accent/punctuation variants
       collapse via :func:`~.text.normalized_dedup_key` (32-byte digest
       shuffle key, min id survives);
    6. optionally fuzzy benchmark decontamination
       (:func:`~.dedup.fuzzy_decontaminate`).

    Returns survivors with ``lang``/``n_tokens``/``clf_score`` columns.
    Everything before stage 5 is shuffle-free; stage 5 is one
    digest-keyed shuffle over the survivors only.

    Pass ``stages`` (a :class:`~.metrics.StageMetrics`) to get per-gate
    row counts riding the SAME action that materializes the output —
    zero extra passes (``stages.report()`` after the action)."""

    def _track(d, name):
        return stages.track(d, name) if stages is not None else d

    enriched = (
        docs.withColumn("lang", text.lang_id(F.col(text_col)))
        .withColumn("n_tokens", text.token_count(F.col(text_col)))
        .withColumn(
            "clf_score",
            F.round(text.quality_classifier_score(F.col(text_col)), 6),
        )
    )
    enriched = _track(enriched, "input")
    kept = enriched.filter(
        (F.col("n_tokens") >= min_tokens) & F.col("lang").isin(*languages)
    )
    kept = kept.filter(
        text.gopher_quality_flags(F.col(text_col), **(gopher_kwargs or {}))[
            "keep"
        ]
    )
    kept = _track(kept, "post_gates")
    if apply_c4:
        c = text.c4_clean(F.col(text_col))
        kept = (
            kept.withColumn("_c4", c)
            .filter(~F.col("_c4")["doc_dropped"])
            .withColumn(text_col, F.col("_c4")["cleaned_text"])
            .drop("_c4")
        )
        # the returned lang/n_tokens/clf_score must describe the text
        # the caller GETS (and the classifier gate below must score the
        # cleaned text per the documented stage order) — recompute over
        # the rewritten column; still scan-speed projections
        kept = (
            kept.withColumn("lang", text.lang_id(F.col(text_col)))
            .withColumn("n_tokens", text.token_count(F.col(text_col)))
            .withColumn(
                "clf_score",
                F.round(text.quality_classifier_score(F.col(text_col)), 6),
            )
        )
    if classifier_threshold is not None:
        kept = kept.filter(F.col("clf_score") >= float(classifier_threshold))
    kept = _dedup_min_id(
        kept, text.normalized_dedup_key(F.col(text_col)), id_col
    )
    kept = _track(kept, "post_dedup")
    if benchmark is not None:
        kept = dedup.fuzzy_decontaminate(
            kept, id_col, text_col, benchmark, threshold=fuzzy_threshold
        )
        kept = _track(kept, "post_decontam")
    return kept


def curate_balanced(
    docs: DataFrame,
    *,
    group_col: str = "source",
    cap: int = 10_000,
    order_col: str = "clf_score",
    **curate_kwargs,
) -> DataFrame:
    """:func:`curate_strict` followed by a per-``group_col`` quality cap
    (:func:`~.split.cap_per_group`, keep the ``cap`` highest-``order_col``
    survivors per group) — gates first so junk never occupies quota,
    then source balancing so no domain dominates the mixture. The cap
    stage adds one group-keyed exchange over the SURVIVORS only, with a
    WindowGroupLimit running top-k per group before the shuffle."""
    from .split import cap_per_group

    kept = curate_strict(docs, **curate_kwargs)
    id_col = curate_kwargs.get("id_col", "doc_id")
    return cap_per_group(kept, group_col, order_col, id_col, cap)
