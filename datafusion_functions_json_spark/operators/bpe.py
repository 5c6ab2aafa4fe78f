"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
word-table formulation that makes byte-pair-encoding tractable on a
100 TB corpus.

The classic algorithm never needs the corpus after one pass: merge
statistics depend only on the DISTINCT-WORD frequency table, which is
vocabulary-sized (tens of millions of rows for web-scale text), not
corpus-sized. So:

1. ``word_table`` — ONE corpus scan: explode to words, hash-aggregate
   counts. This is the only stage that touches the 100 TB; everything
   after runs on the word table.
2. ``bpe_train`` — per merge step, over the word table only:
   adjacent-pair counts (``arrays_zip(slice, slice)`` + explode + one
   keyed agg), a 1-row collect of the argmax pair (bounded driver
   state — the merge list IS the model, ``n_merges`` rows total), and
   a pure-Column greedy fold rewriting each word's symbol array. A
   ``localCheckpoint`` every few steps keeps the lineage flat (the
   same contract as graph.connected_components' rounds).
3. ``bpe_apply`` — replay a learned merge list over any symbol table
   (chained folds; plan depth grows with the merge count, so for
   production-sized merge lists segment via the word-table join:
   encode = tokenize → join the trained table's final segmentation —
   one keyed join, no per-token work at all for in-vocabulary words).

Determinism: the argmax pair is tie-broken (count DESC, left ASC,
right ASC), so the learned merges are engine-reproducible — the driver
query's DuckDB oracle replays training step-for-step in SQL.

The greedy fold is left-to-right non-overlapping (``aaa`` + merge
(a,a) → ``[aa, a]``), matching the reference BPE implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_table",
    "bpe_train",
    "bpe_apply",
    "bpe_encode_words",
    "bpe_stats",
]

_WORD_RE = "[a-z]+"


def word_table(
    docs: DataFrame,
    text_col: str,
    *,
    lowercase: bool = True,
    word_regex: str = _WORD_RE,
    min_count: int = 1,
) -> DataFrame:
    """Distinct-word frequency table — the single corpus pass.

    ``word_regex`` defaults to lowercase-alpha runs (the classic
    demo alphabet; pass a richer pattern for production). ``min_count``
    prunes the long tail before training (hapaxes cost pair-count work
    but barely move merge statistics).
    """
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = docs.select(
        F.explode(F.regexp_extract_all(t, F.lit(word_regex), 0)).alias("word")
    )
    wt = words.groupBy("word").agg(F.count("*").alias("wcount"))
    if min_count > 1:
        wt = wt.filter(F.col("wcount") >= min_count)
    return wt


def _merge_fold(syms, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — pure Column fold, no UDF."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(wt: DataFrame) -> DataFrame:
    s = F.col("syms")
    pairs = F.arrays_zip(
        F.slice(s, 1, F.size(s) - 1).alias("l"),
        F.slice(s, 2, F.size(s) - 1).alias("r"),
    )
    return (
        wt.select("wcount", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("wcount").alias("freq"))
    )


def bpe_train(
    words: DataFrame,
    *,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "wcount",
    checkpoint_every: int = 8,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    Returns ``(merges, segmented)``: ``merges`` is
    ``[(step, left, right, freq), ...]`` (1-based steps) in priority
    order — the entire model, ``n_merges`` rows of driver state — and
    ``segmented`` is the rewritten word table ``(word, wcount, syms)``
    whose symbol arrays reflect all learned merges (feed it to
    :func:`bpe_encode_words`). Stops early when no adjacent pair
    remains.

    Each step is one Spark job over the word table: pair-count agg →
    1-row argmax collect → Column fold rewrite. Cost per step is
    O(vocabulary), independent of corpus size; the corpus was consumed
    once by :func:`word_table`.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    wt = words.select(
        F.col(word_col).alias("word"),
        F.col(count_col).cast("bigint").alias("wcount"),
        F.split(F.col(word_col), "").alias("syms"),
    )
    # materialize the vocab ONCE up front — without this the lazy plan
    # re-aggregates the corpus inside every step's pair-count job until
    # the first periodic checkpoint, breaking the one-corpus-scan
    # contract this formulation exists for
    wt = wt.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(wt)
            .orderBy(
                F.col("freq").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, freq = top[0]["left"], top[0]["right"], top[0]["freq"]
        merges.append((step, left, right, int(freq)))
        wt = wt.withColumn("syms", _merge_fold(F.col("syms"), left, right))
        if step % checkpoint_every == 0:
            # flat lineage: without this the fold chain re-evaluates
            # from step 1 inside every later pair-count job
            wt = wt.localCheckpoint(eager=True)
    return merges, wt


def bpe_apply(
    df: DataFrame,
    syms_col: str,
    merges: list,
) -> DataFrame:
    """Replay a merge list (priority order) over a symbol-array column.
    Chained pure-Column folds — plan depth grows with ``len(merges)``,
    fine for demo/test-sized lists; production encoding should join the
    trained word table instead (see :func:`bpe_encode_words`)."""
    out = F.col(syms_col)
    for m in merges:
        _, left, right = m[0], m[1], m[2]
        out = _merge_fold(out, left, right)
    return df.withColumn(syms_col, out)


def bpe_encode_words(
    docs: DataFrame,
    text_col: str,
    segmented: DataFrame,
    *,
    id_col: str = "doc_id",
    lowercase: bool = True,
    word_regex: str = _WORD_RE,
    word_col: str = "word",
    syms_col: str = "syms",
) -> DataFrame:
    """Token-count documents against a TRAINED segmentation table
    (``word → final symbol array``, i.e. ``bpe_train``'s rewritten word
    table): explode to words, one keyed join, per-doc aggregate.

    Returns ``(id_col, n_words, n_bpe_tokens)``; out-of-vocabulary
    words fall back to character count (their untrained segmentation).
    This is the scale path — encoding 100 TB is a keyed join against a
    vocabulary-sized dim (broadcastable when the vocab is small), with
    zero per-token Python.
    """
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    exploded = docs.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(t, F.lit(word_regex), 0)).alias("word"),
    )
    seg = segmented.select(
        F.col(word_col).alias("word"),
        F.size(F.col(syms_col)).alias("_n_syms"),
    )
    return (
        exploded.join(seg, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                F.coalesce(F.col("_n_syms"), F.length("word"))
            ).alias("n_bpe_tokens"),
        )
    )


def bpe_stats(
    docs: DataFrame,
    text_col: str,
    segmented: DataFrame,
    *,
    lowercase: bool = True,
    word_regex: str = _WORD_RE,
    word_col: str = "word",
    syms_col: str = "syms",
) -> DataFrame:
    """Corpus-level tokenizer evaluation against a trained segmentation
    table — the numbers that decide whether a tokenizer is good enough
    to ship: one row with

    * ``n_docs`` / ``n_words`` / ``n_tokens`` / ``n_oov`` / ``n_chars``
      (chars counted INSIDE tokenized words — whitespace the tokenizer
      never sees is excluded, so ``chars_per_token`` is a property of
      the tokenizer, not the formatting);
    * ``tokens_per_word`` (fertility), ``chars_per_token``
      (compression), ``oov_rate`` (fraction of word OCCURRENCES absent
      from the vocabulary, which fall back to character segmentation in
      :func:`bpe_encode_words`) — each rounded to 6 decimals.

    Same scale shape as encoding: explode to words, one keyed join
    against the vocabulary-sized dim (broadcastable), then a partial
    aggregate that collapses each partition to one row pre-shuffle.
    The 1-row doc count rides in on a bounded cross join.
    """
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    exploded = docs.select(
        F.explode(F.regexp_extract_all(t, F.lit(word_regex), 0)).alias("word")
    )
    seg = segmented.select(
        F.col(word_col).alias("word"),
        F.size(F.col(syms_col)).alias("_n_syms"),
    )
    j = exploded.join(seg, "word", "left")
    word_agg = j.agg(
        F.count("*").alias("n_words"),
        F.sum(F.coalesce(F.col("_n_syms"), F.length("word"))).alias(
            "n_tokens"
        ),
        F.sum(
            F.when(F.col("_n_syms").isNull(), 1).otherwise(0)
        ).alias("n_oov"),
        F.sum(F.length("word")).alias("n_chars"),
    )
    docs_agg = docs.agg(F.count("*").alias("n_docs"))
    return docs_agg.crossJoin(word_agg).select(
        "n_docs",
        "n_words",
        "n_tokens",
        "n_oov",
        "n_chars",
        F.round(F.col("n_tokens") / F.col("n_words"), 6).alias(
            "tokens_per_word"
        ),
        F.round(F.col("n_chars") / F.col("n_tokens"), 6).alias(
            "chars_per_token"
        ),
        F.round(F.col("n_oov") / F.col("n_words"), 6).alias("oov_rate"),
    )
