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


def _select_merge_batch(ranked, symbols: set, m: int) -> list:
    """The exactness-preserving batch-acceptance rule of
    :func:`bpe_train` as a pure function (unit-testable without Spark).

    ``ranked`` is the top ``m+1`` pair rows ``(left, right, freq)`` in
    classic argmax order (freq DESC, left ASC, right ASC) — one row
    MORE than may be accepted, so the window always exposes the count
    of the best pair left behind; ``symbols`` is the full symbol
    universe of the current table (initial alphabet + every merge
    output so far — driver-known, no Spark job needed). Returns the
    accepted prefix (≤ ``m`` rows), guaranteed to equal what that many
    classic one-at-a-time argmax rounds would have selected:

    * accept a RANK PREFIX of mutually symbol-disjoint pairs — merging
      symbol-disjoint pairs cannot change each other's counts, so
      their classic selection order is their rank order;
    * stop at the first pair sharing a symbol with an accepted pair
      (or whose merged name collides, see below), or at the ``m+1``-th
      row — from there on, classic recounting could reorder;
    * every new pair a merge creates contains the fresh merged symbol,
      and its count is bounded by an OLD pair overlapping the merge
      (``x·ab`` arises only from ``x·a·b``, so count(x,ab) ≤ old
      count(x,a)) — i.e. by a CONFLICTING old pair. Conflicting pairs
      all rank at-or-below the stopping row, so requiring accepted
      freqs STRICTLY above the stopping row's freq (the threshold)
      guarantees no created pair can outrank — or tie-break past — an
      accepted one;
    * if the scan ends before the stopping conditions (fewer than
      ``m+1`` rows exist), NO pair was left behind and the accepted
      set stands with no threshold filter;
    * aliasing guard: if a pair's merged name already exists as a
      symbol (``(a, bc)`` → ``"abc"`` when an earlier ``(ab, c)``
      made ``"abc"``), the merge can INCREASE counts of old pairs
      involving that symbol beyond the threshold bound — treat it as
      a conflict and stop;
    * self-pair guard: a SELF-pair ``(a, a)`` escapes the
      overlap bound — merging ``aaa…`` runs creates ``(aa, a)``
      adjacencies bounded only by the self-pair's OWN count (each
      ``aa·a`` comes from ``a·a·a``, two self-adjacencies), which sits
      ABOVE the threshold, so a created pair could outrank any
      later-accepted disjoint pair (word table ``{"aaa": 5, "cd": 4}``:
      classic learns ``(a,a,10)`` then ``(aa,a,5)``, never ``(c,d,4)``
      second). A self-pair may be accepted but CLOSES the batch —
      nothing is accepted after it this round, and the row after it
      still sets the strict-dominance threshold (its own created
      pairs are bounded by pairs at/below that row). Non-self merges
      cannot escape: every pair they create is bounded by an old pair
      sharing one of their constituents, i.e. a conflicting row
      at/below the threshold.

    The first pair is always accepted (a 1-pair batch IS the classic
    step); the threshold test never evicts it.
    """
    if not ranked:
        return []
    used: set = set()
    accepted = []
    threshold = None
    closed = False
    for i, r in enumerate(ranked):
        concat = r["left"] + r["right"]
        conflict = (
            closed
            or i >= m
            or r["left"] in used
            or r["right"] in used
            or concat in used
            or concat in symbols
        )
        if conflict:
            threshold = r["freq"]
            break
        accepted.append(r)
        used.update((r["left"], r["right"], concat))
        if r["left"] == r["right"]:
            closed = True
    if threshold is None:
        # window exhausted: no pair exists below the accepted set, so
        # nothing can outrank it — created pairs included (a closing
        # self-pair is necessarily the LAST accepted element here)
        return accepted
    return [ranked[0]] + [r for r in accepted[1:] if r["freq"] > threshold]


def bpe_train(
    words: DataFrame,
    *,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "wcount",
    checkpoint_every: int = 8,
    batch_size: int = 1,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    Returns ``(merges, segmented)``: ``merges`` is
    ``[(step, left, right, freq), ...]`` (1-based steps) in priority
    order — the entire model, ``n_merges`` rows of driver state — and
    ``segmented`` is the rewritten word table ``(word, wcount, syms)``
    whose symbol arrays reflect all learned merges (feed it to
    :func:`bpe_encode_words`). Stops early when no adjacent pair
    remains.

    Each ROUND is one Spark job over the word table: pair-count agg →
    one small argmax collect → Column fold rewrites. Cost per round is
    O(vocabulary), independent of corpus size; the corpus was consumed
    once by :func:`word_table`.

    ``batch_size`` bounds how many merges one round may accept: the
    top ``batch_size+1`` pairs are collected and the longest provably
    order-exact prefix is applied (see :func:`_select_merge_batch` —
    mutually disjoint, strictly count-dominating, alias-free; at least
    1 per round always). The merge list is IDENTICAL to
    ``batch_size=1`` training by construction — batching only cuts
    driver round-trips, the sequential-latency bottleneck when
    training a production-sized vocab (30k merges = 30k driver rounds
    at ``batch_size=1``). On conflict-heavy rounds it degrades
    gracefully toward one merge per round. Measured honestly: English
    text CHAINS merges (``e+s``, then ``es+t``…), so acceptance is
    usually 1-3 per round — 64 merges took 53 rounds at
    ``batch_size=8`` on the synthetic docs corpus (~17% fewer
    round-trips; corpora mixing several independent scripts/alphabets
    batch much better). The rule never trades exactness for depth.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
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
    symbols: set = set()
    if batch_size > 1:
        # symbol universe for the aliasing guard: the initial alphabet
        # (one DISTINCT-symbol agg — charset-sized, a bounded collect)
        # plus every merge output, maintained driver-side from then on
        symbols = {
            r["s"]
            for r in wt.select(
                F.explode("syms").alias("s")
            ).distinct().collect()
        }
    merges: list[tuple[int, str, str, int]] = []
    since_checkpoint = 0
    while len(merges) < n_merges:
        m = min(batch_size, n_merges - len(merges))
        top = (
            _pair_counts(wt)
            .orderBy(
                F.col("freq").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(m + 1)
            .collect()
        )
        if not top:
            break
        batch = (
            _select_merge_batch(top, symbols, m) if m > 1 else top[:1]
        )
        for r in batch:
            left, right, freq = r["left"], r["right"], r["freq"]
            merges.append((len(merges) + 1, left, right, int(freq)))
            wt = wt.withColumn(
                "syms", _merge_fold(F.col("syms"), left, right)
            )
            symbols.add(left + right)
            since_checkpoint += 1
            if since_checkpoint >= checkpoint_every:
                # flat lineage: without this the fold chain
                # re-evaluates from step 1 inside every later
                # pair-count job
                wt = wt.localCheckpoint(eager=True)
                since_checkpoint = 0
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
