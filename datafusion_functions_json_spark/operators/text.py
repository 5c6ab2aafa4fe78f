"""Text analysis for training-data pipelines: tokenization, language ID,
quality scoring, fingerprinting.

Everything here is pure Column expressions — JVM-side, whole-stage
codegen'd, zero Python in the hot path. At 100 TB these run at scan
speed; the only shuffle any of them introduces is the caller's own
aggregation.

ANSI-safety: Spark 4 runs with ``spark.sql.ansi.enabled=true`` where
integer overflow is an error, so all rolling-hash arithmetic stays inside
explicit modular bounds (acc < 2^31, multiplier < 2^21 → products < 2^52
< 2^63).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "lines",
    "sentences",
    "sentence_count",
    "repetition_stats",
    "url_domains",
    "canonical_url",
    "domain_suffixes",
    "filter_blocked_domains",
    "domain_counts",
    "URL_PATTERN",
    "char_ngrams",
    "word_ngrams",
    "stopword_hits",
    "lang_id",
    "quality_features",
    "quality_score",
    "quality_classifier_score",
    "corpus_quality_report",
    "QUALITY_CLASSIFIER_WEIGHTS",
    "fingerprint",
    "redact_pii",
    "pii_counts",
    "pii_report",
    "PII_PATTERNS",
    "chunk_documents",
    "vocabulary",
    "token_stats",
    "top_tokens",
    "tf_idf",
    "unigram_lm_score",
    "bigram_lm_score",
    "line_dedup",
    "bm25_scores",
    "duplicated_span_fraction",
    "decontaminate",
    "decontaminate_filter",
    "gopher_quality_flags",
    "pretoken_count",
    "normalize_text",
    "top_ngram_char_fraction",
    "top_ngram_char_fraction_agg",
    "normalized_dedup_key",
    "ACCENT_FOLD_SRC",
    "ACCENT_FOLD_DST",
    "BPE_PRETOKEN_PATTERN",
    "c4_clean",
    "GOPHER_REQUIRED_STOPWORDS",
    "STOPWORDS",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text) -> Column:
    """Whitespace tokenization: array<string> of non-empty tokens."""
    t = _col(text)
    return F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")


def token_count(text) -> Column:
    """Whitespace token count (0 for empty/blank, NULL for NULL)."""
    return F.size(tokens(text))


def lines(text) -> Column:
    """Non-empty trimmed lines: array<string> (split on ``\\n``)."""
    t = _col(text)
    return F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )


def repetition_stats(text) -> Column:
    """Gopher-style line-repetition signals as a struct:
    ``n_lines``, ``dup_line_frac`` (lines beyond the first occurrence of
    their value / all lines), ``dup_line_char_frac`` (characters in those
    repeat occurrences / all line characters). Boilerplate-heavy scrapes
    (nav bars, cookie banners repeated per page section) score high and
    get gated; clean prose scores 0.

    Pure Column expressions over the line array — ``array_distinct`` +
    two linear ``aggregate`` folds, all JVM-side, scan-speed, no shuffle
    (per-doc line counts are small; the token-level analogs with
    unbounded per-doc cardinality live in :func:`token_stats`, which
    uses the exploded hash-agg shape instead)."""
    ls = lines(text)
    dls = F.array_distinct(ls)
    chars = F.aggregate(
        F.transform(ls, lambda x: F.length(x)),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    dchars = F.aggregate(
        F.transform(dls, lambda x: F.length(x)),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    n = F.size(ls)
    return F.struct(
        n.alias("n_lines"),
        F.round(
            (n - F.size(dls)) / F.greatest(n, F.lit(1)), 6
        ).alias("dup_line_frac"),
        F.round(
            (chars - dchars) / F.greatest(chars, F.lit(1)), 6
        ).alias("dup_line_char_frac"),
    )


#: URL pattern on the common Java-regex/RE2 subset (no lookarounds):
#: scheme + host captured up to the first path/query/space delimiter.
#: The scheme is case-insensitive via explicit classes (HTTP:// appears
#: in real web corpora; inline (?i) flags are avoided to stay on the
#: subset every engine the oracles run on supports identically).
URL_PATTERN = r"[Hh][Tt][Tt][Pp][Ss]?://([A-Za-z0-9.-]+)"


def url_domains(text) -> Column:
    """All URL host names in the text (array<string>, lowercased, in
    document order, duplicates kept — callers aggregate). Scan-speed
    ``regexp_extract_all``; no shuffle."""
    return F.transform(
        F.regexp_extract_all(_col(text), F.lit(URL_PATTERN), F.lit(1)),
        lambda d: F.lower(d),
    )


def canonical_url(
    url,
    *,
    strip_www: bool = True,
    drop_params: tuple = ("utm_", "fbclid", "gclid", "ref"),
) -> Column:
    """Canonical form of a URL for exact URL-level dedup — the key a
    crawl pipeline groups by before any content hashing. Pure Column
    expression (scan-speed, no UDF, no shuffle):

    * fragment dropped, scheme and host lowercased (path/query case is
      significant per RFC 3986 and kept);
    * leading ``www.`` stripped from the host (``strip_www=False`` to
      keep), default ports ``:80`` (http) / ``:443`` (https) stripped;
    * one trailing ``/`` stripped from the path;
    * query params split on ``&``; tracking params dropped — an entry of
      ``drop_params`` ending in ``_`` matches as a key PREFIX
      (``utm_source``), otherwise as the EXACT key (``ref`` drops
      ``ref=x`` but keeps ``referrer=x``); survivors sorted bytewise and
      rejoined, so param order never splits a dedup group. An
      empty survivor set drops the ``?`` entirely.

    NULL in → NULL out. The rules are engine-portable (mirrored
    closed-form in the driver oracle): same input gives the same
    canonical key on any engine, so URL-dedup groups are reproducible.
    """
    # regexp-strip, not trim(): Spark's trim removes only spaces, and a
    # crawl URL can carry raw tabs/newlines; (?s) makes '.' span
    # newlines so a fragment containing one is still fully dropped
    u = F.regexp_replace(
        F.regexp_replace(_col(url), r"^\s+|\s+$", ""), r"(?s)#.*", ""
    )
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"(?s)^[^?]*\?(.*)$", 1)
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*://)", 1))
    rest = F.substring(base, F.length(scheme) + F.lit(1), F.lit(1 << 30))
    host = F.lower(F.regexp_extract(rest, r"^([^/]*)", 1))
    # \z (true end of input), not $: Java's $ also matches before a
    # final newline, which would mis-strip on \n-bearing garbage input
    path = F.regexp_replace(
        F.substring(rest, F.length(host) + F.lit(1), F.lit(1 << 30)),
        r"/\z",
        "",
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    host = (
        F.when(scheme == "http://", F.regexp_replace(host, r":80\z", ""))
        .when(scheme == "https://", F.regexp_replace(host, r":443\z", ""))
        .otherwise(host)
    )

    def _keep(p: Column) -> Column:
        key = F.substring_index(p, "=", 1)
        drop = F.lit(False)
        for d in drop_params:
            if d.endswith("_"):
                drop = drop | key.startswith(F.lit(d))
            else:
                drop = drop | (key == F.lit(d))
        return (p != "") & ~drop

    qs = F.array_join(F.array_sort(F.filter(F.split(query, "&"), _keep)), "&")
    return F.concat(
        scheme,
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def domain_counts(df, id_col, text_col) -> "DataFrame":
    """Corpus-level domain frequency: ``(domain, n_urls, n_docs)`` — the
    source-mix / blocklist view a web-scrape curation pass starts from.

    Plan: explode(url_domains) → domain-keyed hash agg. ``count(*)`` is
    map-side partial; ``count(distinct id)`` plans as the two-phase
    distinct Expand. Domain keys are Zipf-skewed at corpus scale — the
    partial aggregation collapses per-partition duplicates before the
    exchange and AQE skew handling covers the rest.
    """
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.explode(url_domains(text_col)).alias("domain"),
    )
    return ex.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("__id").alias("n_docs"),
    )


def char_ngrams(text, n: int = 5) -> Column:
    """Distinct character n-grams (shingles). JVM-side: transform over an
    index sequence + substr. Short texts yield the whole text as the only
    shingle."""
    t = _col(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(n)),
        )
    )


def word_ngrams(text, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces."""
    toks = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


# Tiny demonstration stoplists (public common-word lists). Real pipelines
# swap in full lists; the operator shape is what matters.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por"],
}


def stopword_hits(text, lang: str = "en") -> Column:
    """Count of DISTINCT stopwords of ``lang`` present in the text."""
    return F.size(
        F.array_intersect(
            F.array_distinct(tokens(F.lower(_col(text)))),
            F.array(*[F.lit(w) for w in STOPWORDS[lang]]),
        )
    )


def lang_id(text) -> Column:
    """Heuristic language ID: the language whose stoplist scores the most
    distinct hits; ties break by language code order; no hits => 'und'.

    Pure expressions — at scale this is a scan-speed map. (A real system
    would use character n-gram profiles; the operator shape — per-row
    classify, no shuffle — is identical.)
    """
    t = _col(text)
    scored = F.array(
        *[
            F.struct(
                stopword_hits(t, lang).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    return F.when(best.isNull(), F.lit("und")).otherwise(best["lang"])


def quality_features(text) -> Column:
    """Struct of cheap quality signals: n_chars, n_tokens, mean token
    length, alpha ratio, punctuation ratio, stopword ratio (en), distinct
    token ratio."""
    t = _col(text)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    safe_tok = F.greatest(n_tokens, F.lit(1))
    safe_chr = F.greatest(n_chars, F.lit(1))
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars / safe_tok).alias("mean_token_len"),
        (
            F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / safe_chr
        ).alias("alpha_ratio"),
        (
            F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", "")) / safe_chr
        ).alias("punct_ratio"),
        (stopword_hits(t, "en") / safe_tok).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)) / safe_tok).alias("distinct_ratio"),
    )


def quality_score(text) -> Column:
    """Composite [0,1] quality score from :func:`quality_features` — a
    Gopher-style heuristic gate: reasonable length, alphabetic, not too
    repetitive."""
    q = quality_features(text)
    length_ok = F.when(
        (q["n_tokens"] >= 10) & (q["n_tokens"] <= 100000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    mean_len_ok = F.when(
        (q["mean_token_len"] >= 2.0) & (q["mean_token_len"] <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return F.round(
        (
            0.3 * length_ok
            + 0.2 * mean_len_ok
            + 0.3 * F.least(q["alpha_ratio"] * 1.25, F.lit(1.0))
            + 0.2 * F.least(q["distinct_ratio"] * 2.0, F.lit(1.0))
        ),
        6,
    )


# Rolling-hash constants: kept small so every intermediate fits in int64
# under ANSI mode (acc < MOD = 2^31-1, MULT < 2^21).
_FP_MOD = 2147483647
_FP_MULT = 1000003


def _token_code(tok: Column) -> Column:
    """Deterministic small integer per token, expressible identically in
    ANSI SQL engines (used by the duckdb oracle): combines length, first/
    last character codes."""
    return (
        F.length(tok) * 131
        + F.ascii(tok) * 31
        + F.ascii(F.reverse(tok))
    ) % _FP_MOD


def fingerprint(text) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream —
    a document fingerprint: same token sequence => same value. BIGINT."""
    return F.aggregate(
        tokens(_col(text)),
        F.lit(0).cast("bigint"),
        lambda acc, tok: (acc * _FP_MULT + _token_code(tok)) % _FP_MOD,
    )


def token_stats(df, id_col, text_col) -> "DataFrame":
    """Per-document token distribution stats — the repetition-class
    quality signals LLM curation rules key on (repetitive junk has low
    entropy / a dominant token): ``(id, n_tokens, entropy,
    top_token_frac)``.

    Shannon entropy via the single-pass identity ``H = ln(N) − Σ c·ln c
    / N`` over per-(doc, token) counts, so the whole thing is explode →
    (id, token) hash-agg → id-keyed agg: two map-side-partial shuffles,
    no window, no Python. Empty documents produce no row.
    """
    ex = df.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("token")
    )
    tf = ex.groupBy("__id", "token").agg(F.count("*").alias("c"))
    return (
        tf.groupBy("__id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("s"),
            F.max("c").alias("m"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("n").alias("n_tokens"),
            F.round(F.log("n") - F.col("s") / F.col("n"), 6).alias("entropy"),
            F.round(F.col("m") / F.col("n"), 6).alias("top_token_frac"),
        )
    )


def vocabulary(df, id_col, text_col) -> "DataFrame":
    """Corpus vocabulary: one row per distinct token with ``tf`` (total
    occurrences) and ``dfreq`` (distinct documents containing it) — the
    first step of tokenizer/vocab induction over a training corpus.

    Plan: explode(tokens) → hash-agg keyed by token. ``count(*)`` is
    map-side partial (shuffle volume is bounded by per-partition vocab
    size, not corpus size); ``count(distinct id)`` plans as Spark's
    two-phase distinct-aggregate Expand. Stopword-class tokens make the
    token key Zipf-skewed — AQE's skew handling applies to the exchange,
    and the partial aggregation has already collapsed each partition's
    duplicates before it.
    """
    ex = df.select(F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("token"))
    return ex.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct("__id").alias("dfreq"),
    )


#: PII redaction patterns, written to the common subset of Java regex
#: (Spark) and RE2 (DuckDB/ripgrep): no lookarounds, no backrefs —
#: identical matches on any engine a pipeline might re-run them on.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{7,}\d",
}


def redact_pii(text, kinds: tuple = ("email", "ipv4", "phone")) -> Column:
    """Replace each PII match with ``<KIND>`` (applied in ``kinds``
    order, so earlier patterns shadow later ones — emails before phones,
    or the digits of a phone-like substring inside an email would
    double-redact). Pure ``regexp_replace`` chain: scan-speed, no
    shuffle, no Python."""
    out = _col(text)
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_counts(text, kinds: tuple = ("email", "ipv4", "phone")) -> Column:
    """Struct of per-kind match counts (audit column for a redaction
    pass). ``regexp_count`` is codegen'd JVM regex."""
    return F.struct(
        *[
            F.regexp_count(_col(text), F.lit(PII_PATTERNS[k])).alias(k)
            for k in kinds
        ]
    )


def pii_report(
    df,
    text_col,
    group_col,
    *,
    kinds: tuple = ("email", "ipv4", "phone"),
) -> "DataFrame":
    """Per-``group_col`` PII exposure dashboard — the compliance view a
    redaction pass reports: ``(group, n_docs, docs_affected,
    <kind>_n ...)``. One pass of codegen'd ``regexp_count`` projections
    feeding a group-keyed hash aggregate with map-side partials — no
    extra scan per kind, no Python, no second pass for the affected-doc
    count (it rides the same aggregate as a conditional count)."""
    counts = pii_counts(_col(text_col), kinds)
    proj = df.select(
        F.col(group_col).alias("_g"),
        *[counts[k].alias(f"_{k}") for k in kinds],
    )
    any_hit = None
    for k in kinds:
        c = F.col(f"_{k}") > 0
        any_hit = c if any_hit is None else (any_hit | c)
    return (
        proj.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(any_hit.cast("int")).alias("docs_affected"),
            *[F.sum(f"_{k}").alias(f"{k}_n") for k in kinds],
        )
    )


def chunk_documents(
    df,
    id_col,
    text_col,
    *,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> "DataFrame":
    """Split documents into overlapping token-window chunks — the
    context-window prep step of a training pipeline. Returns one row per
    chunk: ``(id, chunk_id, tok_start, n_tokens, chunk_text)`` with
    1-based ``tok_start`` and stride ``chunk_tokens - overlap``.

    Pure Catalyst: tokens → `sequence` of window starts (bounded by
    ``len - overlap`` so a fully-covered tail never re-emits) →
    `posexplode` → `slice`. Fan-out is rows × ceil(len/stride) with no
    shuffle at all — chunking stays scan-shaped at 100 TB and the
    output inherits the input partitioning. Empty/whitespace-only
    documents produce no chunks.
    """
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    base = df.select(
        F.col(id_col), tokens(text_col).alias("_tk")
    ).filter(F.size("_tk") > 0)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("_tk") - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    sl = F.slice(F.col("tok_start_arr"), F.col("tok_start"), chunk_tokens)
    return (
        base.select(
            id_col,
            F.col("_tk").alias("tok_start_arr"),
            F.posexplode(starts).alias("chunk_id", "tok_start"),
        )
        .select(
            id_col,
            "chunk_id",
            "tok_start",
            F.size(sl).alias("n_tokens"),
            F.array_join(sl, " ").alias("chunk_text"),
        )
    )


def tf_idf(df, id_col, text_col) -> "DataFrame":
    """Per-(document, token) TF-IDF weights: ``(id, token, tf, tfidf)``
    with the smoothed idf ``ln((1+N)/(1+df)) + 1`` (never zero, so rare
    tokens always outrank absent ones).

    Plan: explode → (id, token) hash-agg (map-side partial) → token-keyed
    shuffle join against the document-frequency table (vocab-sized — can
    be millions of tokens at corpus scale, so an equi-join keyed on
    token, not a broadcast) → single-row corpus count joined in via
    cross join (Spark plans a 1-row broadcast nested loop — no shuffle).
    No Python workers anywhere.
    """
    ex = df.select(F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("token"))
    tf = ex.groupBy("__id", "token").agg(F.count("*").alias("tf"))
    dfq = tf.groupBy("token").agg(F.count("*").alias("_dfreq"))
    n = df.agg(F.count("*").alias("_n"))
    return (
        tf.join(dfq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("__id").alias(id_col),
            "token",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((1 + F.col("_n")) / (1 + F.col("_dfreq"))) + 1),
                6,
            ).alias("tfidf"),
        )
    )


def top_tokens(df, id_col, text_col, k: int = 100) -> "DataFrame":
    """Top-``k`` vocabulary rows by total occurrences, deterministically
    tie-broken by token text. orderBy+limit plans as
    TakeOrderedAndProject: per-partition partial top-k, no global sort."""
    return vocabulary(df, id_col, text_col).orderBy(
        F.desc("tf"), F.asc("token")
    ).limit(k)


def unigram_lm_score(
    df,
    id_col,
    text_col,
    *,
    vocab_size: int = 50000,
    round_decimals: int = 6,
) -> "DataFrame":
    """CCNet-style unigram language-model quality score: per-document
    mean token log-probability under a top-``vocab_size`` unigram model
    trained on the corpus itself — gibberish and boilerplate score far
    below fluent in-domain text. Returns ``(id, n_tokens, avg_logp,
    ppl)``; ``ppl`` is ``exp(-avg_logp)`` of the ROUNDED mean so both
    engines of an oracle pair derive it from identical bits. Documents
    with zero tokens produce no row.

    Two passes over the token stream (train + score), like the
    reference CCNet pipeline; production trains once and reuses. Scale
    shape: the vocabulary is a token-keyed hash agg (map-side partials;
    Zipf skew collapsed per-partition before the exchange) truncated
    with a deterministic total order (tf desc, token asc) via
    TakeOrdered — vocab ≪ corpus, so it BROADCASTS to the scoring join;
    the per-doc mean is one more keyed agg. No driver-side loop, no
    collect. OOV tokens get probability ``1/(n_total+1)``.
    """
    ex = df.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("token")
    )
    voc = ex.groupBy("token").agg(F.count("*").alias("tf"))
    topv = voc.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(
        vocab_size
    )
    totals = voc.agg(F.sum("tf").alias("__n_total"))
    scored = (
        ex.join(F.broadcast(topv), "token", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__logp",
            F.when(
                F.col("tf").isNotNull(),
                F.log(F.col("tf") / F.col("__n_total")),
            ).otherwise(F.log(F.lit(1.0) / (F.col("__n_total") + 1))),
        )
    )
    per = scored.groupBy("__id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("__logp"), round_decimals).alias("avg_logp"),
    )
    return per.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "avg_logp",
        F.round(F.exp(-F.col("avg_logp")), 4).alias("ppl"),
    )


def bigram_lm_score(
    df,
    id_col,
    text_col,
    *,
    lam: float = 0.75,
    round_decimals: int = 6,
) -> "DataFrame":
    """Interpolated bigram language-model quality score — the next rung
    above :func:`unigram_lm_score` on the quality ladder: it sees word
    ORDER, so scrambled or word-salad text built from common tokens
    (which unigrams score as fluent) scores low on its improbable
    transitions. Per document: mean ``log P(w2|w1)`` over
    consecutive token pairs with Jelinek-Mercer interpolation
    ``P = lam * c(w1,w2)/c(w1,·) + (1-lam) * tf(w2)/N`` — counts
    trained on the corpus itself, like CCNet's self-trained filtering.
    Returns ``(id, n_bigrams, avg_logp, ppl)``; documents with <2
    tokens produce no row. ``ppl`` derives from the ROUNDED mean so
    engine pairs agree bit-for-bit.

    Scale shape: the bigram stream is a pure projection
    (``zip_with(slice, slice)`` — no shuffle to build); the bigram and
    history tables are token-keyed hash aggs with map-side partials
    (Zipf skew collapses per-partition); all three count tables join
    back KEYED, not broadcast — the distinct-bigram table of a
    web-scale corpus grows near-linearly with corpus size (billions of
    rows at 100 TB), so broadcasting it would OOM every executor. Every
    observed bigram exists in the count tables by construction, so the
    keyed inner joins are semantics-identical to the broadcast form.
    Only the 1-row ``totals`` aggregate is broadcast. One final per-doc
    keyed agg. No driver-side loop, no collect.
    """
    toks = tokens(text_col)
    # ANSI-safe slice length: empty/1-token docs -> 0-length slices ->
    # no bigrams -> the doc produces no row
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, F.lit(1), n_pairs),
        F.slice(toks, F.lit(2), n_pairs),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    ex = df.select(
        F.col(id_col).alias("__id"), F.explode(pairs).alias("bg")
    ).select("__id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    bigrams = ex.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    history = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    unigrams = ex.groupBy("w2").agg(F.count("*").alias("tf2"))
    totals = unigrams.agg(F.sum("tf2").alias("__n_total"))

    # merge hints pin sort-merge joins even where small-SF statistics
    # would auto-broadcast: the count tables are corpus-derived (the
    # distinct-bigram table is billions of rows at web scale), and a
    # stale size estimate with AQE off must never promote them to a
    # broadcast. The 1-row totals broadcast below is the only one.
    scored = (
        ex.join(bigrams.hint("merge"), ["w1", "w2"])
        .join(history.hint("merge"), "w1")
        .join(unigrams.hint("merge"), "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__logp",
            F.log(
                F.lit(float(lam)) * F.col("c12") / F.col("c1")
                + F.lit(1.0 - float(lam)) * F.col("tf2") / F.col("__n_total")
            ),
        )
    )
    per = scored.groupBy("__id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("__logp"), round_decimals).alias("avg_logp"),
    )
    return per.select(
        F.col("__id").alias(id_col),
        "n_bigrams",
        "avg_logp",
        F.round(F.exp(-F.col("avg_logp")), 4).alias("ppl"),
    )


def duplicated_span_fraction(
    df,
    id_col,
    text_col,
    *,
    n: int = 10,
    round_decimals: int = 6,
) -> "DataFrame":
    """Cross-document repeated-span signal (Gopher/RefinedWeb-style
    duplicated n-gram fraction, corpus-level): for each document, the
    fraction of its token n-gram WINDOWS (every position, multiplicity
    kept) whose exact window text also appears in at least one OTHER
    document. Boilerplate shared across pages (headers, license blocks,
    templated paragraphs) lights up; unique prose scores 0. The
    corpus-level cousin of :func:`repetition_stats` (which only sees
    within-document repeats). Returns ``(id, n_windows, dup_frac)``;
    documents with fewer than ``n`` tokens produce no row.

    Scale shape: windows are a pure projection (sequence + slice +
    concat); the shuffle key is ``md5(window)`` — 32 bytes instead of
    the window text, the same digest-not-payload trick as
    ``exact_dup_groups(hash_key=True)``. One hash agg counts distinct
    docs per window (two-phase Expand), one keyed equi-join back, one
    per-doc agg. No broadcast of the window table (it is corpus-sized —
    a broadcast would be the scale mistake).
    """
    toks = tokens(text_col)
    nwin = F.size(toks) - (n - 1)
    # guard: sequence(1, 0) would generate a DESCENDING range, not empty
    windows = F.when(
        nwin >= 1,
        F.transform(
            F.sequence(F.lit(1), nwin),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = df.select(
        F.col(id_col).alias("__id"), F.explode(windows).alias("wh")
    )
    spans = ex.groupBy("wh").agg(
        F.countDistinct("__id").alias("__n_docs")
    )
    per = (
        ex.join(spans, "wh")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_windows"),
            F.round(
                F.avg((F.col("__n_docs") > 1).cast("double")), round_decimals
            ).alias("dup_frac"),
        )
    )
    return per.select(
        F.col("__id").alias(id_col), "n_windows", "dup_frac"
    )


def line_dedup(
    df,
    id_col,
    text_col,
    *,
    min_docs: int = 2,
    sep: str = "\n",
) -> "DataFrame":
    """CCNet-style corpus-level LINE dedup (boilerplate removal): split
    each document into lines, drop every line whose exact text appears
    in ``min_docs`` or more DISTINCT documents (nav bars, cookie
    banners, license footers, templated headers), and reassemble the
    survivors in original order. The line-granular sibling of
    :func:`duplicated_span_fraction` (which only *scores* the overlap)
    and of ``dedup.exact_dup_groups`` (which drops whole documents).
    Returns ``(id, n_lines, n_kept, text_clean)``; a document whose
    every line is boilerplate keeps its row with ``text_clean = ''``.
    ``sep`` must be a plain separator string (it is regex-escaped for
    the split and used verbatim for the re-join).

    Scale shape: lines are a pure projection (split + posexplode); the
    count table groups on ``md5(line)`` — a 32-byte shuffle key instead
    of the line text, the same digest-not-payload trick as
    ``duplicated_span_fraction`` — with a two-phase distinct-doc count.
    The count table joins back KEYED, never broadcast (it is
    corpus-sized). One per-doc agg rebuilds the text (``collect_list``
    bounded by document length), one keyed left join restores
    fully-boilerplate documents. No driver-side loop, no collect.
    """
    import re as _re

    split_pat = _re.escape(sep)
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), split_pat)).alias(
            "__pos", "__line"
        ),
    ).withColumn("__k", F.md5("__line"))
    counts = lines.groupBy("__k").agg(
        F.countDistinct("__id").alias("__docs")
    )
    # merge hints: both the line-count table and the rebuilt-doc agg are
    # corpus-derived; small-SF statistics would auto-broadcast them, the
    # promotion a stale estimate must never make at scale (same policy
    # as bigram_lm_score)
    kept = lines.join(counts.hint("merge"), "__k").filter(
        F.col("__docs") < min_docs
    )
    rebuilt = kept.groupBy("__id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("text_clean"),
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.size(F.split(F.col(text_col), split_pat)).alias("n_lines"),
    )
    return base.join(rebuilt.hint("merge"), "__id", "left").select(
        F.col("__id").alias(id_col),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
    )


def bm25_scores(
    df,
    id_col,
    text_col,
    query_tokens,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    round_decimals: int = 6,
) -> "DataFrame":
    """Okapi BM25 relevance of every document to a bag of query tokens
    (Lucene's non-negative idf variant:
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``): ``(id, score)`` for
    documents matching at least one query token.

    Plan shape: per-doc term frequencies restrict to the query bag
    BEFORE the explode (a higher-order ``filter`` on the token array —
    the exploded stream carries only query-term hits, not the corpus);
    corpus stats ``N``/``avgdl`` are a 1-row aggregate and per-term
    ``df`` a ``len(query)``-row aggregate, both broadcast into the
    scoring join; one final id-keyed agg sums the term contributions.
    At 100 TB: two tiny broadcasts + two keyed hash aggs, shuffle
    volume bounded by documents-with-hits, never corpus tokens.
    """
    qs = [str(q) for q in query_tokens]
    if not qs:
        raise ValueError("query_tokens must be non-empty")
    base = df.select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    ).withColumn("dl", F.size("__toks"))
    stats = base.agg(
        F.count("*").alias("__N"), F.avg("dl").alias("__avgdl")
    )
    hits = base.select(
        "__id",
        "dl",
        F.explode(
            F.filter(F.col("__toks"), lambda t: t.isin(qs))
        ).alias("token"),
    )
    tf = hits.groupBy("__id", "dl", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    j = tf.join(F.broadcast(dfreq), "token").crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__N") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1)) / denom
    return (
        j.groupBy("__id")
        .agg(F.round(F.sum(contrib), round_decimals).alias("score"))
        .select(F.col("__id").alias(id_col), "score")
    )


def decontaminate(
    df,
    id_col: str,
    text_col: str,
    benchmark,
    bench_text_col: str | None = None,
    *,
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> "DataFrame":
    """Benchmark decontamination: per-document count of distinct word
    ``n``-grams that also appear in ``benchmark`` (the eval set a
    training corpus must not leak). Returns ``(id_col,
    contaminated_ngrams)`` — only documents with at least one hit; the
    usual next step is :func:`decontaminate_filter`.

    100 TB plan shape: eval benchmarks are tiny (MBs) next to a training
    corpus, so the distinct benchmark-gram set is **broadcast** — the
    exploded training grams stream through a broadcast-hash semi-join
    with no shuffle; the only exchange is the per-doc count's hash
    aggregation, and partial (map-side) aggregation collapses most of it
    because a document's grams are co-located within its scan partition.
    Grams are distinct per side (``word_ngrams`` dedups), so the count
    is "distinct contaminated grams", stable under doc repetition.

    Reference scope note: the reference engine has no pipeline
    operators — this belongs to the LLM-pipeline extension suite.
    """
    bench_text_col = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(bench_text_col, n)).alias("_gram")
        ).distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("_gram")
    )
    return (
        doc_grams.join(bench_grams, "_gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("contaminated_ngrams"))
    )


def decontaminate_filter(
    df,
    id_col: str,
    text_col: str,
    benchmark,
    bench_text_col: str | None = None,
    *,
    n: int = 8,
    max_hits: int = 0,
) -> "DataFrame":
    """Drop documents with more than ``max_hits`` benchmark n-gram
    overlaps (default: any overlap). Anti-join on the id keeps the
    document payload out of the decontamination shuffle — only
    ``(id, gram)`` pairs move."""
    hits = decontaminate(
        df, id_col, text_col, benchmark, bench_text_col, n=n
    ).filter(F.col("contaminated_ngrams") > max_hits)
    return df.join(hits.select(id_col), id_col, "left_anti")


#: Gopher's "required stopword" list (Rae et al. 2021, A1.1): a document
#: must contain at least two of these to look like running English prose.
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    text,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
) -> Column:
    """Gopher rule-based quality gate (Rae et al. 2021, Appendix A1.1)
    as a struct of per-rule booleans plus the conjunction ``keep``:

    - ``word_count_ok``: whitespace word count in [min_words, max_words]
    - ``mean_word_len_ok``: mean word length in [3, 10]
    - ``symbol_ratio_ok``: (# of ``#`` chars + ``...``/``…`` runs) /
      words <= 0.1
    - ``bullet_ok``: <= 90% of lines start with a bullet marker
    - ``ellipsis_ok``: <= 30% of lines end with an ellipsis
    - ``alpha_word_ok``: >= 80% of words contain an alphabetic character
    - ``stopword_ok``: >= 2 distinct required stopwords present
    - ``dup_line_ok`` / ``dup_char_ok``: line-repetition gates
      (:func:`repetition_stats` thresholds from the same paper)

    Pure Column expressions — single pass at scan speed, no shuffle, no
    Python. Filter-pushdown-friendly: ``df.filter(flags['keep'])``
    prunes before any downstream shuffle. Thresholds are keyword
    arguments so corpus-specific retuning (the published values target
    web scrapes) needs no code change."""
    t = _col(text)
    toks = tokens(t)
    ls = lines(t)
    nw = F.size(toks)
    nl = F.size(ls)
    safe_w = F.greatest(nw, F.lit(1))
    safe_l = F.greatest(nl, F.lit(1))
    mean_len = (
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        / safe_w
    )
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), F.lit(0)))
    n_bullet = F.size(F.filter(ls, lambda x: x.rlike(r"^([•\-\*•]|\d+[.)])\s")))
    n_ell_end = F.size(F.filter(ls, lambda x: x.rlike(r"(\.\.\.|…)$")))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, lambda x: F.lower(x))),
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
        )
    )
    rep = repetition_stats(t)
    word_count_ok = (nw >= min_words) & (nw <= max_words)
    mean_word_len_ok = (mean_len >= min_mean_word_len) & (
        mean_len <= max_mean_word_len
    )
    symbol_ratio_ok = ((n_hash + n_ellipsis) / safe_w) <= max_symbol_ratio
    bullet_ok = (n_bullet / safe_l) <= max_bullet_line_frac
    ellipsis_ok = (n_ell_end / safe_l) <= max_ellipsis_line_frac
    alpha_word_ok = (n_alpha / safe_w) >= min_alpha_word_frac
    stopword_ok = n_stop >= min_required_stopwords
    dup_line_ok = rep["dup_line_frac"] <= max_dup_line_frac
    dup_char_ok = rep["dup_line_char_frac"] <= max_dup_line_char_frac
    return F.struct(
        word_count_ok.alias("word_count_ok"),
        mean_word_len_ok.alias("mean_word_len_ok"),
        symbol_ratio_ok.alias("symbol_ratio_ok"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        alpha_word_ok.alias("alpha_word_ok"),
        stopword_ok.alias("stopword_ok"),
        dup_line_ok.alias("dup_line_ok"),
        dup_char_ok.alias("dup_char_ok"),
        (
            word_count_ok
            & mean_word_len_ok
            & symbol_ratio_ok
            & bullet_ok
            & ellipsis_ok
            & alpha_word_ok
            & stopword_ok
            & dup_line_ok
            & dup_char_ok
        ).alias("keep"),
    )


def c4_clean(
    text,
    *,
    min_line_words: int = 5,
    min_kept_lines: int = 3,
    drop_tokens: tuple = ("javascript", "lorem ipsum"),
    drop_brace: bool = True,
) -> Column:
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2) as a
    struct ``(cleaned_text, n_lines_kept, n_lines_dropped, doc_dropped)``:

    - keep only lines that end in terminal punctuation (``. ! ? "``)
    - keep only lines with >= ``min_line_words`` words
    - drop lines containing any of ``drop_tokens`` (case-insensitive;
      C4 drops "javascript" warning lines)
    - the whole document is dropped (``cleaned_text`` NULL,
      ``doc_dropped`` true) when fewer than ``min_kept_lines`` lines
      survive, when the text contains ``{`` (code page heuristic, gated
      by ``drop_brace``), or when it contains "lorem ipsum"
      (case-insensitive placeholder-page heuristic)

    Single-pass Column expressions over the line array (filter +
    array_join) — scan speed, no shuffle, no Python; at 100 TB this is
    a free rider on whatever scan the pipeline already does. Sentence
    segmentation is line-based like the original (C4 treats newline-
    delimited lines as sentence candidates)."""
    t = _col(text)
    ls = lines(t)
    lowered = F.lower(t)

    def _line_ok(x: Column) -> Column:
        ok = x.rlike('[.!?"]$') & (
            F.size(F.filter(F.split(x, r"\s+"), lambda w: w != ""))
            >= min_line_words
        )
        for tok in drop_tokens:
            ok = ok & ~F.lower(x).contains(tok)
        return ok

    kept = F.filter(ls, _line_ok)
    n_kept = F.size(kept)
    doc_dropped = n_kept < min_kept_lines
    if drop_brace:
        doc_dropped = doc_dropped | t.contains("{")
    doc_dropped = doc_dropped | lowered.contains("lorem ipsum")
    return F.struct(
        F.when(~doc_dropped, F.array_join(kept, "\n")).alias("cleaned_text"),
        n_kept.alias("n_lines_kept"),
        (F.size(ls) - n_kept).alias("n_lines_dropped"),
        doc_dropped.alias("doc_dropped"),
    )


#: GPT-2-style pre-tokenizer pattern, restricted to the regex subset
#: Java regex and RE2 execute identically (no lookarounds, no unicode
#: property classes): contractions, space-prefixed letter runs, digit
#: runs, punctuation runs, whitespace runs. This is the VOCABULARY-FREE
#: segmentation BPE runs on top of — counting its matches gives the
#: deterministic budget proxy pipelines use before a real tokenizer is
#: in the loop (a trained BPE only splits these segments further, so
#: the count lower-bounds the true token count at roughly 1 segment ≈
#: 1.3 BPE tokens for English web text).
BPE_PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def pretoken_count(text) -> Column:
    """Count of BPE pre-tokenizer segments (:data:`BPE_PRETOKEN_PATTERN`
    matches). Pure ``regexp_extract_all`` Column expression — scan
    speed, no shuffle, no Python; the whitespace :func:`token_count`
    and this bracket a corpus's token budget from both sides."""
    return F.size(
        F.regexp_extract_all(_col(text), F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))
    )


#: Accented → ASCII fold table for :func:`normalize_text` — an explicit
#: Latin-1/Latin-Extended mapping (both engines apply it via translate,
#: so the fold is byte-identical everywhere; a full ICU/NFKC pass needs
#: a library neither the JVM expression tier nor the SQL oracles share).
ACCENT_FOLD_SRC = "àáâãäåèéêëìíîïòóôõöùúûüýÿñçÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÝÑÇšžŠŽ"
ACCENT_FOLD_DST = "aaaaaaeeeeiiiiooooouuuuyyncAAAAAAEEEEIIIIOOOOOUUUUYNCszSZ"


def normalize_text(
    text,
    *,
    casefold: bool = True,
    strip_accents: bool = True,
    strip_punct: bool = True,
    collapse_ws: bool = True,
) -> Column:
    """CCNet-style text normalization for dedup keys: lowercase, fold
    accents (explicit :data:`ACCENT_FOLD_SRC` translate table), strip
    punctuation/symbols (anything outside ``[a-z0-9\\s]`` after the
    fold), collapse whitespace runs to single spaces and trim. Two
    documents differing only in case, accents, punctuation, or spacing
    normalize to the same string — hash THIS, not the raw text, before
    exact dedup (CCNet dedups on normalized-paragraph hashes for
    exactly this reason).

    Pure Column expressions (lower/translate/regexp_replace/trim) —
    scan speed, no shuffle, no Python."""
    t = _col(text)
    # fold BEFORE casefolding so uppercase accents map through their
    # uppercase ASCII targets (order mirrored in the SQL oracles)
    if strip_accents:
        t = F.translate(t, ACCENT_FOLD_SRC, ACCENT_FOLD_DST)
    if casefold:
        t = F.lower(t)
    if strip_punct:
        if strip_accents:
            keep = r"[^a-z0-9\s]" if casefold else r"[^A-Za-z0-9\s]"
        else:
            # the caller opted OUT of accent folding: an ASCII-only
            # class would strip every accented letter as "punctuation"
            # ('café' -> 'caf '), colliding genuinely different words.
            # \p{L}/\p{N} keep all letters/digits (portable: Java regex
            # and RE2 both support the unicode classes).
            keep = r"[^\p{L}\p{N}\s]"
        t = F.regexp_replace(t, keep, " ")
    if collapse_ws:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def normalized_dedup_key(text) -> Column:
    """md5 of the normalized text — the 32-byte exact-dedup shuffle key
    (digest, not payload: the exchange carries 32 bytes/row however
    large the document is)."""
    return F.md5(normalize_text(text))


def top_ngram_char_fraction(text, n: int = 2) -> Column:
    """Gopher's within-document n-gram repetition signal (Rae et al.
    2021 A1.1): the fraction of (non-space token) characters covered by
    occurrences of the single most frequent word n-gram — boilerplate
    and template spam repeat short phrases and score high; clean prose
    scores near n/word_count. Returns NULL for NULL text, 0.0 when the
    document has fewer than ``n`` tokens, clamped to [0, 1] (overlapping
    occurrences would otherwise overcount coverage past 1.0).

    Most-frequent is (count, gram) lexicographic max, so ties break on
    the later gram deterministically on every engine. Pure Column
    expressions — one array_sort + one linear fold per document
    (O(m log m)), embarrassingly parallel, no shuffle."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = tokens(text)
    m = F.size(toks)
    grams = F.when(
        m >= n,
        F.transform(
            F.sequence(F.lit(0), m - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # sorted run-length fold: O(m log m) instead of the O(m²)
    # count-each-distinct-gram scan — equal runs are adjacent after
    # array_sort, so one aggregate pass tracks (current run, best)
    sorted_g = F.array_sort(grams)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("cnt"),
        F.lit("").alias("gram"),
    )

    def _step(acc, x):
        run_new = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = (run_new > acc["cnt"]) | (
            (run_new == acc["cnt"]) & (x >= acc["gram"])
        )
        return F.struct(
            x.alias("prev"),
            run_new.alias("run"),
            F.when(better, run_new).otherwise(acc["cnt"]).alias("cnt"),
            F.when(better, x).otherwise(acc["gram"]).alias("gram"),
        )

    best = F.aggregate(sorted_g, zero, _step)
    total_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    covered = best["cnt"] * (
        F.length(best["gram"]) - F.lit(int(n) - 1)
    )
    # least(1.0): overlapping occurrences ("a a a a a", n=2) overcount
    # coverage past the document's characters; a "fraction" above 1
    # breaks any threshold gate comparing to true coverage
    return (
        F.when(_col(text).isNull(), F.lit(None).cast("double"))
        .when(m < n, F.lit(0.0))
        .otherwise(
            F.least(
                F.lit(1.0),
                F.round(covered / F.greatest(total_chars, F.lit(1)), 6),
            )
        )
    )


#: Default weights for :func:`quality_classifier_score` over the feature
#: vector (ln(1+n_tokens), mean_token_len, alpha_ratio, punct_ratio,
#: stopword_ratio, distinct_ratio) — hand-set to prefer long, alphabetic,
#: stopword-bearing, lexically diverse prose. A production pipeline
#: replaces these with trained logistic-regression coefficients; the
#: operator shape (linear scorer at scan speed) is the point.
QUALITY_CLASSIFIER_WEIGHTS = (0.4, 0.1, 2.0, -1.0, 1.5, 1.0)


def quality_classifier_score(
    text,
    *,
    weights: tuple = QUALITY_CLASSIFIER_WEIGHTS,
    bias: float = -3.0,
) -> Column:
    """fastText-style linear quality classifier: sigmoid(w · x + b)
    over the :func:`quality_features` vector — the "model-based quality
    scoring" rung above the rule gates (think a logistic regression
    trained on wiki-vs-crawl labels; plug its coefficients in via
    ``weights``/``bias``). Pure Column expressions, scan speed, no
    Python, no shuffle; scores in (0, 1)."""
    if len(weights) != 6:
        raise ValueError("weights must have 6 entries")
    q = quality_features(text)
    x = [
        F.log1p(q["n_tokens"].cast("double")),
        q["mean_token_len"],
        q["alpha_ratio"],
        q["punct_ratio"],
        q["stopword_ratio"],
        q["distinct_ratio"],
    ]
    z = F.lit(float(bias))
    for w, f in zip(weights, x):
        z = z + F.lit(float(w)) * f
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def corpus_quality_report(df, id_col: str, text_col: str, group_col: str) -> "DataFrame":
    """Per-group corpus quality dashboard: one row per ``group_col``
    value with doc count, token totals/means, mean quality-feature
    values, language mix entropy, and the share of docs passing the
    default Gopher conjunction — the at-a-glance view a curation run
    starts and ends with (compare before/after).

    ONE aggregation pass: every metric is a map-side-partial mean/sum
    over scan-speed Column expressions, so the shuffle carries one row
    per group however large the corpus. (Language entropy uses the
    4-way stoplist ID — an exact distribution, not a sample.)"""
    q = quality_features(_col(text_col))
    g = gopher_quality_flags(_col(text_col))
    lid = lang_id(_col(text_col))
    base = df.select(
        F.col(group_col).alias("group"),
        F.col(id_col),
        q["n_tokens"].alias("_nt"),
        q["n_chars"].alias("_nc"),
        q["mean_token_len"].alias("_mtl"),
        q["alpha_ratio"].alias("_ar"),
        q["distinct_ratio"].alias("_dr"),
        g["keep"].cast("int").alias("_keep"),
        lid.alias("_lang"),
    )
    per_lang = base.groupBy("group", "_lang").agg(F.count("*").alias("_n"))
    tot = base.groupBy("group").agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.round(F.avg("_nt"), 6).alias("mean_tokens"),
        F.round(F.avg("_mtl"), 6).alias("mean_token_len"),
        F.round(F.avg("_ar"), 6).alias("mean_alpha_ratio"),
        F.round(F.avg("_dr"), 6).alias("mean_distinct_ratio"),
        F.round(F.avg("_keep"), 6).alias("gopher_keep_rate"),
    )
    # entropy needs the per-group total inside the agg: two-level agg
    # instead of a window (window-over-agg would add an exchange)
    lang_tot = per_lang.groupBy("group").agg(F.sum("_n").alias("_tot"))
    ent = (
        per_lang.join(lang_tot, "group")
        .withColumn("_p", F.col("_n") / F.col("_tot"))
        .groupBy("group")
        .agg(
            # + 0.0 folds IEEE -0.0 (single-language groups) to 0.0
            F.round(
                -F.sum(F.col("_p") * F.log(F.col("_p"))) + F.lit(0.0), 6
            ).alias("lang_entropy")
        )
    )
    return tot.join(ent, "group")


def top_ngram_char_fraction_agg(
    df, id_col: str, text_col: str, *, n: int = 2, out_col: str = "top_ngram_frac"
) -> "DataFrame":
    """DataFrame-level twin of :func:`top_ngram_char_fraction` —
    identical results (same (count, gram) tie-break), different cost
    model: explode the duplicate-keeping n-gram windows → ``(id,
    gram)`` hash count → per-doc ``max(struct(cnt, gram))``.

    Honest measurement (sf0.1, ~100-word docs): the Column fold WINS
    (7.3 s vs 11.2 s — this shape pays the gram projection twice plus
    two exchanges). Reach for it when individual documents are huge:
    the per-row fold runs serially per document (one 10M-token doc =
    one 10M-step task), while the exploded shape distributes a single
    document's windows across the cluster and AQE splits skewed docs.
    Returns the input's id column + ``out_col``."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = tokens(F.col(text_col))
    m = F.size(toks)
    base = df.select(
        F.col(id_col),
        m.alias("_m"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("_chars"),
        F.when(
            m >= n,
            F.transform(
                F.sequence(F.lit(0), m - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("_grams"),
    )
    ex = base.select(F.col(id_col), F.explode("_grams").alias("_gram"))
    counts = ex.groupBy(id_col, "_gram").agg(F.count("*").alias("_cnt"))
    best = counts.groupBy(id_col).agg(
        F.max(F.struct(F.col("_cnt"), F.col("_gram"))).alias("_best")
    )
    covered = F.col("_best._cnt") * (
        F.length(F.col("_best._gram")) - F.lit(int(n) - 1)
    )
    return (
        base.join(best, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_m").isNull(), F.lit(None).cast("double"))
            .when(F.col("_m") < n, F.lit(0.0))
            .otherwise(
                F.least(
                    F.lit(1.0),
                    F.round(
                        covered / F.greatest(F.col("_chars"), F.lit(1)), 6
                    ),
                )
            )
            .alias(out_col),
        )
    )


def domain_suffixes(host) -> Column:
    """All registrable suffixes of a host name, most-specific first:
    ``a.b.c → [a.b.c, b.c, c]``. Turns parent-domain blocklist matching
    into an EQUI-join (explode the suffixes, join the blocklist key) —
    the alternative, ``endswith`` against every blocklist row, is a
    broadcast nested-loop whose cost multiplies by the blocklist size."""
    h = _col(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def filter_blocked_domains(
    df, id_col: str, text_col: str, blocklist, domain_col: str = "domain"
) -> "DataFrame":
    """Drop documents containing a URL whose host — or any parent
    domain of it — appears in ``blocklist`` (a DataFrame with
    ``domain_col``): the standard web-curation blocklist pass (spam,
    adult, SEO-farm domains).

    Plan shape: extract+explode hosts (scan-side), explode each host's
    suffix chain (:func:`domain_suffixes`, bounded by label count),
    broadcast the blocklist into an equi-join on the suffix, and
    anti-join the matched ids back. Document payloads never enter the
    matching joins — only (id, suffix) pairs."""
    hosts = df.select(
        F.col(id_col), F.explode(url_domains(F.col(text_col))).alias("_host")
    )
    sufs = hosts.select(
        F.col(id_col), F.explode(domain_suffixes(F.col("_host"))).alias("_suf")
    )
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("_suf")).distinct()
    )
    blocked = sufs.join(bl, "_suf").select(id_col).distinct()
    return df.join(blocked, id_col, "left_anti")


def sentences(text) -> Column:
    """Sentence segmentation (array<string>): split on runs of ``.!?``
    followed by whitespace, space-trimmed (both engines' trim
    strips spaces only, not \n/\t — fuzz-pinned), empties dropped — the line-free
    twin of :func:`lines` for prose that arrives as one physical line
    (C4 treats sentence candidates this way; a real system would use a
    trained segmenter, the operator shape is identical). Terminal
    punctuation stays attached to its sentence. Implemented as
    ``regexp_extract_all('[^.!?]+[.!?]*')`` — the lookbehind-free form
    both Java regex and RE2 execute identically (a split that keeps
    delimiters needs lookbehind, which RE2 lacks). Pure Column
    expressions, scan speed."""
    t = _col(text)
    return F.filter(
        F.transform(
            F.regexp_extract_all(t, F.lit(r"[^.!?]+[.!?]*"), F.lit(0)),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )


def sentence_count(text) -> Column:
    """Number of sentences (:func:`sentences` length; NULL for NULL)."""
    return F.size(sentences(text))
