"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (the 13 JSON functions + operator-sugar/rewrite paths +
union type) plus the extended pipeline operators (dedup, similarity,
text analysis, multimodal); ``oracle_sql()`` holds the DuckDB-equivalent
ANSI SQL for every SQL-expressible query. Non-SQL-expressible ops
(LSH/minhash/simhash candidate generation — hash-function-dependent)
omit the oracle and get the driver's rows-only check.

Column names are aliased identically on both sides (the driver compares
value-hashes after sorting columns by name).
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import datafusion_functions_json_spark as jsonf  # noqa: E402
from datafusion_functions_json_spark.operators import (  # noqa: E402
    bpe,
    cdc,
    dedup,
    graph,
    joins,
    layout,
    multimodal,
    pipeline,
    rank,
    similarity,
    sketch,
    stats,
    text,
)
from datafusion_functions_json_spark import oracle_twin  # noqa: E402
from datafusion_functions_json_spark.sources import load_table  # noqa: E402

# ---------------------------------------------------------------------------
# helpers


def _events(spark, sf_dir):
    # spread: the shared single-row-group files would otherwise serialize
    # the per-row JSON work into one task (no-op on multi-split inputs)
    return load_table(spark, sf_dir, "events", spread=True)


def _lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem", spread=True)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents", spread=True)


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# A nested JSON document synthesized per lineitem row — exercises deep
# paths, arrays, and present-null against the oracle, since the shared
# events.props JSON is flat. Spark and DuckDB build the identical string.
def _nested_json_col():
    return F.concat(
        F.lit('{"a": {"b": ['),
        (F.col("l_orderkey") % 10).cast("string"),
        F.lit(', {"c": "'),
        F.col("l_returnflag"),
        F.lit('"}]}, "d": null}'),
    )


_NESTED_SQL = (
    "'{\"a\": {\"b\": [' || (l_orderkey % 10) || "
    "', {\"c\": \"' || l_returnflag || '\"}]}, \"d\": null}'"
)

_STOP_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in ws) + "]"
    for lang, ws in text.STOPWORDS.items()
}

_TOKENS_SQL = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '')"


_CURATION_V2_SQL = (
    # lang cascade + tuned Gopher conjunction + classifier
    # feature mirror + normalized-dedup group-min, composed from
    # the same fragments the standalone oracles use
    "with f as (select doc_id, text, "
    f"{_TOKENS_SQL} as toks, "
    "list_filter(list_transform(string_split(text, chr(10)), "
    "x -> trim(x)), x -> x <> '') as ls from documents), "
    "d as (select doc_id, text, len(toks) as nt, "
    "round(1.0 / (1.0 + exp(-(-3.0 "
    "+ 0.4 * ln(1 + len(toks)) "
    "+ 0.1 * (length(text) / greatest(len(toks), 1)) "
    "+ 2.0 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) "
    "/ greatest(length(text), 1)) "
    "- 1.0 * (length(regexp_replace(text, "
    "'[^.,;:!?''\"()\\[\\]{}-]', '', 'g')) "
    "/ greatest(length(text), 1)) "
    "+ 1.5 * (len(list_intersect(list_distinct(list_filter("
    "regexp_split_to_array(trim(lower(text)), '\\s+'), "
    f"t -> t != '')), {_STOP_SQL['en']})) "
    "/ greatest(len(toks), 1)) "
    "+ 1.0 * (len(list_distinct(toks)) / greatest(len(toks), 1))"
    "))), 6) as clf, "
    "case when "
    "(len(toks) >= 20 and len(toks) <= 100000) and "
    "(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) "
    "/ greatest(len(toks), 1) between 3.0 and 10.0) and "
    "((length(text) - length(replace(text, '#', '')) "
    "+ len(regexp_extract_all(text, '\\.\\.\\.|…'))) "
    "/ greatest(len(toks), 1) <= 0.1) and "
    "(len(list_filter(ls, x -> regexp_matches(x, "
    "'^([•\\-\\*•]|\\d+[.)])\\s'))) / greatest(len(ls), 1) <= 0.9) "
    "and (len(list_filter(ls, x -> regexp_matches(x, "
    "'(\\.\\.\\.|…)$'))) / greatest(len(ls), 1) <= 0.3) and "
    "(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) "
    "/ greatest(len(toks), 1) >= 0.8) and "
    "(len(list_intersect(list_distinct(list_transform(toks, "
    "x -> lower(x))), ['the','be','to','of','and','that','have',"
    "'with'])) >= 1) and "
    "(round((len(ls) - len(list_distinct(ls))) "
    "/ greatest(len(ls), 1), 6) <= 0.3) and "
    "(round((coalesce(list_sum(list_transform(ls, "
    "x -> length(x))), 0) - coalesce(list_sum(list_transform("
    "list_distinct(ls), x -> length(x))), 0)) / greatest("
    "coalesce(list_sum(list_transform(ls, x -> length(x))), 0), "
    "1), 6) <= 0.2) then 1 else 0 end as keep, "
    + "".join(
        f"len(list_intersect(list_distinct(list_filter("
        "regexp_split_to_array(trim(lower(text)), '\\s+'), "
        f"t -> t != '')), {_STOP_SQL[lang]})) as s_{lang}, "
        for lang in sorted(text.STOPWORDS)
    )
    + "1 as _one from f), "
    "dl as (select *, case "
    "when s_de = 0 and s_en = 0 and s_es = 0 and s_fr = 0 "
    "then 'und' "
    "when s_fr >= s_es and s_fr >= s_en and s_fr >= s_de "
    "then 'fr' "
    "when s_es >= s_en and s_es >= s_de then 'es' "
    "when s_en >= s_de then 'en' else 'de' end as lang from d), "
    "k as (select * from dl where nt >= 10 and lang = 'en' "
    "and keep = 1), "
    "n as (select doc_id, lang, nt, clf, "
    "md5(trim(regexp_replace(regexp_replace(lower(translate(text, "
    "'àáâãäåèéêëìíîïòóôõöùúûüýÿñçÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÝÑÇšžŠŽ', "
    "'aaaaaaeeeeiiiiooooouuuuyyncAAAAAAEEEEIIIIOOOOOUUUUYNCszSZ')), "
    "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) as nk from k), "
    "m as (select nk, min(doc_id) as kid from n group by nk) "
    "select n.doc_id, n.lang, n.nt::int as n_tokens, "
    "n.clf as clf_score from n join m on n.nk = m.nk "
    "and n.doc_id = m.kid"
)




# ---------------------------------------------------------------------------
# queries


def _q_json_get_int(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", jsonf.json_get_int("props", "k").alias("k")
    )


def _q_json_get_float(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", jsonf.json_get_float("props", "k").alias("kf")
    )


def _q_json_get_str(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", jsonf.json_get_str("props", "k").alias("ks")
    )


def _q_json_get_bool(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", jsonf.json_get_bool("props", "k").alias("kb")
    )


def _q_json_as_text(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", jsonf.json_as_text("props", "k").alias("kt")
    )


def _q_json_get_json(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", jsonf.json_get_json("props", "k").alias("kraw")
    )


def _q_json_contains(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id",
        jsonf.json_contains("props", "k").alias("has_k"),
        jsonf.json_contains("props", "missing").alias("has_missing"),
    )


def _q_json_length(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", jsonf.json_length("props").alias("n_keys")
    )


def _q_json_object_keys(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id",
        F.concat_ws(",", jsonf.json_object_keys("props")).alias("keys_csv"),
    )


def _q_json_get_int_variant(spark, sf_dir):
    # tier comparison: Spark 4 VariantType native path, same semantics on
    # data inside the native envelope (flat int values here)
    from datafusion_functions_json_spark.functions import native

    return _events(spark, sf_dir).select(
        "event_id", native.json_get_int_variant("props", "k").alias("k")
    )


def _q_json_as_text_native(spark, sf_dir):
    from datafusion_functions_json_spark.functions import native

    return _events(spark, sf_dir).select(
        "event_id", native.json_as_text_native("props", "k").alias("kt")
    )


def _q_json_json_variant(spark, sf_dir):
    # variant tier for json_get_json/json_length at a path: parse once
    # into VariantType, re-serialize with to_json — all JVM, zero Python
    # hops. Envelope: minified re-serialization matches DuckDB's
    # json_extract rendering on int/string/container values (no floats,
    # no raw-slice fidelity); pinned vs the exact tier in test_native.py
    from datafusion_functions_json_spark.functions import native

    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        native.json_get_json_variant("j", "a").alias("a_json"),
        native.json_get_json_variant("j", "a", "b").alias("b_json"),
        native.json_length_variant("j", "a").alias("a_len"),
        native.json_length_variant("j", "a", "b").alias("b_len"),
    )


def _q_get_array_variant(spark, sf_dir):
    # variant tier for json_get_array/json_object_keys at a path —
    # element texts CSV-joined (the driver's canonicalizer cannot sort
    # list cells, same workaround as get_array_csv / embed_quantize)
    from datafusion_functions_json_spark.functions import native

    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(
            native.json_get_array_variant("j", "a", "b"), "|"
        ).alias("b_elems"),
        F.array_join(
            native.json_object_keys_variant("j", "a"), "|"
        ).alias("a_keys"),
    )


def _q_union_variant(spark, sf_dir):
    # round-6: the union-typed `->` itself on the variant tier —
    # json_get_variant builds the SAME tagged-union struct as the exact
    # tier from pure JVM expressions (schema_of_variant dispatch,
    # lambda-bound parse). Emits type_ids and arms across all the
    # nested fixture's kinds; present-null $.d must be a whole-struct
    # NULL (type_id reads back SQL NULL).
    from datafusion_functions_json_spark.functions import native

    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    ua = native.json_get_variant("j", "a")
    ub0 = native.json_get_variant("j", "a", "b", 0)
    uflag = native.json_get_variant("j", "a", "b", 1, "c")
    ud = native.json_get_variant("j", "d")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ua.getField("type_id").cast("int").alias("a_tid"),
        ua.getField("object").alias("a_obj"),
        ub0.getField("type_id").cast("int").alias("b0_tid"),
        ub0.getField("int").alias("b0_int"),
        uflag.getField("str").alias("flag"),
        ud.getField("type_id").cast("int").alias("d_tid"),
    )


def _q_union_roundtrip_variant(spark, sf_dir):
    # the union ROUNDTRIP fully zero-hop: json_get_variant builds the
    # union struct from JVM variant expressions, json_union_to_text
    # _native formats it back with pure Column expressions — no
    # ArrowEvalPython anywhere in the plan. NOT a throughput win: the
    # per-row expression tree (2 parses + schema_of_variant + typed
    # gets per struct) measured 2.3 s vs the exact fused tier's 1.1 s
    # at sf0.1 — the value is DEPLOYMENT reach (no Python workers, no
    # Arrow memory) and tier parity, not speed; the fused exact tier
    # stays the throughput recommendation for union workloads.
    from datafusion_functions_json_spark.functions import native

    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    ua = native.json_get_variant("j", "a")
    ud = native.json_get_variant("j", "d")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        native.json_union_to_text_native(ua).alias("a_text"),
        jsonf.json_is_null(ud).alias("d_is_null"),
        jsonf.json_is_null(ua).alias("a_is_null"),
    )


def _q_json_contains_variant(spark, sf_dir):
    # round-6 variant-tier widening: `?` as pure-JVM IS NOT NULL over
    # try_variant_get — present-null ($.d) must be TRUE, missing FALSE,
    # exactly the reference's json_contains semantics
    from datafusion_functions_json_spark.functions import native

    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        native.json_contains_variant("j", "d").alias("has_d"),
        native.json_contains_variant("j", "a", "x").alias("has_ax"),
        native.json_contains_variant("j", "a", "b", 1).alias("has_ab1"),
        native.json_contains_variant("j", "a", "b", 2).alias("has_ab2"),
    )


def _q_json_as_text_variant(spark, sf_dir):
    # round-6 variant-tier widening: `->>` via the variant string cast
    # (scalars bare, containers minified JSON, JSON null -> SQL NULL)
    from datafusion_functions_json_spark.functions import native

    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        native.json_as_text_variant("j", "a", "b", 1, "c").alias("flag"),
        native.json_as_text_variant("j", "a", "b", 0).alias("b0"),
        native.json_as_text_variant("j", "d").alias("d_txt"),
        native.json_as_text_variant("j", "a").alias("a_txt"),
    )


def _q_json_agg(spark, sf_dir):
    # flagship composition: JSON predicate + extraction + aggregation.
    # Written as conditional aggregation rather than filter-then-agg:
    # a Python-UDF *filter* gets pushed below the spread exchange and
    # runs serially on the single-file scan partition, and it splits the
    # two kernels into separate ArrowEvalPython nodes. With no filter,
    # both kernels ride ONE ArrowEvalPython above the spread (32-way
    # parallel, one Arrow hop); the post-agg n>0 filter reproduces
    # filter-first group semantics over ~5 groups for free.
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            "event_type",
            jsonf.json_contains("props", "k").alias("c"),
            jsonf.json_get_int("props", "k").alias("v"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("c"), F.col("v"))).alias("sum_k"),
            F.count(F.when(F.col("c"), F.lit(1))).alias("n"),
        )
        .filter(F.col("n") > 0)
    )


def _q_json_agg_variant(spark, sf_dir):
    # the flagship composition on the zero-hop VARIANT tier — the scale
    # path when raw-slice union fidelity isn't needed: same conditional
    # aggregation as _q_json_agg but json_contains_variant /
    # json_get_int_variant are pure Catalyst expressions, so the whole
    # plan is one scan + one partial-agg exchange with NO Python hop
    # (the sf1 spot-bench showed the exact tier's json_agg ratio is
    # Arrow-hop-bound; this twin is what a 100 TB deployment runs).
    from datafusion_functions_json_spark.functions import native

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            native.json_contains_variant("props", "k").alias("c"),
            native.json_get_int_variant("props", "k").alias("v"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("c"), F.col("v"))).alias("sum_k"),
            F.count(F.when(F.col("c"), F.lit(1))).alias("n"),
        )
        .filter(F.col("n") > 0)
    )


def _q_nested_get_int(spark, sf_dir):
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        jsonf.json_get_int("j", "a", "b", 0).alias("b0"),
    )


def _q_nested_get_str(spark, sf_dir):
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        jsonf.json_get_str("j", "a", "b", 1, "c").alias("flag"),
    )


def _q_nested_contains(spark, sf_dir):
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        jsonf.json_contains("j", "d").alias("has_d"),
        jsonf.json_contains("j", "a", "x").alias("has_ax"),
        jsonf.json_contains("j", "a", "b", 1).alias("has_ab1"),
        jsonf.json_contains("j", "a", "b", 2).alias("has_ab2"),
    )


def _q_nested_length_keys(spark, sf_dir):
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        jsonf.json_length("j", "a", "b").alias("len_ab"),
        F.concat_ws(",", jsonf.json_object_keys("j")).alias("keys_csv"),
    )


def _q_nested_as_text_null(spark, sf_dir):
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        jsonf.json_as_text("j", "d").alias("d_text"),
        jsonf.json_get_json("j", "d").alias("d_raw"),
    )


def _q_get_array_csv(spark, sf_dir):
    li = _lineitem(spark, sf_dir).withColumn(
        "j2",
        F.concat(
            F.lit('["x", '),
            (F.col("l_orderkey") % 10).cast("string"),
            F.lit(", null]"),
        ),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws("|", jsonf.json_get_array("j2")).alias("elems"),
        jsonf.json_length("j2").alias("n_elems"),
    )


def _q_json_explode(spark, sf_dir):
    # §2.4 unnest ≙ explode, composed with the JSON surface: posexplode
    # over json_get_array's RAW elements (string "x" keeps its quotes,
    # numbers verbatim, literal null preserved) — one Generate node, no
    # shuffle. Oracle enumerates the planted array closed-form with the
    # same 1-based ordinality.
    li = _lineitem(spark, sf_dir).withColumn(
        "j2",
        F.concat(
            F.lit('["x", '),
            (F.col("l_orderkey") % 10).cast("string"),
            F.lit(", null]"),
        ),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.posexplode(jsonf.json_get_array("j2")).alias("pos", "elem"),
    ).withColumn("pos", F.col("pos") + 1)


def _q_operator_chain(spark, sf_dir):
    # the JsonColumn sugar path: j -> 'a' -> 'b' -> 0 with cast elision;
    # exercises eager un-nesting + cast rewrite inside the driver harness
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    jc = jsonf.col("j")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        jc["a"]["b"][0].cast("bigint").alias("b0"),
        jc.as_text("d").alias("d_text"),
    )


def _q_multi_extract(spark, sf_dir):
    # fused extraction: one parse + one Arrow hop for 5 typed fields
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    u = jsonf.json_extract_multi(
        "j",
        {
            "b0": ("int", "a", "b", 0),
            "flag": ("str", "a", "b", 1, "c"),
            "d_text": ("text", "d"),
            "len_ab": ("length", "a", "b"),
            "has_d": ("exists", "d"),
        },
    ).alias("u")
    return li.select("l_orderkey", "l_linenumber", u).select(
        "l_orderkey", "l_linenumber", "u.*"
    )


def _q_multi_extract_variant(spark, sf_dir):
    # round-6 stretch: the SAME 5-field fused extraction as
    # multi_extract but on the zero-hop variant tier — the parsed
    # variant is lambda-bound once per row (transform/array trick in
    # multi._variant_multi), so the parse is structurally single;
    # no ArrowEvalPython at all
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    u = jsonf.json_extract_multi(
        "j",
        {
            "b0": ("int", "a", "b", 0),
            "flag": ("str", "a", "b", 1, "c"),
            "d_text": ("text", "d"),
            "len_ab": ("length", "a", "b"),
            "has_d": ("exists", "d"),
        },
        tier="variant",
    ).alias("u")
    return li.select("l_orderkey", "l_linenumber", u).select(
        "l_orderkey", "l_linenumber", "u.*"
    )


def _q_union_roundtrip(spark, sf_dir):
    # json_get -> union struct -> json_union_to_text + json_is_null,
    # computed via the fused union kinds of json_extract_multi: one parse
    # + one Arrow hop for all three outputs instead of three kernels over
    # the same document. The unfused union path stays driver-covered by
    # from_scalar (json_union_to_text over json_from_scalar) and
    # operator_chain, plus tests/test_union.py.
    li = _lineitem(spark, sf_dir).withColumn("j", _nested_json_col())
    u = jsonf.json_extract_multi(
        "j",
        {
            "a_text": ("union_text", "a"),
            "d_is_null": ("union_isnull", "d"),
            "a_is_null": ("union_isnull", "a"),
        },
    ).alias("u")
    return li.select("l_orderkey", "l_linenumber", u).select(
        "l_orderkey", "l_linenumber", "u.*"
    )


def _q_from_scalar(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        jsonf.json_union_to_text(jsonf.json_from_scalar("o_orderkey")).alias("k_json"),
        jsonf.json_union_to_text(jsonf.json_from_scalar("o_orderpriority")).alias(
            "prio_json"
        ),
    )


def _q_column_key(spark, sf_dir):
    # column-valued path element (reference: Array path)
    ev = _events(spark, sf_dir).withColumn(
        "keycol",
        F.when(F.col("event_type") == "click", F.lit("k")).otherwise(F.lit("nope")),
    )
    return ev.select(
        "event_id", jsonf.json_get_int("props", F.col("keycol")).alias("dyn")
    )


def _q_sql_operators(spark, sf_dir):
    # the jsonf.sql text surface: ->> and ? rewritten to registered
    # functions with reference alias rendering (src/rewrite.rs:112-198)
    jsonf.register_all(spark)
    _events(spark, sf_dir).createOrReplaceTempView("events_sqlops")
    return jsonf.sql(
        spark,
        "select event_id, props ->> 'k' as kt, props ? 'k' as has_k "
        "from events_sqlops",
    )


def _q_json_setops(spark, sf_dir):
    # §2.4 set operations composed with JSON predicates: ids whose
    # props.k is even INTERSECT ids with k >= 20, then EXCEPT ids with
    # k % 10 == 0 — both plan as joins over one JSON-extraction pass
    # per branch; oracle mirrors with DuckDB INTERSECT/EXCEPT.
    ev = _events(spark, sf_dir).select(
        "event_id", jsonf.json_get_int("props", "k").alias("_k")
    )
    even = ev.filter(F.pmod(F.col("_k"), F.lit(2)) == 0).select("event_id")
    big = ev.filter(F.col("_k") >= 20).select("event_id")
    tens = ev.filter(F.pmod(F.col("_k"), F.lit(10)) == 0).select("event_id")
    return even.intersect(big).exceptAll(tens)


def _q_sql_params(spark, sf_dir):
    # §2.4 prepared-statement params ≙ spark.sql named arguments: the
    # path key and the threshold are BOUND, not interpolated, through
    # the registered SQL surface (reference run_query_params,
    # tests/utils/mod.rs:249-256)
    jsonf.register_all(spark)
    _events(spark, sf_dir).createOrReplaceTempView("events_params")
    return spark.sql(
        "select event_id, json_get_int(props, :key) as kv "
        "from events_params where json_get_int(props, :key) >= :floor",
        args={"key": "k", "floor": 90},
    )


def _q_tpch_q1(spark, sf_dir):
    # pure Catalyst aggregation: partial agg collapses the scan task's
    # output, so the spread shuffle would only add cost — load unspread
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def _q_events_hourly(spark, sf_dir):
    # pure Catalyst windowed aggregation — partial agg collapses the scan
    # task's output; the spread shuffle would only add cost
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.window("ts", "1 hour")["start"].alias("hour_start"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


def _q_events_sliding(spark, sf_dir):
    # sliding-window aggregation (1h window, 15min slide): each event
    # lands in exactly 4 epoch-aligned windows; F.window's generate +
    # partial agg keeps it one exchange, and the same operator is the
    # streaming tier's window (streaming/windowed_json_counts)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.window("ts", "1 hour", "15 minutes")["start"].alias("win_start"),
        "event_type",
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


def _q_events_rollup(spark, sf_dir):
    # ROLLUP grouping-set aggregation: per (type, day), per type, and
    # grand total in ONE pass — Expand + single hash agg, no re-scan
    ev = load_table(spark, sf_dir, "events")
    return ev.rollup(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))


def _q_salted_join(spark, sf_dir):
    # skew-resistant manual salting: left rows hash into 8 sub-keys,
    # the dim side replicates 8×; output is row-identical to the plain
    # join (which is exactly what the DuckDB twin runs)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = joins.salted_join(
        orders, cust, [("o_custkey", "c_custkey")], salts=8,
        salt_on=["o_orderkey"],
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.min("o_orderkey").alias("min_key")
    )


def _q_orders_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def _q_bloom_join(spark, sf_dir):
    # Bloom-prefiltered selective join: the BUILDING customers are ~20%
    # of the dim side, so the bloom pass drops ~80% of orders BEFORE
    # the join's exchange — at 100 TB that is the difference between
    # shuffling the corpus and shuffling the matches. Result is EXACTLY
    # the plain join (FPs removed by the real join), which is what the
    # oracle runs.
    orders = load_table(spark, sf_dir, "orders")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    j = joins.bloom_prefilter_join(orders, cust, ("o_custkey", "c_custkey"))
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def _q_skew_report(spark, sf_dir):
    # shuffle-planning diagnosis: hottest user_ids with share and
    # x-over-uniform ratio — one keyed partial agg + 1-row broadcast +
    # global top-k, no collect
    from datafusion_functions_json_spark.operators import stats

    ev = load_table(spark, sf_dir, "events")
    return stats.skew_report(ev, "user_id", k=20)


def _q_dedup_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return dedup.exact_dup_groups(docs, "text", "doc_id").select(
        "text",
        F.col("dup_count"),
        F.element_at("ids", 1).alias("min_id"),
    )


def _q_dedup_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs.agg(
        F.count("*").alias("n"),
        F.countDistinct("text").alias("n_distinct"),
    )


def _q_token_count(spark, sf_dir):
    # unspread: token_count is a single split+size expression — at this
    # row count the spread exchange costs more than the parallelism buys
    # (measured min-of-5: 0.22 s unspread vs 0.30 s spread); lang_id's
    # heavier regex stack still wants the spread
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", text.token_count("text").alias("n_tokens")
    )


def _q_quality(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    q = text.quality_features("text")
    return docs.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        F.round(q["distinct_ratio"], 6).alias("distinct_ratio"),
    )


def _q_lang_id(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", text.lang_id("text").alias("lang")
    )


def _q_fingerprint(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", text.fingerprint("text").alias("fp")
    )


def _q_jaccard_adjacent(spark, sf_dir):
    # deterministic pair set (doc_id, doc_id+1): exact n-gram-free token
    # Jaccard — the verification kernel of the near-dup operators, oracle-able
    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = docs.select((F.col("doc_id") - 1).alias("id_a"), F.col("text").alias("tb"))
    return (
        a.join(b, "id_a")
        .select(
            "id_a",
            F.round(
                dedup.jaccard_tokens(
                    F.array_distinct(text.tokens(F.col("ta"))),
                    F.array_distinct(text.tokens(F.col("tb"))),
                ),
                6,
            ).alias("jaccard"),
        )
    )


def _query_vector(sf_dir: str, vec_id: int = 0):
    """Fetch the query point driver-side via pyarrow — a metadata-scale
    lookup; spending a full Spark job (scan+collect) on one row would
    double the query's latency for no reason."""
    import pyarrow.dataset as ds

    t = ds.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=ds.field("vec_id") == vec_id, columns=["embedding"]
    )
    return [float(x) for x in t.column("embedding")[0].as_py()]


def _q_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return similarity.cosine_topk(emb, "embedding", _query_vector(sf_dir), k=10)


def _q_embed_quantize(spark, sf_dir):
    # embedding hygiene ops: L2 norm (rounded — cross-engine float sums
    # differ past ~1e-12) and symmetric int8 quantization of the RAW
    # float32 values (floor(x*127+0.5): element-wise on exact inputs, so
    # the int8 values are identical across engines). The quantized array
    # is serialized to a CSV string: the driver's canonicalizer sorts
    # result columns with pandas, which cannot sort/hash list cells —
    # integer-element array_to_string renders identically in both
    # engines, keeping every element under the hash.
    emb = _emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        F.round(similarity.l2_norm("embedding"), 4).alias("norm"),
        F.array_join(
            similarity.quantize_int8("embedding").cast("array<string>"), ","
        ).alias("q"),
    )


def _q_media_meta(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return multimodal.attach_media_metadata(docs).select(
        "media_id", "payload_bytes"
    )


def _q_curation(spark, sf_dir):
    # the curation pipeline, near-dedup off so the result is
    # SQL-deterministic (the minhash stage is covered by minhash_pairs)
    kept = pipeline.curate(
        _docs(spark, sf_dir),
        min_tokens=10,
        languages=("en",),
        quality_threshold=0.0,
        near_dedup=False,
    )
    return kept.select("doc_id", "lang", "n_tokens")


def _q_asof_join(spark, sf_dir):
    # temporal enrichment: each event gets the date of the user's most
    # recent order at-or-before the event (operators/joins.py — union +
    # keyed window merge, one shuffle per side, no UDF). Only the matched
    # TIMESTAMP is projected: rows tied on (custkey, orderdate) make any
    # other payload pick implementation-defined on both sides.
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    out = joins.asof_join(
        ev,
        orders,
        [("user_id", "o_custkey")],
        "ts",
        "o_orderdate",
        ["o_orderdate"],
        prefix="last_",
    )
    return out.select(
        "event_id", "user_id", F.col("last_o_orderdate").alias("last_order_ts")
    )


def _q_chunk_documents(spark, sf_dir):
    # context-window chunking: sequence + posexplode + slice, zero
    # shuffles, scan-shaped fan-out
    return text.chunk_documents(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        chunk_tokens=64,
        overlap=16,
    )


def _q_hash_split(spark, sf_dir):
    # reproducible train/val/test assignment: pure projection (md5 →
    # u32 fraction → threshold case), zero shuffles — scan-speed at any
    # scale. Counts per split keep the oracle output compact.
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    lab = split_ops.hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="r2"
    )
    return lab.groupBy("split").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("min_id")
    )


def _q_domain_cap(spark, sf_dir):
    # per-source quality cap (split.cap_per_group): keep each source's
    # 10 longest docs (ties -> min doc_id). The rank<=k filter plans as
    # WindowGroupLimit — map-side top-k per group BEFORE the shuffle, so
    # no group ever transfers more than ~k rows per input partition.
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = _docs(spark, sf_dir)
    return split_ops.cap_per_group(
        docs.select("doc_id", "source", "n_chars"),
        "source",
        "n_chars",
        "doc_id",
        10,
    )


def _q_class_centroids(spark, sf_dir):
    # per-label mean embedding: explode + (label,pos) hash agg — partial
    # aggregation collapses each partition to labels×dim rows pre-shuffle;
    # round(6) pins engine-dependent float summation order. Output is
    # exploded to (label, pos, m) scalar rows: the driver's pandas-based
    # canonicalizer cannot sort/hash array cells, and the exploded form
    # checks every element (1-based pos to match SQL subscripts).
    cent = similarity.class_centroids(_emb(spark, sf_dir), "label", "embedding")
    return cent.select(
        "label", F.posexplode("centroid").alias("pos0", "m")
    ).select("label", (F.col("pos0") + 1).cast("bigint").alias("pos"), "m")


def _q_centroid_assign(spark, sf_dir):
    # nearest-centroid assignment: broadcast centroid table, map-side
    # scoring, argmin via min(struct) partial agg; label tie-break.
    # dist column dropped: its last-ulp sum order is engine-dependent
    emb = _emb(spark, sf_dir)
    cent = similarity.class_centroids(emb, "label", "embedding")
    return similarity.centroid_assign(emb, "vec_id", "embedding", cent).select(
        "vec_id", "pred_label"
    )


def _q_kmeans(spark, sf_dir):
    # distributed Lloyd k-means, 2 deterministic iterations: md5-ranked
    # seeds, broadcast-scored assignment, partial-agg-capped mean
    # recompute; cluster ids are engine-reproducible ints
    assigned, _ = similarity.kmeans_fit(
        _emb(spark, sf_dir), "vec_id", "embedding", k=8, iters=2, salt="km"
    )
    return assigned.select(
        "vec_id", F.col("pred_label").cast("bigint").alias("cluster")
    )


def _q_stratified_sample(spark, sf_dir):
    # exact-count per-stratum sample: rank over the md5 hash fraction —
    # one shuffle on the stratum key; selection reproducible from ids
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    return split_ops.stratified_sample(
        docs, "doc_id", "source", 20, salt="strat"
    ).select("doc_id", "source")


def _q_decontam(spark, sf_dir):
    # benchmark decontamination: distinct word-4-gram overlap between
    # the training slice and a held-out eval slice; bench grams are
    # broadcast, so the only exchange is the per-doc count aggregation
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return text.decontaminate(train, "doc_id", "text", bench, n=4)


def _q_stream_decontam(spark, sf_dir):
    # the STREAMING decontamination twin (stateless broadcast-set
    # membership; streaming/decontaminate_stream), run on a batch frame
    # — the identical plan serves both — with max_hits high enough to
    # keep every doc, so the per-doc overlap COUNTS (zeros included,
    # unlike batch decontaminate's hits-only frame) are what the oracle
    # hashes. Same bench/train split and n=4 grams as `decontam`.
    from datafusion_functions_json_spark import streaming as js

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    out = js.decontaminate_stream(
        train, "text", bench, n=4, max_hits=1_000_000_000
    )
    return out.select("doc_id", "contaminated_ngrams")


def _q_mixture_sample(spark, sf_dir):
    # training-mix composition: per-source sampling rates decided by a
    # pure hash projection — reproducible on any engine, no shuffle
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    mix = split_ops.mixture_sample(
        docs,
        "doc_id",
        "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        salt="mix",
        default=0.1,
    )
    return mix.groupBy("source").agg(
        F.count("*").alias("n"), F.min("doc_id").alias("min_id")
    )


def _q_mixture_resample(spark, sf_dir):
    # upsampling mixture: rate>1 duplicates rows deterministically
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    mix = split_ops.mixture_resample(
        docs,
        "doc_id",
        "source",
        {"src0": 2.5, "src1": 1.0, "src2": 0.5},
        salt="up",
    )
    return mix.groupBy("source").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("copy").alias("max_copy"),
    )


def _q_pack_batches(spark, sf_dir):
    # token-budget batch packing: shard-local window prefix sum (mod
    # shard key for cross-engine determinism; xxhash64 default at scale)
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    packed = split_ops.pack_batches(
        docs,
        "doc_id",
        text.token_count(F.col("text")),
        budget=2000,
        shards=8,
        shard_expr=F.pmod(F.col("doc_id"), F.lit(8)).cast("int"),
    )
    return packed.groupBy("shard", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tok"),
        F.min("doc_id").alias("first_id"),
    )


def _q_ann_recall(spark, sf_dir):
    # ANN acceptance gate: recall@10 of the multiprobe LSH tier vs the
    # exact top-k (rows-only: hyperplanes are seeded-random, not SQL).
    # The assert_true column PINS recall >= 0.5 (observed 0.8 at
    # sf0.001, 0.6 at sf0.01) — same pattern as _q_ivf_recall: a
    # collapsed SRP-LSH tier (bucketing/sign bug drives recall toward
    # k/n) turns the driver row red instead of shipping a quietly-worse
    # number.
    emb = _emb(spark, sf_dir)
    q = _query_vector(sf_dir)
    exact = similarity.cosine_topk(emb, "embedding", q, k=10)
    # 2^4 buckets + 11-of-16 probed: sized to the sf0.01-0.1 corpus
    # (bucket count should track corpus size; at 100 TB raise n_planes
    # with the log of the row count)
    approx = similarity.ann_topk(
        emb, "embedding", q, k=10, n_planes=4, multiprobe=2
    )
    r = similarity.recall_at_k(approx, exact, k=10)
    return r.select(
        "k",
        "hits",
        "recall",
        # cast: assert_true yields a NullType column; the string cast
        # gives it an oracle-comparable type (still raises on failure)
        F.assert_true(
            F.col("recall") >= 0.5,
            F.lit("SRP-LSH recall regression: below pinned 0.5"),
        )
        .cast("string")
        .alias("recall_gate"),
    )


def _q_sessionize_batch(spark, sf_dir):
    # batch gap sessionization: lag + running-sum windows and the
    # session agg all over ONE user-keyed exchange (unspread: window
    # shuffles anyway, a pre-spread would just add an exchange)
    from datafusion_functions_json_spark import streaming as js

    ev = load_table(spark, sf_dir, "events")
    return js.sessionize_batch(ev, "user_id", "ts", gap_seconds=600)


def _q_neardedup_compact_twin(spark, sf_dir):
    # ORACLE-twinned compaction-equivalence gate for the streaming
    # near-dedup sink (streaming.neardedup_batch_fn/neardedup_compact):
    # the same three micro-batches — with planted cross-batch
    # duplicates so the index actually fires — are driven into TWO
    # stores, one compacted between batch 1 and batch 2 and one never
    # compacted. Compaction must be invisible: identical survivor sets
    # (n_only_* structurally 0), and batch 2 must still near-dedup
    # against the COMPACTED index. Survivor membership is xxhash64
    # minhash (not mirrorable), but the equality is structural and
    # n_input is recomputed by the oracle from the same predicates.
    # Inputs are capped at doc_id < 300, so this gate is bounded and
    # SF-independent by design (it checks a protocol, not throughput).
    import shutil
    import tempfile

    from datafusion_functions_json_spark import streaming as js

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 300).select(
        "doc_id", "text"
    )
    b0 = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
    b1 = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 1).unionByName(
        b0.filter(F.col("doc_id") < 60).select(
            (F.col("doc_id") + 500000).alias("doc_id"), "text"
        )
    )
    b2 = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 2).unionByName(
        b0.filter(
            (F.col("doc_id") >= 60) & (F.col("doc_id") < 120)
        ).select((F.col("doc_id") + 600000).alias("doc_id"), "text")
    )
    mh = dict(num_perm=32, bands=8, mode="word", n=3, threshold=0.8)
    n_input = b0.count() + b1.count() + b2.count()
    root = tempfile.mkdtemp(prefix="ndtwin_")
    try:
        tgt_c = os.path.join(root, "compacted")
        tgt_u = os.path.join(root, "plain")
        fn_c = js.neardedup_batch_fn(tgt_c, "doc_id", "text", **mh)
        fn_u = js.neardedup_batch_fn(tgt_u, "doc_id", "text", **mh)
        for i, b in enumerate((b0, b1)):
            fn_c(b, i)
            fn_u(b, i)
        rep = js.neardedup_compact(spark, tgt_c)
        fn_c(b2, 2)
        fn_u(b2, 2)
        ids_c = {
            r.doc_id
            for r in js.read_deduped(spark, tgt_c).select("doc_id").collect()
        }
        ids_u = {
            r.doc_id
            for r in js.read_deduped(spark, tgt_u).select("doc_id").collect()
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(n_input),
                1 if rep["compacted"] else 0,
                len(ids_c - ids_u),
                len(ids_u - ids_c),
            )
        ],
        "n_input bigint, compacted int, "
        "n_only_compacted bigint, n_only_plain bigint",
    )


def _q_pii_redact(spark, sf_dir):
    # PII scrubbing with planted, id-derived PII so the check is
    # falsifiable (the synthetic corpus contains none naturally)
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".7"),
    )
    c = text.pii_counts(planted)
    return docs.select(
        "doc_id",
        text.redact_pii(planted).alias("redacted"),
        c.email.alias("email_n"),
        c.ipv4.alias("ipv4_n"),
        c.phone.alias("phone_n"),
    )


def _q_pii_report(spark, sf_dir):
    # per-source PII exposure dashboard (text.pii_report): PII planted
    # on every 3rd doc only, so docs_affected exercises the conditional
    # count (not trivially == n_docs). One scan, one group-keyed agg.
    docs = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.pmod(F.col("doc_id"), F.lit(3)) == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7"),
        ),
    ).otherwise(F.col("text"))
    return text.pii_report(
        docs.select("source", planted.alias("t")), "t", "source"
    )


def _q_percentiles(spark, sf_dir):
    # grouped exact percentiles (linear interpolation — same definition
    # as DuckDB quantile_cont): Spark's percentile is a single-pass
    # typed-imperative aggregate; partial state merges map-side
    return (
        _lineitem(spark, sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.avg("l_extendedprice"), 4).alias("mean"),
            F.count("*").alias("n"),
        )
    )


def _q_training_prep(spark, sf_dir):
    # flagship composition: curate → hash_split → chunk → pack, all
    # deterministic (near-dedup off; mod sharding) so DuckDB can twin it
    prep = pipeline.training_prep(
        _docs(spark, sf_dir),
        splits={"train": 0.9, "val": 0.05, "test": 0.05},
        salt="r2",
        chunk_tokens=64,
        overlap=16,
        batch_budget=512,
        shards=4,
        deterministic_shard=True,
        min_tokens=10,
        languages=("en",),
        quality_threshold=0.0,
        near_dedup=False,
    )
    return prep.select(
        "doc_id", "chunk_id", "tok_start", "n_tokens", "split", "shard", "batch_id"
    )


def _q_tf_idf(spark, sf_dir):
    # per-(doc, token) TF-IDF with smoothed idf — explode, two hash aggs,
    # token-keyed join, 1-row broadcast corpus count. Pure Catalyst.
    return text.tf_idf(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def _q_dedup_cc(spark, sf_dir):
    # connected components over a deterministic near-dup edge set
    # (adjacent-id token-Jaccard >= 0.8, same kernel jaccard_adjacent
    # anchors) — the transitive-closure clustering that one-shot pair
    # removal approximates. Oracle: DuckDB recursive-CTE reachability.
    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("src"), F.col("text").alias("ta"))
    b = docs.select(
        (F.col("doc_id") - 1).alias("src"),
        F.col("doc_id").alias("dst"),
        F.col("text").alias("tb"),
    )
    edges = (
        a.join(b, "src")
        .withColumn(
            "jac",
            dedup.jaccard_tokens(
                F.array_distinct(text.tokens(F.col("ta"))),
                F.array_distinct(text.tokens(F.col("tb"))),
            ),
        )
        .filter(F.col("jac") >= 0.8)
        .select("src", "dst")
    )
    return graph.connected_components(edges, "src", "dst")


def _q_dedup_keep_best(spark, sf_dir):
    # canonical-document selection: same near-dup edge set as dedup_cc,
    # but each duplicate component keeps its LONGEST text (ties -> min
    # doc_id) instead of the min id — the keep-the-best-copy policy real
    # corpora ship. Oracle: recursive-CTE closure + row_number ranking.
    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("src"), F.col("text").alias("ta"))
    b = docs.select(
        (F.col("doc_id") - 1).alias("src"),
        F.col("doc_id").alias("dst"),
        F.col("text").alias("tb"),
    )
    edges = (
        a.join(b, "src")
        .withColumn(
            "jac",
            dedup.jaccard_tokens(
                F.array_distinct(text.tokens(F.col("ta"))),
                F.array_distinct(text.tokens(F.col("tb"))),
            ),
        )
        .filter(F.col("jac") >= 0.8)
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    scored = docs.select("doc_id", F.length("text").cast("int").alias("n_chars"))
    return graph.dedup_keep_best(scored, "doc_id", edges, "n_chars")


def _q_dup_provenance(spark, sf_dir):
    # dedup audit trail: (dropped_id, kept_id) per removed duplicate
    # under the same keep-longest policy as dedup_keep_best — the
    # provenance record a compliance pass keeps. Same recursive-CTE
    # closure oracle, ranked per component.
    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("src"), F.col("text").alias("ta"))
    b = docs.select(
        (F.col("doc_id") - 1).alias("src"),
        F.col("doc_id").alias("dst"),
        F.col("text").alias("tb"),
    )
    edges = (
        a.join(b, "src")
        .withColumn(
            "jac",
            dedup.jaccard_tokens(
                F.array_distinct(text.tokens(F.col("ta"))),
                F.array_distinct(text.tokens(F.col("tb"))),
            ),
        )
        .filter(F.col("jac") >= 0.8)
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )
    scored = docs.select("doc_id", F.length("text").cast("int").alias("n_chars"))
    return graph.dup_provenance(scored, "doc_id", edges, "n_chars")


def _q_token_stats(spark, sf_dir):
    # repetition-class quality signals: single-pass entropy identity
    # H = ln(N) - sum(c ln c)/N over (doc, token) counts
    return text.token_stats(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _q_top_tokens(spark, sf_dir):
    # corpus vocabulary induction: explode -> hash agg -> partial top-k
    # (TakeOrderedAndProject). Unspread: explode+agg is pure Catalyst.
    return text.top_tokens(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=50
    )


def _q_pack_positions(spark, sf_dir):
    # packing + within-batch token spans (loss-mask / block-attention
    # boundaries): same single shard-keyed prefix-sum exchange as
    # pack_batches; spans derive from the same prefix
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    return split_ops.pack_positions(
        docs,
        "doc_id",
        text.token_count(F.col("text")),
        budget=2000,
        shards=8,
        shard_expr=F.pmod(F.col("doc_id"), F.lit(8)).cast("int"),
    ).select("doc_id", "shard", "batch_id", "seq_start", "seq_end")


def _q_curation_v2(spark, sf_dir):
    # the round-6 curation composition end-to-end: lang + token floor →
    # full Gopher conjunction (corpus-tuned 20/1) → normalized exact
    # dedup (accent/case/punct variants collapse, min id survives).
    # Everything pre-dedup is shuffle-free; the dedup shuffles 32-byte
    # digests of the survivors only.
    docs = load_table(spark, sf_dir, "documents")
    out = pipeline.curate_strict(
        docs,
        languages=("en",),
        min_tokens=10,
        gopher_kwargs=dict(min_words=20, min_required_stopwords=1),
    )
    return out.select("doc_id", "lang", "n_tokens", "clf_score")


def _q_curation_v3(spark, sf_dir):
    # curate_balanced: the v2 gates + normalized dedup, then a
    # per-source quality cap (10 best clf_score survivors per source,
    # ties -> min doc_id) — gates first so junk never occupies quota,
    # then balancing so no source dominates. Oracle wraps the v2 SQL
    # in the same row_number cap.
    docs = load_table(spark, sf_dir, "documents")
    out = pipeline.curate_balanced(
        docs,
        cap=10,
        languages=("en",),
        min_tokens=10,
        gopher_kwargs=dict(min_words=20, min_required_stopwords=1),
    )
    return out.select("doc_id", "source", "n_tokens", "clf_score")


def _q_corpus_report(spark, sf_dir):
    # per-source corpus dashboard: one aggregation pass (map-side
    # partial means) + the tiny per-(source,lang) entropy agg — the
    # before/after view every curation run prints
    docs = load_table(spark, sf_dir, "documents")
    return text.corpus_quality_report(docs, "doc_id", "text", "source")


def _q_fuzzy_decontam(spark, sf_dir):
    # fuzzy benchmark decontamination, zero-miss gated: every doc_id%20
    # slice doc is "benchmark"; near-copies (one appended token — char-5
    # shingle Jaccard ~0.98) planted under +500000 ids MUST all be
    # removed. The oracle pins (n_planted, planted_survivors) = (25, 0):
    # a banding or verification regression makes survivors > 0 and
    # hash-fails the row. Natural-doc survival is minhash-dependent and
    # deliberately excluded from the hashed output.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
    train = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) != 0)
    planted = bench.select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    out = dedup.fuzzy_decontaminate(
        train.unionByName(planted), "doc_id", "text", bench,
        threshold=0.7,
    )
    n_planted = bench.count()
    return out.agg(
        F.lit(int(n_planted)).cast("bigint").alias("n_planted"),
        F.sum(
            F.when(F.col("doc_id") >= 500000, 1).otherwise(0)
        ).alias("planted_survivors"),
    )


def _q_quality_classifier(spark, sf_dir):
    # linear (fastText-shape) quality classifier: sigmoid over the
    # 6-feature quality vector with the default hand-set coefficients;
    # the oracle recomputes every feature and the sigmoid (round-6
    # collapses libm exp last-ulp differences)
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.round(
            text.quality_classifier_score(F.col("text")), 6
        ).alias("clf_score"),
    )


def _q_top_ngram(spark, sf_dir):
    # Gopher's within-doc top-bigram character fraction; a planted
    # repeated phrase (mod 4) pushes the fraction toward 1 so the
    # signal is falsifiable in both directions (the small synthetic
    # vocabulary gives natural repeats a spread of low values)
    docs = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.pmod(F.col("doc_id"), F.lit(4)) == 0,
        F.concat(F.col("text"), F.lit(" click here now" * 8)),
    ).otherwise(F.col("text"))
    return docs.select(
        "doc_id",
        text.top_ngram_char_fraction(planted, n=2).alias("top2gram_frac"),
    )


def _q_curriculum(spark, sf_dir):
    # short→long length curriculum: exact global position by
    # (token count, doc_id) WITHOUT a global sort — fixed-width
    # buckets rank in parallel, a 64-row offset table broadcasts back.
    # The oracle is the single-partition row_number the operator must
    # equal exactly.
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", text.token_count(F.col("text")).alias("n_tokens")
    )
    return split_ops.curriculum_rank(
        scored, "doc_id", F.col("n_tokens").cast("double"),
        n_buckets=16, lo=0.0, hi=128.0,
    ).select("doc_id", "n_tokens", "curriculum_rank")


def _q_pretoken_count(spark, sf_dir):
    # BPE pre-tokenizer segment count next to the whitespace count —
    # the two deterministic brackets of a token budget; punctuation is
    # planted (the synthetic prose is bare words, so the contraction /
    # punct-run / digit-run arms need exercising) keyed off doc_id
    docs = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.pmod(F.col("doc_id"), F.lit(4)) == 0,
        F.concat(
            F.col("text"),
            F.lit(" it's 42 miles, (probably!) -- they'll know..."),
        ),
    ).otherwise(F.col("text"))
    return docs.select(
        "doc_id",
        text.token_count(planted).alias("n_ws_tokens"),
        text.pretoken_count(planted).alias("n_pretokens"),
    )


def _q_temperature_sample(spark, sf_dir):
    # multilingual-style α-temperature mixture (α=0.5 upweights small
    # sources): per-source counts → α-share targets broadcast back →
    # one source-keyed rank window; selection reproducible from ids
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    return split_ops.temperature_sample(
        docs, "doc_id", "source", alpha=0.5, budget=120, salt="temp"
    ).select("doc_id", "source")


def _q_heavy_hitters(spark, sf_dir):
    # bounded-memory frequent tokens: per-partition Misra-Gries
    # candidate summaries (O(capacity) executor memory no matter how
    # large the vocabulary) + broadcast-candidate exact recount + exact
    # top-k. capacity=160 >> N/f(20th token) so the MG union guarantee
    # makes the output the EXACT top-20 — the oracle is plain SQL.
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
    return sketch.heavy_hitters(ex, "tok", k=20, capacity=160).select(
        F.col("item").alias("token"), "cnt"
    )


def _q_approx_distinct(spark, sf_dir):
    # HLL++ distinct-count gate: exact count(distinct) per event_type
    # (two-phase Expand) next to approx_count_distinct at rsd=0.02; the
    # approx_ok column pins |approx-exact|/exact <= 0.05, so an HLL
    # regression turns the driver row hash-red (oracle emits literal
    # true). At 100 TB the approx side is the one you'd run: mergeable
    # fixed-size sketch, single partial agg, no Expand blow-up.
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.02).alias("_approx"),
    )
    return g.select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("_approx") - F.col("n_users"))
            / F.col("n_users")
            <= 0.05
        ).alias("approx_ok"),
    )


def _q_range_join(spark, sf_dir):
    # point-in-interval: for each 'error' event, count the same user's
    # events inside the following 5 minutes (operators/joins.range_join —
    # bucketized equi-join, no nested-loop plan). Aggregated output keeps
    # the result deterministic and small.
    ev = load_table(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("interval 5 minutes")).alias("e"),
    )
    pts = ev.select("event_id", "user_id", "ts")
    pairs = joins.range_join(
        pts, anchors, "ts", "s", "e", ["anchor_id"], on="user_id",
        bucket_seconds=300.0,
    )
    return pairs.groupBy("anchor_id").agg(
        F.count("*").alias("n_in_window")
    )


def _q_repetition(spark, sf_dir):
    # Gopher-style line-repetition gate with planted boilerplate (the
    # synthetic corpus is single-line prose, so dup lines are planted on
    # doc_id%3==0 to make the check falsifiable): pure Column folds over
    # the line array — scan-speed, zero shuffle
    docs = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.pmod(F.col("doc_id"), F.lit(3)) == 0,
        F.concat(
            F.col("text"),
            F.lit(
                "\nRepeated boilerplate line.\nRepeated boilerplate line."
                "\nUnique tail "
            ),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.col("text"))
    r = text.repetition_stats(planted)
    return docs.select(
        "doc_id",
        r["n_lines"].alias("n_lines"),
        r["dup_line_frac"].alias("dup_line_frac"),
        r["dup_line_char_frac"].alias("dup_line_char_frac"),
    )


def _q_domains(spark, sf_dir):
    # web-corpus source-mix view: planted, id-derived URLs (mixed-case
    # host AND scheme — HTTP:// exercises the case-insensitive scheme
    # classes) → regexp extract → explode → domain hash-agg with
    # map-side partials; count(distinct) plans as the two-phase Expand
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://Site"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example.org/page and HTTP://cdn.example.net/x"),
        ).alias("t"),
    )
    return text.domain_counts(planted, "doc_id", "t")


def _q_url_canon(spark, sf_dir):
    # URL canonicalization (text.canonical_url): two planted messy
    # templates per parity — mixed-case scheme/host/www, default ports,
    # tracking params out of order, fragments, trailing slashes. The
    # oracle constructs the EXPECTED canonical closed-form (independent
    # derivation, not an op mirror), so every rule is value-checked.
    docs = load_table(spark, sf_dir, "documents")
    messy = F.when(
        F.pmod(F.col("doc_id"), F.lit(2)) == 0,
        F.concat(
            F.lit("HTTPS://WWW.Example"),
            F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
            F.lit(".COM:443/Path"),
            F.pmod(F.col("doc_id"), F.lit(3)).cast("string"),
            F.lit("/?utm_source=x&b=2&a=1&gclid=z&ref=h#frag"),
        ),
    ).otherwise(
        F.concat(
            F.lit("HTTP://Mirror"),
            F.pmod(F.col("doc_id"), F.lit(5)).cast("string"),
            F.lit(".example.ORG:80/q/deep?z=1&referrer=keep#top"),
        )
    )
    return docs.select(
        "doc_id", text.canonical_url(messy).alias("canon_url")
    )


def _q_sentence_stats(spark, sf_dir):
    # sentence segmentation over a planted multi-sentence fixture (the
    # prose is unterminated single-line, so sentences are planted as
    # id-derived terminated clauses): count + first-sentence text
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.lit("First sentence number "),
        F.col("doc_id").cast("string"),
        F.lit(". Second one here! A third?"),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 0,
            F.lit(" Trailing fragment without terminator"),
        ).otherwise(F.lit("")),
    )
    s = text.sentences(planted)
    return docs.select(
        "doc_id",
        F.size(s).alias("n_sentences"),
        F.element_at(s, 1).alias("first_sentence"),
        F.element_at(s, -1).alias("last_sentence"),
    )


def _q_domain_blocklist(spark, sf_dir):
    # blocklist pass over planted URLs: every doc links
    # site{id%7}.example.org; even ids also link cdn.example.net. The
    # blocklist bans the example.net PARENT domain (suffix-chain
    # equi-join, not endswith-BNLJ) and one exact host — survivors are
    # closed-form (odd ids with id%7 != 3), so the oracle checks the
    # whole extract → suffix-explode → join → anti-join path.
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://Site"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example.org/page"),
            F.when(
                F.pmod(F.col("doc_id"), F.lit(2)) == 0,
                F.lit(" and HTTP://cdn.example.net/x"),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    blocklist = spark.createDataFrame(
        [("example.net",), ("site3.example.org",)], "domain string"
    )
    return text.filter_blocked_domains(
        planted, "doc_id", "t", blocklist
    ).select("doc_id")


def _q_top_events_per_type(spark, sf_dir):
    # grouped top-k: row_number window under a <=k filter plans a
    # WindowGroupLimit (partial per-partition top-k BEFORE the exchange);
    # total order (value desc, event_id) makes membership deterministic
    ev = load_table(spark, sf_dir, "events")
    return rank.top_k_per_group(
        ev,
        "event_type",
        [F.col("value").desc_nulls_last(), F.col("event_id").asc()],
        3,
        rank_col="rk",
    ).select("event_type", "event_id", "value", "rk")


def _q_unigram_lm(spark, sf_dir):
    # CCNet-style self-trained unigram LM quality score; vocab_size=50
    # deliberately truncates (corpus vocab is larger) so the OOV
    # smoothing path is exercised under the oracle
    return text.unigram_lm_score(
        _docs(spark, sf_dir), "doc_id", "text", vocab_size=50
    )


def _q_bigram_lm(spark, sf_dir):
    # interpolated bigram LM quality score (Jelinek-Mercer over
    # self-trained corpus counts) — the transition-aware rung above
    # unigram_lm; all counts broadcast back, one per-doc keyed agg
    return text.bigram_lm_score(_docs(spark, sf_dir), "doc_id", "text")


def _q_gopher_filter(spark, sf_dir):
    # Gopher rule-based quality gate (Rae et al. 2021 A1.1) with one
    # planted deformation per rule family (the synthetic corpus is
    # clean single-line prose, so each gate is made falsifiable):
    # mod 0 → duplicated boilerplate lines, mod 1 → all-bullet nav,
    # mod 2 → ellipsis line endings, mod 3 → '#' symbol spam,
    # mod 4 → numeric (non-alpha) spam, mod 5 → untouched. Pure Column
    # expressions — scan speed, zero shuffle, zero Python.
    docs = load_table(spark, sf_dir, "documents")
    m = F.pmod(F.col("doc_id"), F.lit(6))
    planted = F.when(
        m == 0,
        F.concat(
            F.col("text"),
            F.lit("\nSame boilerplate footer line.\nSame boilerplate footer line."),
        ),
    ).when(
        m == 1,
        F.lit("• Home\n• Products\n• About the company\n• Contact and support"),
    ).when(
        m == 2,
        F.concat(
            F.col("text"),
            F.lit("\nRead more...\nClick to continue...\nStory develops..."),
        ),
    ).when(
        m == 3, F.concat(F.col("text"), F.lit("\n" + "#" * 60))
    ).when(
        m == 4,
        F.concat(
            F.lit("the of "),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(60)),
                    lambda i: F.concat(F.lit("4"), i.cast("string"), F.lit("2")),
                ),
                " ",
            ),
        ),
    ).otherwise(F.col("text"))
    # corpus-tuned thresholds (the kwargs exist for exactly this): the
    # synthetic prose holds ~20-100 words and rarely >1 required
    # stopword, so min_words=20 / min_required_stopwords=1 keep the
    # conjunction falsifiable in BOTH directions (keep=true for clean
    # untouched docs, false for every planted deformation)
    g = text.gopher_quality_flags(planted, min_words=20, min_required_stopwords=1)
    return docs.select(
        "doc_id",
        g["word_count_ok"].alias("word_count_ok"),
        g["mean_word_len_ok"].alias("mean_word_len_ok"),
        g["symbol_ratio_ok"].alias("symbol_ratio_ok"),
        g["bullet_ok"].alias("bullet_ok"),
        g["ellipsis_ok"].alias("ellipsis_ok"),
        g["alpha_word_ok"].alias("alpha_word_ok"),
        g["stopword_ok"].alias("stopword_ok"),
        g["dup_line_ok"].alias("dup_line_ok"),
        g["dup_char_ok"].alias("dup_char_ok"),
        g["keep"].alias("keep"),
    )


def _q_c4_clean(spark, sf_dir):
    # C4-style line-level cleaning (Raffel et al. 2020 §2.2) over a
    # planted multi-line fixture: every doc gets two proper sentence
    # lines + its original (terminal-punctuation-less) prose line;
    # mod 3 adds a dropped-line javascript warning + a third proper
    # sentence, mod 5 plants 'lorem ipsum' (doc dropped), mod 7 plants
    # a '{' code fragment (doc dropped). Single-pass Column filter over
    # the line array — no shuffle, no Python.
    docs = load_table(spark, sf_dir, "documents")
    base = F.concat(
        F.lit("First proper sentence line for cleaner gate number "),
        F.col("doc_id").cast("string"),
        F.lit(
            ".\nSecond proper sentence line stays in the document too!\n"
            "Third full sentence line survives the cleaner as well.\n"
        ),
        F.col("text"),
        # mod 11: terminate the prose line so it survives the line gate
        # (varies n_lines_kept between 3 and 4)
        F.when(F.pmod(F.col("doc_id"), F.lit(11)) == 0, F.lit(".")).otherwise(
            F.lit("")
        ),
    )
    planted = F.concat(
        base,
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 0,
            F.lit("\nPlease enable JavaScript to view the comments."),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(5)) == 0,
            F.lit("\nlorem ipsum dolor sit amet filler text."),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(7)) == 0,
            F.lit("\nbody { margin: 0; }"),
        ).otherwise(F.lit("")),
    )
    c = text.c4_clean(planted)
    return docs.select(
        "doc_id",
        c["cleaned_text"].alias("cleaned_text"),
        c["n_lines_kept"].alias("n_lines_kept"),
        c["n_lines_dropped"].alias("n_lines_dropped"),
        c["doc_dropped"].alias("doc_dropped"),
    )


def _q_line_dedup(spark, sf_dir):
    # CCNet-style corpus-level line dedup with a falsifiable fixture:
    # every document gains a shared boilerplate footer (must be dropped
    # everywhere) and a doc-unique line (must survive); the original
    # single-line body is dropped exactly where the corpus's planted
    # exact-duplicate texts make it appear in >= 2 documents
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nShared boilerplate footer line\nunique "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return text.line_dedup(docs, "doc_id", "text", min_docs=2)


def _q_dup_spans(spark, sf_dir):
    # Gopher-style cross-document duplicated n-gram-window fraction:
    # shuffle key is md5(window) (digest, not payload); the window table
    # is corpus-sized so it joins keyed, NOT broadcast
    return text.duplicated_span_fraction(
        _docs(spark, sf_dir), "doc_id", "text", n=10
    )


def _q_bm25(spark, sf_dir):
    # Okapi BM25 against a fixed query bag: token-array filter BEFORE
    # the explode, broadcast corpus stats, one id-keyed agg
    return text.bm25_scores(
        _docs(spark, sf_dir), "doc_id", "text", ("join", "scan", "vector")
    )


def _q_zorder(spark, sf_dir):
    # Z-order layout key over (user bucket, minute bucket): unrolled
    # JVM bit math, scan-speed, no shuffle in the key itself — the
    # write-side clustering (cluster_by_zorder) adds exactly one range
    # exchange; the key math here is what the DuckDB twin reproduces
    ev = load_table(spark, sf_dir, "events")
    minute = F.floor(
        F.col("ts").cast("timestamp").cast("double") / 60
    ).cast("long")
    return ev.select(
        "event_id",
        layout.zorder_key(
            [
                F.pmod(F.col("user_id"), F.lit(1 << 16)),
                F.pmod(minute, F.lit(1 << 16)),
            ],
            bits=16,
        ).alias("zkey"),
    )


def _q_tpch_q6(spark, sf_dir):
    # TPC-H Q6 forecast-revenue: pure Catalyst scan+filter+agg — the
    # filters push to the parquet scan and the single global agg is a
    # partial/final pair (one exchange of one row per partition)
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
        ).alias("revenue")
    )


def _q_tpch_q3(spark, sf_dir):
    # TPC-H Q3 shipping-priority: broadcast the segment-filtered customer
    # dim into the orders join (explicit hint — at 100 TB the filtered
    # dim is still small), shuffle join to lineitem on the orderkey, one
    # hash agg, then global top-10 via TakeOrderedAndProject (partial
    # per-partition top-k, no full sort). Tie-break on l_orderkey pins
    # the limit set.
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    j = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


def _q_tpch_q10(spark, sf_dir):
    # TPC-H Q10 returned-item reporting: quarter-filtered orders shuffle-
    # join lineitem(R-flag) on the orderkey, customer joins keyed (the
    # probe side is already customer-grained), nation broadcast (25
    # rows at any scale), one hash agg, global top-20 via
    # TakeOrderedAndProject. Tie-break on c_custkey pins the limit set.
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    j = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


def _q_tpch_q18(spark, sf_dir):
    # TPC-H Q18 large-volume customers: the HAVING pre-aggregation
    # reuses l_orderkey as the downstream join key, so the agg's
    # exchange co-locates the orders join for free (one shuffle serves
    # both); customer joins keyed. l_quantity is integral so the sum is
    # float-exact and the > threshold predicate is engine-stable.
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )
    )


def _q_tpch_q13(spark, sf_dir):
    # TPC-H Q13 customer order-count distribution (adapted: the slim
    # synthetic orders table has no o_comment to exclude): LEFT OUTER
    # join so zero-order customers land in the c_count=0 bucket, then a
    # two-level aggregation — the outer histogram agg reuses nothing
    # from the join key, so it is its own (tiny) exchange.
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def _q_tpch_q17(spark, sf_dir):
    # TPC-H Q17 small-quantity-order revenue (adapted filter: p_brand +
    # p_size; the slim part table has no p_container). The correlated
    # scalar subquery is DECORRELATED by hand into a per-part average —
    # the idiomatic Spark formulation: the avg agg shuffles on
    # l_partkey, the same key the lineitem join needs, and the filtered
    # part dim broadcasts.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    per_part = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("lim")
    )
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(per_part.withColumnRenamed("l_partkey", "pk"),
              F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("lim"))
    )
    return j.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


def _q_tpch_q22(spark, sf_dir):
    # TPC-H Q22 sales-opportunity (adapted: country code derived from
    # c_nationkey % 5; the slim customer table has no c_phone): global
    # positive-balance average as a 1-row broadcast, LEFT ANTI join
    # against quarter-filtered orders for the no-recent-order
    # predicate, one group agg. The anti join shuffles on the customer
    # key — no correlated per-row subquery survives into the plan.
    cust = load_table(spark, sf_dir, "customer").filter(
        F.pmod(F.col("c_nationkey"), F.lit(5)).isin(0, 1, 2)
    ).select(
        "c_custkey",
        "c_acctbal",
        F.pmod(F.col("c_nationkey"), F.lit(5)).alias("code"),
    )
    avgbal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_custkey")
    kept = (
        cust.crossJoin(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return kept.groupBy("code").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


def _q_tpch_q5(spark, sf_dir):
    # TPC-H Q5 local-supplier-volume, 6-table join tree with honest
    # 100 TB join strategies: region→nation and supplier (true dims)
    # broadcast; orders⋈customer and lineitem⋈orders are fact-fact —
    # shuffle hash/sort-merge joins on their keys (AQE handles skew and
    # post-filter size surprises; broadcasting a year of orders would
    # OOM a real cluster). Projections prune every scan to the join
    # keys + measures; one tiny hash agg on n_name finishes it.
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    asia_nations = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select("n_nationkey", "n_name")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    oc = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "c_nationkey"
    )
    j = (
        li.join(oc, li["l_orderkey"] == oc["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return j.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def _partsupp(spark, sf_dir):
    """Derived part-supplier relation (the synthetic schema ships no
    partsupp): the distinct (l_partkey, l_suppkey) pairs observed in
    lineitem, with a deterministic md5-derived availqty in [1, 1000]
    and a retail-anchored per-pair supply cost in [0.5, 1.0] x retail —
    the same derivation the oracles rebuild in ``_PARTSUPP_SQL``, so
    Q2/Q11/Q20 run with their original plan shapes."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("ps_partkey").cast("string"),
                    F.lit(":"),
                    F.col("ps_suppkey").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    frac = h / F.lit(float(1 << 32))
    return li.join(
        F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey")
    ).select(
        "ps_partkey",
        "ps_suppkey",
        (F.floor(frac * 1000) + 1).cast("int").alias("ps_availqty"),
        F.round(F.col("p_retailprice") * (F.lit(0.5) + frac / 2), 2).alias(
            "ps_supplycost"
        ),
    )


_PARTSUPP_SQL = (
    "ps0 as (select distinct l_partkey as ps_partkey, "
    "l_suppkey as ps_suppkey from lineitem), "
    "psf as (select ps_partkey, ps_suppkey, "
    "try_cast(('0x' || substr(md5(ps_partkey::varchar || ':' || "
    "ps_suppkey::varchar), 1, 8)) as bigint) / 4294967296.0 as frac "
    "from ps0), "
    "partsupp as (select ps_partkey, ps_suppkey, "
    "(floor(frac * 1000) + 1)::int as ps_availqty, "
    "round(p_retailprice * (0.5 + frac / 2), 2) as ps_supplycost "
    "from psf join part on ps_partkey = p_partkey)"
)


def _q_tpch_q2(spark, sf_dir):
    # TPC-H Q2 minimum-cost supplier (over the derived partsupp): the
    # correlated min subquery decorrelates into a per-part min agg
    # joined back on (partkey, cost) — same pattern as q17. Part
    # filter + region-restricted supplier dims broadcast; top-100 by
    # account balance plans TakeOrderedAndProject.
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    eu_nations = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(eu_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    offers = (
        ps.join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"])
        .join(supp, ps["ps_suppkey"] == supp["s_suppkey"])
    )
    mins = offers.groupBy(F.col("ps_partkey").alias("_pk")).agg(
        F.min("ps_supplycost").alias("_minc")
    )
    best = offers.join(
        mins,
        (offers["ps_partkey"] == mins["_pk"])
        & (offers["ps_supplycost"] == mins["_minc"]),
    )
    return (
        best.select("s_acctbal", "s_name", "n_name", "ps_partkey")
        .orderBy(
            F.col("s_acctbal").desc(),
            "n_name",
            "s_name",
            "ps_partkey",
        )
        .limit(100)
    )


def _q_tpch_q11(spark, sf_dir):
    # TPC-H Q11 important stock (derived partsupp): one nation's
    # per-part inventory value filtered by a share of the global total
    # — the scalar subquery is a deliberate 1-row broadcast (same class
    # as tpch_q22's global average)
    ps = _partsupp(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    mine = ps.join(supp, ps["ps_suppkey"] == supp["s_suppkey"]).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("_v"),
    )
    per_part = mine.groupBy("ps_partkey").agg(
        F.round(F.sum("_v"), 2).alias("value")
    )
    total = mine.agg((F.sum("_v") * F.lit(0.002)).alias("_thresh"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_thresh"))
        .select("ps_partkey", "value")
    )


def _q_tpch_q20(spark, sf_dir):
    # TPC-H Q20 excess-stock suppliers (derived partsupp): the nested
    # IN subqueries become keyed joins — shipped-quantity agg per
    # (part, supplier) joined to the pair's availqty, then a distinct
    # supplier semi-join restricted to one nation. 'red%' part filter
    # broadcast.
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red")
    ).select("p_partkey")
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("_pk"), F.col("l_suppkey").alias("_sk")
        )
        .agg(F.sum("l_quantity").alias("_q"))
    )
    excess = (
        ps.join(F.broadcast(part), ps["ps_partkey"] == part["p_partkey"])
        .join(
            qty,
            (ps["ps_partkey"] == qty["_pk"]) & (ps["ps_suppkey"] == qty["_sk"]),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("_q"))
        .select("ps_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_2"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return supp.join(
        excess, F.col("s_suppkey") == excess["ps_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


def _q_tpch_q21(spark, sf_dir):
    # TPC-H Q21 suppliers who kept the order waiting (adapted: late =
    # shipped >90 days after order, the q4/q12 convention, since the
    # synthetic lineitem has no commit/receipt dates): the EXISTS /
    # NOT EXISTS pair decorrelates into ONE per-order distinct-supplier
    # aggregation — an order qualifies a supplier iff it has >1
    # distinct supplier and exactly 1 distinct LATE supplier (him).
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("interval 90 days")
        ).alias("_late"),
    )
    ostats = j.groupBy("o_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_ns"),
        F.countDistinct(
            F.when(F.col("_late"), F.col("l_suppkey"))
        ).alias("_nl"),
    )
    waiting = (
        j.filter(F.col("_late"))
        .select("o_orderkey", "l_suppkey")
        .distinct()
        .join(
            ostats.filter((F.col("_ns") > 1) & (F.col("_nl") == 1)),
            "o_orderkey",
        )
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").filter(
                F.col("n_name") == "NATION_1"
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        waiting.join(supp, waiting["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.countDistinct("o_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def _q_tpch_q7(spark, sf_dir):
    # TPC-H Q7 volume shipping between two nations, by year: lineitem ⋈
    # orders is the one fact-fact shuffle; supplier/customer key maps
    # and both nation dims broadcast. The nation-pair filter lands on
    # the broadcast-joined columns pre-aggregation; the final agg is a
    # tiny (pair, year) hash agg with map-side partials.
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(pair_ok)
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def _q_tpch_q8(spark, sf_dir):
    # TPC-H Q8 national market share: NATION_5's share of ECONOMY-part
    # revenue sold into ASIA customers, by order year. part (filtered,
    # tiny) and supplier-nation map broadcast; lineitem ⋈ orders and
    # orders ⋈ customer shuffle on their keys; the share is one
    # conditional-sum / sum pair per year.
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def _q_tpch_q15(spark, sf_dir):
    # TPC-H Q15 top supplier: revenue view (one suppkey-keyed partial
    # agg over a 3-month shipdate slice) then max-revenue selection via
    # a broadcast 1-row max — no second scan, no window over the full
    # view. Revenue is rounded BEFORE the max-equality so the
    # comparison happens on engine-stable values.
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def _q_tpch_q19(spark, sf_dir):
    # TPC-H Q19 discounted revenue (adapted: the synthetic part table
    # has no container/shipmode, so the disjunctive predicate keeps the
    # brand × quantity-band structure): part dim broadcast, predicate
    # evaluated post-join, single global agg. Catalyst pushes the
    # brand IN-list into the part scan.
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & (q >= 20) & (q <= 30))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )


def _q_tpch_q9(spark, sf_dir):
    # TPC-H Q9 product-type profit (adapted: the synthetic schema has
    # no partsupp, so supply cost is the standard 60%-of-retail proxy
    # per unit): part (LIKE-filtered) and supplier-nation map
    # broadcast; lineitem ⋈ orders is the fact-fact shuffle; profit
    # aggregates per (nation, order year). The LIKE pushes into the
    # part scan as a StringContains filter.
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey", "p_retailprice")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
    )
    return j.groupBy(
        "nation", F.year("o_orderdate").alias("o_year")
    ).agg(F.round(F.sum(amount), 4).alias("sum_profit"))


def _q_tpch_q16(spark, sf_dir):
    # TPC-H Q16 supplier-count per part attribute (adapted: no
    # partsupp, so the part↔supplier relation is the distinct
    # (l_partkey, l_suppkey) pairs observed in lineitem): broadcast
    # the filtered part dim into the pair table; count(distinct)
    # plans the two-phase Expand with map-side partials.
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    j = ps.join(F.broadcast(part), ps["l_partkey"] == part["p_partkey"])
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def _q_tpch_q4(spark, sf_dir):
    # TPC-H Q4 shape (EXISTS → left-semi join; adapted: this lineitem
    # has no commitdate/receiptdate, so "late" = shipped >90 days after
    # order). The semi join is an equi-join on the orderkey with the
    # inequality as a join-side predicate — hash semi join, no
    # correlated per-row subquery execution.
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (
            li["l_shipdate"]
            > orders["o_orderdate"] + F.expr("interval 90 days")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n"))


def _q_tpch_q12(spark, sf_dir):
    # TPC-H Q12 shape (join + conditional aggregation; adapted: grouped
    # by l_returnflag since this schema has no shipmode): one shuffle
    # join on the orderkey, CASE partials fold map-side
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


def _q_tpch_q14(spark, sf_dir):
    # TPC-H Q14 promotion-revenue share: part dim broadcast into the
    # month's lineitem slice; the percentage is one conditional-sum /
    # sum pair in a single partial/final agg
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct")
    )


def _q_weighted_sample(spark, sf_dir):
    # deterministic weighted sampling without replacement (A-ES
    # exponential sort; weight = token count): pure projection for the
    # key + TakeOrderedAndProject partial top-k — no full sort, no
    # shuffle; the salted-md5 draw makes the exact selection
    # reproducible on any engine (DuckDB twin picks identical rows)
    from datafusion_functions_json_spark.operators import split as split_ops

    docs = load_table(spark, sf_dir, "documents")
    wdf = docs.select(
        "doc_id", text.token_count(F.col("text")).cast("double").alias("w")
    )
    return split_ops.weighted_sample(wdf, "doc_id", "w", 40, salt="r4")


def _q_pagerank(spark, sf_dir):
    # PageRank over the documents' token-transition graph (distinct
    # consecutive-token pairs): one lead() window builds the edges, then
    # 3 power-iteration rounds — each ONE keyed join + ONE partial-agg
    # shuffle, lineage-checkpointed (operators/graph.pagerank). The
    # DuckDB twin unrolls the same 3 iterations as CTEs.
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.posexplode(text.tokens(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    edges = (
        ex.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull() & (F.col("tok") != F.col("nxt")))
        .select(F.col("tok").alias("src"), F.col("nxt").alias("dst"))
        .distinct()
    )
    return graph.pagerank(edges, iters=3)


def _pagerank_oracle_sql(iters: int = 3, damping: float = 0.85) -> str:
    head = (
        f"with d as (select doc_id, {_TOKENS_SQL} as tk from documents), "
        "tk as (select doc_id, unnest(tk) as tok, "
        "generate_subscripts(tk, 1) as pos from d), "
        "nx as (select doc_id, tok, lead(tok) over ("
        "partition by doc_id order by pos) as nxt from tk), "
        "edges as (select distinct tok as src, nxt as dst from nx "
        "where nxt is not null and tok <> nxt), "
        "nodes as (select src as node from edges "
        "union select dst from edges), "
        "nn as (select count(*) as n from nodes), "
        "deg as (select src, count(*) as d from edges group by src), "
        "r0 as (select node, 1.0 / (select n from nn) as rank from nodes)"
    )
    parts = [head]
    for i in range(1, iters + 1):
        p, q = f"r{i - 1}", f"r{i}"
        parts.append(
            f", c{i} as (select e.dst as node, sum(r.rank / d.d) as ir "
            f"from edges e join deg d using (src) "
            f"join {p} r on r.node = e.src group by e.dst), "
            f"p{i} as (select n.node, (1 - {damping}) / (select n from nn) "
            f"+ {damping} * coalesce(c{i}.ir, 0) as rank "
            f"from nodes n left join c{i} using (node)), "
            f"t{i} as (select sum(rank) as t from p{i}), "
            f"{q} as (select node, rank / (select t from t{i}) as rank "
            f"from p{i})"
        )
    parts.append(
        f" select node, round(rank, 6) as rank from r{iters}"
    )
    return "".join(parts)


def _q_cohort_retention(spark, sf_dir):
    # activation/decay over the event stream: first-seen keyed agg +
    # one user-keyed join + two-phase distinct count. DAILY periods —
    # the synthetic stream spans one month, so weekly cohorts would
    # collapse to a single row group
    return stats.cohort_retention(
        load_table(spark, sf_dir, "events"),
        "user_id",
        "ts",
        period_seconds=86400,
        max_offset=7,
    )


# -- twin-oracled LSH tier (round 11): the xxhash64-keyed pipelines have
# no DuckDB-computable oracle, so the EXPECTED pair sets are computed
# driver-side by datafusion_functions_json_spark/oracle_twin.py — an
# independent pure-Python re-implementation of the whole pipeline (XXH64
# from the public spec through banding and verification) — and inlined
# into the oracle SQL as literal VALUES rows. The driver then hash-checks
# the pair SETS, not just row counts. One explicit config is shared
# between the production query and the twin so the two sides can never
# silently compare mismatched parameters.

# shared LSH configs — passed verbatim to BOTH the Spark query and the
# pure-Python twin (the twin's tuning params are required keyword-only)
_MINHASH_CFG = {"num_perm": 32, "bands": 8, "seed": 42, "n": 3, "threshold": 0.8}
_SIMHASH_CFG = {"max_hamming": 3, "block_bits": 16}


def _oracle_sf_dir() -> str:
    # the driver's correctness gate runs at sf0.01; local check_oracle
    # runs can re-point the twin via the env var
    return os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@functools.lru_cache(maxsize=4)
def _twin_docs_cached(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return tuple(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )


@functools.lru_cache(maxsize=4)
def _minhash_pairs_oracle(sf_dir: str) -> str:
    pairs = oracle_twin.minhash_pairs(_twin_docs_cached(sf_dir), **_MINHASH_CFG)
    return oracle_twin.values_sql(
        pairs, [("id_a", "bigint"), ("id_b", "bigint"), ("jaccard", "double")]
    )


@functools.lru_cache(maxsize=4)
def _simhash_pairs_oracle(sf_dir: str) -> str:
    pairs = oracle_twin.simhash_pairs(_twin_docs_cached(sf_dir), **_SIMHASH_CFG)
    return oracle_twin.values_sql(
        pairs, [("id_a", "bigint"), ("id_b", "bigint"), ("hamming", "bigint")]
    )


@functools.lru_cache(maxsize=4)
def _minhash_incremental_oracle(sf_dir: str) -> str:
    # mirrors _q_minhash_incremental's batch construction exactly:
    # index = doc_id % 5 != 0; new batch = doc_id % 5 == 0 plus planted
    # near-copies (indexed ids < 25, shifted +100000, appended tail)
    docs = _twin_docs_cached(sf_dir)
    idx_l = [(i, x) for i, x in docs if i % 5 != 0]
    new_l = [(i, x) for i, x in docs if i % 5 == 0] + [
        (i + 100000, (x or "") + " appended tail token")
        for i, x in idx_l
        if i < 25
    ]
    pairs = oracle_twin.minhash_pairs_against(
        tuple(new_l), tuple(idx_l), **_MINHASH_CFG, exclude_same_id=True
    )
    return oracle_twin.values_sql(
        pairs,
        [("new_id", "bigint"), ("index_id", "bigint"), ("jaccard", "double")],
    )


def _q_minhash_pairs(spark, sf_dir):
    # word-3-gram shingles: ~5x fewer shingles than char-5 on these docs
    # at identical recall for near-dup text. Pair-set value-checked
    # against the oracle_twin VALUES oracle (same _MINHASH_CFG).
    return dedup.minhash_dup_pairs(
        _docs(spark, sf_dir), "doc_id", "text", mode="word", **_MINHASH_CFG
    )


def _minhash_eligible(docs):
    # docs the LSH tiers can see at all: word-3-gram signatures need >= 3
    # tokens (shorter docs get NULL signatures by design)
    return docs.filter(text.token_count(F.col("text")) >= 3)


def _with_planted_dups(docs, n: int = 20, offset: int = 1_000_000):
    # the synthetic corpus has no exact-duplicate texts at sf0.01, so the
    # recall gates PLANT their own (same falsifiability pattern as
    # pii_redact): copies of the first n docs under shifted ids — both
    # engines build the identical corpus, and every planted pair must
    # surface
    extra = docs.filter(F.col("doc_id") < n).select(
        (F.col("doc_id") + offset).alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionByName(extra)


def _q_minhash_recall(spark, sf_dir):
    # ORACLE-twinned recall gate for the banded-LSH tier: identical
    # texts have identical signatures, so every planted exact-duplicate
    # pair MUST collide in some band and survive the Jaccard>=0.8
    # verify (their Jaccard is 1.0). n_missed is structurally 0 on a
    # correct implementation and the DuckDB twin asserts exactly that —
    # a banding/signature bug turns the driver row red.
    docs = _minhash_eligible(_with_planted_dups(_docs(spark, sf_dir)))
    pairs = dedup.minhash_dup_pairs(
        docs, "doc_id", "text", num_perm=32, bands=8, mode="word", n=3,
        threshold=0.8,
    )
    k = docs.select(F.md5("text").alias("_k"), F.col("doc_id"))
    exact = (
        k.alias("L")
        .join(k.alias("R"), "_k")
        .filter(F.col("L.doc_id") < F.col("R.doc_id"))
        .select(
            F.col("L.doc_id").alias("id_a"), F.col("R.doc_id").alias("id_b")
        )
    )
    missed = exact.join(pairs, ["id_a", "id_b"], "left_anti")
    return exact.agg(F.count("*").alias("n_exact")).crossJoin(
        missed.agg(F.count("*").alias("n_missed"))
    )


def _q_simhash_recall(spark, sf_dir):
    # same gate for the SimHash pigeonhole tier: identical texts hash to
    # identical 64-bit simhashes (hamming 0 <= 3), and the 4x16-bit
    # block join guarantees recall at <= 3 differing bits — so planted
    # exact-dup pairs must all appear; the oracle asserts n_missed = 0
    docs = _minhash_eligible(_with_planted_dups(_docs(spark, sf_dir)))
    pairs = dedup.simhash_dup_pairs(docs, "doc_id", "text", max_hamming=3)
    k = docs.select(F.md5("text").alias("_k"), F.col("doc_id"))
    exact = (
        k.alias("L")
        .join(k.alias("R"), "_k")
        .filter(F.col("L.doc_id") < F.col("R.doc_id"))
        .select(
            F.col("L.doc_id").alias("id_a"), F.col("R.doc_id").alias("id_b")
        )
    )
    missed = exact.join(pairs, ["id_a", "id_b"], "left_anti")
    return exact.agg(F.count("*").alias("n_exact")).crossJoin(
        missed.agg(F.count("*").alias("n_missed"))
    )


def _q_data_quality(spark, sf_dir):
    # one-pass declarative data-quality gate (operators/validate): all 7
    # constraint kinds compiled into a SINGLE global aggregation (one
    # scan + 1-row reduce regardless of check count), then a plan-time
    # explode to one row per check. The between bound is deliberately
    # violated by real rows so the metric is falsifiable, not all-zero.
    from datafusion_functions_json_spark.operators import validate

    orders = load_table(spark, sf_dir, "orders")
    return validate.check_constraints(
        orders,
        [
            ("not_null", "o_orderkey"),
            ("unique", "o_orderkey"),
            ("min_value", "o_totalprice", 0.0),
            ("between", "o_totalprice", 1000.0, 400000.0),
            ("in_set", "o_orderstatus", ["F", "O", "P"]),
            ("matches", "o_orderpriority", "^[1-5]-"),
            ("not_null", "o_custkey"),
        ],
    )


def _q_incremental_recall(spark, sf_dir):
    # ORACLE-twinned zero-miss gate for the incremental (batch-vs-index)
    # tier: EXACT copies of indexed docs in the new batch have identical
    # signatures, so every copy must band-collide with its original and
    # verify at Jaccard 1.0; n_missed is structurally 0 and the oracle
    # recomputes n_planted from the same eligibility predicate
    docs = _docs(spark, sf_dir)
    idx_docs = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) != 0)
    index = dedup.minhash_index(
        idx_docs, "doc_id", "text", num_perm=32, mode="word", n=3
    )
    copies = _minhash_eligible(idx_docs.filter(F.col("doc_id") < 25)).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    pairs = dedup.minhash_dup_pairs_against(
        copies, index, "doc_id", "text",
        num_perm=32, bands=8, mode="word", n=3, threshold=0.8,
    )
    expected = _minhash_eligible(
        idx_docs.filter(F.col("doc_id") < 25)
    ).select(
        (F.col("doc_id") + 100000).alias("new_id"),
        F.col("doc_id").alias("index_id"),
    )
    missed = expected.join(pairs, ["new_id", "index_id"], "left_anti")
    return expected.agg(F.count("*").alias("n_planted")).crossJoin(
        missed.agg(F.count("*").alias("n_missed"))
    )


def _q_knn_recall(spark, sf_dir):
    # ORACLE-twinned zero-miss gate for the kNN-graph tier: a planted
    # exact duplicate of a vector shares every SRP table's bucket with
    # its original and re-ranks at cosine 1.0, so the original MUST
    # appear among the duplicate's top-k neighbors; n_missed is
    # structurally 0
    emb = _emb(spark, sf_dir)
    dim = 64
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    g = similarity.knn_graph(
        emb.unionByName(planted), "vec_id", "embedding", dim,
        k=5, n_planes=8, n_tables=4,
    )
    expected = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("id"),
        F.col("vec_id").alias("nbr_id"),
    )
    missed = expected.join(g, ["id", "nbr_id"], "left_anti")
    return expected.agg(F.count("*").alias("n_planted")).crossJoin(
        missed.agg(F.count("*").alias("n_missed"))
    )


def _q_percentiles_approx(spark, sf_dir):
    # sketch-tier twin of `percentiles`: Greenwald-Khanna mergeable
    # partial aggregates — bounded state per group, the only memory-safe
    # quantile at 100 TB group sizes. Sketch outputs are
    # implementation-specific → rows-only check, but the assert_true
    # column PINS the empirical rank of each sketch output within 0.01
    # of its target (GK bound is 1e-4; slack covers rounding/ties) —
    # same self-checking pattern as the ANN recall gates: a broken
    # sketch turns the driver row red instead of shipping plausible
    # numbers. The pin joins the 3-row result back over lineitem (tiny
    # broadcast + one conditional agg).
    li = load_table(spark, sf_dir, "lineitem")
    approx = stats.grouped_percentiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        (0.5, 0.9),
        exact=False,
        accuracy=10000,
    )
    ranks = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.avg((F.col("l_extendedprice") <= F.col("p5")).cast("double")).alias("r5"),
            F.avg((F.col("l_extendedprice") <= F.col("p9")).cast("double")).alias("r9"),
        )
    )
    return approx.join(F.broadcast(ranks), "l_returnflag").select(
        "l_returnflag",
        "p5",
        "p9",
        "n",
        F.assert_true(
            (F.abs(F.col("r5") - 0.5) <= 0.01)
            & (F.abs(F.col("r9") - 0.9) <= 0.01),
            F.lit("GK sketch rank error above pinned 0.01"),
        ).alias("rank_gate"),
    )


def _q_minhash_incremental(spark, sf_dir):
    # daily-increment workflow: corpus index built once (one text pass),
    # new batch joins it on band keys — O(batch) per increment. Planted
    # near-copies of indexed docs make the rows-only check falsifiable.
    docs = _docs(spark, sf_dir)
    idx_docs = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) != 0)
    index = dedup.minhash_index(
        idx_docs, "doc_id", "text", num_perm=32, mode="word", n=3
    )
    planted = idx_docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended tail token")).alias("text"),
    )
    newb = (
        docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
        .select("doc_id", "text")
        .unionByName(planted)
    )
    return dedup.minhash_dup_pairs_against(
        newb, index, "doc_id", "text", mode="word", **_MINHASH_CFG
    )


def _q_knn_graph(spark, sf_dir):
    # hard-negative-mining primitive: multi-table SRP-LSH candidate
    # join + exact cosine re-rank + WindowGroupLimit top-k per vector
    # (bucket-hash-dependent candidates → rows-only check)
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    return similarity.knn_graph(
        emb, "vec_id", "embedding", dim, k=5, n_planes=8, n_tables=4
    )


def _q_simhash_pairs(spark, sf_dir):
    # pair-set value-checked against the oracle_twin VALUES oracle
    # (same _SIMHASH_CFG on both sides)
    return dedup.simhash_dup_pairs(
        _docs(spark, sf_dir), "doc_id", "text", **_SIMHASH_CFG
    )


def _q_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return similarity.ann_topk(
        emb, "embedding", _query_vector(sf_dir), k=5, n_planes=10, multiprobe=1
    )


def _q_ivf_topk(spark, sf_dir):
    # second ANN tier, DISTRIBUTED deterministic build (round 8): the
    # md5-seeded two-iteration kmeans_fit index is engine-reproducible,
    # so the oracle replays build + nprobe probing + exact re-rank in
    # SQL (the sample+numpy ivf_build stays pytest-covered — its rand()
    # sample is inherently non-mirrorable).
    emb = _emb(spark, sf_dir)
    assigned, cents = similarity.ivf_build_distributed(
        emb, "vec_id", "embedding", n_clusters=8, iters=2, salt="ivf"
    )
    return similarity.ivf_topk(
        assigned, cents, "embedding", _query_vector(sf_dir), k=5, nprobe=2
    )


def _q_embedding_dups(spark, sf_dir):
    # PLANTED near-duplicates make the rows-only check falsifiable: five
    # scaled copies (cosine exactly 1.0 with their originals) are unioned
    # in under fresh ids — a broken banding or verification path returns
    # 0 rows and the driver check fails instead of passing vacuously
    emb = _emb(spark, sf_dir)
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.001)).cast("float")
        ).alias("embedding"),
        "label",
    )
    return similarity.embedding_dup_pairs(
        emb.unionByName(planted), "vec_id", "embedding", dim=64, threshold=0.95
    )


def _q_random_project(spark, sf_dir):
    # Johnson–Lindenstrauss projection 64→4 dims: numpy matmul per
    # Arrow batch on the Spark side; the oracle embeds the SAME seeded
    # matrix (similarity.projection_matrix) as 4 literal 64-vectors and
    # takes list_dot_products — round-6 collapses summation-order ulps
    emb = _emb(spark, sf_dir)
    p = similarity.random_project("embedding", 64, 4, seed=7)
    return emb.select(
        "vec_id",
        *[
            F.round(F.element_at(p, i + 1), 6).alias(f"p{i}")
            for i in range(4)
        ],
    )


def _random_project_oracle() -> str:
    from datafusion_functions_json_spark.operators.similarity import (
        projection_matrix,
    )

    r = projection_matrix(64, 4, 7)
    cols = []
    for j in range(4):
        vec = ", ".join(repr(r[i][j]) for i in range(64))
        cols.append(
            f"round(list_dot_product(embedding::DOUBLE[], [{vec}]), 6) "
            f"as p{j}"
        )
    return "select vec_id, " + ", ".join(cols) + " from embeddings"


def _q_semantic_dedup(spark, sf_dir):
    # SemDeDup (cluster → within-cluster cosine → drop the
    # near-centroid copy): 20 planted scaled copies (cosine ~1.0 with
    # their originals, landing in the same k-means cluster) make both
    # arms of `dropped` falsifiable; k is DERIVED (520 rows /
    # target_cluster_size=5000 → floor of 8, matching the oracle's
    # k-means mirror) so the scale-aware default path is what the
    # driver checks; iters=1 keeps the mirror to one assignment round.
    # The pairwise stage is a cluster-keyed equi-join — never all-pairs.
    emb = _emb(spark, sf_dir)
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.001)).cast("float")
        ).alias("embedding"),
        "label",
    )
    return similarity.semantic_dedup(
        emb.unionByName(planted),
        "vec_id",
        "embedding",
        k=None,
        target_cluster_size=5000,
        iters=1,
        threshold=0.99,
        salt="sd",
    ).select(
        "vec_id",
        F.col("cluster").cast("bigint").alias("cluster"),
        "cent_dist",
        "dropped",
    )


def _q_embedding_recall(spark, sf_dir):
    # ORACLE-twinned zero-miss gate for the embedding-LSH tier (the
    # sibling of minhash_recall/simhash_recall): a scaled copy of a
    # vector has the same hyperplane signs, so every planted
    # (orig, orig+1e6) pair MUST share a bucket and survive the
    # cosine>=0.95 verify (their cosine is exactly 1.0); n_missed is
    # structurally 0 and the DuckDB twin asserts it
    emb = _emb(spark, sf_dir)
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.001)).cast("float")
        ).alias("embedding"),
        "label",
    )
    pairs = similarity.embedding_dup_pairs(
        emb.unionByName(planted), "vec_id", "embedding", dim=64, threshold=0.95
    )
    expected = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + 1000000).alias("id_b"),
    )
    missed = expected.join(pairs, ["id_a", "id_b"], "left_anti")
    return expected.agg(F.count("*").alias("n_planted")).crossJoin(
        missed.agg(F.count("*").alias("n_missed"))
    )


def _q_audio_features(spark, sf_dir):
    # audio featurizer plumbing (fake decode): the size-derived fields
    # are deterministic, so this path is fully hash-checked by the oracle
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = multimodal.extract_audio_features(docs, fake=True)
    return feats.select("media_id", "sample_rate", "n_samples")


def _q_audio_fingerprint(spark, sf_dir):
    # REAL WAV decode end-to-end, oracle-twinned: a 1600-sample 16-bit
    # mono PCM WAV per doc, built from pure JVM expressions (fixed
    # 44-byte header hex + two 800-sample constant-amplitude halves,
    # id-derived). Constant halves make every RMS bin closed-form
    # (bins 0-7 = A/32768, 8-15 = B/32768), so the band-sign
    # fingerprint is exactly 2^7 iff B > A else 0 — which the DuckDB
    # twin computes arithmetically from the same amplitude derivation.
    hdr = (
        "52494646A40C000057415645666D7420100000000100010040"
        "1F0000803E00000200100064617461800C0000"
    )
    a = F.pmod(F.col("doc_id"), F.lit(8)) * 1000 + 500
    b = F.pmod(F.col("doc_id") * 3, F.lit(8)) * 1000 + 500

    def _le16(v):
        return F.concat(
            F.lpad(F.hex(v % 256), 2, "0"),
            F.lpad(F.hex(F.floor(v / 256).cast("bigint")), 2, "0"),
        )

    payload = F.unhex(
        F.concat(
            F.lit(hdr), F.repeat(_le16(a), 800), F.repeat(_le16(b), 800)
        )
    )
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"), payload.alias("payload")
    )
    feats = multimodal.extract_audio_features(docs)
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        multimodal.audio_fingerprint_bits("features").alias("fingerprint"),
    )


def _q_media_features(spark, sf_dir):
    # REAL image decode end-to-end, fixture built with ZERO Python UDFs:
    # a solid-color 16x16 binary PPM (P6) per doc assembled from pure
    # JVM expressions — the pixel triple rendered as hex, string-
    # repeated 256x, unhex'd back to bytes behind the header. Solid
    # color makes every luma-grid cell closed-form, so the DuckDB twin
    # recomputes it arithmetically (decode goes through _codecs'
    # stdlib PPM path, or PIL identically where present).
    def _b(x):
        return F.lpad(F.hex(x % 256), 2, "0")

    did = F.col("doc_id")
    rgb_hex = F.concat(_b(did * 29), _b(did * 47 + 5), _b(did * 71 + 9))
    payload = F.concat(
        F.encode(F.lit("P6\n16 16\n255\n"), "utf-8"),
        F.unhex(F.repeat(rgb_hex, 256)),
    )
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    return multimodal.decode_image(docs).select(
        "media_id",
        "height",
        "width",
        "channels",
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


def _q_normalized_dedup(spark, sf_dir):
    # CCNet-style normalized exact dedup: planted variants (uppercased;
    # accent-swapped with extra spacing/punctuation) must land in the
    # same dup group as their originals once keyed on
    # md5(normalize_text(...)) — a 32-byte digest shuffle key. ids are
    # CSV-joined (the driver canonicalizer hashes scalars, not arrays).
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.upper(F.col("text")).alias("text"),
    )
    v2 = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(
            F.lit("  "),
            F.replace(F.col("text"), F.lit("a"), F.lit("á")),
            F.lit("  !!"),
        ).alias("text"),
    )
    alld = docs.unionByName(v1).unionByName(v2)
    keyed = alld.select(
        "doc_id", text.normalized_dedup_key(F.col("text")).alias("nkey")
    )
    return (
        keyed.groupBy("nkey")
        .agg(
            F.count("*").alias("n"),
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias(
                "members"
            ),
        )
        .filter(F.col("n") > 1)
    )


def _q_image_dhash(spark, sf_dir):
    # REAL perceptual-hash pipeline, oracle-twinned: two-tone 16x16
    # binary PPMs (left half color A, right half color B, id-derived)
    # built from pure JVM expressions → stdlib/PIL decode → dHash. The
    # halves are uniform, so every 8x9 grid cell is exactly lumaA or
    # lumaB and the hash is closed-form: the boundary-column bit fires
    # per row iff lumaB > lumaA (mask 0x0808080808080808), else 0 —
    # which the DuckDB twin computes arithmetically from the same RGB
    # derivation. doc_id%8 color classes plant real collisions.
    def _b(x):
        return F.lpad(F.hex(x % 256), 2, "0")

    m = F.pmod(F.col("doc_id"), F.lit(8))
    a_hex = F.concat(_b(m * 31), _b(m * 53 + 7), _b(m * 89 + 3))
    b_hex = F.concat(_b(m * 17 + 11), _b(m * 43 + 29), _b(m * 97 + 59))
    row_hex = F.concat(F.repeat(a_hex, 8), F.repeat(b_hex, 8))
    payload = F.concat(
        F.encode(F.lit("P6\n16 16\n255\n"), "utf-8"),
        F.unhex(F.repeat(row_hex, 16)),
    )
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"), payload.alias("payload")
    )
    return multimodal.image_dhash(docs).select("media_id", "dhash")


def _q_video_features(spark, sf_dir):
    # video leg of the multimodal trio, REAL decode end-to-end: plant a
    # deterministic uncompressed-RGB AVI per doc (doc_id%4+1 solid-color
    # frames at 1 fps), fan out the frame plan, decode through the
    # stdlib RIFF/AVI parser, and emit each frame's first luma-grid
    # feature. Solid frames make the luma closed-form, so the DuckDB
    # twin recomputes it arithmetically — a wrong frame index, a BGR/RGB
    # swap, or a scanline bug all hash-mismatch.
    # captured in the closure (NOT imported inside the UDF body): the
    # package registers _codecs for cloudpickle by-value, so the
    # function ships inside the closure and workers need no repo on
    # sys.path — a module-name import on the worker would not resolve
    from datafusion_functions_json_spark.operators._codecs import encode_avi

    @F.pandas_udf("binary")
    def _avi_payload(doc_id):
        import numpy as np
        import pandas as pd

        out = []
        for did in doc_id:
            did = int(did)
            frames = [
                np.full(
                    (16, 16, 3),
                    (
                        (did * 37 + i * 11) % 256,
                        (did * 59 + i * 23) % 256,
                        (did * 83 + i * 41) % 256,
                    ),
                    np.uint8,
                )
                for i in range(did % 4 + 1)
            ]
            out.append(encode_avi(frames, fps=1))
        return pd.Series(out)

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 40).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        _avi_payload(F.col("doc_id")).alias("payload"),
        F.lit("video/avi").alias("mime"),
        F.struct(
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            (F.pmod(F.col("doc_id"), F.lit(4)) * 1000 + 500).alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    return multimodal.extract_video_features(docs, every_ms=1000).select(
        "media_id",
        "frame_ts_ms",
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


def _q_ivf_recall(spark, sf_dir):
    # recall gate for the IVF tier — ORACLE-checked since round 8 (the
    # distributed md5-seeded build replays in SQL). The assert_true
    # column still PINS recall >= 0.55 (nprobe=4 of 8 lists): a silent
    # ANN regression (bucketing/centroid bug collapses recall toward
    # k/n) errors the row red instead of reporting a quietly-worse
    # number, independent of the hash compare.
    emb = _emb(spark, sf_dir)
    q = _query_vector(sf_dir)
    exact = similarity.cosine_topk(emb, "embedding", q, k=10)
    assigned, cents = similarity.ivf_build_distributed(
        emb, "vec_id", "embedding", n_clusters=8, iters=2, salt="ivf"
    )
    approx = similarity.ivf_topk(assigned, cents, "embedding", q, k=10, nprobe=4)
    r = similarity.recall_at_k(approx, exact, k=10)
    return r.select(
        "k",
        "hits",
        "recall",
        F.assert_true(
            F.col("recall") >= 0.55, F.lit("IVF recall regression: below pinned 0.55")
        )
        .cast("string")
        .alias("recall_gate"),
    )


def _q_merge_upsert(spark, sf_dir):
    # MERGE on plain frames (operators/cdc.merge_upsert): planted
    # updates (%7 keys -> MERGED), deletes (%13 keys), and inserts
    # (shifted +1e8 keys for %5) against the orders table — every MERGE
    # arm is exercised and falsifiable. Plan: one left-anti hash join +
    # union, no window, no Python.
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    k = F.col("o_orderkey")
    upd = base.filter((k % 7 == 0) | (k % 13 == 0)).select(
        k.alias("o_orderkey"),
        "o_orderstatus",
        F.lit("MERGED").alias("o_orderpriority"),
        (k % 13 == 0).alias("_d"),
    )
    ins = base.filter(k % 5 == 0).select(
        (k + 100000000).alias("o_orderkey"),
        "o_orderstatus",
        F.lit("NEW").alias("o_orderpriority"),
        F.lit(False).alias("_d"),
    )
    return cdc.merge_upsert(
        base, upd.unionByName(ins), "o_orderkey", delete_col="_d"
    )


def _q_cdc_compact(spark, sf_dir):
    # CDC-log compaction (operators/cdc.apply_cdc_log): a planted
    # 4-wave event log over orders — seq1 upserts (%3 -> FIRST), seq2
    # re-upserts (%6 -> SECOND, overriding seq1), seq3 deletes (%9),
    # plus inserts of shifted keys — so latest-event-wins, the
    # override chain, and the delete arm are all falsifiable. The
    # compaction is row_number DESC -> WindowGroupLimit partial top-1.
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    k = F.col("o_orderkey")

    def ev(pred, prio, op, seq, shift=0):
        return base.filter(pred).select(
            (k + shift).alias("o_orderkey"),
            "o_orderstatus",
            F.lit(prio).alias("o_orderpriority"),
            F.lit(op).alias("op"),
            F.lit(seq).cast("bigint").alias("seq"),
        )

    log = (
        ev(k % 3 == 0, "FIRST", "U", 1)
        .unionByName(ev(k % 6 == 0, "SECOND", "U", 2))
        .unionByName(ev(k % 9 == 0, None, "D", 3))
        .unionByName(ev(k % 4 == 0, "NEW", "I", 1, shift=100000000))
    )
    return cdc.apply_cdc_log(base, log, "o_orderkey", seq_col="seq")


def _q_scd2(spark, sf_dir):
    # SCD2 interval history (operators/cdc.scd2_history) over each
    # customer's order-priority timeline; the (key, eff) pre-agg makes
    # the effective timestamp unique as the operator requires. lead()
    # rides the same key exchange. Timestamps compare engine-stable
    # (micros on both sides).
    ch = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.min("o_orderpriority").alias("prio"))
    )
    return cdc.scd2_history(ch, "o_custkey", "o_orderdate").select(
        "o_custkey", "prio", "valid_from", "valid_to", "is_current"
    )


def _q_snapshot_diff(spark, sf_dir):
    # snapshot delta report (operators/cdc.snapshot_diff): old = the
    # documents table; new = planted removals (%17), edits (%11=3), and
    # additions (shifted %23=5 keys) — all three emitted classes are
    # falsifiable, and a doc that is both %17 and %11=3 must classify
    # as removed (the filter wins). Null-safe compares; full-outer
    # sort-merge join on the key.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    edited = F.when(
        F.col("doc_id") % 11 == 3, F.concat(F.col("text"), F.lit(" [edited]"))
    ).otherwise(F.col("text"))
    new = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .select("doc_id", edited.alias("text"), "lang")
        .unionByName(
            docs.filter(F.col("doc_id") % 23 == 5).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
            )
        )
    )
    return cdc.snapshot_diff(docs, new, "doc_id")


def _q_rrf_fusion(spark, sf_dir):
    # hybrid-retrieval fusion (operators/rank.rrf_fuse): two
    # deterministic top-50 rankings over documents — a quality prior
    # (n_chars desc) and a salted-md5 pseudo-relevance order standing
    # in for a query-dependent retriever — fused by reciprocal rank,
    # top-20 reported. Scale shape: each list is TakeOrderedAndProject
    # top-k FIRST, then row_number over the 50 survivors (the window
    # never sees the corpus); fusion is one hash agg over 100 rows.
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")

    def ranked(order_cols):
        top = docs.orderBy(*order_cols).limit(50).select("doc_id", "n_chars")
        w = Window.orderBy(*order_cols)
        return top.select(
            "doc_id", F.row_number().over(w).cast("int").alias("rnk")
        )

    quality = ranked([F.col("n_chars").desc(), F.col("doc_id").asc()])
    relevance = ranked(
        [
            F.md5(
                F.concat(F.lit("rrf:"), F.col("doc_id").cast("string"))
            ).asc(),
            F.col("doc_id").asc(),
        ]
    )
    fused = rank.rrf_fuse([quality, relevance], "doc_id", k=60)
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    ).limit(20)


def _q_leakage_split(spark, sf_dir):
    # leakage-safe split (operators/split.leakage_safe_split): near-dup
    # components (the dedup_cc edge set) assign splits by COMPONENT
    # hash, so duplicate chains can never straddle train/test; isolated
    # docs fall back to their own id. Oracle: recursive-CTE closure +
    # the same salted-md5 thresholds.
    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("src"), F.col("text").alias("ta"))
    b = docs.select(
        (F.col("doc_id") - 1).alias("src"),
        F.col("doc_id").alias("dst"),
        F.col("text").alias("tb"),
    )
    edges = (
        a.join(b, "src")
        .withColumn(
            "jac",
            dedup.jaccard_tokens(
                F.array_distinct(text.tokens(F.col("ta"))),
                F.array_distinct(text.tokens(F.col("tb"))),
            ),
        )
        .filter(F.col("jac") >= 0.8)
        .select("src", "dst")
    )
    from datafusion_functions_json_spark.operators import split as split_ops

    out = split_ops.leakage_safe_split(
        docs.select("doc_id"),
        "doc_id",
        edges,
        {"train": 0.6, "val": 0.2, "test": 0.2},
        salt="ls",
    )
    return out.select("doc_id", "split_group", "split")


_BPE_STEPS = 8


def _q_bpe_merges(spark, sf_dir):
    # distributed BPE training (operators/bpe.py): 8 merges learned
    # from the documents word table. Each step is one Spark job over
    # the VOCAB (corpus touched once by word_table); the 1-row argmax
    # collects are the model itself — bounded driver state by design.
    # Oracle: DuckDB replays training step-for-step on marker-wrapped
    # symbol strings (deterministic tie-break: freq desc, pair asc).
    # batch_size=4 exercises the batched-round path (up to 4 provably
    # order-exact merges per driver round-trip) against the SAME
    # sequential oracle — the hash match IS the exactness proof.
    docs = _docs(spark, sf_dir)
    wt = bpe.word_table(docs, "text")
    merges, _ = bpe.bpe_train(wt, n_merges=_BPE_STEPS, batch_size=4)
    return spark.createDataFrame(
        [(s, l, r, l + r, f) for s, l, r, f in merges],
        "step int, lft string, rgt string, merged string, freq bigint",
    )


def _q_bpe_stats(spark, sf_dir):
    # tokenizer evaluation: train the segmentation on 2/3 of the corpus
    # (doc_id % 3 != 0) and evaluate over ALL docs. The synthetic
    # corpus shares its vocabulary across docs, so OOV lands at 0 here
    # (the OOV/char-fallback arm is pinned by TestBpeStats with planted
    # unknown words); the filtered-training + full-corpus-eval split is
    # still exercised end-to-end. One keyed join + one partial
    # aggregate; oracle replays training in the MATERIALIZED CTE chain
    # with the same train filter and mirrors the arithmetic.
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) != 0)
    wt = bpe.word_table(train, "text")
    _, seg = bpe.bpe_train(wt, n_merges=_BPE_STEPS, batch_size=4)
    return bpe.bpe_stats(docs, "text", seg)


def _q_bpe_encode(spark, sf_dir):
    # BPE encoding as a keyed join against the trained segmentation
    # table (bpe_encode_words): per-doc word + BPE-token counts, zero
    # per-token Python — the 100 TB encode path.
    docs = _docs(spark, sf_dir)
    wt = bpe.word_table(docs, "text")
    _, seg = bpe.bpe_train(wt, n_merges=_BPE_STEPS, batch_size=4)
    return bpe.bpe_encode_words(docs, "text", seg)


def _bpe_oracle_ctes(n_steps: int) -> str:
    """Unrolled BPE training in DuckDB SQL: words as marker-wrapped
    symbol strings (``<l><o><w>``) so pair replacement anchors on whole
    symbols and stays greedy left-to-right like the Spark fold.

    Every CTE is ``AS MATERIALIZED``: DuckDB inlines CTEs by default,
    and the w0→w8 chain (each step referencing the previous twice via
    the scalar subqueries) otherwise expands exponentially — the
    un-hinted query never finishes."""
    ctes = [
        "wt as materialized (select word, count(*) as cnt from ("
        "select unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) "
        "as word from documents) group by word)",
        "w0 as materialized (select word, cnt, '<' || "
        "array_to_string(string_split(word, ''), '><') || '>' as s from wt)",
    ]
    for k in range(1, n_steps + 1):
        prev = f"w{k - 1}"
        ctes.append(
            f"p{k} as materialized (select l[i] as lft, l[i + 1] as rgt, "
            "sum(cnt)::bigint as freq from ("
            "select cnt, string_split(trim(s, '<>'), '><') as l, "
            "unnest(generate_series(1, "
            "len(string_split(trim(s, '<>'), '><')) - 1)) as i "
            f"from {prev}) group by 1, 2)"
        )
        ctes.append(
            f"m{k} as materialized (select lft, rgt, freq from p{k} "
            "order by freq desc, lft asc, rgt asc limit 1)"
        )
        ctes.append(
            f"w{k} as materialized (select word, cnt, replace(s, "
            f"(select '<' || lft || '><' || rgt || '>' from m{k}), "
            f"(select '<' || lft || rgt || '>' from m{k})) as s "
            f"from {prev})"
        )
    return "with " + ", ".join(ctes)


def _bpe_train_filtered_ctes(n_steps: int, predicate: str) -> str:
    """The BPE training CTE chain with the word table restricted to
    ``predicate`` (the bpe_stats train/eval split). Guarded: if the wt
    CTE's wording ever drifts so the patch no longer lands, this raises
    instead of silently un-filtering the oracle's training corpus."""
    base = _bpe_oracle_ctes(n_steps)
    patched = base.replace(
        "as word from documents) group by word)",
        f"as word from documents where {predicate}) group by word)",
    )
    if patched == base:
        raise AssertionError(
            "bpe_stats oracle patch did not match the wt CTE text — "
            "update _bpe_train_filtered_ctes alongside _bpe_oracle_ctes"
        )
    return patched


def _q_corpus_drift(spark, sf_dir):
    # token-distribution drift (operators/stats.distribution_drift):
    # new snapshot = src2 turned off + a planted token on every 7th
    # doc, so both the removed-mass and injected-token directions move
    # the divergences. One vocab-keyed join, 1-row totals broadcast.
    docs = _docs(spark, sf_dir)
    new = docs.filter(F.col("source") != "src2").select(
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" driftword")),
        )
        .otherwise(F.col("text"))
        .alias("text")
    )
    return stats.distribution_drift(docs, new, "text")


def _q_grouped_drift(spark, sf_dir):
    # per-source drift (operators/stats.grouped_drift): src1 loses half
    # its documents and every 7th doc corpus-wide gains a planted
    # token, so one group drifts hard and the rest mildly — the
    # "which slice moved" report. Totals join keyed by group (groups
    # unbounded at scale), everything (group, token)-keyed.
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    new = docs.filter(
        ~((F.col("source") == "src1") & (F.col("doc_id") % 2 == 0))
    ).select(
        "source",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" driftword")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return stats.grouped_drift(docs, new, "source", "text")


def _q_psi_drift(spark, sf_dir):
    # numeric-feature drift (operators/stats.psi): new snapshot drops
    # every 3rd order and inflates every 5th price by 1.1, so mass
    # moves across the fixed 10-bin [0, 400000) grid in both
    # directions. Histogram cells only ever shuffle — never rows.
    orders = load_table(spark, sf_dir, "orders")
    new = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 1.1
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice")
    )
    return stats.psi(
        orders, new, "o_totalprice", lo=0.0, hi=400000.0, bins=10
    )


def _planes_values_sql(n_planes: int, dim: int = 64, seed: int = 42) -> str:
    """The deterministic SRP hyperplanes as a SQL VALUES list
    ``(i, DOUBLE[])`` — repr() literals round-trip to the identical
    doubles on any engine."""
    planes = similarity._hyperplanes(dim, n_planes, seed)
    return ", ".join(
        f"({i}, [{', '.join(repr(x) for x in h)}]::DOUBLE[])"
        for i, h in enumerate(planes)
    )


def _multitable_planes_sql(
    n_tables: int, n_planes: int, dim: int = 64, seed: int = 42
) -> str:
    """Multi-table SRP planes as ``(t, i, DOUBLE[])`` VALUES rows —
    table ``t`` uses seed ``seed + t`` exactly like knn_graph."""
    rows = []
    for t in range(n_tables):
        for i, h in enumerate(similarity._hyperplanes(dim, n_planes, seed + t)):
            rows.append(
                f"({t}, {i}, [{', '.join(repr(x) for x in h)}]::DOUBLE[])"
            )
    return ", ".join(rows)


def _ivf_oracle_sql(nprobe: int, k: int) -> str:
    """The distributed IVF tier replayed in DuckDB: the kmeans mirror
    (md5('ivf:')-ranked seeds, one assignment, 6-decimal-rounded mean
    update, final assignment — the exact CTE chain the `kmeans` oracle
    proves), then the query's ``nprobe`` nearest centroids, candidates
    from those lists, exact-cosine top-k."""
    return (
        "with f as (select vec_id, embedding, "
        "try_cast(('0x' || substr(md5('ivf:' || vec_id::varchar), 1, 8)) "
        "as bigint) / 4294967296.0 as b from embeddings), "
        "sr as (select vec_id, embedding, "
        "row_number() over (order by b, vec_id) - 1 as label from f), "
        "seeds as (select label, embedding as centroid from sr "
        "where label < 8), "
        "d1 as (select vec_id, label, sum((x - m) * (x - m)) as dd from ("
        "select e.vec_id, s.label, unnest(e.embedding)::double as x, "
        "unnest(s.centroid)::double as m "
        "from embeddings e cross join seeds s) group by vec_id, label), "
        "a1 as (select vec_id, label from (select vec_id, label, "
        "row_number() over (partition by vec_id order by dd, label) as rn "
        "from d1) where rn = 1), "
        "c1 as (select label, list(round(m, 6) order by pos) as centroid "
        "from (select a1.label as label, t.pos, avg(t.x) as m from ("
        "select vec_id, unnest(embedding)::double as x, "
        "generate_subscripts(embedding, 1) as pos from embeddings) t "
        "join a1 using (vec_id) group by a1.label, t.pos) group by label), "
        "d2 as (select vec_id, label, sum((x - m) * (x - m)) as dd from ("
        "select e.vec_id, c.label, unnest(e.embedding)::double as x, "
        "unnest(c.centroid) as m "
        "from embeddings e cross join c1 c) group by vec_id, label), "
        "a2 as (select vec_id, label from (select vec_id, label, "
        "row_number() over (partition by vec_id order by dd, label) as rn "
        "from d2) where rn = 1), "
        "q as (select embedding::DOUBLE[] as qv from embeddings "
        "where vec_id = 0), "
        "qd as (select cl.label, sum((cm - qx) * (cm - qx)) as dd from ("
        "select label, unnest(centroid) as cm, "
        "generate_subscripts(centroid, 1) as pos from c1) cl join ("
        "select unnest(qv)::double as qx, generate_subscripts(qv, 1) as pos "
        "from q) qq using (pos) group by cl.label), "
        "pr as (select label from (select label, row_number() over ("
        "order by dd, label) as rn from qd) "
        f"where rn <= {nprobe}), "
        "cand as (select e.vec_id, e.embedding::DOUBLE[] as v "
        "from embeddings e join a2 on e.vec_id = a2.vec_id "
        "join pr on a2.label = pr.label) "
        "select vec_id, round(list_dot_product(v, qv) / "
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), "
        "6) as cosine from cand, q "
        f"order by cosine desc, vec_id asc limit {k}"
    )


def _ann_oracle_sql(n_planes: int, multiprobe: int, k: int) -> str:
    """SRP-LSH ANN replayed in DuckDB: the hyperplanes are
    deterministic Python floats (random.Random(42).gauss), so they
    inline as DOUBLE literals — the same trick as random_project's
    oracle — and the multiprobe masks are static ints. The query
    vector and its signature stay IN SQL (they depend on the data), so
    one oracle string serves every SF. Sign parity is robust: a
    projection would need |dot| < ~1e-12 to flip between engines."""
    import itertools

    rows = _planes_values_sql(n_planes)
    masks = {0}
    for r in range(1, multiprobe + 1):
        for combo in itertools.combinations(range(n_planes), r):
            m = 0
            for i in combo:
                m |= 1 << i
            masks.add(m)
    masks_sql = ", ".join(str(m) for m in sorted(masks))
    return (
        "with q as (select embedding::DOUBLE[] as qv from embeddings "
        "where vec_id = 0), "
        f"pl as (select * from (values {rows}) as t(i, h)), "
        "qs as (select sum(case when list_dot_product(qv, h) >= 0 "
        "then (1::bigint << i) else 0 end)::bigint as sig "
        "from q cross join pl), "
        "bk as (select vec_id, sum(case when "
        "list_dot_product(embedding::DOUBLE[], h) >= 0 "
        "then (1::bigint << i) else 0 end)::bigint as b "
        "from embeddings cross join pl group by vec_id), "
        "pr as (select distinct xor(sig, m) as pb from qs cross join "
        f"(select unnest([{masks_sql}]) as m) ms), "
        "cand as (select e.vec_id, e.embedding::DOUBLE[] as v "
        "from embeddings e join bk using (vec_id) "
        "join pr on bk.b = pr.pb) "
        "select vec_id, round(list_dot_product(v, qv) / "
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), "
        "6) as cosine from cand, q "
        f"order by cosine desc, vec_id asc limit {k}"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_json_agg(spark, "/root/testdata/sf0.001")


def _last_driver_checked() -> dict[str, tuple[int, bool, bool]]:
    """Per registry entry: (round it last appeared in a driver
    CORRECTNESS window, whether that latest record was a genuine
    failure, whether it was a rows-only ``no_oracle`` record).
    Entries never driver-checked are absent (treated as round 0).

    Derived at call time from the CORRECTNESS_r*.json files the driver
    itself writes, so the rotation order below is self-maintaining: no
    hand-edited round map, no stale comments. When the driver writes
    CORRECTNESS_r07.json, round 8's ordering picks it up automatically.
    """
    import json as _json
    import re as _re
    from pathlib import Path as _Path

    last: dict[str, tuple[int, bool, bool]] = {}
    here = _Path(__file__).resolve().parent
    for f in sorted(here.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            checked = _json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(checked, dict):
            continue
        for k, rec in checked.items():
            if last.get(k, (0,))[0] > rnd:
                continue  # keep the NEWEST record's status
            if not isinstance(rec, dict):
                last[k] = (rnd, False, False)
                continue
            err = rec.get("err")
            no_oracle = err == "no_oracle"
            failed = (err is not None and not no_oracle) or any(
                rec.get(f) is False
                for f in ("rows_match", "schema_match", "hash_match")
            )
            last[k] = (rnd, failed, no_oracle)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Full registry, ordered least-recently-driver-checked first,
    with two retry-first exceptions.

    The driver verifies the FIRST 50 entries each round, so ordering by
    last-checked round ascending (never-checked = 0, ties broken by the
    canonical registry order in ``_registry()``) guarantees every entry
    re-enters the window as soon as arithmetic allows. At ~165 entries
    and a 50-slot window the true re-check cadence is ceil(n/50) = 4
    rounds; entries whose last check is oldest always go first, so no
    entry can starve.

    Two kinds of entry jump the queue (staleness treated as 0), both
    derived from driver output + the current oracle registry, so the
    rule stays self-maintaining: (a) an entry whose LATEST driver
    record is a genuine failure — a fix must be re-verified next round,
    not after the full cadence; (b) an entry whose latest record was a
    rows-only ``no_oracle`` check but which NOW has an ``oracle_sql``
    entry — the check materially strengthened (rows-only → value-hash)
    and should run at the new strength immediately. Permanently
    unmirrorable entries (xxhash64/approximate — no oracle_sql) are
    not boosted: they'd otherwise pin window slots every round.
    """
    reg = _registry()
    last = _last_driver_checked()
    osql = oracle_sql()
    pos = {k: i for i, k in enumerate(reg)}

    def _staleness(k: str) -> int:
        rnd, failed, no_oracle = last.get(k, (0, False, False))
        if failed or (no_oracle and k in osql):
            return 0
        return rnd

    ordered = sorted(reg, key=lambda k: (_staleness(k), pos[k]))
    return {k: reg[k] for k in ordered}


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Canonical (stable) order — rotation ordering is applied in
    # queries(); this dict is the single source of truth for the
    # registry, so a key can never be bound twice to diverging builders.
    return {
        "json_contains_variant": _q_json_contains_variant,
        "json_as_text_variant": _q_json_as_text_variant,
        "multi_extract_variant": _q_multi_extract_variant,
        "line_dedup": _q_line_dedup,
        "get_array_csv": _q_get_array_csv,
        "json_explode": _q_json_explode,
        "column_key": _q_column_key,
        "json_agg": _q_json_agg,
        "curation": _q_curation,
        "json_get_int": _q_json_get_int,
        "json_get_float": _q_json_get_float,
        "json_get_str": _q_json_get_str,
        "json_get_bool": _q_json_get_bool,
        "json_as_text": _q_json_as_text,
        "json_contains": _q_json_contains,
        "json_length": _q_json_length,
        "json_object_keys": _q_json_object_keys,
        "json_get_int_variant": _q_json_get_int_variant,
        "json_as_text_native": _q_json_as_text_native,
        "nested_get_int": _q_nested_get_int,
        "nested_contains": _q_nested_contains,
        "nested_length_keys": _q_nested_length_keys,
        "nested_as_text_null": _q_nested_as_text_null,
        "operator_chain": _q_operator_chain,
        "tpch_q1": _q_tpch_q1,
        "events_hourly": _q_events_hourly,
        "events_sliding": _q_events_sliding,
        "events_rollup": _q_events_rollup,
        "orders_join": _q_orders_join,
        "salted_join": _q_salted_join,
        "dedup_exact": _q_dedup_exact,
        "dedup_stats": _q_dedup_stats,
        "token_count": _q_token_count,
        "quality": _q_quality,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "jaccard_adjacent": _q_jaccard_adjacent,
        "cosine_topk": _q_cosine_topk,
        "embed_quantize": _q_embed_quantize,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "top_tokens": _q_top_tokens,
        "token_stats": _q_token_stats,
        "tf_idf": _q_tf_idf,
        "dedup_cc": _q_dedup_cc,
        "dedup_keep_best": _q_dedup_keep_best,
        "dup_provenance": _q_dup_provenance,
        "hash_split": _q_hash_split,
        "domain_cap": _q_domain_cap,
        "class_centroids": _q_class_centroids,
        "centroid_assign": _q_centroid_assign,
        "weighted_sample": _q_weighted_sample,
        "video_features": _q_video_features,
        "media_features": _q_media_features,
        "stream_decontam": _q_stream_decontam,
        "json_agg_variant": _q_json_agg_variant,
        "bloom_join": _q_bloom_join,
        "skew_report": _q_skew_report,
        "gopher_filter": _q_gopher_filter,
        "c4_clean": _q_c4_clean,
        "semantic_dedup": _q_semantic_dedup,
        "random_project": _q_random_project,
        "domain_blocklist": _q_domain_blocklist,
        "sentence_stats": _q_sentence_stats,
        "heavy_hitters": _q_heavy_hitters,
        "approx_distinct": _q_approx_distinct,
        "temperature_sample": _q_temperature_sample,
        "pretoken_count": _q_pretoken_count,
        "curriculum": _q_curriculum,
        "top_ngram": _q_top_ngram,
        "quality_classifier": _q_quality_classifier,
        "fuzzy_decontam": _q_fuzzy_decontam,
        "corpus_report": _q_corpus_report,
        "curation_v2": _q_curation_v2,
        "curation_v3": _q_curation_v3,
        "pack_positions": _q_pack_positions,
        "audio_fingerprint": _q_audio_fingerprint,
        "tpch_q7": _q_tpch_q7,
        "tpch_q8": _q_tpch_q8,
        "tpch_q9": _q_tpch_q9,
        "tpch_q16": _q_tpch_q16,
        "image_dhash": _q_image_dhash,
        "normalized_dedup": _q_normalized_dedup,
        "tpch_q2": _q_tpch_q2,
        "tpch_q11": _q_tpch_q11,
        "tpch_q20": _q_tpch_q20,
        "tpch_q21": _q_tpch_q21,
        "tpch_q15": _q_tpch_q15,
        "tpch_q19": _q_tpch_q19,
        "tpch_q10": _q_tpch_q10,
        "tpch_q18": _q_tpch_q18,
        "minhash_recall": _q_minhash_recall,
        "simhash_recall": _q_simhash_recall,
        "embedding_recall": _q_embedding_recall,
        "incremental_recall": _q_incremental_recall,
        "neardedup_compact_twin": _q_neardedup_compact_twin,
        "knn_recall": _q_knn_recall,
        "data_quality": _q_data_quality,
        "union_variant": _q_union_variant,
        "union_roundtrip_variant": _q_union_roundtrip_variant,
        "tpch_q13": _q_tpch_q13,
        "tpch_q17": _q_tpch_q17,
        "tpch_q22": _q_tpch_q22,
        "bigram_lm": _q_bigram_lm,
        "ann_recall": _q_ann_recall,
        "media_meta": _q_media_meta,
        "json_json_variant": _q_json_json_variant,
        "kmeans": _q_kmeans,
        "stratified_sample": _q_stratified_sample,
        "decontam": _q_decontam,
        "mixture_sample": _q_mixture_sample,
        "mixture_resample": _q_mixture_resample,
        "pack_batches": _q_pack_batches,
        "chunk_documents": _q_chunk_documents,
        "training_prep": _q_training_prep,
        "percentiles": _q_percentiles,
        "pii_redact": _q_pii_redact,
        "pii_report": _q_pii_report,
        "sessionize_batch": _q_sessionize_batch,
        "repetition": _q_repetition,
        "domains": _q_domains,
        "url_canon": _q_url_canon,
        "top_events_per_type": _q_top_events_per_type,
        "zorder": _q_zorder,
        "unigram_lm": _q_unigram_lm,
        "bm25": _q_bm25,
        "tpch_q6": _q_tpch_q6,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "tpch_q4": _q_tpch_q4,
        "tpch_q12": _q_tpch_q12,
        "tpch_q14": _q_tpch_q14,
        "cohort_retention": _q_cohort_retention,
        "pagerank": _q_pagerank,
        "audio_features": _q_audio_features,
        "minhash_pairs": _q_minhash_pairs,
        "percentiles_approx": _q_percentiles_approx,
        "minhash_incremental": _q_minhash_incremental,
        "knn_graph": _q_knn_graph,
        "simhash_pairs": _q_simhash_pairs,
        "ann_topk": _q_ann_topk,
        "ivf_topk": _q_ivf_topk,
        "ivf_recall": _q_ivf_recall,
        "embedding_dups": _q_embedding_dups,
        "get_array_variant": _q_get_array_variant,
        "dup_spans": _q_dup_spans,
        "from_scalar": _q_from_scalar,
        "sql_operators": _q_sql_operators,
        "json_setops": _q_json_setops,
        "sql_params": _q_sql_params,
        "nested_get_str": _q_nested_get_str,
        "union_roundtrip": _q_union_roundtrip,
        "multi_extract": _q_multi_extract,
        "json_get_json": _q_json_get_json,
        "merge_upsert": _q_merge_upsert,
        "cdc_compact": _q_cdc_compact,
        "scd2": _q_scd2,
        "snapshot_diff": _q_snapshot_diff,
        "rrf_fusion": _q_rrf_fusion,
        "leakage_split": _q_leakage_split,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode": _q_bpe_encode,
        "bpe_stats": _q_bpe_stats,
        "corpus_drift": _q_corpus_drift,
        "grouped_drift": _q_grouped_drift,
        "psi_drift": _q_psi_drift,
    }


def oracle_sql() -> dict[str, str]:
    jx = "json_extract(props, '$.k')"
    nested = _NESTED_SQL
    # curation CTE prefix (shared by `curation` and `training_prep`):
    # lang-id + token gate + exact dedup keeping min doc_id per text
    curated_ctes = (
        "with enriched as (select doc_id, text, "
        + ", ".join(
            f"len(list_intersect(list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t != '')), {_STOP_SQL[lang]})) as s_{lang}"
            for lang in sorted(text.STOPWORDS)
        )
        + f", len({_TOKENS_SQL})::int as n_tokens from documents), "
        "scored as (select doc_id, text, n_tokens, case "
        "when s_de = 0 and s_en = 0 and s_es = 0 and s_fr = 0 then 'und' "
        "when s_fr >= s_es and s_fr >= s_en and s_fr >= s_de then 'fr' "
        "when s_es >= s_en and s_es >= s_de then 'es' "
        "when s_en >= s_de then 'en' else 'de' end as lang from enriched), "
        "f as (select * from scored where n_tokens >= 10 and lang = 'en'), "
        "keep as (select text, min(doc_id) as kid from f group by text), "
        "curated as (select f.doc_id, f.text, f.lang, f.n_tokens from f "
        "join keep on f.text = keep.text and f.doc_id = keep.kid)"
    )
    return {
        "json_get_int": f"select event_id, try_cast({jx} as bigint) as k from events",
        "json_get_float": f"select event_id, try_cast({jx} as double) as kf from events",
        "json_get_str": (
            "select event_id, case when json_type(props,'$.k') = 'VARCHAR' "
            "then json_extract_string(props,'$.k') end as ks from events"
        ),
        "json_get_bool": (
            "select event_id, case when json_type(props,'$.k') = 'BOOLEAN' "
            "then try_cast(json_extract(props,'$.k') as boolean) end as kb from events"
        ),
        "json_as_text": (
            "select event_id, json_extract_string(props,'$.k') as kt from events"
        ),
        "json_get_json": (
            f"select event_id, {jx}::varchar as kraw from events"
        ),
        "json_contains": (
            "select event_id, json_type(props,'$.k') is not null as has_k, "
            "json_type(props,'$.missing') is not null as has_missing from events"
        ),
        "json_length": (
            "select event_id, case "
            "when json_valid(props) and json_type(props) = 'OBJECT' then len(json_keys(props)) "
            "when json_valid(props) and json_type(props) = 'ARRAY' then json_array_length(props) "
            "end::bigint as n_keys from events"
        ),
        "json_object_keys": (
            "select event_id, array_to_string(json_keys(props), ',') as keys_csv "
            "from events"
        ),
        "json_get_int_variant": (
            f"select event_id, try_cast({jx} as bigint) as k from events"
        ),
        "json_as_text_native": (
            "select event_id, json_extract_string(props,'$.k') as kt from events"
        ),
        "json_json_variant": (
            f"select l_orderkey, l_linenumber, "
            f"json_extract({nested}, '$.a')::varchar as a_json, "
            f"json_extract({nested}, '$.a.b')::varchar as b_json, "
            f"len(json_keys({nested}, '$.a'))::bigint as a_len, "
            f"json_array_length({nested}, '$.a.b')::bigint as b_len "
            f"from lineitem"
        ),
        "get_array_variant": (
            f"select l_orderkey, l_linenumber, "
            f"json_extract({nested}, '$.a.b[0]')::varchar || '|' || "
            f"json_extract({nested}, '$.a.b[1]')::varchar as b_elems, "
            f"array_to_string(json_keys({nested}, '$.a'), '|') as a_keys "
            f"from lineitem"
        ),
        "video_features": (
            # closed-form twin of the planted AVI fixture: frame i of
            # doc d is solid (d*37+11i, d*59+23i, d*83+41i) % 256, so
            # every 4x4-luma-grid cell equals the Rec.601 luma of that
            # color; identical double arithmetic on both engines
            "with v as (select doc_id, unnest(range((doc_id % 4) + 1)) as i "
            "from documents where doc_id < 40) "
            "select doc_id as media_id, (i * 1000)::bigint as frame_ts_ms, "
            "round((0.299 * ((doc_id * 37 + i * 11) % 256) "
            "+ 0.587 * ((doc_id * 59 + i * 23) % 256) "
            "+ 0.114 * ((doc_id * 83 + i * 41) % 256)) / 255.0, 6) as f0 "
            "from v"
        ),
        "union_roundtrip_variant": (
            # variant tier re-serializes: minified a_text (the exact
            # twin union_roundtrip reconstructs the RAW spaced text)
            "select l_orderkey, l_linenumber, "
            "'{\"b\":[' || (l_orderkey % 10) || ',{\"c\":\"' || l_returnflag "
            "|| '\"}]}' as a_text, "
            "true as d_is_null, false as a_is_null from lineitem"
        ),
        "union_variant": (
            # minified object arm matches DuckDB's json_extract
            # rendering (same envelope as json_json_variant); JSON-null
            # $.d is a whole-struct NULL so its type_id reads SQL NULL
            f"select l_orderkey, l_linenumber, "
            f"6 as a_tid, json_extract({nested}, '$.a')::varchar as a_obj, "
            f"2 as b0_tid, (l_orderkey % 10)::bigint as b0_int, "
            f"l_returnflag as flag, NULL::int as d_tid "
            f"from lineitem"
        ),
        "json_contains_variant": (
            f"select l_orderkey, l_linenumber, "
            f"json_type({nested}, '$.d') is not null as has_d, "
            f"json_type({nested}, '$.a.x') is not null as has_ax, "
            f"json_type({nested}, '$.a.b[1]') is not null as has_ab1, "
            f"json_type({nested}, '$.a.b[2]') is not null as has_ab2 "
            f"from lineitem"
        ),
        "json_as_text_variant": (
            f"select l_orderkey, l_linenumber, "
            f"json_extract_string({nested}, '$.a.b[1].c') as flag, "
            f"json_extract_string({nested}, '$.a.b[0]') as b0, "
            f"json_extract_string({nested}, '$.d') as d_txt, "
            f"json_extract({nested}, '$.a')::varchar as a_txt "
            f"from lineitem"
        ),
        "json_agg": (
            "select event_type, sum(try_cast(json_extract(props,'$.k') as bigint))::bigint as sum_k, "
            "count(*) as n from events "
            "where json_type(props,'$.k') is not null group by event_type"
        ),
        # identical twin for the variant-tier flagship: present-'k'
        # filter + int extraction agree across tiers on this data
        # (props.k values are JSON ints; variant's extra string
        # coercions never fire)
        "json_agg_variant": (
            "select event_type, sum(try_cast(json_extract(props,'$.k') as bigint))::bigint as sum_k, "
            "count(*) as n from events "
            "where json_type(props,'$.k') is not null group by event_type"
        ),
        "nested_get_int": (
            f"select l_orderkey, l_linenumber, "
            f"try_cast(json_extract({nested}, '$.a.b[0]') as bigint) as b0 from lineitem"
        ),
        "nested_get_str": (
            f"select l_orderkey, l_linenumber, "
            f"json_extract_string({nested}, '$.a.b[1].c') as flag from lineitem"
        ),
        "nested_contains": (
            f"select l_orderkey, l_linenumber, "
            f"json_type({nested}, '$.d') is not null as has_d, "
            f"json_type({nested}, '$.a.x') is not null as has_ax, "
            f"json_type({nested}, '$.a.b[1]') is not null as has_ab1, "
            f"json_type({nested}, '$.a.b[2]') is not null as has_ab2 from lineitem"
        ),
        "nested_length_keys": (
            f"select l_orderkey, l_linenumber, "
            f"json_array_length({nested}, '$.a.b')::bigint as len_ab, "
            f"array_to_string(json_keys({nested}), ',') as keys_csv from lineitem"
        ),
        "nested_as_text_null": (
            f"select l_orderkey, l_linenumber, "
            f"json_extract_string({nested}, '$.d') as d_text, "
            f"'null' as d_raw from lineitem"
        ),
        "json_explode": (
            # planted 3-element array, enumerated closed-form with
            # 1-based ordinality: '"x"', the digit, literal 'null'
            "select l_orderkey, l_linenumber, u.pos::int as pos, "
            "u.elem from lineitem cross join lateral ("
            "select * from (values "
            "(1, '\"x\"'), "
            "(2, (l_orderkey % 10)::varchar), "
            "(3, 'null')) as t(pos, elem)) u"
        ),
        "get_array_csv": (
            "select l_orderkey, l_linenumber, "
            "'\"x\"|' || (l_orderkey % 10) || '|null' as elems, "
            "3::bigint as n_elems from lineitem"
        ),
        "operator_chain": (
            f"select l_orderkey, l_linenumber, "
            f"try_cast(json_extract({nested}, '$.a.b[0]') as bigint) as b0, "
            f"json_extract_string({nested}, '$.d') as d_text from lineitem"
        ),
        "multi_extract": (
            f"select l_orderkey, l_linenumber, "
            f"try_cast(json_extract({nested}, '$.a.b[0]') as bigint) as b0, "
            f"json_extract_string({nested}, '$.a.b[1].c') as flag, "
            f"json_extract_string({nested}, '$.d') as d_text, "
            f"json_array_length({nested}, '$.a.b')::bigint as len_ab, "
            f"json_type({nested}, '$.d') is not null as has_d from lineitem"
        ),
        # identical twin for the variant tier: every field here sits
        # inside the variant envelope (no floats/containers re-encoded)
        # closed-form twin of the planted solid-color PPM: every
        # luma-grid cell of doc d equals Rec.601 luma of
        # (29d, 47d+5, 71d+9) % 256
        "media_features": (
            "select doc_id as media_id, 16 as height, 16 as width, "
            "3 as channels, "
            "round((0.299 * ((doc_id * 29) % 256) "
            "+ 0.587 * ((doc_id * 47 + 5) % 256) "
            "+ 0.114 * ((doc_id * 71 + 9) % 256)) / 255.0, 6) as f0 "
            "from documents where doc_id < 50"
        ),
        "multi_extract_variant": (
            f"select l_orderkey, l_linenumber, "
            f"try_cast(json_extract({nested}, '$.a.b[0]') as bigint) as b0, "
            f"json_extract_string({nested}, '$.a.b[1].c') as flag, "
            f"json_extract_string({nested}, '$.d') as d_text, "
            f"json_array_length({nested}, '$.a.b')::bigint as len_ab, "
            f"json_type({nested}, '$.d') is not null as has_d from lineitem"
        ),
        "union_roundtrip": (
            # our a_text preserves the document's RAW bytes (spacing
            # included — reference behavior); duckdb's json_extract
            # minifies, so the oracle rebuilds the raw text directly
            "select l_orderkey, l_linenumber, "
            "'{\"b\": [' || (l_orderkey % 10) || ', {\"c\": \"' || l_returnflag "
            "|| '\"}]}' as a_text, "
            "true as d_is_null, false as a_is_null from lineitem"
        ),
        "from_scalar": (
            "select o_orderkey, to_json(o_orderkey)::varchar as k_json, "
            "to_json(o_orderpriority)::varchar as prio_json from orders"
        ),
        "column_key": (
            "select event_id, case when event_type = 'click' "
            "then try_cast(json_extract(props,'$.k') as bigint) end as dyn from events"
        ),
        "json_setops": (
            "with ks as (select event_id, "
            "try_cast(json_extract(props, '$.k') as bigint) as k "
            "from events) "
            "select event_id from ks where k % 2 = 0 "
            "intersect select event_id from ks where k >= 20 "
            "except all select event_id from ks where k % 10 = 0"
        ),
        "sql_params": (
            "select event_id, "
            "try_cast(json_extract(props, '$.k') as bigint) as kv "
            "from events "
            "where try_cast(json_extract(props, '$.k') as bigint) >= 90"
        ),
        "sql_operators": (
            "select event_id, json_extract_string(props,'$.k') as kt, "
            "json_type(props,'$.k') is not null as has_k from events"
        ),
        "tpch_q1": (
            "select l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) as sum_qty, "
            "round(sum(l_extendedprice), 2) as sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) as sum_disc_price, "
            "count(*) as count_order "
            "from lineitem where l_shipdate <= timestamp '1998-09-02' "
            "group by l_returnflag, l_linestatus"
        ),
        "events_hourly": (
            "select time_bucket(interval 1 hour, ts)::timestamp as hour_start, "
            "event_type, count(*) as n, round(sum(value), 4) as sum_value "
            "from events group by 1, 2"
        ),
        "events_sliding": (
            "select (time_bucket(interval 15 minutes, ts) "
            "- j.j * interval 15 minutes)::timestamp as win_start, "
            "event_type, count(*) as n, round(sum(value), 4) as sum_value "
            "from events cross join "
            "(select unnest(generate_series(0, 3)) as j) j "
            "group by 1, 2"
        ),
        "events_rollup": (
            "select event_type, ts::date as day, count(*) as n, "
            "round(sum(value), 4) as sum_value "
            "from events group by rollup(event_type, day)"
        ),
        "orders_join": (
            "select o_orderpriority, count(*) as n_orders, "
            "round(sum(o_totalprice), 2) as total "
            "from orders join customer on o_custkey = c_custkey "
            "group by o_orderpriority"
        ),
        "salted_join": (
            "select c_mktsegment, count(*) as n, min(o_orderkey) as min_key "
            "from orders join customer on o_custkey = c_custkey "
            "group by c_mktsegment"
        ),
        "dedup_exact": (
            "select text, count(*) as dup_count, min(doc_id) as min_id "
            "from documents group by text having count(*) > 1"
        ),
        "dedup_stats": (
            "select count(*) as n, count(distinct text) as n_distinct from documents"
        ),
        "token_count": (
            f"select doc_id, len({_TOKENS_SQL})::int as n_tokens from documents"
        ),
        "quality": (
            f"select doc_id, length(text)::int as n_chars, "
            f"len({_TOKENS_SQL})::int as n_tokens, "
            f"round(len(list_distinct({_TOKENS_SQL})) / "
            f"greatest(len({_TOKENS_SQL}), 1)::double, 6) as distinct_ratio "
            f"from documents"
        ),
        "lang_id": (
            "with scores as (select doc_id, "
            + ", ".join(
                f"len(list_intersect(list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t != '')), {_STOP_SQL[lang]})) as s_{lang}"
                for lang in sorted(text.STOPWORDS)
            )
            + " from documents) select doc_id, case "
            "when s_de = 0 and s_en = 0 and s_es = 0 and s_fr = 0 then 'und' "
            "when s_fr >= s_es and s_fr >= s_en and s_fr >= s_de then 'fr' "
            "when s_es >= s_en and s_es >= s_de then 'es' "
            "when s_en >= s_de then 'en' else 'de' end as lang from scores"
        ),
        "fingerprint": (
            # same rolling hash: acc = (acc*1000003 + code(tok)) % (2^31-1),
            # code = len*131 + ascii(first)*31 + ascii(last)
            f"select doc_id, list_reduce(list_prepend(0::bigint, "
            f"list_transform({_TOKENS_SQL}, t -> "
            f"(length(t)*131 + ascii(t)*31 + ascii(reverse(t))) % 2147483647)), "
            f"(a, b) -> (a * 1000003 + b) % 2147483647) as fp from documents"
        ),
        "jaccard_adjacent": (
            "with toks as (select doc_id, "
            f"list_distinct({_TOKENS_SQL}) as tk from documents) "
            "select a.doc_id as id_a, "
            "round(case when len(list_distinct(list_concat(a.tk, b.tk))) > 0 "
            "then len(list_intersect(a.tk, b.tk)) / "
            "len(list_distinct(list_concat(a.tk, b.tk)))::double else 0.0 end, 6) as jaccard "
            "from toks a join toks b on b.doc_id = a.doc_id + 1"
        ),
        "cosine_topk": (
            "with q as (select embedding::DOUBLE[] as qv from embeddings where vec_id = 0) "
            "select vec_id, round("
            "list_dot_product(embedding::DOUBLE[], qv) / "
            "(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) * "
            "sqrt(list_dot_product(qv, qv))), 6) as cosine "
            "from embeddings, q order by cosine desc, vec_id asc limit 10"
        ),
        "media_meta": (
            "select doc_id as media_id, octet_length(encode(text))::int as payload_bytes "
            "from documents"
        ),
        "audio_features": (
            "select doc_id as media_id, "
            "case when octet_length(encode(text)) % 2 = 1 then 16000 "
            "else 44100 end::int as sample_rate, "
            "(octet_length(encode(text)) // 2)::bigint as n_samples "
            "from documents"
        ),
        "curation": (
            curated_ctes + " select doc_id, lang, n_tokens from curated"
        ),
        "training_prep": (
            curated_ctes + ", "
            f"tk as (select doc_id, {_TOKENS_SQL} as tkl from curated), "
            "idx as (select doc_id, tkl, "
            "unnest(generate_series(1, greatest(len(tkl) - 16, 1), 48)) as st "
            "from tk where len(tkl) > 0), "
            "ch as (select doc_id, ((st - 1) // 48)::int as chunk_id, "
            "st::int as tok_start, "
            "len(list_slice(tkl, st, st + 63))::bigint as n_tokens from idx), "
            "lab as (select ch.*, case when b < 0.9 then 'train' "
            "when b < 0.95 then 'val' else 'test' end as split from "
            "(select ch.*, try_cast(('0x' || substr(md5('r2:' || "
            "doc_id::varchar), 1, 8)) as bigint) / 4294967296.0 as b "
            "from ch) ch), "
            "sh as (select doc_id, chunk_id, tok_start, n_tokens, split, "
            "split || '#' || (doc_id % 4)::varchar as shard from lab), "
            "cb as (select *, coalesce(sum(n_tokens) over ("
            "partition by shard order by doc_id, chunk_id "
            "rows between unbounded preceding and 1 preceding), 0)::bigint "
            "as cbv from sh) "
            "select doc_id, chunk_id, tok_start, n_tokens, split, shard, "
            "(cbv // 512)::bigint as batch_id from cb"
        ),
        "asof_join": (
            "select e.event_id, e.user_id, o.o_orderdate as last_order_ts "
            "from events e asof left join orders o "
            "on e.user_id = o.o_custkey and e.ts >= o.o_orderdate"
        ),
        "range_join": (
            "with iv as (select event_id as anchor_id, user_id, ts as s, "
            "ts + interval 5 minute as e from events where event_type = 'error') "
            "select iv.anchor_id, count(*) as n_in_window "
            "from iv join events p on p.user_id = iv.user_id "
            "and p.ts >= iv.s and p.ts < iv.e "
            "group by iv.anchor_id"
        ),
        "top_tokens": (
            f"with ex as (select doc_id, unnest({_TOKENS_SQL}) as token "
            "from documents) "
            "select token, count(*) as tf, count(distinct doc_id) as dfreq "
            "from ex group by token order by tf desc, token asc limit 50"
        ),
        "sessionize_batch": (
            "with e as (select user_id as user, "
            "epoch_ns(ts) // 1000000000 as s from events), "
            "g as (select user, s, case when lag(s) over "
            "(partition by user order by s) is null or "
            "s - lag(s) over (partition by user order by s) > 600 "
            "then 1 else 0 end as ns from e), "
            "x as (select user, s, sum(ns) over (partition by user "
            "order by s rows between unbounded preceding and current row"
            ")::bigint as session_idx from g) "
            "select user, session_idx, count(*) as n_events, "
            "min(s) as start_s, max(s) as end_s "
            "from x group by user, session_idx"
        ),
        "pii_report": (
            # same planted PII on every 3rd doc; per-source conditional
            # aggregate mirrors pii_report's single-pass shape
            "with p as (select source, case when doc_id % 3 = 0 then "
            "text || ' contact user' || doc_id::varchar || '@example.com "
            "at 10.0.' || (doc_id % 256)::varchar || '.7' else text end "
            "as t from documents), "
            "c as (select source, "
            "len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) as e, "
            "len(regexp_extract_all(t, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) as i, "
            "len(regexp_extract_all(t, '\\+?\\d[\\d\\- ]{7,}\\d')) as ph "
            "from p) "
            "select source, count(*) as n_docs, "
            "sum(case when e > 0 or i > 0 or ph > 0 then 1 else 0 end)"
            "::bigint as docs_affected, "
            "sum(e)::bigint as email_n, sum(i)::bigint as ipv4_n, "
            "sum(ph)::bigint as phone_n from c group by source"
        ),
        "pii_redact": (
            "with p as (select doc_id, text || ' contact user' || "
            "doc_id::varchar || '@example.com at 10.0.' || "
            "(doc_id % 256)::varchar || '.7' as t from documents) "
            "select doc_id, "
            r"regexp_replace(regexp_replace(regexp_replace(t, "
            r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            r"'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'), "
            r"'\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g') as redacted, "
            r"len(regexp_extract_all(t, "
            r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::int as email_n, "
            r"len(regexp_extract_all(t, "
            r"'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::int as ipv4_n, "
            r"len(regexp_extract_all(t, '\+?\d[\d\- ]{7,}\d'))::int as phone_n "
            "from p"
        ),
        "percentiles": (
            "select l_returnflag, "
            "round(quantile_cont(l_extendedprice, 0.5), 4) as p50, "
            "round(quantile_cont(l_extendedprice, 0.9), 4) as p90, "
            "round(avg(l_extendedprice), 4) as mean, count(*) as n "
            "from lineitem group by l_returnflag"
        ),
        "repetition": (
            "with p as (select doc_id, case when doc_id % 3 = 0 then "
            "text || chr(10) || 'Repeated boilerplate line.' || chr(10) || "
            "'Repeated boilerplate line.' || chr(10) || 'Unique tail ' || "
            "doc_id::varchar else text end as t from documents), "
            "l as (select doc_id, list_filter(list_transform("
            "string_split(t, chr(10)), x -> trim(x)), x -> x <> '') as ls "
            "from p), "
            "m as (select doc_id, ls, list_distinct(ls) as ds, "
            "coalesce(list_sum(list_transform(ls, x -> length(x))), 0) as ch, "
            "coalesce(list_sum(list_transform(list_distinct(ls), "
            "x -> length(x))), 0) as dch from l) "
            "select doc_id, len(ls)::int as n_lines, "
            "round((len(ls) - len(ds)) / greatest(len(ls), 1), 6) "
            "as dup_line_frac, "
            "round((ch - dch) / greatest(ch, 1), 6) as dup_line_char_frac "
            "from m"
        ),
        "domains": (
            "with p as (select doc_id, text || ' see https://Site' || "
            "(doc_id % 7)::varchar || "
            "'.example.org/page and HTTP://cdn.example.net/x' as t "
            "from documents), "
            "ex as (select doc_id, lower(unnest(regexp_extract_all(t, "
            "'[Hh][Tt][Tt][Pp][Ss]?://([A-Za-z0-9.-]+)', 1))) as domain from p) "
            "select domain, count(*) as n_urls, "
            "count(distinct doc_id) as n_docs from ex group by domain"
        ),
        "url_canon": (
            # closed-form EXPECTED canonicals for the two planted messy
            # templates — independent derivation, not an op mirror:
            # even ids: scheme/host lowered, www + :443 stripped, path
            # case kept, trailing / dropped, tracking params dropped,
            # survivors sorted; odd ids: :80 stripped, 'referrer' kept
            # ('ref' matches exact-key only), params sorted
            "select doc_id, case when doc_id % 2 = 0 then "
            "'https://example' || (doc_id % 5)::varchar || '.com/Path' || "
            "(doc_id % 3)::varchar || '?a=1&b=2' "
            "else 'http://mirror' || (doc_id % 5)::varchar || "
            "'.example.org/q/deep?referrer=keep&z=1' end as canon_url "
            "from documents"
        ),
        "top_events_per_type": (
            "select event_type, event_id, value, rk::int as rk from ("
            "select event_type, event_id, value, row_number() over ("
            "partition by event_type order by value desc nulls last, "
            "event_id asc) as rk from events) t where rk <= 3"
        ),
        "gopher_filter": (
            # same planted per-rule deformations (doc_id % 6), then the
            # Gopher A1.1 gates rule-for-rule over the same token/line
            # arrays the Spark expressions fold
            "with p as (select doc_id, case doc_id % 6 "
            "when 0 then text || chr(10) || 'Same boilerplate footer line.' "
            "|| chr(10) || 'Same boilerplate footer line.' "
            "when 1 then '• Home' || chr(10) || '• Products' || chr(10) || "
            "'• About the company' || chr(10) || '• Contact and support' "
            "when 2 then text || chr(10) || 'Read more...' || chr(10) || "
            "'Click to continue...' || chr(10) || 'Story develops...' "
            "when 3 then text || chr(10) || repeat('#', 60) "
            "when 4 then 'the of ' || array_to_string(list_transform("
            "generate_series(1, 60), i -> '4' || i::varchar || '2'), ' ') "
            "else text end as t from documents), "
            "w as (select doc_id, t, "
            "list_filter(regexp_split_to_array(trim(t), '\\s+'), "
            "x -> x != '') as toks, "
            "list_filter(list_transform(string_split(t, chr(10)), "
            "x -> trim(x)), x -> x <> '') as ls from p), "
            "m as (select doc_id, len(toks) as nw, "
            "coalesce(list_sum(list_transform(toks, x -> length(x))), 0) "
            "/ greatest(len(toks), 1) as mean_len, "
            "(length(t) - length(replace(t, '#', '')) "
            "+ len(regexp_extract_all(t, '\\.\\.\\.|…'))) "
            "/ greatest(len(toks), 1) as sym_ratio, "
            "len(list_filter(ls, x -> regexp_matches(x, "
            "'^([•\\-\\*•]|\\d+[.)])\\s'))) / greatest(len(ls), 1) "
            "as bullet_frac, "
            "len(list_filter(ls, x -> regexp_matches(x, '(\\.\\.\\.|…)$'))) "
            "/ greatest(len(ls), 1) as ell_frac, "
            "len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) "
            "/ greatest(len(toks), 1) as alpha_frac, "
            "len(list_intersect(list_distinct(list_transform(toks, "
            "x -> lower(x))), ['the','be','to','of','and','that','have',"
            "'with'])) as n_stop, "
            "round((len(ls) - len(list_distinct(ls))) "
            "/ greatest(len(ls), 1), 6) as dl_frac, "
            "round((coalesce(list_sum(list_transform(ls, x -> length(x))), 0) "
            "- coalesce(list_sum(list_transform(list_distinct(ls), "
            "x -> length(x))), 0)) / greatest(coalesce(list_sum("
            "list_transform(ls, x -> length(x))), 0), 1), 6) as dc_frac "
            "from w) "
            "select doc_id, "
            "(nw >= 20 and nw <= 100000) as word_count_ok, "
            "(mean_len >= 3.0 and mean_len <= 10.0) as mean_word_len_ok, "
            "(sym_ratio <= 0.1) as symbol_ratio_ok, "
            "(bullet_frac <= 0.9) as bullet_ok, "
            "(ell_frac <= 0.3) as ellipsis_ok, "
            "(alpha_frac >= 0.8) as alpha_word_ok, "
            "(n_stop >= 1) as stopword_ok, "
            "(dl_frac <= 0.3) as dup_line_ok, "
            "(dc_frac <= 0.2) as dup_char_ok, "
            "((nw >= 20 and nw <= 100000) and (mean_len >= 3.0 and "
            "mean_len <= 10.0) and (sym_ratio <= 0.1) and "
            "(bullet_frac <= 0.9) and (ell_frac <= 0.3) and "
            "(alpha_frac >= 0.8) and (n_stop >= 1) and (dl_frac <= 0.3) "
            "and (dc_frac <= 0.2)) as keep from m"
        ),
        "audio_fingerprint": (
            # closed-form twin of the two-half WAV fixture
            "select doc_id as media_id, 8000 as sample_rate, "
            "1600::bigint as n_samples, "
            "case when ((doc_id * 3) % 8) * 1000 + 500 > "
            "(doc_id % 8) * 1000 + 500 then 128 else 0 end as fingerprint "
            "from documents where doc_id < 60"
        ),
        "pack_positions": (
            f"with t as (select doc_id, len({_TOKENS_SQL})::bigint as nt, "
            "(doc_id % 8)::int as shard from documents), "
            "c as (select doc_id, shard, nt, coalesce(sum(nt) over ("
            "partition by shard order by doc_id "
            "rows between unbounded preceding and 1 preceding), 0)::bigint "
            "as cb from t) "
            "select doc_id, shard, (cb // 2000)::bigint as batch_id, "
            "(cb % 2000)::bigint as seq_start, "
            "(cb % 2000 + nt)::bigint as seq_end from c"
        ),
        "curation_v2": _CURATION_V2_SQL,
        "curation_v3": (
            # v2 survivors re-sourced, then the same 10-per-source
            # quality cap (clf_score desc, doc_id asc) as cap_per_group
            f"with v2 as ({_CURATION_V2_SQL}), "
            "j as (select v2.doc_id, d.source, v2.n_tokens, v2.clf_score "
            "from v2 join documents d on d.doc_id = v2.doc_id), "
            "r as (select j.*, row_number() over (partition by source "
            "order by clf_score desc, doc_id asc) as rn from j) "
            "select doc_id, source, n_tokens, clf_score from r "
            "where rn <= 10"
        ),
        "corpus_report": (
            # full per-doc mirror (quality features, default-threshold
            # Gopher conjunction, 4-way stoplist language) then the
            # per-source means and the language-mix entropy
            "with f as (select source, doc_id, text, "
            f"{_TOKENS_SQL} as toks, "
            "list_filter(list_transform(string_split(text, chr(10)), "
            "x -> trim(x)), x -> x <> '') as ls from documents), "
            "d as (select source, doc_id, len(toks) as nt, "
            "length(text) as nc, "
            "length(text) / greatest(len(toks), 1) as mtl, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) "
            "/ greatest(length(text), 1) as ar, "
            "len(list_distinct(toks)) / greatest(len(toks), 1) as dr, "
            "case when "
            "(len(toks) >= 50 and len(toks) <= 100000) and "
            "(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) "
            "/ greatest(len(toks), 1) between 3.0 and 10.0) and "
            "((length(text) - length(replace(text, '#', '')) "
            "+ len(regexp_extract_all(text, '\\.\\.\\.|…'))) "
            "/ greatest(len(toks), 1) <= 0.1) and "
            "(len(list_filter(ls, x -> regexp_matches(x, "
            "'^([•\\-\\*•]|\\d+[.)])\\s'))) / greatest(len(ls), 1) <= 0.9) "
            "and (len(list_filter(ls, x -> regexp_matches(x, "
            "'(\\.\\.\\.|…)$'))) / greatest(len(ls), 1) <= 0.3) and "
            "(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) "
            "/ greatest(len(toks), 1) >= 0.8) and "
            "(len(list_intersect(list_distinct(list_transform(toks, "
            "x -> lower(x))), ['the','be','to','of','and','that','have',"
            "'with'])) >= 2) and "
            "(round((len(ls) - len(list_distinct(ls))) "
            "/ greatest(len(ls), 1), 6) <= 0.3) and "
            "(round((coalesce(list_sum(list_transform(ls, "
            "x -> length(x))), 0) - coalesce(list_sum(list_transform("
            "list_distinct(ls), x -> length(x))), 0)) / greatest("
            "coalesce(list_sum(list_transform(ls, x -> length(x))), 0), "
            "1), 6) <= 0.2) then 1 else 0 end as keep, "
            + "".join(
                f"len(list_intersect(list_distinct(list_filter("
                "regexp_split_to_array(trim(lower(text)), '\\s+'), "
                f"t -> t != '')), {_STOP_SQL[lang]})) as s_{lang}, "
                for lang in sorted(text.STOPWORDS)
            )
            + "1 as _one from f), "
            "dl as (select *, case "
            "when s_de = 0 and s_en = 0 and s_es = 0 and s_fr = 0 "
            "then 'und' "
            "when s_fr >= s_es and s_fr >= s_en and s_fr >= s_de "
            "then 'fr' "
            "when s_es >= s_en and s_es >= s_de then 'es' "
            "when s_en >= s_de then 'en' else 'de' end as lang from d), "
            "tot as (select source as \"group\", count(*)::bigint as "
            "n_docs, sum(nt)::bigint as total_tokens, "
            "round(avg(nt), 6) as mean_tokens, "
            "round(avg(mtl), 6) as mean_token_len, "
            "round(avg(ar), 6) as mean_alpha_ratio, "
            "round(avg(dr), 6) as mean_distinct_ratio, "
            "round(avg(keep), 6) as gopher_keep_rate from dl "
            "group by source), "
            "pl as (select source, lang, count(*) as n from dl "
            "group by source, lang), "
            "lt as (select source, sum(n) as t from pl group by source), "
            "ent as (select pl.source as \"group\", "
            "round(-sum((n / t) * ln(n / t)) + 0.0, 6) as lang_entropy "
            "from pl join lt using (source) group by pl.source) "
            "select tot.*, ent.lang_entropy from tot "
            "join ent using (\"group\")"
        ),
        "fuzzy_decontam": (
            # zero-miss pin: every planted near-copy must be dropped
            "select (select count(*) from documents where doc_id % 20 = 0)"
            "::bigint as n_planted, 0::bigint as planted_survivors"
        ),
        "quality_classifier": (
            # full feature-vector + sigmoid mirror of
            # text.quality_classifier_score's defaults
            "with f as (select doc_id, length(text) as n_chars, "
            f"len({_TOKENS_SQL}) as n_tokens, "
            f"len(list_distinct({_TOKENS_SQL})) as n_distinct, "
            "length(regexp_replace(text, '[^A-Za-z]', '', 'g')) as n_alpha, "
            "length(regexp_replace(text, "
            "'[^.,;:!?''\"()\\[\\]{}-]', '', 'g')) as n_punct, "
            "len(list_intersect(list_distinct(list_filter("
            "regexp_split_to_array(trim(lower(text)), '\\s+'), "
            f"t -> t != '')), {_STOP_SQL['en']})) as n_stop "
            "from documents), "
            "z as (select doc_id, -3.0 "
            "+ 0.4 * ln(1 + n_tokens) "
            "+ 0.1 * (n_chars / greatest(n_tokens, 1)) "
            "+ 2.0 * (n_alpha / greatest(n_chars, 1)) "
            "- 1.0 * (n_punct / greatest(n_chars, 1)) "
            "+ 1.5 * (n_stop / greatest(n_tokens, 1)) "
            "+ 1.0 * (n_distinct / greatest(n_tokens, 1)) as zz from f) "
            "select doc_id, round(1.0 / (1.0 + exp(-zz)), 6) as clf_score "
            "from z"
        ),
        "top_ngram": (
            # same planted phrase; (count, gram) struct max mirrors the
            # Spark tie-break; covered chars = cnt * (len(gram) - 1)
            # (one joiner space per bigram)
            "with p as (select doc_id, case when doc_id % 4 = 0 then "
            "text || ' click here now click here now click here now "
            "click here now click here now click here now click here "
            "now click here now' else text end as t from documents), "
            "w as (select doc_id, list_filter(regexp_split_to_array("
            "trim(t), '\\s+'), x -> x != '') as toks from p), "
            "ex as (select doc_id, unnest(list_transform("
            "generate_series(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i + 1])) as gram "
            "from w where len(toks) >= 2), "
            "c as (select doc_id, gram, count(*) as cnt from ex "
            "group by doc_id, gram), "
            "best as (select doc_id, cnt, gram from (select doc_id, cnt, "
            "gram, row_number() over (partition by doc_id "
            "order by cnt desc, gram desc) as rn from c) where rn = 1) "
            "select w.doc_id, case when len(w.toks) < 2 then 0.0 else "
            "least(1.0, round(best.cnt * (length(best.gram) - 1) / greatest("
            "coalesce(list_sum(list_transform(w.toks, x -> length(x))), "
            "0), 1), 6)) end as top2gram_frac "
            "from w left join best using (doc_id)"
        ),
        "curriculum": (
            f"with s as (select doc_id, len({_TOKENS_SQL})::int as "
            "n_tokens from documents) "
            "select doc_id, n_tokens, row_number() over ("
            "order by n_tokens, doc_id)::bigint as curriculum_rank from s"
        ),
        "pretoken_count": (
            # same planted punctuation; the pattern sits in the
            # Java-regex ∩ RE2 subset so both engines segment
            # identically
            "with p as (select doc_id, case when doc_id % 4 = 0 then "
            "text || ' it''s 42 miles, (probably!) -- they''ll know...' "
            "else text end as t from documents) "
            "select doc_id, "
            f"len(list_filter(regexp_split_to_array(trim(t), '\\s+'), "
            "x -> x != ''))::int as n_ws_tokens, "
            "len(regexp_extract_all(t, "
            "'''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
            "| ?[^A-Za-z0-9\\s]+|\\s+'))::int as n_pretokens from p"
        ),
        "tpch_q7": (
            "select supp_nation, cust_nation, l_year, "
            "round(sum(volume), 4) as revenue from ("
            "select n1.n_name as supp_nation, n2.n_name as cust_nation, "
            "year(l_shipdate)::int as l_year, "
            "l_extendedprice * (1 - l_discount) as volume "
            "from supplier join lineitem on s_suppkey = l_suppkey "
            "join orders on o_orderkey = l_orderkey "
            "join customer on c_custkey = o_custkey "
            "join nation n1 on s_nationkey = n1.n_nationkey "
            "join nation n2 on c_nationkey = n2.n_nationkey "
            "where ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2') "
            "or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1')) "
            "and l_shipdate >= timestamp '1996-01-01' "
            "and l_shipdate < timestamp '1998-01-01') shipping "
            "group by supp_nation, cust_nation, l_year"
        ),
        "tpch_q8": (
            "select o_year, round(sum(case when nation = 'NATION_5' "
            "then volume else 0 end) / sum(volume), 6) as mkt_share from ("
            "select year(o_orderdate)::int as o_year, "
            "l_extendedprice * (1 - l_discount) as volume, "
            "n2.n_name as nation "
            "from part join lineitem on p_partkey = l_partkey "
            "join supplier on s_suppkey = l_suppkey "
            "join orders on l_orderkey = o_orderkey "
            "join customer on o_custkey = c_custkey "
            "join nation n1 on c_nationkey = n1.n_nationkey "
            "join region on n1.n_regionkey = r_regionkey "
            "join nation n2 on s_nationkey = n2.n_nationkey "
            "where r_name = 'ASIA' and p_type = 'ECONOMY' "
            "and o_orderdate >= timestamp '1996-01-01' "
            "and o_orderdate < timestamp '1998-01-01') all_nations "
            "group by o_year"
        ),
        "normalized_dedup": (
            # same planted variants + the same fold→lower→punct→ws
            # normalization chain (note DuckDB regexp_replace needs the
            # explicit 'g' flag Spark applies implicitly)
            "with b as (select doc_id, text from documents "
            "union all select doc_id + 100000, upper(text) "
            "from documents where doc_id % 3 = 0 "
            "union all select doc_id + 200000, "
            "'  ' || replace(text, 'a', 'á') || '  !!' "
            "from documents where doc_id % 5 = 0), "
            "k as (select doc_id, md5(trim(regexp_replace("
            "regexp_replace(lower(translate(text, "
            "'àáâãäåèéêëìíîïòóôõöùúûüýÿñçÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÝÑÇšžŠŽ', "
            "'aaaaaaeeeeiiiiooooouuuuyyncAAAAAAEEEEIIIIOOOOOUUUUYNCszSZ')), "
            "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) as nkey "
            "from b) "
            "select nkey, count(*)::bigint as n, "
            "string_agg(doc_id, ',' order by doc_id) as members "
            "from k group by nkey having count(*) > 1"
        ),
        "image_dhash": (
            # closed-form twin of the two-tone fixture: per row the only
            # gradient bit is the half boundary, set iff lumaB > lumaA
            "select doc_id as media_id, case when "
            "0.299 * (((doc_id % 8) * 17 + 11) % 256) "
            "+ 0.587 * (((doc_id % 8) * 43 + 29) % 256) "
            "+ 0.114 * (((doc_id % 8) * 97 + 59) % 256) > "
            "0.299 * (((doc_id % 8) * 31) % 256) "
            "+ 0.587 * (((doc_id % 8) * 53 + 7) % 256) "
            "+ 0.114 * (((doc_id % 8) * 89 + 3) % 256) "
            "then 578721382704613384 else 0 end as dhash "
            "from documents where doc_id < 60"
        ),
        "tpch_q2": (
            f"with {_PARTSUPP_SQL}, "
            "eu as (select n_nationkey, n_name from nation "
            "join region on n_regionkey = r_regionkey "
            "where r_name = 'EUROPE'), "
            "offers as (select ps_partkey, ps_supplycost, s_acctbal, "
            "s_name, n_name from partsupp "
            "join part on ps_partkey = p_partkey "
            "join supplier on ps_suppkey = s_suppkey "
            "join eu on s_nationkey = n_nationkey "
            "where p_size <= 15 and p_type = 'LARGE'), "
            "mins as (select ps_partkey as pk, min(ps_supplycost) as minc "
            "from offers group by ps_partkey) "
            "select s_acctbal, s_name, n_name, ps_partkey from offers "
            "join mins on ps_partkey = pk and ps_supplycost = minc "
            "order by s_acctbal desc, n_name, s_name, ps_partkey limit 100"
        ),
        "tpch_q11": (
            f"with {_PARTSUPP_SQL}, "
            "mine as (select ps_partkey, ps_supplycost * ps_availqty as v "
            "from partsupp join supplier on ps_suppkey = s_suppkey "
            "join nation on s_nationkey = n_nationkey "
            "where n_name = 'NATION_3') "
            "select ps_partkey, round(sum(v), 2) as value from mine "
            "group by ps_partkey "
            "having round(sum(v), 2) > (select sum(v) * 0.002 from mine)"
        ),
        "tpch_q20": (
            f"with {_PARTSUPP_SQL}, "
            "qty as (select l_partkey, l_suppkey, sum(l_quantity) as q "
            "from lineitem where l_shipdate >= timestamp '1996-01-01' "
            "and l_shipdate < timestamp '1997-01-01' "
            "group by l_partkey, l_suppkey), "
            "excess as (select distinct ps_suppkey from partsupp "
            "join part on ps_partkey = p_partkey "
            "join qty on ps_partkey = l_partkey and ps_suppkey = l_suppkey "
            "where p_name like 'red%' and ps_availqty > 0.5 * q) "
            "select s_suppkey, s_name from supplier "
            "join nation on s_nationkey = n_nationkey "
            "where n_name = 'NATION_2' "
            "and s_suppkey in (select ps_suppkey from excess)"
        ),
        "tpch_q21": (
            "with j as (select o_orderkey, l_suppkey, "
            "l_shipdate > o_orderdate + interval 90 day as late "
            "from lineitem join orders on l_orderkey = o_orderkey "
            "where o_orderstatus = 'F'), "
            "ostats as (select o_orderkey, "
            "count(distinct l_suppkey) as ns, "
            "count(distinct case when late then l_suppkey end) as nl "
            "from j group by o_orderkey), "
            "waiting as (select distinct j.o_orderkey, j.l_suppkey "
            "from j join ostats using (o_orderkey) "
            "where j.late and ns > 1 and nl = 1) "
            "select s_name, count(distinct o_orderkey) as numwait "
            "from waiting join supplier on l_suppkey = s_suppkey "
            "join nation on s_nationkey = n_nationkey "
            "where n_name = 'NATION_1' "
            "group by s_name order by numwait desc, s_name limit 100"
        ),
        "tpch_q9": (
            "select nation, o_year, round(sum(amount), 4) as sum_profit "
            "from (select n_name as nation, "
            "year(o_orderdate)::int as o_year, "
            "l_extendedprice * (1 - l_discount) "
            "- 0.6 * p_retailprice * l_quantity as amount "
            "from part join lineitem on p_partkey = l_partkey "
            "join supplier on s_suppkey = l_suppkey "
            "join orders on o_orderkey = l_orderkey "
            "join nation on s_nationkey = n_nationkey "
            "where p_name like '%red%') profit "
            "group by nation, o_year"
        ),
        "tpch_q16": (
            "with ps as (select distinct l_partkey, l_suppkey "
            "from lineitem) "
            "select p_brand, p_type, p_size, "
            "count(distinct l_suppkey) as supplier_cnt "
            "from ps join part on p_partkey = l_partkey "
            "where p_brand <> 'Brand#1' and p_size <= 10 "
            "group by p_brand, p_type, p_size"
        ),
        "tpch_q15": (
            "with revenue as (select l_suppkey as supplier_no, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) "
            "as total_revenue from lineitem "
            "where l_shipdate >= timestamp '1996-01-01' "
            "and l_shipdate < timestamp '1996-04-01' group by l_suppkey) "
            "select s_suppkey, s_name, total_revenue "
            "from supplier join revenue on s_suppkey = supplier_no "
            "where total_revenue = (select max(total_revenue) from revenue)"
        ),
        "tpch_q19": (
            "select round(sum(l_extendedprice * (1 - l_discount)), 4) "
            "as revenue from lineitem join part on p_partkey = l_partkey "
            "where (p_brand = 'Brand#1' and l_quantity between 1 and 11) "
            "or (p_brand = 'Brand#2' and l_quantity between 10 and 20) "
            "or (p_brand = 'Brand#3' and l_quantity between 20 and 30)"
        ),
        "temperature_sample": (
            # same α-share targets (round-to-9 before floor pins pow
            # wobble) and md5-rank selection
            "with c as (select source, count(*) as n from documents "
            "group by source), "
            "t as (select source, least(n, floor(round(120 * pow(n, 0.5) "
            "/ (select sum(pow(n, 0.5)) from c), 9))) as tgt from c), "
            "f as (select doc_id, source, "
            "try_cast(('0x' || substr(md5('temp:' || doc_id::varchar), 1, 8)) "
            "as bigint) / 4294967296.0 as b from documents), "
            "r as (select doc_id, source, row_number() over ("
            "partition by source order by b, doc_id) as rn from f) "
            "select r.doc_id, r.source from r join t using (source) "
            "where rn <= tgt"
        ),
        "heavy_hitters": (
            # plain exact top-20 — the Spark side's MG candidate family
            # provably contains these under the capacity sizing, and its
            # recount pass is exact
            f"with ex as (select unnest({_TOKENS_SQL}) as token "
            "from documents) "
            "select token, count(*) as cnt from ex group by token "
            "order by cnt desc, token asc limit 20"
        ),
        "approx_distinct": (
            # the oracle pins approx_ok to literal true: an HLL
            # regression beyond 5% rel error flips the Spark side false
            # and hash-fails the row
            "select event_type, count(distinct user_id) as n_users, "
            "true as approx_ok from events group by event_type"
        ),
        "random_project": _random_project_oracle(),
        "domain_blocklist": (
            # closed-form survivors of the planted-URL blocklist
            "select doc_id from documents "
            "where doc_id % 2 = 1 and doc_id % 7 != 3"
        ),
        "sentence_stats": (
            "with p as (select doc_id, 'First sentence number ' || "
            "doc_id::varchar || '. Second one here! A third?' || "
            "case when doc_id % 3 = 0 then "
            "' Trailing fragment without terminator' else '' end as t "
            "from documents), "
            "s as (select doc_id, list_filter(list_transform("
            "regexp_extract_all(t, '[^.!?]+[.!?]*'), x -> trim(x)), "
            "x -> x != '') as ss from p) "
            "select doc_id, len(ss)::int as n_sentences, "
            "ss[1] as first_sentence, ss[-1] as last_sentence from s"
        ),
        "semantic_dedup": (
            # same planted copies; one-assignment k-means mirror (seed
            # ranks by salted md5 fraction as in the kmeans oracle,
            # salt 'sd'), then within-cluster pairs at cosine >= 0.99
            # drop the member with the smaller rounded centroid
            # distance (ties: larger id)
            "with b as (select vec_id, embedding from embeddings "
            "union all select vec_id + 1000000 as vec_id, "
            # x::double * 1.001: DuckDB's bare `x * 1.001` casts the
            # decimal literal to FLOAT and multiplies in float32 — one
            # ulp off Spark's double-multiply-then-cast for ~half the
            # components, which is enough to flip cent_dist's rounding
            "list_transform(embedding, "
            "x -> (x::double * 1.001::double)::float) as embedding "
            "from embeddings where vec_id < 20), "
            "f as (select vec_id, embedding, "
            "try_cast(('0x' || substr(md5('sd:' || vec_id::varchar), 1, 8)) "
            "as bigint) / 4294967296.0 as h from b), "
            "sr as (select vec_id, embedding, "
            "row_number() over (order by h, vec_id) - 1 as label from f), "
            "seeds as (select label, embedding::DOUBLE[] as centroid "
            "from sr where label < 8), "
            "d1 as (select vec_id, label, sum((x - m) * (x - m)) as dd from ("
            "select e.vec_id, s.label, unnest(e.embedding)::double as x, "
            "unnest(s.centroid) as m from b e cross join seeds s) "
            "group by vec_id, label), "
            "a1 as (select vec_id, label, round(dd, 4) as cent_dist from ("
            "select vec_id, label, dd, row_number() over ("
            "partition by vec_id order by dd, label) as rn from d1) "
            "where rn = 1), "
            "mm as (select a1.vec_id, a1.label, a1.cent_dist, "
            "b.embedding::DOUBLE[] as v from a1 join b using (vec_id)), "
            "p as (select a.vec_id as ia, r.vec_id as ib, "
            "a.cent_dist as da, r.cent_dist as db, "
            "round(list_dot_product(a.v, r.v) / "
            "(sqrt(list_dot_product(a.v, a.v)) * "
            "sqrt(list_dot_product(r.v, r.v))), 6) as cs "
            "from mm a join mm r on a.label = r.label "
            "and a.vec_id < r.vec_id), "
            "dp as (select distinct case when da < db then ia "
            "when db < da then ib else greatest(ia, ib) end as vid "
            "from p where cs >= 0.99) "
            "select vec_id, label as cluster, cent_dist, "
            "(vec_id in (select vid from dp)) as dropped from mm"
        ),
        "c4_clean": (
            # same planted fixture; line gate = terminal punctuation +
            # >=5 words + no javascript/lorem-ipsum token; doc gate =
            # <3 kept lines, '{', or 'lorem ipsum'
            "with p as (select doc_id, "
            "'First proper sentence line for cleaner gate number ' || "
            "doc_id::varchar || '.' || chr(10) || "
            "'Second proper sentence line stays in the document too!' || "
            "chr(10) || "
            "'Third full sentence line survives the cleaner as well.' || "
            "chr(10) || text "
            "|| case when doc_id % 11 = 0 then '.' else '' end "
            "|| case when doc_id % 3 = 0 then chr(10) || "
            "'Please enable JavaScript to view the comments.' else '' end "
            "|| case when doc_id % 5 = 0 then chr(10) || "
            "'lorem ipsum dolor sit amet filler text.' else '' end "
            "|| case when doc_id % 7 = 0 then chr(10) || "
            "'body { margin: 0; }' else '' end as t from documents), "
            "l as (select doc_id, t, "
            "list_filter(list_transform(string_split(t, chr(10)), "
            "x -> trim(x)), x -> x <> '') as ls from p), "
            "k as (select doc_id, t, ls, list_filter(ls, x -> "
            "regexp_matches(x, '[.!?\"]$') and "
            "len(list_filter(regexp_split_to_array(x, '\\s+'), "
            "w -> w != '')) >= 5 and "
            "not contains(lower(x), 'javascript') and "
            "not contains(lower(x), 'lorem ipsum')) as kept from l) "
            "select doc_id, "
            "case when not (len(kept) < 3 or contains(t, '{') or "
            "contains(lower(t), 'lorem ipsum')) "
            "then array_to_string(kept, chr(10)) end as cleaned_text, "
            "len(kept)::int as n_lines_kept, "
            "(len(ls) - len(kept))::int as n_lines_dropped, "
            "(len(kept) < 3 or contains(t, '{') or "
            "contains(lower(t), 'lorem ipsum')) as doc_dropped from k"
        ),
        "line_dedup": (
            # same planted fixture; generate_subscripts gives 1-based
            # positions, string_agg(.. order by pos) rebuilds in order
            "with d as (select doc_id, text || chr(10) || "
            "'Shared boilerplate footer line' || chr(10) || "
            "'unique ' || doc_id as text from documents), "
            "l as (select doc_id, "
            "generate_subscripts(string_split(text, chr(10)), 1) as pos, "
            "unnest(string_split(text, chr(10))) as line from d), "
            "c as (select line, count(distinct doc_id) as docs "
            "from l group by line), "
            "k as (select l.doc_id, l.pos, l.line from l "
            "join c using (line) where c.docs < 2), "
            "a as (select doc_id, count(*) as n_kept, "
            "string_agg(line, chr(10) order by pos) as text_clean "
            "from k group by doc_id) "
            "select d.doc_id, "
            "len(string_split(d.text, chr(10)))::bigint as n_lines, "
            "coalesce(a.n_kept, 0)::bigint as n_kept, "
            "coalesce(a.text_clean, '') as text_clean "
            "from d left join a using (doc_id)"
        ),
        "dup_spans": (
            f"with d as (select doc_id, {_TOKENS_SQL} as tk from documents), "
            "idx as (select doc_id, tk, "
            "unnest(range(1, len(tk) - 8)) as i from d), "
            "w as (select doc_id, array_to_string(tk[i:i+9], ' ') as win "
            "from idx), "
            "s as (select win, count(distinct doc_id) as n_docs "
            "from w group by win) "
            "select doc_id, count(*) as n_windows, "
            "round(avg(case when n_docs > 1 then 1.0 else 0.0 end), 6) "
            "as dup_frac from w join s using (win) group by doc_id"
        ),
        "bigram_lm": (
            f"with d as (select doc_id, {_TOKENS_SQL} as tk from documents), "
            "idx as (select doc_id, tk, unnest(range(1, len(tk))) as i from d), "
            "bg as (select doc_id, tk[i] as w1, tk[i+1] as w2 from idx), "
            "b12 as (select w1, w2, count(*) as c12 from bg group by w1, w2), "
            "b1 as (select w1, sum(c12) as c1 from b12 group by w1), "
            "u as (select w2, count(*) as tf2 from bg group by w2), "
            "tot as (select sum(tf2) as n_total from u), "
            "per as (select doc_id, count(*) as n_bigrams, "
            "round(avg(ln(0.75 * c12 / c1 + 0.25 * tf2 / n_total)), 6) "
            "as avg_logp "
            "from bg join b12 using (w1, w2) join b1 using (w1) "
            "join u using (w2) cross join tot group by doc_id) "
            "select doc_id, n_bigrams, avg_logp, "
            "round(exp(-avg_logp), 4) as ppl from per"
        ),
        "unigram_lm": (
            f"with tok as (select doc_id, unnest({_TOKENS_SQL}) as token "
            "from documents), "
            "voc as (select token, count(*) as tf from tok group by token), "
            "topv as (select token, tf from voc "
            "order by tf desc, token asc limit 50), "
            "tot as (select sum(tf) as n_total from voc), "
            "sc as (select t.doc_id, case when v.tf is not null "
            "then ln(v.tf / s.n_total) "
            "else ln(1.0 / (s.n_total + 1)) end as logp "
            "from tok t left join topv v using (token) cross join tot s), "
            "per as (select doc_id, count(*)::bigint as n_tokens, "
            "round(avg(logp), 6) as avg_logp from sc group by doc_id) "
            "select doc_id, n_tokens, avg_logp, "
            "round(exp(-avg_logp), 4) as ppl from per"
        ),
        "bm25": (
            f"with d as (select doc_id, {_TOKENS_SQL} as tk from documents), "
            "base as (select doc_id, len(tk)::bigint as dl, tk from d), "
            "stats as (select count(*) as n, avg(dl) as avgdl from base), "
            "hits as (select doc_id, dl, unnest(list_filter(tk, "
            "t -> t in ('join', 'scan', 'vector'))) as token from base), "
            "tf as (select doc_id, dl, token, count(*) as tf from hits "
            "group by doc_id, dl, token), "
            "dfq as (select token, count(*) as dfreq from tf group by token) "
            "select tf.doc_id, round(sum("
            "ln(1.0 + (s.n - d.dfreq + 0.5) / (d.dfreq + 0.5)) * "
            "(tf.tf * (1.2 + 1)) / "
            "(tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl))"
            "), 6) as score "
            "from tf join dfq d using (token) cross join stats s "
            "group by tf.doc_id"
        ),
        "zorder": (
            "with b as (select event_id, user_id % 65536 as u, "
            "((epoch_ns(ts) // 1000000000) // 60) % 65536 as m from events) "
            "select event_id, "
            + layout.zorder_key_sql(["u", "m"], bits=16)
            + "::bigint as zkey from b"
        ),
        "tpch_q6": (
            "select round(sum(l_extendedprice * l_discount), 4) as revenue "
            "from lineitem "
            "where l_shipdate >= timestamp '1996-01-01' "
            "and l_shipdate < timestamp '1997-01-01' "
            "and l_discount >= 0.05 and l_discount <= 0.07 "
            "and l_quantity < 24"
        ),
        "tpch_q5": (
            "select n_name, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) as revenue "
            "from customer join orders on c_custkey = o_custkey "
            "join lineitem on l_orderkey = o_orderkey "
            "join supplier on l_suppkey = s_suppkey "
            "join nation on s_nationkey = n_nationkey "
            "join region on n_regionkey = r_regionkey "
            "where r_name = 'ASIA' and c_nationkey = s_nationkey "
            "and o_orderdate >= timestamp '1996-01-01' "
            "and o_orderdate < timestamp '1997-01-01' "
            "group by n_name"
        ),
        "tpch_q4": (
            "select o_orderpriority, count(*) as n from orders o "
            "where o_orderdate >= timestamp '1996-01-01' "
            "and o_orderdate < timestamp '1996-04-01' "
            "and exists (select 1 from lineitem l "
            "where l.l_orderkey = o.o_orderkey "
            "and l.l_shipdate > o.o_orderdate + interval 90 day) "
            "group by o_orderpriority"
        ),
        "tpch_q12": (
            "select l_returnflag, "
            "sum(case when o_orderpriority in ('1-URGENT', '2-HIGH') "
            "then 1 else 0 end)::bigint as high_line_count, "
            "sum(case when o_orderpriority in ('1-URGENT', '2-HIGH') "
            "then 0 else 1 end)::bigint as low_line_count "
            "from lineitem join orders on l_orderkey = o_orderkey "
            "where l_shipdate >= timestamp '1996-01-01' "
            "and l_shipdate < timestamp '1997-01-01' "
            "group by l_returnflag"
        ),
        "tpch_q14": (
            "select round(100.0 * "
            "sum(case when p_type = 'PROMO' "
            "then l_extendedprice * (1 - l_discount) else 0 end) / "
            "sum(l_extendedprice * (1 - l_discount)), 4) "
            "as promo_revenue_pct "
            "from lineitem join part on l_partkey = p_partkey "
            "where l_shipdate >= timestamp '1996-09-01' "
            "and l_shipdate < timestamp '1996-10-01'"
        ),
        # n_missed = 0 is the structural recall guarantee of the banded /
        # pigeonhole designs; the oracle recomputes n_exact from the
        # planted duplicate texts and asserts the zero
        "embedding_recall": (
            "select 5::bigint as n_planted, 0::bigint as n_missed"
        ),
        "knn_recall": (
            "select 5::bigint as n_planted, 0::bigint as n_missed"
        ),
        "data_quality": (
            "select 'not_null' as check, 'o_orderkey' as target, "
            "count(*) filter (o_orderkey is null)::bigint as violations, "
            "count(*) filter (o_orderkey is null) = 0 as passed from orders "
            "union all select 'unique', 'o_orderkey', "
            "(count(o_orderkey) - count(distinct o_orderkey))::bigint, "
            "count(o_orderkey) = count(distinct o_orderkey) from orders "
            "union all select 'min_value', 'o_totalprice', "
            "count(*) filter (o_totalprice < 0.0)::bigint, "
            "count(*) filter (o_totalprice < 0.0) = 0 from orders "
            "union all select 'between', 'o_totalprice', "
            "count(*) filter (o_totalprice < 1000.0 or o_totalprice > 400000.0)::bigint, "
            "count(*) filter (o_totalprice < 1000.0 or o_totalprice > 400000.0) = 0 from orders "
            "union all select 'in_set', 'o_orderstatus', "
            "count(*) filter (o_orderstatus is not null and o_orderstatus not in ('F','O','P'))::bigint, "
            "count(*) filter (o_orderstatus is not null and o_orderstatus not in ('F','O','P')) = 0 from orders "
            "union all select 'matches', 'o_orderpriority', "
            "count(*) filter (o_orderpriority is not null and not regexp_matches(o_orderpriority, '^[1-5]-'))::bigint, "
            "count(*) filter (o_orderpriority is not null and not regexp_matches(o_orderpriority, '^[1-5]-')) = 0 from orders "
            "union all select 'not_null', 'o_custkey', "
            "count(*) filter (o_custkey is null)::bigint, "
            "count(*) filter (o_custkey is null) = 0 from orders"
        ),
        "incremental_recall": (
            f"select count(*)::bigint as n_planted, 0::bigint as n_missed "
            f"from documents where doc_id < 25 and doc_id % 5 != 0 "
            f"and len({_TOKENS_SQL}) >= 3"
        ),
        # twin-oracled LSH tier: expected pair sets computed driver-side
        # by the pure-Python oracle_twin pipeline over the SAME sf0.01
        # corpus and inlined as literal VALUES rows — the driver
        # hash-checks the full pair sets (reference anchor:
        # tests/utils/mod.rs:258-268, value-check everything)
        "minhash_pairs": _minhash_pairs_oracle(_oracle_sf_dir()),
        "simhash_pairs": _simhash_pairs_oracle(_oracle_sf_dir()),
        "minhash_incremental": _minhash_incremental_oracle(_oracle_sf_dir()),
        "neardedup_compact_twin": (
            "select ((select count(*) from documents where doc_id < 300) "
            "+ (select count(*) from documents where doc_id < 300 "
            "and doc_id % 3 = 0 and doc_id < 60) "
            "+ (select count(*) from documents where doc_id < 300 "
            "and doc_id % 3 = 0 and doc_id >= 60 and doc_id < 120) "
            ")::bigint as n_input, 1 as compacted, "
            "0::bigint as n_only_compacted, 0::bigint as n_only_plain"
        ),
        "minhash_recall": (
            f"with p as (select doc_id, text from documents "
            "union all select doc_id + 1000000, text from documents "
            "where doc_id < 20), "
            f"d as (select doc_id, text from p "
            f"where len({_TOKENS_SQL}) >= 3), "
            "e as (select a.doc_id as id_a, b.doc_id as id_b "
            "from d a join d b on a.text = b.text "
            "and a.doc_id < b.doc_id) "
            "select count(*)::bigint as n_exact, 0::bigint as n_missed "
            "from e"
        ),
        "simhash_recall": (
            f"with p as (select doc_id, text from documents "
            "union all select doc_id + 1000000, text from documents "
            "where doc_id < 20), "
            f"d as (select doc_id, text from p "
            f"where len({_TOKENS_SQL}) >= 3), "
            "e as (select a.doc_id as id_a, b.doc_id as id_b "
            "from d a join d b on a.text = b.text "
            "and a.doc_id < b.doc_id) "
            "select count(*)::bigint as n_exact, 0::bigint as n_missed "
            "from e"
        ),
        "tpch_q13": (
            "select c_count, count(*) as custdist from ("
            "select c_custkey, count(o_orderkey) as c_count "
            "from customer left join orders on c_custkey = o_custkey "
            "group by c_custkey) group by c_count"
        ),
        "tpch_q17": (
            "with pa as (select l_partkey as pk, "
            "0.2 * avg(l_quantity) as lim from lineitem group by l_partkey) "
            "select round(sum(l_extendedprice) / 7.0, 2) as avg_yearly "
            "from lineitem join part on p_partkey = l_partkey "
            "join pa on pa.pk = l_partkey "
            "where p_brand = 'Brand#4' and p_size <= 10 "
            "and l_quantity < lim"
        ),
        "tpch_q22": (
            "with sel as (select c_custkey, c_acctbal, "
            "c_nationkey % 5 as code from customer "
            "where c_nationkey % 5 in (0, 1, 2)), "
            "avgbal as (select avg(c_acctbal) a from sel "
            "where c_acctbal > 0) "
            "select code, count(*) as numcust, "
            "round(sum(c_acctbal), 2) as totacctbal from sel, avgbal "
            "where c_acctbal > a and not exists ("
            "select 1 from orders o where o.o_custkey = sel.c_custkey "
            "and o.o_orderdate >= timestamp '1996-01-01' "
            "and o.o_orderdate < timestamp '1996-04-01') "
            "group by code"
        ),
        "tpch_q10": (
            "select c_custkey, c_name, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) as revenue, "
            "n_name "
            "from customer join orders on c_custkey = o_custkey "
            "join lineitem on l_orderkey = o_orderkey "
            "join nation on c_nationkey = n_nationkey "
            "where o_orderdate >= timestamp '1996-01-01' "
            "and o_orderdate < timestamp '1996-04-01' "
            "and l_returnflag = 'R' "
            "group by c_custkey, c_name, n_name "
            "order by revenue desc, c_custkey asc limit 20"
        ),
        "tpch_q18": (
            "with big as (select l_orderkey, sum(l_quantity) as sum_qty "
            "from lineitem group by l_orderkey "
            "having sum(l_quantity) > 250) "
            "select c_custkey, c_name, o_orderkey, o_orderdate, "
            "round(o_totalprice, 2) as totalprice, sum_qty::bigint as sum_qty "
            "from big join orders on o_orderkey = l_orderkey "
            "join customer on c_custkey = o_custkey"
        ),
        "pagerank": _pagerank_oracle_sql(iters=3),
        "weighted_sample": (
            # log-space A-ES key: u^(1/w) desc == ln(-ln u) - ln w asc,
            # discriminative at any weight magnitude (split.py)
            f"with t as (select doc_id, len({_TOKENS_SQL})::double as w "
            "from documents), "
            "k as (select doc_id, w, "
            "round(ln(-ln(greatest("
            "try_cast(('0x' || substr(md5('r4:' || doc_id::varchar), "
            "1, 8)) as bigint) / 4294967296.0, 0.5 / 4294967296.0))) "
            "- ln(w), 12) as key "
            "from t where w > 0) "
            "select doc_id, w from k order by key asc, doc_id asc limit 40"
        ),
        "cohort_retention": (
            "with e as (select user_id as user, "
            "((epoch_ns(ts) // 1000000000) // 86400)::bigint as w "
            "from events where user_id is not null and ts is not null), "
            "f as (select user, min(w) as cohort_period from e "
            "group by user), "
            "j as (select e.user, f.cohort_period, "
            "e.w - f.cohort_period as period_offset "
            "from e join f using (user)) "
            "select cohort_period, period_offset, "
            "count(distinct user) as n_users from j "
            "where period_offset <= 7 group by cohort_period, period_offset"
        ),
        "tpch_q3": (
            "select l_orderkey, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) as revenue, "
            "o_orderdate, o_orderpriority "
            "from customer join orders on c_custkey = o_custkey "
            "join lineitem on l_orderkey = o_orderkey "
            "where c_mktsegment = 'BUILDING' "
            "and o_orderdate < timestamp '1997-03-15' "
            "and l_shipdate > timestamp '1997-03-15' "
            "group by l_orderkey, o_orderdate, o_orderpriority "
            "order by revenue desc, l_orderkey asc limit 10"
        ),
        "embed_quantize": (
            "select vec_id, "
            "round(sqrt(list_dot_product(embedding::DOUBLE[], "
            "embedding::DOUBLE[])), 4) as norm, "
            "array_to_string(list_transform(embedding::DOUBLE[], x -> "
            "greatest(least(floor(x * 127 + 0.5), 127), -127)::tinyint), "
            "',') as q "
            "from embeddings"
        ),
        "chunk_documents": (
            f"with t as (select doc_id, {_TOKENS_SQL} as tk from documents), "
            "nz as (select * from t where len(tk) > 0), "
            "idx as (select doc_id, tk, "
            "unnest(generate_series(1, greatest(len(tk) - 16, 1), 48)) as st "
            "from nz), "
            "ch as (select doc_id, st, list_slice(tk, st, st + 63) as c "
            "from idx) "
            "select doc_id, ((st - 1) // 48)::int as chunk_id, "
            "st::int as tok_start, len(c)::int as n_tokens, "
            "array_to_string(c, ' ') as chunk_text from ch"
        ),
        "hash_split": (
            "with f as (select doc_id, "
            "try_cast(('0x' || substr(md5('r2:' || doc_id::varchar), 1, 8)) "
            "as bigint) / 4294967296.0 as b from documents), "
            "lab as (select doc_id, case when b < 0.9 then 'train' "
            "when b < 0.95 then 'val' else 'test' end as split from f) "
            "select split, count(*) as n, min(doc_id) as min_id "
            "from lab group by split"
        ),
        "domain_cap": (
            # same top-10-per-source ordering: n_chars desc, doc_id asc
            "select doc_id, source, n_chars from ("
            "select doc_id, source, n_chars, row_number() over "
            "(partition by source order by n_chars desc, doc_id asc) as rn "
            "from documents) where rn <= 10"
        ),
        "class_centroids": (
            "with per as (select label, pos, avg(x) as m from ("
            "select label, unnest(embedding) as x, "
            "generate_subscripts(embedding, 1) as pos from embeddings) "
            "group by label, pos) "
            "select label, pos::bigint as pos, round(m, 6) as m from per"
        ),
        "centroid_assign": (
            "with per as (select label, pos, avg(x) as m from ("
            "select label, unnest(embedding) as x, "
            "generate_subscripts(embedding, 1) as pos from embeddings) "
            "group by label, pos), "
            "cvec as (select label, list(round(m, 6) order by pos) as centroid "
            "from per group by label), "
            "dist as (select vec_id, label, sum((x - m) * (x - m)) as d2 from ("
            "select e.vec_id, c.label, unnest(e.embedding) as x, "
            "unnest(c.centroid) as m from embeddings e cross join cvec c) "
            "group by vec_id, label), "
            "r as (select vec_id, label, row_number() over "
            "(partition by vec_id order by d2, label) as rn from dist) "
            "select vec_id, label as pred_label from r where rn = 1"
        ),
        "kmeans": (
            "with f as (select vec_id, embedding, "
            "try_cast(('0x' || substr(md5('km:' || vec_id::varchar), 1, 8)) "
            "as bigint) / 4294967296.0 as b from embeddings), "
            "sr as (select vec_id, embedding, "
            "row_number() over (order by b, vec_id) - 1 as label from f), "
            "seeds as (select label, embedding as centroid from sr "
            "where label < 8), "
            "d1 as (select vec_id, label, sum((x - m) * (x - m)) as dd from ("
            "select e.vec_id, s.label, unnest(e.embedding)::double as x, "
            "unnest(s.centroid)::double as m "
            "from embeddings e cross join seeds s) group by vec_id, label), "
            "a1 as (select vec_id, label from (select vec_id, label, "
            "row_number() over (partition by vec_id order by dd, label) as rn "
            "from d1) where rn = 1), "
            "c1 as (select label, list(round(m, 6) order by pos) as centroid "
            "from (select a1.label as label, t.pos, avg(t.x) as m from ("
            "select vec_id, unnest(embedding)::double as x, "
            "generate_subscripts(embedding, 1) as pos from embeddings) t "
            "join a1 using (vec_id) group by a1.label, t.pos) group by label), "
            "d2 as (select vec_id, label, sum((x - m) * (x - m)) as dd from ("
            "select e.vec_id, c.label, unnest(e.embedding)::double as x, "
            "unnest(c.centroid) as m "
            "from embeddings e cross join c1 c) group by vec_id, label), "
            "a2 as (select vec_id, label from (select vec_id, label, "
            "row_number() over (partition by vec_id order by dd, label) as rn "
            "from d2) where rn = 1) "
            "select vec_id, label as cluster from a2"
        ),
        "stratified_sample": (
            "with f as (select doc_id, source, "
            "try_cast(('0x' || substr(md5('strat:' || doc_id::varchar), 1, 8)) "
            "as bigint) / 4294967296.0 as b from documents), "
            "r as (select doc_id, source, row_number() over "
            "(partition by source order by b, doc_id) as rn from f) "
            "select doc_id, source from r where rn <= 20"
        ),
        "decontam": (
            "with tok as (select doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') as toks from documents), "
            "idx as (select doc_id, toks, "
            "unnest(generate_series(1, greatest(len(toks) - 3, 1))) as i from tok), "
            "ng as (select distinct doc_id, "
            "array_to_string(list_slice(toks, i, i + 3), ' ') as g from idx), "
            "bench as (select distinct g from ng where doc_id % 20 = 0) "
            "select ng.doc_id, count(*)::bigint as contaminated_ngrams "
            "from ng join bench using (g) "
            "where ng.doc_id % 20 <> 0 group by ng.doc_id"
        ),
        "bloom_join": (
            # the bloom prefilter is exact-by-construction (FPs removed
            # by the real join), so the oracle is the PLAIN join
            "select o_orderpriority, count(*) as n_orders, "
            "round(sum(o_totalprice), 2) as total "
            "from orders join customer on o_custkey = c_custkey "
            "where c_mktsegment = 'BUILDING' group by o_orderpriority"
        ),
        "skew_report": (
            "with c as (select user_id as key, count(*)::bigint as n "
            "from events group by 1), "
            "t as (select sum(n)::bigint as total, count(*)::bigint as dk from c) "
            "select key, n, round(n / total, 6) as share, "
            "round(n / (total / dk), 6) as skew_vs_uniform, "
            "total as total_rows, dk as distinct_keys "
            "from c, t order by n desc, key asc limit 20"
        ),
        "stream_decontam": (
            # the streaming twin emits a count for EVERY train doc
            # (zeros included) — left join + coalesce, else as `decontam`
            "with tok as (select doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') as toks from documents), "
            "idx as (select doc_id, toks, "
            "unnest(generate_series(1, greatest(len(toks) - 3, 1))) as i from tok), "
            "ng as (select distinct doc_id, "
            "array_to_string(list_slice(toks, i, i + 3), ' ') as g from idx), "
            "bench as (select distinct g from ng where doc_id % 20 = 0), "
            "hits as (select ng.doc_id, count(*)::bigint as c "
            "from ng join bench using (g) "
            "where ng.doc_id % 20 <> 0 group by ng.doc_id) "
            "select d.doc_id, coalesce(h.c, 0)::bigint as contaminated_ngrams "
            "from documents d left join hits h using (doc_id) "
            "where d.doc_id % 20 <> 0"
        ),
        "mixture_sample": (
            "with f as (select doc_id, source, "
            "try_cast(('0x' || substr(md5('mix:' || doc_id::varchar), 1, 8)) "
            "as bigint) / 4294967296.0 as b from documents), "
            "kept as (select * from f where b < case source "
            "when 'src0' then 1.0 when 'src1' then 0.5 "
            "when 'src2' then 0.25 else 0.1 end) "
            "select source, count(*) as n, min(doc_id) as min_id "
            "from kept group by source"
        ),
        "mixture_resample": (
            "with f as (select doc_id, source, "
            "try_cast(('0x' || substr(md5('up:' || doc_id::varchar), 1, 8)) "
            "as bigint) / 4294967296.0 as b from documents), "
            "r as (select *, case source when 'src0' then 2.5 "
            "when 'src1' then 1.0 when 'src2' then 0.5 else 0.0 end as rate "
            "from f), "
            "k as (select doc_id, source, (floor(rate) + case when "
            "b < rate - floor(rate) then 1 else 0 end)::bigint as nc from r), "
            "e as (select doc_id, source, "
            "unnest(generate_series(1, nc)) as copy from k where nc >= 1) "
            "select source, count(*) as n, "
            "count(distinct doc_id) as n_docs, max(copy) as max_copy "
            "from e group by source"
        ),
        "pack_batches": (
            f"with t as (select doc_id, len({_TOKENS_SQL})::bigint as nt, "
            "(doc_id % 8)::int as shard from documents), "
            "c as (select doc_id, shard, nt, coalesce(sum(nt) over ("
            "partition by shard order by doc_id "
            "rows between unbounded preceding and 1 preceding), 0)::bigint as cb "
            "from t) "
            # ::bigint everywhere integer aggregation happens — DuckDB
            # sum(BIGINT) returns HUGEINT and the driver hash is
            # type-aware (the round-1 json_agg lesson)
            "select shard, (cb // 2000)::bigint as batch_id, "
            "count(*) as n_docs, "
            "sum(nt)::bigint as tok, min(doc_id) as first_id "
            "from c group by shard, cb // 2000"
        ),
        "token_stats": (
            f"with ex as (select doc_id, unnest({_TOKENS_SQL}) as token "
            "from documents), "
            "tf as (select doc_id, token, count(*) as c from ex "
            "group by doc_id, token), "
            "a as (select doc_id, sum(c)::bigint as n, "
            "sum(c * ln(c)) as s, max(c)::bigint as m from tf "
            "group by doc_id) "
            "select doc_id, n as n_tokens, "
            "round(ln(n) - s / n, 6) as entropy, "
            "round(m / n::double, 6) as top_token_frac from a"
        ),
        "tf_idf": (
            f"with ex as (select doc_id, unnest({_TOKENS_SQL}) as token "
            "from documents), "
            "tf as (select doc_id, token, count(*) as tf from ex "
            "group by doc_id, token), "
            "dfq as (select token, count(*) as dfreq from tf group by token), "
            "n as (select count(*) as n from documents) "
            "select tf.doc_id, tf.token, tf.tf, "
            "round(tf.tf * (ln((1 + n.n)::double / (1 + dfq.dfreq)) + 1), 6) "
            "as tfidf "
            "from tf join dfq using(token) cross join n"
        ),
        "dedup_cc": (
            "with recursive "
            f"toks as (select doc_id, list_distinct({_TOKENS_SQL}) as tk "
            "from documents), "
            "edges as (select a.doc_id as u, b.doc_id as v "
            "from toks a join toks b on b.doc_id = a.doc_id + 1 "
            "where case when len(list_distinct(list_concat(a.tk, b.tk))) > 0 "
            "then len(list_intersect(a.tk, b.tk))::double / "
            "len(list_distinct(list_concat(a.tk, b.tk))) else 0.0 end >= 0.8), "
            "und as (select u, v from edges union select v, u from edges), "
            "reach(a, b) as (select u, u from und "
            "union "
            "select r.a, und.v from reach r join und on und.u = r.b) "
            "select a as node, min(b) as comp from reach group by a"
        ),
        "dedup_keep_best": (
            # same closure as dedup_cc, then rank each component by
            # (n_chars desc, doc_id asc) and drop everything but rank 1;
            # docs never in the pair graph survive untouched
            "with recursive "
            f"toks as (select doc_id, list_distinct({_TOKENS_SQL}) as tk "
            "from documents), "
            "edges as (select a.doc_id as u, b.doc_id as v "
            "from toks a join toks b on b.doc_id = a.doc_id + 1 "
            "where case when len(list_distinct(list_concat(a.tk, b.tk))) > 0 "
            "then len(list_intersect(a.tk, b.tk))::double / "
            "len(list_distinct(list_concat(a.tk, b.tk))) else 0.0 end >= 0.8), "
            "und as (select u, v from edges union select v, u from edges), "
            "reach(a, b) as (select u, u from und "
            "union "
            "select r.a, und.v from reach r join und on und.u = r.b), "
            "cc as (select a as node, min(b) as comp from reach group by a), "
            "ranked as (select cc.node, row_number() over "
            "(partition by cc.comp order by length(d.text) desc, cc.node asc) "
            "as rn from cc join documents d on d.doc_id = cc.node), "
            "losers as (select node from ranked where rn > 1) "
            "select doc_id, length(text)::int as n_chars from documents "
            "where doc_id not in (select node from losers)"
        ),
        "dup_provenance": (
            # same closure + ranking as dedup_keep_best; emit the
            # (dropped, kept) mapping instead of the survivors
            "with recursive "
            f"toks as (select doc_id, list_distinct({_TOKENS_SQL}) as tk "
            "from documents), "
            "edges as (select a.doc_id as u, b.doc_id as v "
            "from toks a join toks b on b.doc_id = a.doc_id + 1 "
            "where case when len(list_distinct(list_concat(a.tk, b.tk))) > 0 "
            "then len(list_intersect(a.tk, b.tk))::double / "
            "len(list_distinct(list_concat(a.tk, b.tk))) else 0.0 end >= 0.8), "
            "und as (select u, v from edges union select v, u from edges), "
            "reach(a, b) as (select u, u from und "
            "union "
            "select r.a, und.v from reach r join und on und.u = r.b), "
            "cc as (select a as node, min(b) as comp from reach group by a), "
            "ranked as (select cc.node, cc.comp, row_number() over "
            "(partition by cc.comp order by length(d.text) desc, cc.node asc) "
            "as rn from cc join documents d on d.doc_id = cc.node) "
            "select l.node as dropped_id, w.node as kept_id "
            "from ranked l join ranked w on w.comp = l.comp and w.rn = 1 "
            "where l.rn > 1"
        ),
        "merge_upsert": (
            # same planted MERGE arms: %7 updates, %13 deletes, %5
            # inserts at +1e8; survivors = NOT EXISTS on the source key
            "with base as (select o_orderkey, o_orderstatus, "
            "o_orderpriority from orders), "
            "src as (select o_orderkey, o_orderstatus, "
            "'MERGED' as o_orderpriority, (o_orderkey % 13 = 0) as d "
            "from base where o_orderkey % 7 = 0 or o_orderkey % 13 = 0 "
            "union all select o_orderkey + 100000000, o_orderstatus, "
            "'NEW', false from base where o_orderkey % 5 = 0) "
            "select b.* from base b where not exists "
            "(select 1 from src s where s.o_orderkey = b.o_orderkey) "
            "union all select o_orderkey, o_orderstatus, o_orderpriority "
            "from src where not d"
        ),
        "cdc_compact": (
            # same planted event log; latest-per-key via row_number DESC
            "with base as (select o_orderkey, o_orderstatus, "
            "o_orderpriority from orders), "
            "log as ("
            "select o_orderkey, o_orderstatus, 'FIRST' as o_orderpriority, "
            "'U' as op, 1::bigint as seq from base where o_orderkey % 3 = 0 "
            "union all select o_orderkey, o_orderstatus, 'SECOND', 'U', 2 "
            "from base where o_orderkey % 6 = 0 "
            "union all select o_orderkey, o_orderstatus, null, 'D', 3 "
            "from base where o_orderkey % 9 = 0 "
            "union all select o_orderkey + 100000000, o_orderstatus, "
            "'NEW', 'I', 1 from base where o_orderkey % 4 = 0), "
            "latest as (select o_orderkey, o_orderstatus, o_orderpriority, "
            "op from (select *, row_number() over (partition by o_orderkey "
            "order by seq desc) as rn from log) where rn = 1) "
            "select b.* from base b where not exists "
            "(select 1 from latest l where l.o_orderkey = b.o_orderkey) "
            "union all select o_orderkey, o_orderstatus, o_orderpriority "
            "from latest where op <> 'D'"
        ),
        "scd2": (
            "with ch as (select o_custkey, o_orderdate, "
            "min(o_orderpriority) as prio from orders group by 1, 2) "
            "select o_custkey, prio, o_orderdate as valid_from, "
            "lead(o_orderdate) over (partition by o_custkey "
            "order by o_orderdate) as valid_to, "
            "(lead(o_orderdate) over (partition by o_custkey "
            "order by o_orderdate) is null) as is_current from ch"
        ),
        "snapshot_diff": (
            # same planted removals/edits/additions; presence via side
            # tags, null-safe compares, unchanged dropped
            "with old as (select doc_id, text, lang from documents), "
            "new as (select doc_id, case when doc_id % 11 = 3 "
            "then text || ' [edited]' else text end as text, lang "
            "from documents where doc_id % 17 <> 0 "
            "union all select doc_id + 1000000, text, lang "
            "from documents where doc_id % 23 = 5), "
            "j as (select coalesce(o.doc_id, n.doc_id) as doc_id, "
            "case when o.doc_id is null then 'added' "
            "when n.doc_id is null then 'removed' "
            "when not (o.text is not distinct from n.text "
            "and o.lang is not distinct from n.lang) then 'changed' "
            "else 'unchanged' end as change "
            "from old o full outer join new n on o.doc_id = n.doc_id) "
            "select doc_id, change from j where change <> 'unchanged'"
        ),
        "rrf_fusion": (
            # same two top-50 lists; terms forced to DOUBLE division
            # (DuckDB's bare 1.0/(60+rnk) is DECIMAL arithmetic)
            "with a as (select doc_id, rn::int as rnk from ("
            "select doc_id, row_number() over (order by n_chars desc, "
            "doc_id asc) as rn from documents) where rn <= 50), "
            "b as (select doc_id, rn::int as rnk from ("
            "select doc_id, row_number() over (order by "
            "md5('rrf:' || doc_id::varchar) asc, doc_id asc) as rn "
            "from documents) where rn <= 50), "
            "u as (select doc_id, 1.0::double / (60 + rnk)::double as t "
            "from a union all "
            "select doc_id, 1.0::double / (60 + rnk)::double from b) "
            "select doc_id, round(sum(t), 9) as rrf_score, "
            "count(*)::int as n_lists from u group by doc_id "
            "order by rrf_score desc, doc_id asc limit 20"
        ),
        "leakage_split": (
            # dedup_cc's closure -> component reps; singletons fall
            # back to their own id; split thresholds on the salted
            # component hash (train<0.6, val<0.8, else test)
            "with recursive "
            f"toks as (select doc_id, list_distinct({_TOKENS_SQL}) as tk "
            "from documents), "
            "edges as (select a.doc_id as u, b.doc_id as v "
            "from toks a join toks b on b.doc_id = a.doc_id + 1 "
            "where case when len(list_distinct(list_concat(a.tk, b.tk))) > 0 "
            "then len(list_intersect(a.tk, b.tk))::double / "
            "len(list_distinct(list_concat(a.tk, b.tk))) else 0.0 end >= 0.8), "
            "und as (select u, v from edges union select v, u from edges), "
            "reach(a, b) as (select u, u from und "
            "union "
            "select r.a, und.v from reach r join und on und.u = r.b), "
            "comp as (select a as node, min(b) as comp from reach "
            "group by a), "
            "g as (select d.doc_id, "
            "coalesce(c.comp, d.doc_id) as split_group "
            "from documents d left join comp c on d.doc_id = c.node), "
            "f as (select doc_id, split_group, "
            "try_cast(('0x' || substr(md5('ls:' || split_group::varchar), "
            "1, 8)) as bigint) / 4294967296.0 as b from g) "
            "select doc_id, split_group, case when b < 0.6 then 'train' "
            "when b < 0.8 then 'val' else 'test' end as split from f"
        ),
        "bpe_merges": (
            _bpe_oracle_ctes(_BPE_STEPS)
            + ", merges as ("
            + " union all ".join(
                f"select {k} as step, lft, rgt, lft || rgt as merged, "
                f"freq from m{k}"
                for k in range(1, _BPE_STEPS + 1)
            )
            + ") select step, lft, rgt, merged, freq from merges"
        ),
        "bpe_encode": (
            _bpe_oracle_ctes(_BPE_STEPS)
            + ", dw as (select doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) as word "
            "from documents) "
            "select doc_id, count(*) as n_words, "
            "sum(len(string_split(trim(s, '<>'), '><')))::bigint "
            f"as n_bpe_tokens from dw join w{_BPE_STEPS} using (word) "
            "group by doc_id"
        ),
        "bpe_stats": (
            # seg trained on doc_id % 3 != 0 only (the wt CTE filter),
            # evaluated over ALL docs — held-out words LEFT-join to
            # null and count as OOV with char-fallback token counts
            _bpe_train_filtered_ctes(_BPE_STEPS, "doc_id % 3 <> 0")
            + ", dw as (select doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z]+', 0)) as word "
            "from documents), "
            "j as (select dw.word, "
            "len(string_split(trim(s, '<>'), '><')) as nt "
            f"from dw left join w{_BPE_STEPS} using (word)), "
            "wa as (select count(*) as n_words, "
            "sum(coalesce(nt, length(word)))::bigint as n_tokens, "
            "sum(case when nt is null then 1 else 0 end)::bigint as n_oov, "
            "sum(length(word))::bigint as n_chars from j), "
            "da as (select count(*) as n_docs from documents) "
            "select n_docs, n_words, n_tokens, n_oov, n_chars, "
            "round(n_tokens::double / n_words, 6) as tokens_per_word, "
            "round(n_chars::double / n_tokens, 6) as chars_per_token, "
            "round(n_oov::double / n_words, 6) as oov_rate "
            "from da cross join wa"
        ),
        "corpus_drift": (
            # same planted drift; arithmetic mirrors the Spark column
            # expressions op-for-op so the per-term doubles are
            # bit-identical (only the final sums wobble, absorbed by
            # the 6-decimal rounding)
            f"with oldt as (select unnest({_TOKENS_SQL}) as tok "
            "from documents), "
            "newd as (select case when doc_id % 7 = 0 "
            "then text || ' driftword' else text end as text "
            "from documents where source <> 'src2'), "
            f"newt as (select unnest({_TOKENS_SQL}) as tok from newd), "
            "co as (select tok, count(*) as c_old from oldt group by tok), "
            "cn as (select tok, count(*) as c_new from newt group by tok), "
            "j as (select coalesce(c_old, 0) as c_old, "
            "coalesce(c_new, 0) as c_new "
            "from co full outer join cn using (tok)), "
            "t as (select sum(c_old) as n_old, sum(c_new) as n_new, "
            "count(*) as v from j), "
            "x as (select (c_old + 0.5::double) / (n_old + 0.5::double * v) "
            "as p, (c_new + 0.5::double) / (n_new + 0.5::double * v) as q, "
            "n_old, n_new, v from j cross join t) "
            "select max(n_old)::bigint as n_tokens_old, "
            "max(n_new)::bigint as n_tokens_new, max(v)::bigint as vocab, "
            "round(sum(p * ln(p / q)), 6) as kl_old_new, "
            "round(sum(q * ln(q / p)), 6) as kl_new_old, "
            "round(sum(p * ln(p / ((p + q) / 2)) / 2 "
            "+ q * ln(q / ((p + q) / 2)) / 2), 6) as js, "
            "round(sum(abs(p - q)) / 2, 6) as tv from x"
        ),
        "grouped_drift": (
            # per-source twin of corpus_drift: counts and totals keyed
            # by source; same op-mirrored arithmetic
            f"with oldt as (select source, unnest({_TOKENS_SQL}) as tok "
            "from documents), "
            "newd as (select source, case when doc_id % 7 = 0 "
            "then text || ' driftword' else text end as text "
            "from documents where not (source = 'src1' "
            "and doc_id % 2 = 0)), "
            f"newt as (select source, unnest({_TOKENS_SQL}) as tok "
            "from newd), "
            "co as (select source, tok, count(*) as c_old from oldt "
            "group by source, tok), "
            "cn as (select source, tok, count(*) as c_new from newt "
            "group by source, tok), "
            "j as (select coalesce(co.source, cn.source) as source, "
            "coalesce(c_old, 0) as c_old, coalesce(c_new, 0) as c_new "
            "from co full outer join cn "
            "on co.source = cn.source and co.tok = cn.tok), "
            "t as (select source, sum(c_old) as n_old, "
            "sum(c_new) as n_new, count(*) as v from j group by source), "
            "x as (select j.source, "
            "(c_old + 0.5::double) / (n_old + 0.5::double * v) as p, "
            "(c_new + 0.5::double) / (n_new + 0.5::double * v) as q, "
            "n_old, n_new, v from j join t on j.source = t.source) "
            "select source, max(n_old)::bigint as n_tokens_old, "
            "max(n_new)::bigint as n_tokens_new, max(v)::bigint as vocab, "
            "round(sum(p * ln(p / q)), 6) as kl_old_new, "
            "round(sum(q * ln(q / p)), 6) as kl_new_old, "
            "round(sum(p * ln(p / ((p + q) / 2)) / 2 "
            "+ q * ln(q / ((p + q) / 2)) / 2), 6) as js, "
            "round(sum(abs(p - q)) / 2, 6) as tv from x group by source"
        ),
        "psi_drift": (
            # same planted shift; 1.1 forced ::double (DuckDB decimal
            # literals otherwise change the arithmetic), bucket math
            # op-mirrored to the Spark expressions
            "with oldv as (select o_totalprice::double as v from orders "
            "where o_totalprice is not null), "
            "newv as (select (case when o_orderkey % 5 = 0 "
            "then o_totalprice * 1.1::double else o_totalprice end)::double "
            "as v from orders where o_orderkey % 3 <> 0 "
            "and o_totalprice is not null), "
            "spine as (select unnest(generate_series(-1, 10)) as bucket), "
            "ho as (select case when v < 0.0 then -1 "
            "when v >= 400000.0 then 10 "
            "else floor((v - 0.0) / 40000.0)::int end as bucket, "
            "count(*) as c_old from oldv group by 1), "
            "hn as (select case when v < 0.0 then -1 "
            "when v >= 400000.0 then 10 "
            "else floor((v - 0.0) / 40000.0)::int end as bucket, "
            "count(*) as c_new from newv group by 1), "
            "j as (select coalesce(c_old, 0) as c_old, "
            "coalesce(c_new, 0) as c_new from spine "
            "left join ho using (bucket) left join hn using (bucket)), "
            "t as (select sum(c_old) as n_old, sum(c_new) as n_new from j), "
            "x as (select (c_old + 0.5::double) / "
            "(n_old + 0.5::double * 12) as p, "
            "(c_new + 0.5::double) / (n_new + 0.5::double * 12) as q, "
            "n_old, n_new from j cross join t) "
            "select max(n_old)::bigint as n_old, "
            "max(n_new)::bigint as n_new, "
            "round(sum((p - q) * ln(p / q)), 6) as psi from x"
        ),
        # SRP-LSH replayed with the hyperplanes inlined as literals —
        # converts the last LSH-tier rows-only entries to full oracles
        "ann_topk": _ann_oracle_sql(10, 1, 5),
        "ivf_topk": _ivf_oracle_sql(2, 5),
        "ivf_recall": (
            "with approx as ("
            + _ivf_oracle_sql(4, 10)
            + "), exact as ("
            "with q as (select embedding::DOUBLE[] as qv from embeddings "
            "where vec_id = 0) "
            "select vec_id from (select vec_id, round("
            "list_dot_product(embedding::DOUBLE[], qv) / "
            "(sqrt(list_dot_product(embedding::DOUBLE[], "
            "embedding::DOUBLE[])) * sqrt(list_dot_product(qv, qv))), 6) "
            "as cosine from embeddings, q "
            "order by cosine desc, vec_id asc limit 10)"
            "), h as (select count(*)::bigint as hits "
            "from approx semi join exact using (vec_id)) "
            "select 10 as k, hits, hits / 10.0::double as recall, "
            "null::varchar as recall_gate from h"
        ),
        "embedding_dups": (
            "with b as (select vec_id, embedding from embeddings "
            "union all select vec_id + 1000000 as vec_id, "
            "list_transform(embedding, "
            "x -> (x::double * 1.001::double)::float) as embedding "
            "from embeddings where vec_id < 5), "
            f"pl as (select * from (values {_planes_values_sql(10)}) "
            "as t(i, h)), "
            "bk as (select vec_id, embedding::DOUBLE[] as v, "
            "sum(case when list_dot_product(embedding::DOUBLE[], h) >= 0 "
            "then (1::bigint << i) else 0 end)::bigint as bkt "
            "from b cross join pl group by vec_id, embedding), "
            "p as (select a.vec_id as id_a, r.vec_id as id_b, "
            "round(list_dot_product(a.v, r.v) / "
            "(sqrt(list_dot_product(a.v, a.v)) * "
            "sqrt(list_dot_product(r.v, r.v))), 6) as cosine "
            "from bk a join bk r on a.bkt = r.bkt "
            "and a.vec_id < r.vec_id) "
            "select distinct id_a, id_b, cosine from p "
            "where cosine >= 0.95"
        ),
        "knn_graph": (
            f"with pl as (select * from (values "
            f"{_multitable_planes_sql(4, 8)}) as tt(t, i, h)), "
            "bk as (select t, vec_id, embedding::DOUBLE[] as v, "
            "sum(case when list_dot_product(embedding::DOUBLE[], h) >= 0 "
            "then (1::bigint << i) else 0 end)::bigint as b "
            "from embeddings cross join pl group by t, vec_id, embedding), "
            "pairs as (select distinct a.vec_id as id, "
            "r.vec_id as nbr_id, a.v as va, r.v as vb "
            "from bk a join bk r on a.t = r.t and a.b = r.b "
            "and a.vec_id <> r.vec_id), "
            "scored as (select id, nbr_id, "
            "round(list_dot_product(va, vb) / "
            "(sqrt(list_dot_product(va, va)) * "
            "sqrt(list_dot_product(vb, vb))), 6) as cosine from pairs) "
            "select id, nbr_id, cosine from (select *, row_number() over ("
            "partition by id order by cosine desc, nbr_id asc) as rn "
            "from scored) where rn <= 5"
        ),
        "ann_recall": (
            "with approx as ("
            + _ann_oracle_sql(4, 2, 10)
            + "), exact as ("
            "with q as (select embedding::DOUBLE[] as qv from embeddings "
            "where vec_id = 0) "
            "select vec_id from (select vec_id, round("
            "list_dot_product(embedding::DOUBLE[], qv) / "
            "(sqrt(list_dot_product(embedding::DOUBLE[], "
            "embedding::DOUBLE[])) * sqrt(list_dot_product(qv, qv))), 6) "
            "as cosine from embeddings, q "
            "order by cosine desc, vec_id asc limit 10)"
            "), h as (select count(*)::bigint as hits "
            "from approx semi join exact using (vec_id)) "
            "select 10 as k, hits, hits / 10.0::double as recall, "
            "null::varchar as recall_gate from h"
        ),
    }
