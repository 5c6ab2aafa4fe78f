"""Native tier (SURVEY.md §7.1): pin where the JVM fast paths agree with
the exact tier, and pin the documented divergences so the envelope stays
honest."""

import pytest
from pyspark.sql import functions as F

import datafusion_functions_json_spark as jsonf
from datafusion_functions_json_spark.functions import native
from datafusion_functions_json_spark.plans import arrow_eval_count


class TestAgreementEnvelope:
    def test_as_text_agrees_on_fixture_matrix(self, test_df):
        rows = test_df.select(
            "name",
            jsonf.json_as_text("json_data", "foo").alias("exact"),
            native.json_as_text_native("json_data", "foo").alias("nat"),
        ).collect()
        # strings / missing / null / invalid agree; containers diverge
        # (raw vs minified) — the fixture's containers are '[1]' and '{}'
        # whose minified form equals the raw form, so ALL rows agree here
        for r in rows:
            assert r.exact == r.nat, r.name

    def test_length_and_keys_agree(self, test_df):
        rows = test_df.select(
            "name",
            jsonf.json_length("json_data").alias("el"),
            native.json_length_native("json_data").alias("nl"),
            jsonf.json_object_keys("json_data").alias("ek"),
            native.json_object_keys_native("json_data").alias("nk"),
        ).collect()
        for r in rows:
            assert r.el == r.nl, r.name
            assert r.ek == r.nk, r.name

    def test_int_float_agree_on_numeric_values(self, spark):
        df = spark.createDataFrame(
            [('{"a": 1}',), ('{"a": 1.5}',), ('{"a": true}',), ('{"a": null}',), ("{}",), ("bad",)],
            "j string",
        )
        rows = df.select(
            jsonf.json_get_int("j", "a").alias("ei"),
            native.json_get_int_native("j", "a").alias("ni"),
            jsonf.json_get_float("j", "a").alias("ef"),
            native.json_get_float_native("j", "a").alias("nf"),
        ).collect()
        for r in rows:
            assert r.ei == r.ni
            assert r.ef == r.nf

    def test_native_has_no_python_stage(self, test_df):
        out = test_df.select(native.json_as_text_native("json_data", "foo"))
        assert arrow_eval_count(out) == 0


class TestDocumentedDivergences:
    def test_float_reserialization(self, spark):
        # exact tier: raw text 4.2e-1; native: Jackson rewrites
        df = spark.createDataFrame([('{"a": 4.2e-1}',)], "j string")
        r = df.select(
            jsonf.json_as_text("j", "a").alias("exact"),
            native.json_as_text_native("j", "a").alias("nat"),
        ).collect()[0]
        assert r.exact == "4.2e-1"
        assert r.nat != "4.2e-1"  # 0.42

    def test_container_minification(self, spark):
        df = spark.createDataFrame([('{"a": [1,  2]}',)], "j string")
        r = df.select(
            jsonf.json_as_text("j", "a").alias("exact"),
            native.json_as_text_native("j", "a").alias("nat"),
        ).collect()[0]
        assert r.exact == "[1,  2]"
        assert r.nat == "[1,2]"

    def test_pathological_key_rejected(self):
        with pytest.raises(ValueError, match="not expressible"):
            native.jsonpath(("a.b",))


class TestPlanQuality:
    """The scale claims from README: pruning and pushdown reach the
    parquet scan THROUGH our pandas UDFs."""

    def test_column_pruning_through_udf(self, spark, tmp_path):
        from datafusion_functions_json_spark.plans import explain_str

        p = str(tmp_path / "wide.parquet")
        spark.createDataFrame(
            [(1, '{"k": 1}', "x", 2.0)], "id long, j string, unused string, also double"
        ).write.mode("overwrite").parquet(p)
        df = spark.read.parquet(p)
        plan = explain_str(df.select("id", jsonf.json_get_int("j", "k")))
        assert "ReadSchema: struct<id:bigint,j:string>" in plan

    def test_predicate_pushdown_past_udf_projection(self, spark, tmp_path):
        from datafusion_functions_json_spark.plans import has_pushed_filter

        p = str(tmp_path / "t2.parquet")
        spark.createDataFrame(
            [(i, '{"k": %d}' % i) for i in range(20)], "id long, j string"
        ).write.mode("overwrite").parquet(p)
        df = spark.read.parquet(p)
        q = df.select("id", jsonf.json_get_int("j", "k").alias("k")).filter(
            F.col("id") > 5
        )
        assert has_pushed_filter(q, "GreaterThan(id,5)")


class TestVariantJsonArrayTier:
    """Round-5 widening: json_get_json / json_get_array / object_keys /
    length on the variant tier (native.py) — agreements with the exact
    tier inside the envelope, divergences pinned."""

    @pytest.fixture()
    def docs_df(self, spark):
        rows = [
            ("nested", '{"a": {"b": [5, {"c": "R"}]}, "d": null}'),
            ("flat_int", '{"a": 1}'),
            ("empty_arr", '{"a": {"b": []}}'),
            ("arr_null", '["x", 7, null]'),
            ("invalid", "{"),
            ("null_doc", None),
        ]
        return spark.createDataFrame(rows, "name string, j string")

    def test_get_json_agrees_minified(self, docs_df):
        rows = {
            r.name: r
            for r in docs_df.select(
                "name",
                jsonf.json_get_json("j", "a").alias("exact"),
                native.json_get_json_variant("j", "a").alias("nat"),
            ).collect()
        }
        # the nested fixture has NO interior whitespace inside $.a beyond
        # what minification removes deterministically
        assert rows["flat_int"].exact == rows["flat_int"].nat == "1"
        assert rows["empty_arr"].nat == '{"b":[]}'
        assert rows["invalid"].exact is None and rows["invalid"].nat is None
        assert rows["null_doc"].nat is None
        # divergence: exact keeps the verbatim slice (with spaces)
        assert rows["nested"].exact == '{"b": [5, {"c": "R"}]}'
        assert rows["nested"].nat == '{"b":[5,{"c":"R"}]}'

    def test_get_array_elements_and_null_literal(self, docs_df):
        rows = {
            r.name: r
            for r in docs_df.select(
                "name",
                jsonf.json_get_array("j").alias("exact"),
                native.json_get_array_variant("j").alias("nat"),
            ).collect()
        }
        # literal null element renders as 'null' on both tiers
        assert rows["arr_null"].exact == ['"x"', "7", "null"]
        assert rows["arr_null"].nat == ['"x"', "7", "null"]
        # non-arrays -> NULL on both
        assert rows["flat_int"].exact is None and rows["flat_int"].nat is None
        assert rows["invalid"].nat is None

    def test_object_keys_and_length_with_path(self, docs_df):
        rows = {
            r.name: r
            for r in docs_df.select(
                "name",
                native.json_object_keys_variant("j", "a").alias("keys"),
                native.json_length_variant("j", "a").alias("alen"),
                native.json_length_variant("j", "a", "b").alias("blen"),
            ).collect()
        }
        assert rows["nested"].keys == ["b"]
        assert rows["nested"].alen == 1 and rows["nested"].blen == 2
        assert rows["empty_arr"].blen == 0
        # scalar / missing / invalid -> NULL
        assert rows["flat_int"].keys is None and rows["flat_int"].alen is None
        assert rows["invalid"].alen is None

    def test_union_struct_agrees_on_envelope_values(self, spark):
        # json_get_variant builds the SAME tagged-union struct as the
        # exact tier for int/str/bool/json-null/overflow/missing/invalid
        docs = [
            '{"k": 1}', '{"k": "s"}', '{"k": true}', '{"k": null}',
            '{"k": 123456789012345678901234}',  # > i64 -> null arm
            "{", None, "{}",
            '{"k": 4.25}',
        ]
        df = spark.createDataFrame([(d,) for d in docs], "j string")
        rows = df.select(
            "j",
            jsonf.json_get("j", "k").alias("e"),
            native.json_get_variant("j", "k").alias("v"),
        ).collect()
        for r in rows:
            assert r.e == r.v, (r.j, r.e, r.v)

    def test_union_struct_pinned_divergences(self, spark):
        # documented envelope: containers re-serialize minified, and
        # integral JSON floats re-encode as DECIMAL(p,0) -> INT arm
        df = spark.createDataFrame(
            [('{"k": [1, 2]}',), ('{"k": 5.0}',)], "j string"
        )
        rows = df.select(
            jsonf.json_get("j", "k").alias("e"),
            native.json_get_variant("j", "k").alias("v"),
        ).collect()
        assert rows[0].e.array == "[1, 2]" and rows[0].v.array == "[1,2]"
        assert rows[1].e.type_id == 3 and rows[1].e.float == 5.0
        assert rows[1].v.type_id == 2 and rows[1].v.int == 5

    def test_union_variant_zero_hop(self, spark):
        df = spark.createDataFrame([('{"k": 1}',)], "j string")
        out = df.select(native.json_get_variant("j", "k"))
        assert arrow_eval_count(out) == 0

    def test_union_variant_feeds_union_consumers(self, spark):
        # the struct is layout-identical, so exact-tier union consumers
        # (json_is_null / IS NULL semantics) compose with it
        df = spark.createDataFrame(
            [('{"k": 1}',), ('{"k": null}',), ("{}",)], "j string"
        )
        u = native.json_get_variant("j", "k")
        rows = df.select(
            jsonf.json_is_null(u).alias("isn"), u.isNull().alias("sqln")
        ).collect()
        assert [r.isn for r in rows] == [False, True, True]
        assert [r.sqln for r in rows] == [False, True, True]

    def test_union_to_text_native_matches_kernel(self, spark):
        # the pure-Column formatter must agree with the exact kernel on
        # every arm: quoting/escaping for strings (Jackson == the
        # kernel's canonical dumps), bool/int digits, plain-decimal
        # floats, raw containers, null taxonomy
        docs = [
            '{"k": 1}', '{"k": "a\\"b\\\\c"}', '{"k": null}', '{"k": true}',
            '{"k": [1, 2]}', '{"k": {"x":1}}', '{"k": 4.25}',
            '{"k": "héllo\\t!"}', "{", None,
        ]
        df = spark.createDataFrame([(d,) for d in docs], "j string")
        rows = df.select(
            jsonf.json_union_to_text(jsonf.json_get("j", "k")).alias("e"),
            native.json_union_to_text_native(jsonf.json_get("j", "k")).alias("n"),
        ).collect()
        for r, d in zip(rows, docs):
            assert r.e == r.n, (d, r.e, r.n)

    def test_union_to_text_native_float_exponent_divergence_pinned(self, spark):
        df = spark.createDataFrame([('{"k": 1e17}',)], "j string")
        r = df.select(
            jsonf.json_union_to_text(jsonf.json_get("j", "k")).alias("e"),
            native.json_union_to_text_native(jsonf.json_get("j", "k")).alias("n"),
        ).collect()[0]
        assert r.e == "1e+17" and r.n == "1.0E17"  # documented envelope

    def test_union_roundtrip_fully_zero_hop(self, spark):
        # json_get_variant -> json_union_to_text_native: the union
        # roundtrip with no Python stage at all
        df = spark.createDataFrame([('{"k": 1}',)], "j string")
        out = df.select(
            native.json_union_to_text_native(native.json_get_variant("j", "k"))
        )
        assert arrow_eval_count(out) == 0

    def test_contains_agrees_including_present_null(self, docs_df):
        rows = {
            r.name: r
            for r in docs_df.select(
                "name",
                jsonf.json_contains("j", "d").alias("e_d"),
                native.json_contains_variant("j", "d").alias("n_d"),
                jsonf.json_contains("j", "a", "b", 1).alias("e_ab1"),
                native.json_contains_variant("j", "a", "b", 1).alias("n_ab1"),
                jsonf.json_contains("j", "a", "x").alias("e_ax"),
                native.json_contains_variant("j", "a", "x").alias("n_ax"),
            ).collect()
        }
        # present-null => TRUE on BOTH tiers (reference
        # src/json_contains.rs:19-106 — the case Spark's variant model
        # gets right via is-SQL-null vs is-variant-null)
        assert rows["nested"].e_d is True and rows["nested"].n_d is True
        assert rows["nested"].e_ab1 is True and rows["nested"].n_ab1 is True
        # missing key / missing in subtree => FALSE on both
        assert rows["nested"].e_ax is False and rows["nested"].n_ax is False
        assert rows["flat_int"].e_d is False and rows["flat_int"].n_d is False
        # invalid / NULL documents => FALSE on both
        assert rows["invalid"].n_d is False and rows["null_doc"].n_d is False
        assert rows["invalid"].e_d is False and rows["null_doc"].e_d is False

    def test_contains_variant_requires_path(self):
        with pytest.raises(ValueError):
            native.json_contains_variant("j")

    def test_as_text_agrees_and_pins_minification(self, docs_df):
        rows = {
            r.name: r
            for r in docs_df.select(
                "name",
                jsonf.json_as_text("j", "a").alias("e_a"),
                native.json_as_text_variant("j", "a").alias("n_a"),
                jsonf.json_as_text("j", "d").alias("e_d"),
                native.json_as_text_variant("j", "d").alias("n_d"),
                jsonf.json_as_text("j", "a", "b", 1, "c").alias("e_c"),
                native.json_as_text_variant("j", "a", "b", 1, "c").alias("n_c"),
            ).collect()
        }
        # scalars agree: string rendered bare, int as digits
        assert rows["nested"].e_c == rows["nested"].n_c == "R"
        assert rows["flat_int"].e_a == rows["flat_int"].n_a == "1"
        # JSON null -> SQL NULL on both
        assert rows["nested"].e_d is None and rows["nested"].n_d is None
        # invalid / NULL doc -> NULL on both
        assert rows["invalid"].n_a is None and rows["null_doc"].n_a is None
        # divergence pinned: containers come back minified on the
        # variant tier, verbatim slice on the exact tier
        assert rows["nested"].e_a == '{"b": [5, {"c": "R"}]}'
        assert rows["nested"].n_a == '{"b":[5,{"c":"R"}]}'

    def test_variant_tier_has_no_python_stage(self, docs_df):
        df = docs_df.select(
            native.json_get_json_variant("j", "a"),
            native.json_get_array_variant("j", "a", "b"),
            native.json_object_keys_variant("j", "a"),
            native.json_length_variant("j", "a"),
            native.json_as_text_variant("j", "a"),
            native.json_contains_variant("j", "a"),
        )
        assert arrow_eval_count(df) == 0


class TestRegisterNative:
    """register_native(spark): the variant tier as Spark 4 SQL UDFs —
    bodies inline into Catalyst (zero Python hops), single path-key
    arity, native.jsonpath's refusal for JSONPath-syntax keys."""

    @pytest.fixture(autouse=True)
    def _reg(self, spark):
        from datafusion_functions_json_spark.register import register_native

        register_native(spark)
        df = spark.createDataFrame(
            [
                ('{"k": 5, "s": "hi", "b": true, "o": {"x": [1, 2]}}',),
                ("{",),
                (None,),
            ],
            ["j"],
        )
        df.createOrReplaceTempView("native_sql_t")

    def test_typed_getters(self, spark):
        r = spark.sql(
            "select json_get_int_variant(j,'k') i, "
            "json_get_str_variant(j,'s') s, "
            "json_get_bool_variant(j,'b') b, "
            "json_get_json_variant(j,'o') o, "
            "json_keys_variant(j,'o') ks, "
            "json_length_variant(j,'o') n "
            "from native_sql_t where j is not null and json_get_int_variant(j,'k') is not null"
        ).collect()[0]
        assert (r.i, r.s, r.b) == (5, "hi", True)
        assert r.o == '{"x":[1,2]}' and r.ks == ["x"] and r.n == 1

    def test_contains_and_as_text_sql(self, spark):
        rows = spark.sql(
            "select json_contains_variant(j,'k') has_k, "
            "json_contains_variant(j,'zz') has_zz, "
            "json_as_text_variant(j,'s') s, "
            "json_as_text_variant(j,'o') o "
            "from native_sql_t"
        ).collect()
        by_valid = sorted(rows, key=lambda r: (r.has_k is not True,))
        good = by_valid[0]
        assert good.has_k is True and good.has_zz is False
        assert good.s == "hi" and good.o == '{"x":[1,2]}'
        # invalid / NULL docs: contains FALSE (never NULL), text NULL
        for r in by_valid[1:]:
            assert r.has_k is False and r.s is None

    def test_invalid_and_null_docs_are_null(self, spark):
        rows = spark.sql(
            "select json_get_int_variant(j,'k') i from native_sql_t"
        ).collect()
        assert sorted((r.i is None) for r in rows) == [False, True, True]

    def test_jsonpath_syntax_key_raises(self, spark):
        with pytest.raises(Exception, match="not expressible in JSONPath"):
            spark.sql(
                "select json_get_int_variant(j, 'a.b') from native_sql_t"
            ).collect()

    def test_plan_is_pure_jvm(self, spark):
        df = spark.sql("select json_get_int_variant(j,'k') from native_sql_t")
        assert arrow_eval_count(df) == 0


class TestVariantRandomizedDifferential:
    """Seeded randomized corpus differential: on envelope-safe documents
    (JSONPath-safe keys; strings that no engine string-coerces), the
    variant tier must agree with the exact tier for every structural and
    numeric kind — one Spark job over ~200 generated docs, not
    per-example sessions."""

    def _corpus(self):
        import json as _json
        import random

        rng = random.Random(20260814)
        # letters avoid every boolean-ish token ('true','t','yes','on',
        # 'no','off','f','n') and any numeric form, so string values are
        # coercion-inert on BOTH tiers
        letters = "ghijkpqrvwxz"

        def scalar():
            k = rng.randrange(5)
            if k == 0:
                return rng.randint(-(2**62), 2**62)
            if k == 1:
                return rng.choice([True, False])
            if k == 2:
                return None
            if k == 3:
                return round(rng.uniform(-1e6, 1e6), 3)
            return "".join(rng.choice(letters) for _ in range(rng.randrange(1, 8)))

        def value(depth):
            if depth <= 0 or rng.random() < 0.5:
                return scalar()
            if rng.random() < 0.5:
                return [value(depth - 1) for _ in range(rng.randrange(0, 4))]
            return {
                "".join(rng.choice(letters) for _ in range(rng.randrange(1, 5))): value(depth - 1)
                for _ in range(rng.randrange(0, 4))
            }

        docs = []
        for _ in range(200):
            docs.append(_json.dumps({"a": value(3), "b": value(2)}))
        docs += ["{", "", None, '{"a": }', '[1, 2']  # malformed tier parity
        return docs

    def test_all_kinds_agree(self, spark):
        df = spark.createDataFrame([(d,) for d in self._corpus()], "j string")
        cols = []
        for path in (("a",), ("b",), ("a", "x"), ("a", 0)):
            tag = "_".join(str(p) for p in path)
            cols += [
                jsonf.json_get_int("j", *path).alias(f"ei_{tag}"),
                native.json_get_int_variant("j", *path).alias(f"ni_{tag}"),
                jsonf.json_get_bool("j", *path).alias(f"eb_{tag}"),
                native.json_get_bool_variant("j", *path).alias(f"nb_{tag}"),
                jsonf.json_get_float("j", *path).alias(f"ef_{tag}"),
                native.json_get_float_variant("j", *path).alias(f"nf_{tag}"),
                jsonf.json_contains("j", *path).alias(f"ee_{tag}"),
                native.json_contains_variant("j", *path).alias(f"ne_{tag}"),
                jsonf.json_length("j", *path).alias(f"el_{tag}"),
                native.json_length_variant("j", *path).alias(f"nl_{tag}"),
            ]
        import json as _json

        def nav(doc, path):
            cur = doc
            for p in path:
                if isinstance(p, str):
                    if not isinstance(cur, dict) or p not in cur:
                        return (False, None)
                    cur = cur[p]
                else:
                    if isinstance(cur, bool) or not isinstance(cur, list):
                        return (False, None)
                    if p >= len(cur):
                        return (False, None)
                    cur = cur[p]
            return (True, cur)

        rows = df.select("j", *cols).collect()
        checked = 0
        for r in rows:
            d = r.asDict()
            try:
                dom = _json.loads(r.j) if r.j else None
            except Exception:
                dom = None
            for path in (("a",), ("b",), ("a", "x"), ("a", 0)):
                tag = "_".join(str(p) for p in path)
                found, v = nav(dom, path) if dom is not None else (False, None)
                is_bool = isinstance(v, bool)
                is_num = isinstance(v, (int, float)) and not is_bool
                for e, n in (("ei", "ni"), ("eb", "nb"), ("ef", "nf"),
                             ("ee", "ne"), ("el", "nl")):
                    # documented envelope: variant CASTS across scalar
                    # types where the exact tier is strict — skip the
                    # cross-type cells, compare everything else
                    if e == "ei" and found and (is_bool or isinstance(v, float)):
                        continue
                    if e == "eb" and found and is_num:
                        continue
                    if e == "ef" and found and is_bool:
                        continue
                    ev, nv = d[f"{e}_{tag}"], d[f"{n}_{tag}"]
                    checked += 1
                    assert ev == nv or (
                        ev is not None and nv is not None
                        and isinstance(ev, float) and abs(ev - nv) < 1e-9
                    ), (e, tag, ev, nv, r.j)
        assert checked > 3000  # the skips must not hollow out the test


class TestRecommendTier:
    """recommend_tier folds the per-function envelope docstrings into
    one decision; these pin the fold against the documented envelopes."""

    def test_permissive_profile_picks_jvm_tiers(self):
        rec = native.recommend_tier("4.1.2")
        # the variant tier is the fastest equivalent path for clean data
        assert rec["json_get_int"] == "variant"
        assert rec["json_as_text"] == "variant"
        assert rec["json_contains"] == "variant"
        assert rec["json_length"] == "variant"
        # the union builders measured FASTER on the exact tier; the JVM
        # twin is a deployment option, not a speed recommendation
        assert rec["json_get"] == "exact"
        assert rec["json_union_to_text"] == "exact"
        # nothing to beat: already pure Column exprs
        assert rec["json_from_scalar"] == "exact"
        assert len(rec) == 13

    def test_spark3_falls_back_to_get_json_object_tier(self):
        rec = native.recommend_tier("3.5.1")
        # no VariantType before 4.0: functions with a get_json_object
        # twin drop to it, variant-only functions drop to exact
        assert rec["json_get_int"] == "native"
        assert rec["json_as_text"] == "native"
        assert rec["json_length"] == "native"
        assert rec["json_get_str"] == "exact"
        assert rec["json_contains"] == "exact"

    def test_strict_profile_is_all_exact(self):
        rec = native.recommend_tier("4.1.2", native.JsonProfile.strict())
        assert set(rec.values()) == {"exact"}

    def test_individual_envelope_flags(self):
        P = native.JsonProfile
        # special key chars kill every JSONPath tier
        rec = native.recommend_tier("4.1.2", P(special_key_chars=True))
        assert set(rec.values()) == {"exact"}
        # raw-slice fidelity kills the re-serializing getters only
        rec = native.recommend_tier("4.1.2", P(needs_raw_slices=True))
        assert rec["json_get_json"] == "exact"
        assert rec["json_as_text"] == "exact"
        assert rec["json_get_array"] == "exact"
        assert rec["json_get_int"] == "variant"  # ints have no raw-slice issue
        assert rec["json_contains"] == "variant"
        # coercion-rule parity kills the typed getters only
        rec = native.recommend_tier("4.1.2", P(mixed_types_at_paths=True))
        assert rec["json_get_int"] == "exact"
        assert rec["json_get_str"] == "exact"
        assert rec["json_length"] == "variant"

    def test_no_python_workers_prefers_jvm_even_when_slower(self):
        rec = native.recommend_tier(
            "4.1.2", native.JsonProfile(no_python_workers=True)
        )
        assert rec["json_get"] == "variant"
        assert rec["json_union_to_text"] == "native"
        # exponent-float fidelity still wins over deployment preference
        rec = native.recommend_tier(
            "4.1.2",
            native.JsonProfile(no_python_workers=True, exponent_floats=True),
        )
        assert rec["json_union_to_text"] == "exact"

    def test_tier_callable_resolves_and_agrees(self, spark):
        rec = native.recommend_tier()
        fn = native.tier_callable("json_get_int", rec["json_get_int"])
        exact = native.tier_callable("json_get_int", "exact")
        df = spark.createDataFrame(
            [('{"k": 7}',), ('{"k": null}',), ("not json",), (None,)], "j string"
        )
        got = df.select(
            fn("j", "k").alias("a"), exact("j", "k").alias("b")
        ).collect()
        assert [(r.a, r.b) for r in got] == [(7, 7), (None, None),
                                             (None, None), (None, None)]

    def test_tier_callable_errors(self):
        with pytest.raises(KeyError):
            native.tier_callable("not_a_function", "exact")
        with pytest.raises(ValueError):
            native.tier_callable("json_contains", "native")  # no such twin
        with pytest.raises(ValueError):
            native.tier_callable("json_get_int", "warp")
        with pytest.raises(ValueError):
            native.recommend_tier("not-a-version")
