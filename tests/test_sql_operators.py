"""The ``->`` / ``->>`` / ``?`` SQL-string surface (jsonf.sql).

Ports the reference's operator tests (reference: tests/main.rs:1300-1420
arrow chains + aliases, 1533-1545 lexical precedence, 1549-1565 question
mark) through the text pre-processor, plus the Spark-specific
non-interference guarantees (lambda arrows, positional parameters).
"""

from __future__ import annotations

import pytest

import datafusion_functions_json_spark as jsonf
from datafusion_functions_json_spark.sql import rewrite_sql


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    jsonf.register_all(spark)


class TestRewrite:
    """Pure text rewriting — no SparkSession."""

    def test_single_arrow(self):
        assert rewrite_sql("select json_data->'foo' from test") == (
            "select json_get(json_data, 'foo') AS `json_data -> 'foo'` from test"
        )

    def test_chain_unnests_into_one_call(self):
        # reference: tests/main.rs test_plan_arrow_double_nested —
        # json_get(json_data, 'foo', 0) with the operator spelling alias
        assert rewrite_sql("select json_data->'foo'->0 from test") == (
            "select json_get(json_data, 'foo', 0) "
            "AS `json_data -> 'foo' -> 0` from test"
        )

    def test_qualified_column_alias_drops_relation(self):
        # reference: expr_to_sql_repr uses Column.name without relation
        assert rewrite_sql("select t.json_data->'foo' from t") == (
            "select json_get(t.json_data, 'foo') AS `json_data -> 'foo'` from t"
        )

    def test_long_arrow_chain_stays_nested(self):
        # json_as_text returns SQL text, so the un-nest guard refuses to
        # flatten through it (reference: src/rewrite.rs:76-80)
        assert rewrite_sql("select j->>'foo'->>0 from t") == (
            "select json_as_text(json_as_text(j, 'foo'), 0) "
            "AS `j ->> 'foo' ->> 0` from t"
        )

    def test_question_not_unnested(self):
        # json_contains is not in the reference's un-nest list
        assert rewrite_sql("select j->'a' ? 'b' from t") == (
            "select json_contains(json_get(j, 'a'), 'b') AS `j -> 'a' ? 'b'` from t"
        )

    def test_embedded_expr_gets_no_alias(self):
        # reference: test_lexical_precedence_correct — operator binds
        # tighter than '='; an embedded chain takes no alias
        assert rewrite_sql("select j->>'a'='b' as v from t") == (
            "select json_as_text(j, 'a')='b' as v from t"
        )

    def test_where_clause_no_alias(self):
        assert rewrite_sql("select * from t where props ? 'k'") == (
            "select * from t where json_contains(props, 'k')"
        )

    def test_lambda_arrows_untouched(self):
        for q in (
            "select transform(arr, x -> x + 1) from t",
            "select transform(arr, x -> 'a') from t",
            "select filter(arr, x -> 7) from t",
            "select aggregate(arr, 0, (acc, x) -> acc + x) from t",
        ):
            assert rewrite_sql(q) == q

    def test_positional_params_untouched(self):
        q = "select * from t where x = ? and y = ?"
        assert rewrite_sql(q) == q

    def test_strings_and_comments_opaque(self):
        q = "select '-> not an op', col /* j->'x' */ from t -- j ? 'y'"
        assert rewrite_sql(q) == q

    def test_user_json_get_call_unnests(self):
        # reference: JsonFunctionRewriter un-nests user-written calls too
        assert rewrite_sql("select json_get(j, 'a')->'b' from t") == (
            "select json_get(j, 'a', 'b') AS `json_get(j, 'a') -> 'b'` from t"
        )

    def test_null_path_plan_error(self):
        # reference: tests/main.rs:291-298
        with pytest.raises(ValueError, match="got Null"):
            rewrite_sql("select j -> null from t")
        with pytest.raises(ValueError, match=r"'json_get_str' at position 2.*got Null"):
            rewrite_sql("select json_get_str('{}', null)")

    def test_float_path_plan_error(self):
        with pytest.raises(ValueError, match="got Float64"):
            rewrite_sql("select j -> 1.5 from t")

    def test_one_column_path_element_rule(self):
        # reference: src/common.rs:129-133
        with pytest.raises(ValueError, match="More than 1 path element"):
            rewrite_sql("select json_get(j, k_col, 'x') from t")
        # a single column path element is allowed
        q = "select json_get(j, k_col) from t"
        assert rewrite_sql(q) == q

    def test_from_scalar_arity_errors(self):
        # reference: tests/main.rs:2643-2660 — json_from_scalar is
        # exactly-one-arg; both violations are plan (rewrite-time) errors
        with pytest.raises(ValueError, match="expected 1 arguments but received 0"):
            rewrite_sql("select json_from_scalar()")
        with pytest.raises(
            ValueError,
            match="'json_from_scalar' expected 1 arguments but received 2",
        ):
            rewrite_sql("select json_from_scalar(1, 2)")
        # the alias enforces the same signature
        with pytest.raises(ValueError, match="'scalar_to_json' expected 1"):
            rewrite_sql("select scalar_to_json(1, 2)")
        # exactly one arg passes through untouched
        q = "select json_from_scalar(1)"
        assert rewrite_sql(q) == q

    def test_cast_in_key_alias_parity(self):
        # reference tests/main.rs:1276-1294 (test_arrow_cast_key_text):
        # a cast in the key is elided from BOTH the call and the
        # operator-spelling alias, and redundant enclosing parens don't
        # block the alias (the reference aliases the expression node)
        got = rewrite_sql("""select ('{"foo": 42}'->>('foo'::text))""")
        assert got == (
            """select (json_as_text('{"foo": 42}', 'foo'))"""
            """ AS `'{"foo": 42}' ->> 'foo'`"""
        )

    def test_paren_wrapped_chain_keeps_alias(self):
        got = rewrite_sql("""select ('{"foo": [1]}'->'foo'->0)""")
        assert got.endswith("AS `'{\"foo\": [1]}' -> 'foo' -> 0`")

    def test_paren_of_function_arg_gets_no_alias(self):
        # the ( ... ) here belongs to length(), not a redundant wrap
        got = rewrite_sql("""select length(j->>'a') from t""")
        assert "AS" not in got

    def test_case_end_left_operand_passes_through(self):
        q = "select case when x then j end ->'k' from t"
        assert rewrite_sql(q) == q

    def test_cast_elision_double_colon(self):
        # reference: tests/main.rs test_plan_arrow_double_nested_cast —
        # the cast picks the typed variant, alias keeps operator spelling
        assert rewrite_sql(
            "select (json_data->'foo'->0)::int from test"
        ) == (
            "select json_get_int(json_data, 'foo', 0) "
            "AS `json_data -> 'foo' -> 0` from test"
        )

    def test_cast_elision_cast_form(self):
        assert rewrite_sql("select cast(j->'a' as string) from t") == (
            "select json_get_str(j, 'a') AS `j -> 'a'` from t"
        )

    def test_cast_not_elided_through_as_text(self):
        # reference: test_plan_double_arrow_double_nested_cast —
        # json_as_text(..)::int is NOT json_get_int; the cast stays
        assert rewrite_sql("select (j->>'foo'->>0)::int from t") == (
            "select (json_as_text(json_as_text(j, 'foo'), 0))::int from t"
        )

    def test_unmapped_cast_type_passes_through(self):
        assert rewrite_sql("select (j->'a')::date from t") == (
            "select (json_get(j, 'a'))::date from t"
        )


class TestCastKeyOperands:
    def test_cast_text_key_collapses(self):
        # reference: tests/main.rs:1278-1296 (test_arrow_cast_key_text) —
        # ('foo'::text) as a path operand is the literal
        assert rewrite_sql("select j->('foo'::text) from t") == (
            "select json_get(j, 'foo') AS `j -> 'foo'` from t"
        )
        assert rewrite_sql("select j->>('foo'::varchar) from t") == (
            "select json_as_text(j, 'foo') AS `j ->> 'foo'` from t"
        )

    def test_plain_paren_literal_collapses(self):
        assert rewrite_sql("select j->(0) from t") == (
            "select json_get(j, 0) AS `j -> 0` from t"
        )

    def test_in_list_and_lambda_untouched(self):
        assert rewrite_sql("select x from t where a in ('a')") == (
            "select x from t where a in ('a')"
        )
        assert rewrite_sql("select transform(arr, x -> (x)) from t") == (
            "select transform(arr, x -> (x)) from t"
        )

    def test_unsupported_cast_type_untouched(self):
        assert rewrite_sql("select j->('foo'::date) from t") == (
            "select j->('foo'::date) from t"
        )

    def test_cast_key_executes(self, spark, test_df):
        import datafusion_functions_json_spark as jsonf

        jsonf.register_all(spark)
        rows = jsonf.sql(
            spark, "select name, json_data->>('foo'::text) as v from test"
        ).collect()
        assert [r.v for r in rows][:2] == ["abc", "[1]"]


class TestOperatorExecution:
    """Ported reference expectations over the shared `test` table."""

    def _rows(self, spark, q):
        df = jsonf.sql(spark, q)
        return {r[0]: tuple(r)[1:] for r in df.collect()}, df

    def test_arrow_double_nested_values(self, spark, test_df):
        # reference: tests/main.rs test_arrow_double_nested — only
        # object_foo_array has {int=1}; every other row is the null arm
        got, df = self._rows(
            spark, "select name, json_data->'foo'->0 from test"
        )
        assert df.columns[1] == "json_data -> 'foo' -> 0"
        for name, (u,) in got.items():
            if name == "object_foo_array":
                assert (u.type_id, u.int) == (2, 1)
            else:
                # null arm -> whole-struct NULL (the Python API's rewrap,
                # matched on the SQL surface since round 5)
                assert u is None or u.type_id in (0, None)

    def test_double_arrow_double_nested_values(self, spark, test_df):
        # reference: tests/main.rs test_double_arrow_double_nested
        got, df = self._rows(
            spark, "select name, json_data->>'foo'->>0 from test"
        )
        assert df.columns[1] == "json_data ->> 'foo' ->> 0"
        for name, (v,) in got.items():
            assert v == ("1" if name == "object_foo_array" else None)

    def test_question_mark_contains(self, spark, test_df):
        # reference: tests/main.rs test_question_mark_contains
        got, df = self._rows(spark, "select name, json_data ? 'foo' from test")
        assert df.columns[1] == "json_data ? 'foo'"
        expected = {
            "object_foo": True,
            "object_foo_array": True,
            "object_foo_obj": True,
            "object_foo_null": True,
            "object_bar": False,
            "list_foo": False,
            "invalid_json": False,
        }
        assert {k: v[0] for k, v in got.items()} == expected

    def test_lexical_precedence(self, spark):
        # reference: tests/main.rs test_lexical_precedence_correct
        row = jsonf.sql(
            spark, """select '{"a": "b"}'->>'a'='b' as v"""
        ).collect()[0]
        assert row.v is True

    def test_mixed_chain_contains(self, spark, test_df):
        got, _ = self._rows(
            spark, "select name, json_data->'foo' ? 'x' from test"
        )
        assert all(v == (False,) for v in got.values())

    def test_arrow_double_nested_cast_values(self, spark, test_df):
        # reference: tests/main.rs test_arrow_double_nested_cast — only
        # object_foo_array yields 1; everything else NULL
        got, df = self._rows(
            spark, "select name, (json_data->'foo'->0)::int from test"
        )
        assert df.columns[1] == "json_data -> 'foo' -> 0"
        for name, (v,) in got.items():
            assert v == (1 if name == "object_foo_array" else None)

    def test_double_arrow_double_nested_cast_values(self, spark, test_df):
        # reference: tests/main.rs test_double_arrow_double_nested_cast —
        # the TEXT result is cast natively; same value table
        got, _ = self._rows(
            spark,
            "select name, (json_data->>'foo'->>0)::int as v from test",
        )
        for name, (v,) in got.items():
            assert v == (1 if name == "object_foo_array" else None)

    def test_lambda_executes_through_jsonf_sql(self, spark):
        row = jsonf.sql(
            spark, "select transform(array(1, 2), x -> x + 1) as r"
        ).collect()[0]
        assert row.r == [2, 3]
