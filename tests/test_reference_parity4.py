"""Fourth-pass parity: behaviors flagged by a line-citation audit of
tests/main.rs that had no explicit pin yet — string-parse scalar
coercions, union casts, double-nested union chaining with column keys,
operator filters, and the ->> cast (which must NOT elide)."""

import pytest
from pyspark.sql import functions as F

import datafusion_functions_json_spark as jsonf


class TestStringParseScalars:
    """reference: tests/main.rs:346-387 — JSON *string* payloads parse
    into the requested scalar type; unparseable strings yield NULL."""

    def test_float_from_string(self, spark):
        df = spark.createDataFrame(
            [('{"a": "1.5", "b": "42", "c": "abc"}',)], "j string"
        )
        r = df.select(
            jsonf.json_get_float("j", "a").alias("a"),
            jsonf.json_get_float("j", "b").alias("b"),
            jsonf.json_get_float("j", "c").alias("c"),
        ).collect()[0]
        assert (r.a, r.b, r.c) == (1.5, 42.0, None)

    def test_bool_from_string(self, spark):
        df = spark.createDataFrame(
            [('{"a": "true", "b": "false", "c": "abc"}',)], "j string"
        )
        r = df.select(
            jsonf.json_get_bool("j", "a").alias("a"),
            jsonf.json_get_bool("j", "b").alias("b"),
            jsonf.json_get_bool("j", "c").alias("c"),
        ).collect()[0]
        assert (r.a, r.b, r.c) == (True, False, None)

    def test_int_from_string(self, spark):
        # reference: tests/main.rs:320-345 (json_get_int string parse)
        df = spark.createDataFrame([('{"a": "99", "b": "x"}',)], "j string")
        r = df.select(
            jsonf.json_get_int("j", "a").alias("a"),
            jsonf.json_get_int("j", "b").alias("b"),
        ).collect()[0]
        assert (r.a, r.b) == (99, None)


class TestUnionCasts:
    """reference: tests/main.rs:449-485, 1754-1760 — casting the union
    result of json_get elides into the typed getter."""

    def test_cast_float_scientific(self, spark):
        df = spark.createDataFrame([('{"foo": 4.2e2}',)], "j string")
        jc = jsonf.col("j")
        assert df.select(jc["foo"].cast("double").alias("v")).collect()[0].v == 420.0

    def test_cast_bool(self, spark):
        df = spark.createDataFrame([('{"foo": true}',)], "j string")
        jc = jsonf.col("j")
        assert df.select(jc["foo"].cast("boolean").alias("v")).collect()[0].v is True

    def test_cast_numeric_equals_literal(self, spark):
        # (json_get(...)::numeric = 420) -> true
        df = spark.createDataFrame([('{"foo": 420}',)], "j string")
        jc = jsonf.col("j")
        assert (
            df.select((jc["foo"].cast("bigint") == 420).alias("v")).collect()[0].v
            is True
        )


class TestMoreNestedDoubleSkip:
    def test_union_array_skip_double_nested(self, more_nested_df):
        # reference: tests/main.rs:1139-1159 — three chained json_get
        # calls with COLUMN keys; [1] at index 0 under key 'spam' and a
        # JSON null both yield NULL, only the real [0] row resolves
        u1 = jsonf.json_get("json_data", F.col("str_key1"))
        u2 = jsonf.json_get(u1, F.col("str_key2"))
        rows = more_nested_df.select(
            jsonf.json_get_int(u2, F.col("int_key")).alias("v")
        ).collect()
        assert [r.v for r in rows] == [0, None, None]


class TestOperatorFilters:
    def test_question_filter_sql(self, spark, test_df):
        # reference: tests/main.rs:1591-1611 — `?` inside a WHERE clause
        jsonf.register_all(spark)
        rows = jsonf.sql(
            spark, "select name from test where json_data ? 'foo'"
        ).collect()
        assert [r.name for r in rows] == [
            "object_foo", "object_foo_array", "object_foo_obj", "object_foo_null",
        ]

    def test_long_arrow_cast_values(self, spark, other_df):
        # reference: tests/main.rs:1732-1753 — (j->>'foo')::int casts the
        # TEXT result (no elision into json_get_int; the object rows hold
        # 42, the array rows miss the key)
        jsonf.register_all(spark)
        rows = jsonf.sql(
            spark, "select (json_data->>'foo')::int as v from other"
        ).collect()
        assert [r.v for r in rows] == [42, 42, None, None]


class TestDictNullMasking:
    """reference: tests/main.rs:1781-1845 (test_dict_get_no_null_values
    + check_for_null_dictionary_values) — the reference asserts that no
    non-null dictionary KEY points at a null VALUE, i.e. a missing path
    must surface as a null RESULT, never as a present union whose arms
    are null. Dictionary encoding is Arrow-physical (no Spark logical
    analog), so the portable invariant is value-level: the union struct
    is null exactly on miss rows, and on hit rows exactly the matched
    arm is populated (union.py's whole-struct-NULL masking)."""

    # the reference's build_dict_schema values (tests/main.rs:1970-1982)
    ROWS = [
        '{"foo": "bar"}',
        '{"baz": "fizz"}',
        "nah",
        '{"baz": "abcd"}',
        None,
        '{"baz": "fizz"}',
        '{"baz": "fizz"}',
        '{"baz": "fizz"}',
        '{"baz": "fizz"}',
        None,
    ]

    def test_get_masks_misses_entirely(self, spark):
        df = spark.createDataFrame([(i, x) for i, x in enumerate(self.ROWS)], "i int, x string")
        out = (
            df.select(
                "i",
                jsonf.json_get("x", "baz").alias("v"),
                jsonf.json_get_str("x", "baz").alias("s"),
            )
            .orderBy("i")
            .collect()
        )
        expect_str = [None, "fizz", None, "abcd", None, "fizz", "fizz", "fizz", "fizz", None]
        assert [r.s for r in out] == expect_str
        for r, want in zip(out, expect_str):
            if want is None:
                # masking invariant: whole union NULL, not a husk struct
                assert r.v is None
            else:
                assert r.v is not None and r.v.str == want
                # exactly one arm set
                arms = [f for f in r.v.asDict() if f != "type_id" and r.v[f] is not None]
                assert arms == ["str"]


class TestSqlFromScalarNonFinite:
    """reference: tests/main.rs:2550-2577 — NaN/±Infinity stay in the
    float arm through the *registered SQL* json_from_scalar too (the
    Arrow argument type distinguishes NaN-as-value from null, so the
    SQL boundary no longer collapses NaN to the null arm)."""

    @pytest.fixture(autouse=True)
    def _reg(self, spark):
        jsonf.register_all(spark)
        df = spark.createDataFrame(
            [(float("nan"),), (float("inf",),), (float("-inf"),), (None,), (1.5,)],
            "f double",
        )
        df.createOrReplaceTempView("nonfinite")

    def test_float_arm_preserved(self, spark):
        rows = spark.sql(
            "select f, json_from_scalar(f) u from nonfinite"
        ).collect()
        got = {repr(r.f): jsonf.format_union_value(r.u) for r in rows}
        assert got["nan"] == "{float=NaN}"
        assert got["inf"] == "{float=inf}"
        assert got["-inf"] == "{float=-inf}"
        assert got["None"] == "{null=}"
        assert got["1.5"] == "{float=1.5}"

    def test_to_text_renders_serde_null(self, spark):
        # serde_json writes non-finite floats as JSON null
        rows = spark.sql(
            "select f, json_union_to_text(json_from_scalar(f)) t from nonfinite"
        ).collect()
        got = {repr(r.f): r.t for r in rows}
        assert got["nan"] == "null"
        assert got["inf"] == "null"
        assert got["1.5"] == "1.5"
        assert got["None"] is None

    def test_nullable_int_column_stays_int_arm(self, spark):
        # the old pandas boundary turned int-with-nulls into float NaN;
        # Arrow keeps int64 validity, so values stay in the int arm
        df = spark.createDataFrame([(7,), (None,)], "i long")
        df.createOrReplaceTempView("nullable_ints")
        rows = spark.sql(
            "select i, json_from_scalar(i) u from nullable_ints"
        ).collect()
        got = {r.i: jsonf.format_union_value(r.u) for r in rows}
        assert got[7] == "{int=7}"
        assert got[None] == "{null=}"

    def test_unsupported_type_raises(self, spark):
        # reference: src/json_from_scalar.rs:65 plan error
        with pytest.raises(Exception, match="Unsupported type for json_from_scalar"):
            spark.sql("select json_from_scalar(date'2020-01-01')").collect()
