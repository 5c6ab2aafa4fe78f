"""Third-pass parity: the inline-literal corpus from FIXTURES.md (the
reference's remaining behavioral pins) + the dicts/data fixture tables
as plain-value tests (dictionary encoding is Arrow-physical; the VALUES
are the contract)."""

import pytest
from pyspark.sql import functions as F

import datafusion_functions_json_spark as jsonf


class TestMalformedPrefixParseable:
    def test_bench_doc_unclosed_key_quote(self, spark):
        # reference: tests/main.rs:283-288 — malformed tail, but ('a','aa')
        # resolves before the parser reaches the damage
        doc = '{"a": {"aa": "x", "ab: "y"}, "b": []}'
        df = spark.createDataFrame([(doc,)], "j string")
        r = df.select(
            jsonf.json_get_str("j", "a", "aa").alias("v"),
            jsonf.json_contains("j", "a", "aa").alias("c"),
        ).collect()[0]
        assert (r.v, r.c) == ("x", True)

    def test_missing_closing_bracket_deep_path(self, spark):
        # reference: tests/main.rs:405-410
        doc = '{"foo": [null, {"x": false, "bar": 73}}'
        df = spark.createDataFrame([(doc,)], "j string")
        assert (
            df.select(jsonf.json_get_int("j", "foo", 1, "bar").alias("v"))
            .collect()[0]
            .v
            == 73
        )


class TestSmallCorpus:
    def test_empty_string_key(self, spark):
        # reference: tests/main.rs:474-475
        df = spark.createDataFrame([('{"": false}',)], "j string")
        assert df.select(jsonf.json_get_bool("j", "").alias("v")).collect()[0].v is False

    def test_typed_compare(self, spark):
        # reference: tests/main.rs:388-391 — json_get(...)::int < 20
        df = spark.createDataFrame([('{"i": 19}',), ('{"i": 21}',)], "j string")
        jc = jsonf.col("j")
        assert df.filter(jc["i"].cast("bigint") < 20).count() == 1

    def test_object_keys_deep_path(self, spark):
        # reference: tests/main.rs:2125-2175
        df = spark.createDataFrame(
            [('{"foo": [{"bar": {"spam": true, "ham": []}}]}',)], "j string"
        )
        assert (
            df.select(jsonf.json_object_keys("j", "foo", 0, "bar").alias("v"))
            .collect()[0]
            .v
            == ["spam", "ham"]
        )

    def test_contains_through_mixed_path(self, spark):
        # reference: tests/main.rs:56-69
        df = spark.createDataFrame([('[1, 2, {"foo": null}]',)], "j string")
        r = df.select(
            jsonf.json_contains("j", 2, "foo").alias("a"),
            jsonf.json_contains("j", 2, "bar").alias("b"),
            jsonf.json_contains("j", 3).alias("c"),
        ).collect()[0]
        assert (r.a, r.b, r.c) == (True, False, False)

    def test_json_in_string_requery(self, spark):
        # reference: tests/main.rs:877-891 — ->> unquotes the inner JSON
        # string; a second extraction then parses it
        df = spark.createDataFrame(
            [('{"user_id":"{\\"device_id\\":\\"abc\\"}"}',)], "j string"
        )
        inner = jsonf.json_as_text("j", "user_id")
        assert (
            df.select(jsonf.json_get_str(inner, "device_id").alias("v"))
            .collect()[0]
            .v
            == "abc"
        )

    def test_float_forms(self, spark):
        df = spark.createDataFrame(
            [('{"foo": 42}',), ('{"foo": 4.2}',), ('{"foo": 4.2e2}',)], "j string"
        )
        vals = [
            r.v for r in df.select(jsonf.json_get_float("j", "foo").alias("v")).collect()
        ]
        assert vals == [42.0, 4.2, 420.0]


# reference: tests/utils/mod.rs:151-235 (FIXTURES.md §4) — encodings
# collapse; the VALUES are the behavioral contract
DICTS_ROWS = [
    (' {"foo": {"bar": [0]}} ', "foo", "bar", 0),
    (' {"bar": "snap"} ', "foo", "spam", 0),
    (' {"spam": 1, "snap": 2} ', "foo", "spam", 0),
    (' {"spam": 1, "snap": 2} ', "foo", "snap", 0),
]


class TestDictsTableValues:
    @pytest.fixture(scope="class")
    def dicts_df(self, spark):
        return spark.createDataFrame(
            DICTS_ROWS,
            "json_data string, str_key1 string, str_key2 string, int_key bigint",
        )

    def test_get_with_column_needle(self, dicts_df):
        # reference: tests/main.rs:1866-1885 (dict_haystack_needle)
        rows = dicts_df.select(
            jsonf.json_get_int("json_data", F.col("str_key2")).alias("v")
        ).collect()
        assert [r.v for r in rows] == [None, None, 1, 2]

    def test_contains_and_length(self, dicts_df):
        # reference: tests/main.rs:1887-1948
        rows = dicts_df.select(
            jsonf.json_contains("json_data", F.col("str_key2")).alias("c"),
            jsonf.json_length("json_data").alias("l"),
        ).collect()
        assert [(r.c, r.l) for r in rows] == [
            (False, 1),
            (False, 1),
            (True, 2),
            (True, 2),
        ]

    def test_filter_on_json_predicate(self, dicts_df):
        # reference: tests/main.rs:1930-1948 (dict_contains_where)
        n = dicts_df.filter(
            jsonf.json_contains("json_data", F.col("str_key2"))
        ).count()
        assert n == 2

    def test_haystack_is_not_null_filter(self, dicts_df):
        # reference: tests/main.rs:1848-1864 (dict_haystack_filter) —
        # `json_get(json_data,'foo') is not null` keeps exactly the one
        # row whose 'foo' value exists, and returns the raw document
        # (surrounding whitespace preserved)
        rows = dicts_df.filter(
            ~jsonf.json_get("json_data", "foo").isNull()
        ).select("json_data").collect()
        assert [r.json_data for r in rows] == [' {"foo": {"bar": [0]}} ']

    def test_nested_get_through_dict_values(self, dicts_df):
        # reference: tests/main.rs:1761-1807 (dict_haystack)
        u = jsonf.json_get("json_data", "foo")
        rows = dicts_df.select(
            jsonf.json_union_to_text(u).alias("t")
        ).collect()
        assert [r.t for r in rows] == ['{"bar": [0]}', None, None, None]


# reference: tests/main.rs:1970-2001 (FIXTURES.md §5)
DATA_ROWS = [
    ('{"foo": "bar"}',),
    ('{"baz": "fizz"}',),
    ("nah",),
    ('{"baz": "abcd"}',),
    (None,),
    ('{"baz": "fizz"}',),
    ('{"baz": "fizz"}',),
    ('{"baz": "fizz"}',),
    ('{"baz": "fizz"}',),
    (None,),
]


class TestDataTableValues:
    @pytest.fixture(scope="class")
    def data_df(self, spark):
        return spark.createDataFrame(DATA_ROWS, "x string")

    def test_get_str_with_nulls_and_repeats(self, data_df):
        # reference: tests/main.rs:2003-2029
        vals = [
            r.v
            for r in data_df.select(jsonf.json_get_str("x", "baz").alias("v")).collect()
        ]
        assert vals == [
            None, "fizz", None, "abcd", None, "fizz", "fizz", "fizz", "fizz", None,
        ]

    def test_get_union_kind_rendering(self, data_df):
        # reference: tests/main.rs:1809-1846 (dict_get_no_null_values) —
        # json_get(x,'baz') yields the {str=...} union arm exactly where
        # a value exists, and a fully-null union (never a masked
        # non-null dictionary value) elsewhere
        rows = data_df.select(jsonf.json_get("x", "baz").alias("u")).collect()
        assert [r.u.str if r.u is not None else None for r in rows] == [
            None, "fizz", None, "abcd", None, "fizz", "fizz", "fizz", "fizz", None,
        ]
        # union_to_text serializes the str arm as JSON (quoted) — same
        # rendering union_roundtrip pins
        texts = data_df.select(
            jsonf.json_union_to_text(jsonf.json_get("x", "baz")).alias("t")
        ).collect()
        assert [r.t for r in texts] == [
            None, '"fizz"', None, '"abcd"', None,
            '"fizz"', '"fizz"', '"fizz"', '"fizz"', None,
        ]

    def test_is_not_null_filter(self, data_df):
        # reference: tests/main.rs:2031-2051 (dict_filter_is_not_null)
        n = data_df.filter(
            ~jsonf.json_get("x", "baz").isNull()
        ).count()
        assert n == 6

    def test_contains_filter(self, data_df):
        # reference: tests/main.rs:2053-2083 (dict_filter_contains)
        n = data_df.filter(jsonf.json_contains("x", "baz")).count()
        assert n == 6
