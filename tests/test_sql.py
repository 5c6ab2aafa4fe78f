"""SQL-registered surface (reference: src/lib.rs:69-96 register_all) —
named functions replace the ->/->>/? operators (SURVEY.md §2.2)."""

import pytest

import datafusion_functions_json_spark as jsonf


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    jsonf.register_all(spark)


class TestSqlSurface:
    def test_basic_query(self, spark, test_df):
        rows = spark.sql(
            """
            select name,
                   json_get_str(json_data, 'foo')  as s,
                   json_as_text(json_data, 'foo')  as t,
                   json_contains(json_data, 'foo') as c,
                   json_length(json_data)          as l
            from test order by name
            """
        ).collect()
        got = {r.name: (r.s, r.t, r.c, r.l) for r in rows}
        assert got["object_foo"] == ("abc", "abc", True, 1)
        assert got["object_foo_null"] == (None, None, True, 1)
        assert got["invalid_json"] == (None, None, False, None)

    def test_aliases(self, spark, test_df):
        r = spark.sql(
            "select json_len(json_data) a, json_keys(json_data) b from test "
            "where name = 'object_foo'"
        ).collect()[0]
        assert (r.a, r.b) == (1, ["foo"])

    def test_union_in_sql(self, spark, test_df):
        rows = spark.sql(
            """
            select name,
                   json_union_to_text(json_get(json_data, 'foo')) as t,
                   json_is_null(json_get(json_data, 'foo'))       as n
            from test order by name
            """
        ).collect()
        got = {r.name: (r.t, r.n) for r in rows}
        assert got["object_foo"] == ('"abc"', False)
        assert got["object_foo_null"] == (None, True)
        assert got["object_bar"] == (None, True)

    def test_where_and_group_by(self, spark, test_df):
        # reference: tests/main.rs:560-614
        rows = spark.sql(
            """
            select json_contains(json_data, 'foo') as has, count(*) as n
            from test group by 1 order by 1
            """
        ).collect()
        assert [(r.has, r.n) for r in rows] == [(False, 3), (True, 4)]

    def test_column_keys_from_sql(self, spark, other_df):
        # reference: tests/main.rs:413-436
        rows = spark.sql(
            """
            select json_get_int(json_data, str_key) a,
                   json_get_int(json_data, int_key) b
            from other
            """
        ).collect()
        assert [(r.a, r.b) for r in rows] == [
            (42, None),
            (None, None),
            (None, 42),
            (None, None),
        ]

    def test_nested_union_input_sql(self, spark):
        # reference: union-typed first argument continues the lookup
        # (nested call in SQL, no un-nesting rewrite available there)
        df = spark.createDataFrame(
            [('{"a": {"b": 7}}',), ('{"a": "scalar"}',)], "j string"
        )
        df.createOrReplaceTempView("nested_u")
        rows = spark.sql(
            """
            select json_union_to_text(json_get(json_get(j, 'a'), 'b')) v,
                   json_is_null(json_get(json_get(j, 'a'), 'b')) n
            from nested_u
            """
        ).collect()
        assert [(r.v, r.n) for r in rows] == [("7", False), (None, True)]

    def test_multi_literal_path_sql(self, spark):
        df = spark.createDataFrame([('{"a": {"b": [9]}}',)], "j string")
        df.createOrReplaceTempView("deep")
        assert (
            spark.sql("select json_get_int(j, 'a', 'b', 0L) v from deep").collect()[0].v
            == 9
        )
