import datetime as dt

import pytest

from wrangler_spark import execute


def test_format_date(spark):
    df = spark.createDataFrame([(dt.datetime(2016, 12, 10, 6, 45, 50),)], "ts timestamp")
    ok, _ = execute(spark, ["format-date :ts 'yyyy/MM/dd'"], df)
    assert ok.first()["ts"] == "2016/12/10"


def test_format_unix_timestamp(spark):
    df = spark.createDataFrame([(1483803222,)], "t long")
    ok, _ = execute(spark, ["format-unix-timestamp :t 'yyyy-MM-dd'"], df)
    assert ok.first()["t"] == "2017-01-07"


def test_diff_date(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 2), dt.datetime(2020, 1, 1))], "a timestamp, b timestamp"
    )
    ok, _ = execute(spark, ["diff-date :a :b :d"], df)
    assert ok.first()["d"] == 86400000


def test_timestamp_datetime_roundtrip(spark):
    df = spark.createDataFrame([(dt.datetime(2020, 5, 1, 12, 0, 0),)], "ts timestamp")
    ok, _ = execute(spark, ["timestamp-to-datetime :ts"], df)
    assert dict(ok.dtypes)["ts"] == "timestamp_ntz"
    ok2, _ = execute(spark, ["datetime-to-timestamp :ts 'UTC'"], ok)
    assert dict(ok2.dtypes)["ts"] == "timestamp"


def test_write_as_csv(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    ok, _ = execute(spark, ["write-as-csv :out"], df)
    assert ok.first()["out"] == "1,a"


def test_write_as_json_map(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    ok, _ = execute(spark, ["write-as-json-map :out"], df)
    assert ok.first()["out"] == '{"id":1,"name":"a"}'


def test_write_as_json_object(spark):
    df = spark.createDataFrame([(1, "a", True)], "id long, name string, f boolean")
    ok, _ = execute(spark, ["write-as-json-object :out :id,:name"], df)
    assert ok.first()["out"] == '{"id":1,"name":"a"}'


def test_table_lookup(spark):
    df = spark.createDataFrame([("a",), ("zz",)], "k string")
    lk = spark.createDataFrame([("a", "Apple"), ("b", "Ball")], "key string, value string")
    from wrangler_spark import compile_recipe
    from wrangler_spark.recipe.registry import RecipeContext

    ctx = RecipeContext(spark=spark, lookups={"fruits": lk})
    ok, _ = compile_recipe(["table-lookup :k fruits"]).apply(df, ctx)
    rows = {r["k"]: r["k_value"] for r in ok.collect()}
    assert rows == {"a": "Apple", "zz": None}


def test_table_lookup_multi_column_reference_pin(spark):
    """Mirrors wrangler-service TableLookupTest: `table-lookup fname
    lookupTable` over a lookup row {age, city} appends fname_age AND
    fname_city (every looked-up column, string values —
    lookup/TableLookup.java:121-123)."""
    from wrangler_spark import compile_recipe
    from wrangler_spark.recipe.registry import RecipeContext

    df = spark.createDataFrame(
        [("bob,anderson",), ("joe,mchall",)], "test_ws string"
    )
    lk = spark.createDataFrame(
        [("bob", 21, "Los Angeles, CA"), ("joe", 34, "Palo Alto, CA")],
        "key string, age int, city string",
    )
    ctx = RecipeContext(spark=spark, lookups={"lookupTable": lk})
    ok, _ = compile_recipe([
        "split-to-columns :test_ws ,",
        "drop :test_ws",
        "rename :test_ws_1 :fname",
        "rename :test_ws_2 :lname",
        "table-lookup :fname lookupTable",
    ]).apply(df, ctx)
    rows = sorted(ok.collect(), key=lambda r: r["fname"])
    assert [r["fname"] for r in rows] == ["bob", "joe"]
    assert [r["fname_age"] for r in rows] == ["21", "34"]  # string, like Bytes.toString
    assert [r["fname_city"] for r in rows] == ["Los Angeles, CA", "Palo Alto, CA"]
