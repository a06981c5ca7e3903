"""Eleventh reference-mirror corpus wave: output-schema conformance —
the reference's `RecipePipeline.execute(rows, schema)` second argument
(RecordConvertor), mirrored through `execute(..., output_schema=...)`.

reference: wrangler-core/src/test/java/io/cdap/wrangler/utils/
RecordConvertorTest.java
"""

import pytest
from pyspark.sql import types as T

from wrangler_spark import execute
from wrangler_spark.recipe.compiler import conform_to_schema


def test_empty_string_stays_empty_not_null(spark, one_col):
    # RecordConvertorTest.testEmptyString: "a," -> value "" (a STRING
    # field keeps the empty string; emptiness is not nullness)
    schema = T.StructType([T.StructField("value", T.StringType(), False)])
    df = spark.createDataFrame([("a,",), ("b,b",)], "body string")
    ok, err = execute(
        spark,
        ["parse-as-csv :body ',' false", "rename body_2 value", "drop body,body_1"],
        df,
        output_schema=schema,
    )
    got = [r["value"] for r in ok.collect()]
    assert got == ["", "b"]
    assert ok.columns == ["value"]


def test_nullable_empty_field_passes(spark):
    # testNullableEmptyField: "c," / "e," -> null double, all 5 rows out
    schema = T.StructType([T.StructField("value", T.DoubleType(), True)])
    df = spark.createDataFrame(
        [("a,1",), ("b,2",), ("c,",), ("d,3",), ("e,",)], "body string"
    )
    ok, _ = execute(
        spark,
        ["parse-as-csv :body ',' false", "rename body_2 value",
         "set-type value double", "drop body,body_1"],
        df,
        output_schema=schema,
    )
    rows = ok.collect()
    assert len(rows) == 5
    assert sorted(r["value"] for r in rows if r["value"] is not None) == [1.0, 2.0, 3.0]
    assert sum(1 for r in rows if r["value"] is None) == 2


def test_non_nullable_empty_field_raises(spark):
    # testNonNullableEmptyField: same data, non-nullable double -> the
    # reference throws RecipeException at execute; ours raises when the
    # guarded plan runs
    schema = T.StructType([T.StructField("value", T.DoubleType(), False)])
    df = spark.createDataFrame([("a,1",), ("c,",)], "body string")
    ok, _ = execute(
        spark,
        ["parse-as-csv :body ',' false", "rename body_2 value",
         "set-type value double", "drop body,body_1"],
        df,
        output_schema=schema,
    )
    with pytest.raises(Exception, match="non-nullable field 'value'"):
        ok.collect()


def test_nullable_empty_array_and_missing_column(spark):
    # testNullableEmptyArray: [1] / null / MISSING / [] / [1,2,3] all
    # convert; the missing column becomes NULL for a nullable field
    schema = T.StructType([
        T.StructField("test_id", T.StringType(), False),
        T.StructField("values", T.ArrayType(T.IntegerType(), True), True),
    ])
    df = spark.createDataFrame(
        [("a", [1]), ("b", None), ("c", None), ("d", []), ("e", [1, 2, 3])],
        "test_id string, values array<int>",
    )
    out = conform_to_schema(df, schema)
    assert len(out.collect()) == 5
    # a field with NO source column at all
    schema2 = T.StructType([
        T.StructField("test_id", T.StringType(), False),
        T.StructField("absent", T.LongType(), True),
    ])
    out2 = conform_to_schema(df, schema2)
    assert all(r["absent"] is None for r in out2.collect())
    # …but a non-nullable absent field is a compile-time error
    schema3 = T.StructType([T.StructField("absent", T.LongType(), False)])
    with pytest.raises(Exception, match="no matching column"):
        conform_to_schema(df, schema3)


def test_type_conversion_lattice(spark):
    # testTypeConversions: i2l sh2l s2l -> long; i2f s2f l2f -> float;
    # i2d s2d l2d f2d -> double; json number -> LONG
    schema = T.StructType([
        T.StructField("body_TimeStamp", T.LongType(), False),
        T.StructField("i2l", T.LongType(), False),
        T.StructField("sh2l", T.LongType(), False),
        T.StructField("s2l", T.LongType(), False),
        T.StructField("i2f", T.FloatType(), False),
        T.StructField("s2f", T.FloatType(), False),
        T.StructField("l2f", T.FloatType(), False),
        T.StructField("i2d", T.DoubleType(), False),
        T.StructField("s2d", T.DoubleType(), False),
        T.StructField("l2d", T.DoubleType(), False),
        T.StructField("f2d", T.DoubleType(), False),
    ])
    df = spark.createDataFrame(
        [('{"TimeStamp":123456}', 2, 1, "2", 1, 2, 1, 1, 3, 2, 2.3)],
        "body string, i2l int, sh2l short, s2l string, i2f int, s2f short, "
        "l2f long, i2d int, s2d short, l2d long, f2d float",
    )
    ok, _ = execute(spark, ["parse-as-json body", "drop body"], df, output_schema=schema)
    row = ok.collect()[0]
    assert row["body_TimeStamp"] == 123456
    assert (row["i2l"], row["sh2l"], row["s2l"]) == (2, 1, 2)
    assert (row["i2f"], row["s2f"], row["l2f"]) == (1.0, 2.0, 1.0)
    assert (row["i2d"], row["s2d"], row["l2d"]) == (1.0, 3.0, 2.0)
    assert abs(row["f2d"] - 2.3) < 1e-6
    assert dict(ok.dtypes)["s2f"] == "float" and dict(ok.dtypes)["f2d"] == "double"
