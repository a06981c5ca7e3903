"""User-defined directive surface (SURVEY.md §2.10)."""

import sys
import textwrap


def test_udd_via_pragma(spark, tmp_path):
    (tmp_path / "my_udd.py").write_text(
        textwrap.dedent(
            """
            from pyspark.sql import functions as F
            from wrangler_spark.recipe.registry import directive

            @directive("shout")
            def shout(call):
                col = call.col(0)
                def tr(df, ctx):
                    return df.withColumn(col, F.concat(F.upper(F.col(col)), F.lit("!!")))
                return tr
            """
        )
    )
    sys.path.insert(0, str(tmp_path))
    try:
        from wrangler_spark import execute

        df = spark.createDataFrame([("hey",)], "msg string")
        ok, _ = execute(
            spark, "#pragma load-directives my-udd;\n!shout :msg", df
        )
        assert ok.first()["msg"] == "HEY!!"
    finally:
        sys.path.remove(str(tmp_path))


def test_udd_decorator_direct(spark):
    from pyspark.sql import functions as F

    from wrangler_spark import execute
    from wrangler_spark.recipe.registry import DIRECTIVES, directive

    @directive("double-it")
    def double_it(call):
        col = call.col(0)

        def tr(df, ctx):
            return df.withColumn(col, F.col(col) * 2)

        return tr

    try:
        df = spark.createDataFrame([(21,)], "v long")
        ok, _ = execute(spark, ["double-it :v"], df)
        assert ok.first()["v"] == 42
    finally:
        DIRECTIVES.pop("double-it", None)


def test_udd_example_module(spark):
    """The shipped examples/udd_stars.py loads via #pragma and runs."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from wrangler_spark import execute

    df = spark.createDataFrame([(5.0,), (55.0,), (100.0,)], "score double")
    ok, _ = execute(spark, [
        "#pragma load-directives examples.udd_stars;",
        "!star-rating :score",
    ], df)
    assert [r["score_stars"] for r in ok.collect()] == [1, 3, 5]
