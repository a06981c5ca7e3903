"""Writer/output-formatter directives (SURVEY.md §2.9).

Reference classes under io/cdap/directives/writer/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wrangler_spark.recipe.parser import DirectiveCall
from wrangler_spark.recipe.registry import RecipeContext, directive
from wrangler_spark.directives.column_ops import _require


@directive("write-as-csv")
def write_as_csv(call: DirectiveCall):
    """write-as-csv :col — serialize the whole record to one CSV string
    column (reference writer/WriteAsCSV.java)."""
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        cols = [F.col(c) for c in df.columns]
        return df.withColumn(col, F.to_csv(F.struct(*cols)))

    return tr


@directive("write-as-json-map")
def write_as_json_map(call: DirectiveCall):
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        cols = [F.col(c) for c in df.columns]
        return df.withColumn(col, F.to_json(F.struct(*cols)))

    return tr


@directive("write-as-json-object")
def write_as_json_object(call: DirectiveCall):
    dst = call.col(0)
    cols = call.cols(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        rs = [_require(df, c) for c in cols]
        return df.withColumn(dst, F.to_json(F.struct(*[F.col(c) for c in rs])))

    return tr
