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
    column (reference writer/WriteAsCSV.java).

    Duplicate-name semantics: WriteAsCSV.java:89 uses `row.add`, which
    APPENDS a second column of the same name, and Row.find/getValue
    resolve to the FIRST occurrence — so when the target column already
    exists, the observable output keeps the ORIGINAL value (pinned by
    the Directive_parse_fixedlength e2e golden file, where
    `write-as-csv :url_protocol` leaves "http" intact). The JSON
    writers use `addOrSet` and therefore overwrite."""
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        if col.lower() in (c.lower() for c in df.columns):  # Row.find is
            return df                                       # case-insensitive
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
