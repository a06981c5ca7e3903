"""Lookup/enrichment directives (SURVEY.md §2.5).

The reference's only enrichment primitives: table-lookup (key-value
dataset lookup, lookup/TableLookup.java) and catalog-lookup (static
catalogs, lookup/CatalogLookup.java). Both compile to BROADCAST left
joins — the small side ships to every executor, no shuffle of the big
side (the correct plan at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from wrangler_spark.errors import UsageError
from wrangler_spark.recipe.parser import DirectiveCall
from wrangler_spark.recipe.registry import RecipeContext, directive
from wrangler_spark.directives.column_ops import _require


@directive("table-lookup")
def table_lookup(call: DirectiveCall):
    """table-lookup :col <dataset> — EVERY non-key column of the looked-up
    row is appended as `<col>_<name>`, string-typed, exactly like the
    reference (lookup/TableLookup.java:121-123: `row.add(column + "_" +
    Bytes.toString(entry.getKey()), Bytes.toString(entry.getValue()))`,
    pinned by TableLookupTest: `table-lookup fname lookupTable` over a
    {age, city} table yields fname_age + fname_city). Output names use
    the directive ARGUMENT verbatim, like the Java `column` field. The
    dataset comes from ctx.lookups (registered by the host, like CDAP
    provides the Table dataset); the first column is the row key."""
    col = call.col(0)
    dataset = call.text(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        if dataset not in ctx.lookups:
            raise UsageError(f"table-lookup: dataset {dataset!r} not registered")
        lk = ctx.lookups[dataset]
        key_col = lk.columns[0]
        lk2 = lk.select(
            F.col(key_col).cast("string").alias("__wr_lk_key"),
            *[
                F.col(v).cast("string").alias(f"{col}_{v}")
                for v in lk.columns[1:]
            ],
        ).dropDuplicates(["__wr_lk_key"])
        out = df.join(
            broadcast(lk2), df[c].cast("string") == lk2["__wr_lk_key"], "left"
        ).drop("__wr_lk_key")
        return out

    return tr


@directive("catalog-lookup")
def catalog_lookup(call: DirectiveCall):
    """catalog-lookup <catalog> :col — static catalog lookup. The ICD-9/10
    code lists are binary resources missing from the reference checkout
    (.MISSING_LARGE_BLOBS); the mechanism (broadcast map) is identical,
    so we support host-registered catalogs via ctx.lookups too."""
    catalog = call.text(0)
    col = call.col(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        # output named from the directive ARGUMENT as written, not the
        # case-insensitively resolved column (reference CatalogLookup
        # uses its `column` field verbatim — `catalog-lookup ICD-9 :Body`
        # over a column `body` yields `Body_icd_9_description`, pinned
        # by the Directive_parse_log e2e golden)
        name = f"{col}_{catalog.lower().replace('-', '_')}_description"
        if catalog in ctx.lookups:
            lk = ctx.lookups[catalog]
            key_col, val_col = lk.columns[0], lk.columns[1]
            lk2 = lk.select(
                F.col(key_col).cast("string").alias("__wr_cat_key"),
                F.col(val_col).alias(name),
            ).dropDuplicates(["__wr_cat_key"])
            return df.join(
                broadcast(lk2), df[c].cast("string") == lk2["__wr_cat_key"], "left"
            ).drop("__wr_cat_key")
        # unknown catalog: null description column (lenient, like a miss)
        return df.withColumn(name, F.lit(None).cast("string"))

    return tr
