"""Row-level directives: filters, error routing, 1→N explodes (SURVEY.md §2.4).

Reference classes under io/cdap/directives/row/: RecordConditionFilter,
RecordRegexFilter, RecordMissingOrNullFilter, Fail, SendToError,
SendToErrorAndContinue, SplitToRows, Flatten, SetRecordDelimiter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from wrangler_spark.errors import UsageError
from wrangler_spark.expr.jexl import compile_expr
from wrangler_spark.recipe.parser import DirectiveCall
from wrangler_spark.recipe.registry import RecipeContext, directive
from wrangler_spark.directives.column_ops import _require


def _cond(expr_src: str, df: DataFrame, ctx: RecipeContext | None = None):
    variables = ctx.variables if ctx is not None else None
    return compile_expr(expr_src, df.schema, variables).cast("boolean")


def _keep_unless(c):
    """Keep rows where `c` is false or null (drop only definite-true).

    Written as isnull(c) | ~c instead of ~coalesce(c, false): Catalyst's
    NullPropagation reduces isnull over null-intolerant predicates to
    isnull on the underlying column, so simple conditions remain
    translatable into parquet PushedFilters — coalesce() blocks source
    pushdown entirely.
    """
    return F.isnull(c) | ~c


def _keep_when(c):
    """Keep rows where `c` is definitely true (pushdown-friendly dual)."""
    return c.isNotNull() & c


@directive("filter-row")
def filter_row(call: DirectiveCall):
    """filter-row exp:{cond} [true|false] — DROPS rows where cond == flag.

    Reference row/RecordConditionFilter.java:93-117 (default flag true).
    """
    expr_src = call.expr(0)
    keep_on_false = call.bool_(1, default=True)  # flag: drop rows matching == flag

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _cond(expr_src, df, ctx)
        drop = c if keep_on_false else ~c
        return df.filter(_keep_unless(drop))

    return tr


@directive("filter-row-if-true")
def filter_row_if_true(call: DirectiveCall):
    expr_src = call.expr(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _cond(expr_src, df, ctx)
        return df.filter(_keep_unless(c))

    return tr


@directive("filter-row-if-false")
def filter_row_if_false(call: DirectiveCall):
    expr_src = call.expr(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _cond(expr_src, df, ctx)
        return df.filter(_keep_when(c))

    return tr


@directive("filter-by-regex")
def filter_by_regex(call: DirectiveCall):
    """filter-by-regex if-matched|if-not-matched :col 'regex' — drops matches
    (if-matched) or non-matches (reference row/RecordRegexFilter.java)."""
    mode = call.ident(0).lower()
    col = call.col(1)
    regex = call.text(2)
    if mode not in ("if-matched", "if-not-matched"):
        raise UsageError("filter-by-regex: mode must be if-matched|if-not-matched")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        m = F.col(c).cast("string").rlike(regex)
        if regex == "null" or regex == "^null$":
            m = m | F.col(c).isNull()
        cond = m if mode == "if-matched" else _keep_unless(m)
        return df.filter(_keep_unless(cond))

    return tr


@directive("filter-row-if-matched")
def filter_row_if_matched(call: DirectiveCall):
    col = call.col(0)
    regex = call.expr(1) if call.toks[1].kind == "EXPR" else call.text(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        pat = regex.strip().strip("\"'")
        m = F.col(c).cast("string").rlike(pat)
        return df.filter(_keep_unless(m))

    return tr


@directive("filter-row-if-not-matched")
def filter_row_if_not_matched(call: DirectiveCall):
    col = call.col(0)
    regex = call.expr(1) if call.toks[1].kind == "EXPR" else call.text(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        pat = regex.strip().strip("\"'")
        m = F.col(c).cast("string").rlike(pat)
        return df.filter(_keep_when(m))

    return tr


@directive("filter-empty-or-null", "filter-rows-on")
def filter_empty_or_null(call: DirectiveCall):
    """filter-rows-on empty-or-null-columns :c1[,…] (reference
    row/RecordMissingOrNullFilter.java) — drops rows where ALL the named
    columns are null/empty."""
    # two spellings: `filter-rows-on empty-or-null-columns :cols` or
    # `filter-empty-or-null :cols`
    if call.name == "filter-rows-on" or (
        call.has(0) and str(call.toks[0].value).startswith("empty-or-null")
    ):
        cols = call.cols(1)
    else:
        cols = call.cols(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        conds = None
        for col in cols:
            c = _require(df, col)
            e = F.col(c).isNull() | (F.col(c).cast("string") == "")
            conds = e if conds is None else (conds & e)
        return df.filter(_keep_unless(conds))

    return tr


@directive("fail")
def fail(call: DirectiveCall):
    """fail exp:{cond} — abort the pipeline when any row matches
    (reference row/Fail.java). Compiled to a lazily-evaluated
    raise_error so no extra job is scheduled."""
    expr_src = call.expr(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _cond(expr_src, df, ctx)
        guard = F.when(
            F.coalesce(c, F.lit(False)),
            F.raise_error(F.lit(f"fail: condition [{expr_src}] matched a row")).cast("boolean"),
        ).otherwise(F.lit(True))
        return df.filter(guard)

    return tr


def _error_extras(call: DirectiveCall, expr_src: str, name: str) -> str:
    """Optional `[metric] ['message']` args after the condition
    (reference SendToError.java:71-93) and the exact message format its
    tests pin: `<message> (ecode: 1, directive: send-to-error)`, with
    the condition text as the default message."""
    message = None
    i = 1
    if call.has(i) and call.toks[i].kind == "IDENT":
        i += 1  # metric name: counted via the error-channel row count
    if call.has(i) and call.toks[i].kind == "TEXT":
        message = call.text(i)
    return f"{message or expr_src} (ecode: 1, directive: {name})"


@directive("send-to-error")
def send_to_error(call: DirectiveCall):
    """send-to-error exp:{cond} [metric] ['message'] — routes matching
    rows to the error channel (reference row/SendToError.java:64)."""
    expr_src = call.expr(0)
    message = _error_extras(call, expr_src, "send-to-error")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _cond(expr_src, df, ctx)
        return ctx.route_error(df, c, message)

    return tr


@directive("send-to-error-and-continue")
def send_to_error_and_continue(call: DirectiveCall):
    """Routes matching rows to the error channel and REMOVES them from
    the main flow, exactly like send-to-error — in the reference both
    paths drop the row from results (RecipePipelineExecutor.java:145-158:
    ReportErrorAndProceed clears cumulativeRows and breaks); the variant
    differs only in error-record metadata (original row, cumulative
    messages, shown-in-wrangler flag), not in row routing
    (row/SendToErrorAndContinue.java:104-133). SendToErrorAndContinueTest
    pins this: 2 of 3 rows matching → errors==2, results==1."""
    expr_src = call.expr(0)
    message = _error_extras(call, expr_src, "send-to-error-and-continue")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _cond(expr_src, df, ctx)
        return ctx.route_error(df, c, message)

    return tr


@directive("split-to-rows")
def split_to_rows(call: DirectiveCall):
    """split-to-rows :col 'sep' — 1→N explode (reference
    row/SplitToRows.java:89 `String.split(regex)`): Java's limit-0
    split DROPS trailing empty strings ("hello".split("o") → ["hell"],
    "ooo".split("o") → [] → zero output rows), except the length-0
    input which yields one "" row — pinned by the Directive_parse_excel
    e2e golden (`split-to-rows :name 'o'` must not emit a trailing
    empty-name row)."""
    col = call.col(0)
    sep = call.text(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        arr = F.split(s, sep)
        # index of the last non-empty element (0 when all empty)
        last = F.aggregate(
            F.zip_with(
                arr,
                F.sequence(F.lit(1), F.size(arr)),
                lambda v, i: F.when(v != "", i).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: F.greatest(acc, x),
        )
        trimmed = F.when(s == "", F.array(F.lit(""))).otherwise(
            F.slice(arr, 1, last)
        )
        return df.withColumn(c, F.explode(trimmed))

    return tr


@directive("set-record-delim")
def set_record_delim(call: DirectiveCall):
    col = call.col(0)
    delim = call.text(1)
    limit = call.int_(2, default=0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        arr = F.split(F.col(c).cast("string"), delim)
        if limit:
            arr = F.slice(arr, 1, limit)
        return df.withColumn(c, F.explode(arr))

    return tr


@directive("flatten")
def flatten(call: DirectiveCall):
    """flatten :c1[,:c2…] — zip-explode array columns to the max length,
    null-padding shorter arrays; non-array columns repeat on every output
    row (reference row/Flatten.java:94-162)."""
    cols = call.cols(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        resolved = [_require(df, c) for c in cols]
        sizes = []
        for c in resolved:
            dt = df.schema[c].dataType
            if isinstance(dt, T.ArrayType):
                sizes.append(F.coalesce(F.size(F.col(c)), F.lit(0)))
            else:
                sizes.append(F.lit(1))
        maxn = F.greatest(*sizes) if len(sizes) > 1 else sizes[0]
        maxn = F.when(maxn < 1, 1).otherwise(maxn)
        out = df.withColumn("__wr_i", F.explode(F.sequence(F.lit(0), maxn - 1)))
        for c in resolved:
            dt = df.schema[c].dataType
            if isinstance(dt, T.ArrayType):
                out = out.withColumn(
                    c,
                    F.when(
                        F.col("__wr_i") < F.coalesce(F.size(F.col(c)), F.lit(0)),
                        F.col(c)[F.col("__wr_i")],
                    ),
                )
        return out.drop("__wr_i")

    return tr
