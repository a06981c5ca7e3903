"""Date/datetime directives (SURVEY.md §2.9).

Reference classes under io/cdap/directives/date/ and datetime/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from wrangler_spark.errors import UsageError
from wrangler_spark.recipe.parser import DirectiveCall
from wrangler_spark.recipe.registry import RecipeContext, directive
from wrangler_spark.directives.column_ops import _require
from wrangler_spark.directives.parsers import _fmt_arg


@directive("format-date")
def format_date(call: DirectiveCall):
    col = call.col(0)
    fmt = _fmt_arg(call, 1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        return df.withColumn(c, F.date_format(F.col(c), fmt))

    return tr


def _compile_optional_sections(fmt: str, has_zone: bool) -> str:
    """Java DateTimeFormatter `[...]` optional sections print only when
    the wrapped field exists; Spark's formatter has no such construct,
    but field presence is type-static here — a datetime column either
    carries a zone or it doesn't. So compile the pattern: drop optional
    groups that need a zone/offset (x X Z O V z) when the input has
    none, inline them otherwise (reference FormatDateTimeTest pattern
    `yyyy-MM-dd'T'HH:mm:ss[xxx]` over a LocalDateTime)."""
    import re as _re

    def repl(m: "_re.Match[str]") -> str:
        body = m.group(1)
        bare = _re.sub(r"'[^']*'", "", body)
        needs_zone = bool(_re.search(r"[xXZOVz]", bare))
        if needs_zone and not has_zone:
            return ""
        # Spark's pattern subset has no lowercase x offsets — X is the
        # closest (prints 'Z' at +00:00 where Java x prints '+00:00')
        return _re.sub(r"x+", lambda mm: "X" * len(mm.group()), body)

    return _re.sub(r"\[([^\]]*)\]", repl, fmt)


@directive("format-datetime")
def format_datetime(call: DirectiveCall):
    col = call.col(0)
    fmt = _fmt_arg(call, 1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        dt = df.schema[c].dataType
        has_zone = isinstance(dt, T.TimestampType)  # ntz/string carry none
        eff = _compile_optional_sections(fmt, has_zone)
        return df.withColumn(c, F.date_format(F.col(c).cast("timestamp"), eff))

    return tr


@directive("format-unix-timestamp")
def format_unix_timestamp(call: DirectiveCall):
    col = call.col(0)
    fmt = _fmt_arg(call, 1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        return df.withColumn(c, F.date_format(F.timestamp_seconds(F.col(c).cast("long")), fmt))

    return tr


@directive("diff-date")
def diff_date(call: DirectiveCall):
    """diff-date :c1 :c2 :dst — difference in milliseconds
    (reference date/DiffDate.java)."""
    c1, c2, dst = call.col(0), call.col(1), call.col(2)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        a = F.col(_require(df, c1)).cast("timestamp")
        b = F.col(_require(df, c2)).cast("timestamp")
        return df.withColumn(dst, (F.unix_millis(a) - F.unix_millis(b)))

    return tr


def _valid_zone(zone: str, directive_name: str) -> str:
    """Compile-time zone validation, mirroring the reference's
    ZoneId.of() throwing ZoneRulesException at initialize()
    (datetime/CurrentDateTime.java:66-74, DateTimeToTimeStamp.java;
    CurrentDateTimeTest.testInvalidZone expects RecipeException)."""
    import zoneinfo

    norm = {"UTC", "GMT", "Z"}
    if zone in norm:
        return "UTC"
    try:
        zoneinfo.ZoneInfo(zone)
    except Exception:
        # fixed offsets like +05:30 are valid ZoneIds but not IANA keys
        import re as _re

        if not _re.fullmatch(r"[+-]\d{2}:?\d{2}", zone):
            raise UsageError(
                f"{directive_name}: invalid timezone {zone!r}"
            ) from None
    return zone


@directive("current-datetime")
def current_datetime(call: DirectiveCall):
    """current-datetime :col ['zone'] — wall-clock now in the given zone
    (reference datetime/CurrentDateTime.java: optional zone, default
    UTC, invalid zone fails at initialize)."""
    col = call.col(0)
    zone = _valid_zone(call.text(1, default="UTC"), "current-datetime")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        now = F.convert_timezone(
            F.lit("UTC"), F.lit(zone), F.current_timestamp().cast("timestamp_ntz")
        )
        return df.withColumn(col, now)

    return tr


@directive("current-date")
def current_date(call: DirectiveCall):
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        return df.withColumn(col, F.current_date())

    return tr


@directive("datetime-to-timestamp")
def datetime_to_timestamp(call: DirectiveCall):
    col = call.col(0)
    tz = _valid_zone(call.text(1, default="UTC"), "datetime-to-timestamp")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        return df.withColumn(c, F.to_utc_timestamp(F.col(c).cast("timestamp_ntz").cast("timestamp"), tz))

    return tr


@directive("timestamp-to-datetime")
def timestamp_to_datetime(call: DirectiveCall):
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        return df.withColumn(c, F.col(c).cast("timestamp").cast("timestamp_ntz"))

    return tr
