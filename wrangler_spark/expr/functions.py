"""Scalar-function namespaces for the expression language.

Mirrors the reference's JEXL namespaces (wrangler-core
expression/EL.java:167-190): default/Global, string:, strings:
(Guava Strings), escape: (StringEscapeUtils), arrays:, math:, date:,
datetime:, json:, dq:, arithmetic:, logical:, number:, bytes: —
each function maps to native pyspark.sql.functions so the compiled
expression stays JVM-side (SURVEY.md §2.8). Function-name lookup is
case-insensitive. LocalTime values are LONG nanos-since-midnight
(datetime: section note).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangler_spark.errors import ExpressionError
from wrangler_spark.expr.jexl import TypedCol

_REGISTRY: dict[tuple[str, str], Callable[..., TypedCol]] = {}


def _reg(ns: str, *names: str):
    def deco(fn):
        for n in names:
            _REGISTRY[(ns, n.lower())] = fn
        return fn

    return deco


def resolve_call(ns: str, name: str, args: list[TypedCol]) -> TypedCol:
    ns = {"strings": "string", "escape": "string"}.get(ns, ns)
    fn = _REGISTRY.get((ns, name.lower()))
    if fn is None and ns == "":
        # default namespace also exposes math-ish helpers
        fn = _REGISTRY.get(("math", name.lower())) or _REGISTRY.get(("string", name.lower()))
    if fn is None:
        raise ExpressionError(f"unknown function {ns + ':' if ns else ''}{name}()")
    return fn(*args)


def _s(c: TypedCol) -> Column:
    return c.col.cast("string")


def _typed(col: Column, dt: T.DataType | None = None) -> TypedCol:
    return TypedCol(col, dt)


STR = T.StringType()
DBL = T.DoubleType()
LNG = T.LongType()
INT = T.IntegerType()
BOOL = T.BooleanType()


# ------------------------------------------------------------ default ns
# reference: io/cdap/functions/Global.java:37-273

@_reg("", "toDouble")
def _todouble(x):
    return _typed(x.col.cast("double"), DBL)


@_reg("", "toFloat")
def _tofloat(x):
    return _typed(x.col.cast("float"), T.FloatType())


@_reg("", "toLong")
def _tolong(x):
    return _typed(x.col.cast("long"), LNG)


@_reg("", "toInteger", "toInt")
def _toint(x):
    return _typed(x.col.cast("int"), INT)


@_reg("", "toShort")
def _toshort(x):
    return _typed(x.col.cast("short"), T.ShortType())


@_reg("", "toString")
def _tostring(x):
    return _typed(_s(x), STR)


@_reg("", "toBoolean")
def _tobool(x):
    return _typed(x.col.cast("boolean"), BOOL)


@_reg("", "toBytes")
def _tobytes(x):
    return _typed(x.col.cast("binary"), T.BinaryType())


@_reg("", "concat")
def _concat(*xs):
    return _typed(F.concat(*[_s(x) for x in xs]), STR)


@_reg("", "coalesce")
def _coalesce(*xs):
    dt = next((x.dtype for x in xs if x.dtype is not None), None)
    return _typed(F.coalesce(*[x.col for x in xs]), dt)


@_reg("", "rcoalesce")
def _rcoalesce(*xs):
    dt = next((x.dtype for x in xs if x.dtype is not None), None)
    return _typed(F.coalesce(*[x.col for x in reversed(xs)]), dt)


@_reg("", "format")
def _format(fmt, *xs):
    # java String.format subset: %s %d %f (+ width/precision) pass through
    return _typed(F.format_string(_lit_value(fmt, "format() pattern"), *[x.col for x in xs]), STR)


def _lit_value(x: TypedCol, what: str) -> str:
    """Extract a compile-time constant (format strings, JSON paths…)."""
    if x.lit is not None:
        return str(x.lit)
    raise ExpressionError(f"{what} must be a literal string")


@_reg("", "padAtStart")
def _pad_start(x, length, pad):
    return _typed(F.lpad(_s(x), _as_int(length), _as_str(pad)), STR)


@_reg("", "padAtEnd")
def _pad_end(x, length, pad):
    return _typed(F.rpad(_s(x), _as_int(length), _as_str(pad)), STR)


@_reg("", "repeat")
def _repeat_default(x, n):
    return _typed(F.repeat(_s(x), _as_int(n)), STR)


@_reg("", "unquote")
def _unquote(x):
    return _typed(F.regexp_replace(_s(x), r'^["\']|["\']$', ""), STR)


@_reg("", "IsNull")
def _isnull(x):
    return _typed(x.col.isNull(), BOOL)


@_reg("", "IsNotNull")
def _isnotnull(x):
    return _typed(x.col.isNotNull(), BOOL)


@_reg("", "NullToEmpty")
def _null_to_empty(x):
    return _typed(F.coalesce(_s(x), F.lit("")), STR)


@_reg("", "NullToZero")
def _null_to_zero(x):
    return _typed(F.coalesce(x.col.cast("double"), F.lit(0.0)), DBL)


@_reg("", "NullToValue")
def _null_to_value(x, v):
    return _typed(F.coalesce(x.col, v.col), x.dtype or v.dtype)


@_reg("", "empty")
def _jexl_empty(x):
    """JEXL empty(): true for null or zero-length string (reference
    RecipeCompilerTest uses `send-to-error empty(body_4)`)."""
    return _typed(x.col.isNull() | (_s(x) == ""), BOOL)


def _as_int(x: TypedCol) -> Column:
    return x.col.cast("int")


def _as_str(x: TypedCol) -> Column:
    return _s(x)


# ------------------------------------------------------------ string:
# reference: commons-lang StringUtils via EL.java:178-180

@_reg("string", "lowerCase", "lower", "toLowerCase")
def _lower(x):
    return _typed(F.lower(_s(x)), STR)


@_reg("string", "upperCase", "upper", "toUpperCase")
def _upper(x):
    return _typed(F.upper(_s(x)), STR)


@_reg("string", "capitalize")
def _capitalize(x):
    s = _s(x)
    return _typed(F.concat(F.upper(F.substring(s, 1, 1)), F.substring(s, 2, 2147483647)), STR)


@_reg("string", "uncapitalize")
def _uncapitalize(x):
    s = _s(x)
    return _typed(F.concat(F.lower(F.substring(s, 1, 1)), F.substring(s, 2, 2147483647)), STR)


@_reg("string", "trim")
def _trim(x):
    return _typed(F.trim(_s(x)), STR)


@_reg("string", "ltrim", "stripStart")
def _ltrim(x):
    return _typed(F.ltrim(_s(x)), STR)


@_reg("string", "rtrim", "stripEnd")
def _rtrim(x):
    return _typed(F.rtrim(_s(x)), STR)


@_reg("string", "reverse")
def _reverse(x):
    return _typed(F.reverse(_s(x)), STR)


@_reg("string", "length")
def _length(x):
    return _typed(F.length(_s(x)), INT)


@_reg("string", "isEmpty")
def _isempty(x):
    return _typed(F.coalesce(F.length(_s(x)) == 0, F.lit(True)), BOOL)


@_reg("string", "isNotEmpty")
def _isnotempty(x):
    return _typed(F.coalesce(F.length(_s(x)) > 0, F.lit(False)), BOOL)


@_reg("string", "isBlank")
def _isblank(x):
    return _typed(F.coalesce(F.length(F.trim(_s(x))) == 0, F.lit(True)), BOOL)


@_reg("string", "isNotBlank")
def _isnotblank(x):
    return _typed(F.coalesce(F.length(F.trim(_s(x))) > 0, F.lit(False)), BOOL)


@_reg("string", "contains")
def _contains(x, sub):
    return _typed(F.contains(_s(x), _s(sub)), BOOL)


@_reg("string", "startsWith")
def _startswith(x, pre):
    return _typed(F.startswith(_s(x), _s(pre)), BOOL)


@_reg("string", "endsWith")
def _endswith(x, suf):
    return _typed(F.endswith(_s(x), _s(suf)), BOOL)


@_reg("string", "indexOf")
def _indexof(x, sub):
    return _typed(F.instr(_s(x), _s(sub)).cast("int") - 1, INT)


@_reg("string", "replace")
def _replace(x, find, repl):
    return _typed(F.replace(_s(x), _s(find), _s(repl)), STR)


@_reg("string", "substring", "substr")
def _substring(x, start, end=None):
    # commons-lang: 0-based start, end exclusive; negative = from end
    s = _s(x)
    ln = F.length(s)
    st = start.col.cast("int")
    st = F.when(st < 0, F.greatest(ln + st, F.lit(0))).otherwise(st)
    if end is None:
        return _typed(F.substring(s, st + 1, F.lit(2147483647)), STR)
    en = end.col.cast("int")
    en = F.when(en < 0, ln + en).otherwise(F.least(en, ln))
    return _typed(F.substring(s, st + 1, F.greatest(en - st, F.lit(0))), STR)


@_reg("string", "left")
def _left(x, n):
    return _typed(F.substring(_s(x), 1, _as_int(n)), STR)


@_reg("string", "right")
def _right(x, n):
    s = _s(x)
    return _typed(F.substring(s, -_as_int(n).cast("int"), _as_int(n)), STR)


@_reg("string", "repeat")
def _repeat(x, n):
    return _typed(F.repeat(_s(x), _as_int(n)), STR)


@_reg("string", "split")
def _split(x, sep):
    import re as _re

    if sep.lit is not None:
        return _typed(F.split(_s(x), _re.escape(str(sep.lit))), T.ArrayType(STR))
    return _typed(F.split(_s(x), _s(sep)), T.ArrayType(STR))


@_reg("string", "join")
def _join(sep, *xs):
    if sep.lit is not None:
        return _typed(F.concat_ws(str(sep.lit), *[_s(x) for x in xs]), STR)
    return _typed(F.array_join(F.array(*[_s(x) for x in xs]), _s(sep)), STR)


@_reg("string", "deleteWhitespace")
def _delete_ws(x):
    return _typed(F.regexp_replace(_s(x), r"\s+", ""), STR)


@_reg("string", "abbreviate")
def _abbreviate(x, n):
    """StringUtils.abbreviate: truncate to n chars INCLUDING a trailing
    '...' when the input is longer (reference ExpressionTest:
    abbreviate('This is long transformation', 5) == 'Th...')."""
    s = _s(x)
    w = _as_int(n)
    return _typed(
        F.when(F.length(s) <= w, s).otherwise(
            F.concat(F.substring(s, F.lit(1), w - 3), F.lit("..."))
        ),
        STR,
    )


@_reg("string", "center")
def _center(x, n):
    """StringUtils.center: pad both sides with spaces to width n (extra
    space goes right, matching commons-lang)."""
    s = _s(x)
    w = _as_int(n)
    half = F.floor((w - F.length(s)) / F.lit(2)).cast("int")
    padded = F.call_function(
        "rpad", F.call_function("lpad", s, F.length(s) + half, F.lit(" ")), w, F.lit(" ")
    )
    return _typed(F.when(F.length(s) >= w, s).otherwise(padded), STR)


@_reg("string", "chomp")
def _chomp(x):
    """StringUtils.chomp: remove ONE trailing newline (\\n, \\r, or \\r\\n)."""
    return _typed(F.regexp_replace(_s(x), r"(\r\n|\r|\n)$", ""), STR)


@_reg("string", "chop")
def _chop(x):
    """StringUtils.chop: remove the last character (\\r\\n counts as one)."""
    s = _s(x)
    return _typed(
        F.when(s.endswith("\r\n"), F.substring(s, F.lit(1), F.length(s) - 2))
        .otherwise(F.substring(s, F.lit(1), F.greatest(F.length(s) - 1, F.lit(0)))),
        STR,
    )


@_reg("string", "leftPad")
def _leftpad(x, n, pad=None):
    p = F.lit(" ") if pad is None else _s(pad)
    return _typed(F.call_function("lpad", _s(x), _as_int(n), p), STR)


@_reg("string", "rightPad")
def _rightpad(x, n, pad=None):
    p = F.lit(" ") if pad is None else _s(pad)
    return _typed(F.call_function("rpad", _s(x), _as_int(n), p), STR)


@_reg("string", "swapCase")
def _swapcase(x):
    # char-level flip, JVM-side: explode to chars, flip each, rejoin
    chars = F.split(_s(x), "")
    flipped = F.transform(
        chars, lambda c: F.when(c == F.upper(c), F.lower(c)).otherwise(F.upper(c))
    )
    return _typed(F.array_join(flipped, ""), STR)


# ------------------------------------------------ strings: (Guava Strings)
# reference EL.java:179 registers com.google.common.base.Strings as
# `strings:`; resolve_call aliases strings:→string:. Guava padStart/
# padEnd never TRUNCATE (unlike lpad/rpad).

@_reg("string", "isNullOrEmpty")
def _g_isnullorempty(x):
    return _typed(x.col.isNull() | (F.length(_s(x)) == 0), BOOL)


@_reg("string", "nullToEmpty")
def _g_nulltoempty(x):
    return _typed(F.coalesce(_s(x), F.lit("")), STR)


@_reg("string", "emptyToNull")
def _g_emptytonull(x):
    return _typed(F.nullif(_s(x), F.lit("")), STR)


@_reg("string", "padStart")
def _g_padstart(x, n, pad):
    s = _s(x)
    return _typed(F.when(F.length(s) >= _as_int(n), s).otherwise(F.lpad(s, _as_int(n), _as_str(pad))), STR)


@_reg("string", "padEnd")
def _g_padend(x, n, pad):
    s = _s(x)
    return _typed(F.when(F.length(s) >= _as_int(n), s).otherwise(F.rpad(s, _as_int(n), _as_str(pad))), STR)


def _common_run(a: Column, b: Column) -> Column:
    """Length of the common prefix of two strings (JVM-side: zip the
    char arrays, count until first mismatch via an aggregate fold)."""
    za, zb = F.split(a, ""), F.split(b, "")
    matches = F.zip_with(za, zb, lambda p, q: F.coalesce(p == q, F.lit(False)))
    acc = F.aggregate(
        matches,
        F.struct(F.lit(0).alias("n"), F.lit(False).alias("stop")),
        lambda ac, m: F.struct(
            F.when(~ac.stop & m, ac.n + 1).otherwise(ac.n).alias("n"),
            (ac.stop | ~m).alias("stop"),
        ),
    )
    return acc.n


@_reg("string", "commonPrefix")
def _g_commonprefix(a, b):
    sa, sb = _s(a), _s(b)
    return _typed(F.substring(sa, 1, _common_run(sa, sb)), STR)


@_reg("string", "commonSuffix")
def _g_commonsuffix(a, b):
    sa, sb = _s(a), _s(b)
    n = _common_run(F.reverse(sa), F.reverse(sb))
    return _typed(F.reverse(F.substring(F.reverse(sa), 1, n)), STR)


# --------------------------------------- escape: (StringEscapeUtils)
# reference EL.java:180 registers commons-lang StringEscapeUtils as
# `escape:`; resolve_call aliases escape:→string:. Named-entity and
# control-char coverage mirrors the commonly-exercised subset; exotic
# numeric-entity decoding is out of scope (documented gap).

def _chain_replace(col: Column, pairs: list[tuple[str, str]]) -> Column:
    for find, repl in pairs:
        col = F.replace(col, F.lit(find), F.lit(repl))
    return col


_HTML_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]
_XML_ESC = _HTML_ESC + [("'", "&apos;")]
_JAVA_ESC = [("\\", "\\\\"), ("\"", "\\\""), ("\n", "\\n"), ("\t", "\\t"),
             ("\r", "\\r"), ("\b", "\\b"), ("\f", "\\f")]


@_reg("string", "escapeHtml4", "escapeHtml3", "escapeHtml")
def _e_escapehtml(x):
    return _typed(_chain_replace(_s(x), _HTML_ESC), STR)


@_reg("string", "unescapeHtml4", "unescapeHtml3", "unescapeHtml")
def _e_unescapehtml(x):
    pairs = [(e, c) for c, e in reversed(_HTML_ESC)] + [("&apos;", "'"), ("&#39;", "'")]
    return _typed(_chain_replace(_s(x), pairs), STR)


@_reg("string", "escapeXml", "escapeXml10", "escapeXml11")
def _e_escapexml(x):
    return _typed(_chain_replace(_s(x), [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                                         ('"', "&quot;"), ("'", "&apos;")]), STR)


@_reg("string", "unescapeXml")
def _e_unescapexml(x):
    return _typed(_chain_replace(_s(x), [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                                         ("&apos;", "'"), ("&amp;", "&")]), STR)


@_reg("string", "escapeJava", "escapeEcmaScript", "escapeJson")
def _e_escapejava(x):
    return _typed(_chain_replace(_s(x), _JAVA_ESC), STR)


@_reg("string", "unescapeJava", "unescapeEcmaScript", "unescapeJson")
def _e_unescapejava(x):
    # backslash-first would corrupt \\n → sentinel dance keeps \\ intact
    sentinel = "\x00"
    pairs = [("\\\\", sentinel), ("\\n", "\n"), ("\\t", "\t"), ("\\r", "\r"),
             ("\\b", "\b"), ("\\f", "\f"), ("\\\"", "\""), (sentinel, "\\")]
    return _typed(_chain_replace(_s(x), pairs), STR)


@_reg("string", "escapeCsv")
def _e_escapecsv(x):
    s = _s(x)
    needs = s.contains(",") | s.contains('"') | s.contains("\n") | s.contains("\r")
    quoted = F.concat(F.lit('"'), F.replace(s, F.lit('"'), F.lit('""')), F.lit('"'))
    return _typed(F.when(needs, quoted).otherwise(s), STR)


@_reg("string", "unescapeCsv")
def _e_unescapecsv(x):
    s = _s(x)
    is_quoted = s.startswith('"') & s.endswith('"') & (F.length(s) >= 2)
    inner = F.replace(F.substring(s, 2, F.length(s) - 2), F.lit('""'), F.lit('"'))
    return _typed(F.when(is_quoted, inner).otherwise(s), STR)


# --------------------------------------------- arrays: (java.util.Arrays)
# reference EL.java:181; the JEXL-reachable static surface is asList /
# toString — kept JVM-side as array construction + bracket join.

@_reg("arrays", "asList")
def _arrays_aslist(*xs):
    el = next((x.dtype for x in xs if x.dtype is not None), None)
    return _typed(F.array(*[x.col for x in xs]), T.ArrayType(el or STR))


@_reg("arrays", "toString")
def _arrays_tostring(x):
    return _typed(
        F.concat(F.lit("["), F.array_join(x.col.cast("array<string>"), ", "), F.lit("]")), STR
    )


# ------------------------------------------------------------ math:

def _math1(fname, fn, out=DBL):
    @_reg("math", fname)
    def _f(x):
        return _typed(fn(x.col.cast("double")), out)
    return _f


_math1("abs", F.abs)
_math1("ceil", F.ceil, LNG)
_math1("floor", F.floor, LNG)
_math1("sqrt", F.sqrt)
_math1("cbrt", F.cbrt)
_math1("exp", F.exp)
_math1("log", F.log)
_math1("log10", F.log10)
_math1("log2", F.log2)
_math1("sin", F.sin)
_math1("cos", F.cos)
_math1("tan", F.tan)
_math1("asin", F.asin)
_math1("acos", F.acos)
_math1("atan", F.atan)
_math1("signum", F.signum)
_math1("sinh", F.sinh)
_math1("cosh", F.cosh)
_math1("tanh", F.tanh)
_math1("toDegrees", F.degrees)
_math1("toRadians", F.radians)


@_reg("math", "round")
def _round(x):
    # java Math.round: long
    return _typed(F.round(x.col.cast("double"), 0).cast("long"), LNG)


@_reg("math", "pow")
def _pow(x, y):
    return _typed(F.pow(x.col.cast("double"), y.col.cast("double")), DBL)


@_reg("math", "min")
def _min(*xs):
    return _typed(F.least(*[x.col for x in xs]), xs[0].dtype)


@_reg("math", "max")
def _max(*xs):
    return _typed(F.greatest(*[x.col for x in xs]), xs[0].dtype)


@_reg("math", "floorDiv")
def _floordiv(a, b):
    return _typed(F.floor(a.col.cast("double") / b.col.cast("double")).cast("long"), LNG)


@_reg("math", "floorMod")
def _floormod(a, b):
    return _typed(F.pmod(a.col.cast("long"), b.col.cast("long")), LNG)


@_reg("math", "hypot")
def _hypot(a, b):
    return _typed(F.hypot(a.col.cast("double"), b.col.cast("double")), DBL)


# ------------------------------------------------------------ date:
# reference: io/cdap/functions/Dates.java:47-284

@_reg("date", "UNIXTIMESTAMP_SECONDS")
def _unix_seconds(x):
    return _typed(F.unix_timestamp(x.col), LNG)


@_reg("date", "UNIXTIMESTAMP_MILLIS")
def _unix_millis(x):
    return _typed(F.unix_millis(x.col.cast("timestamp")), LNG)


@_reg("date", "MONTH")
def _month(x):
    return _typed(F.month(x.col), INT)


@_reg("date", "YEAR")
def _year(x):
    return _typed(F.year(x.col), INT)


@_reg("date", "DAY_OF_YEAR")
def _doy(x):
    return _typed(F.dayofyear(x.col), INT)


@_reg("date", "DAY_OF_WEEK")
def _dow(x):
    return _typed(F.dayofweek(x.col), INT)


@_reg("date", "DAY_OF_MONTH", "DAY")
def _dom(x):
    return _typed(F.dayofmonth(x.col), INT)


@_reg("date", "HOUR")
def _hour(x):
    return _typed(F.hour(x.col), INT)


@_reg("date", "MINUTE")
def _minute(x):
    return _typed(F.minute(x.col), INT)


@_reg("date", "SECOND")
def _second(x):
    return _typed(F.second(x.col), INT)


@_reg("date", "DAYS_BETWEEN")
def _days_between(a, b):
    return _typed(F.datediff(a.col.cast("date"), b.col.cast("date")), INT)


@_reg("date", "SECONDS_TO_DAYS")
def _seconds_to_days(x):
    return _typed((x.col.cast("long") / F.lit(86400)).cast("long"), LNG)


@_reg("date", "SECONDS_TO_HOURS")
def _seconds_to_hours(x):
    return _typed((x.col.cast("long") / F.lit(3600)).cast("long"), LNG)


@_reg("date", "SECONDS_TO_MINUTES")
def _seconds_to_minutes(x):
    return _typed((x.col.cast("long") / F.lit(60)).cast("long"), LNG)


@_reg("date", "SECONDS_TO_WEEKS")
def _seconds_to_weeks(x):
    return _typed((x.col.cast("long") / F.lit(7 * 86400)).cast("long"), LNG)


@_reg("date", "MONTH_SHORT")
def _month_short(d):
    # Dates.java:82 — TextStyle.SHORT ("Jan")
    return _typed(F.date_format(d.col.cast("timestamp"), "MMM"), STR)


@_reg("date", "MONTH_LONG")
def _month_long(d):
    return _typed(F.date_format(d.col.cast("timestamp"), "MMMM"), STR)


@_reg("date", "DAY_OF_WEEK_SHORT")
def _dow_short(d):
    return _typed(F.date_format(d.col.cast("timestamp"), "EEE"), STR)


@_reg("date", "DAY_OF_WEEK_LONG")
def _dow_long(d):
    return _typed(F.date_format(d.col.cast("timestamp"), "EEEE"), STR)


@_reg("date", "ERA")
def _era(d):
    # IsoEra: 0 = BCE, 1 = CE (Dates.java:167)
    y = F.year(d.col.cast("timestamp"))
    return _typed(F.when(y.isNull(), None).when(y >= 1, 1).otherwise(0).cast("int"), INT)


@_reg("date", "ERA_SHORT")
def _era_short(d):
    y = F.year(d.col.cast("timestamp"))
    return _typed(F.when(y.isNull(), None).when(y >= 1, "AD").otherwise("BC"), STR)


@_reg("date", "ERA_LONG")
def _era_long(d):
    y = F.year(d.col.cast("timestamp"))
    return _typed(F.when(y.isNull(), None).when(y >= 1, "Anno Domini").otherwise("Before Christ"), STR)


@_reg("date", "DAYS_BETWEEN_NOW")
def _days_between_now(d):
    # DAYS.between(date, now) — positive for past dates (Dates.java:217)
    return _typed(F.datediff(F.current_date(), d.col.cast("date")).cast("int"), INT)


@_reg("date", "isDate")
@_reg("dq", "isDate")
def _is_date(x):
    """TypeInference.isDate heuristic, column-side: ISO date/timestamp
    casts plus the common slash forms (documented subset of the
    reference's natty-style sniffing)."""
    s = F.trim(_s(x))
    return _typed(
        F.coalesce(
            F.try_to_timestamp(s).isNotNull()
            | s.rlike(r"^\d{4}-\d{2}-\d{2}$")
            | s.rlike(r"^\d{1,2}/\d{1,2}/\d{4}([ T]\d{1,2}:\d{2}(:\d{2})?)?$")
            | s.rlike(r"^\d{1,2}-[A-Za-z]{3}-\d{4}$"),
            F.lit(False),
        ),
        BOOL,
    )


@_reg("date", "isTime")
@_reg("dq", "isTime")
def _is_time(x):
    s = F.trim(_s(x))
    return _typed(
        F.coalesce(
            s.rlike(r"^(?i)\d{1,2}:\d{2}(:\d{2}(\.\d{1,9})?)?( ?[AP]M)?$"), F.lit(False)
        ),
        BOOL,
    )


# ------------------------------------------------------------ json:
# reference: io/cdap/functions/JsonFunctions.java:47-328

def _lower_keys_rec(obj):
    if isinstance(obj, dict):
        return {k.lower(): _lower_keys_rec(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_lower_keys_rec(v) for v in obj]
    return obj


def _jsonpath_eval(obj, path: str):
    """Jayway-subset JsonPath over parsed JSON: $ . [n] [*] .* ..key —
    wildcard / recursive steps make the path INDEFINITE, so the result
    is the flat list of every match (JsonPath.read semantics the
    reference's json:Select exposes, JsonFunctionsTest.testJsonSelect:
    '$.list[*].set.*' → the six inner objects)."""
    import re as _re

    steps = _re.findall(r"\.\.[A-Za-z_][\w]*|\.\*|\.[A-Za-z_][\w]*|\[\*\]|\[\d+\]", path)
    definite = True
    nodes = [obj]
    for st in steps:
        nxt = []
        if st == ".*":
            definite = False
            for n in nodes:
                if isinstance(n, dict):
                    nxt.extend(n.values())
                elif isinstance(n, list):
                    nxt.extend(n)
        elif st == "[*]":
            definite = False
            for n in nodes:
                if isinstance(n, list):
                    nxt.extend(n)
        elif st.startswith(".."):
            definite = False
            key = st[2:].lower()

            def walk(n, out):
                if isinstance(n, dict):
                    for k, v in n.items():
                        if k == key:
                            out.append(v)
                        walk(v, out)
                elif isinstance(n, list):
                    for v in n:
                        walk(v, out)

            for n in nodes:
                walk(n, nxt)
        elif st.startswith("["):
            i = int(st[1:-1])
            for n in nodes:
                if isinstance(n, list) and i < len(n):
                    nxt.append(n[i])
        else:
            key = st[1:].lower()
            for n in nodes:
                if isinstance(n, dict) and key in n:
                    nxt.append(n[key])
        nodes = nxt
    if definite:
        return nodes[0] if nodes else None
    return nodes


def _json_select_py(path: str):
    """Arrow-batched JsonPath for the indefinite constructs
    get_json_object can't express (.* wildcards, .. descent)."""
    from pyspark.sql.functions import pandas_udf as _pudf

    import json as _json

    @_pudf(T.StringType())
    def fn(v: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            try:
                obj = _lower_keys_rec(_json.loads(t))
            except Exception:
                return None
            got = _jsonpath_eval(obj, path)
            if got is None:
                return None
            return _json.dumps(got, separators=(",", ":"))

        return v.map(one)

    return fn


@_reg("json", "select")
def _json_select(x, *paths):
    """JsonFunctions.select (java:61-93): keys are LOWERCASED first
    (toLower defaults true — '$.name.fname' matches "Fname"), then each
    JsonPath is read; multiple paths return a JSON array of the
    results. Key-lowering is an Arrow batch, the path reads stay
    JVM-side get_json_object — except indefinite Jayway constructs
    (.* / ..), which fall back to the batched Python evaluator."""
    ps = [_lit_value(p, "json:select path") for p in paths]

    def read_one(lowered, p):
        if ".*" in p or ".." in p:
            return _json_select_py(p)(_s(x))
        return F.get_json_object(lowered, p)

    lowered = _json_rewrite("selectLower", _lower_keys_rec)(_s(x))
    if len(ps) == 1:
        return _typed(read_one(lowered, ps[0]), STR)
    return _typed(F.to_json(F.array(*[read_one(lowered, p) for p in ps])), STR)


@_reg("json", "IsValid")
def _json_valid(x):
    return _typed(F.try_parse_json(_s(x)).isNotNull(), BOOL)


@_reg("json", "IsNull")
def _json_isnull(x):
    # JsonFunctions.java:266 — true for SQL null or the JSON null literal
    s = F.trim(_s(x))
    return _typed(s.isNull() | (s == "null"), BOOL)


@_reg("json", "IsObject")
def _json_isobject(x):
    s = F.trim(_s(x))
    return _typed(
        F.coalesce(s.startswith("{") & F.try_parse_json(s).isNotNull(), F.lit(False)), BOOL
    )


@_reg("json", "IsArray")
def _json_isarray(x):
    s = F.trim(_s(x))
    return _typed(
        F.coalesce(s.startswith("[") & F.try_parse_json(s).isNotNull(), F.lit(False)), BOOL
    )


@_reg("json", "ArrayLength")
def _json_arraylen(x):
    return _typed(F.json_array_length(_s(x)), INT)


@_reg("json", "stringify")
def _json_stringify(x):
    return _typed(F.to_json(x.col), STR)


@_reg("json", "join")
def _json_join(x, sep):
    """json:join('["a","b"]', ",") — join a JSON string array."""
    arr = F.from_json(_s(x), "array<string>")
    return _typed(F.array_join(arr, _lit_value(sep, "json:join separator")), STR)


@_reg("json", "parse")
def _json_parse(x):
    """json:parse(s) — validate-and-pass-through: the JSON text when it
    parses, else null (the engine keeps JSON as strings; nested access
    goes through json:select)."""
    src = _s(x)
    return _typed(F.when(F.try_parse_json(src).isNotNull(), src), STR)


def _json_rewrite(name, rewrite):
    """Shared Arrow-batched JSON-object rewriter (drop / keysToLower) —
    nested values survive verbatim; per-batch python json, not per-row
    Java reflection."""
    from pyspark.sql.functions import pandas_udf as _pudf

    import json as _json

    @_pudf(T.StringType())
    def fn(v: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            try:
                obj = _json.loads(t)
            except Exception:
                return None
            if not isinstance(obj, (dict, list)):
                return t
            return _json.dumps(rewrite(obj), separators=(",", ":"))

        return v.map(one)

    return fn


@_reg("json", "drop")
def _json_drop(x, *fields):
    names = {str(_lit_value(f, "json:drop field")).lower() for f in fields}
    fn = _json_rewrite(
        "drop",
        lambda obj: {k: v for k, v in obj.items() if k.lower() not in names}
        if isinstance(obj, dict)
        else obj,
    )
    return _typed(fn(_s(x)), STR)


@_reg("json", "keysToLower", "keystolower")
def _json_keys_lower(x):
    # recursive, like the reference (JsonFunctions.java:145-167)
    fn = _json_rewrite("keysToLower", _lower_keys_rec)
    return _typed(fn(_s(x)), STR)


# ------------------------------------------------------------ dq:
# reference: io/cdap/functions/DataQuality.java:43-339

@_reg("dq", "isnull", "isNull")
def _dq_isnull(x):
    return _typed(x.col.isNull(), BOOL)


@_reg("dq", "isnotnull", "isNotNull")
def _dq_isnotnull(x):
    return _typed(x.col.isNotNull(), BOOL)


@_reg("dq", "isempty", "isEmpty")
def _dq_isempty(x):
    return _typed(F.coalesce(F.length(_s(x)) == 0, F.lit(True)), BOOL)


@_reg("dq", "strlen")
def _dq_strlen(x):
    return _typed(F.length(_s(x)), INT)


@_reg("dq", "inrange")
def _dq_inrange(x, lo, hi):
    v = x.col.cast("double")
    return _typed((v >= lo.col.cast("double")) & (v <= hi.col.cast("double")), BOOL)


@_reg("dq", "isNumber", "isnumber")
def _dq_isnumber(x):
    return _typed(_s(x).rlike(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"), BOOL)


@_reg("dq", "isInteger")
def _dq_isint(x):
    return _typed(_s(x).rlike(r"^-?\d+$"), BOOL)


def _luhn_ok(digits: Column) -> Column:
    """Luhn checksum over a digits-only string Column — pure Column
    algebra (transform-with-index + aggregate), stays in codegen."""
    rev = F.split(F.reverse(digits), "")
    rev = F.filter(rev, lambda ch: ch != "")
    per = F.transform(
        rev,
        lambda ch, i: F.when(
            i % 2 == 1,
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(ch.cast("int") * 2),
        ).otherwise(ch.cast("int")),
    )
    total = F.aggregate(per, F.lit(0), lambda acc, v: acc + v)
    return total % 10 == 0


def _cc_digits(x) -> Column:
    return F.regexp_replace(_s(x), r"[ -]", "")


@_reg("dq", "isCreditCard", "iscreditcard")
def _dq_iscc(x):
    d = _cc_digits(x)
    return _typed(d.rlike(r"^\d{13,19}$") & _luhn_ok(d), BOOL)


@_reg("dq", "isVisa")
def _dq_isvisa(x):
    d = _cc_digits(x)
    return _typed(d.rlike(r"^4(\d{12}|\d{15}|\d{18})$") & _luhn_ok(d), BOOL)


@_reg("dq", "isAmex")
def _dq_isamex(x):
    d = _cc_digits(x)
    return _typed(d.rlike(r"^3[47]\d{13}$") & _luhn_ok(d), BOOL)


@_reg("dq", "isMaster", "isMastercard")
def _dq_ismaster(x):
    d = _cc_digits(x)
    pfx = d.rlike(r"^5[1-5]\d{14}$") | (
        d.rlike(r"^\d{16}$") & F.substring(d, 1, 4).cast("int").between(2221, 2720)
    )
    return _typed(pfx & _luhn_ok(d), BOOL)


@_reg("dq", "isISBN10")
def _dq_isbn10(x):
    d = F.regexp_replace(_s(x), r"[ -]", "")
    chars = F.filter(F.split(d, ""), lambda ch: ch != "")
    per = F.transform(
        chars,
        lambda ch, i: (i + 1) * F.when(F.upper(ch) == "X", 10).otherwise(ch.cast("int")),
    )
    total = F.aggregate(per, F.lit(0), lambda acc, v: acc + v)
    return _typed(d.rlike(r"^\d{9}[0-9Xx]$") & (total % 11 == 0), BOOL)


@_reg("dq", "isISBN13")
def _dq_isbn13(x):
    d = F.regexp_replace(_s(x), r"[ -]", "")
    chars = F.filter(F.split(d, ""), lambda ch: ch != "")
    per = F.transform(
        chars, lambda ch, i: F.when(i % 2 == 1, 3 * ch.cast("int")).otherwise(ch.cast("int"))
    )
    total = F.aggregate(per, F.lit(0), lambda acc, v: acc + v)
    return _typed(d.rlike(r"^\d{13}$") & (total % 10 == 0), BOOL)


@_reg("dq", "isISBN", "isisbn")
def _dq_isbn(x):
    return _typed(_dq_isbn10(x).col | _dq_isbn13(x).col, BOOL)


@_reg("dq", "isDouble")
def _dq_isdouble(x):
    return _typed(_s(x).rlike(r"^-?\d+\.\d+([eE][+-]?\d+)?$"), BOOL)


@_reg("dq", "isBoolean")
def _dq_isbool(x):
    return _typed(F.lower(_s(x)).isin("true", "false"), BOOL)


_EMAIL_RE = r"^[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}$"
_IPV4_RE = r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
_URL_RE = r"^(https?|ftp)://[^\s/$.?#].[^\s]*$"
_DOMAIN_RE = r"^([A-Za-z0-9]([A-Za-z0-9\-]{0,61}[A-Za-z0-9])?\.)+[A-Za-z]{2,}$"


@_reg("dq", "isEmail")
def _dq_isemail(x):
    return _typed(_s(x).rlike(_EMAIL_RE), BOOL)


@_reg("dq", "isIP", "isIPv4")
def _dq_isip(x):
    return _typed(_s(x).rlike(_IPV4_RE), BOOL)


@_reg("dq", "isUrl", "isURL")
def _dq_isurl(x):
    return _typed(_s(x).rlike(_URL_RE), BOOL)


@_reg("dq", "isDomainName")
def _dq_isdomain(x):
    return _typed(_s(x).rlike(_DOMAIN_RE), BOOL)


# ---------------------------------------------- dq: distance conversion
# reference: io/cdap/wrangler/dq/ConvertDistances.java:30-130. Exact
# BigDecimal semantics: multiplier = BigDecimal(str(from.toBase)) *
# BigDecimal(str(to.fromBase)); result = BigDecimal(str(value)) *
# multiplier, rendered back to double. Python's Decimal(repr(x))
# reproduces the BigDecimal(String.valueOf(x)) constructor — both are
# shortest-round-trip decimal renderings (verified against Java 17's
# Double.toString for all 26 constants below). The per-row step needs
# exact decimal arithmetic, so it is an Arrow-batched pandas UDF, not
# a double multiply (1-ulp divergences at the extremes otherwise).

_DISTANCE_UNITS: dict[str, tuple[str, str, float, float]] = {
    # enum: (display name, measure, to_base, from_base)
    "MILLIMETER": ("millimeter", "mm", 0.001, 1000.0),
    "CENTIMETER": ("centimeter", "cm", 0.01, 100.0),
    "DECIMETER": ("decimeter", "dm", 0.1, 10.0),
    "METER": ("meter", "m", 1.0, 1.0),
    "DEKAMETER": ("dekameter", "dam", 10.0, 0.1),
    "HECTOMETER": ("hectometer", "hm", 100.0, 0.01),
    "KILOMETER": ("kilometer", "km", 1000.0, 0.001),
    "INCH": ("inch", "in", 0.0254, 39.3700787401574803),
    "FOOT": ("foot", "ft", 0.3048, 3.28083989501312336),
    "YARD": ("yard", "yd", 0.9144, 1.09361329833770779),
    "MILE": ("mile", "mi", 1609.344, 0.00062137119223733397),
    "NAUTICAL_MILE": ("nautical mile", "nm", 1852.0, 0.000539956803455723542),
    "LIGHT_YEAR": ("light-year", "ly", 9460730472580800.0, 1.057000834024615463709e-16),
}


def _dist_unit(tc, default: str) -> str:
    """Resolve a unit literal to its enum key; accepts the enum name
    ('MILE'), display name ('nautical mile'), or measure ('mi'),
    case-insensitively. None → the reference's null-arg default."""
    if tc is None:
        return default
    v = tc.lit
    if v is None:
        raise ExpressionError("dq:convertDistance units must be string literals")
    key = str(v).strip().lower()
    for enum, (name, measure, _tb, _fb) in _DISTANCE_UNITS.items():
        if key in (enum.lower(), enum.lower().replace("_", " "), name, measure):
            return enum
    raise ExpressionError(f"unknown distance unit {v!r}")


@_reg("dq", "convertDistance", "convert_distance")
def _dq_convert_distance(x, frm=None, to=None):
    f = _dist_unit(frm, "MILE")
    t = _dist_unit(to, "KILOMETER")
    col = x.col.cast("double")
    if f == t:
        return _typed(col, DBL)
    from decimal import Decimal

    mult = Decimal(repr(_DISTANCE_UNITS[f][2])) * Decimal(repr(_DISTANCE_UNITS[t][3]))
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf(T.DoubleType())
    def fn(v: pd.Series) -> pd.Series:
        def one(d):
            if d is None or d != d:  # masked JVM-side; keep the guard cheap
                return None
            return float(Decimal(repr(d)) * mult)

        return v.map(one)

    # NaN/null pass through JVM-side: a NaN in the returned pandas
    # series would round-trip to null through Arrow.
    out = F.when(col.isNull() | F.isnan(col), col).otherwise(fn(col))
    return _typed(out, DBL)


# ------------------------------------------- string: dq cleanup ops
# reference: io/cdap/wrangler/dq/ConvertString.java:26-180. All four
# are pure Column regexp ops — Spark's regexp_replace IS Java regex,
# so the reference's patterns (including the \p{Z} backreference
# collapse) carry over verbatim and stay in codegen.

# ConvertString.WHITESPACE_CHARS (java:28-54) as one character class.
_WS_CHARS_CLASS = (
    "[\\t\\n\\u000B\\f\\r \\u0085\\u00A0\\u1680\\u180E"
    "\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"
)


def _lit_arg(tc, what: str):
    if tc.lit is None:
        raise ExpressionError(f"{what} must be a string literal")
    return str(tc.lit)


@_reg("string", "removeTrailingAndLeading")
def _str_remove_trailing_leading(x, ch=None):
    """ConvertString.removeTrailingAndLeading (java:117-140): strip
    every leading, then every trailing, occurrence of the exact token
    (default single SPACE — deliberately narrower than trim(): a
    leading tab survives). Token is a literal, so it is \\Q-quoted."""
    tok = " " if ch is None else _lit_arg(ch, "removeTrailingAndLeading token")
    s = _s(x)
    if tok == "":
        return _typed(s, STR)
    q = "\\Q" + tok + "\\E"
    out = F.regexp_replace(F.regexp_replace(s, f"^(?:{q})+", ""), f"(?:{q})+$", "")
    return _typed(out, STR)


@_reg("string", "removeTrailingAndLeadingWhitespaces")
def _str_remove_trailing_leading_ws(x):
    """ConvertString.removeTrailingAndLeadingWhitespaces (java:91-105):
    strip any char of the 26-char whitespace set from both ends."""
    s = _s(x)
    out = F.regexp_replace(
        F.regexp_replace(s, f"^{_WS_CHARS_CLASS}+", ""), f"{_WS_CHARS_CLASS}+$", ""
    )
    return _typed(out, STR)


@_reg("string", "removeRepeatedChars", "removeRepeatedChar")
def _str_remove_repeated(x, ch):
    """ConvertString.removeRepeatedChar (java:148-155): collapse
    consecutive runs of the token to one occurrence. The reference
    compiles the token RAW into '(tok)+' and replaces with the raw
    token — mirrored exactly (both pattern and replacement are Java
    Matcher semantics in Spark too)."""
    tok = _lit_arg(ch, "removeRepeatedChars token") if ch is not None else ""
    s = _s(x)
    if tok == "":
        return _typed(s, STR)
    return _typed(F.regexp_replace(s, f"({tok})+", tok), STR)


@_reg("string", "removeRepeatedWhitespaces")
def _str_remove_repeated_ws(x):
    """ConvertString.removeRepeatedWhitespaces (java:163-178): collapse
    runs of the SAME whitespace char via backreference — '\\r\\n\\r\\n'
    survives, '\\t\\t' collapses. The reference's pattern plus an
    explicit \\u180E: its JUnit pins that char collapsing (Unicode 6.1
    classed it Zs; >=6.3 reclassed it Cf, dropping it from Java 17's
    \\p{Z}), so the documented WHITESPACE_CHARS contract needs it named."""
    return _typed(
        F.regexp_replace(_s(x), r"([\s\u0085\u180e\p{Z}])\1+", "$1"), STR
    )


# ------------------------------------------------------------ arithmetic:
# reference: utils/ArithmeticOperations.java (null-safe ops)

@_reg("arithmetic", "add")
def _ar_add(*xs):
    out = xs[0].col.cast("double")
    for x in xs[1:]:
        out = out + x.col.cast("double")
    return _typed(out, DBL)


@_reg("arithmetic", "minus", "subtract")
def _ar_sub(a, b):
    return _typed(a.col.cast("double") - b.col.cast("double"), DBL)


@_reg("arithmetic", "multiply")
def _ar_mul(*xs):
    out = xs[0].col.cast("double")
    for x in xs[1:]:
        out = out * x.col.cast("double")
    return _typed(out, DBL)


@_reg("arithmetic", "divideq")
def _ar_div(a, b):
    return _typed(a.col.cast("double") / b.col.cast("double"), DBL)


@_reg("arithmetic", "divider")
def _ar_mod(a, b):
    return _typed(a.col.cast("double") % b.col.cast("double"), DBL)


@_reg("arithmetic", "lcm")
def _ar_lcm(a, b):
    """LCM of two numbers, decimal-faithful (reference
    ArithmeticOperations.java:264-295: scale both to integers by
    10^max(scale), integer lcm, divide back — lcm(123.123, 456.456)
    == 18714.696). Arrow-batched; exact integer math in Python, no
    double rounding."""
    from decimal import Decimal

    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf(T.DoubleType())
    def _lcm(xa: pd.Series, xb: pd.Series) -> pd.Series:
        import math

        out = []
        for va, vb in zip(xa, xb):
            if va is None or vb is None:
                out.append(None)
                continue
            da, db = Decimal(str(va)), Decimal(str(vb))
            s = max(-da.as_tuple().exponent, -db.as_tuple().exponent, 0)
            ia, ib = int(da.scaleb(s)), int(db.scaleb(s))
            g = math.gcd(ia, ib)
            if g == 0:
                out.append(0.0)
                continue
            out.append(float(Decimal(abs(ia * ib) // g).scaleb(-s)))
        return pd.Series(out, dtype="float64")

    return _typed(_lcm(a.col.cast("double"), b.col.cast("double")), DBL)


@_reg("arithmetic", "max")
def _ar_max(*xs):
    """Reference ArithmeticOperations.max:391 — null-propagating
    (greatest() skips nulls, the reference returns null), so guard."""
    cols = [x.col.cast("double") for x in xs]
    anynull = F.lit(False)
    for c in cols:
        anynull = anynull | c.isNull()
    out = cols[0] if len(cols) == 1 else F.greatest(*cols)
    return _typed(F.when(~anynull, out), DBL)


@_reg("arithmetic", "min")
def _ar_min(*xs):
    cols = [x.col.cast("double") for x in xs]
    anynull = F.lit(False)
    for c in cols:
        anynull = anynull | c.isNull()
    out = cols[0] if len(cols) == 1 else F.least(*cols)
    return _typed(F.when(~anynull, out), DBL)


@_reg("arithmetic", "average")
def _ar_avg(*xs):
    out = xs[0].col.cast("double")
    for x in xs[1:]:
        out = out + x.col.cast("double")
    return _typed(out / F.lit(len(xs)), DBL)


@_reg("arithmetic", "equal")
def _ar_equal(*xs):
    """ArithmeticOperations.equal:299-389 — true iff every value equals
    the first; any null → null (via null-propagating conjunction)."""
    first = xs[0].col.cast("double")
    out = None
    for x in xs[1:]:
        e = first == x.col.cast("double")
        out = e if out is None else (out & e)
    return _typed(out if out is not None else first.isNotNull(), BOOL)


# ------------------------------------------------------------ logical:
# reference: io/cdap/functions/Logical.java:36-193

@_reg("logical", "BitAnd")
def _bitand(a, b):
    return _typed(a.col.cast("long").bitwiseAND(b.col.cast("long")), LNG)


@_reg("logical", "BitOr")
def _bitor(a, b):
    return _typed(a.col.cast("long").bitwiseOR(b.col.cast("long")), LNG)


@_reg("logical", "BitXor")
def _bitxor(a, b):
    return _typed(a.col.cast("long").bitwiseXOR(b.col.cast("long")), LNG)


@_reg("logical", "Not")
def _lnot(x):
    """Not(0)=1, Not(nonzero)=0, Not(null)=1 (reference
    LogicalTest.java: logical:Not(null) == 1)."""
    v = x.col.cast("double")
    return _typed(
        F.when(v.isNull() | (v == 0), 1).otherwise(0).cast("long"), LNG
    )


@_reg("logical", "SetBit")
def _setbit(n, bit, val):
    """SetBit(n, [pos...], 0|1) — set/clear the 1-BASED bit positions
    (LSB = position 1), reference Logical.java:193-206 (`position - 1`
    then `1 << position`). Accepts a JEXL array literal `[2,4,8]`
    (LogicalTest.java: SetBit(356,[2,4,8],1) == 494) or a single
    position; positions must be compile-time constants so the combined
    mask folds to one literal."""
    nn = n.col.cast("long")
    positions = bit.lit if isinstance(bit.lit, list) else [bit.lit]
    if any(p is None for p in positions):
        raise ExpressionError("logical:SetBit positions must be literal integers")
    mask = 0
    for p in positions:
        mask |= 1 << (int(p) - 1)
    cleared = nn.bitwiseAND(F.lit(~mask))
    return _typed(
        F.when(val.col.cast("long") == 0, cleared).otherwise(nn.bitwiseOR(F.lit(mask))),
        LNG,
    )


@_reg("logical", "BitCompress")
def _bitcompress(x):
    """BitCompress('1011') → 11 — binary-digit string to decimal
    (DataStage-style; reference Logical.java)."""
    return _typed(F.conv(_s(x), 2, 10).cast("long"), LNG)


@_reg("logical", "BitExpand")
def _bitexpand(x):
    """BitExpand(11) → '1011' — decimal to binary-digit string."""
    return _typed(F.conv(x.col.cast("long").cast("string"), 10, 2), STR)


# ------------------------------------------------------------ number:
# reference: io/cdap/functions/NumberFunctions.java:28-84

@_reg("number", "AsDouble")
def _asdouble(x):
    return _typed(x.col.cast("double"), DBL)


@_reg("number", "AsFloat")
def _asfloat(x):
    return _typed(x.col.cast("float"), T.FloatType())


@_reg("number", "AsInteger")
def _asinteger(x):
    return _typed(x.col.cast("int"), INT)


@_reg("number", "Mantissa")
def _mantissa(x):
    v = x.col.cast("double")
    return _typed(v - F.floor(v), DBL)


# ------------------------------------------------------------ datetime:
# reference: io/cdap/functions/DateAndTime.java:132-676 (DataStage-style).
# TIME type gap in Spark: the reference's LocalTime values are LONG
# nanoseconds since midnight here (SURVEY.md §7 hard part d) — full
# sub-second fidelity for the *FromTime extractors while every
# arithmetic stays a JVM-side integer Column.

_NANOS_PER_SEC = 1_000_000_000
_NANOS_PER_DAY = 86_400 * _NANOS_PER_SEC


def _dow0(text) -> Column:
    """Day-of-week text ('thursday' / 'Thu', any case) → 0=Mon..6=Sun.
    Reference getDayOfWeek (DateAndTime.java:88-130) defaults to
    SUNDAY on unrecognized input."""
    k = F.upper(F.substring(text.col.cast("string"), 1, 3))
    m = F.create_map(
        *[F.lit(x) for kv in
          [("MON", 0), ("TUE", 1), ("WED", 2), ("THU", 3), ("FRI", 4), ("SAT", 5), ("SUN", 6)]
          for x in kv]
    )
    return F.coalesce(m[k], F.lit(6))


@_reg("datetime", "GetDate")
def _dt_getdate(x):
    return _typed(x.col.cast("date"), T.DateType())


@_reg("datetime", "GetTime")
def _dt_gettime(x):
    """LocalTime.parse('HH:mm[:ss[.fffffffff]]') → nanos since midnight."""
    if x.dtype is not None and isinstance(x.dtype, T.NumericType):
        return _typed(x.col.cast("long"), LNG)
    s = F.trim(x.col.cast("string"))
    h = F.nullif(F.regexp_extract(s, r"^(\d{1,2}):", 1), F.lit("")).cast("long")
    m = F.nullif(F.regexp_extract(s, r"^\d{1,2}:(\d{1,2})", 1), F.lit("")).cast("long")
    sec = F.nullif(F.regexp_extract(s, r"^\d{1,2}:\d{1,2}:(\d{1,2})", 1), F.lit("")).cast("long")
    frac = F.nullif(F.regexp_extract(s, r"^\d{1,2}:\d{1,2}:\d{1,2}\.(\d{1,9})", 1), F.lit(""))
    nanos = (
        h * 3600 * _NANOS_PER_SEC
        + m * 60 * _NANOS_PER_SEC
        + F.coalesce(sec, F.lit(0)) * _NANOS_PER_SEC
        + F.coalesce(F.rpad(frac, 9, "0").cast("long"), F.lit(0))
    )
    return _typed(nanos, LNG)


@_reg("datetime", "GetDateTime")
def _dt_getdatetime(x, time=None):
    """1-arg: parse/cast to datetime. 2-arg (reference GetDateTime(date,
    time), DateAndTime.java:544): combine a date and a time-of-day;
    nanos truncate to Spark's micros precision."""
    if time is None:
        return _typed(x.col.cast("timestamp_ntz"), T.TimestampNTZType())
    base = x.col.cast("date").cast("timestamp_ntz")
    return _typed(
        F.timestamp_add("MICROSECOND", (time.col.cast("long") / 1000).cast("long"), base),
        T.TimestampNTZType(),
    )


@_reg("datetime", "CurrentDate")
def _dt_currentdate():
    return _typed(F.current_date(), T.DateType())


@_reg("datetime", "CurrentDateTime")
def _dt_currentdatetime():
    return _typed(F.current_timestamp().cast("timestamp_ntz"), T.TimestampNTZType())


@_reg("datetime", "CurrentTimestamp")
def _dt_currenttimestamp():
    return _typed(F.current_timestamp(), T.TimestampType())


@_reg("datetime", "EpochSeconds")
def _dt_epochseconds():
    return _typed(F.unix_timestamp(F.current_timestamp()), LNG)


@_reg("datetime", "CurrentTimestampMS")
def _dt_currenttimestampms():
    return _typed(F.unix_millis(F.current_timestamp()), LNG)


@_reg("datetime", "CurrentTime")
def _dt_currenttime():
    """LocalTime.now() → nanos since midnight (session-tz day)."""
    now = F.current_timestamp()
    return _typed(
        (F.unix_micros(now) - F.unix_micros(F.date_trunc("DAY", now))) * 1000, LNG
    )


@_reg("datetime", "CurrentTimeMS")
def _dt_currenttimems():
    """Reference quirk (DateAndTime.java:167): CurrentTime().getNano()
    / 1e6 — the millisecond PORTION of the current second (0-999),
    not epoch millis (that is CurrentTimestampMS)."""
    return _typed(((F.unix_micros(F.current_timestamp()) % 1_000_000) / 1000).cast("long"), LNG)


@_reg("datetime", "CurrentTimestampNano")
def _dt_currenttimestampnano():
    """Reference quirk (DateAndTime.java:202): Instant.now().getNano()
    — nanos WITHIN the current second, not epoch nanos."""
    return _typed((F.unix_micros(F.current_timestamp()) % 1_000_000) * 1000, LNG)


@_reg("datetime", "DateFromDaysSince")
def _dt_datefromdayssince(days, baseline=None):
    # 1-arg overload adds to the CURRENT date (DateAndTime.java:213)
    base = baseline.col.cast("date") if baseline is not None else F.current_date()
    return _typed(F.date_add(base, F.coalesce(days.col.cast("int"), F.lit(0))), T.DateType())


@_reg("datetime", "DateFromComponents")
def _dt_datefromcomponents(y, m, d):
    return _typed(F.make_date(y.col.cast("int"), m.col.cast("int"), d.col.cast("int")), T.DateType())


@_reg("datetime", "DateFromJulianDay")
def _dt_datefromjulianday(jd):
    # julian day 0 = 4713-01-01 BC; unix epoch = JD 2440588
    return _typed(F.date_add(F.to_date(F.lit("1970-01-01")), (jd.col.cast("long") - 2440588).cast("int")), T.DateType())


@_reg("datetime", "DateOffsetByDays")
def _dt_dateoffsetbydays(d, off):
    return _typed(F.date_add(d.col.cast("date"), off.col.cast("int")), T.DateType())


@_reg("datetime", "DateOffsetByComponents")
def _dt_dateoffsetbycomponents(d, ys, ms, ds):
    out = F.add_months(d.col.cast("date"), ys.col.cast("int") * 12 + ms.col.cast("int"))
    return _typed(F.date_add(out, ds.col.cast("int")), T.DateType())


@_reg("datetime", "DaysSinceFromDate")
def _dt_dayssincefromdate(src, dst=None):
    base = dst.col.cast("date") if dst is not None else F.to_date(F.lit("1900-01-01"))
    return _typed(F.datediff(base, src.col.cast("date")).cast("long"), LNG)


@_reg("datetime", "DaysInMonth")
def _dt_daysinmonth(d):
    return _typed(F.dayofmonth(F.last_day(d.col.cast("date"))), INT)


@_reg("datetime", "DaysInYear")
def _dt_daysinyear(d):
    y = F.year(d.col.cast("date"))
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    return _typed(F.when(leap, 366).otherwise(365), INT)


@_reg("datetime", "JulianDayFromDate")
def _dt_juliandayfromdate(d):
    return _typed(
        (F.datediff(d.col.cast("date"), F.to_date(F.lit("1970-01-01"))) + 2440588).cast("long"), LNG
    )


@_reg("datetime", "MonthFromDate")
def _dt_monthfromdate(d):
    return _typed(F.month(d.col.cast("date")), INT)


@_reg("datetime", "WeekdayFromDate")
def _dt_weekdayfromdate(d, start=None):
    """Reference semantics (DateAndTime.java:636-653): 8 - ISO-dow of
    the START-OF-WEEK day (default 'Sunday' → 1); previousOrSame(start)
    always lands on `start` itself, so the result depends only on the
    start-of-week argument (null start → the date's own ISO dow).
    Null-propagates on the date."""
    if start is None:
        days_in_week = F.lit(7)  # Sunday
    else:
        days_in_week = F.when(start.col.isNull(), F.weekday(d.col.cast("date")) + 1).otherwise(
            _dow0(start) + 1
        )
    return _typed(
        F.when(d.col.cast("date").isNotNull(), F.lit(8) - days_in_week).cast("int"), INT
    )


def _next_dow_delta(d: Column, t0: Column) -> Column:
    # days from d to the STRICTLY-NEXT t0 weekday (1..7)
    return F.pmod(t0 - F.weekday(d) - 1, F.lit(7)) + 1


def _prev_dow_delta(d: Column, t0: Column) -> Column:
    # days from d back to the STRICTLY-PREVIOUS t0 weekday (1..7)
    return F.pmod(F.weekday(d) - t0 - 1, F.lit(7)) + 1


@_reg("datetime", "NextWeekdayFromDate")
def _dt_nextweekdayfromdate(d, dow):
    """TemporalAdjusters.next(dow) (DateAndTime.java:420)."""
    dd = d.col.cast("date")
    out = F.date_add(dd, _next_dow_delta(dd, _dow0(dow)).cast("int"))
    return _typed(F.when(dow.col.isNull(), dd).otherwise(out), T.DateType())


@_reg("datetime", "PreviousWeekdayFromDate")
def _dt_previousweekdayfromdate(d, dow):
    """TemporalAdjusters.previous(dow) (DateAndTime.java:461)."""
    dd = d.col.cast("date")
    out = F.date_sub(dd, _prev_dow_delta(dd, _dow0(dow)).cast("int"))
    return _typed(F.when(dow.col.isNull(), dd).otherwise(out), T.DateType())


@_reg("datetime", "NthWeekdayFromDate")
def _dt_nthweekdayfromdate(d, dow, n):
    """next/previous applied |n| times (DateAndTime.java:437-448):
    the first hop is strict, the rest are whole weeks."""
    dd = d.col.cast("date")
    t0 = _dow0(dow)
    nn = n.col.cast("int")
    pos = F.date_add(dd, (_next_dow_delta(dd, t0) + (nn - 1) * 7).cast("int"))
    neg = F.date_sub(dd, (_prev_dow_delta(dd, t0) + (-nn - 1) * 7).cast("int"))
    out = (
        F.when(dow.col.isNull() | nn.isNull() | (nn == 0), dd)
        .when(nn > 0, pos)
        .otherwise(neg)
    )
    return _typed(out, T.DateType())


@_reg("datetime", "MonthDayFromDate")
def _dt_monthdayfromdate(d):
    return _typed(F.dayofmonth(d.col.cast("date")), INT)


@_reg("datetime", "YeardayFromDate")
def _dt_yeardayfromdate(d):
    return _typed(F.dayofyear(d.col.cast("date")), INT)


@_reg("datetime", "YearFromDate")
def _dt_yearfromdate(d):
    return _typed(F.year(d.col.cast("date")), INT)


@_reg("datetime", "YearweekFromDate")
def _dt_yearweekfromdate(d):
    """WeekFields.of(MONDAY, 7).weekOfWeekBasedYear (DateAndTime.java:676):
    week 1 = the first FULL Mon-Sun week of the year — NOT ISO
    (weekofyear's min-4-days rule differs by 1 near year starts)."""
    dd = d.col.cast("date")

    def first_monday(year_start: Column) -> Column:
        return F.date_add(year_start, F.pmod(F.lit(7) - F.weekday(year_start), F.lit(7)).cast("int"))

    fm_this = first_monday(F.trunc(dd, "year"))
    fm_prev = first_monday(F.trunc(F.add_months(dd, -12), "year"))
    fm = F.when(dd < fm_this, fm_prev).otherwise(fm_this)
    return _typed((F.floor(F.datediff(dd, fm) / 7) + 1).cast("int"), INT)


@_reg("datetime", "TimeFromMidnightSeconds")
def _dt_timefrommidnightseconds(s):
    # null seconds → midnight (DateAndTime.java:515)
    return _typed(F.coalesce(s.col.cast("long"), F.lit(0)) * _NANOS_PER_SEC, LNG)


@_reg("datetime", "TimeFromComponents")
def _dt_timefromcomponents(h, m, s, us=None):
    nanos = (
        h.col.cast("long") * 3600 + m.col.cast("long") * 60 + s.col.cast("long")
    ) * _NANOS_PER_SEC
    if us is not None:
        nanos = nanos + us.col.cast("long") * 1000
    return _typed(nanos, LNG)


@_reg("datetime", "TimeOffsetByComponents")
def _dt_timeoffsetbycomponents(t, h, m, s):
    """LocalTime.plusHours/Minutes/Seconds wraps around midnight
    (DateAndTime.java:531); null offsets are 0."""
    off = (
        F.coalesce(h.col.cast("long"), F.lit(0)) * 3600
        + F.coalesce(m.col.cast("long"), F.lit(0)) * 60
        + F.coalesce(s.col.cast("long"), F.lit(0))
    ) * _NANOS_PER_SEC
    return _typed(F.pmod(t.col.cast("long") + off, F.lit(_NANOS_PER_DAY)), LNG)


@_reg("datetime", "HoursFromTime")
def _dt_hoursfromtime(t):
    return _typed((t.col.cast("long") / (3600 * _NANOS_PER_SEC)).cast("int"), INT)


@_reg("datetime", "MinutesFromTime")
def _dt_minutesfromtime(t):
    return _typed(((t.col.cast("long") / (60 * _NANOS_PER_SEC)) % 60).cast("int"), INT)


@_reg("datetime", "SecondsFromTime")
def _dt_secondsfromtime(t):
    # the seconds PORTION (LocalTime.getSecond), not seconds-of-day
    return _typed(((t.col.cast("long") / _NANOS_PER_SEC) % 60).cast("int"), INT)


@_reg("datetime", "MidnightSecondsFromTime")
def _dt_midnightsecondsfromtime(t):
    return _typed((t.col.cast("long") / _NANOS_PER_SEC).cast("int"), INT)


@_reg("datetime", "NanoSecondsFromTime")
def _dt_nanosecondsfromtime(t):
    return _typed((t.col.cast("long") % _NANOS_PER_SEC).cast("int"), INT)


@_reg("datetime", "MicroSecondsFromTime")
def _dt_microsecondsfromtime(t):
    return _typed(((t.col.cast("long") % _NANOS_PER_SEC) / 1000).cast("int"), INT)


@_reg("datetime", "MilliSecondsFromTime")
def _dt_millisecondsfromtime(t):
    return _typed(((t.col.cast("long") % _NANOS_PER_SEC) / 1_000_000).cast("int"), INT)


@_reg("datetime", "DateTimeFromEpoch")
def _dt_datetimefromepoch(e):
    return _typed(F.timestamp_seconds(e.col.cast("long")).cast("timestamp_ntz"), T.TimestampNTZType())


@_reg("datetime", "EpochFromDateTime", "EpochFromTimestamp")
def _dt_epochfromdatetime(dtv):
    return _typed(F.unix_timestamp(dtv.col.cast("timestamp")), LNG)


@_reg("datetime", "DateTimeOffsetBySeconds")
def _dt_datetimeoffsetbyseconds(dtv, off):
    return _typed(
        F.timestamp_seconds(
            F.unix_timestamp(dtv.col.cast("timestamp")) + F.coalesce(off.col.cast("long"), F.lit(0))
        ).cast("timestamp_ntz"),
        T.TimestampNTZType(),
    )


@_reg("datetime", "DateTimeFromSecondsSince")
def _dt_datetimefromsecondssince(seconds, time):
    """time.plusSeconds(seconds) (DateAndTime.java:556); null seconds → time."""
    return _typed(
        F.timestamp_add(
            "SECOND", F.coalesce(seconds.col.cast("int"), F.lit(0)), time.col.cast("timestamp_ntz")
        ),
        T.TimestampNTZType(),
    )


@_reg("datetime", "DateTimeFromTime")
def _dt_datetimefromtime(t, dtv):
    """Overwrite the time-of-day of `dtv` with `t` (DateAndTime.java:582);
    null time → dtv unchanged."""
    base = dtv.col.cast("timestamp_ntz")
    replaced = F.timestamp_add(
        "MICROSECOND", (t.col.cast("long") / 1000).cast("long"), F.date_trunc("DAY", base)
    )
    return _typed(F.when(t.col.isNull(), base).otherwise(replaced), T.TimestampNTZType())


@_reg("datetime", "DateTimeOffsetByComponents")
def _dt_datetimeoffsetbycomponents(dtv, ys, mos, ds, hs, mins, secs):
    """Sequential plusYears/Months/Days/Hours/Minutes/Seconds
    (DateAndTime.java:596-609) — each month-ish step clamps day-of-month
    exactly like java.time, which chained timestamp_add reproduces."""
    out = dtv.col.cast("timestamp_ntz")
    for unit, tc in (
        ("YEAR", ys), ("MONTH", mos), ("DAY", ds),
        ("HOUR", hs), ("MINUTE", mins), ("SECOND", secs),
    ):
        out = F.timestamp_add(unit, F.coalesce(tc.col.cast("int"), F.lit(0)), out)
    return _typed(out, T.TimestampNTZType())


@_reg("datetime", "SecondsSinceFromDateTime")
def _dt_secondssince(src, dst):
    # Duration.between(destination, source) = source - destination
    # (DateAndTime.java:483) — note the sign.
    return _typed(
        F.unix_timestamp(src.col.cast("timestamp")) - F.unix_timestamp(dst.col.cast("timestamp")),
        LNG,
    )


# ------------------------------------------------------------ decimal:
# reference: utils/DecimalTransform.java

@_reg("decimal", "add")
def _dec_add(a, b):
    # operands at (37, s) keep Spark's addition result at p <= 38 with
    # the scale intact — (38,s)+(38,s) would cap and round off a digit
    col, s = _dec_in(a)
    dt, wt = T.DecimalType(38, s), T.DecimalType(37, s)
    return _typed((col.cast(wt) + b.col.cast(wt)).cast(dt), dt)


@_reg("decimal", "subtract")
def _dec_sub(a, b):
    col, s = _dec_in(a)
    dt, wt = T.DecimalType(38, s), T.DecimalType(37, s)
    return _typed((col.cast(wt) - b.col.cast(wt)).cast(dt), dt)


@_reg("decimal", "multiply")
def _dec_mul(a, b):
    col, s = _dec_in(a)
    dt = T.DecimalType(38, s)
    return _typed((col * b.col.cast(dt)).cast(dt), dt)


@_reg("decimal", "divideq")
def _dec_div(a, b):
    col, s = _dec_in(a)
    dt = T.DecimalType(38, s)
    return _typed((col / b.col.cast(dt)).cast(dt), dt)


@_reg("decimal", "precision")
def _dec_precision(a):
    """BigDecimal.precision() — digit count of the unscaled value.
    For a decimal-typed input the scale is the column's declared scale
    (a Spark decimal carries one static scale per column); other
    inputs go through the (38,6) default with trailing zeros stripped."""
    if isinstance(a.dtype, T.DecimalType):
        sc = a.dtype.scale
        unscaled = (a.col * F.lit(10 ** sc)).cast(T.DecimalType(38, 0))
        return _typed(F.length(F.abs(unscaled).cast("string")), INT)
    s = F.regexp_replace(F.abs(a.col.cast("decimal(38,6)")).cast("string"), r"[.]", "")
    return _typed(F.length(F.regexp_replace(s, r"0+$", "")), INT)


@_reg("decimal", "scale")
def _dec_scale(a):
    """BigDecimal.scale() — the declared scale for decimal-typed
    inputs, else the effective fractional-digit count through the
    (38,6) default."""
    if isinstance(a.dtype, T.DecimalType):
        return _typed(F.lit(a.dtype.scale), INT)
    s = a.col.cast("decimal(38,6)").cast("string")
    frac = F.regexp_extract(s, r"\.(\d*?)0*$", 1)
    return _typed(F.length(frac), INT)


@_reg("decimal", "abs")
def _dec_abs(a):
    col, s = _dec_in(a)
    return _typed(F.abs(col), T.DecimalType(38, s))


@_reg("decimal", "negate")
def _dec_negate(a):
    col, s = _dec_in(a)
    return _typed(-col, T.DecimalType(38, s))


def _dec_in(a) -> tuple[Column, int]:
    """(column, scale) — preserve a decimal input's own scale, else
    adopt the namespace default decimal(38,6)."""
    if isinstance(a.dtype, T.DecimalType):
        return a.col, a.dtype.scale
    return a.col.cast("decimal(38,6)"), 6


@_reg("decimal", "unscaled")
def _dec_unscaled(a):
    """BigDecimal.unscaledValue() — value × 10^scale as an integer
    (reference DecimalTransform.java:unscaled, ELTest
    testDecimalTransform)."""
    col, s = _dec_in(a)
    return _typed(
        (col * F.lit(10 ** s)).cast(T.DecimalType(38, 0)), T.DecimalType(38, 0)
    )


@_reg("decimal", "strip_zero")
def _dec_strip_zero(a):
    """stripTrailingZeros — numerically the identity; Spark decimals
    carry a static scale, so only the VALUE contract is kept
    (reference DecimalTransform.java:strip_zero)."""
    col, s = _dec_in(a)
    return _typed(col, T.DecimalType(38, s))


@_reg("decimal", "sign")
def _dec_sign(a):
    """-1/0/1 (reference DecimalTransform.java:sign)."""
    col, _ = _dec_in(a)
    return _typed(F.signum(col.cast("double")).cast("int"), INT)


@_reg("decimal", "pow")
def _dec_pow(a, n):
    """bd.pow(n) by repeated decimal multiplication — stays exact where
    double pow would lose precision past 2^53 (reference
    DecimalTransform.java:pow). n must be a literal 0..16."""
    col, s = _dec_in(a)
    if n.lit is None:
        raise ExpressionError("decimal:pow exponent must be a literal integer")
    k = int(n.lit)
    if not 0 <= k <= 16:
        raise ExpressionError("decimal:pow exponent must be in 0..16")
    if k == 0:
        return _typed(F.lit(1).cast(T.DecimalType(38, s)), T.DecimalType(38, s))
    # seed with the column itself — a (1 * col) seed would round col
    # through Spark's capped multiply scale before the first square
    out = col
    for _ in range(k - 1):
        out = (out * col).cast(T.DecimalType(38, s))
    return _typed(out.cast(T.DecimalType(38, s)), T.DecimalType(38, s))


@_reg("decimal", "decimal_left")
def _dec_left(a, n):
    """Move the decimal point n places left (reference
    DecimalTransform.java:decimal_left — divide by 10^n)."""
    col, s = _dec_in(a)
    if n.lit is None:
        raise ExpressionError("decimal:decimal_left n must be a literal integer")
    k = int(n.lit)
    t = min(s + k, 18)
    return _typed(
        (col.cast(T.DecimalType(38, t)) / F.lit(10 ** k)).cast(T.DecimalType(38, t)),
        T.DecimalType(38, t),
    )


@_reg("decimal", "decimal_right")
def _dec_right(a, n):
    """Move the decimal point n places right, truncating (ROUND_DOWN)
    to scale max(s-n, 0) (reference DecimalTransform.java:decimal_right)."""
    col, s = _dec_in(a)
    if n.lit is None:
        raise ExpressionError("decimal:decimal_right n must be a literal integer")
    k = int(n.lit)
    t = max(s - k, 0)
    # go through the EXACT unscaled integer (value × 10^s): a direct
    # col × 10^k multiply trips Spark's capped result scale and rounds
    # mid-flight; an integer-valued product rounds exactly, and for
    # k ≤ s the shifted value has exactly s-k fractional digits, so
    # ROUND_DOWN truncation is a no-op
    unscaled = (col * F.lit(10 ** s)).cast(T.DecimalType(38, 0))
    if k >= s:
        out = (unscaled * F.lit(10 ** (k - s))).cast(T.DecimalType(38, 0))
    else:
        # size the dividend so p1 + p2 + 1 <= 38 and Spark's division
        # keeps a result scale > t (exact, no mid-flight rounding);
        # bounds the unscaled value to 37-(s-k+1) digits — far beyond
        # any realistic shift input
        p2 = (s - k) + 1
        p1 = 37 - p2
        out = (unscaled.cast(T.DecimalType(p1, 0)) / F.lit(10 ** (s - k))).cast(
            T.DecimalType(38, t)
        )
    return _typed(out.cast(T.DecimalType(38, t)), T.DecimalType(38, t))


# ------------------------------------------------------------ bytes:
# reference: CDAP Bytes codecs (EL.java:181)

@_reg("bytes", "toString")
def _bytes_tostring(b):
    return _typed(b.col.cast("string"), STR)


@_reg("bytes", "toInt")
def _bytes_toint(b):
    # big-endian 4-byte decode, CDAP Bytes.toInt
    return _typed(F.conv(F.hex(F.substring(b.col.cast("binary"), 1, 4)), 16, 10).cast("int"), INT)


@_reg("bytes", "toLong")
def _bytes_tolong(b):
    return _typed(F.conv(F.hex(F.substring(b.col.cast("binary"), 1, 8)), 16, 10).cast("long"), LNG)


@_reg("bytes", "toHexString")
def _bytes_tohex(b):
    return _typed(F.lower(F.hex(b.col.cast("binary"))), STR)


@_reg("bytes", "fromHexString")
def _bytes_fromhex(s):
    return _typed(F.unhex(_s(s)), T.BinaryType())


@_reg("bytes", "toBase64")
def _bytes_tobase64(b):
    return _typed(F.base64(b.col.cast("binary")), STR)


@_reg("bytes", "fromBase64")
def _bytes_frombase64(s):
    return _typed(F.unbase64(_s(s)), T.BinaryType())


# ------------------------------------------------------------ geo:
# reference: io/cdap/functions/GeoFences.java:54-68 (inFence). Pure
# ray-casting point-in-polygon over the GeoJSON — no shapely needed —
# evaluated per batch in an Arrow pandas UDF (polygon parse once).

@_reg("geo", "inFence", "InFence")
def _geo_infence(lat, lon, fence):
    import json as _json

    from pyspark.sql.functions import pandas_udf as _pudf

    if fence.lit is None:
        raise ExpressionError("geo:inFence fence geojson must be a literal string")
    geo = _json.loads(str(fence.lit))

    def _rings(g):
        t = g.get("type")
        if t == "FeatureCollection":
            out = []
            for f_ in g["features"]:
                out.extend(_rings(f_["geometry"]))
            return out
        if t == "Feature":
            return _rings(g["geometry"])
        if t == "Polygon":
            return [g["coordinates"][0]]
        if t == "MultiPolygon":
            return [p[0] for p in g["coordinates"]]
        raise ExpressionError(f"geo:inFence unsupported geometry {t!r}")

    rings = _rings(geo)
    for ring in rings:
        # reference GeoFences.java rejects open polygons
        # (GeoFenceTest.testWithOpenPolygon expects IllegalArgumentException)
        if len(ring) < 4 or ring[0] != ring[-1]:
            raise ExpressionError(
                "geo:inFence polygon ring must be closed (first point == last point)"
            )

    def _pip(px, py, ring):
        inside = False
        n = len(ring)
        j = n - 1
        for i in range(n):
            xi, yi = ring[i][0], ring[i][1]
            xj, yj = ring[j][0], ring[j][1]
            if (yi > py) != (yj > py) and px < (xj - xi) * (py - yi) / (yj - yi) + xi:
                inside = not inside
            j = i
        return inside

    @_pudf(T.BooleanType())
    def infence(la: pd.Series, lo: pd.Series) -> pd.Series:
        return pd.Series(
            [
                any(_pip(float(x), float(y), r) for r in rings)
                if x is not None and y is not None
                else None
                for y, x in zip(la, lo)
            ]
        )

    return _typed(infence(lat.col.cast("double"), lon.col.cast("double")), BOOL)


# ------------------------------------------------------------ ddl ns
# reference: io/cdap/functions/DDL.java:49-317 — schema/record ops.
# Records are struct columns in this engine. The schema-literal
# overloads (parse of a JSON/SQL schema STRING, DDL.java:49-72) are
# design-time service helpers with no runtime Column equivalent; the
# record-level surface (drop/select/hasField/toJson/parse(record),
# DDL.java:79-116,300-317) maps to native struct expressions below.


@_reg("ddl", "drop")
def _ddl_drop(rec, *paths):
    """ddl:drop(record, path...) — record minus the named (possibly
    nested, dotted) fields. DDL.java:300-314 → Column.dropFields."""
    col = rec.col
    names = []
    for p in paths:
        name = _lit_value(p, "ddl:drop path")
        names.append(name.lower())
        col = col.dropFields(name)
    dt = None
    if isinstance(rec.dtype, T.StructType):
        dt = T.StructType(
            [f for f in rec.dtype.fields if f.name.lower() not in names]
        )
    return _typed(col, dt)


@_reg("ddl", "select")
def _ddl_select(rec, path):
    """ddl:select(record, path) — the value at a dotted path, with
    `a[0]` array indexing and `m[key]` map access (DDL.java:317
    parsePath: NAME ( '[' INDEX-or-KEY ']' )* per dotted segment;
    DDLTest.testGetRecursiveRecord pins rec1.rec2[1].x and m[rec2].x)."""
    import re as _re

    p = _lit_value(path, "ddl:select path")
    col, dt = rec.col, rec.dtype
    for part in p.split("."):
        m = _re.fullmatch(r"([\w]+)((?:\[[^\]]+\])*)", part.strip())
        name = m.group(1) if m else part
        col = col.getField(name)
        if isinstance(dt, T.StructType):
            dt = next(
                (f.dataType for f in dt.fields if f.name.lower() == name.lower()), None
            )
        else:
            dt = None
        for key in _re.findall(r"\[([^\]]+)\]", m.group(2) if m else ""):
            if key.isdigit() and isinstance(dt, (T.ArrayType, type(None))):
                col = col.getItem(int(key))
            else:
                col = col.getItem(key.strip("'\""))
            if isinstance(dt, T.ArrayType):
                dt = dt.elementType
            elif isinstance(dt, T.MapType):
                dt = dt.valueType
            else:
                dt = None
    return _typed(col, dt)


@_reg("ddl", "hasField", "hasfield")
def _ddl_hasfield(rec, name):
    """ddl:hasField(record, name) — schema membership; resolved at
    compile time from the struct type (DDL.java:102-109)."""
    n = _lit_value(name, "ddl:hasField name").lower()
    if isinstance(rec.dtype, T.StructType):
        return _typed(
            F.lit(any(f.name.lower() == n for f in rec.dtype.fields)), BOOL
        )
    return _typed(F.lit(None).cast("boolean"), BOOL)


@_reg("ddl", "toJson", "tojson")
def _ddl_tojson(rec):
    """ddl:toJson(record) — DDL.java:90-96 → to_json."""
    return _typed(F.to_json(rec.col), STR)


@_reg("ddl", "parse")
def _ddl_parse(rec):
    """ddl:parse(record) — identity on an already-structured record
    (DDL.java:79-83)."""
    return rec
