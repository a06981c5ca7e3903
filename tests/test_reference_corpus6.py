"""Sixth wave of reference JUnit mirrors: the dq toolkit classes.

- ConvertDistancesTest.java — exact-BigDecimal distance conversion:
  the NaN / zero / MAX_VALUE / MIN_VALUE extremes, the default
  (mile→km) constructor, and the full millimeter + light-year pinned
  batteries (the other 11 batteries are the same 13-way table row by
  row; two rows pin every constant pair at least once each way).
- ConvertStringTest.java — custom-token end trimming, repeated-char
  collapse (CR / LF / CRLF / TAB / letters / null guards), and the
  same-char whitespace collapse across the 26-char whitespace set.

All cases for one class run as a single one-row select so the wave
costs two Spark jobs, not sixty.
"""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangler_spark import execute
from wrangler_spark.errors import ExpressionError
from wrangler_spark.expr.functions import resolve_call
from wrangler_spark.expr.jexl import TypedCol

DELTA = 1.0e-34  # ConvertDistancesTest.java:28


def _aeq(exp, got, delta=DELTA):
    """JUnit Assert.assertEquals(double, double, delta) semantics."""
    if exp is None or got is None:
        assert exp is None and got is None, (exp, got)
        return
    if math.isnan(exp):
        assert math.isnan(got), got
        return
    assert got == exp or abs(got - exp) <= delta, (exp, got)


def _dist_expr(value, frm=None, to=None):
    args = [TypedCol(F.lit(float(value)), T.DoubleType())]
    if frm is not None:
        args.append(TypedCol(F.lit(frm), T.StringType(), lit=frm))
    if to is not None:
        args.append(TypedCol(F.lit(to), T.StringType(), lit=to))
    return resolve_call("dq", "convertDistance", args).col


MAXV = 1.7976931348623157e308  # Double.MAX_VALUE
MINV = 5e-324  # Double.MIN_VALUE

# testConvertMillimeter (java:78-134): 1.0 mm → every unit.
MM_BATTERY = {
    "mm": 1.0,
    "cm": 0.1,
    "dm": 0.01,
    "m": 0.001,
    "dam": 0.0001,
    "hm": 0.00001,
    "km": 0.000001,
    "in": 0.03937007874015748,
    "ft": 0.0032808398950131233,
    "yd": 0.0010936132983377078,
    "mi": 6.213711922373339e-7,
    "nm": 5.399568034557235e-7,
    "ly": 1.0570008340246155e-19,
}

# testConvertLightYear (java:762-818): 1.0 ly → every unit.
LY_BATTERY = {
    "ly": 1.0,
    "mm": 9.4607304725808e18,
    "cm": 9.4607304725808e17,
    "dm": 9.4607304725808e16,
    "m": 9.4607304725808e15,
    "dam": 9.4607304725808e14,
    "hm": 9.4607304725808e13,
    "km": 9.4607304725808e12,
    "in": 3.7246970364491341e17,
    "ft": 3.1039141970409452e16,
    "yd": 1.034638065680315e16,
    "mi": 5.878625373183607e12,
    "nm": 5.108385784330886e12,
}


def test_convert_distances_battery(spark):
    cases = {}
    # testConvertDoubleNan / testConvertZero / testConvertDefault
    cases["nan"] = (_dist_expr(float("nan"), "mi", "km"), float("nan"))
    cases["zero"] = (_dist_expr(0.0, "mi", "km"), 0.0)
    cases["default"] = (_dist_expr(1.0), 1.609344)
    # testConvertMaxValue / testConvertMinValue
    cases["max_ly_mm"] = (_dist_expr(MAXV, "ly", "mm"), float("inf"))
    cases["max_mm_ly"] = (_dist_expr(MAXV, "mm", "ly"), 1.900163142869793e289)
    cases["min_mm_ly"] = (_dist_expr(MINV, "mm", "ly"), 0.0)
    cases["min_ly_mm"] = (_dist_expr(MINV, "ly", "mm"), 0.0)
    for unit, exp in MM_BATTERY.items():
        cases[f"mm_{unit}"] = (_dist_expr(1.0, "mm", unit), exp)
    for unit, exp in LY_BATTERY.items():
        cases[f"ly_{unit}"] = (_dist_expr(1.0, "ly", unit), exp)

    row = (
        spark.range(1)
        .select(*[c.alias(k) for k, (c, _e) in cases.items()])
        .first()
    )
    for k, (_c, exp) in cases.items():
        _aeq(exp, row[k])


def test_convert_distance_unit_spellings(spark):
    """Enum name, display name, and measure all resolve; unknown
    raises at compile time."""
    row = (
        spark.range(1)
        .select(
            _dist_expr(1.0, "MILE", "KILOMETER").alias("a"),
            _dist_expr(1.0, "mile", "kilometer").alias("b"),
            _dist_expr(1.0, "NAUTICAL_MILE", "nautical mile").alias("c"),
        )
        .first()
    )
    _aeq(1.609344, row["a"])
    _aeq(1.609344, row["b"])
    _aeq(1.0, row["c"])  # from == to short-circuit
    with pytest.raises(ExpressionError):
        _dist_expr(1.0, "parsec", "km")


def test_convert_distance_through_recipe(spark):
    """The JEXL surface: dq:convertDistance in a set-column."""
    df = spark.createDataFrame([(26.2,)], "v double")
    ok, _ = execute(
        spark, ["set-column km dq:convertDistance(v, 'mi', 'km')"], df
    )
    _aeq(42.1648128, ok.first()["km"], 1e-9)


def _str_expr(fn, value, *lits):
    args = [TypedCol(F.lit(value).cast("string"), T.StringType())]
    args += [TypedCol(F.lit(x), T.StringType(), lit=x) for x in lits]
    return resolve_call("string", fn, args).col


WS_CHARS = [
    "\t", "\n", "", "\f", "\r", " ", "", " ",
    " ", "᠎", " ", " ", " ", " ",
    " ", " ", " ", " ", " ", " ",
    " ", " ", " ", " ", " ", "　",
]  # ConvertString.WHITESPACE_CHARS (java:28-54)


def test_convert_string_battery(spark):
    exp = "abc"
    cases = [
        # testRemoveTrailingAndLeading (default token = single space)
        ("removeTrailingAndLeading", exp, (), exp),
        ("removeTrailingAndLeading", " abc", (), exp),
        ("removeTrailingAndLeading", " abc ", (), exp),
        ("removeTrailingAndLeading", " abc  ", (), exp),
        ("removeTrailingAndLeading", "  abc ", (), exp),
        ("removeTrailingAndLeading", "  abc  ", (), exp),
        ("removeTrailingAndLeading", " ab c", (), "ab c"),
        ("removeTrailingAndLeading", " a b c ", (), "a b c"),
        # explicit tokens
        ("removeTrailingAndLeading", "\tabc", ("\t",), exp),
        ("removeTrailingAndLeading", "abc\t", ("\t",), exp),
        ("removeTrailingAndLeading", "	abc", ("\t",), exp),
        ("removeTrailingAndLeading", "	abc		", ("\t",), exp),
        ("removeTrailingAndLeading", "\tabc ", ("\t",), "abc "),
        ("removeTrailingAndLeading", "\ta\tbc", ("\t",), "a\tbc"),
        ("removeTrailingAndLeading", "\tabc ", (), "\tabc"),
        ("removeTrailingAndLeading", "\nabc", ("\n",), exp),
        ("removeTrailingAndLeading", "\nabc ", ("\n",), "abc "),
        ("removeTrailingAndLeading", "abc", ("\r",), exp),
        ("removeTrailingAndLeading", "\rabc", ("\r",), exp),
        ("removeTrailingAndLeading", "\rabc\r", ("\r",), exp),
        ("removeTrailingAndLeading", "\rabc ", ("\r",), "abc "),
        ("removeTrailingAndLeading", "\rabc \r", ("\r",), "abc "),
        # multi-char tokens strip whole-token occurrences only
        ("removeTrailingAndLeading", " abc", (" a",), "bc"),
        ("removeTrailingAndLeading", " abc", ("bc",), " a"),
        ("removeTrailingAndLeading", "cabc", ("c",), "ab"),
        # testRemoveTrailingAndLeadingWhitespaces
        ("removeTrailingAndLeadingWhitespaces", " abc" + "".join(WS_CHARS), (), exp),
        # testremoveDuplicate_* (repeated-char collapse)
        ("removeRepeatedChars", "a\rbccccdeaa\r\r\ry", ("\r",), "a\rbccccdeaa\ry"),
        ("removeRepeatedChars", "a\nbccccdeaa\n\n\ny", ("\n",), "a\nbccccdeaa\ny"),
        (
            "removeRepeatedChars",
            "a\r\nbccccdeaa\r\n\r\n\r\ny",
            ("\r\n",),
            "a\r\nbccccdeaa\r\ny",
        ),
        (
            "removeRepeatedChars",
            "a\tbccccdeaa\t\t\t\t\t\ty",
            ("\t",),
            "a\tbccccdeaa\ty",
        ),
        ("removeRepeatedChars", "atbccccdeaaCCtcy", ("c",), "atbcdeaaCCtcy"),
        ("removeRepeatedChars", "aaatbccccdeaaCCtcy", ("a",), "atbccccdeaCCtcy"),
        (
            "removeRepeatedChars",
            "acacacactbccccdeaCCtaccy",
            ("ac",),
            "actbccccdeaCCtaccy",
        ),
        ("removeRepeatedChars", "abcdef", ("c",), "abcdef"),
        ("removeRepeatedChars", "", ("c",), ""),
        ("removeRepeatedChars", "aaabc", ("",), "aaabc"),
        # testremoveWhiteSpace — same-char runs collapse, \r\n does not
        (
            "removeRepeatedWhitespaces",
            "a   b\t\t\tc\n\n\nd\r\re\f\ff",
            (),
            "a b\tc\nd\re\ff",
        ),
        ("removeRepeatedWhitespaces", "aaab\r\n\r\n\r\nx", (), "aaab\r\n\r\n\r\nx"),
        (
            "removeRepeatedWhitespaces",
            "ab  c  d᠎᠎e"
            "  f  g  h  i  ",
            (),
            "ab c d᠎e f g h i ",
        ),
        (
            "removeRepeatedWhitespaces",
            "a   b  c  d  e"
            "  f  g  h  i  "
            "j  k　　l",
            (),
            "a b c d e f g h i "
            "j k　l",
        ),
        ("removeRepeatedWhitespaces", "", (), ""),
        ("removeRepeatedWhitespaces", "abccdef", (), "abccdef"),
    ]
    exprs = [
        _str_expr(fn, value, *lits).alias(f"c{i}")
        for i, (fn, value, lits, _e) in enumerate(cases)
    ]
    row = spark.range(1).select(*exprs).first()
    for i, (fn, value, lits, expected) in enumerate(cases):
        assert row[f"c{i}"] == expected, (fn, value, lits, expected, row[f"c{i}"])


def test_convert_string_null_passthrough(spark):
    """Null input returns null through every op (java guards)."""
    df = spark.createDataFrame([(None,)], "s string")
    col = TypedCol(F.col("s"), T.StringType())
    tok = TypedCol(F.lit("c"), T.StringType(), lit="c")
    row = df.select(
        resolve_call("string", "removeRepeatedChars", [col, tok]).col.alias("a"),
        resolve_call("string", "removeRepeatedWhitespaces", [col]).col.alias("b"),
        resolve_call("string", "removeTrailingAndLeading", [col]).col.alias("c"),
        resolve_call("string", "removeTrailingAndLeadingWhitespaces", [col]).col.alias("d"),
    ).first()
    assert row["a"] is None and row["b"] is None
    assert row["c"] is None and row["d"] is None


def test_convert_string_whitespace_set_complete(spark):
    """Every char of WHITESPACE_CHARS strips from both ends
    (testRemoveTrailingAndLeadingWhitespaces builds exactly this)."""
    inp = "".join(WS_CHARS) + "abc" + "".join(reversed(WS_CHARS))
    row = (
        spark.range(1)
        .select(_str_expr("removeTrailingAndLeadingWhitespaces", inp).alias("o"))
        .first()
    )
    assert row["o"] == "abc"
