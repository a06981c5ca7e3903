import datetime as dt

import pytest

from wrangler_spark.expr.jexl import compile_expr


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(dt.date(2020, 3, 1), dt.datetime(2020, 3, 1, 12, 0, 0), 2.5, b"\x00\x00\x00\x07", "a b")],
        "d date, ts timestamp, v double, bin binary, s string",
    )


def run1(df, src):
    return df.select(compile_expr(src, df.schema).alias("v")).first()["v"]


def test_datetime_components(df):
    assert run1(df, "datetime:YearFromDate(d)") == 2020
    assert run1(df, "datetime:MonthFromDate(d)") == 3
    assert run1(df, "datetime:DaysInMonth(d)") == 31
    assert run1(df, "datetime:DaysInYear(d)") == 366  # leap year
    # reference WeekdayFromDate = 8 - ISO-dow(startOfWeek), default
    # Sunday → constant 1 (DateAndTime.java:636-653; its own test pins
    # weekday1..7 = 1..7 for saturday..monday starts)
    assert run1(df, "datetime:WeekdayFromDate(d)") == 1
    assert run1(df, "datetime:WeekdayFromDate(d, 'monday')") == 7
    assert run1(df, "datetime:WeekdayFromDate(d, 'saturday')") == 2


def test_datetime_offsets(df):
    assert run1(df, "datetime:DateOffsetByDays(d, 10)") == dt.date(2020, 3, 11)
    assert run1(df, "datetime:DateFromComponents(2021, 2, 3)") == dt.date(2021, 2, 3)
    jd = run1(df, "datetime:JulianDayFromDate(d)")
    assert run1(df, f"datetime:DateFromJulianDay({jd})") == dt.date(2020, 3, 1)


def test_datetime_epoch(df):
    e = run1(df, "datetime:EpochFromDateTime(ts)")
    assert e == int(dt.datetime(2020, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp())
    rt = run1(df, "datetime:DateTimeFromEpoch(datetime:EpochFromDateTime(ts))")
    assert rt == dt.datetime(2020, 3, 1, 12, 0, 0)


def test_time_as_nanos(df):
    # TIME values are long nanos-since-midnight (functions.py datetime:
    # section note); 01:30:15 = 5415 s
    assert run1(df, "datetime:TimeFromComponents(1, 30, 15)") == 5415 * 10**9
    assert run1(df, "datetime:TimeFromMidnightSeconds(5415)") == 5415 * 10**9
    assert run1(df, "datetime:MidnightSecondsFromTime(datetime:TimeFromMidnightSeconds(5415))") == 5415


def test_decimal_ns(df):
    assert float(run1(df, "decimal:add(v, 1.5)")) == 4.0
    assert float(run1(df, "decimal:multiply(v, 2)")) == 5.0
    assert float(run1(df, "decimal:abs(decimal:negate(v))")) == 2.5


def test_bytes_ns(df):
    assert run1(df, "bytes:toInt(bin)") == 7
    assert run1(df, "bytes:toHexString(bin)") == "00000007"
    assert run1(df, "bytes:toBase64(bin)") == "AAAABw=="


def test_geo_infence(df):
    square = '{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}'
    assert run1(df, f"geo:inFence(5.0, 5.0, '{square}')") is True
    assert run1(df, f"geo:inFence(15.0, 5.0, '{square}')") is False


def test_string_split_join(df):
    assert run1(df, "string:split(s, ' ')") == ["a", "b"]
    assert run1(df, "string:join('-', s, 'c')") == "a b-c"


def test_dq_credit_cards(spark, one_col):
    df = one_col("4111111111111111", "4111111111111112", "378282246310005", "not-a-card")
    from wrangler_spark import execute
    ok, _ = execute(spark, [
        "set-column :cc dq:isCreditCard(body)",
        "set-column :visa dq:isVisa(body)",
        "set-column :amex dq:isAmex(body)",
    ], df)
    rows = ok.collect()
    assert [r["cc"] for r in rows] == [True, False, True, False]
    assert [r["visa"] for r in rows] == [True, False, False, False]
    assert [r["amex"] for r in rows] == [False, False, True, False]


def test_dq_isbn(spark, one_col):
    df = one_col("0-306-40615-2", "9780306406157", "0-306-40615-3")
    from wrangler_spark import execute
    ok, _ = execute(spark, ["set-column :v dq:isISBN(body)"], df)
    assert [r["v"] for r in ok.collect()] == [True, True, False]


def test_logical_bits(spark, one_col):
    df = one_col("x")
    from wrangler_spark import execute
    ok, _ = execute(spark, [
        "set-column :a logical:SetBit(8, 1, 1)",
        "set-column :b logical:SetBit(9, 1, 0)",
        "set-column :c logical:BitCompress('1011')",
        "set-column :d logical:BitExpand(11)",
        "set-column :e logical:SetBit(356, [2,4,8], 1)",
    ], df)
    r = ok.collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (9, 8, 11, "1011", 494)


def test_json_drop_keys_join(spark, one_col):
    df = one_col('{"A":1,"b":{"x":2},"c":"s"}')
    from wrangler_spark import execute
    ok, _ = execute(spark, [
        "set-column :dropped json:drop(body, 'a')",
        "set-column :lower json:keysToLower(body)",
        "set-column :joined json:join('[\"p\",\"q\"]', '-')",
        "set-column :parsed json:parse(body)",
        "set-column :bad json:parse('nope{')",
    ], df)
    import json
    r = ok.collect()[0]
    assert json.loads(r["dropped"]) == {"b": {"x": 2}, "c": "s"}
    assert json.loads(r["lower"]) == {"a": 1, "b": {"x": 2}, "c": "s"}
    assert r["joined"] == "p-q"
    assert json.loads(r["parsed"]) == {"A": 1, "b": {"x": 2}, "c": "s"}
    assert r["bad"] is None


def test_ddl_record_ops(spark):
    rec = spark.createDataFrame(
        [((1, "x", (5, "deep")),)],
        "r struct<a:int, b:string, c:struct<k:int, v:string>>",
    )
    assert run1(rec, "ddl:select(r, 'b')") == "x"
    assert run1(rec, "ddl:select(r, 'c.v')") == "deep"
    assert run1(rec, "ddl:hasField(r, 'a')") is True
    assert run1(rec, "ddl:hasField(r, 'zz')") is False
    dropped = run1(rec, "ddl:drop(r, 'b')")
    assert dropped.asDict().keys() == {"a", "c"}
    nested = run1(rec, "ddl:drop(r, 'c.k')")
    assert nested["c"].asDict().keys() == {"v"}
    import json
    j = json.loads(run1(rec, "ddl:toJson(r)"))
    assert j == {"a": 1, "b": "x", "c": {"k": 5, "v": "deep"}}
    assert run1(rec, "ddl:select(ddl:parse(r), 'a')") == 1


def test_guava_strings_ns(df):
    # EL.java:179 registers Guava Strings as strings: — pad never truncates
    assert run1(df, "strings:isNullOrEmpty('')") is True
    assert run1(df, "strings:isNullOrEmpty(s)") is False
    assert run1(df, "strings:emptyToNull('')") is None
    assert run1(df, "strings:nullToEmpty(strings:emptyToNull(''))") == ""
    assert run1(df, "strings:padStart('7', 3, '0')") == "007"
    assert run1(df, "strings:padStart('1234', 3, '0')") == "1234"  # no truncation
    assert run1(df, "strings:padEnd('ab', 4, '.')") == "ab.."
    assert run1(df, "strings:commonPrefix('flower', 'flow')") == "flow"
    assert run1(df, "strings:commonPrefix('abc', 'xyz')") == ""
    assert run1(df, "strings:commonSuffix('testing', 'running')") == "ing"


def test_escape_ns(df):
    # EL.java:180 registers StringEscapeUtils as escape:
    assert run1(df, "escape:escapeHtml4('<a href=\"x\">&</a>')") == "&lt;a href=&quot;x&quot;&gt;&amp;&lt;/a&gt;"
    assert run1(df, "escape:unescapeHtml4(escape:escapeHtml4('<&\"'))") == '<&"'
    assert run1(df, 'escape:escapeXml11("it\'s <b>")') == "it&apos;s &lt;b&gt;"
    assert run1(df, 'escape:unescapeXml(escape:escapeXml11("it\'s <b>"))') == "it's <b>"
    assert run1(df, "escape:escapeCsv('a,b')") == '"a,b"'
    assert run1(df, "escape:escapeCsv('plain')") == "plain"
    assert run1(df, "escape:unescapeCsv(escape:escapeCsv('say \"hi\", ok'))") == 'say "hi", ok'


def test_escape_java_roundtrip(spark):
    df2 = spark.createDataFrame([("line1\nline2\tcol \\ raw",)], "s string")
    out = run1(df2, "escape:unescapeJava(escape:escapeJava(s))")
    assert out == "line1\nline2\tcol \\ raw"
    esc = run1(df2, "escape:escapeJava(s)")
    assert "\\n" in esc and "\\t" in esc and "\\\\" in esc


def test_swapcase_and_arrays(df):
    assert run1(df, "string:swapCase('Hello W0rld')") == "hELLO w0RLD"
    assert run1(df, "arrays:toString(arrays:asList(1, 2, 3))") == "[1, 2, 3]"


def test_date_display_and_era(df):
    # Dates.java MONTH_SHORT/LONG, DAY_OF_WEEK_SHORT/LONG, ERA family
    assert run1(df, "date:MONTH_SHORT(ts)") == "Mar"
    assert run1(df, "date:MONTH_LONG(ts)") == "March"
    assert run1(df, "date:DAY_OF_WEEK_SHORT(ts)") == "Sun"
    assert run1(df, "date:DAY_OF_WEEK_LONG(ts)") == "Sunday"
    assert run1(df, "date:ERA(ts)") == 1
    assert run1(df, "date:ERA_SHORT(ts)") == "AD"
    assert run1(df, "date:ERA_LONG(ts)") == "Anno Domini"
    assert run1(df, "date:SECONDS_TO_MINUTES(3660)") == 61
    assert run1(df, "date:SECONDS_TO_WEEKS(1209600)") == 2


def test_date_is_date_is_time(df):
    assert run1(df, "date:isDate('2020-03-01')") is True
    assert run1(df, "date:isDate('03/01/2020')") is True
    assert run1(df, "date:isDate('not a date')") is False
    assert run1(df, "dq:isTime('22:30:52')") is True
    assert run1(df, "dq:isTime('22:30:52.123')") is True
    assert run1(df, "dq:isTime('9:05 PM')") is True
    assert run1(df, "dq:isTime('25 o clock')") is False


def test_json_type_predicates(df):
    # JsonFunctions.java IsNull/IsObject/IsArray
    assert run1(df, "json:IsNull('null')") is True
    assert run1(df, "json:IsNull('{}')") is False
    assert run1(df, "json:IsObject('{\"a\":1}')") is True
    assert run1(df, "json:IsObject('[1,2]')") is False
    assert run1(df, "json:IsArray('[1,2]')") is True
    assert run1(df, "json:IsArray('{\"a\":1}')") is False
    assert run1(df, "json:IsArray('[broken')") is False
