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
    assert run1(df, "datetime:WeekdayFromDate(d)") == 7  # 2020-03-01 = Sunday


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


def test_time_as_seconds(df):
    assert run1(df, "datetime:TimeFromComponents(1, 30, 15)") == 5415
    assert run1(df, "datetime:TimeFromMidnightSeconds(5415)") == 5415


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
        "set-column :a logical:SetBit(8, 0, 1)",
        "set-column :b logical:SetBit(9, 0, 0)",
        "set-column :c logical:BitCompress('1011')",
        "set-column :d logical:BitExpand(11)",
    ], df)
    r = ok.collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (9, 8, 11, "1011")


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
