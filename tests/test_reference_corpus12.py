"""Twelfth reference-mirror corpus wave: the remaining per-directive
edge literals from wrangler-core JUnit classes that had unmirrored
@Test methods — ExtractRegexGroupsTest's real-world regex battery,
MergeTest separators, FillNullOrEmptyTest (incl. the missing-column
ADD behavior), FlattenTest ragged cases, RowRegexFilterTest, and
SetTypeTest's toString/toBytes conversions.

reference: wrangler-core/src/test/java/io/cdap/directives/
transformation/ExtractRegexGroupsTest.java, column/MergeTest.java,
transformation/FillNullOrEmptyTest.java, row/FlattenTest.java,
row/RowRegexFilterTest.java, column/SetTypeTest.java
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrangler_spark import execute


# ------------------------------------------------ ExtractRegexGroupsTest
# testRegex harness: one column, extract-regex-groups, then per row the
# appended values (in match-major, group-minor order) must equal the
# expected outputs. The reference's Row is ragged; the DataFrame pads
# missing matches with null. Java returns null for a non-participating
# optional group where Spark's regexp_extract_all yields '' — both are
# accepted for expected-null slots.


def _extract(spark, regex, cases):
    df = spark.createDataFrame(
        [(i, inp) for i, (inp, _) in enumerate(cases)], "idx int, column string"
    )
    ok, _ = execute(spark, [f"extract-regex-groups :column '{regex}'"], df)
    extra = [c for c in ok.columns if c not in ("idx", "column")]
    # columns come back as column_<match>_<group>; sort numerically
    extra.sort(key=lambda n: tuple(int(x) for x in n.split("_")[1:]))
    rows = {r["idx"]: r for r in ok.collect()}
    for i, (inp, want) in enumerate(cases):
        got = [rows[i][c] for c in extra]
        # strip the null padding beyond this row's own matches
        while got and got[-1] in (None, ""):
            got.pop()
        want_t = list(want)
        while want_t and want_t[-1] is None:
            want_t.pop()
        assert len(got) == len(want_t), f"{inp!r}: {got} != {want}"
        for g, w in zip(got, want_t):
            if w is None:
                assert g in (None, "")
            else:
                assert g == w, f"{inp!r}: {got} != {want}"


DATE_REGEX = (
    r"(?:(?:\d{4}|\d{2})(?:(?:[.,]\s)|[-/.\s])(?:(?:1[0-2])|(?:0?\d)|(?:[a-zA-Z]{3}))"
    r"(?:(?:[.,]\s)|[-/.\s])(?:\d{1,2}))|(?:(?:(?:\d{1,2})(?:(?:[.,]\s)|[-/.\s])"
    r"(?:(?:1[0-2])|(?:0?\d)|(?:[a-zA-Z]{3}))|(?:(?:1[0-2])|(?:0?\d)|(?:[a-zA-Z]{3}))"
    r"(?:(?:[.,]\s)|[-/.\s])(?:\d{1,2}))(?:(?:[.,]\s)|[-/.\s])(?:\d{4}|\d{2}))"
)
TIME_REGEX = (
    r"(?:(?:2[0-3])|(?:[01]?\d))[h:\s][0-5]\d(?::(?:(?:[0-5]\d)|(?:60)))?"
    r"(?:\s[aApP][mM])?(?:Z|(?:[+-](?:1[0-2])|(?:0?\d):[0-5]\d)|(?:\s[[a-zA-Z]\s]+))?"
)


def test_extract_regex_credit_card(spark):
    _extract(spark, r"((?:\d{4}[-\s]?){4})", [
        ("1234567890123456", ["1234567890123456"]),
        ("1234-5678-9012-3456", ["1234-5678-9012-3456"]),
        ("1234 5678 9012 3456", ["1234 5678 9012 3456"]),
        ("1234 5678 9012 3456, 1234-5678-9012-3456",
         ["1234 5678 9012 3456", "1234-5678-9012-3456"]),
        ("123456789012345", []),
        ("1234-5678-9012-345", []),
        ("123-45678-9012-3456", []),
        ("this is not a credit card number", []),
    ])


def test_extract_regex_url(spark):
    _extract(
        spark,
        r"((?:https?://)?[a-zA-Z0-9\.-]+\.[a-zA-Z]{2,6}(?:/[\w\.-]+)*(?:\?[\w\.&=\-]+)?)",
        [
            ("cask.co", ["cask.co"]),
            ("http://cask.co", ["http://cask.co"]),
            ("https://cask.co", ["https://cask.co"]),
            ("https://cask.co/test", ["https://cask.co/test"]),
            ("https://cask.co/test/anotherone", ["https://cask.co/test/anotherone"]),
            ("https://cask.co/test/anotherone?query=1&other=2",
             ["https://cask.co/test/anotherone?query=1&other=2"]),
            ("this is not a website", []),
        ],
    )


def test_extract_regex_ip_address(spark):
    _extract(
        spark,
        r"((?:(?:0|(?:25[0-5])|(?:2[0-4][1-9])|(?:1\d\d)|(?:[1-9]\d?))\.){3}"
        r"(?:(?:0|(?:25[0-5])|(?:2[0-4][1-9])|(?:1\d\d)|(?:[1-9]\d?))))",
        [
            ("192.168.1.1", ["192.168.1.1"]),
            ("0.0.0.0", ["0.0.0.0"]),
            ("255.255.255.0", ["255.255.255.0"]),
            ("12.34.123.0", ["12.34.123.0"]),
            ("255.0.0.0", ["255.0.0.0"]),
        ],
    )


def test_extract_regex_mac_address(spark):
    _extract(spark, r"((?:\p{XDigit}{2}[:-]){5}(?:\p{XDigit}{2}))", [
        ("ab:cd:ef:12:34:56", ["ab:cd:ef:12:34:56"]),
        ("ab-cd-ef-12-34-56", ["ab-cd-ef-12-34-56"]),
        ("abcdef123456", []),
        ("ab:cd:ef:12:34:5g", []),
        ("ab-cd-ef-12-34-5g", []),
    ])


def test_extract_regex_html_tag(spark):
    _extract(
        spark,
        r'<([a-zA-Z]+)(?:\s+[a-zA-Z]+=".*?")*(?:(?:>(.*)</\1>)|(?:\s*/?>))',
        [
            ("<selfclose>", ["selfclose", None]),
            ("<selfclose />", ["selfclose", None]),
            ("<selfclose/>", ["selfclose", None]),
            ("<tag>content</tag>", ["tag", "content"]),
            ('<tag color="orange">content</tag>', ["tag", "content"]),
        ],
    )


def test_extract_regex_link_tag(spark):
    _extract(
        spark,
        r'<[aA](?:\s+[a-zA-Z]+=".*?")*\s+[hH][rR][eE][fF]="(.*?)"'
        r'(?:\s+[a-zA-Z]+=".*?")*>(.*)</[aA]>',
        [
            ('<a href="cask.co">Cask Data</a>', ["cask.co", "Cask Data"]),
            ('<a target="_self" href="http://cask.co/">Cask Data</a>',
             ["http://cask.co/", "Cask Data"]),
            ('<a  target="_self"    href="http://cask.co/">Cask Data</a>',
             ["http://cask.co/", "Cask Data"]),
            ('<a  target="_self"    href="http://cask.co/" type="text">Cask Data</a>',
             ["http://cask.co/", "Cask Data"]),
        ],
    )


def test_extract_regex_date(spark):
    _extract(spark, f"({DATE_REGEX})", [
        ("2012 Dec 21", ["2012 Dec 21"]),
        ("12/25/2017", ["12/25/2017"]),
        ("Dec/25/2017", ["Dec/25/2017"]),
        ("Dec 25, 2017", ["Dec 25, 2017"]),
        ("1997-10-16", ["1997-10-16"]),
    ])


def test_extract_regex_time(spark):
    _extract(spark, f"({TIME_REGEX})", [
        ("23:59", ["23:59"]),
        ("12:59 PM", ["12:59 PM"]),
        ("12:59:59 AM", ["12:59:59 AM"]),
        ("12:59:60 PM", ["12:59:60 PM"]),
        ("12h59", ["12h59"]),
        ("12:59:04Z", ["12:59:04Z"]),
        ("02:59:04Z", ["02:59:04Z"]),
        ("2:59:04Z", ["2:59:04Z"]),
        ("2:59:04 PST", ["2:59:04 PST"]),
        ("2:59:04 Pacific Standard Time", ["2:59:04 Pacific Standard Time"]),
    ])


def test_extract_regex_datetime(spark):
    _extract(spark, f"((?:{DATE_REGEX})[T\\s](?:{TIME_REGEX}))", [
        ("Dec 1, 2015 23:59", ["Dec 1, 2015 23:59"]),
        ("JUL/05/2010 12:59 PM", ["JUL/05/2010 12:59 PM"]),
        ("10/16/97 12:59:59 AM", ["10/16/97 12:59:59 AM"]),
        ("10-10-10 12:59:60 PM", ["10-10-10 12:59:60 PM"]),
        ("Dec 31, 1997 12h59", ["Dec 31, 1997 12h59"]),
        ("2018-03-04T12:59:04Z", ["2018-03-04T12:59:04Z"]),
        ("2016-01-10T02:59:04Z", ["2016-01-10T02:59:04Z"]),
        ("2016-01-10 2:59:04Z", ["2016-01-10 2:59:04Z"]),
        ("2016-01-10 2:59:04 PST", ["2016-01-10 2:59:04 PST"]),
        ("2016-01-10 2:59:04 Pacific Standard Time",
         ["2016-01-10 2:59:04 Pacific Standard Time"]),
    ])


def test_extract_regex_ups_tracking(spark):
    _extract(
        spark,
        r"(1Z\s?[0-9a-zA-Z]{3}\s?[0-9a-zA-Z]{3}\s?[0-9a-zA-Z]{2}\s?\d{4}\s?\d{4})",
        [
            ("1Z204E380338943508", ["1Z204E380338943508"]),
            ("1Z51062E6893884735", ["1Z51062E6893884735"]),
            ("1ZXF38300382722839", ["1ZXF38300382722839"]),
            ("1ZT675T4YW92275898", ["1ZT675T4YW92275898"]),
            ("1ZW6897XYW00098770", ["1ZW6897XYW00098770"]),
            ("1Z 999 AA1 01 2345 6784", ["1Z 999 AA1 01 2345 6784"]),
        ],
    )


def test_extract_regex_isbn(spark):
    _extract(spark, r"((?:97[89]-?)?(?:\d-?){9}[\dxX])", [
        ("ISBN-13: 978-1-56619-909-4", ["978-1-56619-909-4"]),
        ("ISBN-10: 1-56619-909-3", ["1-56619-909-3"]),
        ("ISBN: 9781566199094", ["9781566199094"]),
        ("ISBN-10: 1566199093", ["1566199093"]),
        ("ISBN: 978156619909x", ["978156619909x"]),
        ("ISBN-10: 156619909X", ["156619909X"]),
        ("ISBN 817525766-0", ["817525766-0"]),
        ("ISBN 0-936385-405", ["0-936385-405"]),
    ])


# ------------------------------------------------------------- MergeTest


def test_merge_basic_and_order(spark):
    # testBasicMergeFunctionality: merge is order-sensitive
    df = spark.createDataFrame([("Root", "Joltie")], "A string, B string")
    ok, _ = execute(spark, ["merge A B C ','", "merge B A D ' '"], df)
    r = ok.first()
    assert r["C"] == "Root,Joltie"
    assert r["D"] == "Joltie Root"


def test_merge_utf8_escape_separator(spark):
    # testWithUTF8Separator: '\u000A' unescapes to a real newline
    df = spark.createDataFrame([("Root", "Joltie")], "A string, B string")
    ok, _ = execute(spark, [r"merge A B C '\u000A'"], df)
    assert ok.first()["C"] == "Root\nJoltie"


def test_merge_multichar_separator(spark):
    # testWithMultipleCharactersAsSeparator
    df = spark.createDataFrame([("Root", "Joltie")], "A string, B string")
    ok, _ = execute(spark, ["merge A B C '---'"], df)
    assert ok.first()["C"] == "Root---Joltie"


# --------------------------------------------------- FillNullOrEmptyTest


def test_fill_null_missing_column_is_added(spark):
    # testColumnNotPresent: a missing column is ADDED with the value
    # (FillNullOrEmpty.java:77-80), not an error
    df = spark.createDataFrame([("has value",)], "value string")
    ok, _ = execute(spark, ["fill-null-or-empty nope N/A"], df)
    r = ok.first()
    assert r["value"] == "has value" and r["nope"] == "N/A"


def test_fill_null_basic_and_empty_and_mixed(spark):
    # testBasicNullCase / testEmptyStringCase / testMixedCases
    df = spark.createDataFrame(
        [(0, "has value"), (1, None), (2, "")], "i int, value string"
    )
    ok, _ = execute(spark, ["fill-null-or-empty value N/A"], df)
    got = {r["i"]: r["value"] for r in ok.collect()}
    assert got == {0: "has value", 1: "N/A", 2: "N/A"}


def test_fill_null_quoted_value_with_space(spark):
    # testSpace: quoted fill value keeps its inner space
    df = spark.createDataFrame([(None,), ("Should be fine",)], "value string")
    ok, _ = execute(spark, ["fill-null-or-empty :value 'Not Available'"], df)
    assert sorted(r["value"] for r in ok.collect()) == [
        "Not Available", "Should be fine"
    ]


# ----------------------------------------------------------- FlattenTest
# Ragged reference rows become uniform rows with nulls; the pinned
# invariant is the OUTPUT ROW COUNT (zip-explode with null-pad).


def _flatten_rows(spark, data):
    df = spark.createDataFrame(
        data, "col1 string, col2 array<string>, col3 array<string>"
    )
    ok, _ = execute(spark, ["flatten col1,col2,col3"], df)
    return ok.collect()


def test_flatten_case1_and_2_counts(spark):
    # testBasicCase1/2: scalar col3 variant — here col3 rides along as a
    # 1-element array per the reference's scalar semantics; counts pin
    # the zip-explode shape: singles stay single, arrays explode to
    # max(len) per row
    rows = _flatten_rows(spark, [
        ("A", None, None),
        ("B", None, None),
        (None, ["x1", "y1", "z1"], ["10"]),
        (None, ["x2", "y2"], ["11"]),
        (None, ["x1", "y1", "z1"], ["10"]),
        (None, ["x2", "y2"], ["11"]),
    ])
    # testBasicCase2 layout: 2 + 3 + 2 + 3 + 2 = 12
    assert len(rows) == 12


def test_flatten_case4_uneven_arrays_null_pad(spark):
    # testBasicCase4: col2 and col3 arrays of different lengths in the
    # same row zip with null padding; 2 + 3 + 3 + 3 + 3 = 14
    rows = _flatten_rows(spark, [
        ("A", None, None),
        ("B", None, None),
        (None, ["x1", "y1", "z1"], ["a1", "b1"]),
        (None, ["x2", "y2"], ["a2", "b2", "c2"]),
        (None, ["x1", "y1", "z1"], ["a1", "b1"]),
        (None, ["x2", "y2"], ["a2", "b2", "c2"]),
    ])
    assert len(rows) == 14
    padded = [r for r in rows if r["col2"] == "z1"]
    assert padded and all(r["col3"] is None for r in padded)
    padded3 = [r for r in rows if r["col3"] == "c2"]
    assert padded3 and all(r["col2"] is None for r in padded3)


# ----------------------------------------------------- RowRegexFilterTest


_PEOPLE = [
    "1098,Root,Joltie,01/26/1956,root@joltie.io,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",
    "1091,Root,Joltie,01/26/1956,root1@joltie.io,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",
    "1092,Root,Joltie,01/26/1956,root@mars.com,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",
    "1093,Root,Joltie,01/26/1956,root@foo.com,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",
    "1094,Super,Joltie,01/26/1956,windy@joltie.io,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",
]


def test_row_filter_regex_pipeline(spark):
    # testRowFilterRegex: the full v1 filter chain leaves exactly 1 row
    df = spark.createDataFrame([(s,) for s in _PEOPLE], "__col string")
    ok, _ = execute(spark, [
        "parse-as-csv __col ,",
        "drop __col",
        "set columns id,first,last,dob,email,age,hrlywage,address,city,state,country,zip",
        "filter-by-regex if-matched :email 'NULL'",
        "filter-by-regex if-matched :email '.*@joltie.io'",
        "filter-row-if-true id > 1092",
        "filter-rows-on regex-match last .*(?i)harris.*",
    ], df)
    rows = ok.collect()
    assert len(rows) == 1 and rows[0]["id"] == "1092"


def test_row_filter_star_condition(spark):
    # testStarCondition: if-matched drops every email containing 'root'
    df = spark.createDataFrame([(s,) for s in _PEOPLE], "__col string")
    ok, _ = execute(spark, [
        "parse-as-csv __col ,",
        "drop __col",
        "set columns id,first,last,dob,email,age,hrlywage,address,city,state,country,zip",
        "filter-by-regex if-matched :email '.*root.*'",
    ], df)
    rows = ok.collect()
    assert len(rows) == 1 and rows[0]["email"] == "windy@joltie.io"


def test_row_filter_on_numeric_and_string_values(spark):
    # testFilterOnNumericValues: condition-false keeps rows where the
    # condition holds; regex-not-match keeps matching rows
    data = [
        "1,san jose,1001,1,11,22.1,55.1",
        "2,palo alto,2002,2,22,22.2,55.2",
        "3,mountain view,3,3003,33,22.3,55.3",
        "4,saratoga,4004,4,44,22.4,55.4",
        "5,los altos,5005,5,55,22.5,55.5",
    ]
    base = [
        "parse-as-csv __col ,",
        "drop __col",
        "set columns id,string,int,short,long,float,double",
        "set-type :int integer",
    ]
    df = spark.createDataFrame([(s,) for s in data], "__col string")
    ok, _ = execute(spark, base + ["filter-rows-on condition-false int == 5005"], df)
    rows = ok.collect()
    assert len(rows) == 1 and rows[0]["int"] == 5005
    ok, _ = execute(spark, base + ["filter-rows-on regex-not-match string .*sar.*"], df)
    rows = ok.collect()
    assert len(rows) == 1 and rows[0]["string"] == "saratoga"


def test_row_filter_keep_drops_nulls(spark):
    # testFilterKeepDoesntKeepNullValues: if-matched drops the matching
    # row; rows whose column is null/empty survive
    df = spark.createDataFrame([
        ('1, "Archil", , "SHAH", 19, "2017-06-02"',),
        ('2, "Sameet", "andpotatoes", "Sapra", 19, "2017-06-02"',),
        ('3, "Bob", , "Sagett", 101, "1970-01-01"',),
    ], "body string")
    ok, _ = execute(spark, [
        "parse-as-csv :body ',' false",
        "filter-by-regex if-matched :body_3 '.*pot.*'",
    ], df)
    assert ok.count() == 2


# -------------------------------------------------------------- SetTypeTest


def test_set_type_to_string_conversions(spark):
    # testToString: every source type renders exactly as Java's
    # String.valueOf does — integral types without a decimal point,
    # float/double with one, bytes as UTF-8
    df = spark.createDataFrame(
        [("10000", 10000, 10000.0, 10000, 10000, float(10000),
          bytearray(b"10000"))],
        "str_col string, int_col int, double_col double, short_col int, "
        "long_col long, float_col float, bytes_col binary",
    )
    ok, _ = execute(spark, [
        "set-type str_col string", "set-type int_col String",
        "set-type double_col STRING", "set-type short_col string",
        "set-type long_col String", "set-type float_col STRING",
        "set-type bytes_col string",
    ], df)
    r = ok.first()
    assert r["str_col"] == "10000"
    assert r["int_col"] == "10000"
    assert r["short_col"] == "10000"
    assert r["long_col"] == "10000"
    assert r["double_col"] == "10000.0"
    assert r["float_col"] == "10000.0"
    assert r["bytes_col"] == "10000"


def test_set_type_to_bytes_conversions(spark):
    # testToBytes: Bytes.toBytes big-endian fixtures — int {0,0,39,16},
    # long {0,0,0,0,0,0,39,16}, float IEEE bits {70,28,64,0}, double
    # bits {64,-61,-120,0,0,0,0,0}, string/binary as UTF-8/pass-through,
    # BigDecimal as 4-byte scale + minimal unscaled {0,0,0,0,39,16}
    from decimal import Decimal

    df = spark.createDataFrame(
        [("10000", 10000, 10000.0, 10000, float(10000),
          bytearray(b"\x40\xc3\x88\x00\x00\x00\x00\x00"), Decimal(10000))],
        "str_col string, int_col int, double_col double, long_col long, "
        "float_col float, bytes_col binary, decimal_col decimal(10,0)",
    )
    ok, _ = execute(spark, [
        "set-type str_col bytes", "set-type int_col Bytes",
        "set-type double_col BYTES", "set-type long_col Bytes",
        "set-type float_col BYTES", "set-type bytes_col bytes",
        "set-type decimal_col bytes",
    ], df)
    r = ok.first()
    assert bytes(r["str_col"]) == b"10000"
    assert bytes(r["int_col"]) == bytes([0, 0, 39, 16])
    assert bytes(r["long_col"]) == bytes([0, 0, 0, 0, 0, 0, 39, 16])
    assert bytes(r["float_col"]) == bytes([70, 28, 64, 0])
    assert bytes(r["double_col"]) == b"\x40\xc3\x88\x00\x00\x00\x00\x00"
    assert bytes(r["bytes_col"]) == b"\x40\xc3\x88\x00\x00\x00\x00\x00"
    assert bytes(r["decimal_col"]) == bytes([0, 0, 0, 0, 39, 16])


def test_set_type_to_bytes_negative_values(spark):
    # two's complement: -1 as int -> {255,255,255,255}; -2 short -> {255,254}
    df = spark.createDataFrame([(-1, -2)], "a int, b int")
    ok, _ = execute(spark, [
        "set-type b short", "set-type a bytes", "set-type b bytes",
    ], df)
    r = ok.first()
    assert bytes(r["a"]) == b"\xff\xff\xff\xff"
    assert bytes(r["b"]) == b"\xff\xfe"


# ----------------------------------------------------- SendToErrorTest


def _calories(spark):
    return spark.createDataFrame([(10,), (0,), (-10,)], "field_calories_cnt int")


def test_send_to_error_integer_field(spark):
    # testIntegerField: 1 error, 2 pass
    ok, err = execute(spark, ["send-to-error field_calories_cnt < 0"], _calories(spark))
    assert (ok.count(), err.count()) == (2, 1)


def test_send_to_error_missing_variables(spark):
    # testMissingVariables: a condition referencing a nonexistent column
    # sends NOTHING to error — all rows pass through
    ok, err = execute(
        spark,
        ["send-to-error field_calories_cnt < 0 && field_not_exist == 'test'"],
        _calories(spark),
    )
    assert (ok.count(), err.count()) == (3, 0)


def test_send_to_error_with_message_metric_and_both(spark):
    # testSendToErrorWithMessage / WithMetric / WithMetricAndMessage:
    # the optional [metric] ['message'] args parse and the exact
    # reference message format lands on the error channel
    for directive in [
        "send-to-error exp:{field_calories_cnt < 0} 'Test Message';",
        "send-to-error exp:{field_calories_cnt < 0} test 'Test Message';",
        "send-to-error exp:{field_calories_cnt < 0} test;",
    ]:
        ok, err = execute(spark, [directive], _calories(spark))
        assert (ok.count(), err.count()) == (2, 1)
        if "'Test Message'" in directive:
            assert err.first()["message"] == (
                "Test Message (ecode: 1, directive: send-to-error)"
            )
