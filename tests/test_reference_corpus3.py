"""Third wave of reference JUnit example mirrors (test-parity breadth,
VERDICT r3 "what's missing" #3). Each test cites the reference test
class it re-expresses; inputs and expected values are the JUnit
sources' literals (behavioral spec, not code).

Covered here:
- transformation/SwapTest.java (value+type swap, missing column)
- column/SplitToColumnsTest.java (newline split → body_1/body_2)
- transformation/GenerateUUIDTest.java (column added, others untouched)
- lookup/CatalogLookupTest.java (output naming, miss → null, width)
- transformation/MessageHashTest.java (SHA-384 hex/binary, bad algo)
- datetime/DateTimeToTimestampTest.java (zone conversion, bad zone)
- datetime/TimestampToDateTimeTest.java (round trip)
- datetime/CurrentDateTimeTest.java (column added, bad zone)
- transformation/ParseTimestampTest.java (unit forms, null, bad unit)
- parser/ParseDateTimeTest.java (DateTimeFormatter patterns incl.
  optional offset/zone sections, invalid format, invalid data → error)
- row/SendToErrorAndContinueTest.java (chained continue directives)
"""

import datetime as dt

import pytest

from wrangler_spark import execute
from wrangler_spark.errors import RecipeError


def _rows(spark, directives, vals, schema="body string"):
    df = spark.createDataFrame([(v,) for v in vals], schema)
    ok, err = execute(
        spark, [directives] if isinstance(directives, str) else directives, df
    )
    return ok, err


# ---------------------------------------------------------- SwapTest


def test_swap_values_and_types(spark):
    """SwapTest.testSwap + testGetOutputSchemaForSwappedColumns: values
    AND dtypes move; column order stays."""
    df = spark.createDataFrame([(1, "sample string")], "a int, b string")
    ok, _ = execute(spark, ["swap a b"], df)
    row = ok.collect()[0]
    assert row["b"] == 1 and row["a"] == "sample string"
    dtypes = dict(ok.dtypes)
    assert dtypes["a"] == "string" and dtypes["b"] == "int"
    assert ok.columns == ["a", "b"]


def test_swap_field_not_found(spark):
    """SwapTest.testSwapFeildNotFound: RecipeException when a named
    column is absent."""
    df = spark.createDataFrame([(1, "x")], "a int, c string")
    with pytest.raises(RecipeError):
        execute(spark, ["swap a b"], df)


# ------------------------------------------------- SplitToColumnsTest


def test_split_to_columns_newline(spark):
    """SplitToColumnsTest.testSplitToColumns: regex \\n produces
    body_1/body_2, one row stays one row."""
    ok, _ = _rows(spark, r"split-to-columns body \n", ["AABBCDE\nEEFFFF"])
    assert ok.count() == 1
    row = ok.collect()[0]
    assert row["body_1"] == "AABBCDE"
    assert row["body_2"] == "EEFFFF"


# -------------------------------------------------- GenerateUUIDTest


def test_generate_uuid_adds_column(spark):
    """GenerateUUIDTest.testUUIDGeneration: one new column per row,
    source column untouched, width 2."""
    ok, _ = _rows(
        spark, "generate-uuid uuid", ["abc", "xyz", "Should be fine"], "value string"
    )
    rows = ok.collect()
    assert len(rows) == 3
    assert len(ok.columns) == 2 and "uuid" in ok.columns
    assert sorted(r["value"] for r in rows) == ["Should be fine", "abc", "xyz"]
    assert all(r["uuid"] for r in rows)
    assert len({r["uuid"] for r in rows}) == 3  # v4 per row, not per plan


# -------------------------------------------------- CatalogLookupTest


def test_catalog_lookup_naming_and_misses(spark):
    """CatalogLookupTest.testICDCodeLookup: output column is
    <col>_<catalog with - → _>_description, invalid codes and unknown
    catalogs yield null but keep the row; width grows by one per
    lookup. (The ICD code lists themselves are binary resources absent
    from the reference checkout, so the catalog is host-registered.)"""
    df = spark.createDataFrame(
        [("A0100",), ("Z9989",), ("ABC",)], "code string"
    )
    cat = spark.createDataFrame(
        [("A0100", "Typhoid fever"), ("Z9989", "Dependence on machines")],
        "icd string, descr string",
    )
    ok, _ = execute(
        spark,
        ["catalog-lookup icd-10-2016 code", "catalog-lookup ICD-10-2017 code"],
        df,
        lookups={"icd-10-2016": cat, "ICD-10-2017": cat},
    )
    assert ok.columns == [
        "code", "code_icd_10_2016_description", "code_icd_10_2017_description",
    ]
    got = {r["code"]: r["code_icd_10_2016_description"] for r in ok.collect()}
    assert got["A0100"] == "Typhoid fever"
    assert got["ABC"] is None
    assert ok.count() == 3


# ---------------------------------------------------- MessageHashTest


def test_hash_sha384_hex_and_binary(spark):
    """MessageHashTest.testHashBasic: SHA-384 with encode=true is a
    96-hex-char string in place; encode=false is the 48 raw bytes."""
    df = spark.createDataFrame(
        [("secret message.", "This is a very secret message and a digest will be created.")],
        "message1 string, message2 string",
    )
    ok, _ = execute(
        spark, ["hash message1 SHA-384 true", "hash message2 SHA-384 false"], df
    )
    row = ok.collect()[0]
    import hashlib

    assert row["message1"] == hashlib.sha384(b"secret message.").hexdigest()
    assert bytes(row["message2"]) == hashlib.sha384(
        b"This is a very secret message and a digest will be created."
    ).digest()


def test_hash_bad_algorithm(spark):
    """MessageHashTest.testBadAlgorithm: SHA-385 fails at compile."""
    df = spark.createDataFrame([("x",)], "message1 string")
    with pytest.raises(RecipeError):
        execute(spark, ["hash message1 SHA-385 true"], df)


# ------------------------------------------- DateTimeToTimestampTest


def test_datetime_to_timestamp_zones(spark):
    """DateTimeToTimestampTest.testZones: the SAME local datetime
    2000-08-22T20:36:45 interpreted in UTC / Australia/Sydney (+10) /
    America/Los_Angeles (PDT −7) lands on three different instants."""
    ldt = dt.datetime(2000, 8, 22, 20, 36, 45)
    df = spark.createDataFrame(
        [(ldt, ldt, ldt)],
        "col1 timestamp_ntz, col2 timestamp_ntz, col3 timestamp_ntz",
    )
    ok, _ = execute(
        spark,
        [
            'datetime-to-timestamp col1 "UTC"',
            'datetime-to-timestamp col2 "Australia/Sydney"',
            'datetime-to-timestamp col3 "America/Los_Angeles"',
        ],
        df,
    )
    row = ok.collect()[0]
    # session tz is UTC, so the rendered datetime IS the UTC instant
    assert row["col1"] == dt.datetime(2000, 8, 22, 20, 36, 45)
    assert row["col2"] == dt.datetime(2000, 8, 22, 10, 36, 45)
    assert row["col3"] == dt.datetime(2000, 8, 23, 3, 36, 45)


def test_datetime_to_timestamp_invalid_zone(spark):
    """DateTimeToTimestampTest.testInvalidZone: 'abcd' fails at
    compile (ZoneId.of throws in initialize)."""
    df = spark.createDataFrame([(dt.datetime(2020, 1, 1),)], "col1 timestamp_ntz")
    with pytest.raises(RecipeError):
        execute(spark, ["datetime-to-timestamp col1 'abcd'"], df)


# ------------------------------------------- TimestampToDateTimeTest


def test_timestamp_to_datetime_round_trip(spark):
    """TimestampToDateTimeTest.testConversion: instant → local fields
    (session zone UTC), dtype becomes timestamp_ntz."""
    ts = dt.datetime(2018, 9, 7, 14, 57, 51)
    df = spark.createDataFrame([(ts,)], "col1 timestamp")
    ok, _ = execute(spark, ["timestamp-to-datetime col1"], df)
    assert dict(ok.dtypes)["col1"] == "timestamp_ntz"
    assert ok.collect()[0]["col1"] == ts


# ----------------------------------------------- CurrentDateTimeTest


def test_current_datetime_adds_column(spark):
    """CurrentDateTimeTest.testAddColumn: the column is created even
    when absent from the input, as a local datetime."""
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    ok, _ = execute(spark, ["current-datetime col1"], df)
    assert dict(ok.dtypes)["col1"] == "timestamp_ntz"
    vals = [r["col1"] for r in ok.collect()]
    assert all(v is not None for v in vals)
    # wall-clock sanity: within a day of the driver's clock
    now = dt.datetime.utcnow()
    assert all(abs((v - now).total_seconds()) < 86400 for v in vals)


def test_current_datetime_invalid_zone(spark):
    """CurrentDateTimeTest.testInvalidZone: 'abcd' fails at compile."""
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(RecipeError):
        execute(spark, ["current-datetime col1 'abcd'"], df)


# ------------------------------------------------ ParseTimestampTest


def test_parse_timestamp_units(spark):
    """ParseTimestampTest.testParseTimestamp: default is milliseconds;
    'seconds'/'milliseconds'/'microseconds' forms; string inputs
    coerce; null stays null. 1536332271894 ms =
    2018-09-07T14:57:51.894Z."""
    df = spark.createDataFrame(
        [(1536332271894, None, "1536332271894", "1536332271", "1536332271894",
          "1536332271894123")],
        "date1 long, date2 string, date3 string, date4 string, date5 string, date6 string",
    )
    ok, _ = execute(
        spark,
        [
            "parse-timestamp date1",
            "parse-timestamp date2",
            "parse-timestamp date3",
            "parse-timestamp date4 'seconds'",
            "parse-timestamp date5 'milliseconds'",
            "parse-timestamp date6 'microseconds'",
        ],
        df,
    )
    row = ok.collect()[0]
    base = dt.datetime(2018, 9, 7, 14, 57, 51, 894000)
    assert row["date1"] == base
    assert row["date2"] is None
    assert row["date3"] == base
    assert row["date4"] == base.replace(microsecond=0)
    assert row["date5"] == base
    assert row["date6"] == base + dt.timedelta(microseconds=123)


def test_parse_timestamp_bad_unit(spark):
    """ParseTimestampTest.testInvalidTimestamp: 'nanoseconds' is not a
    supported unit — compile-time failure."""
    df = spark.createDataFrame([(1536332271894,)], "date1 long")
    with pytest.raises(RecipeError):
        execute(spark, ["parse-timestamp date1 'nanoseconds'"], df)


# ------------------------------------------------- ParseDateTimeTest


def test_parse_as_datetime_formats(spark):
    """ParseDateTimeTest.testDateTimeFormats: all five pattern forms,
    including optional offset sections [xxx] and the bracketed zone-id
    suffix '['VV']' — the local fields are what survive (the directive
    produces a LocalDateTime)."""
    cases = [
        ("MM/dd/yyyy HH:mm", "03/30/2010 01:05", dt.datetime(2010, 3, 30, 1, 5)),
        ("yyyy-MM-dd'T'HH:mm:ss", "2020-01-28T04:50:12",
         dt.datetime(2020, 1, 28, 4, 50, 12)),
        ("yyyy-MM-dd'T'HH:mm:ss[xxx]", "2011-12-03T10:15:30+01:00",
         dt.datetime(2011, 12, 3, 10, 15, 30)),
        ("yyyy-MM-dd'T'HH:mm:ss[xxx]'['VV']'",
         "2011-12-03T10:15:30+01:00[Europe/Paris]",
         dt.datetime(2011, 12, 3, 10, 15, 30)),
        ("yyyyMMdd h:mm a", "19901212 10:12 AM", dt.datetime(1990, 12, 12, 10, 12)),
    ]
    for fmt, value, want in cases:
        ok, _ = _rows(spark, f'parse-as-datetime body "{fmt}"', [value])
        assert ok.collect()[0]["body"] == want, (fmt, value)


def test_parse_as_datetime_multiple_rows(spark):
    """ParseDateTimeTest.testDateTimeMultipleRows."""
    ok, _ = _rows(
        spark, "parse-as-datetime body 'MM/dd/yyyy HH:mm'",
        ["12/10/2016 07:45", "02/01/1990 12:01"],
    )
    got = sorted(r["body"] for r in ok.collect())
    assert got == [dt.datetime(1990, 2, 1, 12, 1), dt.datetime(2016, 12, 10, 7, 45)]


def test_parse_as_datetime_invalid_format(spark):
    """ParseDateTimeTest.testInvalidFormat: pattern 'abcd' has an
    unknown pattern letter — compile-time failure."""
    df = spark.createDataFrame([("12/10/2016 07:45",)], "col1 string")
    with pytest.raises(RecipeError):
        execute(spark, ["parse-as-datetime col1 'abcd'"], df)


def test_parse_as_datetime_invalid_data_errors_row(spark):
    """ParseDateTimeTest.testInvalidData: a value that doesn't match
    the pattern routes the row to the error channel — results empty."""
    ok, err = _rows(
        spark, "parse-as-datetime body 'MM/dd/yyyy HH:mm'", ["12/10/2016"]
    )
    assert ok.count() == 0
    assert err is not None and err.count() == 1


def test_parse_as_simple_date_invalid_data_errors_row(spark):
    """ParseSimpleDate.java:105-111: same ErrorRowException routing for
    the SimpleDateFormat parser — bad rows leave, good rows parse."""
    ok, err = _rows(
        spark, "parse-as-simple-date body 'MM/dd/yyyy'",
        ["12/10/2016", "not a date"],
    )
    assert ok.count() == 1
    assert ok.collect()[0]["body"] == dt.datetime(2016, 12, 10)
    assert err is not None and err.count() == 1


# --------------------------------------- SendToErrorAndContinueTest


def test_error_and_continue_chain(spark):
    """SendToErrorAndContinueTest.testErrorConditionTrueAndContinue:
    three chained continue directives; every data row matches one of
    them → results empty, errors == 2."""
    ok, err = _rows(
        spark,
        [
            "parse-as-csv body , false",
            "drop body",
            "set-headers :A,:B,:C,:D",
            "send-to-error-and-continue exp:{C == '1'}",
            "send-to-error-and-continue exp:{C == '2'}",
            "send-to-error-and-continue exp:{D == '3.0'}",
        ],
        ["X,Y,1,2.0", "U,V,2,3.0"],
    )
    assert ok.count() == 0
    assert err.count() == 2


def test_error_and_continue_width_filter(spark):
    """SendToErrorAndContinueTest.testErrorAndContinueNoofColumns:
    rows with fewer than 4 parsed columns route to error; the C/D
    values of survivors and errors match the JUnit literals."""
    ok, err = _rows(
        spark,
        [
            "parse-as-csv body , true",
            "drop body",
            "send-to-error-and-continue exp:{ this.width() < 4} "
            "'filtering records that dont have 4 columns'",
        ],
        ["A,B,C,D", "X,Y,1", "I,J,3", "U,V,2,3.0"],
    )
    rows = ok.collect()
    assert len(rows) == 1
    assert rows[0]["C"] == "2"
    assert err.count() == 2
