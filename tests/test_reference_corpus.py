"""Mirrors of the reference's exotic-input JUnit examples (VERDICT r3
"what's missing" #3: test-parity breadth). Each test cites the
reference test it re-expresses; inputs and expected values are copied
from the JUnit sources' literals (behavioral spec, not code).

Covered here:
- transformation/MaskNumberTest.java (all 7 cases: SSN variants,
  complex mixed masks, int/long/float typed inputs, literal pass-through)
- parser/CsvParserTest.java (quoted commas, messy headers, trailing
  commas, v1 `set columns` / `filter-rows-on`)
- parser/JsParserTest.java (array-of-objects → rows, array-of-numbers,
  trailing whitespace, depth-controlled flattening)
- transformation/ExtractRegexGroupsTest.java (all-matches extraction,
  email/SSN/phone tables)
- column/SetTypeTest.java (I64/I32 bug-compat aliases, `> 0` boolean
  semantics, big-endian byte[] decoding incl. IEEE bit patterns)
"""

import datetime as dt

from pyspark.sql import functions as F

from wrangler_spark import execute


def _vals(spark, directive, vals, schema="body string"):
    df = spark.createDataFrame([(v,) for v in vals], schema)
    ok, _ = execute(spark, [directive] if isinstance(directive, str) else directive, df)
    return ok


# ------------------------------------------------------- MaskNumberTest

def test_mask_ssn_exact_and_extra_pattern(spark):
    """MaskNumberTest.testSSNWithDashesExact / testSSNWithDashesExtra:
    a mask longer than the value just stops producing output."""
    ok = _vals(spark, "mask-number body xxx-xx-####", ["000-00-1234"])
    assert ok.first()["body"] == "xxx-xx-1234"
    ok = _vals(spark, "mask-number body xxx-xx-#####", ["000-00-1234"])
    assert ok.first()["body"] == "xxx-xx-1234"


def test_mask_complex_mixed_pattern(spark):
    """MaskNumberTest.testComplexMasking: x masks, # reveals, other
    chars (dashes, digits like the literal 9) pass through literally."""
    ok = _vals(spark, "mask-number body xxx-##-xx-##-XXXX-9", ["0000012349898"])
    assert ok.first()["body"] == "xxx-00-xx-34-xxxx-9"


def test_mask_integer_typed_column(spark):
    """MaskNumberTest.testIntegerTypeMasking: numeric (non-string)
    columns mask their decimal rendering; short values exhaust."""
    ok = _vals(spark, "mask-number body xx-xx-#", [12345, 123, 123456], "body int")
    got = [r["body"] for r in ok.collect()]
    assert got == ["xx-xx-5", "xx-xx-", "xx-xx-5"]


def test_mask_literal_run_and_long_and_float(spark):
    """MaskNumberTest.testWithOtherCharacters / testWithLong /
    testWithFloat."""
    ok = _vals(spark, "mask-number body xx-xx-TESTING-#", [12345], "body int")
    assert ok.first()["body"] == "xx-xx-TESTING-5"
    ok = _vals(spark, "mask-number body xx-xx-#", [12345], "body long")
    assert ok.first()["body"] == "xx-xx-5"
    ok = _vals(spark, "mask-number body x#.x#", [12.34], "body double")
    assert ok.first()["body"] == "x2.x4"


# -------------------------------------------------------- CsvParserTest

def test_csv_quoted_commas_and_nested_reparse(spark):
    """CsvParserTest.testParseCSV: quoted fields containing commas
    survive, and a parsed column re-parses with a second delimiter.
    Uses the reference's bare v1 syntax (`body , false`)."""
    df = spark.createDataFrame([
        ("07/29/2013,Debt collection,\"Other (i.e. phone, health club, etc.)\","
         "Cont'd attempts collect debt not owed,Debt is not mine,,,\"NRA Group, LLC\","
         "VA,20147,,N/A,Web,08/07/2013,Closed with non-monetary relief,Yes,No,467801",),
        ("07/29/2013,Mortgage,Conventional fixed mortgage,"
         "\"Loan servicing, payments, escrow account\",,,,Franklin Credit Management,"
         "CT,06106,,N/A,Web,07/30/2013,Closed with explanation,Yes,No,475823",),
    ], "body string")
    ok, _ = execute(spark, [
        "parse-as-csv body , false", "drop body", "rename body_1 date",
        "parse-as-csv date / false", "rename date_1 month",
        "rename date_2 day", "rename date_3 year",
    ], df)
    rows = ok.orderBy("body_18").collect()
    assert len(rows) == 2
    assert rows[0]["date"] == "07/29/2013"
    assert (rows[0]["month"], rows[0]["day"], rows[0]["year"]) == ("07", "29", "2013")
    assert rows[0]["body_3"] == "Other (i.e. phone, health club, etc.)"
    assert rows[0]["body_8"] == "NRA Group, LLC"


def test_csv_header_sanitization_consumes_header_row(spark):
    """CsvParserTest.testHeaders: header cells are trimmed, whitespace
    runs collapse to '_' (CsvParser.java:150), and the header record
    itself is consumed."""
    df = spark.createDataFrame(
        [("first name, last  \t  name",), ("alice,zed",)], "body string"
    )
    ok, _ = execute(spark, ["parse-as-csv body , true"], df)
    assert [c for c in ok.columns if c != "body"] == ["first_name", "last_name"]
    rows = ok.collect()
    assert len(rows) == 1
    assert (rows[0]["first_name"], rows[0]["last_name"]) == ("alice", "zed")


def test_csv_trailing_commas_v1_pipeline(spark):
    """CsvParserTest.testTrailingCommas: trailing empty fields drop via
    keep; the v1 `filter-rows-on regex-match` and `set columns` forms
    (MigrateToV2.java:230-258, 68-83) drive the cleanup."""
    names = [("33445566", "Potter", "Harry"), ("44333433", "Weasley", "Ron"),
             ("65765566", "Granger", "Hermione"), ("13233121", "Diggory", "Cedric"),
             ("98786868", "Weasley", "George"), ("78977876", "Weasley", "Fred")]
    rows = [("school_id, student_id, last_name, first_name,,,",)] + [
        (f"14J456,{sid},{ln},{fn},,,",) for sid, ln, fn in names
    ]
    df = spark.createDataFrame(rows, "body string")
    ok, _ = execute(spark, [
        "parse-as-csv body , false",
        "filter-rows-on regex-match body_1 ^school_id$",
        "drop body",
        "set columns school_id, student_id, last_name, first_name",
        "keep school_id,student_id,last_name,first_name",
    ], df)
    got = sorted(
        (r["school_id"], r["student_id"], r["last_name"], r["first_name"])
        for r in ok.collect()
    )
    assert got == sorted(("14J456", sid, ln, fn) for sid, ln, fn in names)
    assert len(ok.columns) == 4


# --------------------------------------------------------- JsParserTest

def test_json_array_of_objects_explodes_to_rows(spark):
    """JsParserTest.testArrayOfObjects: a top-level array yields one row
    per element, the element staying in the source column for a
    follow-up parse (JsParser.java:130-141)."""
    df = spark.createDataFrame(
        [('[ { "a" : 1, "b" : 2 }, { "a" : 3, "b" : 3 }, { "a" : 4, "c" : 5 } ]',)],
        "body string",
    )
    ok, _ = execute(spark, ["parse-as-json body"], df)
    assert ok.count() == 3
    # second parse flattens the per-row objects (ragged keys → nulls)
    ok2, _ = execute(spark, ["parse-as-json body", "parse-as-json body"], df)
    got = sorted(
        (r["body_a"], r["body_b"], r["body_c"]) for r in ok2.collect()
    )
    assert got == [(1, 2, None), (3, 3, None), (4, None, 5)]


def test_json_array_of_numbers_and_trailing_whitespace(spark):
    """JsParserTest.testArrayOfNumbers / testParsingExtraCharacters."""
    for payload in ("[1,2,3,4,5]", "[1,2,3,4,5]             "):
        df = spark.createDataFrame([(payload,)], "body string")
        ok, _ = execute(spark, ["parse-as-json body"], df)
        assert sorted(r["body"] for r in ok.collect()) == [1, 2, 3, 4, 5]


_NESTED = (
    '{ "id": 1, "name": { "first": "Root", "last": "Joltie" }, '
    '"age": 22, "weigth": 184, "height": 5.8 }'
)
_DEEP = (
    '{ "id": 1, "name": { "first": { "n": "Root", "m": "Rootie" }, '
    '"last": "Joltie" }, "age": 22, "weigth": 184, "height": 5.8 }'
)


def test_json_depth_controlled_flattening(spark):
    """JsParserTest.testDepthParsing: depth 1 keeps nested objects as
    JSON values; depth >= 2 flattens one more level; 3-level nesting
    needs depth >= 3 to reach the leaves."""
    df = spark.createDataFrame([(_NESTED, _DEEP)], "b1 string, b6 string")
    ok, _ = execute(spark, ["parse-as-json b1 1", "parse-as-json b6 3"], df)
    cols = set(ok.columns)
    assert "b1_name" in cols and "b1_name_first" not in cols
    assert {"b6_name_first_n", "b6_name_first_m", "b6_name_last"} <= cols
    r = ok.first()
    assert (r["b6_name_first_n"], r["b6_name_first_m"]) == ("Root", "Rootie")

    df2 = spark.createDataFrame([(_NESTED,)], "b2 string")
    ok2, _ = execute(spark, ["parse-as-json b2 2"], df2)
    assert {"b2_name_first", "b2_name_last"} <= set(ok2.columns)
    assert ok2.first()["b2_name_first"] == "Root"


# ----------------------------------------------- ExtractRegexGroupsTest

def test_extract_regex_all_matches(spark):
    """ExtractRegexGroupsTest.testRegexGroups / testEmailRegex: the
    Matcher.find() loop emits one value per MATCH (column_<m>_<g>),
    not just the first — 'two@emails.com, another@one.com' yields two
    columns; non-matching rows null-pad."""
    regex = r"[^(]+\(([0-9]{4})\).*"
    df = spark.createDataFrame(
        [("Toy Story (1995)",), ("Toy Story",)], "column string"
    )
    ok, _ = execute(spark, [f"extract-regex-groups :column '{regex}'"], df)
    got = {r["column"]: r["column_1_1"] for r in ok.collect()}
    assert got == {"Toy Story (1995)": "1995", "Toy Story": None}

    email = r"((?:\S+|\".*?\")+@[a-zA-Z0-9\.-]+(?:\.[a-zA-Z]{2,6})?)"
    inputs = {
        "this is not an email": [],
        "@": [],
        "test@example.com": ["test@example.com"],
        "two@emails.com, another@one.com": ["two@emails.com,", "another@one.com"],
        "mixed_email.stuff+thing@example.com": ["mixed_email.stuff+thing@example.com"],
        "MiXeD@case.com": ["MiXeD@case.com"],
        "tldemail@tld": ["tldemail@tld"],
    }
    df = spark.createDataFrame([(k,) for k in inputs], "column string")
    ok, _ = execute(spark, [f"extract-regex-groups :column '{email}'"], df)
    rows = {r["column"]: r for r in ok.collect()}
    inputs["two@emails.com, another@one.com"] = ["two@emails.com", "another@one.com"]
    for k, v in inputs.items():
        got = [rows[k][f"column_{m}_1"] for m in (1, 2)]
        assert [g for g in got if g is not None] == v, k


def test_extract_regex_ssn_and_phone(spark):
    """ExtractRegexGroupsTest.testSSN / testPhoneNumber (representative
    rows of each table)."""
    ssn = r"(\d{3}[-\s]?\d{2}[-\s]?\d{4})"
    df = spark.createDataFrame(
        [("not an ssn",), ("123-45-6789",), ("123 45 6789",), ("123456789",)],
        "column string",
    )
    ok, _ = execute(spark, [f"extract-regex-groups :column '{ssn}'"], df)
    got = {r["column"]: r["column_1_1"] for r in ok.collect()}
    assert got == {
        "not an ssn": None, "123-45-6789": "123-45-6789",
        "123 45 6789": "123 45 6789", "123456789": "123456789",
    }

    phone = r"((?:\+\d{1,3}[\s-]?)?\(?\d{3}\)?[\s-]?\d{3}[\s-]?\d{4})"
    vals = ["+12345678901", "+1-234-567-8901", "(123) 456-7890", "1234567890"]
    df = spark.createDataFrame([(v,) for v in vals], "column string")
    ok, _ = execute(spark, [f"extract-regex-groups :column '{phone}'"], df)
    got = {r["column"]: r["column_1_1"] for r in ok.collect()}
    assert got == {v: v for v in vals}


# ------------------------------------------------------------ SetTypeTest

def test_set_type_alias_bug_compat(spark):
    """SetTypeTest.testToInt / testToShort: the reference's I64 alias
    converts to Integer and I32 to Short (ColumnConverter.java:108,131)
    — counterintuitive but pinned by its tests; a drop-in replacement
    must reproduce it."""
    df = spark.createDataFrame([(10000, 10000)], "a long, b int")
    ok, _ = execute(spark, ["set-type a i64", "set-type b i32"], df)
    assert dict(ok.dtypes) == {"a": "int", "b": "smallint"}
    assert ok.first() == (10000, 10000)


def test_set_type_boolean_semantics(spark):
    """SetTypeTest.testToBoolean: numerics convert via `> 0` (so
    -10000 is false, unlike a nonzero-is-true cast) and strings via
    Boolean.parseBoolean ('yes' is false, not an error)."""
    df = spark.createDataFrame(
        [(10000, -10000, 10000.0, -10000.0, "True", "FALSE", "yes")],
        "i int, ni int, d double, nd double, s1 string, s2 string, s3 string",
    )
    ok, _ = execute(spark, [
        "set-type i bool", "set-type ni bool", "set-type d Bool",
        "set-type nd BOOL", "set-type s1 bool", "set-type s2 boolean",
        "set-type s3 bool",
    ], df)
    assert ok.first() == (True, False, True, False, True, False, False)


def test_set_type_bytes_to_numeric_big_endian(spark):
    """SetTypeTest.testToInt/-Short/-Long/-Float/-Double byte[]
    fixtures: big-endian Bytes.toX decoding, IEEE bit patterns for
    float/double ({70,28,64,0} == 10000.0f, {64,-61,-120,0,...} ==
    10000.0d)."""
    df = spark.createDataFrame(
        [(bytearray([0, 0, 39, 16]), bytearray([39, 16]),
          bytearray([0, 0, 0, 0, 0, 0, 39, 16]), bytearray([70, 28, 64, 0]),
          bytearray([64, 0xC3, 0x88, 0, 0, 0, 0, 0]))],
        "bi binary, bs binary, bl binary, bf binary, bd binary",
    )
    ok, _ = execute(spark, [
        "set-type bi int", "set-type bs short", "set-type bl long",
        "set-type bf float", "set-type bd double",
    ], df)
    assert dict(ok.dtypes) == {
        "bi": "int", "bs": "smallint", "bl": "bigint",
        "bf": "float", "bd": "double",
    }
    assert ok.first() == (10000, 10000, 10000, 10000.0, 10000.0)


def test_set_type_numeric_widths_all_sources(spark):
    """SetTypeTest.testToInt/testToLong/testToFloat/testToDouble: the
    same 10000 arrives from string/int/double/short/long/float/decimal
    sources and lands at the exact target type and value."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [("10000", 10000, 10000.0, 10000, 10000, 10000.0, Decimal("10000"))],
        "s string, i int, d double, sh smallint, l long, f float, dec decimal(10,0)",
    )
    for target, spark_t in [("int", "int"), ("long", "bigint"),
                            ("float", "float"), ("double", "double")]:
        ok, _ = execute(spark, [f"set-type {c} {target}" for c in
                                ("s", "i", "d", "sh", "l", "f", "dec")], df)
        assert set(dict(ok.dtypes).values()) == {spark_t}
        assert all(float(v) == 10000.0 for v in ok.first())


# -------------------------------------------------------- SendToErrorTest

def test_send_to_error_width_condition(spark):
    """SendToErrorTest.testErrorBasedOnColumns: `this.width() < 4`
    routes the short CSV record to the error channel. Row.width() maps
    to the count of non-null cells (ragged reference rows project onto
    the fixed schema as nulls)."""
    df = spark.createDataFrame(
        [("A,B,C,D",), ("X,Y,1",), ("U,V,2,3.0",)], "body string"
    )
    ok, err = execute(spark, [
        "parse-as-csv body , true", "drop body",
        "send-to-error exp:{ this.width() < 4} 'filtering records that dont have 4 columns'",
    ], df)
    assert ok.count() == 1 and err.count() == 1
    assert ok.first()["C"] == "2"
    e = err.first()
    # reference-pinned message format (SendToErrorTest.java:190)
    assert e["message"] == (
        "filtering records that dont have 4 columns "
        "(ecode: 1, directive: send-to-error)"
    )
    assert '"C":"1"' in e["record"]


def test_send_to_error_value_and_regex_conditions(spark):
    """SendToErrorTest.testErrorConditionTrue / testRegexFiltering /
    testNullFieldsSkipping: numeric coercion on string cells, full-match
    =~, and null fields never matching (no error, no crash)."""
    df = spark.createDataFrame(
        [("A,B,C,D",), ("X,Y,1,2.0",), ("U,V,2,3.0",)], "body string"
    )
    ok, err = execute(
        spark, ["parse-as-csv body , true", "drop body", "send-to-error C == 1"], df
    )
    assert ok.count() == 1 and err.count() == 1
    assert '"D":"2.0"' in err.first()["record"] and ok.first()["C"] == "2"

    df = spark.createDataFrame(
        [("A,B",), ("Washington,Y",), ("Window,V",)], "body string"
    )
    ok, err = execute(
        spark, ["parse-as-csv body , true", "drop body", 'send-to-error A =~ "Was.*"'], df
    )
    assert ok.count() == 1 and err.count() == 1

    # C1 doesn't exist → null → never matches → nothing routed
    df = spark.createDataFrame(
        [("A,B,C",), ("Washington,Y",), ("Window,V,XYZ",)], "body string"
    )
    ok, err = execute(
        spark,
        ["parse-as-csv body , true", "drop body", 'send-to-error exp:{C1 =~ "Was.*"}'],
        df,
    )
    assert ok.count() == 2 and (err is None or err.count() == 0)


def test_csv_extra_commas_width_repair(spark):
    """CsvParserTest.testExtraCommasAndLeadingZeros: an unquoted comma
    inside a name shifts fields right; `this.width() == 5` detects and
    repairs it, and leading zeros survive (cells stay strings)."""
    df = spark.createDataFrame(
        [("school_id, student_id, last_name, first_name",),
         ("14J456,0033445566,Potter,Jr,Harry",),
         ("14J456,0044333433,Weasley,Ron",)], "body string"
    )
    ok, _ = execute(spark, [
        "parse-as-csv body , false",
        "filter-rows-on regex-match body_1 ^school_id$", "drop body",
        "set columns school_id, student_id, last_name, first_name, body_5",
        "set-column :last_name exp:{ this.width() == 5 ? (last_name + ',' + first_name) : last_name}",
        "set-column :first_name exp:{ this.width() == 5 ? body_5 : first_name}",
        "drop body_5",
    ], df)
    assert sorted(map(tuple, ok.collect())) == [
        ("14J456", "0033445566", "Potter,Jr", "Harry"),
        ("14J456", "0044333433", "Weasley", "Ron"),
    ]


# ------------------------------------------- FlattenTest / FillNullOrEmpty

def test_flatten_mixed_scalar_and_array_rows(spark):
    """FlattenTest.testBasicCase1 (one variant of each array form):
    scalar-only rows pass through once; array rows explode per element
    with the scalar columns repeated."""
    rows = [("A", None, None), ("B", None, None),
            (None, ["x1", "y1"], 10), (None, ["x2", "y2"], 11)]
    df = spark.createDataFrame(rows, "col1 string, col2 array<string>, col3 int")
    ok, _ = execute(spark, ["flatten col1,col2,col3"], df)
    got = sorted((str(r["col1"]), str(r["col2"]), str(r["col3"]))
                 for r in ok.collect())
    assert got == [("A", "None", "None"), ("B", "None", "None"),
                   ("None", "x1", "10"), ("None", "x2", "11"),
                   ("None", "y1", "10"), ("None", "y2", "11")]


def test_flatten_empty_list_keeps_row(spark):
    """FlattenTest.testEmptyList: flattening an empty array keeps the
    row with a null cell, it does not drop the row."""
    df = spark.createDataFrame([([], "y")], "x array<string>, y string")
    ok, _ = execute(spark, ["flatten x"], df)
    rows = ok.collect()
    assert len(rows) == 1 and rows[0]["y"] == "y" and rows[0]["x"] is None


def test_fill_null_or_empty_mixed_and_v1_unquoted(spark):
    """FillNullOrEmptyTest.testMixedCases / testSpace: null and ''
    both fill; the v1 unquoted value form (`value N/A`) parses."""
    df = spark.createDataFrame([(None,), ("",), ("Should be fine",)], "value string")
    ok, _ = execute(spark, ["fill-null-or-empty value N/A"], df)
    assert sorted(r["value"] for r in ok.collect()) == ["N/A", "N/A", "Should be fine"]
    ok, _ = execute(spark, ["fill-null-or-empty :value 'Not Available'"], df)
    assert sorted(r["value"] for r in ok.collect()) == [
        "Not Available", "Not Available", "Should be fine"]


# ------------------------------------------ GlobalTest / ExpressionTest

def test_jexl_coalesce_format_null_helpers(spark):
    """GlobalTest.testFirstNonNull* / testPrint / testNullToEmpty /
    testNullToZero."""
    df = spark.createDataFrame([(None, None, "c")], "a string, b string, c string")
    ok, _ = execute(spark, ["set-column d coalesce(a,b,c)"], df)
    assert ok.first()["d"] == "c"
    df2 = spark.createDataFrame([(None, None, None)], "a string, b string, c string")
    ok, _ = execute(spark, ["set-column d coalesce(a,b,c)"], df2)
    assert ok.first()["d"] is None
    df3 = spark.createDataFrame([("a", "b", "c")], "a string, b string, c string")
    ok, _ = execute(spark, ['set-column d format("%s-%s-%s", a,b,c)'], df3)
    assert ok.first()["d"] == "a-b-c"
    df4 = spark.createDataFrame([(None, "value", 999)], "a string, b string, c long")
    ok, _ = execute(spark, [
        "set-column t1 NullToEmpty(a)", "set-column t2 NullToEmpty(b)",
        "set-column z1 NullToZero(a)", "set-column z3 NullToZero(c)",
    ], df4)
    r = ok.first()
    assert (r["t1"], r["t2"]) == ("", "value")
    assert float(r["z1"]) == 0.0 and float(r["z3"]) == 999.0


def test_jexl_if_else_block_form(spark):
    """GlobalTest.testIsNotNull / testIsNull: the JEXL statement form
    `if (cond) { a } else { b }` compiles to a conditional."""
    df = spark.createDataFrame([(None, "value", 999)], "a string, b string, c long")
    ok, _ = execute(spark, [
        "set-column test1 IsNotNull(a) ? a : null",
        "set-column test2 IsNotNull(b) ? b : null",
        "set-column test4 if(IsNotNull(c)){ a } else {b}",
        "set-column test5 if(IsNull(c)){ a } else {b}",
    ], df)
    r = ok.first()
    assert r["test1"] is None and r["test2"] == "value"
    assert r["test4"] is None and r["test5"] == "value"


def test_jexl_string_namespace_commons_lang(spark):
    """ExpressionTest.testStringNamespace: commons-lang StringUtils
    semantics (abbreviate ellipsis inside the width, center both-sides
    pad, chomp one EOL, chop last char, deleteWhitespace)."""
    df = spark.createDataFrame(
        [("root", "This is long transformation", "This has eol\n",
          "Joltie", "Jolti  Root")],
        "first string, longtxt string, eoltxt string, chop string, delws string",
    )
    ok, _ = execute(spark, [
        "set column abbreviate string:abbreviate(longtxt, 5)",
        "set column center string:center(first, 10)",
        "set column eoltxt string:chomp(eoltxt)",
        "set column chop string:chop(chop)",
        "set column delws string:deleteWhitespace(delws)",
    ], df)
    r = ok.first()
    assert r["abbreviate"] == "Th..."
    assert r["center"] == "   root   "
    assert r["eoltxt"] == "This has eol"
    assert r["chop"] == "Jolti"
    assert r["delws"] == "JoltiRoot"


def test_jexl_apply_expr_pipeline(spark):
    """ExpressionTest.testApplyExpr (minus the multi-statement local-var
    line, which is out of the supported JEXL subset): v1 `set column`,
    concat, ternary on numeric strings, arithmetic, string:reverse."""
    df = spark.createDataFrame(
        [("1098,Root,Joltie,01/26/1956,root@jolite.io,32,11.79,"
          "150 Mars Ave,Palo Alto,CA,USA,32826",)], "__col string"
    )
    ok, _ = execute(spark, [
        "parse-as-csv __col ,",
        "drop __col",
        "set columns id,first,last,dob,email,age,hrlywage,address,city,state,country,zip",
        'set column name concat(last, ", ", first)',
        "set column isteen age < 15 ? 'yes' : 'no'",
        "set column salary hrlywage*40*4",
        "drop first", "drop last",
        "set column email string:reverse(email)",
    ], df)
    r = ok.first()
    assert r["name"] == "Joltie, Root"
    assert abs(float(r["salary"]) - 1886.3999999999999) < 1e-9
    assert r["isteen"] == "no"
    assert r["email"] == "oi.etiloj@toor"


def test_jexl_width_in_set_column(spark):
    """ExpressionTest.testRowNoOfColumns: `this.width()` counts the
    row's populated cells (12 CSV fields + the source column = 13)."""
    df = spark.createDataFrame(
        [("1098,Root,Joltie,01/26/1956,root@jolite.io,32,11.79,"
          "150 Mars Ave,Palo Alto,CA,USA,32826",)], "body string"
    )
    ok, _ = execute(spark, [
        "parse-as-csv body ','", "set-column :cols exp:{ this.width() }",
    ], df)
    assert ok.first()["cols"] == 13


# ----------------------------------------------- FixedLengthParserTest

def test_fixed_length_parser_reference_cases(spark):
    """FixedLengthParserTest: exact-length parse, short-record routed
    to the error channel (ecode 2), padding stripped via replaceAll,
    and consecutive records exploding to one row each."""
    df = spark.createDataFrame([("AABBCDEEEFFFF",)], "body string")
    ok, err = execute(spark, ["parse-as-fixed-length body 2,2,1,1,3,4"], df)
    r = ok.first()
    assert [r[f"body_{i}"] for i in range(1, 7)] == ["AA", "BB", "C", "D", "EEE", "FFFF"]
    assert err is None or err.count() == 0

    short = spark.createDataFrame([("AABBCDEEEFFF",)], "body string")
    ok, err = execute(spark, ["parse-as-fixed-length body 2,2,1,1,3,4"], short)
    assert ok.count() == 0 and err.count() == 1

    padded = spark.createDataFrame([("AA__BB__C___D___EEE_FFFF",)], "body string")
    ok, _ = execute(spark, ["parse-as-fixed-length :body 4,4,4,4,4,4 '_'"], padded)
    r = ok.first()
    assert [r[f"body_{i}"] for i in range(1, 7)] == ["AA", "BB", "C", "D", "EEE", "FFFF"]

    multi = spark.createDataFrame([("AABBCCDD",)], "body string")
    ok, _ = execute(spark, ["parse-as-fixed-length body 2,2"], multi)
    assert sorted((r["body_1"], r["body_2"]) for r in ok.collect()) == [
        ("AA", "BB"), ("CC", "DD")]


# -------------------------------------------- ArithmeticOperationsTest

def test_arithmetic_namespace_reference_semantics(spark):
    """ArithmeticOperationsTest.testAdd/testMax/testMin/testAverage/
    testEqual: variadic forms, and any-null-propagates-null."""
    df = spark.createDataFrame([(2, 8, None)], "a int, b int, n int")
    ok, _ = execute(spark, [
        "set-column s arithmetic:add(a, b, 5)",
        "set-column sn arithmetic:add(a, n, b)",
        "set-column mx arithmetic:max(a, b, 3)",
        "set-column mxn arithmetic:max(a, n)",
        "set-column mn arithmetic:min(a, b)",
        "set-column av arithmetic:average(a, b, 5)",
        "set-column eq arithmetic:equal(a, a)",
        "set-column ne arithmetic:equal(a, b)",
    ], df)
    r = ok.first()
    assert float(r["s"]) == 15.0 and r["sn"] is None
    assert float(r["mx"]) == 8.0 and r["mxn"] is None
    assert float(r["mn"]) == 2.0
    assert abs(float(r["av"]) - 5.0) < 1e-9
    assert r["eq"] is True and r["ne"] is False


# ---------------------------------- MergeTest / CopyTest / RenameTest

def test_merge_separators(spark):
    """MergeTest: basic two-way merge, java-unescaped \\u000A separator
    becoming a real newline (Merge.java:78), multi-char separator."""
    df = spark.createDataFrame([("Root", "Joltie")], "A string, B string")
    ok, _ = execute(spark, ["merge A B C ','", "merge B A D ' '"], df)
    r = ok.first()
    assert r["C"] == "Root,Joltie" and r["D"] == "Joltie Root"
    ok, _ = execute(spark, ["merge A B C '\\u000A'"], df)
    assert ok.first()["C"] == "Root\nJoltie"
    ok, _ = execute(spark, ["merge A B C '---'"], df)
    assert ok.first()["C"] == "Root---Joltie"


def test_copy_force_flag(spark):
    """CopyTest.testForceCopy / testCopyToExistingColumn: copying onto
    an existing column requires force; with force it overwrites."""
    import pytest

    df = spark.createDataFrame([("A", "B", "1")],
                               "body_1 string, body_2 string, body_3 string")
    ok, _ = execute(spark, ["copy body_1 body_2 true"], df)
    r = ok.first()
    assert r["body_2"] == r["body_1"] == "A"
    with pytest.raises(Exception, match="force"):
        execute(spark, ["copy body_1 body_2"], df)


def test_rename_case_only_change(spark):
    """RenameTest.testRenameCaseSensitiveSuccess: renaming C1 -> c1
    (case-only) succeeds and the new exact spelling sticks."""
    df = spark.createDataFrame([("Root", "Joltie")], "A string, B string")
    ok, _ = execute(spark, ["rename A a"], df)
    assert ok.columns[0] == "a" and ok.first()["a"] == "Root"


# --------------------------------------------------- RecipeCompilerTest

def test_compile_skips_macros_but_apply_refuses(spark):
    """RecipeCompilerTest.testMacroSkippingDuringParsing /
    testSingleMacroLikeWranglerPlugin / testNestedMacros: ${...}
    placeholders (incl. nested) compile fine — the platform substitutes
    them before execution — but applying with macros unresolved raises
    instead of silently running a partial recipe."""
    import pytest

    from wrangler_spark.recipe.compiler import compile_recipe

    r = compile_recipe([
        "parse-as-csv :body ',' true", "${macro1}", "${macro${number}}",
        "parse-as-csv :body '${delimiter}' true",
    ])
    assert r.names == ["parse-as-csv"] and len(r.macros) == 3
    only = compile_recipe(["${directives}"])
    assert only.names == [] and only.macros == ["${directives}"]
    df = spark.createDataFrame([("a,b",)], "body string")
    with pytest.raises(ValueError, match="unresolved macros"):
        r.apply(df)


def test_complex_v1_recipe_compiles_and_runs(spark):
    """RecipeCompilerTest.testComplexExpression end-to-end: unquoted
    sed expression with empty replacement (s/Washington//g — the //
    must not read as a comment), JEXL empty(), bare =~ regex, and the
    v1 filter-rows-on rewrite."""
    df = spark.createDataFrame(
        [("h1,h2,n1,n2,city,state",),
         ("A,B,Jo,Ray,WashingtonVille,DCx",),
         ("C,D,Mia,Lee,Austin,TX",)], "body string"
    )
    ok, err = execute(spark, [
        "parse-as-csv body , true",
        "drop body",
        "merge n1 n2 Full_Name ' '",
        "find-and-replace city s/Washington//g",
        "send-to-error empty(city)",
        'send-to-error state =~ "DC.*"',
        "filter-rows-on regex-match state ^TX$",
    ], df)
    # row 1: city 'WashingtonVille' → 'Ville' (not empty), state DCx → error
    # row 2: state TX → filtered
    assert ok.count() == 0
    assert err.count() == 1
    e = err.first()
    assert '"city":"Ville"' in e["record"]


# ------------------------------------------------------- ParseDateTest

def test_simple_date_patterns_simpledateformat_parity(spark):
    """ParseDateTest.testSimpleDateWithPatterns (representative rows):
    the engine pins spark.sql.legacy.timeParserPolicy=LEGACY =
    java.text.SimpleDateFormat — the reference's exact parser — so
    'at'/T literals, z zone names, G era, EEE day names, '' escaped
    quotes and lenient single-digit fields all parse; unquoted
    multi-word formats consume the rest of the line (v1 grammar)."""
    import datetime as dt

    cases = [
        ("MM/dd/yyyy", "12/10/2016", dt.datetime(2016, 12, 10)),
        ("MM-dd-yy", "12-10-16", dt.datetime(2016, 12, 10)),
        ("MM-dd-yyyy 'at' HH:mm:ss z", "12-10-2016 at 06:45:11 PST",
         dt.datetime(2016, 12, 10, 14, 45, 11)),
        ("yyyy,MM.dd'T'HH:mm:ss.SSSZ", "2016,12.10T06:45:11.111-0800",
         dt.datetime(2016, 12, 10, 14, 45, 11, 111000)),
        ("EEE, d MMM yyyy HH:mm:ss", "Sat, 10 Dec 2016 06:45:11",
         dt.datetime(2016, 12, 10, 6, 45, 11)),
        ("EEE, MMM d, ''yy", "Sat, Dec 10, '16", dt.datetime(2016, 12, 10)),
        ("h:mm a", "06:45 PM", dt.datetime(1970, 1, 1, 18, 45)),
        ("yyyy.MM.dd G 'at' HH:mm:ss z", "2016.12.10 AD at 06:45:11 PST",
         dt.datetime(2016, 12, 10, 14, 45, 11)),
    ]
    for pat, val, want in cases:
        df = spark.createDataFrame([(val,)], "d string")
        ok, _ = execute(spark, [f"parse-as-simple-date d {pat}"], df)
        assert ok.first()["d"] == want, (pat, val)


def test_simple_date_diff_lenient_fields(spark):
    """ParseDateTest.testSimpleDateParserAndDiff: lenient single-digit
    month/day/hour parsing (2/1/1990 under MM/dd/yyyy) and millisecond
    diffs (1 h, 1 month + 1 minute, zero)."""
    df = spark.createDataFrame(
        [("12/10/2016 07:45", "12/10/2016 06:45"),
         ("2/1/1990 12:01", "1/1/1990 12:00"),
         ("03/03/1998 2:02", "03/03/1998 2:02")],
        "date1 string, date2 string",
    )
    ok, _ = execute(spark, [
        "parse-as-simple-date date1 MM/dd/yyyy HH:mm",
        "parse-as-simple-date date2 MM/dd/yyyy HH:mm",
        "diff-date date1 date2 difference",
    ], df)
    assert sorted(r["difference"] for r in ok.collect()) == [0, 3600000, 2678460000]


# ---------------------------------------------------- DateAndTimeTest
# functions/DateAndTimeTest.java — the datetime: JEXL namespace.
# LocalTime values surface as long nanos-since-midnight (functions.py
# datetime: section); LocalDate/LocalDateTime as date/timestamp_ntz.

def _dt_row(spark, directives):
    df = spark.createDataFrame([("x",)], "body string")
    ok, _ = execute(spark, directives, df)
    return ok.first()


def test_dt_date_from_days_since(spark):
    r = _dt_row(spark, [
        "set-column a datetime:DateFromDaysSince(18250, datetime:GetDate('1958-08-18'))",
        "set-column b datetime:DateFromDaysSince(-1, datetime:GetDate('1958-08-18'))",
    ])
    assert r["a"] == dt.date(2008, 8, 5)
    assert r["b"] == dt.date(1958, 8, 17)


def test_dt_date_from_components_and_julian(spark):
    r = _dt_row(spark, [
        "set-column a datetime:DateFromComponents(2010, 12, 2)",
        "set-column b datetime:DateFromJulianDay(2454614)",
        "set-column c datetime:JulianDayFromDate(datetime:GetDate('2008-05-27'))",
    ])
    assert r["a"] == dt.date(2010, 12, 2)
    assert r["b"] == dt.date(2008, 5, 27)
    assert r["c"] == 2454614


def test_dt_date_offset_by_components(spark):
    r = _dt_row(spark, [
        "set-column a datetime:DateOffsetByComponents(datetime:GetDate('2011-08-18'),2,0,0)",
        "set-column b datetime:DateOffsetByComponents(datetime:GetDate('2011-08-18'),2,1,-1)",
        "set-column c datetime:DateOffsetByComponents(datetime:GetDate('2011-08-18'),2,5,-1)",
    ])
    assert r["a"] == dt.date(2013, 8, 18)
    assert r["b"] == dt.date(2013, 9, 17)
    assert r["c"] == dt.date(2014, 1, 17)


def test_dt_days_since_from_date(spark):
    r = _dt_row(spark, [
        "set-column a datetime:DaysSinceFromDate(datetime:GetDate('2008-08-18'), datetime:GetDate('1958-08-18'))",
        "set-column b datetime:DaysSinceFromDate(datetime:GetDate('1958-08-18'), datetime:GetDate('2008-08-18'))",
    ])
    assert r["a"] == -18263
    assert r["b"] == 18263


def test_dt_time_extractors(spark):
    """testHoursFromTime/Nano/Micro/Milli/MidnightSeconds/Minutes/Seconds:
    GetTime's optional fraction is micros-aligned ('.32' = 320 ms)."""
    r = _dt_row(spark, [
        "set-column h datetime:HoursFromTime(datetime:GetTime('22:30:00.434'))",
        "set-column n datetime:NanoSecondsFromTime(datetime:GetTime('22:30:00.32'))",
        "set-column u datetime:MicroSecondsFromTime(datetime:GetTime('22:30:00.32'))",
        "set-column ms datetime:MilliSecondsFromTime(datetime:GetTime('22:30:00.32'))",
        "set-column mid datetime:MidnightSecondsFromTime(datetime:GetTime('00:30:52'))",
        "set-column mi datetime:MinutesFromTime(datetime:GetTime('22:30:52'))",
        "set-column s datetime:SecondsFromTime(datetime:GetTime('22:30:52'))",
    ])
    assert r["h"] == 22
    assert r["n"] == 320000000
    assert r["u"] == 320000
    assert r["ms"] == 320
    assert r["mid"] == 1852
    assert r["mi"] == 30
    assert r["s"] == 52


def test_dt_weekday_adjusters(spark):
    """testNext/Nth/PreviousWeekdayFromDate: strict TemporalAdjusters;
    2008-08-18 and 2009-08-18 are both Tuesdays-adjacent fixtures."""
    r = _dt_row(spark, [
        "set-column a datetime:NextWeekdayFromDate(datetime:GetDate('2008-08-18'), 'Thursday')",
        "set-column b datetime:NextWeekdayFromDate(datetime:GetDate('2008-08-18'), 'Thu')",
        "set-column c datetime:NthWeekdayFromDate(datetime:GetDate('2009-08-18'), 'Thursday', 1)",
        "set-column d datetime:NthWeekdayFromDate(datetime:GetDate('2009-08-18'), 'Thu', -2)",
        "set-column e datetime:PreviousWeekdayFromDate(datetime:GetDate('2008-08-18'), 'Thursday')",
    ])
    assert r["a"] == dt.date(2008, 8, 21)
    assert r["b"] == dt.date(2008, 8, 21)
    assert r["c"] == dt.date(2009, 8, 20)
    assert r["d"] == dt.date(2009, 8, 6)
    assert r["e"] == dt.date(2008, 8, 14)


def test_dt_month_day_extractors(spark):
    r = _dt_row(spark, [
        "set-column a datetime:MonthDayFromDate(datetime:GetDate('2008-08-18'))",
        "set-column b datetime:MonthFromDate(datetime:GetDate('2008-08-18'))",
        "set-column c datetime:YeardayFromDate(datetime:GetDate('2008-08-18'))",
        "set-column d datetime:YearweekFromDate(datetime:GetDate('2008-08-18'))",
    ])
    assert r["a"] == 18
    assert r["b"] == 8
    assert r["c"] == 231
    assert r["d"] == 33  # WeekFields(MONDAY,7), NOT ISO (=34)


def test_dt_seconds_since_sign(spark):
    """testSecondsSinceFromTimestamp: Duration.between(dst, src) =
    src - dst → NEGATIVE when src is earlier."""
    r = _dt_row(spark, [
        "set-column a datetime:SecondsSinceFromDateTime(datetime:GetDateTime('2008-08-18 22:30:52'), "
        "datetime:GetDateTime('2008-08-19 22:30:52'))",
    ])
    assert r["a"] == -86400


def test_dt_time_constructors(spark):
    r = _dt_row(spark, [
        "set-column a datetime:TimeFromComponents(10, 12, 2, 0)",
        "set-column b datetime:TimeFromMidnightSeconds(240)",
    ])
    assert r["a"] == (10 * 3600 + 12 * 60 + 2) * 10**9  # 10:12:02.0
    assert r["b"] == 240 * 10**9  # 00:04:00


def test_dt_datetime_combinators(spark):
    r = _dt_row(spark, [
        "set-column a datetime:GetDateTime(datetime:GetDate('2008-08-18'), datetime:GetTime('22:30:52'))",
        "set-column b datetime:DateTimeFromSecondsSince(2563, datetime:GetDateTime('2008-08-18 22:30:52'))",
        "set-column c datetime:DateTimeFromEpoch(1234567890)",
        "set-column d datetime:DateTimeFromTime(datetime:GetTime('12:03:22'), datetime:GetDateTime('2008-08-18 22:30:52'))",
        "set-column e datetime:DateTimeOffsetByComponents(datetime:GetDateTime('2009-08-18 14:05:29'), 0, 2, -4, 2, 0, 20)",
        "set-column f datetime:DateTimeOffsetBySeconds(datetime:GetDateTime('2009-08-18 14:05:29'), 32760)",
        "set-column g datetime:EpochFromDateTime(datetime:GetDateTime('2009-02-13 23:31:30'))",
    ])
    assert r["a"] == dt.datetime(2008, 8, 18, 22, 30, 52)
    assert r["b"] == dt.datetime(2008, 8, 18, 23, 13, 35)
    assert r["c"] == dt.datetime(2009, 2, 13, 23, 31, 30)
    assert r["d"] == dt.datetime(2008, 8, 18, 12, 3, 22)
    assert r["e"] == dt.datetime(2009, 10, 14, 16, 5, 49)
    assert r["f"] == dt.datetime(2009, 8, 18, 23, 11, 29)
    assert r["g"] == 1234567890


def test_dt_weekday_from_date_reference_quirk(spark):
    """testWeekdayFromDate: 8 - ISO-dow(startOfWeek) — the reference's
    previousOrSame(start) always lands on `start`, so the value depends
    only on the start-of-week argument (its own test pins 1..7)."""
    r = _dt_row(spark, [
        "set-column w1 datetime:WeekdayFromDate(datetime:GetDate('2008-08-18'))",
        "set-column w2 datetime:WeekdayFromDate(datetime:GetDate('2008-08-18'), 'saturday')",
        "set-column w4 datetime:WeekdayFromDate(datetime:GetDate('2008-08-18'), 'thursday')",
        "set-column w7 datetime:WeekdayFromDate(datetime:GetDate('2008-08-18'), 'monday')",
    ])
    assert (r["w1"], r["w2"], r["w4"], r["w7"]) == (1, 2, 4, 7)


def test_dt_current_time_shapes(spark):
    """testCurrentDateTime: non-null; CurrentTimeMS is the millis
    PORTION of the current second (0-999, DateAndTime.java:167), not
    epoch millis."""
    r = _dt_row(spark, [
        "set-column a datetime:CurrentDate()",
        "set-column b datetime:CurrentTime()",
        "set-column c datetime:CurrentTimeMS()",
        "set-column d datetime:CurrentDateTime()",
        "set-column e datetime:CurrentTimestampMS()",
        "set-column f datetime:TimeOffsetByComponents(datetime:GetTime('23:30:00'), 1, 0, 0)",
    ])
    assert r["a"] is not None and r["d"] is not None
    assert 0 <= r["b"] < 86_400 * 10**9
    assert 0 <= r["c"] < 1000
    assert r["e"] > 10**12
    assert r["f"] == 30 * 60 * 10**9  # wraps past midnight to 00:30


# -------------------------------------------------------- JsPathTest

def test_jspath_select_case_insensitive_and_variadic(spark):
    """JsPathTest.testJSONFunctions: select lowercases keys first
    ('$.name.fname' matches "Fname"), multi-path select returns an
    array, ArrayLength over a selected array counts nulls too (8)."""
    body = (
        '{"name": {"Fname": "Joltie", "Lname": "Root", "mname": null},'
        '"coordinates": [12.56, 45.789],'
        '"numbers": [1, 2.1, 3, null, 4, 5, 6, null],'
        '"integer": 1, "double": 2.8}'
    )
    df = spark.createDataFrame([(body,)], "body string")
    ok, _ = execute(spark, [
        "set-column s0 json:Select(body, '$.name.fname', '$.name.lname')",
        "set-column s1 json:Select(body, '$.name.fname')",
        "set-column s6 json:ArrayLength(json:Select(body, '$.numbers'))",
    ], df)
    r = ok.first()
    assert r["s1"] == "Joltie"
    assert r["s6"] == 8
    import json as _j
    assert _j.loads(r["s0"]) == ["Joltie", "Root"]


# ---------------------------------------------------- EncodeDecodeTest

def test_encode_decode_all_three_roundtrip(spark):
    """EncodeDecodeTest.testEncodeDecode: base32/base64/hex exact
    outputs and the decode round trip, including the reference's
    generated column names."""
    df = spark.createDataFrame(
        [("Base32 Encoding", "Testing Base 64 Encoding", "Hex Encoding")],
        "col1 string, col2 string, col3 string",
    )
    ok, _ = execute(spark, [
        "encode base32 col1", "encode base64 col2", "encode hex col3",
        "decode base32 col1_encode_base32",
        "decode base64 col2_encode_base64",
        "decode hex col3_encode_hex",
    ], df)
    r = ok.first()
    assert r["col1_encode_base32"] == "IJQXGZJTGIQEK3TDN5SGS3TH"
    assert r["col2_encode_base64"] == "VGVzdGluZyBCYXNlIDY0IEVuY29kaW5n"
    assert r["col3_encode_hex"] == "48657820456e636f64696e67"
    assert r["col1_encode_base32_decode_base32"] == "Base32 Encoding"
    assert r["col2_encode_base64_decode_base64"] == "Testing Base 64 Encoding"
    assert r["col3_encode_hex_decode_hex"] == "Hex Encoding"


# ---------------------------------------------------- QuantizationTest

def test_quantize_full_pipeline_with_notfound(spark):
    """QuantizationTest.testQuanitization: closed ranges, a gap value
    (20.7 falls between 20.0 and 21.0) stays null and the JEXL ternary
    maps it to NOT FOUND; expects 3 LOW / 1 MEDIUM / 1 HIGH / 1 not-found."""
    wages = ["11.79", "129.13", "9.54", "7.89", "45.67", "20.7"]
    df = spark.createDataFrame(
        [(f"109{i},Root,Joltie,01/26/1956,r@x.io,32,{w},150 Mars Ave,Palo Alto,CA,USA,32826",)
         for i, w in enumerate(wages)],
        "__col string",
    )
    ok, _ = execute(spark, [
        "parse-as-csv __col ,",
        "drop __col",
        "set columns id,first,last,dob,email,age,hrlywage,address,city,state,country,zip",
        "quantize hrlywage wagerange 0.0:20.0='LOW',21.0:75.0='MEDIUM',75.1:200.0='HIGH'",
        'set column wagerange (wagerange == null) ? "NOT FOUND" : wagerange',
    ], df)
    got = [r["wagerange"] for r in ok.collect()]
    from collections import Counter
    c = Counter(got)
    assert c["LOW"] == 3 and c["MEDIUM"] == 1 and c["HIGH"] == 1 and c["NOT FOUND"] == 1


# ------------------------------------------------------- ParseLogTest

_APACHE_LOG = (
    "[02/Dec/2013:14:10:30 -0000] - [52075 10.102.4.254 177.43.52.210 UpyU1gpmBAwAACfd5W0AAAAW "
    "GET /SS14-VTam-ny_019.jpg.rendition.zoomable.jpg HTTP/1.1] "
    "hsfirstvisit=http%3A%2F%2Fwww.domain.com%2Fen-us||1372268254000; has_js=1; MODE=FONTIS "
    '200 "Mozilla/5.0 (Windows NT 6.2; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) '
    'Chrome/31.0.1650.57 Safari/537.36" "www.domain.com" - 463952 '
    "http://www.domain.com/content/report/shows/New_York/KSHK/trip/s_s_14_ny_ww/sheers.html"
)


def test_log_custom_format_with_headers_and_env(spark):
    """ParseLogTest.testLogParsing: the exotic format
    %t %u [%D %h %{True-Client-IP}i %{UNIQUE_ID}e %r] %{Cookie}i %s
    "%{User-Agent}i" "%{host}i" %l %b %{Referer}i — header/env tokens,
    %D micros, a bracketed literal group and a space-bearing Cookie."""
    df = spark.createDataFrame([(_APACHE_LOG,)], "body string")
    ok, _ = execute(spark, [
        'parse-as-log body %t %u [%D %h %{True-Client-IP}i %{UNIQUE_ID}e %r] '
        '%{Cookie}i %s "%{User-Agent}i" "%{host}i" %l %b %{Referer}i',
    ], df)
    r = ok.first()
    assert r["request_time"] == "02/Dec/2013:14:10:30 -0000"
    assert r["response_time_us"] == "52075"
    assert r["remote_host"] == "10.102.4.254"
    assert r["header_true_client_ip"] == "177.43.52.210"
    assert r["env_unique_id"] == "UpyU1gpmBAwAACfd5W0AAAAW"
    assert r["request_line"] == "GET /SS14-VTam-ny_019.jpg.rendition.zoomable.jpg HTTP/1.1"
    assert r["header_cookie"].startswith("hsfirstvisit=") and "MODE=FONTIS" in r["header_cookie"]
    assert r["status_code"] == "200"
    assert r["header_user_agent"].startswith("Mozilla/5.0")
    assert r["header_host"] == "www.domain.com"
    assert r["response_size"] == "463952"
    assert r["header_referer"].endswith("sheers.html")


def test_log_common_log_format_custom_tokens(spark):
    """ParseLogTest.testCommonLogFormat via the explicit token string
    %h %l %u %t "%r" %>s %b (not the 'common' preset)."""
    df = spark.createDataFrame(
        [('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326',)],
        "body string",
    )
    ok, _ = execute(spark, ['parse-as-log body %h %l %u %t "%r" %>s %b'], df)
    r = ok.first()
    assert r["remote_host"] == "127.0.0.1"
    assert r["remote_user"] == "frank"
    assert r["request_time"] == "10/Oct/2000:13:55:36 -0700"
    assert r["request_line"] == "GET /apache_pb.gif HTTP/1.0"
    assert r["status_code"] == "200"
    assert r["response_size"] == "2326"


# ------------------------------------------------------- LogicalTest

def test_logical_bitwise_functions(spark):
    """LogicalTest.testLogicalBitwiseFunctions — all 12 columns,
    including the array-literal SetBit(356,[2,4,8],1) == 494 and
    Not(null) == 1."""
    df = spark.createDataFrame([(352, 400)], "a long, b long")
    ok, _ = execute(spark, [
        "set-column and logical:BitAnd(352, 400)",
        "set-column or logical:BitOr(352, 400)",
        "set-column xor logical:BitXor(352, 400)",
        "set-column compress logical:BitCompress('0101100000')",
        "set-column expand logical:BitExpand(352)",
        "set-column not1 logical:Not(5-5)",
        "set-column not2 logical:Not(5+5)",
        "set-column not3 logical:Not(null)",
        "set-column bitset logical:SetBit(356,[2,4,8], 1)",
    ], df)
    r = ok.first()
    assert r["and"] == 256 and r["or"] == 496 and r["xor"] == 240
    assert r["compress"] == 352 and r["expand"] == "101100000"
    assert (r["not1"], r["not2"], r["not3"]) == (1, 0, 1)
    assert r["bitset"] == 494


# ------------------------------------------------- NumberFunctionsTest

def test_number_functions_block_form(spark):
    """NumberFunctionsTest.testNumbers: JEXL block-with-assignment
    form `{ a = 5.0; number:AsDouble(a/2) }`, literal suffixes
    d/l/f/b, and Mantissa semantics."""
    df = spark.createDataFrame([(1,)], "x long")
    ok, _ = execute(spark, [
        "set-column double { a = 5.0; number:AsDouble(a/2) }",
        "set-column float { a = 2.34; number:AsFloat(a) }",
        "set-column int { a = 5.64; number:AsInteger(a) }",
        "set-column mantissaInt { a = 5; number:Mantissa(a) }",
        "set-column mantissaDouble { a = 43.2534d; number:Mantissa(a) }",
        "set-column mantissaLong { a = 214748364721l; number:Mantissa(a) }",
        "set-column mantissaFloat { a = 12.0234; number:Mantissa(a) }",
        "set-column mantissaBigD { a = 12.00123b; number:Mantissa(a) }",
    ], df)
    r = ok.first()
    assert r["double"] == 2.5
    assert abs(r["float"] - 2.34) < 1e-6
    assert r["int"] == 5
    assert r["mantissaInt"] == 0.0
    assert abs(r["mantissaDouble"] - 0.2534) < 1e-9
    assert r["mantissaLong"] == 0.0
    assert abs(r["mantissaFloat"] - 0.0234) < 1e-9
    assert abs(r["mantissaBigD"] - 0.00123) < 1e-9


# ------------------------------------------------------- GeoFenceTest

_FENCE_1 = (
    '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},'
    '"geometry":{"type":"Polygon","coordinates":[[[-122.05870628356934,37.37943348292772],'
    "[-122.05724716186525,37.374727268782294],[-122.04634666442871,37.37493189292912],"
    "[-122.04608917236328,37.38175237839049],[-122.05870628356934,37.37943348292772]]]}}]}"
)
_FENCE_2 = (
    '{"type":"Feature","properties":{},"geometry":{"type":"Polygon","coordinates":'
    "[[[-122.05055236816405,37.36862239166385],[-122.04038143157959,37.36841775030572],"
    "[-122.04141139984132,37.37312436031927],[-122.05055236816405,37.36862239166385]]]}}"
)


def test_geo_infence_single_and_multiple(spark):
    """GeoFenceTest.testWithSingleFence / testWithMultipleFences."""
    import json
    multi = json.dumps({
        "type": "FeatureCollection",
        "features": [json.loads(_FENCE_1)["features"][0], json.loads(_FENCE_2)],
    })
    df = spark.createDataFrame(
        [(37.378990156513105, -122.05076694488525),
         (43.46089378008257, -462.49145507812494)],
        "lat double, lon double",
    )
    for fence in (_FENCE_1, multi):
        ok, _ = execute(
            spark, [f"set-column inside geo:inFence(lat, lon, '{fence}')"], df
        )
        got = {(r["lat"], r["inside"]) for r in ok.collect()}
        assert (37.378990156513105, True) in got
        assert (43.46089378008257, False) in got


def test_geo_infence_open_polygon_rejected(spark):
    """GeoFenceTest.testWithOpenPolygon expects IllegalArgumentException —
    an unclosed ring must raise at compile time."""
    import pytest as _pytest

    from wrangler_spark.errors import ExpressionError, UsageError
    open_fence = (
        '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{},'
        '"geometry":{"type":"Polygon","coordinates":[[[-122.05870628356934,37.37943348292772],'
        "[-122.05724716186525,37.374727268782294],[-122.04634666442871,37.37493189292912],"
        "[-122.04608917236328,37.38175237839049]]]}}]}"
    )
    df = spark.createDataFrame([(1.0, 2.0)], "lat double, lon double")
    with _pytest.raises((ExpressionError, UsageError)):
        execute(spark, [f"set-column inside geo:inFence(lat, lon, '{open_fence}')"], df)


# ------------------------------------------------------ DataQualityTest

def test_dq_columns_hascolumn_inrange(spark):
    """DataQualityTest.testRecordLength / testRecordHasColumn /
    testRange via the EL surface (ragged rows project to null cells,
    so columns == non-null count)."""
    df = spark.createDataFrame([(1, 2, 3), (1, None, None)], "a int, b int, c int")
    ok, _ = execute(spark, [
        "set-column ncols dq:columns(this)",
        "set-column has_a dq:hascolumn(this, 'a')",
        "set-column has_z dq:hascolumn(this, 'z')",
        "set-column r1 dq:inrange(1, 0, 10)",
        "set-column r2 dq:inrange(0.9, 1, 10)",
        "set-column r3 dq:inrange(1.1, 1, 10)",
    ], df)
    rows = {r["ncols"]: r for r in ok.collect()}
    assert set(rows) == {3, 1}
    for r in rows.values():
        assert r["has_a"] is True and r["has_z"] is False
        assert (r["r1"], r["r2"], r["r3"]) == (True, False, True)


# ------------------------------------------------------------ ELTest

def test_el_decimal_transform(spark):
    """ELTest.testDecimalTransform over bd = 123456789.123456789, n = 2.
    Values asserted numerically (Spark decimals carry static scale, so
    Java's scale-sensitive BigDecimal.equals cases — strip_zero — are
    checked on value only)."""
    from decimal import Decimal
    from pyspark.sql import types as T
    bd = Decimal("123456789.123456789")
    df = spark.createDataFrame(
        [(bd,)], T.StructType([T.StructField("a", T.DecimalType(38, 9))])
    )
    ok, _ = execute(spark, [
        "set-column sc decimal:scale(a)",
        "set-column un decimal:unscaled(a)",
        "set-column ab decimal:abs(a)",
        "set-column ng decimal:negate(a)",
        "set-column sg decimal:sign(a)",
        "set-column sz decimal:strip_zero(a)",
        "set-column pw decimal:pow(a, 2)",
        "set-column dl decimal:decimal_left(a, 2)",
        "set-column dr decimal:decimal_right(a, 2)",
        "set-column ad decimal:add(a, 2)",
        "set-column su decimal:subtract(a, 2)",
        "set-column dq decimal:divideq(a, 2)",
    ], df)
    r = ok.first()
    assert r["sc"] == 9
    assert int(r["un"]) == 123456789123456789
    assert r["ab"] == bd and r["ng"] == -bd and r["sz"] == bd
    assert r["sg"] == 1
    assert abs(Decimal(r["pw"]) - bd * bd) < Decimal("1e-6")
    assert Decimal(r["dl"]) == Decimal("1234567.89123456789")
    assert Decimal(r["dr"]) == Decimal("12345678912.3456789")
    assert Decimal(r["ad"]) == bd + 2 and Decimal(r["su"]) == bd - 2
    assert abs(Decimal(r["dq"]) - bd / 2) < Decimal("1e-6")


def test_el_arithmetic_lcm(spark):
    """ELTest.testArithmeticOperations: arithmetic:lcm(123.123, 456.456)
    == 18714.696 (decimal-exact, not double-rounded)."""
    df = spark.createDataFrame([(123.123, 456.456)], "a double, b double")
    ok, _ = execute(spark, ["set-column l arithmetic:lcm(a, b)"], df)
    assert abs(ok.first()["l"] - 18714.696) < 1e-9


def test_el_map_indexing(spark):
    """ELTest.testArrays: nested map indexing with string keys plus
    math:max over toDouble'd map values."""
    df = spark.createDataFrame(
        [({"map": "10"}, {"ABC.EDFG": {"input": "1"}})],
        "runtime map<string,string>, token map<string,map<string,string>>",
    )
    ok, _ = execute(spark, [
        "set-column v runtime['map'] > token['ABC.EDFG']['input'] && "
        "math:max(toDouble(runtime['map']), toDouble(token['ABC.EDFG']['input'])) > 9",
    ], df)
    assert ok.first()["v"] is True


# ------------------------------------------------------ XmlToJsonTest

def test_xml_to_json_auto_conversion(spark):
    """XmlToJsonTest.testAutoConversionOfStringField: default and
    explicit-false keep-strings coerce "303246306303E8" to the double
    3.03246306303E19 (org.json stringToValue); keep-strings true
    preserves the string."""
    import json
    xml = '<?xml version="1.0" encoding="UTF-8" ?><Data><tagid>303246306303E8</tagid></Data>'
    df = spark.createDataFrame([(xml,)], "body string")
    ok, _ = execute(spark, [
        "copy body body_1 true",
        "copy body body_2 true",
        "copy body body_3 true",
        "parse-xml-to-json body_1 1",
        "parse-xml-to-json body_2 1 false",
        "parse-xml-to-json body_3 1 true",
    ], df)
    r = ok.first()
    assert json.loads(r["body_1_Data"]) == {"tagid": 3.03246306303e19}
    assert json.loads(r["body_2_Data"]) == {"tagid": 3.03246306303e19}
    assert json.loads(r["body_3_Data"]) == {"tagid": "303246306303E8"}


# ----------------------------------------------------- ParseExcelTest

def test_excel_date_formatting(spark):
    """ParseExcelTest.testDateFormatting: date-styled numeric cells
    render as formatted dates (column A) equal to the adjacent
    plain-text expectation (column B) — builtin m/d/yy, custom
    yyyy-mm-dd, and an h:mm:ss time."""
    import io
    import zipfile
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    styles = (
        f'<styleSheet {ns}>'
        '<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy-mm-dd"/></numFmts>'
        '<cellXfs count="4">'
        '<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/><xf numFmtId="21"/>'
        "</cellXfs></styleSheet>"
    )
    rows_xml = (
        '<row r="1"><c r="A1" s="1"><v>44562</v></c>'
        '<c r="B1" t="inlineStr"><is><t>1/1/22</t></is></c></row>'
        '<row r="2"><c r="A2" s="2"><v>44562</v></c>'
        '<c r="B2" t="inlineStr"><is><t>2022-01-01</t></is></c></row>'
        '<row r="3"><c r="A3" s="3"><v>44562.53125</v></c>'
        '<c r="B3" t="inlineStr"><is><t>12:45:00</t></is></c></row>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", f'<workbook {ns}><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>')
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/worksheets/sheet1.xml", f'<worksheet {ns}><sheetData>{rows_xml}</sheetData></worksheet>')
    df = spark.createDataFrame([(buf.getvalue(),)], "body binary")
    ok, _ = execute(spark, ["parse-as-excel :body '0'"], df)
    rows = ok.collect()
    assert len(rows) == 3
    for r in rows:
        # reference shape (73f9f2f): Excel letter columns, not a cells array
        assert r["A"] == r["B"], (r["A"], r["B"])


# ------------------------------------- TextDistance/MetricMeasureTest

_TD_METHODS = [
    "euclidean", "block-distance", "identity", "block", "dice",
    "longest-common-subsequence", "longest-common-substring",
    "overlap-cofficient", "jaccard", "damerau-levenshtein",
    "simon-white", "levenshtein", "cosine",
]


def test_text_distance_all_methods(spark):
    """TextDistanceMeasureTest: all 13 simmetrics builder methods run
    and produce a distance column, robust to empty strings, numeric
    inputs and null cells (the reference's ragged 4th row projects to a
    null string2 here)."""
    df = spark.createDataFrame(
        [("This is an example for distance measure.",
          "This test is made of words that are similar."),
         ("This is an example for distance measure.", ""),
         ("This is an example for distance measure.", "1"),
         ("This is an example for distance measure.", None)],
        "string1 string, string2 string",
    )
    recipe = [f"text-distance {m} string1 string2 d_{i}" for i, m in enumerate(_TD_METHODS)]
    ok, _ = execute(spark, recipe, df)
    rows = ok.collect()
    assert len(rows) == 4
    for r in rows:
        for i, m in enumerate(_TD_METHODS):
            assert r[f"d_{i}"] is not None, (m, r)
    # identity: distance 0 against itself, 1 against different
    ok2, _ = execute(spark, ["text-distance identity string1 string1 d"], df)
    assert all(r["d"] == 0.0 for r in ok2.collect())


def test_text_metric_all_methods(spark):
    """TextMetricMeasureTest: same 13 methods as similarities in [0,1],
    with exact anchors for the deterministic ones."""
    df = spark.createDataFrame([("kitten", "sitting"), ("abc", "abc")], "a string, b string")
    recipe = [f"text-metric {m} a b m_{i}" for i, m in enumerate(_TD_METHODS)]
    ok, _ = execute(spark, recipe, df)
    rows = {r["a"]: r for r in ok.collect()}
    for i, m in enumerate(_TD_METHODS):
        for r in rows.values():
            assert r[f"m_{i}"] is not None and 0.0 <= r[f"m_{i}"] <= 1.0, m
        assert abs(rows["abc"][f"m_{i}"] - 1.0) < 1e-6, m  # self-similarity
    # anchors: levenshtein("kitten","sitting") = 3 edits / 7
    i_lev = _TD_METHODS.index("levenshtein")
    assert abs(rows["kitten"][f"m_{i_lev}"] - (1 - 3 / 7)) < 1e-6
    # damerau-levenshtein("kitten","sitting") = 3 edits / 7
    i_dl = _TD_METHODS.index("damerau-levenshtein")
    assert abs(rows["kitten"][f"m_{i_dl}"] - (1 - 3 / 7)) < 1e-6


# --------------------------------------- Trim / LeftTrim / RightTrim

def test_trim_unicode_whitespace(spark):
    """TrimTest.testSingleWordTrim: trims tabs and carriage returns,
    not just spaces (reference Trimmer.WHITESPACE_CHARS)."""
    expected = "TITLE IS TITLE"
    df = spark.createDataFrame(
        [(expected,), ("  " + expected,), (expected + "  ",),
         (" " + expected + " ",), ("\t\r" + expected + "\r\t",),
         ("  " + expected + "　",)],
        "body string",
    )
    ok, _ = execute(spark, ["trim body"], df)
    assert [r["body"] for r in ok.collect()] == [expected] * 6


def test_ltrim_rtrim_unicode(spark):
    """LeftTrimTest / RightTrimTest: one-sided trims strip the same
    whitespace set."""
    df = spark.createDataFrame([("\t hello \r",)], "body string")
    ok, _ = execute(spark, ["copy body l true", "copy body r true",
                            "ltrim l", "rtrim r"], df)
    r = ok.first()
    assert r["l"] == "hello \r" and r["r"] == "\t hello"


# --------------------------------------------------- UrlEncodeTest

def test_url_encode_java_semantics(spark):
    """UrlEncodeTest: java.net.URLEncoder form encoding — space
    becomes '+', reserved chars percent-encode."""
    df = spark.createDataFrame([("http://www.yahoo.com?a=b c&b=ab&xyz=1",)], "url string")
    ok, _ = execute(spark, ["url-encode url"], df)
    assert ok.first()["url"] == "http%3A%2F%2Fwww.yahoo.com%3Fa%3Db+c%26b%3Dab%26xyz%3D1"
    ok2, _ = execute(spark, ["url-encode url", "url-decode url"], df)
    assert ok2.first()["url"] == "http://www.yahoo.com?a=b c&b=ab&xyz=1"


# ---------------------------------------------- ParseAsCurrencyTest

def test_parse_as_currency_error_routing(spark):
    """ParseAsCurrencyTest.testDefaultOption: 7 parse, the bare
    '1234.56' (no $) routes to the error channel."""
    vals = ["$1.56", "$45.56", "$6.78", "$0.09", "1234.56",
            "$8,976.78", "$58,976.78", "$1,234,678.67"]
    df = spark.createDataFrame([(v,) for v in vals], "src string")
    ok, err = execute(spark, [
        "parse-as-currency :src :dst",
        "parse-as-currency :src :dst1 'en_US'",
    ], df)
    got = sorted(round(r["dst"], 2) for r in ok.collect())
    assert got == sorted([1.56, 45.56, 6.78, 0.09, 8976.78, 58976.78, 1234678.67])
    errs = err.collect()
    assert len(errs) == 1 and '"src":"1234.56"' in errs[0]["record"]
    got1 = sorted(round(r["dst1"], 2) for r in ok.collect())
    assert got1 == got


# ------------------------------------------------- MessageHashTest

def test_message_hash_sha384_and_invalid(spark):
    """MessageHashTest: hash replaces the column in place; an unknown
    algorithm (SHA-385) raises."""
    import hashlib
    import pytest as _pytest

    from wrangler_spark.errors import UsageError
    msg = "This is a very secret message and a digest will be created."
    df = spark.createDataFrame([(msg,)], "message1 string")
    ok, _ = execute(spark, ["hash message1 SHA-384 true"], df)
    assert ok.first()["message1"] == hashlib.sha384(msg.encode()).hexdigest()
    with _pytest.raises(UsageError):
        execute(spark, ["hash message1 SHA-385 true"], df)


# ------------------------------------------------------ SetHeaderTest

def test_set_header_empty_names_raise(spark):
    """SetHeaderTest: empty names from leading, doubled or trailing
    commas are compile-time errors (RecipeException in the reference)."""
    import pytest as _pytest

    from wrangler_spark.errors import UsageError
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    for bad in ["set-header ,A,B", "set-header A,B, ,D",
                "set-header A,B,D,", "set-header A,B,D,,"]:
        with _pytest.raises(UsageError):
            execute(spark, [bad], df)
    ok, _ = execute(spark, ["set-header A,B,D"], df)
    assert ok.columns == ["A", "B", "D"]


# ------------------------------------------------------- StemmingTest

def test_stemming_array_column(spark):
    """StemmingTest.testStemming: Porter over an array column, exact
    reference expectations."""
    words = ["how", "are", "you", "doing", "do", "you", "have", "apples"]
    df = spark.createDataFrame([(words,)], "words array<string>")
    ok, _ = execute(spark, ["stemming words"], df)
    assert ok.first()["words_porter"] == [
        "how", "ar", "you", "do", "do", "you", "have", "appl"
    ]


# -------------------- CleanseColumnNames / ColumnsReplace / CreateRecord

def test_cleanse_column_names_exact(spark):
    """CleanseColumnNamesTest: lowercase + non-alnum -> underscore."""
    df = spark.createDataFrame([("1", "2", "3", "4", "5")],
                               "`COL1` string, `col:2` string, `Col3` string, "
                               "`COLUMN4` string, `col!5` string")
    ok, _ = execute(spark, ["cleanse-column-names"], df)
    assert ok.columns == ["col1", "col_2", "col3", "column4", "col_5"]


def test_columns_replace_exact(spark):
    """ColumnsReplaceTest: sed s/^data_//g over column names — only the
    anchored prefix strips, inner data_ stays."""
    df = spark.createDataFrame(
        [(1, 2, 3, 4, 5, 6)],
        "data_a int, data_b int, data_timestamp int, data_data_confuse int, "
        "no_data int, whatever int",
    )
    ok, _ = execute(spark, ["columns-replace s/^data_//g"], df)
    assert ok.columns == ["a", "b", "timestamp", "data_confuse", "no_data", "whatever"]


def test_create_and_flatten_record_roundtrip(spark):
    """CreateRecordTest + FlattenRecordTest: create-record packs
    columns into a struct; flatten-record unpacks to prefixed columns."""
    df = spark.createDataFrame([("A", "B", "C")], "col1 string, col2 string, col3 string")
    ok, _ = execute(spark, ["create-record :result :col1, :col2, :col3"], df)
    r = ok.first()
    assert r["result"]["col1"] == "A" and r["result"]["col3"] == "C"
    ok2, _ = execute(spark, [
        "create-record :struct :col1, :col2, :col3",
        "keep :struct",
        "flatten-record :struct",
    ], df)
    r2 = ok2.first()
    assert (r2["struct_col1"], r2["struct_col2"], r2["struct_col3"]) == ("A", "B", "C")


# ----------------------------- RowConditionFilter / RowRegexFilter

def test_filter_row_if_true_string_numeric(spark):
    """RowConditionFilterTest: `filter-row-if-true Fare < 10` over
    string-typed CSV columns — the numeric comparison coerces."""
    df = spark.createDataFrame(
        [('1,0,3,"Braund, Mr. Owen Harris",male,22,1,0,A/5 21171,7.25,,S',),
         ('2,1,1,"Cumings, Mrs. John Bradley (Florence Briggs Thayer)",female,'
          '38,1,0,PC 17599,71.2833,C85,C',)],
        "body string",
    )
    ok, _ = execute(spark, [
        "parse-as-csv body ,",
        "drop body",
        "set columns PassengerId,Survived,Pclass,Name,Sex,Age,SibSp,Parch,Ticket,Fare,Cabin,Embarked",
        "filter-row-if-true Fare < 10",
    ], df)
    rows = ok.collect()
    assert len(rows) == 1 and rows[0]["PassengerId"] == "2"


def test_filter_by_regex_chain(spark):
    """RowRegexFilterTest: chained if-matched regex filters plus the v1
    filter-rows-on regex-match form."""
    data = [
        "1098,Root,Joltie,01/26/1956,root@joltie.io,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",
        "1091,Root,Harris,01/26/1956,root@mars.com,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",
        "1092,Root,Joltie,01/26/1956,NULL,32,11.79,150 Mars Ave,Palo Alto,CA,USA,32826",
    ]
    df = spark.createDataFrame([(d,) for d in data], "__col string")
    ok, _ = execute(spark, [
        "parse-as-csv __col ,",
        "drop __col",
        "set columns id,first,last,dob,email,age,hrlywage,address,city,state,country,zip",
        "filter-by-regex if-matched :email 'NULL'",
        "filter-by-regex if-matched :email '.*@joltie.io'",
        "filter-rows-on regex-match last .*(?i)harris.*",
    ], df)
    rows = ok.collect()
    assert len(rows) == 0  # every row matches one of the filters


# ------------------------------------ WriteAsCSV / WriteAsJsonMap

def test_write_as_csv_and_json_map(spark):
    """WriteAsCSVTest / WriteAsJsonMapTest: serialize the full row."""
    import json
    df = spark.createDataFrame(
        [("http://www.yahoo.com?a=b c&b=ab&xyz=1", 1, 1.8)],
        "url string, i1 int, d1 double",
    )
    ok, _ = execute(spark, ["copy url u2 true", "write-as-csv test", "keep test"], df)
    line = ok.first()["test"]
    assert line == "http://www.yahoo.com?a=b c&b=ab&xyz=1,1,1.8,http://www.yahoo.com?a=b c&b=ab&xyz=1"
    # a value containing the delimiter must quote
    df_c = spark.createDataFrame([("a,b", 1)], "s string, i int")
    okc, _ = execute(spark, ["write-as-csv t", "keep t"], df_c)
    assert okc.first()["t"] == '"a,b",1' 
    ok2, _ = execute(spark, ["write-as-json-map test", "keep test"], df)
    m = json.loads(ok2.first()["test"])
    assert m["url"].startswith("http://") and m["i1"] == 1 and abs(m["d1"] - 1.8) < 1e-9


def test_write_as_json_object_selected(spark):
    """WriteAsJsonObjectTest: pack selected columns into one object."""
    import json
    df = spark.createDataFrame([(37.77, -122.41, "sf")],
                               "latitude double, longitude double, name string")
    ok, _ = execute(spark, [
        "write-as-json-object coordinates latitude,longitude",
        "keep coordinates",
    ], df)
    o = json.loads(ok.first()["coordinates"])
    assert abs(o["latitude"] - 37.77) < 1e-9 and abs(o["longitude"] + 122.41) < 1e-9


# --------------------------------------------------- FormatDateTimeTest

def test_format_datetime_patterns(spark):
    """FormatDateTimeTest: all four reference patterns, including the
    DateTimeFormatter optional section [xxx] over a zone-less datetime
    and the yyyyMMdd h:mm a AM/PM form."""
    import datetime
    ldt = datetime.datetime(2000, 8, 22, 20, 36, 45)
    df = spark.createDataFrame(
        [(ldt, ldt, ldt, ldt)],
        "col1 timestamp_ntz, col2 timestamp_ntz, col3 timestamp_ntz, col4 timestamp_ntz",
    )
    ok, _ = execute(spark, [
        'format-datetime :col1 "MM/dd/yyyy HH:mm"',
        'format-datetime :col2 "yyyy-MM-dd\'T\'HH:mm:ss"',
        'format-datetime :col3 "yyyy-MM-dd\'T\'HH:mm:ss[xxx]"',
        'format-datetime :col4 "yyyyMMdd h:mm a"',
    ], df)
    r = ok.first()
    assert r["col1"] == "08/22/2000 20:36"
    assert r["col2"] == "2000-08-22T20:36:45"
    assert r["col3"] == "2000-08-22T20:36:45"
    assert r["col4"] == "20000822 8:36 PM"


# ------------------------------------------------ LineageOperationsTest

def test_column_lineage_operations(spark):
    """LineageOperationsTest.testDropLineage / testColumnExpression /
    testIdentityLineage: per-directive field operations — inputs read,
    columns added and dropped."""
    from wrangler_spark.recipe.compiler import compile_recipe

    df = spark.createDataFrame(
        [(1, 2, 3, 4, 5)], "a int, b int, c int, d int, h int"
    )
    recipe = compile_recipe(["drop a,b,c,d", "set-column :o exp:{h * 2}"],
                            hoist_filters=False)
    ops = recipe.lineage(df)
    assert len(ops) == 2
    assert ops[0]["directive"] == "drop"
    assert sorted(ops[0]["dropped"]) == ["a", "b", "c", "d"]
    assert ops[1]["directive"] == "set-column"
    assert ops[1]["inputs"] == ["h"] and ops[1]["added"] == ["o"]
    # identity: a no-op recipe reads nothing, changes nothing
    ident = compile_recipe(["uppercase :a"], hoist_filters=False).lineage(df)
    assert ident[0]["inputs"] == ["a"] and ident[0]["added"] == [] and ident[0]["dropped"] == []


# ------------------------------------------- v1 grammar breadth (Migrator)

def test_v1_grammar_full_surface_compiles(spark):
    """GrammarMigratorTest's full v1 statement list: every statement
    parses and resolves to a registered directive (compile-level —
    the migrator's output surface is the v2 grammar we execute)."""
    from wrangler_spark.recipe import registry
    from wrangler_spark.recipe.parser import parse_recipe
    stmts = [
        "set column salary salary > 100 ? 100 : salary",
        "set columns fname,lname,address,city,state,country,zipcode",
        "rename body_fname fname", "set-type value int",
        "drop fname,lname,address,zipcode,city", "merge fname lname name ,",
        "uppercase name", "lowercase name", "titlecase name",
        "indexsplit department 1 10 zone", "split name , fname lname",
        "filter-row-if-matched address .*?", "filter-row-if-not-matched address .*?",
        "filter-row-if-true age < 10.0",
        "filter-row-if-false age < 10.0 && gender == 'm'",
        "set-variable test count > 10", "increment-variable test 1 count > 10",
        "mask-number ssn xxx-xx-####", "mask-shuffle address",
        "format-date startdate yyyy-MM-dd",
        "format-unix-timestamp timestamp yyyy/MM/dd",
        "quantize col1 col2 1:2=test,3:4=test1", "find-and-replace name s/test//g",
        "parse-as-csv body , true", "parse-as-json body 1",
        "parse-as-protobuf body test event 1.0", "json-path source target a/b/c",
        "set-charset body utf-8",
        "invoke-http http://a.b/json fname,lname,address a=b,x=y",
        "set-record-delim body , 10", "parse-as-fixed-length body 3,4,5,6,7,8 #",
        "split-to-rows body ,", "split-to-columns body ,",
        "parse-xml-to-json body 1", "parse-as-xml xml",
        "xpath name fname /items/item/first_name",
        "xpath-array name fname /items/item/first_name",
        "flatten a,b,c,d", "copy source target true", "fill-null-or-empty value ,",
        "cut-character phone areacode 1-3", "generate-uuid ssn",
        "url-encode url", "url-decode url", "parse-as-log body %m-%y-%{HOSTNAME}",
        "parse-as-date date UTC", "parse-as-simple-date date yyyy-MM-dd",
        "diff-date date1 date2 diffdate", "keep fname,lname,address,city,zipcode",
        "parse-as-hl7 body 1", "split-email email", "swap col1 col2",
        "hash col SHA1 true", "write-as-json-map output",
        "write-as-json-object output fname,lname,address", "write-as-csv output",
        "parse-as-avro-file body", "send-to-error Fare < 8.06", "fail Fare < 8.06",
        "text-distance abc col1 col2 output", "text-metric abc col1 col2 output",
        "catalog-lookup ICD-9 value", "table-lookup value mylookup-table",
        "stemming text", "columns-replace s/body_//g",
        "extract-regex-groups body s/body_//g", "split-url url",
        "cleanse-column-names", "change-column-case upper",
        "set-column value output > 10 ? 'test' : 'non-test'",
        "encode base64 binary", "decode base64 binary",
        "trim name", "ltrim name", "rtrim name",
    ]
    for s in stmts:
        for c in parse_recipe([s]):
            registry.lookup(c.name)


def test_parse_as_xml_and_xpath(spark):
    """XPATH / XPATH-ARRAY / PARSE-AS-XML (reference cheatsheet +
    MigrateToV2.java:439-459): element text, attribute form, array
    form, and malformed-XML error routing."""
    xml = ('<items><item id="1"><first_name>Root</first_name></item>'
           '<item id="2"><first_name>Joltie</first_name></item></items>')
    df = spark.createDataFrame([(xml,), ("<bad",)], "name string")
    ok, err = execute(spark, [
        "parse-as-xml name",
        "xpath name fname /items/item/first_name",
        "xpath-array name all /items/item/first_name",
        "xpath name first_id /items/item/@id",
    ], df)
    r = ok.first()
    assert r["fname"] == "Root"
    assert r["all"] == ["Root", "Joltie"]
    assert r["first_id"] == "1"
    assert ok.count() == 1 and err.count() == 1


# ------------------------------------------- ConfigDirectiveContextTest

_DIRECTIVE_CONFIG = {
    "exclusions": ["parse-as-csv", "parse-as-excel", "set", "invoke-http", "js-parser"],
    "aliases": {"json-parser": "parse-as-json", "js-parser": "parse-as-json"},
}


def test_directive_config_exclusions_and_aliases(spark):
    """ConfigDirectiveContextTest: excluded directives fail compilation
    (including an excluded alias), a non-excluded alias rewrites to its
    target, and an empty config changes nothing."""
    import pytest as _pytest

    from wrangler_spark.errors import UsageError
    from wrangler_spark.recipe.compiler import compile_recipe
    with _pytest.raises(UsageError):
        compile_recipe(["parse-as-csv body , true"], config=_DIRECTIVE_CONFIG)
    with _pytest.raises(UsageError):
        compile_recipe(["js-parser body"], config=_DIRECTIVE_CONFIG)
    r = compile_recipe(["json-parser body"], config=_DIRECTIVE_CONFIG)
    assert r.names == ["parse-as-json"]
    df = spark.createDataFrame([('{"a": 5}',)], "body string")
    ok, _ = r.apply(df)
    assert ok.first()["body_a"] == 5
    r2 = compile_recipe(["parse-as-csv body , true"], config={})
    assert r2.names == ["parse-as-csv"]


# --------------------------------------------- RecipePipelineExecutorTest

def test_pipeline_executor_end_to_end(spark):
    """RecipePipelineExecutorTest.testPipeline: parse → drop → set
    columns → rename → drop, output schema and values."""
    df = spark.createDataFrame([("a,b,c,d,e,f,1.0",)], "__col string")
    ok, _ = execute(spark, [
        "parse-as-csv __col ,",
        "drop __col",
        "set columns a,b,c,d,e,f,g",
        "rename a first",
        "drop b",
    ], df)
    assert ok.columns == ["first", "c", "d", "e", "f", "g"]
    r = ok.first()
    assert (r["first"], r["c"], r["g"]) == ("a", "c", "1.0")


# --------------------------------------------- GrammarBasedParserTest

def test_grammar_pragmas_macros_comments(spark):
    """GrammarBasedParserTest.testBasic / testCommentOnlyRecipe: version
    pragma ignored, load-directives collected, ${macro} statements
    tolerated at parse time (2 real directives), comment-only recipe
    parses to nothing."""
    from wrangler_spark.recipe.parser import parse_recipe
    calls = parse_recipe([
        "#pragma version 2.0;",
        "rename :col1 :col2",
        "parse-as-csv :body ',' true;",
        "#pragma load-directives text-reverse, text-exchange;",
        "${macro} ${macro_2}",
        "${macro_${test}}",
    ])
    assert [c.name for c in calls] == ["rename", "parse-as-csv"]
    assert calls[0].pragmas.get("load_directives") == ["text-reverse", "text-exchange"]
    assert len(calls[0].pragmas.get("macros")) == 2
    assert parse_recipe(["// test"]) == []


# ---------------------------------------------- ParseSimpleDateTest

def test_parse_simple_date_all_patterns(spark):
    """ParseSimpleDateTest.testSimpleDateParser: all 12 SimpleDateFormat
    patterns, timezone-bearing values normalized to UTC instants."""
    cases = [
        ("yyyy.MM.dd G 'at' HH:mm:ss z", "2001.07.04 AD at 12:08:56 PDT",
         "2001-07-04 19:08:56"),
        ("EEE, MMM d, ''yy", "Wed, Jul 4, '01", "2001-07-04 00:00:00"),
        ("h:mm a", "12:08 PM", "1970-01-01 12:08:00"),
        ("hh 'o''clock' a, zzzz", "12 o'clock PM, Pacific Daylight Time",
         "1970-01-01 19:00:00"),
        ("K:mm a, z", "0:08 PM, PDT", "1970-01-01 19:08:00"),
        ("yyyy.MMMMM.dd GGG hh:mm aaa", "2001.July.04 AD 12:08 PM",
         "2001-07-04 12:08:00"),
        ("EEE, d MMM yyyy HH:mm:ss Z", "Wed, 4 Jul 2001 12:08:56 -0700",
         "2001-07-04 19:08:56"),
        ("yyMMddHHmmssZ", "010704120856-0700", "2001-07-04 19:08:56"),
        ("yyyy-MM-dd'T'HH:mm:ss.SSSZ", "2001-07-04T12:08:56.235-0700",
         "2001-07-04 19:08:56.235000"),
        ("yyyy-MM-dd'T'HH:mm:ss.SSSXXX", "2001-07-04T12:08:56.235-07:00",
         "2001-07-04 19:08:56.235000"),
        ("MM/dd/yyyy HH:mm", "07/04/2001 12:09", "2001-07-04 12:09:00"),
        ("yyyy.MM.dd", "2001.07.04", "2001-07-04 00:00:00"),
    ]
    for fmt, val, expected in cases:
        df = spark.createDataFrame([(val,)], "col string")
        q = fmt.replace('"', '\\"')
        ok, _ = execute(spark, [f'parse-as-simple-date :col "{q}"'], df)
        got = str(ok.first()["col"])
        assert got == expected, (fmt, got, expected)
