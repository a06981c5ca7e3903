"""Reference e2e golden-file mirror (round-4 verdict task #4): replay
the Cucumber feature recipes from
`/root/reference/wrangler-transform/src/e2e-test` — the reference's
only FULL-PIPELINE golden outputs — against its
BQValidationExpectedFiles, end to end through this engine's recipe
compiler.

Each case is (input rows from BQtesdata/BigQuery/BigQueryInsertData*,
recipe from testData/Wrangler/*-cdap-data-pipeline.json, expected JSONL
from BQValidationExpectedFiles/Directive_*). The comparison is an
unordered multiset of canonicalized rows.

Canonicalization (the BQ adapter, documented per rule):
- numbers compare as floats rounded to 5 significant decimals (BQ
  round-trips REPEATED/FLOAT through float32 in places — e.g. the
  xmltojson `distance2` golden value is float32(5/14));
- strings that parse as JSON objects/arrays compare parsed (BQ stores
  nested records as JSON; Spark-side they are JSON strings or structs);
- timestamps/datetimes compare on ISO text (Z-suffixed when tz-aware);
- columns excluded from a case are listed WITH the reason (e.g.
  `current-datetime` depends on the run date; `mask-shuffle` is
  seeded random with no cross-engine value contract — its category
  contract is asserted instead).
"""

import base64
import datetime as _dt
import json
import math
import os
import re

import pytest

from wrangler_spark import execute

REF = "/root/reference/wrangler-transform/src/e2e-test/resources"
GOLD = os.path.join(REF, "BQValidationExpectedFiles")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD), reason="reference e2e resources not present"
)


# ------------------------------------------------------------- helpers
def load_expected(name, exclude=()):
    rows = []
    buf = ""
    for raw in open(os.path.join(GOLD, name), encoding="utf-8"):
        buf += raw
    # files are JSONL but not always newline-terminated between objects
    dec = json.JSONDecoder()
    i, n = 0, len(buf)
    while i < n:
        while i < n and buf[i] in " \r\n\t":
            i += 1
        if i >= n:
            break
        obj, j = dec.raw_decode(buf, i)
        rows.append(obj)
        i = j
    return [_canon_row(r, exclude) for r in rows]


def _canon_val(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return round(f, 5)
    if isinstance(v, _dt.datetime):
        # Z-suffix dropped on BOTH sides: Spark collect() returns
        # tz-naive datetimes under the UTC session for TIMESTAMP and
        # TIMESTAMP_NTZ alike, so the instant-vs-local marker carries
        # no signal here; the VALUES still compare exactly.
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        s = v.isoformat()
        return re.sub(r"\.?0*$", "", s) if "." in s else s
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", "replace")
    if isinstance(v, dict):
        return {k: _canon_val(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_canon_val(x) for x in v]
    if isinstance(v, str):
        s = v.strip()
        if (s.startswith("{") and s.endswith("}")) or (
            s.startswith("[") and s.endswith("]")
        ):
            try:
                return _canon_val(json.loads(s))
            except (ValueError, TypeError):
                pass
        # ISO instant text ("2021-01-21T00:00:00Z" et al) — normalize
        m = re.fullmatch(
            r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(\.\d+)?(Z|[+-]00:00)?", v
        )
        if m:
            frac = (m.group(2) or "").rstrip("0").rstrip(".")
            return m.group(1) + frac
        return v
    return v


def _canon_row(d, exclude=()):
    return {
        k: _canon_val(v)
        for k, v in d.items()
        if k not in exclude and v is not None
    }


def run_case(spark, schema, rows, recipe, exclude=()):
    df = spark.createDataFrame(rows, schema)
    ok, _err = execute(spark, recipe, df)
    got = []
    for r in ok.collect():
        got.append(_canon_row(r.asDict(recursive=True), exclude))
    return got


def assert_rows_equal(got, want):
    key = lambda r: json.dumps(r, sort_keys=True, default=str)  # noqa: E731
    gs, ws = sorted(map(key, got)), sorted(map(key, want))
    assert gs == ws, (
        "golden mismatch:\nGOT:\n  " + "\n  ".join(gs) + "\nWANT:\n  " + "\n  ".join(ws)
    )


def recipe_of(pipeline_json):
    d = json.load(
        open(os.path.join(REF, "testData", "Wrangler", pipeline_json), encoding="utf-8")
    )
    for st in d["config"]["stages"]:
        if st["plugin"]["name"] == "Wrangler":
            return [
                ln
                for ln in st["plugin"]["properties"]["directives"].splitlines()
                if ln.strip()
            ]
    raise AssertionError("no Wrangler stage")


# ------------------------------------------------------------- cases
def test_golden_parse_csv(spark):
    recipe = recipe_of("parse_csv_wrangle-cdap-data-pipeline.json")
    rows = [("C#12,ronnie,root,1",), ("D#34,aman,,2",), ("L#89,adam,joy,3",)]
    got = run_case(spark, "body string", rows, recipe)
    assert_rows_equal(got, load_expected("Directive_parse_csv"))


def test_golden_parse_timestamp(spark):
    recipe = recipe_of("parse_timestamp_wrangle-cdap-data-pipeline.json")
    rows = [
        ("2021-01-21", "2002-03-23", 1536332271892, "$1"),
        ("2022-01-22", "2004-03-24", 1536332271896, "$2"),
        ("2023-01-23", "2002-05-26", 1536332271898, "$3"),
    ]
    got = run_case(
        spark,
        "create_date string, update_date string, time long, price string",
        rows,
        recipe,
    )
    assert_rows_equal(got, load_expected("Directive_parse_Timestamp"))


def test_golden_parse_datetime(spark):
    # `create_date` excluded: current-datetime — the golden value is the
    # YEAR THE REFERENCE SUITE RAN ("2024"); any engine run later can
    # only diverge. Asserted instead: it parses as a plausible year.
    recipe = recipe_of("parse_datetime_wrangler-cdap-data-pipeline.json")
    rows = [
        (1, "2021-01-21", "2006-02-18T05:03:42Z[UTC]"),
        (2, "2022-02-22", "2007-01-18T04:03:22Z[UTC]"),
        (3, "2023-03-23", "2008-07-19T08:04:22Z[UTC]"),
    ]
    df = spark.createDataFrame(rows, "id long, create_date string, timestamp string")
    ok, _ = execute(spark, recipe, df)
    out = [r.asDict(recursive=True) for r in ok.collect()]
    for r in out:
        assert int(r["create_date"]) >= 2024, "current-datetime year sanity"
    got = [_canon_row(r, exclude=("create_date",)) for r in out]
    want = load_expected("Directive_parse_DateTime", exclude=("create_date",))
    # golden id is STRING (BQ exported); ours is long — align
    for r in got:
        r["id"] = str(r.pop("id")).rstrip(".0") or "0"
    assert_rows_equal(got, want)


def test_golden_parse_fixedlength(spark):
    recipe = recipe_of("parse_fixedlength_wrangler-cdap-data-pipeline.json")
    rows = [
        ("http://example.com:80/docs/books/tutorial/index.html?name=networking#DOWNLOADING", "21  10  ABCXYZ"),
        ("http://geeks.com:80/docs/chair/tutorial/index.html?name=networking#DOWNLOADING", "19  13  ABCXYZ"),
        ("http://amazing.com:80/docs/tables/tutorial/index.html?name=networking#DOWNLOADING", "18  14  CDEFGH"),
    ]
    got = run_case(spark, "url string, fixedlength string", rows, recipe)
    assert_rows_equal(got, load_expected("Directive_parse_fixedlength"))


def test_golden_parse_json(spark):
    recipe = recipe_of("parse_json_wrangler1-cdap-data-pipeline.json")
    rows = [
        (" hello abc", '{"id": 1, "name": {"first": "Root", "last": "joy"}, "age": 22, "pet": "nick", "height": 5.8}'),
        ("hello def", '{"id": 2, "name": {"first": "dded", "last": "share"}, "age": 23, "pet": "hello", "height": 6.8}'),
        ("hello ghi", '{"id": 3, "name": {"first": "Root", "last": "Joltie"}, "age": 24, "pet": "doms", "height": 7.8}'),
    ]
    got = run_case(spark, "body string, json string", rows, recipe)
    assert_rows_equal(got, load_expected("Directive_parse_json"))


def test_golden_parse_xmltojson(spark):
    recipe = recipe_of("parse_xmltojson_wrangler-cdap-data-pipeline (1).json")
    rows = [
        ("abc01@mail.com", "<?xml version=1.0 encoding=UTF-8?> <note> <to>Tove</to> <from>Tani</from> <heading>Reminder</heading> <body>Dont forget me this week!</body> </note>"),
        ("def02@mail.com", "<?xml version=1.0 encoding=UTF-8?> <note> <to>Tove</to> <from>joy</from> <heading>Reminder</heading> <body>Dont forget us this holiday!</body> </note>"),
        ("ghi03@mail.com", "<?xml version=1.0 encoding=UTF-8?> <note> <to>Tove</to> <from>shree</from> <heading>Reminder</heading> <body>Dont forget him this weekend!</body> </note>"),
    ]
    got = run_case(spark, "email string, xmldata string", rows, recipe)
    assert_rows_equal(got, load_expected("Directive_parse_xmltojson"))


def test_golden_parse_avro(spark):
    recipe = recipe_of("parseAsAvro-cdap-data-pipeline (1).json")
    b64 = re.search(
        r'FROM_BASE64\("([^"]+)"\)',
        open(
            os.path.join(REF, "BQtesdata", "BigQuery", "BigQueryInsertDataQueryAvro.txt"),
            encoding="utf-8",
        ).read(),
    ).group(1)
    rows = [(bytearray(base64.b64decode(b64)),)]
    got = run_case(spark, "body binary", rows, recipe)
    assert_rows_equal(got, load_expected("Directive_parse_avro"))


def test_golden_parse_excel(spark):
    recipe = recipe_of("parse_excel_wrangler_copy-cdap-data-pipeline.json")
    xlsx = open(
        os.path.join(REF, "BQtesdata", "BigQuery", "test1.xlsx"), "rb"
    ).read()
    rows = [(bytearray(xlsx),)]
    got = run_case(spark, "body binary", rows, recipe)
    assert_rows_equal(got, load_expected("Directive_parse_excel"))


def test_golden_parse_hl7(spark):
    # `Body` excluded: `hash :Body MD5` + `set-type :Body string` turns
    # raw digest BYTES into a lossily-decoded string — the golden file
    # holds BQ's UTF-8-replacement rendering of those bytes, which does
    # not round-trip through JSON text equality; the MD5 path itself is
    # pinned byte-exact by the JUnit mirror waves. `Body_hl7_MSH_9_1`
    # excluded: mask-shuffle is seeded random with no cross-engine
    # value contract — its category contract (3 uppercase letters,
    # same shape as the source field) is asserted directly instead.
    recipe = recipe_of("parse_HL7_Wrangler-cdap-data-pipeline (1).json")
    rows = [
        ("address1", "MSH|^~?2||.|||199908180016||ADT^A04|ADT.1.1698593|P|3"),
        ("address2", "MSH|^~?2||.|||199908180016||BSC^A04|ADT.1.1698593|P|4"),
        ("", "MSH|^~?2||.|||199908180016||JKL^A04|ADT.1.1698593|P|5"),
    ]
    df = spark.createDataFrame(rows, "address string, Body string")
    ok, _ = execute(spark, recipe, df)
    out = [r.asDict(recursive=True) for r in ok.collect()]
    for r in out:
        assert re.fullmatch(r"[A-Z]{3}", r["Body_hl7_MSH_9_1"]), (
            "mask-shuffle category contract (3 uppercase letters)"
        )
    exclude = ("Body", "Body_hl7_MSH_9_1")
    got = [_canon_row(r, exclude) for r in out]
    assert_rows_equal(got, load_expected("Directive_parse_hl7", exclude))


def test_golden_parse_log(spark):
    recipe = recipe_of("parse_log_wrangler_copy-cdap-data-pipeline.json")
    rows = [
        (1, '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'),
    ]
    got = run_case(spark, "id long, body string", rows, recipe)
    assert_rows_equal(got, load_expected("Directive_parse_log"))


def test_golden_wrangler_groupby(spark):
    """The BQ2BQwithWrnglerNGrpby pipeline: wrangler recipe (drop /
    uppercase / int-wrapping set-type / find-and-replace / JEXL length
    + regex-match + null filters) followed by the GroupByAggregate
    plugin stage (groupByFields city,firstname,lastname,state,zipcode,
    id; aggregates cityFirst:First(city)) — reproduced as a Spark
    groupBy over the recipe output."""
    from pyspark.sql import functions as F

    recipe = recipe_of("BQ2BQwithWrnglerNGrpby-cdap-data-pipeline (1).json")
    rows = [
        ("5", "Frank", "Underwood", "1609 Far St.", "San Diego", "CA", 2977876770, 19061512345),
        ("1", "Douglas", "Williams", "1 Vista Montana", "San Jose", "CA", 9513498885, 35834612345),
        ("4", "Walter", "White", "3828 Piermont Dr", "Orlando", "FL", 7349864532, 7829812345),
        ("3", "Hugh", "Jackman", "5, Cool Way", "Manhattan", "NY", 6726312345, 1695412345),
        ("7", "Sarthak", "Dash", "123 Far St.", "New York", "NY", 2345365523, 1324812345),
        ("6", "Serena", "Woods", "123 Far St.", "Las Vegas", "NV", 4533456734, 78919612345),
        ("2", "David", "Johnson", "3 Baypointe Parkway", "Houston", "TX", 1738378970, 1451412345),
        ("8", "Rahul", "Dash", "22 MG Road.", "Bangalore", "KA", None, 94864612345),
    ]
    df = spark.createDataFrame(
        rows,
        "id string, firstname string, lastname string, streetAddress string, "
        "city string, state string, zipcode long, phoneNumber long",
    )
    ok, _ = execute(spark, recipe, df)
    out = ok.groupBy(
        "city", "firstname", "lastname", "state", "zipcode", "id"
    ).agg(F.first("city").alias("cityFirst"))
    got = [_canon_row(r.asDict(recursive=True)) for r in out.collect()]
    assert_rows_equal(got, load_expected("Directive_wrangler_GroupBy"))
