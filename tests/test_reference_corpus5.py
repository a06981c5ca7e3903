"""Fifth wave of reference JUnit mirrors: the binary-resource tests —
parse-as-excel against the reference's own titanic.xlsx /
date-formats-test-sheet.xlsx (ParseExcelTest.java) and the exotic
httpd LogFormat line (ParseLogTest.java). The xlsx resources are read
from the reference checkout as INPUT DATA (behavioral spec), nothing
else crosses."""

import pytest

from wrangler_spark import execute

RES = "/root/reference/wrangler-core/src/test/resources"


def _payload_df(spark, path):
    with open(path, "rb") as f:
        data = f.read()
    return spark.createDataFrame([(bytearray(data),)], "body binary")


def test_parse_excel_titanic(spark):
    """ParseExcelTest.testBasicExcel: 892 rows off sheet 0, first row
    fwd==0 / bkd==891; columns are Excel letters."""
    df = _payload_df(spark, f"{RES}/titanic.xlsx")
    ok, _ = execute(spark, ["parse-as-excel :body '0'"], df)
    rows = ok.collect()
    assert len(rows) == 892
    first = min(rows, key=lambda r: r["fwd"])
    assert first["fwd"] == 0 and first["bkd"] == 891
    assert first["A"] == "PassengerId" and first["B"] == "Survived"


def test_parse_excel_wrong_sheet_errors_row(spark):
    """ParseExcelTest.testNoSheetName: an unknown sheet NAME routes the
    payload row to the error channel — 0 results, 1 error (no silent
    fallback to sheet 0)."""
    df = _payload_df(spark, f"{RES}/titanic.xlsx")
    ok, err = execute(spark, ["parse-as-excel :body 'wrong_error'"], df)
    assert ok.count() == 0
    assert err is not None and err.count() == 1


def test_parse_excel_date_formats(spark):
    """ParseExcelTest.testDateFormatting: every date-styled cell in
    column A renders as its expected display string in column B —
    dd/mm/yyyy, d mmmm yyyy (escaped literals), dddd weekday names,
    and the ';@' text-section suffix never leaks."""
    df = _payload_df(spark, f"{RES}/date-formats-test-sheet.xlsx")
    ok, _ = execute(spark, ["parse-as-excel :body '0'"], df)
    rows = ok.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["A"] == r["B"], (r["A"], r["B"])


LOG_DIRECTIVE = (
    "parse-as-log body %t %u [%D %h %{True-Client-IP}i %{UNIQUE_ID}e %r] "
    '%{Cookie}i %s "%{User-Agent}i" "%{host}i" %l %b %{Referer}i'
)

LOG_LINE = (
    "[02/Dec/2013:14:10:30 -0000] - [52075 10.102.4.254 177.43.52.210 "
    "UpyU1gpmBAwAACfd5W0AAAAW GET /SS14-VTam-ny_019.jpg.rendition.zoomable.jpg "
    "HTTP/1.1] hsfirstvisit=http%3A%2F%2Fwww.domain.com%2Fen-us||1372268254000; "
    "has_js=1; USER_GROUP=julinho%3Afalse 200 "
    '"Mozilla/5.0 (Windows NT 6.2; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) '
    'Chrome/31.0.1650.57 Safari/537.36" "www.domain.com" - 463952 '
    "http://www.domain.com/content/report/shows/New_York/KSHK/trip/s_s_14_ny_ww/sheers.html"
)


def test_parse_log_exotic_format(spark):
    """ParseLogTest.testLogParsing's directive: header (%{...}i), env
    (%{...}e) and bracketed-literal tokens all bind; every one of the
    14 token groups extracts the right substring. (The reference's
    width of 91 counts nl.basjes DISSECTOR-derived sub-columns —
    per-cookie fields, timestamp decomposition; this engine scopes
    parse-as-log to the token groups, with downstream directives for
    derivation.)"""
    df = spark.createDataFrame([(LOG_LINE,)], "body string")
    ok, _ = execute(spark, [LOG_DIRECTIVE, "drop body"], df)
    row = ok.collect()[0]
    assert len(ok.columns) == 14
    assert row["request_time"] == "02/Dec/2013:14:10:30 -0000"
    assert row["remote_user"] == "-"
    assert row["response_time_us"] == "52075"
    assert row["remote_host"] == "10.102.4.254"
    assert row["header_true_client_ip"] == "177.43.52.210"
    assert row["env_unique_id"] == "UpyU1gpmBAwAACfd5W0AAAAW"
    assert row["request_line"].startswith("GET /SS14-VTam")
    assert row["header_cookie"].startswith("hsfirstvisit=")
    assert row["status_code"] == "200"
    assert row["header_user_agent"].startswith("Mozilla/5.0 (Windows NT 6.2")
    assert row["header_host"] == "www.domain.com"
    assert row["remote_logname"] == "-"
    assert row["response_size"] == "463952"
    assert row["header_referer"].endswith("sheers.html")


def test_parse_log_common_format(spark):
    """ParseLogTest.testCommonLogFormat."""
    df = spark.createDataFrame(
        [('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
          '"GET /apache_pb.gif HTTP/1.0" 200 2326',)],
        "body string",
    )
    ok, _ = execute(
        spark, ['parse-as-log body %h %l %u %t "%r" %>s %b', "drop body"], df
    )
    row = ok.collect()[0]
    assert row["remote_host"] == "127.0.0.1"
    assert row["remote_user"] == "frank"
    assert row["status_code"] == "200"
    assert row["response_size"] == "2326"


# --------------------------------------------------- ParseAvroFileTest


def test_parse_avro_file_payload(spark):
    """ParseAvroFileTest.testParseAsAvroFile over the reference's own
    cdap-log.avro: 1689 records, 15 fields, first/last timestamps
    1495172588118 / 1495194308245."""
    df = _payload_df(spark, f"{RES}/cdap-log.avro")
    ok, _ = execute(spark, ["parse-as-avro-file body"], df)
    rows = ok.collect()
    assert len(rows) == 1689
    # the reference's Row is a per-record dynamic bag (row 0 has width
    # 15); a DataFrame's schema is the union of the bags — assert row
    # 0's 15 reference columns lead the union in first-seen order
    assert ok.columns[:15] == [
        "timestamp", "level", "mdc", "marker", "threadName", "message",
        "argumentArray", "formattedMessage", "loggerName",
        "loggerContextVO_name", "loggerContextVO_propertyMap",
        "loggerContextVO_birthTime", "throwableProxy", "hasCallerData",
        "callerData",
    ]
    ts = sorted(r["timestamp"] for r in rows)
    assert ts[0] == 1495172588118
    assert ts[-1] == 1495194308245


def test_parse_avro_file_bad_payload(spark):
    """ParseAvroFileTest.testIncorrectType: non-Avro bytes fail at
    compile (RecipeException)."""
    from wrangler_spark.errors import RecipeError

    df = spark.createDataFrame([(bytearray(b"failure"),)], "body binary")
    with pytest.raises(RecipeError):
        execute(spark, ["parse-as-avro-file body"], df)
