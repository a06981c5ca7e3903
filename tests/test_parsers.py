import pytest

from wrangler_spark import execute


def test_parse_as_csv_no_header(spark, one_col):
    df = one_col("1,root,joltie,01/26/1956,150.45")
    ok, _ = execute(spark, ["parse-as-csv :body ','"], df)
    r = ok.first()
    assert r["body_1"] == "1"
    assert r["body_5"] == "150.45"


def test_parse_as_csv_header(spark, one_col):
    df = one_col("id,name,city", "1,joe,sf", "2,ann,nyc")
    ok, _ = execute(spark, ["parse-as-csv :body ',' true", "drop :body"], df)
    assert set(ok.columns) == {"id", "name", "city"}
    assert ok.count() == 2
    assert sorted(r["name"] for r in ok.collect()) == ["ann", "joe"]


def test_parse_as_csv_quoted(spark, one_col):
    df = one_col('1,"a,b",c')
    ok, _ = execute(spark, ["parse-as-csv :body ','"], df)
    r = ok.first()
    assert r["body_2"] == "a,b"


def test_parse_as_json(spark, one_col):
    df = one_col('{"id":1,"name":{"first":"Root","last":"Joltie"},"age":22.5}')
    ok, _ = execute(spark, ["parse-as-json :body 1"], df)
    r = ok.first()
    assert r["body_id"] == 1
    assert r["body_age"] == 22.5
    # depth 1: nested object serialized as JSON string
    assert '"first"' in r["body_name"]


def test_parse_as_json_depth2(spark, one_col):
    df = one_col('{"id":1,"name":{"first":"Root","last":"Joltie"}}')
    ok, _ = execute(spark, ["parse-as-json :body 2"], df)
    r = ok.first()
    assert r["body_name_first"] == "Root"
    assert r["body_name_last"] == "Joltie"


def test_json_path(spark, one_col):
    df = one_col('{"a":{"b":[10,20]}}')
    ok, _ = execute(spark, ["json-path :body :out '$.a.b[1]'"], df)
    assert ok.first()["out"] == "20"


def test_parse_as_fixed_length(spark, one_col):
    df = one_col("AABBBBCCCCC")
    ok, _ = execute(spark, ["parse-as-fixed-length :body 2,4,5"], df)
    r = ok.first()
    assert (r["body_1"], r["body_2"], r["body_3"]) == ("AA", "BBBB", "CCCCC")


def test_parse_as_log(spark, one_col):
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    df = one_col(line)
    ok, _ = execute(spark, ["parse-as-log :body 'common'"], df)
    r = ok.first()
    # round-5: the 'common'/'combined' formats emit the reference's
    # httpdlog column surface (Directive_parse_log e2e golden pins the
    # full set; spot checks here incl. a tz pair and the ISO week)
    assert r["ip_connection_client_host"] == "127.0.0.1"
    assert r["string_request_status_last"] == "200"
    assert r["http_firstline_request_firstline"] == "GET /apache_pb.gif HTTP/1.0"
    assert r["string_connection_client_user"] == "frank"
    assert r["bytes_response_body_bytes_last"] == "2326"
    assert r["time_hour_request_receive_time_hour"] == "13"
    assert r["time_hour_request_receive_time_hour_utc"] == "20"
    assert r["time_epoch_request_receive_time_epoch"] == "971211336000"
    assert r["time_week_request_receive_time_weekofweekyear"] == "41"
    assert r["time_year_request_receive_time_weekyear"] == "2000"
    assert r["http_path_request_firstline_uri_path"] == "/apache_pb.gif"


def test_parse_as_simple_date(spark, one_col):
    df = one_col("12/10/2016")
    ok, _ = execute(spark, ["parse-as-simple-date :body MM/dd/yyyy"], df)
    v = ok.first()["body"]
    assert (v.year, v.month, v.day) == (2016, 12, 10)


def test_parse_timestamp(spark):
    df = spark.createDataFrame([(1483803222,)], "body long")
    ok, _ = execute(spark, ["parse-timestamp :body seconds"], df)
    assert ok.first()["body"].year == 2017


def test_parse_as_datetime(spark, one_col):
    df = one_col("2016-12-10 06:45:50")
    ok, _ = execute(spark, ["parse-as-datetime :body 'yyyy-MM-dd HH:mm:ss'"], df)
    assert dict(ok.dtypes)["body"] == "timestamp_ntz"
    assert ok.first()["body"].hour == 6


def test_parse_as_date_mixed(spark, one_col):
    df = one_col("2016-12-10 06:45:50")
    ok, _ = execute(spark, ["parse-as-date :body"], df)
    assert ok.first()["body"].year == 2016


def test_parse_xml_to_json(spark, one_col):
    df = one_col("<root><name>joe</name><age>5</age></root>")
    ok, _ = execute(spark, ["parse-xml-to-json :body 2"], df)
    r = ok.first()
    assert r["body_root_name"] == "joe"


def test_set_charset(spark):
    df = spark.createDataFrame([(bytearray("héllo", "utf-8"),)], "body binary")
    ok, _ = execute(spark, ["set-charset :body 'utf-8'"], df)
    assert ok.first()["body"] == "héllo"


def test_set_record_delim(spark, one_col):
    df = one_col("a|b|c")
    ok, _ = execute(spark, ["set-record-delim :body '\\|' 2"], df)
    assert [r["body"] for r in ok.collect()] == ["a", "b"]
