import json

import pytest

from wrangler_spark import compile_recipe, execute
from wrangler_spark.recipe.registry import RecipeContext


def test_set_variable_used_later(spark):
    df = spark.createDataFrame([(2, 3)], "a long, b long")
    ok, _ = execute(
        spark,
        ["set-variable total a * b", "set-column :c total + 1"],
        df,
    )
    assert ok.first()["c"] == 7


def test_increment_variable(spark):
    df = spark.createDataFrame([(5,), (15,)], "v long")
    ok, _ = execute(
        spark,
        [
            "increment-variable hits 1 exp:{v > 10}",
            "increment-variable hits 1 exp:{v > 0}",
            "set-column :h hits",
        ],
        df,
    )
    rows = {r["v"]: r["h"] for r in ok.collect()}
    assert rows == {5: 1, 15: 2}


def test_parse_as_currency(spark):
    df = spark.createDataFrame(
        [("$1,234.56",), ("($12.00)",), ("$0.99",)], "price string"
    )
    ok, _ = execute(spark, ["parse-as-currency :price :amount en_US"], df)
    got = sorted(r["amount"] for r in ok.collect())
    assert got == [-12.0, 0.99, 1234.56]


def test_format_as_currency(spark):
    df = spark.createDataFrame([(1234.5,)], "v double")
    ok, _ = execute(spark, ["format-as-currency :v :out en_US"], df)
    assert ok.first()["out"] == "$1,234.50"


def test_parse_as_avro_json_mode(spark):
    schema = json.dumps(
        {
            "type": "record",
            "name": "User",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
            ],
        }
    )
    df = spark.createDataFrame([('{"id": 7, "name": "ann"}',)], "body string")
    ok, _ = execute(spark, [f"parse-as-avro :body '{schema}' json"], df)
    r = ok.first()
    assert r["body_id"] == 7 and r["body_name"] == "ann"


def test_parse_as_hl7(spark):
    # round-5: reference-faithful flattened columns
    # (HL7Parser.java visitor -> JsParser.jsonFlatten naming); repeated
    # OBX segments become a two-element array under body_hl7_OBX
    import json

    msg = (
        "MSH|^~\\&|SND|FAC|RCV|FAC2\r"
        "PID|1||12345||DOE^JOHN\r"
        "OBX|1|NM|GLU||95\r"
        "OBX|2|NM|HGB||14"
    )
    df = spark.createDataFrame([(msg,)], "body string")
    ok, _ = execute(spark, ["parse-as-hl7 :body"], df)
    r = ok.first()
    assert r["body_hl7_MSH_3"] == "SND"
    assert r["body_hl7_PID_3"] == "12345"
    # components flatten with 1-based keys
    assert r["body_hl7_PID_5_1"] == "DOE" and r["body_hl7_PID_5_2"] == "JOHN"
    obx = r["body_hl7_OBX"]
    obx = json.loads(obx) if isinstance(obx, str) else obx
    assert [o["5"] for o in obx] == ["95", "14"]


def test_parse_as_hl7_components(spark):
    # depth 2: segment objects flatten one level, composite fields stay
    # as JSON objects (jsonFlatten depth cut-off)
    import json

    msg = "MSH|^~\\&|SND\rPID|1||12345||DOE^JOHN^Q"
    df = spark.createDataFrame([(msg,)], "body string")
    ok, _ = execute(spark, ["parse-as-hl7 :body 2"], df)
    r = ok.first()
    assert r["body_hl7_PID_3"] == "12345"
    comp = r["body_hl7_PID_5"]
    comp = json.loads(comp) if isinstance(comp, str) else comp
    assert comp == {"1": "DOE", "2": "JOHN", "3": "Q"}


def test_parse_as_hl7_third_occurrence_dropped(spark):
    # reference quirk (HL7Parser.java:192-203): the array conversion
    # never appends — a third occurrence of a segment is dropped
    import json

    msg = "MSH|^~\\&|SND\rOBX|1\rOBX|2\rOBX|3"
    df = spark.createDataFrame([(msg,)], "body string")
    ok, _ = execute(spark, ["parse-as-hl7 :body"], df)
    obx = ok.first()["body_hl7_OBX"]
    obx = json.loads(obx) if isinstance(obx, str) else obx
    assert [o["1"] for o in obx] == ["1", "2"]


def test_invoke_http_local_server(spark):
    """Real HTTP round trip against a local stdlib server (reference:
    wrangler-core directives/external/InvokeHttpTest.java, same
    local-service shape): the batched
    mapInPandas enrichment posts each row's selected columns and
    attaches the response body."""
    import http.server
    import threading

    class Echo(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            data = json.loads(body)
            out = json.dumps({"echo": data, "seen": True}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Echo)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
        ok, _ = execute(
            spark,
            [f"invoke-http 'http://127.0.0.1:{port}/enrich' :id,:name"],
            df,
        )
        rows = {r["id"]: json.loads(r["http_response"]) for r in ok.collect()}
        assert rows[1]["echo"] == {"id": 1, "name": "a"} and rows[1]["seen"]
        assert rows[2]["echo"]["name"] == "b"
    finally:
        srv.shutdown()


def test_validate_standard(spark):
    schema = json.dumps(
        {"type": "object", "properties": {"a": {"type": "number"}}, "required": ["a"]}
    )
    df = spark.createDataFrame([('{"a": 1}',), ('{"b": 2}',), ("notjson",)], "body string")
    ok, err = execute(spark, [f"validate-standard :body '{schema}'"], df)
    assert ok.count() == 1
    assert err.count() == 2


def test_stemming(spark):
    df = spark.createDataFrame([("running flies happily agreed",)], "body string")
    ok, _ = execute(spark, ["stemming :body"], df)
    assert ok.first()["body_porter"] == ["run", "fli", "happili", "agre"]


def test_data_model_map_column(spark):
    df = spark.createDataFrame([("42",)], "raw string")
    glossary = spark.createDataFrame([("user_age", "int")], "field string, type string")
    ctx = RecipeContext(spark=spark, lookups={"datamodel:person": glossary})
    rec = compile_recipe(["data-model-map-column person 1 user_age :raw"])
    ok, _ = rec.apply(df, ctx)
    assert ok.first()["user_age"] == 42
    assert dict(ok.dtypes)["user_age"] == "int"


def test_avro_binary_mode_pure_python_fallback(spark):
    """Without the spark-avro jar, binary mode decodes through the
    pure-Python codec (directives/_avro_binary.py) instead of failing
    (full coverage in tests/test_avro_xlsx.py)."""
    from wrangler_spark.directives._avro_binary import encode

    schema = '{"type":"record","name":"r","fields":[{"name":"n","type":"long"}]}'
    payload = encode({"n": 41}, {"type": "record", "name": "r",
                                 "fields": [{"name": "n", "type": "long"}]})
    df = spark.createDataFrame([(payload,)], "body binary")
    ok, _ = execute(spark, [f"parse-as-avro :body '{schema}' binary"], df)
    assert ok.collect()[0]["body_n"] == 41


def test_invoke_http_non_2xx_returns_body(spark):
    """Status-code parity contract: a non-2xx response contributes its
    BODY to http_response (requests never raises on status; the urllib
    fallback catches HTTPError and reads the error body — same recipe,
    same output, whichever client is installed)."""
    import http.server
    import threading

    class Reject(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            out = json.dumps({"error": "quota", "retry": False}).encode()
            self.send_response(429)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Reject)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame([(1,)], "id int")
        ok, _ = execute(
            spark, [f"invoke-http 'http://127.0.0.1:{port}/enrich' :id"], df
        )
        resp = json.loads(ok.first()["http_response"])
        assert resp == {"error": "quota", "retry": False}
    finally:
        srv.shutdown()
