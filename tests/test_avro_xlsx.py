"""Pure-stdlib Avro-binary codec and xlsx reader + their directive
integration (reference codec/BinaryAvroDecoder.java, parser/ParseExcel.java)."""

import io
import json
import struct
import zipfile

import pytest

from wrangler_spark.directives._avro_binary import decode, encode

SCHEMA = {
    "type": "record",
    "name": "Ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "int"}},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
    ],
}


def test_avro_roundtrip():
    val = {
        "id": 12345678901,
        "name": "héllo",
        "score": -2.5,
        "tags": ["a", "b", "c"],
        "props": {"x": 1, "y": -7},
        "maybe": None,
        "flag": True,
        "raw": b"\x00\x01\xff",
    }
    assert decode(encode(val, SCHEMA), SCHEMA) == val
    val2 = {**val, "maybe": "present", "tags": [], "props": {}}
    assert decode(encode(val2, SCHEMA), SCHEMA) == val2


def test_avro_zigzag_edges():
    s = {"type": "record", "name": "R", "fields": [{"name": "v", "type": "long"}]}
    for v in (0, -1, 1, 63, 64, -64, -65, 2**40, -(2**40)):
        assert decode(encode({"v": v}, s), s) == {"v": v}


def test_avro_enum_fixed():
    s = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}},
            {"name": "f", "type": {"type": "fixed", "name": "F", "size": 4}},
        ],
    }
    v = {"e": "B", "f": b"\x01\x02\x03\x04"}
    assert decode(encode(v, s), s) == v


def _mini_xlsx(rows, shared=None):
    """Minimal xlsx: workbook + one sheet, inline strings and numbers."""
    def cell_xml(ri, ci, v):
        ref = f"{chr(65 + ci)}{ri + 1}"
        if v is None:
            return ""
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet_rows = "".join(
        f'<row r="{ri + 1}">' + "".join(cell_xml(ri, ci, v) for ci, v in enumerate(row)) + "</row>"
        for ri, row in enumerate(rows)
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", f'<workbook {ns}><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>')
        z.writestr("xl/worksheets/sheet1.xml", f'<worksheet {ns}><sheetData>{sheet_rows}</sheetData></worksheet>')
    return buf.getvalue()


def test_xlsx_reader_stdlib():
    from wrangler_spark.directives.advanced import _xlsx_rows

    payload = _mini_xlsx([["name", "qty"], ["apple", 3], ["pear", 7.5], [None, 1]])
    rows = _xlsx_rows(payload, "0")
    assert rows[0] == ["name", "qty"]
    assert rows[1] == ["apple", "3.0"]  # POI double rendering (r5)
    assert rows[2] == ["pear", "7.5"]
    assert rows[3] == [None, "1.0"]
    # by sheet name
    assert _xlsx_rows(payload, "S1")[0] == ["name", "qty"]


def test_parse_as_avro_binary_fallback(spark):
    """No spark-avro jar in this container → the pure-Python decoder
    path must produce the typed columns."""
    from wrangler_spark import execute

    vals = [
        {"id": 1, "name": "a", "score": 0.5, "tags": ["t"], "props": {"k": 2},
         "maybe": "m", "flag": True, "raw": b"\x07"},
        {"id": 2, "name": "b", "score": 1.5, "tags": [], "props": {},
         "maybe": None, "flag": False, "raw": b""},
    ]
    df = spark.createDataFrame([(encode(v, SCHEMA),) for v in vals], "payload binary")
    ok, _ = execute(
        spark, [f"parse-as-avro :payload '{json.dumps(SCHEMA)}' binary"], df
    )
    rows = {r["payload_id"]: r for r in ok.collect()}
    assert rows[1]["payload_name"] == "a" and rows[1]["payload_maybe"] == "m"
    assert rows[1]["payload_tags"] == ["t"] and rows[1]["payload_props"] == {"k": 2}
    assert rows[1]["payload_flag"] is True and bytes(rows[1]["payload_raw"]) == b"\x07"
    assert rows[2]["payload_maybe"] is None and rows[2]["payload_score"] == 1.5


def test_parse_as_excel_stdlib(spark):
    from wrangler_spark import execute

    payload = _mini_xlsx([["h1", "h2"], ["v1", 42]])
    df = spark.createDataFrame([(payload,)], "book binary")
    ok, _ = execute(spark, ["parse-as-excel :book"], df)
    rows = sorted(ok.collect(), key=lambda r: r["fwd"])
    # reference shape (ParseExcel.java): Excel-letter columns + fwd/bkd
    assert (rows[0]["A"], rows[0]["B"]) == ("h1", "h2")
    # numeric cells render as POI String.valueOf(double) — "42.0"
    # (round-5: pinned by the Directive_parse_excel e2e golden)
    assert (rows[1]["A"], rows[1]["B"]) == ("v1", "42.0")
    assert rows[0]["fwd"] == 0 and rows[0]["bkd"] == len(rows) - 1


def test_avro_container_roundtrip():
    from wrangler_spark.directives._avro_binary import read_container, write_container

    s = {"type": "record", "name": "R",
         "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    recs = [{"a": i, "b": f"x{i}"} for i in range(100)]
    for codec in ("null", "deflate"):
        blob = write_container(recs, s, codec=codec)
        schema, got = read_container(blob)
        assert schema == s and got == recs


def test_parse_as_avro_file_pure_python(spark, tmp_path):
    """Without the spark-avro jar, parse-as-avro-file decodes container
    files through a binaryFile scan + the pure-Python OCF reader."""
    from wrangler_spark import execute
    from wrangler_spark.directives._avro_binary import write_container

    s = {"type": "record", "name": "R",
         "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    p1 = tmp_path / "f1.avro"
    p2 = tmp_path / "f2.avro"
    p1.write_bytes(write_container([{"a": 1, "b": "one"}], s, codec="deflate"))
    p2.write_bytes(write_container([{"a": 2, "b": "two"}, {"a": 3, "b": "three"}], s))
    df = spark.createDataFrame([(str(p1),), (str(p2),)], "path string")
    ok, _ = execute(spark, ["parse-as-avro-file :path"], df)
    got = {r["a"]: r["b"] for r in ok.collect()}
    assert got == {1: "one", 2: "two", 3: "three"}


def test_avro_logical_types(spark):
    """decimal / date / timestamp-micros logical types decode into the
    matching Spark types (reference SchemaConverter.java:118-143)."""
    import datetime
    from decimal import Decimal

    from wrangler_spark.directives._avro_binary import encode

    s = {
        "type": "record", "name": "L",
        "fields": [
            {"name": "amt", "type": {"type": "bytes", "logicalType": "decimal",
                                     "precision": 10, "scale": 2}},
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        ],
    }
    unscaled = 123456  # 1234.56 at scale 2
    amt_bytes = unscaled.to_bytes((unscaled.bit_length() + 8) // 8, "big", signed=True)
    days = 19876  # 2024-06-02
    micros = 1_700_000_123_456_789
    payload = encode({"amt": amt_bytes, "d": days, "ts": micros}, s)

    import json as _json

    from wrangler_spark import execute

    df = spark.createDataFrame([(payload,)], "body binary")
    ok, _ = execute(spark, [f"parse-as-avro :body '{_json.dumps(s)}' binary"], df)
    r = ok.first()
    assert r["body_amt"] == Decimal("1234.56")
    assert r["body_d"] == datetime.date(1970, 1, 1) + datetime.timedelta(days=days)
    # session tz is UTC: recovered timestamp equals the micros instant
    assert r["body_ts"] == datetime.datetime(1970, 1, 1) + datetime.timedelta(
        microseconds=micros
    )


def test_xlsx_reordered_sheets_rid_resolution():
    """A workbook whose sheet ORDER differs from the numeric worksheet
    file order (S_first → sheet2.xml, S_second → sheet1.xml) must
    resolve each sheet through xl/_rels/workbook.xml.rels, not numeric
    file order."""
    from wrangler_spark.directives.advanced import _xlsx_rows

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    relns = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'

    def ws(text):
        return (
            f'<worksheet {ns}><sheetData><row r="1">'
            f'<c r="A1" t="inlineStr"><is><t>{text}</t></is></c>'
            "</row></sheetData></worksheet>"
        )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<workbook {ns} {rns}><sheets>'
            '<sheet name="S_first" sheetId="1" r:id="rId2"/>'
            '<sheet name="S_second" sheetId="2" r:id="rId1"/>'
            "</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships {relns}>'
            '<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Target="worksheets/sheet2.xml"/>'
            "</Relationships>",
        )
        z.writestr("xl/worksheets/sheet1.xml", ws("in-file-1"))
        z.writestr("xl/worksheets/sheet2.xml", ws("in-file-2"))
    payload = buf.getvalue()
    # S_first maps through rId2 → sheet2.xml; numeric order would
    # wrongly hand it sheet1.xml
    assert _xlsx_rows(payload, "S_first")[0] == ["in-file-2"]
    assert _xlsx_rows(payload, "S_second")[0] == ["in-file-1"]
    assert _xlsx_rows(payload, "0")[0] == ["in-file-2"]  # index = workbook order


def test_connector_fallback_narrow_catch(spark, tmp_path):
    """Genuine errors with the probe machinery present must SURFACE
    instead of silently switching to the pure-Python decode engine:
    a nonexistent descriptor path raises, it does not fall back."""
    import pytest as _pytest

    from wrangler_spark import execute

    df = spark.createDataFrame([(b"\x08\x01",)], "c binary")
    with _pytest.raises(Exception, match="missing.desc|No such file"):
        ok, _ = execute(
            spark, [f"parse-as-protobuf :c {tmp_path}/missing.desc M"], df
        )
        ok.collect()


def test_xlsx_unresolvable_rid_keeps_sheets_paired():
    """A sheet whose r:id is missing from the rels part must fall back
    to the numeric file at ITS OWN workbook position — later sheets must
    not silently shift onto the wrong files."""
    from wrangler_spark.directives.advanced import _xlsx_rows

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    relns = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'

    def ws(text):
        return (
            f'<worksheet {ns}><sheetData><row r="1">'
            f'<c r="A1" t="inlineStr"><is><t>{text}</t></is></c>'
            "</row></sheetData></worksheet>"
        )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<workbook {ns} {rns}><sheets>'
            '<sheet name="A" sheetId="1" r:id="rId1"/>'
            '<sheet name="B" sheetId="2" r:id="rIdMISSING"/>'
            '<sheet name="C" sheetId="3" r:id="rId3"/>'
            "</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships {relns}>'
            '<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId3" Target="worksheets/sheet3.xml"/>'
            "</Relationships>",
        )
        z.writestr("xl/worksheets/sheet1.xml", ws("one"))
        z.writestr("xl/worksheets/sheet2.xml", ws("two"))
        z.writestr("xl/worksheets/sheet3.xml", ws("three"))
    payload = buf.getvalue()
    assert _xlsx_rows(payload, "A")[0] == ["one"]
    assert _xlsx_rows(payload, "B")[0] == ["two"]    # positional fallback
    assert _xlsx_rows(payload, "C")[0] == ["three"]  # NOT shifted to sheet2


def test_avro_decode_stream_concatenated():
    """BinaryAvroDecoderTest.testBasicFunctionality: two records written
    back-to-back into one buffer decode to two rows."""
    from wrangler_spark.directives._avro_binary import decode_stream, encode

    schema = {
        "type": "record", "name": "User", "fields": [
            {"name": "name", "type": "string"},
            {"name": "favorite_number", "type": ["int", "null"]},
            {"name": "favorite_color", "type": ["string", "null"]},
        ],
    }
    u1 = {"name": "Root", "favorite_number": 8, "favorite_color": None}
    u2 = {"name": "Ben", "favorite_number": 7, "favorite_color": "red"}
    payload = encode(u1, schema) + encode(u2, schema)
    rows = decode_stream(payload, schema)
    assert len(rows) == 2
    assert rows[0]["name"] == "Root" and rows[1]["name"] == "Ben"
    assert rows[1]["favorite_color"] == "red"
