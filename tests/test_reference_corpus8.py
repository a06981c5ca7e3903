"""Eighth wave of reference JUnit mirrors: HL7, Avro codecs, data-model
mapping.

- HL7ParserTest.java — its own real-world HL7v2 message corpus
  (ADT^A04 registration, ACK success/error, ORM^O01 orders, ORU^R01
  notes) through parse-as-hl7; the reference only asserts parse
  success, here the segment maps are also pinned.
- ParseAvroTest.testAvroBinaryRecordReadWrite — two concatenated
  binary datums of the example.avro User record decode to two rows
  (bytes hand-encoded per the Avro spec: zigzag varints + utf8).
- JsonAvroDecoderTest.testBasicFunctionality — two concatenated
  json-encoded datums (union values in Avro's {"type": value}
  wrapping) decode with field values intact.
- DataModelMapColumnTest.java — unknown model / unknown revision /
  unknown target field raise at compile; the success path renames and
  casts the column to the model field's type.
"""

import json

import pytest

from wrangler_spark import execute
from wrangler_spark.errors import UsageError

# ------------------------------------------------------- HL7ParserTest

ADT04 = (
    "MSH|^~\\&|SENDING_APPLICATION|SENDING_FACILITY|RECEIVING_APPLICATION|RECEIVING_FACILITY|"
    "20110613083617||ADT^A04|934576120110613083617|P|2.3||||\r"
    "EVN|A04|20110613083617|||\r"
    "PID|1||135769||MOUSE^MICKEY^||19281118|M|||123 Main St.^^Lake Buena Vista^FL^32830|"
    "|(407)939-1289^^^theMainMouse@disney.com|||||1719|99999999||||||||||||||||||||\r"
    "PV1|1|O|||||7^Disney^Walt^^MD^^^^|||||||||||||||||||||||||||||||||||||||||||||"
)

ACK_SUCCESS = (
    "MSH|^~\\&|SENDING_APPLICATION|SENDING_FACILITY|RECEIVING_APPLICATION|RECEIVING_FACILITY|"
    "20110614075841||ACK|1407511|P|2.3||||||\r"
    "MSA|AA|1407511|Success||"
)

ACK_ERROR = (
    "MSH|^~\\&|SENDING_APPLICATION|SENDING_FACILITY|RECEIVING_APPLICATION|RECEIVING_FACILITY|"
    "20110614075841||ACK|1407511|P|2.3||||||\r"
    "MSA|AE|1407511|Error processing record!||"
)

ORDERS = (
    "MSH|^~\\&|SendingApp|SendingFac|ReceivingApp|ReceivingFac|20120411070545||ORM^O01|59689|P|2.3\r"
    "PID|1|12345|12345^^^MIE&1.2.840.114398.1.100&ISO^MR||MOUSE^MICKEY^S||19281118|M||"
    "|123 Main St.^^Lake Buena Vista^FL^3283|||||||||||||||||||\r"
    "PV1|1||7^Disney^Walt^^MD^^^^||||||||||||||||||||||||||||||||||||||||||||||"
    "|^^^^^1.2.840.114398.1.668.11999116110119971081089799101||\r"
    "IN1|1||1|ABC Insurance Medicaid|P O Box 12345^^Atlanta^GA^30348|Claims^Florida |(555)555-1234^^^^^^|G1234|"
    "||||||G|Mouse^Mickey|SELF|19281118|123 Main St.^^Lake Buena Vista^FL^32830|Y||||||||||||P|"
    "|||ZYX1234589-1|||||||M||||M||\r"
    "ORC|NW|23|||Pending||^^^^^0||20150325170228|26^David^Dave||8^Selenium^Selenium|^^^^OFFICE^^^^^Office|"
    "^^^test@email.com||||||||||\r"
    "OBR|1|23||123^CREATININE|0|||||||||||8^Selenium^Selenium||||||||||||||||||||||||||||||||||\r"
    "DG1|1|ICD|B60.0^BABESIOSIS^I10|BABESIOSIS||||||||||||\r"
    "OBR|2|23||80061^LIPID PROFILE|0|||||||||||8^Selenium^Selenium||||||||||||||||||||||||||||||||||\r"
    "DG1|1|ICD|B60.0^BABESIOSIS^I10|BABESIOSIS||||||||||||"
)


def test_hl7_corpus_parses(spark):
    """HL7ParserTest.testBasic over four of its messages — round-5:
    asserted against the reference's FLATTENED column shape
    (HL7Parser visitor -> jsonFlatten: body_hl7_<SEG>_<field>[_<comp>]
    columns; repeated segments become a two-element array column).
    Note: in a heterogeneous BATCH, a path that is composite in one
    message and primitive in another (MSH-9 here) schema-merges to a
    JSON string for the composite rows — a static-schema artifact the
    reference's per-row dynamic rows don't have."""
    import json

    msgs = [ADT04, ACK_SUCCESS, ACK_ERROR, ORDERS]
    df = spark.createDataFrame([(m,) for m in msgs], "body string")
    ok, _ = execute(spark, ["parse-as-hl7 body"], df)
    rows = ok.collect()
    assert len(rows) == 4
    assert all(r["body_hl7_MSH_1"] == "|" for r in rows)

    def mtype(r):
        v = r["body_hl7_MSH_9"]
        try:
            o = json.loads(v)
            return o["1"] + "^" + o["2"]
        except (ValueError, TypeError, KeyError):
            return v

    by_type = {mtype(r): r for r in rows}
    # ADT^A04: PID patient name components
    adt = by_type["ADT^A04"]
    assert adt["body_hl7_PID_5_1"] == "MOUSE"
    assert adt["body_hl7_PID_5_2"] == "MICKEY"
    # ACKs: MSA ack code + text
    acks = [r for r in rows if mtype(r) == "ACK"]
    codes = {r["body_hl7_MSA_1"]: r["body_hl7_MSA_3"] for r in acks}
    assert codes == {"AA": "Success", "AE": "Error processing record!"}
    # ORM^O01: repeated OBR segments preserved as a two-element array
    orm = by_type["ORM^O01"]
    obr = orm["body_hl7_OBR"]
    obr = json.loads(obr) if isinstance(obr, str) else obr
    assert len(obr) == 2
    assert obr[0]["4"]["1"] == "123" and obr[0]["4"]["2"] == "CREATININE"
    assert obr[1]["4"]["1"] == "80061" and obr[1]["4"]["2"] == "LIPID PROFILE"
    dg1 = orm["body_hl7_DG1"]
    dg1 = json.loads(dg1) if isinstance(dg1, str) else dg1
    assert len(dg1) == 2


def test_hl7_component_depth(spark):
    """depth 2: one flatten level below the segment — composite fields
    stay as JSON objects (jsonFlatten depth cut-off), empty components
    are skipped (visitPopulatedElements)."""
    import json

    df = spark.createDataFrame([(ADT04,)], "body string")
    ok, _ = execute(spark, ["parse-as-hl7 body 2"], df)
    r = ok.first()
    comp = r["body_hl7_PID_5"]
    comp = json.loads(comp) if isinstance(comp, str) else comp
    assert comp == {"1": "MOUSE", "2": "MICKEY"}


# -------------------------------------------------------- ParseAvroTest

USER_SCHEMA = """{"namespace": "example.avro",
 "type": "record",
 "name": "User",
 "fields": [
     {"name": "name", "type": "string"},
     {"name": "favorite_number",  "type": ["int", "null"]},
     {"name": "favorite_color", "type": ["string", "null"]}
 ]
}"""


def _zz(n: int) -> bytes:
    """Avro zigzag varint for small ints."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_str(s: str) -> bytes:
    b = s.encode()
    return _zz(len(b)) + b


def test_avro_binary_concatenated_datums(spark):
    """testAvroBinaryRecordReadWrite: user1(Root, 8, blue) and
    user2(Ben, 7, red) written back-to-back with a binaryEncoder decode
    to two rows."""
    user1 = _avro_str("Root") + _zz(0) + _zz(8) + _zz(0) + _avro_str("blue")
    user2 = _avro_str("Ben") + _zz(0) + _zz(7) + _zz(0) + _avro_str("red")
    payload = user1 + user2
    df = spark.createDataFrame([(bytearray(payload),)], "body binary")
    compact = json.dumps(json.loads(USER_SCHEMA))
    ok, err = execute(spark, [f"parse-as-avro :body '{compact}' binary"], df)
    rows = ok.collect()
    assert len(rows) == 2
    got = {(r["body_name"], r["body_favorite_number"], r["body_favorite_color"]) for r in rows}
    assert got == {("Root", 8, "blue"), ("Ben", 7, "red")}


def test_avro_json_concatenated_datums(spark):
    """JsonAvroDecoderTest.testBasicFunctionality: json-encoded datums
    with Avro union wrapping; user1 leaves favorite_color null."""
    u1 = '{"name":"Root","favorite_number":{"int":8},"favorite_color":null}'
    u2 = '{"name":"Ben","favorite_number":{"int":7},"favorite_color":{"string":"red"}}'
    df = spark.createDataFrame([(u1 + "\n" + u2,)], "body string")
    compact = json.dumps(json.loads(USER_SCHEMA))
    ok, _ = execute(spark, [f"parse-as-avro :body '{compact}' json"], df)
    rows = sorted(ok.collect(), key=lambda r: r["body_name"])
    assert len(rows) == 2
    assert rows[1]["body_name"] == "Root" and rows[1]["body_favorite_number"] == 8
    assert rows[1]["body_favorite_color"] is None
    assert rows[0]["body_name"] == "Ben" and rows[0]["body_favorite_color"] == "red"


# ----------------------------------------------- DataModelMapColumnTest


@pytest.fixture()
def glossary(spark):
    return spark.createDataFrame(
        [("int_field", "int"), ("str_field", "string")], "field string, dtype string"
    )


def test_data_model_map_success(spark, glossary):
    """testMap_fieldSuccessfulMapped: dummy_col_1 renames to int_field
    and casts to the model's int type."""
    df = spark.createDataFrame([("1", "2")], "dummy_col_1 string, dummy_col_2 string")
    ok, _ = execute(
        spark,
        ["data-model-map-column TEST_DATA_MODEL 1 int_field :dummy_col_1"],
        df,
        lookups={"datamodel:TEST_DATA_MODEL": glossary},
    )
    row = ok.first()
    assert row["int_field"] == 1
    assert "dummy_col_1" not in ok.columns


def test_data_model_unknown_model(spark):
    """testInitialize_unknownDataModel_directiveException."""
    df = spark.createDataFrame([("1",)], "dummy_col_1 string")
    with pytest.raises(UsageError):
        execute(
            spark,
            ["data-model-map-column UNKNOWN_DATA_MODEL 1 int_field :dummy_col_1"],
            df,
            lookups={},
        )


def test_data_model_unknown_revision(spark, glossary):
    """testInitialize_unknownRevision_directiveException: a model
    registered only at revision 1 rejects revision 0."""
    df = spark.createDataFrame([("1",)], "dummy_col_1 string")
    with pytest.raises(UsageError):
        execute(
            spark,
            ["data-model-map-column TEST_DATA_MODEL 0 int_field :dummy_col_1"],
            df,
            lookups={"datamodel:TEST_DATA_MODEL@1": glossary},
        )


def test_data_model_unknown_field(spark, glossary):
    """testInitialize_unknownTargetField_directiveException."""
    df = spark.createDataFrame([("1",)], "dummy_col_1 string")
    with pytest.raises(UsageError):
        execute(
            spark,
            ["data-model-map-column TEST_DATA_MODEL 1 no_such_field :dummy_col_1"],
            df,
            lookups={"datamodel:TEST_DATA_MODEL": glossary},
        )
