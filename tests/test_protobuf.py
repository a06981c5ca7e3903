"""Pure-Python protobuf decode (descriptor set + wire format) and the
parse-as-protobuf directive fallback (reference parser/ParseProtobuf.java,
codec/ProtobufDecoderUsingDescriptor.java)."""

import json
import struct

import pytest

from wrangler_spark.directives._protobuf import (
    decode_message,
    enc_fixed64,
    enc_len,
    enc_str,
    enc_varint,
    message_to_spark_type,
    parse_descriptor_set,
)


def _field(name, number, label, type_, type_name=None):
    b = enc_str(1, name) + enc_varint(3, number) + enc_varint(4, label) + enc_varint(5, type_)
    if type_name:
        b += enc_str(6, type_name)
    return b


def _descriptor_set() -> bytes:
    # message ev.Inner { string tag = 1; sint64 delta = 2; }
    inner = enc_str(1, "Inner") + enc_len(2, _field("tag", 1, 1, 9)) + enc_len(
        2, _field("delta", 2, 1, 18)
    )
    # enum Kind { A = 0; B = 1; } nested in Outer
    kind = (
        enc_str(1, "Kind")
        + enc_len(2, enc_str(1, "A") + enc_varint(2, 0))
        + enc_len(2, enc_str(1, "B") + enc_varint(2, 1))
    )
    outer = (
        enc_str(1, "Outer")
        + enc_len(2, _field("id", 1, 1, 3))             # int64
        + enc_len(2, _field("name", 2, 1, 9))           # string
        + enc_len(2, _field("score", 3, 1, 1))          # double
        + enc_len(2, _field("nums", 4, 3, 5))           # repeated int32
        + enc_len(2, _field("inner", 5, 1, 11, ".ev.Inner"))
        + enc_len(2, _field("kind", 6, 1, 14, ".ev.Outer.Kind"))
        + enc_len(2, _field("raw", 7, 1, 12))           # bytes
        + enc_len(2, _field("flag", 8, 1, 8))           # bool
        + enc_len(4, kind)
    )
    file_ = enc_str(1, "test.proto") + enc_str(2, "ev") + enc_len(4, inner) + enc_len(4, outer)
    return enc_len(1, file_)


def _zz(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _outer_payload(id_, name, score, nums, tag, delta, kind, raw, flag) -> bytes:
    inner = enc_str(1, tag) + enc_varint(2, _zz(delta))
    packed = b"".join(
        enc_varint(0, x)[1:] for x in nums  # bare varints (strip tag)
    )
    return (
        enc_varint(1, id_)
        + enc_str(2, name)
        + enc_fixed64(3, struct.pack("<d", score))
        + enc_len(4, packed)
        + enc_len(5, inner)
        + enc_varint(6, kind)
        + enc_len(7, raw)
        + enc_varint(8, 1 if flag else 0)
    )


def test_descriptor_parse_and_decode():
    msgs, enums = parse_descriptor_set(_descriptor_set())
    assert set(msgs) == {"ev.Inner", "ev.Outer"}
    assert enums["ev.Outer.Kind"] == {0: "A", 1: "B"}

    payload = _outer_payload(41, "hello", -2.5, [1, 200, 3], "t1", -7, 1, b"\x00\xff", True)
    got = decode_message(payload, "ev.Outer", msgs, enums)
    assert got == {
        "id": 41, "name": "hello", "score": -2.5, "nums": [1, 200, 3],
        "inner": {"tag": "t1", "delta": -7}, "kind": "B",
        "raw": b"\x00\xff", "flag": True,
    }


def test_negative_int64_varint():
    msgs, enums = parse_descriptor_set(_descriptor_set())
    payload = enc_varint(1, -5)  # int64 field: two's-complement varint
    got = decode_message(payload, "ev.Outer", msgs, enums)
    assert got["id"] == -5


def test_spark_type_mapping():
    msgs, _ = parse_descriptor_set(_descriptor_set())
    st = message_to_spark_type("ev.Outer", msgs)
    assert [f.name for f in st.fields] == [
        "id", "name", "score", "nums", "inner", "kind", "raw", "flag"
    ]
    assert st["nums"].dataType.simpleString() == "array<int>"
    assert st["inner"].dataType.simpleString() == "struct<tag:string,delta:bigint>"
    assert st["kind"].dataType.simpleString() == "string"


def test_parse_as_protobuf_pure_python(spark, tmp_path):
    """Without the spark-protobuf jar, the directive decodes through
    the descriptor-driven pure-Python path."""
    from wrangler_spark import execute

    desc = tmp_path / "set.desc"
    desc.write_bytes(_descriptor_set())
    rows = [
        (_outer_payload(1, "a", 0.5, [1, 2], "x", 3, 0, b"\x07", False),),
        (_outer_payload(2, "b", 1.5, [], "y", -1, 1, b"", True),),
    ]
    df = spark.createDataFrame(rows, "body binary")
    ok, _ = execute(spark, [f"parse-as-protobuf :body '{desc}' 'ev.Outer'"], df)
    got = {r["body"]["id"]: r["body"] for r in ok.collect()}
    assert got[1]["name"] == "a" and got[1]["nums"] == [1, 2] and got[1]["kind"] == "A"
    assert got[1]["inner"]["delta"] == 3
    assert got[2]["flag"] is True and got[2]["kind"] == "B"
    assert got[2]["inner"]["tag"] == "y" and got[2]["inner"]["delta"] == -1


def test_addressbook_mirror_reference_corpus():
    """Wave-12 JUnit mirror: codec/ProtobufDecoderUsingDescriptorTest.java
    testBasicConversion — the protobuf-tutorial AddressBook message with
    the reference's exact literals (Joltie Root / 1234 /
    joltie.root@example.com / 555-4321 / HOME). The reference flattens
    to underscore paths (people_name); this engine keeps the nested
    struct shape (idiomatic Spark), so the assertions check the same
    VALUES through the nested accessors."""
    # tutorial.proto: Person{name=1,id=2,email=3,phones=4 rep PhoneNumber
    # {number=1,type=2 enum PhoneType{MOBILE=0,HOME=1,WORK=2}}};
    # AddressBook{people=1 rep Person}
    phone_t = (
        enc_str(1, "PhoneType")
        + enc_len(2, enc_str(1, "MOBILE") + enc_varint(2, 0))
        + enc_len(2, enc_str(1, "HOME") + enc_varint(2, 1))
        + enc_len(2, enc_str(1, "WORK") + enc_varint(2, 2))
    )
    phone_number = (
        enc_str(1, "PhoneNumber")
        + enc_len(2, _field("number", 1, 1, 9))
        + enc_len(2, _field("type", 2, 1, 14, ".tutorial.Person.PhoneType"))
    )
    person = (
        enc_str(1, "Person")
        + enc_len(2, _field("name", 1, 1, 9))
        + enc_len(2, _field("id", 2, 1, 5))
        + enc_len(2, _field("email", 3, 1, 9))
        + enc_len(2, _field("phones", 4, 3, 11, ".tutorial.Person.PhoneNumber"))
        + enc_len(3, phone_number)  # nested DescriptorProto
        + enc_len(4, phone_t)  # nested EnumDescriptorProto
    )
    book = enc_str(1, "AddressBook") + enc_len(
        2, _field("people", 1, 3, 11, ".tutorial.Person")
    )
    file_ = (
        enc_str(1, "addressbook.proto")
        + enc_str(2, "tutorial")
        + enc_len(4, person)
        + enc_len(4, book)
    )
    msgs, enums = parse_descriptor_set(enc_len(1, file_))
    assert "tutorial.AddressBook" in msgs and "tutorial.Person.PhoneNumber" in msgs
    assert enums["tutorial.Person.PhoneType"] == {0: "MOBILE", 1: "HOME", 2: "WORK"}

    john_phone = enc_str(1, "555-4321") + enc_varint(2, 1)  # HOME
    john = (
        enc_str(1, "Joltie Root")
        + enc_varint(2, 1234)
        + enc_str(3, "joltie.root@example.com")
        + enc_len(4, john_phone)
    )
    payload = enc_len(1, john)  # AddressBook{people=[john]}
    got = decode_message(payload, "tutorial.AddressBook", msgs, enums)
    p0 = got["people"][0]
    assert p0["name"] == "Joltie Root"
    assert p0["id"] == 1234
    assert p0["email"] == "joltie.root@example.com"
    assert p0["phones"][0]["number"] == "555-4321"
    assert p0["phones"][0]["type"] == "HOME"
