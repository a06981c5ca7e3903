"""Pure-Python protobuf wire-format decoder driven by a descriptor set.

The reference decodes protobuf payload cells with a schema-registry
descriptor (wrangler-core codec/ProtobufDecoderUsingDescriptor.java);
Spark's `from_protobuf` needs the spark-protobuf jar, absent here. The
protobuf wire format and descriptor.proto layout are public, so this
module implements both directly:

- a generic wire-format reader (varint / 64-bit / length-delimited /
  32-bit fields),
- a FileDescriptorSet parser using descriptor.proto's well-known field
  numbers (FileDescriptorProto.name=1/package=2/message_type=4/
  enum_type=5; DescriptorProto.name=1/field=2/nested_type=3/
  enum_type=4; FieldDescriptorProto.name=1/number=3/label=4/type=5/
  type_name=6; EnumDescriptorProto.name=1/value=2;
  EnumValueDescriptorProto.name=1/number=2),
- a message decoder mapping field numbers → named, typed values,
  including nested messages, repeated fields (incl. packed scalars),
  enums (symbol names) and the zigzag/fixed encodings.

Used by parse-as-protobuf as an Arrow-batched pandas-UDF fallback when
the connector jar is unavailable.
"""

from __future__ import annotations

import struct
from typing import Any

# FieldDescriptorProto.Type values (public descriptor.proto)
_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32 = 1, 2, 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL, _T_STRING, _T_GROUP = 6, 7, 8, 9, 10
_T_MESSAGE, _T_BYTES, _T_UINT32, _T_ENUM = 11, 12, 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18

_LABEL_REPEATED = 3

_VARINT_TYPES = {
    _T_INT64, _T_UINT64, _T_INT32, _T_BOOL, _T_UINT32, _T_ENUM,
    _T_SINT32, _T_SINT64,
}
_FIXED64_TYPES = {_T_DOUBLE, _T_FIXED64, _T_SFIXED64}
_FIXED32_TYPES = {_T_FLOAT, _T_FIXED32, _T_SFIXED32}


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, raw_value) over one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 1:
            v = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            v = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"protobuf: unsupported wire type {wt}")
        yield fno, wt, v


def _group(buf: bytes) -> dict[int, list]:
    out: dict[int, list] = {}
    for fno, _wt, v in iter_fields(buf):
        out.setdefault(fno, []).append(v)
    return out


# ----------------------------------------------------- descriptor parsing

class FieldDesc:
    __slots__ = ("name", "number", "type", "type_name", "repeated")

    def __init__(self, name, number, type_, type_name, repeated):
        self.name, self.number, self.type = name, number, type_
        self.type_name, self.repeated = type_name, repeated


def _parse_enum(buf: bytes) -> dict[int, str]:
    g = _group(buf)
    out = {}
    for vb in g.get(2, []):  # EnumValueDescriptorProto
        vg = _group(vb)
        name = vg[1][0].decode("utf-8")
        number = vg.get(2, [0])[0]
        out[number] = name
    return out


def _parse_message(buf: bytes, prefix: str, msgs: dict, enums: dict) -> None:
    g = _group(buf)
    name = g[1][0].decode("utf-8")
    full = f"{prefix}.{name}" if prefix else name
    fields: dict[int, FieldDesc] = {}
    for fb in g.get(2, []):  # FieldDescriptorProto
        fg = _group(fb)
        fields[fg[3][0]] = FieldDesc(
            name=fg[1][0].decode("utf-8"),
            number=fg[3][0],
            type_=fg.get(5, [_T_BYTES])[0],
            type_name=(fg.get(6, [b""])[0].decode("utf-8").lstrip(".")),
            repeated=fg.get(4, [1])[0] == _LABEL_REPEATED,
        )
    msgs[full] = fields
    for nb in g.get(3, []):  # nested DescriptorProto
        _parse_message(nb, full, msgs, enums)
    for eb in g.get(4, []):  # nested EnumDescriptorProto
        eg = _group(eb)
        ename = eg[1][0].decode("utf-8")
        enums[f"{full}.{ename}"] = _parse_enum(eb)


def parse_descriptor_set(data: bytes) -> tuple[dict, dict]:
    """FileDescriptorSet bytes → (messages, enums).

    messages: full name → {field number → FieldDesc};
    enums: full name → {number → symbol}."""
    msgs: dict = {}
    enums: dict = {}
    for _fno, _wt, file_b in iter_fields(data):
        if _fno != 1:  # FileDescriptorSet.file
            continue
        fg = _group(file_b)
        package = fg.get(2, [b""])[0].decode("utf-8")
        for mb in fg.get(4, []):  # FileDescriptorProto.message_type
            _parse_message(mb, package, msgs, enums)
        for eb in fg.get(5, []):  # top-level enums
            eg = _group(eb)
            ename = eg[1][0].decode("utf-8")
            full = f"{package}.{ename}" if package else ename
            enums[full] = _parse_enum(eb)
    return msgs, enums


# ----------------------------------------------------- message decoding

def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _scalar(fd: FieldDesc, wt: int, raw, enums: dict):
    t = fd.type
    if t == _T_DOUBLE:
        return struct.unpack("<d", raw)[0]
    if t == _T_FLOAT:
        return struct.unpack("<f", raw)[0]
    if t in (_T_FIXED64,):
        return struct.unpack("<Q", raw)[0]
    if t == _T_SFIXED64:
        return struct.unpack("<q", raw)[0]
    if t == _T_FIXED32:
        return struct.unpack("<I", raw)[0]
    if t == _T_SFIXED32:
        return struct.unpack("<i", raw)[0]
    if t == _T_BOOL:
        return bool(raw)
    if t == _T_STRING:
        return raw.decode("utf-8")
    if t == _T_BYTES:
        return bytes(raw)
    if t in (_T_SINT32, _T_SINT64):
        return _zigzag_dec(raw)
    if t == _T_ENUM:
        return enums.get(fd.type_name, {}).get(raw, raw)
    if t in (_T_INT32, _T_INT64):
        # negative ints are 64-bit two's-complement varints
        return raw - (1 << 64) if raw >= (1 << 63) else raw
    if t in (_T_UINT32, _T_UINT64):
        return raw
    raise ValueError(f"protobuf: unsupported field type {t}")


def _unpack_packed(fd: FieldDesc, raw: bytes, enums: dict) -> list:
    out = []
    pos = 0
    if fd.type in _VARINT_TYPES:
        while pos < len(raw):
            v, pos = _read_varint(raw, pos)
            out.append(_scalar(fd, 0, v, enums))
    elif fd.type in _FIXED64_TYPES:
        for i in range(0, len(raw), 8):
            out.append(_scalar(fd, 1, raw[i:i + 8], enums))
    elif fd.type in _FIXED32_TYPES:
        for i in range(0, len(raw), 4):
            out.append(_scalar(fd, 5, raw[i:i + 4], enums))
    else:
        raise ValueError("protobuf: packed encoding on non-scalar field")
    return out


def decode_message(data: bytes, message: str, msgs: dict, enums: dict) -> dict:
    """Decode one message by full name against the parsed descriptors."""
    fields = msgs[message]
    out: dict[str, Any] = {}
    for fd in fields.values():
        if fd.repeated:
            out[fd.name] = []
    for fno, wt, raw in iter_fields(data):
        fd = fields.get(fno)
        if fd is None:
            continue  # unknown field: skip (forward compat)
        if fd.type == _T_MESSAGE:
            v = decode_message(raw, fd.type_name, msgs, enums)
        elif fd.repeated and wt == 2 and fd.type not in (_T_STRING, _T_BYTES):
            out[fd.name].extend(_unpack_packed(fd, raw, enums))
            continue
        else:
            v = _scalar(fd, wt, raw, enums)
        if fd.repeated:
            out[fd.name].append(v)
        else:
            out[fd.name] = v
    return out


# ----------------------------------------------------- spark schema

def message_to_spark_type(message: str, msgs: dict):
    from pyspark.sql import types as T

    spark_of = {
        _T_DOUBLE: T.DoubleType(), _T_FLOAT: T.FloatType(),
        _T_INT64: T.LongType(), _T_UINT64: T.LongType(),
        _T_INT32: T.IntegerType(), _T_FIXED64: T.LongType(),
        _T_FIXED32: T.LongType(), _T_BOOL: T.BooleanType(),
        _T_STRING: T.StringType(), _T_BYTES: T.BinaryType(),
        _T_UINT32: T.LongType(), _T_ENUM: T.StringType(),
        _T_SFIXED32: T.IntegerType(), _T_SFIXED64: T.LongType(),
        _T_SINT32: T.IntegerType(), _T_SINT64: T.LongType(),
    }
    fields = []
    for fd in sorted(msgs[message].values(), key=lambda f: f.number):
        if fd.type == _T_MESSAGE:
            dt = message_to_spark_type(fd.type_name, msgs)
        else:
            dt = spark_of[fd.type]
        if fd.repeated:
            dt = T.ArrayType(dt)
        fields.append(T.StructField(fd.name, dt, True))
    return T.StructType(fields)


# ----------------------------------------------------- encoder (tests)

def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fno: int, wt: int) -> bytes:
    return _varint((fno << 3) | wt)


def enc_varint(fno: int, v: int) -> bytes:
    return _tag(fno, 0) + _varint(v)


def enc_len(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _varint(len(payload)) + payload


def enc_str(fno: int, s: str) -> bytes:
    return enc_len(fno, s.encode("utf-8"))


def enc_fixed64(fno: int, raw: bytes) -> bytes:
    return _tag(fno, 1) + raw


def enc_fixed32(fno: int, raw: bytes) -> bytes:
    return _tag(fno, 5) + raw
