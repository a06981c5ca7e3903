"""Pure-Python Avro binary codec (decoder + test encoder).

The reference decodes Avro-binary payload cells via the Avro Java
library (wrangler-core codec/BinaryAvroDecoder.java); Spark's own
`from_avro` needs the spark-avro connector jar, absent in this
container. Avro's binary encoding is simple enough to implement
directly from the public spec (zigzag varints + length-prefixed bytes):
this module supports records, all primitives, unions, arrays, maps,
enums and fixed — enough for the wrangler parse-as-avro surface.

Used by parse-as-avro binary mode as an Arrow-batched pandas-UDF
fallback when the connector jar is unavailable (never per-row Python
at the Spark API level — batches stream through the UDF).
"""

from __future__ import annotations

import json
import struct
from typing import Any


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("avro: truncated input")
        self.pos += n
        return b

    def read_long(self) -> int:
        # zigzag varint
        shift = 0
        acc = 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.read_long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read(r.read_long())
        if t == "string":
            return r.read(r.read_long()).decode("utf-8")
        raise ValueError(f"avro: unknown primitive {t!r}")
    if isinstance(schema, list):  # union: branch index then value
        idx = r.read_long()
        return _decode(r, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte size
                r.read_long()
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read(r.read_long()).decode("utf-8")
                out[k] = _decode(r, schema["values"])
        return out
    # named/nested type given as {"type": <primitive-or-complex>}
    return _decode(r, t)


def decode(payload: bytes, schema: Any) -> Any:
    """Decode one Avro-binary datum against `schema` (parsed JSON)."""
    return _decode(_Reader(payload), schema)


def decode_stream(payload: bytes, schema: Any) -> list:
    """Decode a buffer of CONCATENATED Avro-binary datums — the
    reference's BinaryAvroDecoder.decode returns one Row per datum
    until the bytes are exhausted (BinaryAvroDecoderTest writes two
    records into one stream)."""
    r = _Reader(payload)
    out = []
    while r.pos < len(payload):
        out.append(_decode(r, schema))
    return out


# --------------------------------------------------------------- encoder
# (test fixtures and round-trip checks)

def _zigzag(n: int) -> bytes:
    acc = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(value: Any, schema: Any) -> bytes:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return b""
        if t == "boolean":
            return b"\x01" if value else b"\x00"
        if t in ("int", "long"):
            return _zigzag(int(value))
        if t == "float":
            return struct.pack("<f", float(value))
        if t == "double":
            return struct.pack("<d", float(value))
        if t == "bytes":
            return _zigzag(len(value)) + bytes(value)
        if t == "string":
            b = value.encode("utf-8")
            return _zigzag(len(b)) + b
        raise ValueError(f"avro: unknown primitive {t!r}")
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if value is None and bt == "null":
                return _zigzag(i)
            if value is not None and bt != "null":
                return _zigzag(i) + _encode(value, branch)
        raise ValueError("avro: no union branch matches value")
    t = schema["type"]
    if t == "record":
        return b"".join(_encode(value[f["name"]], f["type"]) for f in schema["fields"])
    if t == "enum":
        return _zigzag(schema["symbols"].index(value))
    if t == "fixed":
        return bytes(value)
    if t == "array":
        body = b"".join(_encode(v, schema["items"]) for v in value)
        return (_zigzag(len(value)) + body + _zigzag(0)) if value else _zigzag(0)
    if t == "map":
        parts = []
        for k, v in value.items():
            kb = k.encode("utf-8")
            parts.append(_zigzag(len(kb)) + kb + _encode(v, schema["values"]))
        return (_zigzag(len(value)) + b"".join(parts) + _zigzag(0)) if value else _zigzag(0)
    return _encode(value, t)


def encode(value: Any, schema: Any) -> bytes:
    """Encode one datum as Avro binary (test fixtures / round trips).
    Named type references are resolved against a copy, so the caller's
    schema dict stays unmutated."""
    import copy

    return _encode(value, resolve_named(copy.deepcopy(schema)))


# ------------------------------------------------- object container files
# (Avro OCF per the public spec: magic, metadata map with avro.schema /
# avro.codec, 16-byte sync marker, then blocks of count+size+data+sync.)

_OCF_MAGIC = b"Obj\x01"


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def resolve_named(schema):
    """Resolve NAMED TYPE REFERENCES in a parsed Avro schema in place:
    a record/enum/fixed defined once may later be referenced by its
    (fully qualified) name as a plain string — e.g. cdap-log.avro's
    repeated 'java.lang.StackTraceElement'. References are rewritten to
    the shared definition dict; an id-based seen-set guards against
    re-walking (and self-referential records)."""
    defs: dict[str, Any] = {}

    def full(name: str, ns: str | None) -> str:
        return name if "." in name or not ns else f"{ns}.{name}"

    def collect(s, ns):
        if isinstance(s, list):
            for b in s:
                collect(b, ns)
        elif isinstance(s, dict):
            t = s.get("type")
            ns2 = s.get("namespace", ns)
            if t in ("record", "enum", "fixed"):
                defs[full(s["name"], ns2)] = s
                defs.setdefault(s["name"], s)
                if t == "record":
                    for f in s.get("fields", []):
                        collect(f["type"], ns2)
            elif t == "array":
                collect(s.get("items"), ns2)
            elif t == "map":
                collect(s.get("values"), ns2)
            elif isinstance(t, (dict, list)):
                collect(t, ns2)

    seen: set[int] = set()  # id-based re-walk guard (self-referential records)

    def rewrite(s, ns):
        if isinstance(s, str):
            if s in _PRIMITIVES:
                return s
            hit = defs.get(s) or defs.get(full(s, ns))
            if hit is None:
                raise ValueError(f"avro: unresolved named type {s!r}")
            return rewrite(hit, ns)
        if isinstance(s, list):
            return [rewrite(b, ns) for b in s]
        if isinstance(s, dict):
            if id(s) in seen:
                return s
            seen.add(id(s))
            t = s.get("type")
            ns2 = s.get("namespace", ns)
            if t == "record":
                for f in s.get("fields", []):
                    f["type"] = rewrite(f["type"], ns2)
            elif t == "array":
                s["items"] = rewrite(s["items"], ns2)
            elif t == "map":
                s["values"] = rewrite(s["values"], ns2)
            elif isinstance(t, (dict, list, str)) and t not in (
                "enum", "fixed", *_PRIMITIVES
            ):
                s["type"] = rewrite(t, ns2)
            return s
        return s

    collect(schema, None)
    return rewrite(schema, None)


def read_container(data: bytes):
    """Decode an Avro Object Container File → (schema, records).
    Codecs: null, deflate (raw zlib). Named type references are
    resolved before decoding."""
    import json
    import zlib

    r = _Reader(data)
    if r.read(4) != _OCF_MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            r.read_long()
            n = -n
        for _ in range(n):
            k = r.read(r.read_long()).decode("utf-8")
            meta[k] = r.read(r.read_long())
    sync = r.read(16)
    schema = resolve_named(json.loads(meta["avro.schema"].decode("utf-8")))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records = []
    while r.pos < len(data):
        cnt = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"avro: unsupported container codec {codec!r}")
        br = _Reader(block)
        for _ in range(cnt):
            records.append(_decode(br, schema))
        if r.read(16) != sync:
            raise ValueError("avro: bad sync marker")
    return schema, records


def write_container(records, schema, codec: str = "null", sync: bytes = b"0123456789abcdef") -> bytes:
    """Encode records as an Avro OCF (test fixtures / round trips).
    The file's avro.schema metadata keeps the caller's schema verbatim;
    encoding runs against a named-reference-resolved copy."""
    import copy
    import json
    import zlib

    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    out = bytearray(_OCF_MAGIC)
    out += _zigzag(len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        out += _zigzag(len(kb)) + kb + _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    enc_schema = resolve_named(copy.deepcopy(schema))
    body = b"".join(_encode(rec, enc_schema) for rec in records)
    if codec == "deflate":
        co = zlib.compressobj(level=6, wbits=-15)
        body = co.compress(body) + co.flush()
    out += _zigzag(len(records)) + _zigzag(len(body)) + body + sync
    return bytes(out)


# ------------------------------------------------- logical-type surfacing

def to_jsonable(v: Any, schema: Any) -> Any:
    """Schema-aware conversion of a decoded datum to JSON-compatible
    values that Spark's from_json parses back into the types
    avro_to_spark_type declares: decimals as plain strings, dates as
    ISO dates, timestamps as ISO instants, bytes/fixed as base64
    (reference utils/SchemaConverter.java logical-type mapping)."""
    import base64
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(schema, list):
        branches = [b for b in schema if b != "null"]
        return to_jsonable(v, branches[0]) if branches else None
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        t = schema["type"]
        if lt == "decimal":
            unscaled = int.from_bytes(bytes(v), "big", signed=True)
            return str(decimal.Decimal(unscaled).scaleb(-int(schema.get("scale", 0))))
        if lt == "date":
            return (datetime.date(1970, 1, 1) + datetime.timedelta(days=v)).isoformat()
        if lt in (
            "timestamp-millis", "timestamp-micros",
            "local-timestamp-millis", "local-timestamp-micros",
        ):
            us = v * 1000 if lt.endswith("millis") else v
            dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)
            return dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + (
                "Z" if lt.startswith("timestamp") else ""
            )
        if lt in ("time-millis", "time-micros"):
            return v * 1000 if lt == "time-millis" else v
        if t == "record":
            return {
                f["name"]: to_jsonable(v.get(f["name"]), f["type"])
                for f in schema["fields"]
            }
        if t == "array":
            return [to_jsonable(x, schema["items"]) for x in v]
        if t == "map":
            return {k: to_jsonable(x, schema["values"]) for k, x in v.items()}
        if t == "fixed":
            return base64.b64encode(bytes(v)).decode("ascii")
        if t == "enum":
            return v
        return to_jsonable(v, t)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    return v


def _union_branch(schema: Any, v: Any) -> Any:
    """Pick the union branch describing a decoded value (null branch for
    None; else the first matching non-null branch)."""
    if not isinstance(schema, list):
        return schema
    branches = [b for b in schema if b != "null"]
    if v is None or not branches:
        return "null"
    if len(branches) == 1:
        return branches[0]
    for b in branches:
        t = b.get("type") if isinstance(b, dict) else b
        if isinstance(v, dict) and t in ("record", "map"):
            return b
        if isinstance(v, list) and t == "array":
            return b
        if isinstance(v, str) and t in ("string", "enum"):
            return b
        if isinstance(v, bool) and t == "boolean":
            return b
        if isinstance(v, int) and t in ("int", "long"):
            return b
        if isinstance(v, float) and t in ("float", "double"):
            return b
        if isinstance(v, (bytes, bytearray)) and t in ("bytes", "fixed"):
            return b
    return branches[0]


def flatten_reference(rec: dict, schema: dict, out: dict | None = None,
                      prefix: str | None = None) -> dict:
    """Flatten a decoded record the way the reference's
    parser/ParseAvroFile.java:133-150 `add()` does: a PRESENT nested
    record recurses with `parent_field` names; maps and arrays become
    one compact-JSON column (gson.toJson parity); a null nested record
    stays a single null column; scalars pass through. Value-driven, so
    a recursive schema (ThrowableProxyVO.cause) flattens to exactly the
    depth present in the data — which a fixed Spark struct type cannot
    express."""
    import json

    if out is None:
        out = {}
    for f in schema["fields"]:
        name = f["name"]
        col = f"{prefix}_{name}" if prefix else name
        v = rec.get(name)
        b = _union_branch(f["type"], v)
        if (
            isinstance(v, dict)
            and isinstance(b, dict)
            and b.get("type") == "record"
        ):
            flatten_reference(v, b, out, col)
        elif isinstance(v, (dict, list)):
            out[col] = json.dumps(v, separators=(",", ":"), default=str)
        elif isinstance(v, (bytes, bytearray)):
            out[col] = bytes(v)
        else:
            out[col] = v
    return out


# ---------------------------------------------------------------- avro-json
# reference: codec/JsonAvroDecoder.java — Avro's OFFICIAL JSON encoding
# (the org.apache.avro JsonEncoder output): union values wrap in a
# one-key object named for the branch ({"int": 8}); null is bare; a
# payload may carry MANY concatenated json datums (the decoder loops
# until EOF).


def split_json_stream(text: str) -> list[str]:
    """Split concatenated top-level JSON values (brace/bracket depth
    scanner, string- and escape-aware)."""
    out: list[str] = []
    depth = 0
    start = None
    in_str = False
    esc = False
    for i, ch in enumerate(text):
        if esc:
            esc = False
            continue
        if in_str:
            if ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
            if start is None:
                start = i
            continue
        if ch in "{[":
            if depth == 0 and start is None:
                start = i
            depth += 1
        elif ch in "}]":
            depth -= 1
            if depth == 0 and start is not None:
                out.append(text[start : i + 1])
                start = None
        elif depth == 0 and start is None and not ch.isspace():
            start = i  # bare scalar datum
    if start is not None and depth == 0:
        tail = text[start:].strip()
        if tail:
            out.append(tail)
    return out


def _branch_names(branch) -> set[str]:
    if isinstance(branch, str):
        return {branch}
    if isinstance(branch, dict):
        t = branch.get("type")
        if t in ("record", "enum", "fixed"):
            name = branch.get("name", "")
            ns = branch.get("namespace")
            names = {name}
            if ns and "." not in name:
                names.add(f"{ns}.{name}")
            return names
        if isinstance(t, str):
            return {t}
    return set()


def from_avro_json(obj, schema):
    """Decode one Avro-JSON-encoded value into the plain-JSON shape
    (unions unwrapped) that from_json parses into the Spark type."""
    if isinstance(schema, list):  # union
        if obj is None:
            return None
        if isinstance(obj, dict) and len(obj) == 1:
            (k, v), = obj.items()
            for br in schema:
                if k in _branch_names(br):
                    return from_avro_json(v, br)
        # lenient: an unwrapped value decodes against the first
        # non-null branch (hand-written json, not avro-encoded)
        for br in schema:
            if br != "null":
                return from_avro_json(obj, br)
        return obj
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record" and isinstance(obj, dict):
            return {
                f["name"]: from_avro_json(obj.get(f["name"]), f["type"])
                for f in schema.get("fields", [])
            }
        if t == "array" and isinstance(obj, list):
            return [from_avro_json(x, schema.get("items")) for x in obj]
        if t == "map" and isinstance(obj, dict):
            return {k: from_avro_json(v, schema.get("values")) for k, v in obj.items()}
        if isinstance(t, (dict, list, str)) and t not in (
            "record", "enum", "fixed", "array", "map", *_PRIMITIVES
        ):
            return from_avro_json(obj, t)
    return obj


def decode_json_stream(text: str, schema) -> list:
    """All concatenated Avro-JSON datums of one payload, decoded."""
    return [from_avro_json(json.loads(part), schema) for part in split_json_stream(text)]
