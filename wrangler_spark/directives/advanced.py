"""Remaining directive surface: transient variables, currency, avro,
excel/hl7 (gated), JSON-schema validation, stemming, HTTP enrichment,
data-model mapping (SURVEY.md §2.2/2.5/2.9/2.10).
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from wrangler_spark.errors import UsageError
from wrangler_spark.expr.jexl import TypedCol, compile_expr, compile_node, parse_expr
from wrangler_spark.recipe.parser import DirectiveCall
from wrangler_spark.recipe.registry import RecipeContext, directive
from wrangler_spark.directives.column_ops import _require


# ------------------------------------------------------- transient variables
# reference: aggregates/SetTransientVariable.java, IncrementTransientVariable,
# DefaultTransientStore.java:35-90. In the production pipeline the store is
# per-record (GLOBAL resets per input record, Wrangler.java:424-425), so a
# variable is a named per-row expression — exactly a named Column here.
# Order-dependent cross-row accumulation (interactive workspace only) is out
# of scope and documented as such (SURVEY.md §4 item 3).

@directive("set-variable")
def set_variable(call: DirectiveCall):
    var = call.col(0)
    expr_src = call.expr(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        node = parse_expr(expr_src)
        ctx.variables[var.lower()] = compile_node(node, df.schema, ctx.variables)
        return df

    return tr


@directive("increment-variable")
def increment_variable(call: DirectiveCall):
    var = call.col(0)
    amount = call.num(1)
    expr_src = call.expr(2)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        cond = compile_expr(expr_src, df.schema, ctx.variables).cast("boolean")
        prev = ctx.variables.get(var.lower())
        base = prev.col if prev is not None else F.lit(0)
        ctx.variables[var.lower()] = TypedCol(
            base + F.when(F.coalesce(cond, F.lit(False)), F.lit(amount)).otherwise(F.lit(0)),
            T.DoubleType() if isinstance(amount, float) else T.LongType(),
        )
        return df

    return tr


# ------------------------------------------------------------- currency
# reference: currency/ParseAsCurrency.java, FormatAsCurrency.java (java
# NumberFormat). babel is unavailable; we support the common locales with
# explicit symbol/grouping rules — pure Column ops.

_CURRENCY = {
    "en_us": {"symbol": "$", "group": ",", "dec": "."},
    "en_gb": {"symbol": "£", "group": ",", "dec": "."},
    "en_ie": {"symbol": "€", "group": ",", "dec": "."},  # FormatAsCurrencyTest.testUSDToEUR
    "de_de": {"symbol": "€", "group": ".", "dec": ","},
    "fr_fr": {"symbol": "€", "group": " ", "dec": ","},
}


@directive("parse-as-currency")
def parse_as_currency(call: DirectiveCall):
    src, dst = call.col(0), call.col(1)
    locale = call.text(2, default="en_US").lower().replace("-", "_")
    spec = _CURRENCY.get(locale)
    if spec is None:
        raise UsageError(f"parse-as-currency: unsupported locale {locale!r}")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, src)
        raw = F.col(c).cast("string")
        # Java NumberFormat.getCurrencyInstance REQUIRES the currency
        # symbol — a bare "1234.56" throws ParseException and the row
        # routes to the error channel (ParseAsCurrencyTest: 7 parse,
        # 1 error). Valid: optional (...) negatives, symbol, grouped
        # digits, optional decimal part.
        g, d, sym = re.escape(spec["group"]), re.escape(spec["dec"]), re.escape(spec["symbol"])
        valid_re = rf"^\s*\(?\s*-?{sym}\s*[\d{g}]+({d}\d+)?\s*\)?\s*$"
        bad = raw.isNotNull() & ~raw.rlike(valid_re)
        df = ctx.route_error(
            df, bad, f"parse-as-currency: value not parseable as {locale} currency"
        )
        s = F.regexp_replace(raw, r"[^\d" + re.escape(spec["group"] + spec["dec"]) + r"\-()]", "")
        neg = raw.rlike(r"^\(.*\)$") | s.startswith("-")
        s = F.regexp_replace(s, r"[()\-]", "")
        s = F.replace(s, F.lit(spec["group"]), F.lit(""))
        if spec["dec"] != ".":
            s = F.replace(s, F.lit(spec["dec"]), F.lit("."))
        v = s.cast("double")
        return df.withColumn(dst, F.when(neg, -v).otherwise(v))

    return tr


@directive("format-as-currency")
def format_as_currency(call: DirectiveCall):
    src, dst = call.col(0), call.col(1)
    locale = call.text(2, default="en_US").lower().replace("-", "_")
    spec = _CURRENCY.get(locale)
    if spec is None:
        raise UsageError(f"format-as-currency: unsupported locale {locale!r}")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, src)
        v = F.col(c).cast("double")
        formatted = F.format_number(v, 2)  # 1,234.57 (en_US grouping)
        if spec["group"] != "," or spec["dec"] != ".":
            formatted = F.translate(formatted, ",.", spec["group"] + spec["dec"])
        return df.withColumn(dst, F.concat(F.lit(spec["symbol"]), formatted))

    return tr


# ------------------------------------------------------------- avro/protobuf
# reference: parser/ParseAvro.java (codec/{Binary,Json}AvroDecoder),
# ParseAvroFile.java, ParseProtobuf.java. The spark-avro / protobuf connector
# jars are not bundled in this environment, so binary decode is gated with a
# clear error; the JSON-encoded-Avro mode decodes natively via from_json with
# a schema translated from the Avro schema JSON.

_AVRO_PRIMITIVES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}


def _connector_missing(e: Exception) -> bool:
    """True iff the error is the connector-jar-absent signature (the
    only condition under which the pure-Python decode fallbacks should
    engage). Genuine errors with the jar present — bad schema, wrong
    descriptor path, malformed path list — must SURFACE, not silently
    switch decode engines with an undisclosed perf cliff."""
    if isinstance(e, ImportError):
        return True
    msg = str(e)
    return any(
        marker in msg
        for marker in (
            "NOT_LOADED_SQL_FUNCTIONS_UNUSABLE",   # AVRO_/PROTOBUF_ error class
            "Failed to find data source",           # .format("avro") without jar
            "DATA_SOURCE_NOT_FOUND",
            "ClassNotFoundException",
            "NoClassDefFoundError",
        )
    )


def avro_to_spark_type(avro) -> T.DataType:
    if isinstance(avro, str):
        return _AVRO_PRIMITIVES.get(avro, T.StringType())
    if isinstance(avro, list):  # union — first non-null branch
        branches = [b for b in avro if b != "null"]
        return avro_to_spark_type(branches[0]) if branches else T.NullType()
    if isinstance(avro, dict):
        t = avro.get("type")
        # Avro logical types (reference utils/SchemaConverter.java:118-143:
        # BigDecimal → decimal(p,s), LocalDate → DATE, timestamps → micros)
        lt = avro.get("logicalType")
        if lt == "decimal":
            return T.DecimalType(int(avro.get("precision", 38)), int(avro.get("scale", 0)))
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType()
        if lt in ("local-timestamp-millis", "local-timestamp-micros"):
            return T.TimestampNTZType()
        if lt in ("time-millis", "time-micros"):
            # Spark has no TIME type: micros-since-midnight as long
            # (SURVEY §7 hard part (d))
            return T.LongType()
        if t == "record":
            return T.StructType(
                [
                    T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
                    for f in avro.get("fields", [])
                ]
            )
        if t == "array":
            return T.ArrayType(avro_to_spark_type(avro["items"]), True)
        if t == "map":
            return T.MapType(T.StringType(), avro_to_spark_type(avro["values"]), True)
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        return avro_to_spark_type(t)
    raise UsageError(f"unsupported avro schema node {avro!r}")


def _ts_wire_type(dt: T.DataType) -> T.DataType:
    """Wire schema for from_json under timeParserPolicy=LEGACY: timestamp
    slots become strings (legacy SimpleDateFormat reads an .SSSSSS
    fraction as integer milliseconds), and the parsed struct is CAST back
    to the real type — string→timestamp CAST goes through Spark's
    policy-independent ISO parser, which is micros-exact."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return T.StringType()
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _ts_wire_type(f.dataType), f.nullable) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_ts_wire_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(dt.keyType, _ts_wire_type(dt.valueType), dt.valueContainsNull)
    return dt


def _from_json_exact(col, spark_type: T.DataType):
    wire = _ts_wire_type(spark_type)
    parsed = F.from_json(col, wire)
    return parsed.cast(spark_type) if wire != spark_type else parsed


@directive("parse-as-avro")
def parse_as_avro(call: DirectiveCall):
    """parse-as-avro :col <schema-json-or-registry-id> json|binary [version]"""
    col = call.col(0)
    schema_arg = call.text(1)
    mode = call.ident(2, default="json").lower()

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        schema_json = schema_arg
        if not schema_arg.strip().startswith("{"):
            if schema_arg not in ctx.lookups and f"schema:{schema_arg}" not in ctx.lookups:
                raise UsageError(
                    f"parse-as-avro: schema {schema_arg!r} not registered "
                    "(pass the Avro schema JSON inline or register it in ctx.lookups)"
                )
            lk = ctx.lookups.get(f"schema:{schema_arg}") or ctx.lookups[schema_arg]
            schema_json = lk if isinstance(lk, str) else lk.first()[0]
        spark_type = avro_to_spark_type(json.loads(schema_json))
        if mode == "json":
            # Avro's OFFICIAL json encoding (JsonAvroDecoderTest): union
            # values wrap in {"branch": value} one-key objects and one
            # payload may carry many concatenated datums. Arrow-batched
            # unwrap to a plain-JSON array, then native from_json +
            # explode. (Plain per-row JSON without avro framing decodes
            # identically — the unwrap is shape-preserving for it.)
            from wrangler_spark.directives._avro_binary import (
                decode_json_stream as _avro_json_stream,
            )

            avro_schema_j = json.loads(schema_json)

            @pandas_udf(T.StringType())
            def _jdec(s: pd.Series) -> pd.Series:
                def one(t):
                    if t is None:
                        return None
                    return json.dumps(_avro_json_stream(t, avro_schema_j))

                return s.map(one)

            arr = _from_json_exact(_jdec(F.col(c).cast("string")), T.ArrayType(spark_type))
            out = df.withColumn("__wr_avro", F.explode_outer(arr))
            if isinstance(spark_type, T.StructType):
                for f_ in spark_type.fields:
                    out = out.withColumn(f"{c}_{f_.name}", F.col("__wr_avro").getField(f_.name))
            else:
                out = out.withColumn(f"{c}_value", F.col("__wr_avro"))
            return out.drop("__wr_avro").drop(c)
        elif mode == "binary":
            # The reference's BinaryAvroDecoder loops datums until EOF —
            # one payload can carry MANY concatenated binary records
            # (ParseAvroTest.testAvroBinaryRecordReadWrite). spark-avro's
            # from_avro is one-datum-per-value and cannot express that,
            # so binary mode uses the pure-Python stream decoder
            # (directives/_avro_binary.py), Arrow-batched: decode each
            # payload to a JSON ARRAY of records (schema-aware — logical
            # types surface as what from_json parses back into the
            # declared Spark types), then native from_json + explode.
            from wrangler_spark.directives._avro_binary import (
                decode_stream as _avro_decode_stream,
                to_jsonable as _to_jsonable,
            )

            avro_schema = json.loads(schema_json)

            @pandas_udf(T.StringType())
            def _dec(s: pd.Series) -> pd.Series:
                return pd.Series(
                    [
                        json.dumps(
                            [
                                _to_jsonable(rec, avro_schema)
                                for rec in _avro_decode_stream(bytes(v), avro_schema)
                            ]
                        )
                        if v is not None
                        else None
                        for v in s
                    ]
                )

            arr = _from_json_exact(_dec(F.col(c)), T.ArrayType(spark_type))
            out = df.withColumn("__wr_avro", F.explode_outer(arr))
            if isinstance(spark_type, T.StructType):
                for f_ in spark_type.fields:
                    out = out.withColumn(f"{c}_{f_.name}", F.col("__wr_avro").getField(f_.name))
            else:
                out = out.withColumn(f"{c}_value", F.col("__wr_avro"))
            return out.drop("__wr_avro").drop(c)
        else:
            raise UsageError(f"parse-as-avro: mode must be json|binary, got {mode!r}")

    return tr


@directive("parse-as-avro-file")
def parse_as_avro_file(call: DirectiveCall):
    """parse-as-avro-file :col — col holds a file path; becomes a scan
    (reference parser/ParseAvroFile.java reads the blob per row; file-level
    decode is a scan in Spark — spark.read.format('avro'))."""
    col = call.col(0)

    MAX_PATHS = 100_000  # driver-memory guard on the path collect

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        if isinstance(df.schema[c].dataType, T.BinaryType):
            # the reference's own form: the column HOLDS the OCF bytes
            # (parser/ParseAvroFile.java:88-112 decodes the blob per row
            # and flattens each GenericRecord value-wise, add():133-150;
            # ParseAvroFileTest drives cdap-log.avro payloads). The
            # flatten is value-driven — a recursive schema like
            # ThrowableProxyVO.cause expands only to the depth present —
            # so the output schema is the first payload's column UNION
            # (driver peek at compile time); blocks decode Arrow-batched.
            from collections.abc import Iterator

            from wrangler_spark.directives._avro_binary import (
                flatten_reference, read_container,
            )

            first = df.select(c).filter(F.col(c).isNotNull()).limit(1).collect()
            if not first:
                raise UsageError("parse-as-avro-file: no non-null payload")
            try:
                schema_avro, peek_recs = read_container(bytes(first[0][0]))
            except Exception as e:  # noqa: BLE001
                # not an Avro container -> compile-time failure, the
                # reference's RecipeException (testIncorrectType)
                raise UsageError(
                    f"parse-as-avro-file: column '{c}' does not hold an "
                    f"Avro object container file ({e})"
                ) from None

            # column union in first-seen order, typed by observed values
            cols: dict[str, T.DataType] = {}
            for rec in peek_recs:
                for k, v in flatten_reference(rec, schema_avro).items():
                    t = cols.get(k)
                    if t is None or isinstance(t, T.NullType):
                        if isinstance(v, bool):
                            t = T.BooleanType()
                        elif isinstance(v, int):
                            t = T.LongType()
                        elif isinstance(v, float):
                            t = T.DoubleType()
                        elif isinstance(v, bytes):
                            t = T.BinaryType()
                        elif isinstance(v, str):
                            t = T.StringType()
                        else:
                            t = T.NullType()
                        cols[k] = t
            out_schema = T.StructType([
                T.StructField(
                    k,
                    T.StringType() if isinstance(t, T.NullType) else t,
                    True,
                )
                for k, t in cols.items()
            ])
            names = list(cols)

            def run_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    rows = []
                    for blob in pdf[c]:
                        sch, recs = read_container(bytes(blob))
                        rows.extend(flatten_reference(r, sch) for r in recs)
                    yield pd.DataFrame(
                        {k: [r.get(k) for r in rows] for k in names},
                        dtype=object,
                    )

            return df.select(c).mapInPandas(run_payload, out_schema)

        # the path column is inherently driver-side (it becomes the scan's
        # file list), but an unbounded distinct().collect() could OOM the
        # driver if pointed at a data column by mistake — cap it and fail
        # loudly instead
        path_rows = (
            df.select(F.col(col).cast("string"))
            .distinct()
            .limit(MAX_PATHS + 1)
            .collect()
        )
        if len(path_rows) > MAX_PATHS:
            raise UsageError(
                f"parse-as-avro-file: more than {MAX_PATHS} distinct paths in "
                f"column '{col}' — is this really a file-path column?"
            )
        paths = [r[0] for r in path_rows]
        try:
            return ctx.spark.read.format("avro").load(paths)
        except Exception as probe_err:  # noqa: BLE001
            if not _connector_missing(probe_err):
                raise  # jar present — bad paths etc. must surface
            # no spark-avro jar → binaryFile scan + pure-Python Avro OCF
            # decode (directives/_avro_binary.py), Arrow-batched. One
            # file's header is fetched driver-side for the schema (pure
            # metadata); data blocks decode inside mapInPandas.
            from collections.abc import Iterator

            from wrangler_spark.directives._avro_binary import read_container, to_jsonable

            head = (
                ctx.spark.read.format("binaryFile").load(paths[0]).select("content").first()
            )
            schema_avro, _ = read_container(bytes(head["content"]))
            spark_type = avro_to_spark_type(schema_avro)

            def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    out = []
                    for blob in pdf["content"]:
                        sch, recs = read_container(bytes(blob))
                        out.extend(json.dumps(to_jsonable(r, sch)) for r in recs)
                    yield pd.DataFrame({"json": out})

            bf = ctx.spark.read.format("binaryFile").load(paths).select("content")
            js = bf.mapInPandas(run, "json string")
            return js.select(_from_json_exact(F.col("json"), spark_type).alias("__r")).select("__r.*")

    return tr


@directive("parse-as-protobuf")
def parse_as_protobuf(call: DirectiveCall):
    """parse-as-protobuf :col <descriptor-set-file> <message-full-name>

    Uses spark-protobuf's from_protobuf when the jar is available;
    otherwise decodes through the pure-Python wire-format reader
    (directives/_protobuf.py) driven by the same FileDescriptorSet —
    Arrow-batched, rows surface via from_json with the translated
    schema (reference parser/ParseProtobuf.java + its registry
    descriptor decode)."""
    col = call.col(0)
    desc = call.text(1)
    message = call.text(2)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        try:
            from pyspark.sql.protobuf.functions import from_protobuf

            parsed = from_protobuf(F.col(c), message, descFilePath=desc)
            df.limit(0).withColumn("__wr_probe", parsed)  # eager analysis probe
            return df.withColumn(c, parsed)
        except Exception as probe_err:  # noqa: BLE001
            if not _connector_missing(probe_err):
                raise  # jar present — bad descriptor/message must surface
            import base64 as _b64

            from wrangler_spark.directives._protobuf import (
                decode_message,
                message_to_spark_type,
                parse_descriptor_set,
            )

            with open(desc, "rb") as fh:
                msgs, enums = parse_descriptor_set(fh.read())
            if message not in msgs:
                raise UsageError(
                    f"parse-as-protobuf: message {message!r} not in descriptor set "
                    f"(have: {sorted(msgs)})"
                )
            spark_type = message_to_spark_type(message, msgs)

            def _jsonable(v):
                if isinstance(v, (bytes, bytearray)):
                    return _b64.b64encode(bytes(v)).decode("ascii")
                if isinstance(v, dict):
                    return {k: _jsonable(x) for k, x in v.items()}
                if isinstance(v, list):
                    return [_jsonable(x) for x in v]
                return v

            @pandas_udf(T.StringType())
            def _dec(s: pd.Series) -> pd.Series:
                return pd.Series(
                    [
                        json.dumps(_jsonable(decode_message(bytes(v), message, msgs, enums)))
                        if v is not None
                        else None
                        for v in s
                    ]
                )

            return df.withColumn(c, _from_json_exact(_dec(F.col(c)), spark_type))

    return tr


# ------------------------------------------------------------- excel / hl7

def _xlsx_rows(payload: bytes, sheet: str) -> list[list[str | None]]:
    """Pure-stdlib xlsx reader: an .xlsx is a zip of XML — workbook.xml
    names the sheets, sharedStrings.xml interns strings, and each
    worksheet's sheetData holds rows of typed cells. Covers inline/
    shared strings, numbers, booleans, and date-styled numeric cells
    (styles.xml numFmt detection + 1899-12-30 serial conversion) — the
    wrangler surface (reference ParseExcel.java reads cells as display
    values via POI's DataFormatter; ParseExcelTest.testDateFormatting)."""
    import io
    import re as _re
    import zipfile
    import xml.etree.ElementTree as ET

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    RELNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    zf = zipfile.ZipFile(io.BytesIO(payload))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    names = [s.get("name") for s in wb.iter(f"{NS}sheet")]
    # resolve each sheet's r:id through the workbook rels to its
    # worksheet part — workbook.xml sheet ORDER is not guaranteed to
    # match the numeric order of xl/worksheets/sheetN.xml (a workbook
    # with reordered sheets maps rId≠fileN), so numeric file order is
    # only the fallback when the rels part is absent
    rel_targets: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in zf.namelist():
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.iter():
            rid, target = rel.get("Id"), rel.get("Target")
            if rid and target:
                t = target.lstrip("/")
                rel_targets[rid] = t if t.startswith("xl/") else f"xl/{t}"
    numeric_files = sorted(
        (n for n in zf.namelist() if _re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(_re.search(r"(\d+)", n).group(1)),
    )
    # keep names and files PAIRED: a sheet whose r:id doesn't resolve
    # falls back to the numeric file at the same workbook position — it
    # must never silently shift later sheets onto the wrong files
    sheet_files: list[str | None] = []
    for pos, sh in enumerate(wb.iter(f"{NS}sheet")):
        rid = sh.get(f"{RELNS}id")
        if rid and rid in rel_targets:
            sheet_files.append(rel_targets[rid])
        elif pos < len(numeric_files):
            sheet_files.append(numeric_files[pos])
        else:
            sheet_files.append(None)
    if not sheet_files:  # workbook.xml listed no sheets
        sheet_files = list(numeric_files)
    if sheet.isdigit():
        idx = int(sheet)
    elif sheet in names:
        idx = names.index(sheet)
    else:
        # unknown sheet NAME must not silently fall back to sheet 0 —
        # the reference errors the row (ParseExcelTest.testNoSheetName)
        raise KeyError(f"parse-as-excel: sheet {sheet!r} not found")
    if idx >= len(sheet_files) or sheet_files[idx] is None:
        raise KeyError(f"parse-as-excel: sheet {sheet!r} not found")
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = ["".join(t.text or "" for t in si.iter(f"{NS}t")) for si in ss.iter(f"{NS}si")]

    # style index -> date format string (None = not a date format).
    # Builtin numFmtIds 14-22/45-47 are date/time; custom formats are
    # date-like when they contain y/m/d/h/s tokens outside "quoted"
    # literals and [bracketed] sections.
    _BUILTIN_DATE_FMTS = {
        14: "m/d/yy", 15: "d-mmm-yy", 16: "d-mmm", 17: "mmm-yy",
        18: "h:mm AM/PM", 19: "h:mm:ss AM/PM", 20: "h:mm",
        21: "h:mm:ss", 22: "m/d/yy h:mm",
        45: "mm:ss", 46: "[h]:mm:ss", 47: "mmss.0",
    }
    style_date_fmt: list[str | None] = []
    if "xl/styles.xml" in zf.namelist():
        st = ET.fromstring(zf.read("xl/styles.xml"))
        custom = {
            int(nf.get("numFmtId")): nf.get("formatCode", "")
            for nf in st.iter(f"{NS}numFmt")
            if nf.get("numFmtId")
        }

        def _is_date_fmt(code: str) -> bool:
            bare = _re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)
            return bool(_re.search(r"[ymdhs]", bare, _re.IGNORECASE)) and not _re.search(
                r"[#0?]", bare
            )

        cellxfs = st.find(f"{NS}cellXfs")
        for xf in (cellxfs.iter(f"{NS}xf") if cellxfs is not None else ()):
            fid = int(xf.get("numFmtId", "0"))
            if fid in _BUILTIN_DATE_FMTS:
                style_date_fmt.append(_BUILTIN_DATE_FMTS[fid])
            elif fid in custom and _is_date_fmt(custom[fid]):
                style_date_fmt.append(custom[fid])
            else:
                style_date_fmt.append(None)

    def _serial_to_text(raw: str, code: str) -> str:
        """Excel serial number → formatted date/time per the cell's
        number format (token-mapped subset of POI DataFormatter)."""
        import datetime as _dt

        try:
            serial = float(raw)
        except ValueError:
            return raw
        when = _dt.datetime(1899, 12, 30) + _dt.timedelta(days=serial)
        # a number format has up to four ;-separated sections
        # (positive;negative;zero;text) — a date cell renders through
        # the FIRST; the trailing ';@' text section must not leak into
        # the output (ParseExcelTest.testDateFormatting)
        code = code.split(";")[0]
        ampm = "AM/PM" in code.upper()
        bare = _re.sub(r'"[^"]*"|\[[^\]]*\]', "", code)
        # backslash-escaped literals ('d\ mmmm\ yyyy') emit the escaped
        # character itself
        bare = _re.sub(r"\\(.)", r"\1", bare)
        has_date = bool(_re.search(r"[yd]", bare, _re.IGNORECASE))
        out: list[str] = []
        i = 0
        lc = bare.lower()
        while i < len(bare):
            ch = lc[i]
            if bare[i] == '"':  # shouldn't remain, defensive
                i += 1
                continue
            if lc.startswith("am/pm", i):
                out.append(when.strftime("%p"))
                i += 5
                continue
            if ch in "ymdhs0":
                j = i
                while j < len(lc) and lc[j] == ch:
                    j += 1
                n = j - i
                if ch == "y":
                    out.append(when.strftime("%Y" if n >= 4 else "%y"))
                elif ch == "d":
                    # d/dd = day number, ddd/dddd = weekday name
                    if n >= 4:
                        out.append(when.strftime("%A"))
                    elif n == 3:
                        out.append(when.strftime("%a"))
                    else:
                        out.append(f"{when.day:02d}" if n >= 2 else str(when.day))
                elif ch == "m":
                    # month unless the nearest letter-token neighbor is
                    # h (before) or s (after) — the POI/Excel rule
                    prev_t = _re.search(r"([a-z])[^a-z]*$", lc[:i])
                    next_t = _re.match(r"[^a-z]*([a-z])", lc[j:])
                    if (prev_t and prev_t.group(1) == "h") or (
                        next_t and next_t.group(1) == "s"
                    ) or not has_date:
                        out.append(f"{when.minute:02d}" if n >= 2 else str(when.minute))
                    elif n >= 3:
                        out.append(when.strftime("%b" if n == 3 else "%B"))
                    else:
                        out.append(f"{when.month:02d}" if n >= 2 else str(when.month))
                elif ch == "h":
                    hr = when.hour % 12 or 12 if ampm else when.hour
                    out.append(f"{hr:02d}" if n >= 2 else str(hr))
                elif ch == "s":
                    out.append(f"{when.second:02d}" if n >= 2 else str(when.second))
                else:  # 0 — fractional seconds digits
                    out.append(f"{when.microsecond:06d}"[:n])
                i = j
                continue
            out.append(bare[i])
            i += 1
        return "".join(out)

    ws = ET.fromstring(zf.read(sheet_files[idx]))

    def col_idx(ref: str | None, fallback: int) -> int:
        if not ref:
            return fallback
        letters = "".join(ch for ch in ref if ch.isalpha())
        n = 0
        for ch in letters:
            n = n * 26 + (ord(ch.upper()) - 64)
        return n - 1 if n else fallback

    rows: list[list[str | None]] = []
    for row in ws.iter(f"{NS}row"):
        cells: list[str | None] = []
        for j, cell in enumerate(row.iter(f"{NS}c")):
            i = col_idx(cell.get("r"), j)
            while len(cells) <= i:
                cells.append(None)
            ctype = cell.get("t", "n")
            v = cell.find(f"{NS}v")
            if ctype == "inlineStr":
                is_ = cell.find(f"{NS}is")
                val = "".join(t.text or "" for t in is_.iter(f"{NS}t")) if is_ is not None else None
            elif v is None:
                val = None
            elif ctype == "s":
                val = shared[int(v.text)]
            elif ctype == "b":
                val = "True" if v.text == "1" else "False"
            else:
                val = v.text
                if ctype == "n" and val is not None:
                    sidx = cell.get("s")
                    if sidx is not None and sidx.isdigit() and int(sidx) < len(style_date_fmt):
                        fmt = style_date_fmt[int(sidx)]
                        if fmt:
                            val = _serial_to_text(val, fmt)
                        else:
                            val = _java_double_str(val)
                    else:
                        val = _java_double_str(val)
            cells[i] = val
        rows.append(cells)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def _java_double_str(text: str) -> str:
    """Render a numeric cell the way the reference does —
    `String.valueOf(cell.getNumericCellValue())` (ParseExcel.java:167):
    Java double toString gives "3.0" for 3, plain decimal in
    [1e-3, 1e7), scientific ("1.0E8") outside. Pinned by the
    Directive_parse_excel e2e golden ("8838.0", "12345.0")."""
    import math

    try:
        d = float(text)
    except (TypeError, ValueError):
        return text
    if math.isnan(d) or math.isinf(d):
        return str(d)
    m = abs(d)
    if m == 0.0:
        return "0.0" if math.copysign(1, d) > 0 else "-0.0"
    if 1e-3 <= m < 1e7:
        s = repr(d)
        return s if "." in s else s + ".0"
    exp = math.floor(math.log10(m))
    mant = d / (10.0 ** exp)
    ms = repr(mant)
    if "." not in ms:
        ms += ".0"
    return f"{ms}E{exp}"


def _xl_letters(n: int) -> list[str]:
    """Excel column letters A..Z, AA.. for n columns."""
    out = []
    for i in range(n):
        s, j = "", i
        while True:
            s = chr(65 + j % 26) + s
            j = j // 26 - 1
            if j < 0:
                break
        out.append(s)
    return out


def _xlsx_cells(payload: bytes, sheet: str) -> list[list[str | None]] | None:
    """Decode one workbook's selected sheet to display-value rows;
    None when the sheet doesn't exist (by index or name)."""
    import io

    try:
        import openpyxl  # noqa: F401

        sh = int(sheet) if sheet.isdigit() else sheet
        try:
            book = pd.read_excel(io.BytesIO(payload), sheet_name=sh, header=None)
        except (ValueError, IndexError, KeyError):
            return None
        def _cell(v):
            if pd.isna(v):
                return None
            # POI getNumericCellValue() returns double and the reference
            # renders String.valueOf(double) — "3" displays as "3.0"
            # (pinned by the Directive_parse_excel e2e golden)
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return str(float(v))
            return str(v)

        return [[_cell(v) for v in row] for _, row in book.iterrows()]
    except ImportError:
        try:
            return _xlsx_rows(bytes(payload), sheet)
        except (KeyError, IndexError, ValueError):
            return None


@directive("parse-as-excel")
def parse_as_excel(call: DirectiveCall):
    """parse-as-excel :col [sheet] — binary xlsx column → one output
    row per sheet row, columns named by Excel letter (A, B, C, …) plus
    `fwd` (0-based row number) and `bkd` (rows remaining after this
    one), matching reference parser/ParseExcel.java:121-160
    (ParseExcelTest.testBasicExcel: 892 rows, fwd 0 / bkd 891 on the
    first). A payload whose workbook lacks the requested sheet routes
    to the ERROR channel (testNoSheetName). 1→N via mapInPandas;
    pandas+openpyxl when available, else the pure-stdlib zip+XML
    reader. The output WIDTH is fixed from a one-payload driver peek
    (Spark schemas are static; the reference's per-row dynamic width
    becomes: peek width N, later rows pad/truncate to N).

    Third arg `first-row-as-header` (ParseExcel.java:78,90-92,155-160):
    the first row's values become the data rows' column names (per
    column index, letter fallback), the header row is not emitted,
    and — mirroring the reference's counter exactly — `fwd` starts at
    1 for the first data row (the header consumed fwd 0) while `bkd`
    still ends at 0 on the last row (pinned by the
    Directive_parse_excel e2e golden via `merge name bkd`)."""
    col = call.col(0)
    sheet = call.text(1, default="0")
    header = call.bool_(2, default=False)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        from collections.abc import Iterator

        c = _require(df, col)
        # driver-side metadata peek (same precedent as the
        # parse-as-avro-file header fetch): fix the output width
        first = df.select(c).filter(F.col(c).isNotNull()).limit(1).collect()
        peek = _xlsx_cells(bytes(first[0][0]), sheet) if first else None
        n_cols = max((len(r) for r in peek), default=0) if peek else 0
        letters = _xl_letters(n_cols)
        if header and peek:
            hdr = next((r for r in peek if any(v is not None for v in r)), [])
            letters = [
                (hdr[j] if j < len(hdr) and hdr[j] is not None else letters[j])
                for j in range(n_cols)
            ]

        @pandas_udf(T.BooleanType())
        def sheet_missing(v: pd.Series) -> pd.Series:
            return v.map(
                lambda p: p is not None and _xlsx_cells(bytes(p), sheet) is None
            )

        ok = ctx.route_error(
            df, sheet_missing(F.col(c)),
            f"parse-as-excel: sheet {sheet!r} not present in workbook",
        )

        out_schema = T.StructType(
            [T.StructField(x, T.StringType()) for x in letters]
            + [T.StructField("fwd", T.IntegerType()),
               T.StructField("bkd", T.IntegerType())]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for payload in pdf[c]:
                    cells_rows = _xlsx_cells(bytes(payload), sheet)
                    if cells_rows is None:
                        continue  # routed to error by the fork above
                    if header:
                        cells_rows = cells_rows[1:]
                    total = len(cells_rows)
                    for i, cells in enumerate(cells_rows):
                        rec = {
                            letters[j]: (cells[j] if j < len(cells) else None)
                            for j in range(n_cols)
                        }
                        # header mode: fwd counts from 1 (the header row
                        # consumed counter 0 — reference quirk), bkd is
                        # data rows remaining either way
                        rec["fwd"] = i + 1 if header else i
                        rec["bkd"] = total - 1 - i
                        rows.append(rec)
                yield pd.DataFrame(rows, columns=letters + ["fwd", "bkd"])

        return ok.select(c).mapInPandas(run, out_schema)

    return tr


@directive("parse-as-hl7")
def parse_as_hl7(call: DirectiveCall):
    """parse-as-hl7 :col [depth] (reference parser/HL7Parser.java).

    Round-5 rework to the reference's OBSERVABLE shape (pinned by the
    Directive_parse_hl7 e2e golden): the HAPI visitor builds a segments
    JSON — `{SEG: {field: value | {component: value}}}` — and
    `JsParser.jsonFlatten(segments, col + "_hl7", 1, depth, row)`
    flattens it into `<col>_hl7_<SEG>_<field>[_<component>]` COLUMNS.
    Here the segments JSON is built in an Arrow-batched pandas UDF and
    flattened by this package's parse-as-json path (same jsonFlatten
    naming). Visitor semantics mirrored exactly
    (HL7Parser.java:185-242):
    - only populated fields/components appear;
    - a field containing `^` becomes a component object (1-based keys),
      except MSH-2 (the encoding-characters field, which HAPI models as
      one primitive);
    - MSH field numbering starts at MSH-2 for the first encoded field
      (MSH-1 is the field separator itself, emitted as "1": "|");
    - on field REPETITION (`~`) the last repetition wins (JsonObject
      addProperty/add overwrite);
    - a repeated segment becomes a two-element array — and occurrences
      beyond the second are DROPPED, mirroring the reference's
      `if (!(object instanceof JsonArray))` conversion that never
      appends to an existing array (HL7Parser.java:192-203);
    - default depth is unbounded (Integer.MAX_VALUE in the reference).
    """
    col = call.col(0)
    depth = int(call.text(1, default=str(2**31 - 1)))

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        import json as _json

        c = _require(df, col)

        @pandas_udf(T.StringType())
        def hl7_segments_json(v: pd.Series) -> pd.Series:
            def seg_obj(name: str, fields: list[str]) -> dict:
                obj: dict = {}
                if name == "MSH":
                    obj["1"] = "|"
                for i, raw in enumerate(fields):
                    idx = i + 2 if name == "MSH" else i + 1
                    if raw == "":
                        continue
                    if name == "MSH" and idx == 2:
                        obj["2"] = raw  # encoding chars: one primitive
                        continue
                    rep = raw.split("~")[-1]  # last repetition wins
                    if rep == "":
                        continue
                    if "^" in rep:
                        comps = {
                            str(ci): cv
                            for ci, cv in enumerate(rep.split("^"), 1)
                            if cv != ""
                        }
                        if comps:
                            obj[str(idx)] = comps
                    else:
                        obj[str(idx)] = rep
                return obj

            def conv(x):
                if x is None:
                    return None
                segments: dict = {}
                for line in (s for s in x.replace("\n", "\r").split("\r") if s.strip()):
                    parts = line.split("|")
                    name = parts[0]
                    if not name:
                        continue
                    o = seg_obj(name, parts[1:])
                    if name not in segments:
                        segments[name] = o
                    elif not isinstance(segments[name], list):
                        segments[name] = [segments[name], o]
                    # else: 3rd+ occurrence dropped (reference behavior)
                return _json.dumps(segments)

            return v.map(conv)

        out = df.withColumn(f"{c}_hl7", hl7_segments_json(F.col(c).cast("string")))
        from wrangler_spark.directives.parsers import parse_as_json_inline

        return parse_as_json_inline(out, f"{c}_hl7", depth)

    return tr


# ------------------------------------------------------------- validation

@directive("validate-standard")
def validate_standard(call: DirectiveCall):
    """validate-standard :col <json-schema> — conformance check; failing
    rows route to the error channel (reference validation/ValidateStandard.java,
    conformers/JsonConformer.java). Arrow-batched jsonschema."""
    col = call.col(0)
    schema_arg = call.text(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        schema_json = schema_arg
        if not schema_arg.strip().startswith("{"):
            lk = ctx.lookups.get(f"schema:{schema_arg}") or ctx.lookups.get(schema_arg)
            if lk is None:
                raise UsageError(f"validate-standard: schema {schema_arg!r} not registered")
            schema_json = lk if isinstance(lk, str) else lk.first()[0]

        _vcache: dict = {}

        @pandas_udf(T.StringType())
        def issues(v: pd.Series) -> pd.Series:
            import jsonschema

            from wrangler_spark.directives import _conformance

            # schema compile is amortized across batches of a task —
            # the hl7-fhir-r4 standard is a multi-MB schema
            validator = _vcache.get("validator")
            if validator is None:
                parsed = json.loads(schema_json)
                cls = jsonschema.validators.validator_for(parsed)
                _vcache["validator"] = validator = cls(parsed)

            def check(x):
                if x is None:
                    return "document is null"
                try:
                    doc = json.loads(x)
                except Exception as exc:  # noqa: BLE001
                    return f"not valid JSON: {exc}"
                return _conformance.summarize_errors(validator.iter_errors(doc))

            return v.map(check)

        msg = issues(F.col(c).cast("string"))
        df = df.withColumn("__conformance", msg)
        bad = F.col("__conformance").isNotNull()
        routed = ctx.route_error(
            df,
            bad,
            F.concat(
                F.lit(f"standard {schema_arg[:40]}: "), F.col("__conformance")
            ),
        )
        return routed.drop("__conformance")

    return tr


# ------------------------------------------------------------- stemming

@directive("stemming")
def stemming(call: DirectiveCall):
    """stemming :col — Porter stemmer over a token array or string column
    (reference nlp/Stemming.java + nlp/internal/PorterStemmer.java).
    Arrow-batched pandas UDF with a compact pure-Python Porter."""
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        dt = df.schema[c].dataType
        is_array = isinstance(dt, T.ArrayType)

        @pandas_udf(T.ArrayType(T.StringType()))
        def stem_arr(v: pd.Series) -> pd.Series:
            import re as _re

            from wrangler_spark.directives._porter import stem

            # reference tokenization, two layers: Stemming.java:96 splits
            # a string phrase on \W+, then PorterStemmer.process():633
            # extracts maximal LETTER runs from each token (lowercased)
            # and stems each run — so "abc01@mail.com" stems to
            # [abc, mail, com] (digits dropped), pinned by the
            # Directive_parse_xmltojson e2e golden file.
            letters = _re.compile(r"[^\W\d_]+")

            def run(x):
                if x is None:
                    return None
                toks = _re.split(r"\W+", x) if isinstance(x, str) else list(x)
                return [
                    stem(m.group(0).lower())
                    for t in toks
                    if t
                    for m in letters.finditer(t)
                ]

            return v.map(run)

        src = F.col(c) if is_array else F.col(c).cast("string")
        return df.withColumn(f"{c}_porter", stem_arr(src))

    return tr


# ------------------------------------------------------------- HTTP enrich

@directive("invoke-http")
def invoke_http(call: DirectiveCall):
    """invoke-http <url> :c1[,:c2…] [header=value,…] — per-batch pooled
    HTTP POST enrichment (reference external/InvokeHttp.java, experimental
    there too). mapInPandas with one pooled session per batch — the
    anti-pattern (per-row connections) is structurally impossible here."""
    url = call.text(0)
    cols = call.cols(1)
    headers: dict[str, str] = {}
    if call.has(2):
        for part in call.text(2).split(","):
            if "=" in part:
                k, v = part.split("=", 1)
                headers[k.strip()] = v.strip()

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        from collections.abc import Iterator

        resolved = [_require(df, c) for c in cols]
        out_schema = T.StructType(
            list(df.schema.fields) + [T.StructField("http_response", T.StringType())]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # requests when available (connection pooling), stdlib
            # urllib otherwise — the directive is never import-gated
            try:
                import requests

                sess = requests.Session()
                sess.headers.update(headers)

                def post(payload: dict) -> str:
                    return sess.post(url, json=payload, timeout=10).text

            except ImportError:
                import urllib.error
                import urllib.request

                def post(payload: dict) -> str:
                    req = urllib.request.Request(
                        url,
                        data=json.dumps(payload).encode("utf-8"),
                        headers={"Content-Type": "application/json", **headers},
                        method="POST",
                    )
                    try:
                        with urllib.request.urlopen(req, timeout=10) as r:
                            return r.read().decode("utf-8")
                    except urllib.error.HTTPError as e:
                        # parity with the requests path: a non-2xx status
                        # returns the response BODY (requests doesn't
                        # raise on status) — same recipe, same output,
                        # whichever client is installed
                        return e.read().decode("utf-8")

            for pdf in batches:
                responses = []
                # to_dict('records') converts the batch once (vectorized
                # C path) instead of per-row iterrows Series construction
                for payload in pdf[resolved].to_dict("records"):
                    try:
                        responses.append(post(payload))
                    except Exception as e:  # noqa: BLE001
                        responses.append(json.dumps({"error": str(e)}))
                pdf = pdf.copy()
                pdf["http_response"] = responses
                yield pdf

        return df.mapInPandas(run, out_schema)

    return tr


# ------------------------------------------------------------- data model

@directive("data-model-map-column")
def data_model_map_column(call: DirectiveCall):
    """data-model-map-column <model> <revision> <field> :col — rename+cast
    to a target data-model field (reference datamodel/DataModelMapColumn.java;
    the Avro glossary is host-provided via ctx.lookups['datamodel:<model>']
    as a (field, type) table)."""
    model = call.text(0)
    revision = call.text(1) if call.has(3) else None
    field_name = call.text(2) if call.has(3) else call.text(1)
    col = call.col(3) if call.has(3) else call.col(2)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        # revision-qualified glossary preferred; an unrevisioned
        # registration accepts any revision. Missing model (or a
        # revision registered elsewhere) is a compile-time error, like
        # the reference's unknown-model/unknown-revision RecipeException
        # (DataModelMapColumnTest.testInitialize_*_directiveException).
        glossary = None
        if revision is not None:
            glossary = ctx.lookups.get(f"datamodel:{model}@{revision}")
        if glossary is None:
            glossary = ctx.lookups.get(f"datamodel:{model}")
        if glossary is None:
            raise UsageError(
                f"data-model-map-column: unknown data model {model!r}"
                + (f" revision {revision!r}" if revision is not None else "")
            )
        row = glossary.filter(F.col(glossary.columns[0]) == field_name).first()
        if row is None:
            raise UsageError(
                f"data-model-map-column: field {field_name!r} not in model {model!r}"
            )
        target_type = row[1]
        return df.withColumn(field_name, F.col(c).cast(target_type)).drop(c)

    return tr
