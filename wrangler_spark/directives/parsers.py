"""Parser directives — format decoders (SURVEY.md §2.2).

Reference classes under io/cdap/directives/parser/ and xml/. Each
decodes a string column into typed columns. CSV/JSON need a fixed
output schema, which the reference discovers per-row; we discover it
with a bounded compile-time peek (limit(…)) — a one-partition probe
that stays cheap at any scale — then decode with native from_csv /
from_json so the hot path is JVM-side.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from wrangler_spark.errors import UsageError
from wrangler_spark.recipe.parser import DirectiveCall
from wrangler_spark.recipe.registry import RecipeContext, directive
from wrangler_spark.directives.column_ops import _require

_PEEK_ROWS = 200


def _looks_like_header(fields: list[str]) -> bool:
    """Reference header inference (CsvParser.java:184-203): all fields
    non-empty, non-numeric/typed, and distinct."""
    seen = set()
    for v in fields:
        if v is None or not v.strip():
            return False
        s = v.strip()
        if re.match(r"^-?\d+(\.\d+)?$", s) or s.lower() in ("true", "false"):
            return False
        if s in seen:
            return False
        seen.add(s)
    return True


@directive("parse-as-csv")
def parse_as_csv(call: DirectiveCall):
    col = call.col(0)
    delim = call.text(1, default=",")
    header = call.bool_(2, default=False)
    if delim == "\\t":
        delim = "\t"

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        peek = [r[0] for r in df.select(s).limit(_PEEK_ROWS).collect() if r[0]]
        if not peek:
            return df
        import csv as _csv
        import io as _io

        def split_line(line: str) -> list[str]:
            return next(_csv.reader(_io.StringIO(line), delimiter=delim))

        first = split_line(peek[0])
        n = max(len(split_line(p)) for p in peek)
        use_header = header and _looks_like_header(first)
        if use_header:
            # reference CsvParser.java:150 — header cells are trimmed
            # and inner whitespace runs collapse to '_'
            names = [re.sub(r"\s+", "_", f.strip()) for f in first]
            names += [f"{c}_{i + 1}" for i in range(len(names), n)]
        else:
            names = [f"{c}_{i + 1}" for i in range(n)]
        ddl = ", ".join(f"`{nm}` STRING" for nm in names)
        parsed = F.from_csv(s, ddl, {"delimiter": delim, "quote": '"', "escape": "\\"})
        out = df.withColumn("__wr_csv", parsed)
        if use_header:
            # drop the header record itself (reference consumes the
            # record the headers came from) — compare each cell through
            # the same sanitization the names went through, so
            # ' last \t name' still matches header 'last_name'
            hdr_cond = None
            for k, nm in enumerate(names[: len(first)]):
                cell = F.regexp_replace(
                    F.trim(F.col("__wr_csv").getField(nm)), r"\s+", "_"
                )
                eq = cell == F.lit(nm)
                hdr_cond = eq if hdr_cond is None else (hdr_cond & eq)
            out = out.filter(~F.coalesce(hdr_cond, F.lit(False)))
        # reference parity (commons-csv, RecordConvertorTest.testEmptyString):
        # a PRESENT-but-empty field is "" while a MISSING trailing field
        # is null. from_csv nulls both, so distinguish by the line's
        # quote-aware field count: strip quoted segments, count
        # delimiters, and coalesce only fields the line actually has.
        stripped = F.regexp_replace(s, r'"(?:[^"\\]|\\.)*"', "")
        cnt = F.when(
            s.isNull() | (F.length(s) == 0), F.lit(0)
        ).otherwise(F.size(F.split(stripped, re.escape(delim), -1)))
        for i, nm in enumerate(names):
            fld = F.col("__wr_csv").getField(nm)
            out = out.withColumn(
                nm,
                F.when(F.lit(i) < cnt, F.coalesce(fld, F.lit(""))).otherwise(fld),
            )
        return out.drop("__wr_csv")

    return tr


@directive("parse-as-json")
def parse_as_json(call: DirectiveCall):
    """parse-as-json :col [depth] (reference parser/JsParser.java).

    Flattens object keys into `<col>_<key>` columns up to `depth`
    levels; deeper values stay as JSON strings.
    """
    col = call.col(0)
    depth = call.int_(1, default=1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        sample = [r[0] for r in df.select(s).filter(s.isNotNull()).limit(_PEEK_ROWS).collect()]
        if not sample:
            return df
        schema = _merged_json_schema(df.sparkSession, sample)
        if isinstance(schema, T.ArrayType):
            # top-level JSON array → one row per element (reference
            # JsParser.java:130-141): object elements stay JSON (a
            # following parse-as-json flattens them), primitives become
            # the column value directly
            el = F.explode_outer(F.from_json(F.trim(s), schema))
            out = df.withColumn("__wr_el", el)
            if isinstance(schema.elementType, T.StructType):
                out = out.withColumn(c, F.to_json("__wr_el"))
            else:
                out = out.withColumn(c, F.col("__wr_el"))
            return out.drop("__wr_el")
        parsed = F.from_json(s, schema)
        out = df.withColumn("__wr_json", parsed)
        out = _flatten_struct(out, "__wr_json", c, depth)
        return out.drop("__wr_json").drop(c)

    return tr


def _merged_json_schema(spark, sample: list[str]) -> T.DataType:
    """Infer one schema covering all sampled JSON docs — pure driver-side
    Python over the (tiny) sample: zero Spark jobs, unlike the JSON
    reader's RDD round-trip."""
    import json as _json

    merged: T.DataType | None = None
    for doc in sample:
        try:
            obj = _json.loads(doc)
        except Exception:  # noqa: BLE001
            continue
        t = _py_to_spark_type(obj)
        merged = t if merged is None else _merge_types(merged, t)
    if merged is None or not isinstance(merged, (T.StructType, T.ArrayType)):
        return T.StructType()
    return _denull(merged)


def _denull(t: T.DataType) -> T.DataType:
    """from_json can't take NullType leaves (all-null sample) → string."""
    if isinstance(t, T.NullType):
        return T.StringType()
    if isinstance(t, T.StructType):
        return T.StructType([T.StructField(f.name, _denull(f.dataType), True) for f in t.fields])
    if isinstance(t, T.ArrayType):
        return T.ArrayType(_denull(t.elementType), True)
    if isinstance(t, T.MapType):
        return T.MapType(_denull(t.keyType), _denull(t.valueType), True)
    return t


def _py_to_spark_type(v) -> T.DataType:
    if v is None:
        return T.NullType()
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        return T.StringType()
    if isinstance(v, list):
        et: T.DataType = T.NullType()
        for x in v:
            et = _merge_types(et, _py_to_spark_type(x))
        return T.ArrayType(et if not isinstance(et, T.NullType) else T.StringType(), True)
    if isinstance(v, dict):
        return T.StructType(
            [T.StructField(str(k), _py_to_spark_type(x), True) for k, x in v.items()]
        )
    return T.StringType()


def _merge_types(a: T.DataType, b: T.DataType) -> T.DataType:
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        names = list(dict.fromkeys([f.name for f in a.fields] + [f.name for f in b.fields]))
        am = {f.name: f.dataType for f in a.fields}
        bm = {f.name: f.dataType for f in b.fields}
        return T.StructType(
            [
                T.StructField(
                    n,
                    _merge_types(am[n], bm[n]) if n in am and n in bm else (am.get(n) or bm[n]),
                    True,
                )
                for n in names
            ]
        )
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_merge_types(a.elementType, b.elementType), True)
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    num = (T.LongType, T.DoubleType, T.IntegerType, T.FloatType)
    if isinstance(a, num) and isinstance(b, num):
        return T.DoubleType()
    return T.StringType()


def _flatten_struct(df: DataFrame, src: str, prefix: str, depth: int) -> DataFrame:
    dt = df.schema[src].dataType
    if not isinstance(dt, T.StructType):
        return df.withColumn(prefix, F.col(src))
    for f_ in dt.fields:
        name = f"{prefix}_{f_.name}"
        child = F.col(src).getField(f_.name)
        if isinstance(f_.dataType, T.StructType) and depth > 1:
            df = df.withColumn(f"__wr_tmp_{name}", child)
            df = _flatten_struct(df, f"__wr_tmp_{name}", name, depth - 1)
            df = df.drop(f"__wr_tmp_{name}")
        elif isinstance(f_.dataType, (T.StructType, T.ArrayType, T.MapType)) and depth <= 1:
            df = df.withColumn(name, F.to_json(child))
        else:
            df = df.withColumn(name, child)
    return df


@directive("json-path")
def json_path(call: DirectiveCall):
    src, dst = call.col(0), call.col(1)
    path = call.text(2)
    if not path.startswith("$"):
        path = "$." + path

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, src)
        return df.withColumn(dst, F.get_json_object(F.col(c).cast("string"), path))

    return tr


@directive("parse-as-fixed-length")
def parse_as_fixed_length(call: DirectiveCall):
    """parse-as-fixed-length :col w1,w2,… ['pad'] (reference
    parser/FixedLengthParser.java:94-141): records shorter than the
    total width route to the error channel; an input holding N
    consecutive records explodes to N rows; every occurrence of the
    padding pattern is stripped from each value (replaceAll)."""
    col = call.col(0)
    widths = [int(w) for w in call.nums(1)]
    padding = call.text(2) if call.has(2) else None
    rec_len = sum(widths)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        short = s.isNotNull() & (F.length(s) < rec_len)
        df = ctx.route_error(
            df, short,
            f"fixed-length: value shorter than record length {rec_len} "
            "(ecode: 2, directive: parse-as-fixed-length)",
        )
        s = F.col(c).cast("string")
        # explode consecutive records: record k starts at k*rec_len + 1
        n_recs = F.floor(F.length(s) / rec_len).cast("int")
        df = df.withColumn(
            "__wr_recoff",
            F.explode_outer(
                F.transform(F.sequence(F.lit(0), n_recs - 1), lambda k: k * rec_len)
            ),
        )
        off = 1
        for i, w in enumerate(widths):
            val = F.substring(s, F.lit(off) + F.col("__wr_recoff"), F.lit(w))
            if padding is not None:
                val = F.regexp_replace(val, padding, "")
            df = df.withColumn(f"{c}_{i + 1}", val)
            off += w
        return df.drop("__wr_recoff")

    return tr


_LOG_PATTERNS = {
    # Apache HTTPD common + combined regexes (the reference
    # parser/ParseLog.java drives the nl.basjes httpdlog parser; these
    # compile its standard formats to one regex — the COLUMN surface for
    # these two formats is built reference-faithfully below)
    "common": (
        r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "([^"]*)" (\d{3}|-) (\d+|-)',
        None,
    ),
    "combined": (
        r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "([^"]*)" (\d{3}|-) (\d+|-) "([^"]*)" "([^"]*)"',
        None,
    ),
}


def _httpd_ref_columns(s, fmt: str) -> dict:
    """The full httpdlog column surface the reference emits for the
    'common'/'combined' formats: one column per dissected path, named
    `type_path` lowercased with non-alnum → '_' (ParseLog.LogLine
    .setValue:130-137; 'original'/'bytesclf'/'cookie' paths filtered
    there) — e.g. `TIME.DAY:request.receive.time.day` →
    `time_day_request_receive_time_day`. Every dissectable path appears
    in base AND `.last` form, time units in local (the log's own
    offset) AND `_utc` variants. Values are strings, unpadded numbers
    (basjes TimeStampDissector uses the field getters). Pinned
    column-by-column by the Directive_parse_log e2e golden file."""
    pattern, _ = _LOG_PATTERNS[fmt]

    def g(i):
        return F.when(s.rlike(pattern), F.regexp_extract(s, pattern, i))

    def dash_null(c):
        return F.when(c == "-", F.lit(None).cast("string")).otherwise(c)

    cols: dict = {}
    host = g(1)
    cols["ip_connection_client_host"] = host
    cols["ip_connection_client_host_last"] = host
    logname = dash_null(g(2))
    cols["number_connection_client_logname"] = logname
    cols["number_connection_client_logname_last"] = logname
    user = dash_null(g(3))
    cols["string_connection_client_user"] = user
    cols["string_connection_client_user_last"] = user

    stamp = g(4)
    cols["time_stamp_request_receive_time"] = stamp
    cols["time_stamp_request_receive_time_last"] = stamp
    # local wall-clock = the timestamp as written (its own offset);
    # utc = the instant rendered in UTC (session tz is UTC)
    local_ts = F.to_timestamp(
        F.substring_index(stamp, " ", 1), "dd/MMM/yyyy:HH:mm:ss"
    )
    utc_ts = F.to_timestamp(stamp, "dd/MMM/yyyy:HH:mm:ss Z")
    def iso_weekyear(t):
        # ISO week-year = calendar year of the Thursday of t's ISO week
        # (weekofyear() is ISO, so the pair stays consistent)
        d = F.to_date(t)
        iso_dow = ((F.dayofweek(d) + 5) % 7) + 1  # Mon=1 .. Sun=7
        return F.year(F.date_add(d, 4 - iso_dow)).cast("string")

    units = [
        ("date", "date", lambda t: F.date_format(t, "yyyy-MM-dd")),
        ("time", "time", lambda t: F.date_format(t, "HH:mm:ss")),
        ("day", "day", lambda t: F.dayofmonth(t).cast("string")),
        ("month", "month", lambda t: F.month(t).cast("string")),
        ("monthname", "monthname", lambda t: F.date_format(t, "MMMM")),
        ("year", "year", lambda t: F.year(t).cast("string")),
        ("week", "weekofweekyear", lambda t: F.weekofyear(t).cast("string")),
        ("year", "weekyear", iso_weekyear),
        ("hour", "hour", lambda t: F.hour(t).cast("string")),
        ("minute", "minute", lambda t: F.minute(t).cast("string")),
        ("second", "second", lambda t: F.second(t).cast("string")),
        ("millisecond", "millisecond",
         lambda t: F.when(t.isNotNull(), F.lit("0"))),
    ]
    for typ, name, fn in units:
        vloc = fn(local_ts)
        vutc = fn(utc_ts)
        cols[f"time_{typ}_request_receive_time_{name}"] = vloc
        cols[f"time_{typ}_request_receive_time_{name}_utc"] = vutc
        cols[f"time_{typ}_request_receive_time_last_{name}"] = vloc
        cols[f"time_{typ}_request_receive_time_last_{name}_utc"] = vutc
    epoch = (F.unix_timestamp(utc_ts) * 1000).cast("string")
    cols["time_epoch_request_receive_time_epoch"] = epoch
    cols["time_epoch_request_receive_time_last_epoch"] = epoch

    firstline = g(5)
    parts = F.split(firstline, " ")
    method = F.element_at(parts, 1)
    uri = F.element_at(parts, 2)
    proto = F.element_at(parts, 3)
    cols["http_firstline_request_firstline"] = firstline
    cols["http_method_request_firstline_method"] = method
    cols["http_uri_request_firstline_uri"] = uri
    cols["http_path_request_firstline_uri_path"] = F.regexp_extract(uri, r"^([^?#]*)", 1)
    cols["http_querystring_request_firstline_uri_query"] = F.when(
        uri.contains("?"), F.regexp_extract(uri, r"\?([^#]*)", 1)
    )
    cols["http_ref_request_firstline_uri_ref"] = F.when(
        uri.contains("#"), F.regexp_extract(uri, r"#(.*)$", 1)
    )
    cols["http_protocol_request_firstline_protocol"] = F.substring_index(proto, "/", 1)
    cols["http_protocol_version_request_firstline_protocol"] = proto
    cols["http_protocol_version_request_firstline_protocol_version"] = (
        F.substring_index(proto, "/", -1)
    )

    cols["string_request_status_last"] = g(6)
    bytes_ = dash_null(g(7))
    cols["bytes_response_body_bytes"] = bytes_
    cols["bytes_response_body_bytes_last"] = bytes_

    if fmt == "combined":
        ref = dash_null(g(8))
        cols["http_uri_request_referer"] = ref
        cols["http_uri_request_referer_last"] = ref
        ua = dash_null(g(9))
        cols["http_useragent_request_user_agent"] = ua
        cols["http_useragent_request_user_agent_last"] = ua
    return cols


@directive("parse-as-log")
def parse_as_log(call: DirectiveCall):
    col = call.col(0)
    fmt = _fmt_arg(call, 1).strip() if call.has(1) else "common"
    if fmt in _LOG_PATTERNS:
        # reference-faithful httpdlog column surface for the standard
        # formats (see _httpd_ref_columns)
        def tr_ref(df: DataFrame, ctx: RecipeContext) -> DataFrame:
            c = _require(df, col)
            s = F.col(c).cast("string")
            cols = _httpd_ref_columns(s, fmt)
            return df.withColumns(cols)

        return tr_ref
    if "%" in fmt:
        # httpd LogFormat tokenizer (reference ParseLog.java drives
        # nl.basjes httpdlog-parser; this covers its test formats):
        # %h %l %u %t %r %>s %s %b %D %T %m %q %U %v %p plus
        # %{Name}i request headers, %{Name}o response headers and
        # %{NAME}e env vars — any literal text (quotes, brackets)
        # matches verbatim. Header/env values may contain spaces
        # (Cookie!), so their groups are lazy and the anchored tail of
        # the pattern disambiguates via backtracking.
        simple = {
            "h": (r"(\S+)", "remote_host"),
            "a": (r"(\S+)", "remote_ip"),
            "l": (r"(\S+)", "remote_logname"),
            "u": (r"(\S+)", "remote_user"),
            "t": (r"\[([^\]]+)\]", "request_time"),
            "r": (r"(\S+ +\S+ +\S+|-)", "request_line"),
            "s": (r"(\d{3}|-)", "status_code"),
            "b": (r"(\d+|-)", "response_size"),
            "D": (r"(\d+|-)", "response_time_us"),
            "T": (r"(\d+|-)", "response_time_s"),
            "m": (r"(\S+)", "request_method"),
            "q": (r"(\S*)", "request_query"),
            "U": (r"(\S+)", "request_url"),
            "v": (r"(\S+)", "server_name"),
            "p": (r"(\d+|-)", "server_port"),
        }
        kinds = {"i": "header", "o": "response_header", "e": "env"}
        parts, names = [], []
        pos = 0
        for m in re.finditer(r"%\{([^}]+)\}([ioe])|%(>?[a-zA-Z])", fmt):
            lit = fmt[pos:m.start()]
            if lit:
                parts.append(re.sub(r"\s+", r" ", re.escape(lit)))
            pos = m.end()
            if m.group(2):  # %{Name}i / %{Name}o / %{NAME}e
                nm = kinds[m.group(2)] + "_" + re.sub(r"[^0-9a-zA-Z]+", "_", m.group(1)).strip("_").lower()
                parts.append(r"(.*?)")
                names.append(nm)
            else:
                key = m.group(3).lstrip(">")
                if key not in simple:
                    raise UsageError(f"parse-as-log: unsupported token %{m.group(3)}")
                rx, nm = simple[key]
                parts.append(rx)
                names.append(nm)
        tail = fmt[pos:]
        if tail:
            parts.append(re.sub(r"\s+", r" ", re.escape(tail)))
        pattern = "^" + "".join(parts) + "$"
    else:
        raise UsageError(f"parse-as-log: unsupported format {fmt!r}")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        for i, nm in enumerate(names, start=1):
            df = df.withColumn(nm, F.when(s.rlike(pattern), F.regexp_extract(s, pattern, i)))
        return df

    return tr


def _java_to_spark_fmt(fmt: str) -> str:
    # Patterns execute under spark.sql.legacy.timeParserPolicy=LEGACY
    # (session.py) = java.text.SimpleDateFormat — the reference's exact
    # engine — so they pass through unchanged.
    return fmt


def _fmt_arg(call: DirectiveCall, i: int) -> str:
    """Date-format argument: rest-of-line in the v1 grammar (RAW_TAIL),
    so a quoted format arrives as an EXPR still wearing its quotes —
    strip one matching outer pair; inner SimpleDateFormat literal
    quotes ('T', 'at') survive because they never wrap the whole
    pattern."""
    s = call.text(i).strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"" and s[0] not in s[1:-1]:
        return s[1:-1]
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        # wrapped AND contains inner quotes: strip only if the inner
        # text is a well-formed pattern on its own (balanced quotes)
        inner = s[1:-1]
        if inner.count(s[0]) % 2 == 0:
            return inner
    return s


def _parse_or_error(df: DataFrame, ctx: RecipeContext, c: str, ts, name: str, fmt: str) -> DataFrame:
    """Unparseable non-null values route the ORIGINAL row to the error
    channel (reference ParseSimpleDate.java:105-111 /
    ParseDateTime.java:92-94 throw ErrorRowException;
    ParseDateTimeTest.testInvalidData expects empty results)."""
    bad = F.col(c).cast("string").isNotNull() & ts.isNull()
    ok = ctx.route_error(
        df, bad, f"{name}: value is not in expected format {fmt!r}"
    )
    return ok.withColumn(c, ts)


@directive("parse-as-simple-date", "parse-as-date-format")
def parse_as_simple_date(call: DirectiveCall):
    col = call.col(0)
    fmt = _fmt_arg(call, 1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        ts = F.to_timestamp(F.col(c).cast("string"), _java_to_spark_fmt(fmt))
        return _parse_or_error(df, ctx, c, ts, "parse-as-simple-date", fmt)

    return tr


_DTF_LETTERS = set("GuyDMLdQqYwWEeFcahKkHmsSAnNVvzOXxZpB")


def _datetime_fmt(fmt: str, name: str) -> str:
    """Validate a java.time DateTimeFormatter pattern at compile time
    (reference parser/ParseDateTime.java initialize(): ofPattern throws
    on unknown letters — ParseDateTimeTest.testInvalidFormat) and
    reduce it to the LEGACY-parser-safe prefix: the target type is a
    LocalDateTime, so offset/zone tail sections ([xxx], '['VV']') only
    need to be TOLERATED, which SimpleDateFormat's trailing-text
    leniency already gives — truncate at the first unquoted '['."""
    in_quote = False
    for i, ch in enumerate(fmt):
        if ch == "'":
            in_quote = not in_quote
            continue
        if in_quote:
            continue
        if ch.isalpha() and ch not in _DTF_LETTERS:
            raise UsageError(f"{name}: invalid datetime pattern {fmt!r} "
                             f"(unknown pattern letter {ch!r})")
        if ch == "[":
            return fmt[:i]
    return fmt


@directive("parse-as-datetime")
def parse_as_datetime(call: DirectiveCall):
    col = call.col(0)
    fmt = _datetime_fmt(_fmt_arg(call, 1), "parse-as-datetime")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        ts = F.to_timestamp(F.col(c).cast("string"), _java_to_spark_fmt(fmt))
        return _parse_or_error(
            df, ctx, c, ts.cast("timestamp_ntz"), "parse-as-datetime", fmt
        )

    return tr


@directive("parse-as-date")
def parse_as_date(call: DirectiveCall):
    """parse-as-date :col [tz] — natural-language-ish date detection
    (reference parser/ParseDate.java uses natty). Vectorized pandas
    fallback via pd.to_datetime(format='mixed')."""
    col = call.col(0)
    tz = call.text(1, default="UTC")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)

        @pandas_udf(T.TimestampType())
        def parse(v: pd.Series) -> pd.Series:
            out = pd.to_datetime(v, errors="coerce", format="mixed", utc=True)
            try:
                out = out.dt.tz_convert(tz).dt.tz_localize(None)
            except Exception:
                out = out.dt.tz_localize(None)
            return out

        return df.withColumn(c, parse(F.col(c).cast("string")))

    return tr


@directive("parse-timestamp")
def parse_timestamp(call: DirectiveCall):
    col = call.col(0)
    unit = call.ident(1, default="milliseconds").lower()

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        v = F.col(c).cast("long")
        if unit in ("seconds", "s"):
            ts = F.timestamp_seconds(v)
        elif unit in ("milliseconds", "ms"):
            ts = F.timestamp_millis(v)
        elif unit in ("microseconds", "us"):
            ts = F.timestamp_micros(v)
        else:
            raise UsageError(f"parse-timestamp: bad unit {unit!r}")
        return df.withColumn(c, ts)

    return tr


@directive("parse-xml-to-json")
def parse_xml_to_json(call: DirectiveCall):
    """parse-xml-to-json :col [depth] [keep-strings] (reference
    xml/XmlToJson.java, XmlToJsonTest.java).

    No XML support in core Spark → Arrow-batched pandas UDF converting
    XML → JSON string, then the JSON flattening path. keep-strings
    false (the default) mirrors org.json XML.toJSONObject leaf
    coercion: true/false/null literals, round-tripping integers, and
    dotted/exponent forms as doubles — so "303246306303E8" becomes
    3.03246306303E19 unless keep-strings is true.
    """
    col = call.col(0)
    depth = call.int_(1, default=1)
    keep_strings = call.bool_(2, default=False)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        import json as _json
        import xml.etree.ElementTree as ET

        c = _require(df, col)

        def s2v(s):
            """org.json JSONObject.stringToValue: literal booleans/null,
            integers only when they round-trip (leading zeros stay
            strings), '.'/e/E forms as finite doubles."""
            if keep_strings:
                return s
            if s == "true":
                return True
            if s == "false":
                return False
            if s == "null":
                return None
            if s and (s[0].isdigit() or s[0] == "-"):
                import math as _math
                if "." in s or "e" in s or "E" in s or s == "-0":
                    try:
                        d = float(s)
                        if not (_math.isinf(d) or _math.isnan(d)):
                            return d
                    except ValueError:
                        pass
                else:
                    try:
                        iv = int(s)
                        if str(iv) == s:
                            return iv
                    except ValueError:
                        pass
            return s

        def elem_to_obj(e):
            children = list(e)
            obj: dict = {}
            for k, v in e.attrib.items():
                obj["@" + k] = s2v(v)
            if not children:
                text = (e.text or "").strip()
                if obj:
                    if text:
                        obj["#text"] = s2v(text)
                    return obj
                return s2v(text) if text else None
            for ch in children:
                val = elem_to_obj(ch)
                if ch.tag in obj:
                    prev = obj[ch.tag]
                    obj[ch.tag] = prev + [val] if isinstance(prev, list) else [prev, val]
                else:
                    obj[ch.tag] = val
            return obj

        @pandas_udf(T.StringType())
        def xml2json(v: pd.Series) -> pd.Series:
            import re as _re

            # org.json XML.parse treats <? ... ?> as a meta block and
            # SKIPS it without validating — including malformed prologs
            # like `<?xml version=1.0?>` (unquoted attrs), which strict
            # ET parsing rejects (pinned by the Directive_parse_xmltojson
            # e2e golden input). Strip them before parsing.
            meta = _re.compile(r"<\?.*?\?>", _re.S)

            def conv(x):
                if x is None:
                    return None
                try:
                    root = ET.fromstring(meta.sub("", x).strip())
                    return _json.dumps({root.tag: elem_to_obj(root)})
                except Exception:
                    return None

            return v.map(conv)

        out = df.withColumn(f"{c}_json", xml2json(F.col(c).cast("string")))
        # rename to <col> then reuse JSON flatten with given depth
        out = out.drop(c).withColumnRenamed(f"{c}_json", c)
        return parse_as_json_inline(out, c, depth)

    return tr


def parse_as_json_inline(df: DataFrame, col: str, depth: int) -> DataFrame:
    from wrangler_spark.recipe.parser import DirectiveCall as _DC, Tok as _Tok

    call = _DC(name="parse-as-json", toks=[_Tok("COL", col, f":{col}"), _Tok("NUM", depth, str(depth))])
    return parse_as_json(call)(df, RecipeContext(spark=df.sparkSession))


# ----------------------------------------------------------- xml / xpath

@directive("parse-as-xml")
def parse_as_xml(call: DirectiveCall):
    """parse-as-xml :col — parse a column as XML (reference cheatsheet
    PARSE-AS-XML; v1 grammar via parser/MigrateToV2.java:439-445). The
    reference stores a parsed VTD-XML handle in the row; here the
    canonical form is the validated XML text itself — xpath /
    xpath-array re-parse per batch (ElementTree is fast relative to
    Arrow transfer, and strings keep the column plannable/pushdownable).
    Unparseable rows route to the error channel."""
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        import xml.etree.ElementTree as ET

        c = _require(df, col)

        @pandas_udf(T.BooleanType())
        def is_valid(v: pd.Series) -> pd.Series:
            def ok(x):
                if x is None:
                    return True
                try:
                    ET.fromstring(x)
                    return True
                except ET.ParseError:
                    return False
            return v.map(ok)

        df = ctx.route_error(
            df, ~is_valid(F.col(c).cast("string")), "parse-as-xml: malformed XML"
        )
        return df.withColumn(c, F.trim(F.col(c).cast("string")))

    return tr


def _xpath_eval(call: DirectiveCall, array: bool):
    """Shared xpath / xpath-array (reference cheatsheet XPATH,
    XPATH-ARRAY; MigrateToV2.java:447-459): evaluate an XPath over a
    parse-as-xml'd column. ElementTree's XPath subset plus a trailing
    /@attribute form; absolute paths resolve against the document root."""
    col, dst = call.col(0), call.col(1)
    path = call.text(2)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        import xml.etree.ElementTree as ET

        c = _require(df, col)
        attr = None
        p = path
        m = re.search(r"/@([A-Za-z_][\w.-]*)$", p)
        if m:
            attr = m.group(1)
            p = p[: m.start()]

        def rel(root_tag: str) -> str | None:
            """Absolute /a/b/c against root <a> → b/c ('.' if just /a)."""
            if not p.startswith("/"):
                return p
            parts = [q for q in p.split("/") if q]
            if not parts or parts[0] != root_tag:
                return None
            return "/".join(parts[1:]) or "."

        def extract(x):
            if x is None:
                return None
            try:
                root = ET.fromstring(x)
            except ET.ParseError:
                return None
            rp = rel(root.tag)
            if rp is None:
                return [] if array else None
            nodes = root.findall(rp)
            vals = []
            for nd in nodes:
                if attr is not None:
                    if attr in nd.attrib:
                        vals.append(nd.attrib[attr])
                else:
                    vals.append("".join(nd.itertext()))
            if array:
                return vals
            return vals[0] if vals else None

        if array:
            @pandas_udf(T.ArrayType(T.StringType()))
            def xp(v: pd.Series) -> pd.Series:
                return v.map(extract)
        else:
            @pandas_udf(T.StringType())
            def xp(v: pd.Series) -> pd.Series:
                return v.map(extract)

        return df.withColumn(dst, xp(F.col(c).cast("string")))

    return tr


@directive("xpath")
def xpath(call: DirectiveCall):
    return _xpath_eval(call, array=False)


@directive("xpath-array")
def xpath_array(call: DirectiveCall):
    return _xpath_eval(call, array=True)
