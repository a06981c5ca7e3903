"""String / scalar transform directives (SURVEY.md §2.7).

Reference classes under io/cdap/directives/transformation/ (plus
language/SetCharset). Everything that Catalyst can express is a native
Column expression; the only pandas UDFs here are mask-shuffle (exact
java.util.Random parity) and base32 codecs — both Arrow-batched, never
per-row Python.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from wrangler_spark.errors import UsageError
from wrangler_spark.expr.jexl import compile_expr
from wrangler_spark.recipe.parser import DirectiveCall
from wrangler_spark.recipe.registry import RecipeContext, directive
from wrangler_spark.directives.column_ops import _require


@directive("set-column")
def set_column(call: DirectiveCall):
    """set-column :col exp:{...} (reference transformation/ColumnExpression.java:64).

    The JEXL expression compiles once at recipe-compile time into a
    Column (SURVEY.md §2.8) — the per-row script interpreter becomes
    whole-stage codegen.
    """
    col = call.col(0)
    expr_src = call.expr(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        target = _require(df, col) if any(c.lower() == col.lower() for c in df.columns) else col
        return df.withColumn(target, compile_expr(expr_src, df.schema, ctx.variables))

    return tr


def _simple(name: str, fn):
    @directive(name)
    def _impl(call: DirectiveCall, _fn=fn):
        col = call.col(0)

        def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
            c = _require(df, col)
            return df.withColumn(c, _fn(F.col(c).cast("string")))

        return tr

    return _impl


_simple("uppercase", F.upper)
_simple("lowercase", F.lower)
_simple("titlecase", F.initcap)

# Spark's trim/ltrim/rtrim strip only ' ' — the reference's Trimmer
# (transformation/Trimmer.java WHITESPACE_CHARS; TrimTest trims \t\r)
# strips the full unicode whitespace set, so use that class explicitly.
_WS_CLASS = (
    "[\\t\\n\\x0B\\f\\r \\u0085\\u00A0\\u1680\\u180E\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]"
)
_simple("trim", lambda s: F.regexp_replace(s, f"^{_WS_CLASS}+|{_WS_CLASS}+$", ""))
_simple("ltrim", lambda s: F.regexp_replace(s, f"^{_WS_CLASS}+", ""))
_simple("rtrim", lambda s: F.regexp_replace(s, f"{_WS_CLASS}+$", ""))
_simple("url-encode", F.url_encode)
_simple("url-decode", F.url_decode)


@directive("fill-null-or-empty")
def fill_null_or_empty(call: DirectiveCall):
    """fill-null-or-empty :col <value> — a MISSING column is ADDED with
    the fill value for every row (reference transformation/
    FillNullOrEmpty.java:77-80, pinned by
    FillNullOrEmptyTest.testColumnNotPresent)."""
    col = call.col(0)
    value = call.text(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        from wrangler_spark.directives.column_ops import _resolve

        c = _resolve(df, col)
        if c is None:
            return df.withColumn(col, F.lit(value))
        s = F.col(c).cast("string")
        return df.withColumn(
            c, F.when(s.isNull() | (s == ""), F.lit(value)).otherwise(s)
        )

    return tr


@directive("find-and-replace")
def find_and_replace(call: DirectiveCall):
    """find-and-replace :col 's/pat/repl/g' — sed expression
    (reference transformation/FindAndReplace.java)."""
    cols = call.cols(0)
    sed = call.text(1)
    # flags per unix4j sed (the reference executes the expression via
    # Unix4j.echo(value).sed(pattern), FindAndReplace.java:85): `g`
    # global, and case-insensitivity spelled `I` (GNU sed) or `i` —
    # the e2e GroupBy pipeline uses 's/St./Street/Ig'
    m = re.match(r"^s/((?:[^/\\]|\\.)*)/((?:[^/\\]|\\.)*)/([gIi]*)$", sed) or re.match(
        r"^s/((?:[^/\\]|\\.)*)/((?:[^/\\]|\\.)*)$", sed
    )
    if not m:
        raise UsageError(f"find-and-replace: bad sed expression {sed!r}")
    pat, repl = m.group(1), m.group(2)
    flags = m.group(3) if m.lastindex and m.lastindex >= 3 else "g"
    if "i" in flags.lower():
        pat = "(?i)" + pat
    repl_spark = re.sub(r"\\(\d)", r"$\1", repl)  # \1 → $1 (Java refs)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        for col in cols:
            c = _require(df, col)
            df = df.withColumn(c, F.regexp_replace(F.col(c).cast("string"), pat, repl_spark))
        return df

    return tr


@directive("extract-regex-groups")
def extract_regex_groups(call: DirectiveCall):
    """extract-regex-groups :col 'regex' — one column per MATCH per
    group, named `<col>_<match>_<group>` (reference transformation/
    ExtractRegexGroups.java:80-91: Matcher.find() loop, not just the
    first match). The max match count comes from a bounded data peek
    (ragged per-row widths need a fixed DataFrame schema); rows with
    fewer matches null-pad."""
    col = call.col(0)
    regex = call.text(1)
    try:
        ngroups = re.compile(regex).groups
    except re.error:
        # the regex executes JVM-side (java.util.regex), which accepts
        # constructs Python re rejects (\p{XDigit}, possessive
        # quantifiers) — fall back to a textual capturing-group count:
        # unescaped '(' not followed by '?'
        ngroups = len(re.findall(r"(?<!\\)\((?!\?)", regex))

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        if ngroups == 0:
            return df
        s = F.col(c).cast("string")
        arrs = [F.regexp_extract_all(s, F.lit(regex), g) for g in range(1, ngroups + 1)]
        peek = (
            df.select(F.size(arrs[0]).alias("n"))
            .limit(1000).agg(F.max("n").alias("n")).first()
        )
        n_matches = peek["n"] or 0
        for m in range(1, n_matches + 1):
            for g in range(1, ngroups + 1):
                # element_at returns null past the row's own match count
                df = df.withColumn(f"{c}_{m}_{g}", F.element_at(arrs[g - 1], m))
        return df

    return tr


@directive("split-email")
def split_email(call: DirectiveCall):
    """split-email :col → <col>_account / <col>_domain.

    Reference transformation/SplitEmail.java:83-123: a `Name <addr>`
    wrapper is unwrapped between the last '<' and last '>' (unclosed
    '<' → null/null), then the address splits at the LAST '@'
    (lastIndexOf — quoted accounts like joltie."@."root."@".@yahoo.com
    keep their inner @s); no '@' at all → null/null."""
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        # unwrap display-name form: greedy .*< pins the LAST '<', the
        # trailing [^>]*$ pins the LAST '>'
        addr = F.when(
            s.contains("<"),
            F.when(s.contains(">"), F.regexp_extract(s, r"^.*<(.*)>[^>]*$", 1)),
        ).otherwise(s)
        # greedy (.*)@ pins the LAST '@' (Java lastIndexOf semantics)
        valid = addr.contains("@")
        return df.withColumn(
            f"{c}_account", F.when(valid, F.regexp_extract(addr, r"^(.*)@[^@]*$", 1))
        ).withColumn(
            f"{c}_domain", F.when(valid, F.regexp_extract(addr, r"^.*@([^@]*)$", 1))
        )

    return tr


@directive("split-url")
def split_url(call: DirectiveCall):
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        host = F.parse_url(s, F.lit("HOST"))
        return (
            df.withColumn(f"{c}_protocol", F.lower(F.regexp_extract(s, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)))
            .withColumn(f"{c}_authority", F.regexp_extract(s, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
            .withColumn(f"{c}_host", host)
            .withColumn(
                f"{c}_port",
                F.regexp_extract(s, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]*:(\d+)", 1).cast("int"),
            )
            .withColumn(f"{c}_path", F.parse_url(s, F.lit("PATH")))
            .withColumn(f"{c}_filename", F.parse_url(s, F.lit("FILE")))
            .withColumn(f"{c}_query", F.parse_url(s, F.lit("QUERY")))
        )

    return tr


@directive("cut-character")
def cut_character(call: DirectiveCall):
    """cut-character :src :dst <ranges> — unix cut -c semantics
    (reference transformation/CharacterCut.java)."""
    src, dst = call.col(0), call.col(1)
    spec = call.text(2)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, src)
        s = F.col(c).cast("string")
        parts = []
        for rng in spec.split(","):
            rng = rng.strip()
            if "-" in rng:
                lo, _, hi = rng.partition("-")
                lo_i = int(lo) if lo else 1
                if hi:
                    parts.append(F.substring(s, lo_i, int(hi) - lo_i + 1))
                else:
                    parts.append(F.substring(s, lo_i, 2147483647))
            else:
                parts.append(F.substring(s, int(rng), 1))
        return df.withColumn(dst, F.concat(*parts) if len(parts) > 1 else parts[0])

    return tr


@directive("index-split", "indexsplit")
def index_split(call: DirectiveCall):
    src = call.col(0)
    start, end = call.int_(1), call.int_(2)
    dst = call.col(3)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, src)
        return df.withColumn(dst, F.substring(F.col(c).cast("string"), start, end - start + 1))

    return tr


@directive("split")
def split_deprecated(call: DirectiveCall):
    # split :source 'delim' :dst1 :dst2 (deprecated in reference)
    src = call.col(0)
    delim = call.text(1)
    d1, d2 = call.col(2), call.col(3)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, src)
        arr = F.split(F.col(c).cast("string"), re.escape(delim), 2)
        return df.withColumn(d1, arr.getItem(0)).withColumn(d2, arr.getItem(1))

    return tr


@directive("encode")
def encode(call: DirectiveCall):
    method = call.ident(0).lower().replace("-", "")
    col = call.col(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        out = f"{c}_encode_{method}"
        s = F.col(c).cast("string")
        if method == "base64":
            return df.withColumn(out, F.base64(s.cast("binary")))
        if method == "hex":
            return df.withColumn(out, F.lower(F.hex(s.cast("binary"))))
        if method == "base32":
            @pandas_udf(T.StringType())
            def b32(v: pd.Series) -> pd.Series:
                import base64 as _b64
                return v.map(
                    lambda x: _b64.b32encode(x.encode()).decode() if x is not None else None
                )
            return df.withColumn(out, b32(s))
        raise UsageError(f"encode: unsupported method {method!r}")

    return tr


@directive("decode")
def decode(call: DirectiveCall):
    method = call.ident(0).lower().replace("-", "")
    col = call.col(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        out = f"{c}_decode_{method}"
        s = F.col(c).cast("string")
        if method == "base64":
            return df.withColumn(out, F.unbase64(s).cast("string"))
        if method == "hex":
            return df.withColumn(out, F.unhex(s).cast("string"))
        if method == "base32":
            @pandas_udf(T.StringType())
            def b32d(v: pd.Series) -> pd.Series:
                import base64 as _b64
                return v.map(
                    lambda x: _b64.b32decode(x).decode() if x is not None else None
                )
            return df.withColumn(out, b32d(s))
        raise UsageError(f"decode: unsupported method {method!r}")

    return tr


@directive("hash")
def hash_(call: DirectiveCall):
    """hash :col <algo> [encode] (reference transformation/MessageHash.java).

    sha256(content) is the per-row invariant the CDC replay verifies
    (BASELINE.json input_hint)."""
    col = call.col(0)
    algo = call.ident(1).upper().replace("_", "-")
    encode_hex = call.bool_(2, default=True)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        if algo in ("SHA-256", "SHA256"):
            h = F.sha2(s, 256)
        elif algo in ("SHA-384", "SHA384"):
            h = F.sha2(s, 384)
        elif algo in ("SHA-512", "SHA512"):
            h = F.sha2(s, 512)
        elif algo in ("SHA-224", "SHA224"):
            h = F.sha2(s, 224)
        elif algo == "MD5":
            h = F.md5(s.cast("binary"))
        elif algo in ("SHA-1", "SHA1", "SHA"):
            h = F.sha1(s.cast("binary"))
        else:
            raise UsageError(f"hash: unsupported algorithm {algo!r}")
        return df.withColumn(c, h if encode_hex else F.unhex(F.upper(h)))

    return tr


@directive("mask-number")
def mask_number(call: DirectiveCall):
    """mask-number :col 'pattern' — substitution masking with the exact
    index-sync semantics of the reference (MaskNumber.java:121-147):
    '#' copies the input char and advances; 'x'/'X' emits lowercase 'x'
    and advances; any other pattern char is emitted and consumes the
    input char only when it matches. Executed as an `aggregate` fold
    over the (static) mask chars with a (index, output) struct
    accumulator: codegen emits one small loop body, so the generated
    method stays linear in size regardless of mask length (a naive
    per-char `when`-unroll nests the index expression exponentially and
    blows the JVM 64 KB method limit → interpreted fallback)."""
    col = call.col(0)
    mask = call.text(1)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        s = F.col(c).cast("string")
        ln = F.length(s)
        chars = F.array(*[F.lit(ch) for ch in mask])
        init = F.struct(F.lit(0).cast("int").alias("i"), F.lit("").alias("o"))

        def step(acc, ch):
            i, o = acc["i"], acc["o"]
            at = F.substring(s, i + F.lit(1), F.lit(1))
            is_hash = ch == "#"
            is_x = (ch == "x") | (ch == "X")
            within = i < ln
            emit = (
                F.when(is_hash, F.when(within, at).otherwise(F.lit("")))
                .when(is_x, F.lit("x"))
                .otherwise(ch)
            )
            adv = (
                F.when(is_hash | is_x, F.when(within | is_x, i + 1).otherwise(i))
                .otherwise(F.when(within & (at == ch), i + 1).otherwise(i))
            )
            return F.struct(adv.cast("int").alias("i"), F.concat(o, emit).alias("o"))

        masked = F.aggregate(chars, init, step)["o"] if mask else F.lit("")
        return df.withColumn(c, F.when(s.isNull(), None).otherwise(masked))

    return tr


@directive("mask-shuffle")
def mask_shuffle(call: DirectiveCall):
    """mask-shuffle :col — deterministic char-category shuffle with exact
    java.util.Random(0) parity (reference MaskShuffle.java:104-147).
    Arrow-batched pandas UDF (no Catalyst equivalent for the stateful
    per-char LCG)."""
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)

        @pandas_udf(T.StringType())
        def shuffle(v: pd.Series) -> pd.Series:
            CONS = "bcdfghjklmnpqrstvwxz"
            VOWEL = "aeiouy"
            DIGIT = "0123456789"

            class JavaRandom:
                # exact java.util.Random LCG
                def __init__(self, seed: int):
                    self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

                def _next(self, bits: int) -> int:
                    self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
                    return self.seed >> (48 - bits)

                def next_int(self, bound: int) -> int:
                    if bound & (bound - 1) == 0:
                        return (bound * self._next(31)) >> 31
                    while True:
                        bits = self._next(31)
                        val = bits % bound
                        if bits - val + (bound - 1) < (1 << 31):
                            return val

            def mask(x):
                if x is None:
                    return None
                r = JavaRandom(0)
                out = []
                for ch in x:
                    lo = ch.lower()
                    for cs in (CONS, VOWEL, DIGIT):
                        if lo in cs:
                            nc = cs[r.next_int(len(cs))]
                            out.append(nc.upper() if lo != ch else nc)
                            break
                    else:
                        out.append(ch)
                return "".join(out)

            return v.map(mask)

        return df.withColumn(c, shuffle(F.col(c).cast("string")))

    return tr


@directive("generate-uuid")
def generate_uuid(call: DirectiveCall):
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        # deterministic variant preferred for replay (SURVEY.md §2.7):
        # derive from the full record rather than F.uuid()
        rec = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        h = F.sha2(rec, 256)
        uuid = F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.substring(h, 13, 4),
            F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        )
        return df.withColumn(col, uuid)

    return tr


@directive("quantize")
def quantize(call: DirectiveCall):
    """quantize :src :dst lo:hi=label[,lo:hi=label…]
    (reference transformation/Quantization.java)."""
    src, dst = call.col(0), call.col(1)
    spec = call.text(2)
    ranges = []
    for part in spec.split(","):
        part = part.strip()
        m = re.match(r"^(-?[\d.]+):(-?[\d.]+)=(.+)$", part)
        if not m:
            raise UsageError(f"quantize: bad range {part!r}")
        lo, hi, label = float(m.group(1)), float(m.group(2)), m.group(3)
        # the v2 grammar strips single quotes around the range value
        # (reference parser/RecipeVisitor.java:160-165)
        if len(label) >= 2 and label[0] == label[-1] and label[0] in "'\"":
            label = label[1:-1]
        ranges.append((lo, hi, label))

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, src)
        v = F.col(c).cast("double")
        expr = None
        for lo, hi, label in ranges:
            cond = (v >= lo) & (v <= hi)
            expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        return df.withColumn(dst, expr)

    return tr


_TEXT_SIM_METHODS = (
    "levenshtein", "damerau-levenshtein", "jaro", "identity",
    "jaccard", "block", "block-distance", "cosine", "dice", "euclidean",
    "overlap-cofficient", "simon-white",
    "longest-common-subsequence", "longest-common-substring",
)


def _py_sim_udf(method: str):
    """Arrow-batched similarity for the edit-distance family no Spark
    builtin covers (simmetrics Jaro / DamerauLevenshtein / LCS)."""
    from pyspark.sql.functions import pandas_udf

    def jaro(s1: str, s2: str) -> float:
        if s1 == s2:
            return 1.0
        n1, n2 = len(s1), len(s2)
        if not n1 or not n2:
            return 0.0
        window = max(n1, n2) // 2 - 1
        m1, m2 = [False] * n1, [False] * n2
        matches = 0
        for i, ch in enumerate(s1):
            lo, hi = max(0, i - window), min(n2, i + window + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == ch:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if not matches:
            return 0.0
        k = t = 0
        for i in range(n1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        return (matches / n1 + matches / n2 + (matches - t) / matches) / 3

    def dam_lev(s1: str, s2: str) -> int:
        n1, n2 = len(s1), len(s2)
        if not n1:
            return n2
        if not n2:
            return n1
        prev2: list[int] = []
        prev = list(range(n2 + 1))
        for i in range(1, n1 + 1):
            cur = [i] + [0] * n2
            for j in range(1, n2 + 1):
                cost = 0 if s1[i - 1] == s2[j - 1] else 1
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
                if (
                    i > 1 and j > 1
                    and s1[i - 1] == s2[j - 2] and s1[i - 2] == s2[j - 1]
                ):
                    cur[j] = min(cur[j], prev2[j - 2] + cost)
            prev2, prev = prev, cur
        return prev[n2]

    def lcsubseq(s1: str, s2: str) -> int:
        n1, n2 = len(s1), len(s2)
        prev = [0] * (n2 + 1)
        for i in range(1, n1 + 1):
            cur = [0] * (n2 + 1)
            c1 = s1[i - 1]
            for j in range(1, n2 + 1):
                cur[j] = prev[j - 1] + 1 if c1 == s2[j - 1] else max(prev[j], cur[j - 1])
            prev = cur
        return prev[n2]

    def lcsubstr(s1: str, s2: str) -> int:
        n1, n2 = len(s1), len(s2)
        best = 0
        prev = [0] * (n2 + 1)
        for i in range(1, n1 + 1):
            cur = [0] * (n2 + 1)
            c1 = s1[i - 1]
            for j in range(1, n2 + 1):
                if c1 == s2[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    if cur[j] > best:
                        best = cur[j]
            prev = cur
        return best

    def sim_pair(s1: str, s2: str) -> tuple[float, float]:
        """(similarity, distance) per simmetrics conventions."""
        if method == "jaro":
            s = jaro(s1, s2)
            return s, 1.0 - s
        if method == "damerau-levenshtein":
            d = float(dam_lev(s1, s2))
            m = max(len(s1), len(s2))
            return (1.0 - d / m) if m else 1.0, d
        if method == "longest-common-subsequence":
            l = lcsubseq(s1, s2)
        else:
            l = lcsubstr(s1, s2)
        tot = len(s1) + len(s2)
        d = float(tot - 2 * l)
        # simmetrics LongestCommonSubsequence/Substring.compare():
        # lcs / max(|a|,|b|) (NOT Dice 2l/(n+m)) — pinned by the
        # Directive_parse_xmltojson e2e golden (5/14 for
        # "abc01@mail.com" vs "abc01"); distance stays n+m-2·lcs
        m = max(len(s1), len(s2))
        return (float(l) / m) if m else 1.0, d

    @pandas_udf(T.ArrayType(T.FloatType()))
    def run(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [list(sim_pair(x or "", y or "")) for x, y in zip(a, b)]
        )

    return run


def _text_sim_dist(method: str, a, b):
    """(similarity, distance) Columns for text-metric / text-distance
    (reference transformation/TextDistanceMeasure.java and
    TextMetricMeasure.java wrap the simmetrics StringMetrics /
    StringDistances builders; token measures use whitespace token SETS
    here — the reference test pins method coverage and null/numeric
    robustness, not per-method numerics). Null inputs read as empty."""
    a = F.coalesce(a.cast("string"), F.lit(""))
    b = F.coalesce(b.cast("string"), F.lit(""))
    if method == "levenshtein":
        d = F.levenshtein(a, b).cast("double")
        m = F.greatest(F.length(a), F.length(b))
        return F.when(m > 0, 1.0 - d / m).otherwise(F.lit(1.0)), d
    if method == "identity":
        sim = F.when(a == b, F.lit(1.0)).otherwise(F.lit(0.0))
        return sim, 1.0 - sim
    if method in ("jaro", "damerau-levenshtein",
                  "longest-common-subsequence", "longest-common-substring"):
        pair = _py_sim_udf(method)(a, b)
        return pair[0].cast("double"), pair[1].cast("double")
    if method == "simon-white":
        # character-bigram dice over uppercased words
        def grams(s):
            up = F.upper(F.regexp_replace(s, r"\s+", ""))
            return F.array_distinct(
                F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.length(up) - 1, F.lit(0))),
                        lambda i: up.substr(i, F.lit(2)),
                    ),
                    lambda g: F.length(g) == 2,
                )
            )
        ta, tb = grams(a), grams(b)
    else:
        def toks(s):
            return F.array_distinct(F.filter(F.split(s, r"\s+"), lambda t: t != ""))
        ta, tb = toks(a), toks(b)
    na, nb = F.size(ta).cast("double"), F.size(tb).cast("double")
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = F.size(F.array_union(ta, tb)).cast("double")
    both_empty = (na == 0) & (nb == 0)
    if method == "jaccard":
        sim = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
        return sim, 1.0 - sim
    if method in ("block", "block-distance"):
        d = na + nb - 2 * inter  # L1 over 0/1 token vectors
        sim = F.when(na + nb > 0, 1.0 - d / (na + nb)).otherwise(F.lit(1.0))
        return sim, d
    if method == "euclidean":
        d = F.sqrt(na + nb - 2 * inter)
        sim = F.when(na + nb > 0, 1.0 - d / F.sqrt(na + nb)).otherwise(F.lit(1.0))
        return sim, d
    if method in ("dice", "simon-white"):
        sim = F.when(na + nb > 0, 2 * inter / (na + nb)).otherwise(F.lit(1.0))
        return sim, 1.0 - sim
    if method == "cosine":
        denom = F.sqrt(na * nb)
        sim = F.when(denom > 0, inter / denom).otherwise(
            F.when(both_empty, F.lit(1.0)).otherwise(F.lit(0.0))
        )
        return sim, 1.0 - sim
    if method == "overlap-cofficient":  # reference spelling
        denom = F.least(na, nb)
        sim = F.when(denom > 0, inter / denom).otherwise(
            F.when(both_empty, F.lit(1.0)).otherwise(F.lit(0.0))
        )
        return sim, 1.0 - sim
    raise UsageError(f"text-distance/metric: unsupported method {method!r}")


@directive("text-distance")
def text_distance(call: DirectiveCall):
    """text-distance <method> :c1 :c2 :dst (reference
    transformation/TextDistanceMeasure.java — all 13 simmetrics
    builder methods from TextDistanceMeasureTest)."""
    method = call.ident(0).lower()
    c1, c2, dst = call.col(1), call.col(2), call.col(3)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        a = F.col(_require(df, c1))
        b = F.col(_require(df, c2))
        _, d = _text_sim_dist(method, a, b)
        return df.withColumn(dst, d.cast("float"))

    return tr


@directive("text-metric")
def text_metric(call: DirectiveCall):
    """text-metric <method> :c1 :c2 :dst — similarity in [0,1]
    (reference transformation/TextMetricMeasure.java)."""
    method = call.ident(0).lower()
    c1, c2, dst = call.col(1), call.col(2), call.col(3)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        a = F.col(_require(df, c1))
        b = F.col(_require(df, c2))
        sim, _ = _text_sim_dist(method, a, b)
        return df.withColumn(dst, sim.cast("float"))

    return tr


@directive("set-charset")
def set_charset(call: DirectiveCall):
    col = call.col(0)
    charset = call.text(1, default="utf-8")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        return df.withColumn(c, F.decode(F.col(c).cast("binary"), charset))

    return tr


@directive("redact-pii")
def redact_pii(call: DirectiveCall):
    """redact-pii :col [kinds,...] — mask SSN / email / US-phone /
    credit-card / IPv4 occurrences inside free text with [TYPE]
    placeholders (pipeline/text.py REDACT_PATTERNS; corpus
    sanitization before pretraining). Kinds defaults to all."""
    from wrangler_spark.pipeline.text import REDACT_PATTERNS, redact_pii_expr

    col = call.col(0)
    kinds = None
    if call.has(1):
        kinds = [k.strip().lower() for k in call.text(1).split(",") if k.strip()]
        known = {k for k, _ in REDACT_PATTERNS}
        bad = [k for k in kinds if k not in known]
        if bad:
            raise UsageError(f"redact-pii: unknown kind(s) {bad} — known: {sorted(known)}")

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        c = _require(df, col)
        return df.withColumn(c, redact_pii_expr(F.col(c).cast("string"), kinds))

    return tr
