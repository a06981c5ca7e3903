"""JEXL-subset → pyspark.sql.Column translator.

The reference embeds Apache Commons JEXL 3 scripts in `set-column`,
`filter-row`, `fail`, `send-to-error`, `set-variable`
(wrangler-core expression/EL.java:82-190). We translate the commonly
used subset at recipe-compile time into native Column expressions so
the hot path stays inside whole-stage codegen — no per-row Python,
no JVM script engine.

Supported: literals, column refs (case-insensitive; missing columns
become NULL per EL.java:130-138), `== != < <= > >= && || ! + - * / %`,
regex match `=~` / `!~` (full-match, JEXL String semantics), ternary
`c ? a : b`, struct field access `a.b`, array/map index `a[i]`, and
namespaced function calls `ns:fn(args)` resolved via
wrangler_spark.expr.functions.FUNCS.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangler_spark.errors import ExpressionError

# ---------------------------------------------------------------- tokens

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+([eE][+-]?\d+)?[dDfFbB]?|\d+[lLdDfFbB]?|\.\d+)
  | (?P<str>'(\\.|[^'\\])*'|"(\\.|[^"\\])*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>=~|!~|=\^|=\$|!\^|!\$|==|!=|<=|>=|&&|\|\||[-+*/%!<>?:().,;=\[\]{}])
    """,
    re.VERBOSE,
)

KEYWORDS = {"true", "false", "null", "and", "or", "not", "eq", "ne", "lt", "le", "gt", "ge"}
_KW_OPS = {"and": "&&", "or": "||", "not": "!", "eq": "==", "ne": "!=",
           "lt": "<", "le": "<=", "gt": ">", "ge": ">="}


@dataclass
class _Tk:
    kind: str  # NUM STR IDENT OP BOOL NULL
    value: object


def _tokenize(src: str) -> list[_Tk]:
    toks: list[_Tk] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ExpressionError(f"cannot tokenize expression at {src[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        if m.lastgroup == "num":
            raw = m.group("num")
            # JEXL literal suffixes: l=long d=double f=float b=BigDecimal
            # (NumberFunctionsTest: 43.2534d, 214748364721l, 12.00123b)
            is_float = "." in raw or "e" in raw.lower() or raw[-1] in "dDfFbB"
            raw = raw.rstrip("lLdDfFbB")
            toks.append(_Tk("NUM", float(raw) if is_float else int(raw)))
        elif m.lastgroup == "str":
            s = m.group("str")
            body = s[1:-1]
            # collapse only quote/backslash escapes (regexes keep \d etc.)
            body = re.sub(r"\\(['\"\\])", r"\1", body)
            toks.append(_Tk("STR", body))
        elif m.lastgroup == "ident":
            w = m.group("ident")
            lw = w.lower()
            if lw in ("true", "false"):
                toks.append(_Tk("BOOL", lw == "true"))
            elif lw == "null":
                toks.append(_Tk("NULL", None))
            elif lw in _KW_OPS and not (
                len(toks) >= 2
                and toks[-1].kind == "OP" and toks[-1].value == ":"
                and toks[-2].kind == "IDENT"
                and re.match(r"\s*\(", src[pos:])
            ):
                # `ns:Kw(` is a namespaced function call — logical:Not(x)
                # (reference LogicalTest.java) — not the `!` operator;
                # a ternary's `: not y` branch stays an operator because
                # no `(` follows
                toks.append(_Tk("OP", _KW_OPS[lw]))
            else:
                toks.append(_Tk("IDENT", w))
        else:
            toks.append(_Tk("OP", m.group("op")))
    return toks


# ---------------------------------------------------------------- AST

@dataclass
class Lit:
    value: object


@dataclass
class Var:
    name: str


@dataclass
class Call:
    ns: str  # '' = default namespace
    name: str
    args: list


@dataclass
class Bin:
    op: str
    left: object
    right: object


@dataclass
class Un:
    op: str
    operand: object


@dataclass
class Ternary:
    cond: object
    then: object
    other: object


@dataclass
class Attr:
    obj: object
    name: str


@dataclass
class Index:
    obj: object
    index: object


@dataclass
class Arr:
    """JEXL array literal `[a, b, c]` (reference LogicalTest.java:
    logical:SetBit(356, [2,4,8], 1))."""

    items: list


@dataclass
class Block:
    """JEXL block with local assignments `{ a = 5.0; f(a/2) }`
    (reference NumberFunctionsTest.java, ELTest.java) — the bindings
    evaluate in order into a local scope; the final expression is the
    block's value."""

    bindings: list  # [(name, expr), ...]
    result: object


class _Parser:
    def __init__(self, toks: list[_Tk], src: str):
        self.toks = toks
        self.i = 0
        self.src = src

    def peek(self, k: int = 0) -> _Tk | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> _Tk:
        t = self.peek()
        if t is None:
            raise ExpressionError(f"unexpected end of expression: {self.src!r}")
        self.i += 1
        return t

    def eat_op(self, *ops: str) -> str | None:
        t = self.peek()
        if t and t.kind == "OP" and t.value in ops:
            self.i += 1
            return str(t.value)
        return None

    def expect_op(self, op: str):
        if not self.eat_op(op):
            raise ExpressionError(f"expected {op!r} in {self.src!r} (at token {self.i})")

    # precedence-climbing
    def parse(self):
        e = self.block() if self._at_block() else self.ternary()
        if self.peek() is not None:
            raise ExpressionError(f"trailing tokens in expression {self.src!r}")
        return e

    def _at_block(self) -> bool:
        t = self.peek()
        return bool(t and t.kind == "OP" and t.value == "{")

    def block(self):
        """`{ a = expr; b = expr; result }` — assignment statements
        then a value expression (trailing `;` tolerated)."""
        self.expect_op("{")
        bindings: list = []
        result: object = Lit(None)
        while not self.eat_op("}"):
            n1, n2 = self.peek(), self.peek(1)
            if (
                n1 and n1.kind == "IDENT"
                and n2 and n2.kind == "OP" and n2.value == "="
            ):
                self.i += 2
                bindings.append((str(n1.value), self.ternary()))
            else:
                result = self.ternary()
            if not self.eat_op(";"):
                self.expect_op("}")
                break
        return Block(bindings, result)

    def ternary(self):
        cond = self.or_()
        if self.eat_op("?"):
            then = self.ternary()
            self.expect_op(":")
            other = self.ternary()
            return Ternary(cond, then, other)
        return cond

    def or_(self):
        e = self.and_()
        while self.eat_op("||"):
            e = Bin("||", e, self.and_())
        return e

    def and_(self):
        e = self.equality()
        while self.eat_op("&&"):
            e = Bin("&&", e, self.equality())
        return e

    def equality(self):
        e = self.relational()
        while True:
            op = self.eat_op("==", "!=", "=~", "!~", "=^", "=$", "!^", "!$")
            if not op:
                return e
            e = Bin(op, e, self.relational())

    def relational(self):
        e = self.additive()
        while True:
            op = self.eat_op("<", "<=", ">", ">=")
            if not op:
                return e
            e = Bin(op, e, self.additive())

    def additive(self):
        e = self.multiplicative()
        while True:
            op = self.eat_op("+", "-")
            if not op:
                return e
            e = Bin(op, e, self.multiplicative())

    def multiplicative(self):
        e = self.unary()
        while True:
            op = self.eat_op("*", "/", "%")
            if not op:
                return e
            e = Bin(op, e, self.unary())

    def unary(self):
        op = self.eat_op("!", "-", "+")
        if op:
            return Un(op, self.unary())
        return self.postfix()

    def postfix(self):
        e = self.primary()
        while True:
            if self.eat_op("."):
                t = self.next()
                if t.kind != "IDENT":
                    raise ExpressionError(f"expected field name after '.' in {self.src!r}")
                nxt = self.peek()
                if nxt and nxt.kind == "OP" and nxt.value == "(":
                    # method-call style: obj.fn(args) → default-ns fn(obj, *args)
                    self.i += 1
                    args = self._args()
                    e = Call("", str(t.value), [e, *args])
                else:
                    e = Attr(e, str(t.value))
            elif self.eat_op("["):
                idx = self.ternary()
                self.expect_op("]")
                e = Index(e, idx)
            else:
                return e

    def _args(self) -> list:
        args: list = []
        if self.eat_op(")"):
            return args
        while True:
            args.append(self.ternary())
            if self.eat_op(")"):
                return args
            self.expect_op(",")

    def primary(self):
        t = self.next()
        if t.kind in ("NUM", "STR", "BOOL", "NULL"):
            return Lit(t.value)
        if t.kind == "OP" and t.value == "(":
            e = self.ternary()
            self.expect_op(")")
            return e
        if t.kind == "OP" and t.value == "[":
            items: list = []
            if not self.eat_op("]"):
                while True:
                    items.append(self.ternary())
                    if self.eat_op("]"):
                        break
                    self.expect_op(",")
            return Arr(items)
        if t.kind == "IDENT":
            name = str(t.value)
            n1, n2 = self.peek(), self.peek(1)
            # JEXL statement form `if (cond) { a } [else { b }]`
            # (reference GlobalTest.java:106-141) → ternary
            if (
                name.lower() == "if" and n1 and n1.kind == "OP" and n1.value == "("
            ):
                self.i += 1
                cond = self.ternary()
                if self.eat_op(","):
                    # function form if(cond, a, b)
                    args = [cond, self.ternary()]
                    while self.eat_op(","):
                        args.append(self.ternary())
                    self.expect_op(")")
                    return Call("", "if", args)
                self.expect_op(")")
                nt = self.peek()
                if nt and nt.kind == "OP" and nt.value == "{":
                    self.expect_op("{")
                    then = self.ternary()
                    self.expect_op("}")
                    other: object = Lit(None)
                    et = self.peek()
                    if et and et.kind == "IDENT" and str(et.value).lower() == "else":
                        self.i += 1
                        self.expect_op("{")
                        other = self.ternary()
                        self.expect_op("}")
                    return Ternary(cond, then, other)
                return Call("", "if", [cond])
            # namespaced call: ident ':' ident '('
            if (
                n1 and n1.kind == "OP" and n1.value == ":"
                and n2 and n2.kind == "IDENT"
            ):
                n3 = self.peek(2)
                if n3 and n3.kind == "OP" and n3.value == "(":
                    self.i += 3
                    return Call(name.lower(), str(n2.value), self._args())
            if n1 and n1.kind == "OP" and n1.value == "(":
                self.i += 1
                return Call("", name, self._args())
            return Var(name)
        raise ExpressionError(f"unexpected token {t!r} in {self.src!r}")


def parse_expr(src: str):
    return _Parser(_tokenize(src), src).parse()


# ---------------------------------------------------------------- compile

@dataclass
class TypedCol:
    col: Column
    dtype: T.DataType | None = None  # None = unknown
    lit: object = None  # compile-time constant value when known

    @property
    def is_string(self) -> bool:
        return isinstance(self.dtype, T.StringType)

    @property
    def is_numeric(self) -> bool:
        return isinstance(self.dtype, T.NumericType)


def _field_type(schema: T.StructType | None, name: str) -> T.DataType | None:
    if schema is None:
        return None
    for f in schema.fields:
        if f.name.lower() == name.lower():
            return f.dataType
    return None


def _regex_fullmatch(col: Column, pattern: str) -> Column:
    # JEXL `=~` on strings is a full regex match (String.matches()).
    return col.rlike(f"^(?:{pattern})$")


def compile_node(node, schema: T.StructType | None, variables: dict[str, TypedCol] | None = None) -> TypedCol:
    from wrangler_spark.expr.functions import resolve_call

    # copy: Block bindings shadow locally, never leak to the caller
    variables = dict(variables) if variables else {}

    def rec(n) -> TypedCol:
        if isinstance(n, Lit):
            v = n.value
            if v is None:
                return TypedCol(F.lit(None), T.NullType())
            dt = (
                T.BooleanType() if isinstance(v, bool)
                else T.LongType() if isinstance(v, int)
                else T.DoubleType() if isinstance(v, float)
                else T.StringType()
            )
            return TypedCol(F.lit(v), dt, lit=v)
        if isinstance(n, Block):
            # bindings shadow columns for the rest of the block
            for name, expr in n.bindings:
                variables[name.lower()] = rec(expr)
            return rec(n.result)
        if isinstance(n, Arr):
            items = [rec(it) for it in n.items]
            elem_dt = next((it.dtype for it in items if it.dtype is not None), None)
            lit_vals = [it.lit for it in items]
            return TypedCol(
                F.array(*[it.col for it in items]),
                T.ArrayType(elem_dt) if elem_dt is not None else None,
                lit=lit_vals if all(v is not None for v in lit_vals) else None,
            )
        if isinstance(n, Var):
            key = n.name.lower()
            if key in variables:
                return variables[key]
            ft = _field_type(schema, n.name)
            if ft is None and schema is not None:
                # missing columns evaluate to null (reference EL.java:130-138)
                return TypedCol(F.lit(None), T.NullType())
            return TypedCol(F.col(n.name), ft)
        if isinstance(n, Attr):
            base = rec(n.obj)
            dt = None
            if isinstance(base.dtype, T.StructType):
                dt = _field_type(base.dtype, n.name)
            return TypedCol(base.col.getField(n.name), dt)
        if isinstance(n, Index):
            base = rec(n.obj)
            idx = rec(n.index)
            dt = None
            if isinstance(base.dtype, T.ArrayType):
                dt = base.dtype.elementType
            elif isinstance(base.dtype, T.MapType):
                dt = base.dtype.valueType
            return TypedCol(base.col[idx.col], dt)
        if isinstance(n, Un):
            x = rec(n.operand)
            if n.op == "!":
                return TypedCol(~x.col.cast("boolean"), T.BooleanType())
            if n.op == "-":
                return TypedCol(-x.col, x.dtype)
            return x
        if isinstance(n, Ternary):
            c, a, b = rec(n.cond), rec(n.then), rec(n.other)
            dt = a.dtype if a.dtype is not None and not isinstance(a.dtype, T.NullType) else b.dtype
            return TypedCol(F.when(c.col, a.col).otherwise(b.col), dt)
        if isinstance(n, Bin):
            le, ri = rec(n.left), rec(n.right)
            op = n.op
            if op == "&&":
                return TypedCol(le.col.cast("boolean") & ri.col.cast("boolean"), T.BooleanType())
            if op == "||":
                return TypedCol(le.col.cast("boolean") | ri.col.cast("boolean"), T.BooleanType())
            if op == "==":
                # JEXL equality is Java equals: null == null is TRUE,
                # null == x is FALSE (reference EL evaluates scripts with
                # Java semantics, not SQL three-valued logic). Spark's
                # eqNullSafe (<=>) matches exactly and still pushes into
                # parquet scans (EqualNullSafe is a supported pushdown).
                return TypedCol(le.col.eqNullSafe(ri.col), T.BooleanType())
            if op == "!=":
                return TypedCol(~le.col.eqNullSafe(ri.col), T.BooleanType())
            if op == "<":
                return TypedCol(le.col < ri.col, T.BooleanType())
            if op == "<=":
                return TypedCol(le.col <= ri.col, T.BooleanType())
            if op == ">":
                return TypedCol(le.col > ri.col, T.BooleanType())
            if op == ">=":
                return TypedCol(le.col >= ri.col, T.BooleanType())
            if op in ("=~", "!~"):
                if isinstance(n.right, Lit) and isinstance(n.right.value, str):
                    m = _regex_fullmatch(le.col.cast("string"), n.right.value)
                else:
                    m = le.col.cast("string").rlike(ri.col.cast("string"))
                return TypedCol(~m if op == "!~" else m, T.BooleanType())
            if op in ("=^", "!^", "=$", "!$"):
                # commons-jexl3 starts-with / ends-with operators
                # (JexlOperator.STARTSWITH/ENDSWITH) — used by the
                # reference e2e recipes (`host =$ "1"`)
                ls, rs = le.col.cast("string"), ri.col.cast("string")
                m = ls.startswith(rs) if op[1] == "^" else ls.endswith(rs)
                return TypedCol(~m if op[0] == "!" else m, T.BooleanType())
            if op == "+":
                if le.is_string or ri.is_string:
                    # JEXL string concatenation
                    return TypedCol(
                        F.concat(le.col.cast("string"), ri.col.cast("string")), T.StringType()
                    )
                return TypedCol(le.col + ri.col, _num_out(le, ri))
            if op == "-":
                return TypedCol(le.col - ri.col, _num_out(le, ri))
            if op == "*":
                return TypedCol(le.col * ri.col, _num_out(le, ri))
            if op == "/":
                return TypedCol(le.col / ri.col, T.DoubleType())
            if op == "%":
                return TypedCol(le.col % ri.col, _num_out(le, ri))
            raise ExpressionError(f"unsupported operator {op!r}")
        if isinstance(n, Call):
            if (
                n.ns == "" and n.name.lower() == "width"
                and len(n.args) == 1 and isinstance(n.args[0], Var)
                and n.args[0].name.lower() == "this"
            ):
                # `this.width()` — reference Row.width() exposed to JEXL
                # (SendToErrorTest.java:41, CsvParserTest.java:121). The
                # reference's ragged rows project onto this engine's
                # fixed schema as null cells, so width == count of
                # non-null cells in the row.
                if schema is None:
                    raise ExpressionError("this.width() requires a known schema")
                cnt = None
                for f_ in schema.fields:
                    e = F.when(F.col(f"`{f_.name}`").isNotNull(), 1).otherwise(0)
                    cnt = e if cnt is None else (cnt + e)
                return TypedCol(
                    cnt if cnt is not None else F.lit(0), T.IntegerType()
                )
            if (
                n.ns == "dq" and n.name.lower() in ("columns", "hascolumn")
                and n.args and isinstance(n.args[0], Var)
                and n.args[0].name.lower() == "this"
            ):
                # reference DataQuality.columns(row)/hascolumn(row, col)
                # (DataQualityTest.java). Same ragged-row projection as
                # this.width(): a missing cell is a null cell here, so
                # columns == non-null count and hascolumn == the named
                # cell is present (in-schema and non-null).
                if schema is None:
                    raise ExpressionError(f"dq:{n.name} requires a known schema")
                if n.name.lower() == "columns":
                    cnt = None
                    for f_ in schema.fields:
                        e = F.when(F.col(f"`{f_.name}`").isNotNull(), 1).otherwise(0)
                        cnt = e if cnt is None else (cnt + e)
                    return TypedCol(
                        cnt if cnt is not None else F.lit(0), T.IntegerType()
                    )
                if len(n.args) != 2:
                    raise ExpressionError("dq:hascolumn(this, column)")
                cname = rec(n.args[1]).lit
                if cname is None:
                    raise ExpressionError("dq:hascolumn column must be a literal")
                fld = next(
                    (f_ for f_ in schema.fields
                     if f_.name.lower() == str(cname).lower()), None
                )
                if fld is None:
                    return TypedCol(F.lit(False), T.BooleanType())
                return TypedCol(
                    F.col(f"`{fld.name}`").isNotNull(), T.BooleanType()
                )
            args = [rec(a) for a in n.args]
            return resolve_call(n.ns, n.name, args)
        raise ExpressionError(f"unsupported expression node {n!r}")

    return rec(node)


def _num_out(a: TypedCol, b: TypedCol) -> T.DataType | None:
    for cand in (T.DoubleType(), T.FloatType(), T.DecimalType()):
        if isinstance(a.dtype, type(cand)) or isinstance(b.dtype, type(cand)):
            return T.DoubleType()
    if isinstance(a.dtype, T.NumericType) and isinstance(b.dtype, T.NumericType):
        return T.LongType()
    return None


def compile_expr(
    src: str,
    schema: T.StructType | None = None,
    variables: dict[str, TypedCol] | None = None,
) -> Column:
    """Compile a JEXL-subset expression string to a Column."""
    return compile_node(parse_expr(src), schema, variables).col


def predicate_refs(src: str) -> tuple[set[str], set[str]]:
    """(value_refs, nulltest_refs) of a JEXL boolean expression — the
    identifier-usage analysis behind recipe-level filter hoisting
    (recipe/compiler.py): an identifier whose ONLY appearance in a
    subtree is `x == null` / `null != x` etc. depends solely on the
    column's NULLNESS there; any other appearance depends on its value.
    Identifiers in both kinds of position land in both sets."""
    ast = parse_expr(src)
    vrefs: set[str] = set()
    nrefs: set[str] = set()

    def walk(n) -> None:
        if isinstance(n, Bin):
            if n.op in ("==", "!="):
                ln, rn = n.left, n.right
                if isinstance(ln, Var) and isinstance(rn, Lit) and rn.value is None:
                    nrefs.add(ln.name.lower())
                    return
                if isinstance(rn, Var) and isinstance(ln, Lit) and ln.value is None:
                    nrefs.add(rn.name.lower())
                    return
            walk(n.left)
            walk(n.right)
        elif isinstance(n, Un):
            walk(n.operand)
        elif isinstance(n, Ternary):
            walk(n.cond)
            walk(n.then)
            walk(n.other)
        elif isinstance(n, Call):
            if n.name.lower() in ("width", "columns", "hascolumn") and any(
                isinstance(a, Var) and a.name.lower() == "this" for a in n.args
            ):
                # this.width() reads EVERY column's nullness — no
                # finite ref set, so the predicate must not hoist
                raise ExpressionError("this.width() blocks hoisting")
            for a in n.args:
                walk(a)
        elif isinstance(n, Attr):
            walk(n.obj)
        elif isinstance(n, Index):
            walk(n.obj)
            walk(n.index)
        elif isinstance(n, Arr):
            for it in n.items:
                walk(it)
        elif isinstance(n, Block):
            # bound names are locals, not column refs — a block
            # predicate never hoists cleanly, so treat every ref
            # (including shadowed ones) as a value ref: conservative,
            # blocks hoisting only when a bound name shadows a column
            for _, expr in n.bindings:
                walk(expr)
            walk(n.result)
        elif isinstance(n, Var):
            vrefs.add(n.name.lower())

    walk(ast)
    return vrefs, nrefs
