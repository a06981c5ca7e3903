"""Recipe DSL parser.

Parses Wrangler-style recipe text (both the v1 bare-word syntax and the
v2 ``:col`` / ``exp:{...}`` syntax — the reference migrates v1→v2 in
parser/MigrateToV2.java; we accept both directly) into a list of
``DirectiveCall``s. Grammar modeled on the reference's ANTLR grammar
``wrangler-core/src/main/antlr4/.../Directives.g4`` re-expressed as a
hand-written tokenizer (no parser-generator dependency).

Token kinds:
    COL      ``:name``                  → column reference
    COLLIST  ``:a,:b`` / ``a,b,c``      → list of column names
    TEXT     ``'...'`` / ``"..."``      → string literal (escapes honored)
    NUM      ``12`` / ``-3.5``          → number
    NUMLIST  ``2,4,5``                  → list of numbers
    BOOL     ``true`` / ``false``
    EXPR     ``exp:{...}``              → embedded JEXL-subset expression
    PROP     ``prop:{k=v, ...}``        → property map
    IDENT    any other bare word (mask patterns, options, ranges…)

Some directives take a free-form expression tail (``filter-row-if-true
age > 10 && name =~ "CA"``): the registry marks those with
``raw_tail=k`` meaning "tokenize k leading args, keep the rest verbatim
as one EXPR token".
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from wrangler_spark.errors import DirectiveParseError, UsageError

_NUM_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")
_NUMLIST_RE = re.compile(r"^-?\d+(\.\d+)?(\s*,\s*-?\d+(\.\d+)?)+$")


@dataclass
class Tok:
    kind: str  # COL COLLIST TEXT TEXTLIST NUM NUMLIST BOOL EXPR PROP IDENT
    value: object
    raw: str


@dataclass
class DirectiveCall:
    name: str
    toks: list[Tok]
    line_no: int = 0
    source: str = ""
    pragmas: dict = field(default_factory=dict)

    # ---- typed accessors (the MapArguments equivalent) ----
    def _get(self, i: int):
        if i >= len(self.toks):
            raise UsageError(
                f"{self.name}: missing argument #{i + 1} (line {self.line_no}: {self.source!r})"
            )
        return self.toks[i]

    def has(self, i: int) -> bool:
        return i < len(self.toks)

    def col(self, i: int) -> str:
        t = self._get(i)
        if t.kind in ("COL", "IDENT", "TEXT"):
            return str(t.value)
        if t.kind == "COLLIST" and len(t.value) == 1:
            return t.value[0]
        raise UsageError(f"{self.name}: argument #{i + 1} should be a column, got {t.raw!r}")

    def cols(self, i: int) -> list[str]:
        t = self._get(i)
        if t.kind == "COLLIST":
            return list(t.value)
        if t.kind in ("COL", "IDENT", "TEXT"):
            # v1 bare lists: `drop a,b,c`
            if "," in str(t.value):
                return [p.strip().lstrip(":") for p in str(t.value).split(",") if p.strip()]
            return [str(t.value)]
        raise UsageError(f"{self.name}: argument #{i + 1} should be column(s), got {t.raw!r}")

    def text(self, i: int, default: str | None = None) -> str:
        if not self.has(i):
            if default is not None:
                return default
            raise UsageError(f"{self.name}: missing text argument #{i + 1}")
        t = self.toks[i]
        if t.kind in ("TEXT", "IDENT", "COL", "BOOL"):
            return str(t.value) if t.kind != "BOOL" else t.raw
        if t.kind in ("NUM",):
            return t.raw
        if t.kind == "EXPR":
            return str(t.value)
        if t.kind in ("NUMLIST", "COLLIST"):
            # unquoted range/list specs read as text — `cut-character
            # body five 1,2,3` (CharacterCutTest.testBasicCharacterCut)
            return t.raw
        raise UsageError(f"{self.name}: argument #{i + 1} should be text, got {t.raw!r}")

    def texts(self, i: int) -> list[str]:
        """TEXT_LIST accessor (reference api/parser/TextList): a single
        quoted string reads as a one-element list."""
        t = self._get(i)
        if t.kind == "TEXTLIST":
            return list(t.value)
        if t.kind in ("TEXT", "IDENT"):
            return [str(t.value)]
        raise UsageError(f"{self.name}: argument #{i + 1} should be a text list, got {t.raw!r}")

    def num(self, i: int, default: float | None = None) -> float:
        if not self.has(i) and default is not None:
            return default
        t = self._get(i)
        if t.kind == "NUM":
            return t.value
        if t.kind in ("TEXT", "IDENT") and _NUM_RE.match(str(t.value).strip()):
            return float(t.value)
        raise UsageError(f"{self.name}: argument #{i + 1} should be a number, got {t.raw!r}")

    def int_(self, i: int, default: int | None = None) -> int:
        return int(self.num(i, default))

    def nums(self, i: int) -> list[float]:
        t = self._get(i)
        if t.kind == "NUMLIST":
            return list(t.value)
        if t.kind == "NUM":
            return [t.value]
        if t.kind in ("TEXT", "IDENT"):
            parts = [p.strip() for p in str(t.value).split(",")]
            if all(_NUM_RE.match(p) for p in parts):
                return [float(p) for p in parts]
        raise UsageError(f"{self.name}: argument #{i + 1} should be number(s), got {t.raw!r}")

    def bool_(self, i: int, default: bool | None = None) -> bool:
        if not self.has(i) and default is not None:
            return default
        t = self._get(i)
        if t.kind == "BOOL":
            return t.value
        if t.kind in ("TEXT", "IDENT") and str(t.value).lower() in ("true", "false"):
            return str(t.value).lower() == "true"
        raise UsageError(f"{self.name}: argument #{i + 1} should be true/false, got {t.raw!r}")

    def expr(self, i: int) -> str:
        t = self._get(i)
        if t.kind == "EXPR":
            return str(t.value)
        if t.kind in ("TEXT", "IDENT"):
            return _strip_exp_wrapper(str(t.value))
        raise UsageError(f"{self.name}: argument #{i + 1} should be an expression, got {t.raw!r}")

    def prop(self, i: int) -> dict:
        if not self.has(i):
            return {}
        t = self.toks[i]
        if t.kind == "PROP":
            return dict(t.value)
        raise UsageError(f"{self.name}: argument #{i + 1} should be prop:{{...}}")

    def ident(self, i: int, default: str | None = None) -> str:
        if not self.has(i) and default is not None:
            return default
        return self.text(i)


def _scan_quoted(seg: str, i: int) -> tuple[str, int]:
    """Scan one quoted string starting at seg[i] (a quote char); returns
    (unescaped value, index just past the closing quote). Only quote and
    backslash escapes collapse; regex classes like \\d keep the slash."""
    c = seg[i]
    n = len(seg)
    j = i + 1
    buf: list[str] = []
    while j < n:
        if seg[j] == "\\" and j + 1 < n:
            nxt = seg[j + 1]
            if nxt in ("'", '"', "\\"):
                buf.append(nxt)
            else:
                buf.append(seg[j])
                buf.append(nxt)
            j += 2
            continue
        if seg[j] == c:
            break
        buf.append(seg[j])
        j += 1
    if j >= n:
        raise DirectiveParseError("unterminated string literal", source=seg)
    return "".join(buf), j + 1


def _strip_exp_wrapper(s: str) -> str:
    s = s.strip()
    for prefix in ("exp:{", "condition:{", "exp:"):
        if s.startswith(prefix) and prefix.endswith("{") and s.endswith("}"):
            return s[len(prefix):-1].strip()
    if s.startswith("exp:{") and s.endswith("}"):
        return s[5:-1].strip()
    return s


def _balanced_block(line: str, start: int) -> tuple[str, int]:
    """Capture {...} starting at line[start]=='{' honoring nested braces/quotes."""
    depth = 0
    i = start
    in_q: str | None = None
    while i < len(line):
        c = line[i]
        if in_q:
            if c == "\\":
                i += 2
                continue
            if c == in_q:
                in_q = None
        elif c in "'\"":
            in_q = c
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return line[start + 1 : i], i + 1
        i += 1
    raise DirectiveParseError("unbalanced '{' in directive", source=line)


def _parse_props(body: str) -> dict:
    out: dict[str, object] = {}
    for part in re.split(r"[,;]", body):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise DirectiveParseError(f"bad property {part!r} (want k=v)")
        k, v = part.split("=", 1)
        v = v.strip().strip("'\"")
        if _NUM_RE.match(v):
            out[k.strip()] = float(v) if "." in v else int(v)
        elif v.lower() in ("true", "false"):
            out[k.strip()] = v.lower() == "true"
        else:
            out[k.strip()] = v
    return out


def _classify_word(word: str) -> Tok:
    if word.startswith(":"):
        # :a,:b,:c or :a
        names = [p.lstrip(":") for p in word.split(",") if p.strip()]
        if len(names) == 1:
            return Tok("COL", names[0], word)
        return Tok("COLLIST", names, word)
    if _NUM_RE.match(word):
        return Tok("NUM", float(word) if ("." in word or "e" in word.lower()) else int(word), word)
    if _NUMLIST_RE.match(word):
        return Tok("NUMLIST", [float(p) for p in word.split(",")], word)
    if word.lower() in ("true", "false"):
        return Tok("BOOL", word.lower() == "true", word)
    return Tok("IDENT", word, word)


def tokenize_segment(seg: str, raw_tail: int | None = None) -> list[Tok]:
    """Tokenize the argument portion of one directive invocation."""
    toks: list[Tok] = []
    i, n = 0, len(seg)
    while i < n:
        c = seg[i]
        if c.isspace():
            i += 1
            continue
        if raw_tail is not None and len(toks) >= raw_tail:
            if re.match(r"(exp|condition)\s*:\s*\{", seg[i:]):
                # explicit exp:{...} block: tokenize it, then resume normal
                # tokenization (trailing flags like `filter-row exp:{..} true`)
                raw_tail = None
            else:
                rest = seg[i:].strip()
                if rest:
                    toks.append(Tok("EXPR", _strip_exp_wrapper(rest), rest))
                break
        m = re.match(r"(exp|condition|prop)\s*:\s*\{", seg[i:])
        if m:
            brace_at = i + m.end() - 1
            body, nxt = _balanced_block(seg, brace_at)
            kind = "PROP" if m.group(1) == "prop" else "EXPR"
            value: object = _parse_props(body) if kind == "PROP" else body.strip()
            toks.append(Tok(kind, value, seg[i:nxt]))
            i = nxt
            continue
        if c in "'\"":
            value, after = _scan_quoted(seg, i)
            # textList (reference grammar Directives.g4 / TextList token:
            # STRING (',' STRING)+ ) — quoted strings joined by commas
            # merge into one TEXTLIST argument
            items = [value]
            end = after
            while True:
                k = end
                while k < n and seg[k].isspace():
                    k += 1
                if k < n and seg[k] == ",":
                    k += 1
                    while k < n and seg[k].isspace():
                        k += 1
                    if k < n and seg[k] in "'\"":
                        nxt_val, nxt_after = _scan_quoted(seg, k)
                        items.append(nxt_val)
                        end = nxt_after
                        continue
                break
            if len(items) == 1:
                toks.append(Tok("TEXT", value, seg[i:after]))
            else:
                toks.append(Tok("TEXTLIST", items, seg[i:end]))
            i = end if len(items) > 1 else after
            continue
        # bare word: maximal run of non-space chars
        j = i
        while j < n and not seg[j].isspace():
            j += 1
        word = seg[i:j]
        # ':a, :b' style list with spaces after commas — merge with
        # following. A SOLITARY comma is not a list fragment but a bare
        # delimiter argument (reference v1 syntax: `parse-as-csv body , false`)
        while len(word) > 1 and word.endswith(",") and j < n:
            while j < n and seg[j].isspace():
                j += 1
            k = j
            while k < n and not seg[k].isspace():
                k += 1
            word += seg[j:k]
            j = k
        toks.append(_classify_word(word))
        i = j
    return toks


# directives whose tail is a free-form expression: name -> #leading tokens
RAW_TAIL: dict[str, int] = {
    "filter-row-if-true": 0,
    "filter-row-if-false": 0,
    "filter-row-if-matched": 1,  # col + regex tail
    "filter-row-if-not-matched": 1,
    "filter-row": 0,
    "filter-row-on-condition": 0,
    "send-to-error": 0,
    "send-to-error-and-continue": 0,
    "fail": 0,
    "set-column": 1,
    "set": 1,
    "set-variable": 1,
    "increment-variable": 2,
    # date-format directives: the format is REST-OF-LINE in the v1
    # grammar (reference MigrateToV2 getNextToken(tokenizer, "\n", …)),
    # so an unquoted `MM/dd/yyyy HH:mm` stays one argument
    "parse-as-simple-date": 1,
    "parse-as-datetime": 1,
    "parse-as-date-format": 1,
    "format-date": 1,
    "format-datetime": 1,
    # httpd LogFormat strings contain spaces and quotes
    # (reference ParseLog.java usage: parse-as-log <col> <format…>)
    "parse-as-log": 1,
}

# v1 → v2 directive renames (reference parser/MigrateToV2.java:68-118)
ALIASES: dict[str, str] = {
    "set": "set-column",
    "filter-row-on-condition": "filter-row",
    "filter-rows-on": "filter-rows-on",  # handled by its own impl (subcommands)
    "format-unixtimestamp": "format-unix-timestamp",
    "delete-column": "drop",
    "drop-column": "drop",
    "rename-column": "rename",
}


def split_statements(recipe_text: str) -> list[tuple[int, str]]:
    """Split recipe text into (line_no, statement) pairs.

    Statements end at newline or ';' (outside quotes/braces). '//' and
    '#' start comments, except '#pragma'.
    """
    stmts: list[tuple[int, str]] = []
    for ln, raw_line in enumerate(recipe_text.splitlines(), start=1):
        line = raw_line.strip()
        if not line or line.startswith("//"):
            continue
        if line.startswith("#") and not line.startswith("#pragma"):
            continue
        # split on ';' outside quotes/braces
        parts: list[str] = []
        buf: list[str] = []
        depth = 0
        in_q: str | None = None
        k = 0
        while k < len(line):
            ch = line[k]
            if in_q:
                buf.append(ch)
                if ch == "\\" and k + 1 < len(line):
                    buf.append(line[k + 1])
                    k += 2
                    continue
                if ch == in_q:
                    in_q = None
            elif ch in "'\"":
                in_q = ch
                buf.append(ch)
            elif ch == "{":
                depth += 1
                buf.append(ch)
            elif ch == "}":
                depth -= 1
                buf.append(ch)
            elif ch == ";" and depth == 0:
                s = "".join(buf).strip()
                if s:
                    parts.append(s)
                buf = []
            elif (
                ch == "/" and depth == 0 and not in_q
                and k + 1 < len(line) and line[k + 1] == "/"
                and (k == 0 or line[k - 1].isspace())
            ):
                # trailing comment — only when '//' starts a word, so an
                # unquoted sed expression like s/Washington//g survives
                break
            else:
                buf.append(ch)
            k += 1
        s = "".join(buf).strip()
        if s:
            parts.append(s)
        stmts.extend((ln, p) for p in parts)
    return stmts


def parse_recipe(recipe: str | list[str]) -> list[DirectiveCall]:
    """Parse recipe text (string or list of directive strings)."""
    text = recipe if isinstance(recipe, str) else "\n".join(recipe)
    calls: list[DirectiveCall] = []
    pragmas: dict = {"load_directives": []}
    for ln, stmt in split_statements(text):
        if stmt.startswith("#pragma"):
            body = stmt[len("#pragma"):].strip()
            if body.startswith("load-directives"):
                names = body[len("load-directives"):].strip().rstrip(";")
                pragmas["load_directives"].extend(
                    n.strip() for n in names.split(",") if n.strip()
                )
            elif body.startswith("version"):
                pragmas["version"] = body[len("version"):].strip()
            continue
        if "${" in stmt:
            # CDAP macro placeholder (reference RecipeCompiler: macros —
            # incl. nested ${macro_${n}} — are skipped at compile time
            # and substituted by the platform before execution;
            # RecipeCompilerTest.testMacroSkippingDuringParsing). Parsing
            # succeeds; executing with macros still unresolved raises in
            # CompiledRecipe.apply.
            pragmas.setdefault("macros", []).append(stmt)
            continue
        m = re.match(r"^(!?[A-Za-z][A-Za-z0-9_\-]*)\s*(.*)$", stmt, re.DOTALL)
        if not m:
            raise DirectiveParseError("cannot parse directive", line=ln, source=stmt)
        name = m.group(1).lstrip("!").lower()
        tail = m.group(2)
        # v1 keyword forms (reference parser/MigrateToV2.java:68-83):
        # `set column <name> <expr>` → set-column, `set columns <a,b,…>`
        # → set-headers. Plain `set <col> <expr>` falls through to the
        # set-column alias below.
        if name == "set":
            head = tail.strip().split(None, 1)
            kw = head[0].lower() if head else ""
            if kw == "column":
                tail = head[1] if len(head) > 1 else ""
            elif kw == "columns":
                name = "set-headers"
                tail = head[1] if len(head) > 1 else ""
        # v1 `filter-rows-on <subcommand> …` → the v2 filter directives,
        # exactly the reference's MigrateToV2.java:230-258 rewrites
        if name == "filter-rows-on":
            head = tail.strip().split(None, 1)
            cmd = head[0].lower() if head else ""
            rest = head[1].strip() if len(head) > 1 else ""
            if cmd == "condition-false":
                name, tail = "filter-row", f"exp:{{{rest}}} false"
            elif cmd == "condition-true":
                name, tail = "filter-row", f"exp:{{{rest}}} true"
            elif cmd == "empty-or-null-columns":
                name, tail = "filter-empty-or-null", rest
            elif cmd in ("regex-match", "regex-not-match"):
                parts = rest.split(None, 1)
                if len(parts) != 2:
                    raise DirectiveParseError(
                        "filter-rows-on: expected <column> <regex>", line=ln, source=stmt
                    )
                colname, pat = parts[0].lstrip(":"), parts[1]
                mode = "if-matched" if cmd == "regex-match" else "if-not-matched"
                pat = pat.replace("\\", "\\\\").replace("'", "\\'")
                name, tail = "filter-by-regex", f"{mode} :{colname} '{pat}'"
            else:
                raise DirectiveParseError(
                    f"filter-rows-on: unknown option {cmd!r}", line=ln, source=stmt
                )
        name = ALIASES.get(name, name)
        toks = tokenize_segment(tail, RAW_TAIL.get(name))
        calls.append(DirectiveCall(name=name, toks=toks, line_no=ln, source=stmt, pragmas=pragmas))
    return calls
