"""v1 → v2 recipe migration (reference parser/MigrateToV2.java,
GrammarMigrator.java).

The reference migrator rewrites ~80 v1 directive forms into the v2
grammar (`:col` column refs, quoted text, `exp:{...}` expression
blocks) with a per-directive rewrite table. This engine's parser
already NORMALIZES both grammars into one token stream
(recipe/parser.py — v1 keyword forms, bare column names, rest-of-line
expressions), so migration is a re-emission of that normalized stream
in canonical v2 spelling: parse once, print each token in v2 form.
MigrateToV2Test pins the lenient surface (null / empty / comment-only
recipes migrate without error; v2 input passes through).
"""

from __future__ import annotations

from wrangler_spark.recipe.parser import DirectiveCall, Tok, parse_recipe


def _emit_tok(t: Tok) -> str:
    if t.kind == "COL":
        return f":{t.value}"
    if t.kind == "COLLIST":
        return ",".join(f":{n}" for n in t.value)
    if t.kind == "TEXT":
        body = str(t.value).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{body}'"
    if t.kind == "EXPR":
        raw = t.raw.strip()
        if raw.startswith(("exp", "condition")):
            return raw  # already a v2 block
        return "exp:{" + str(t.value) + "}"
    if t.kind == "PROP":
        return t.raw.strip()
    # NUM / NUMLIST / BOOL / IDENT spell themselves
    return t.raw


def emit_v2(call: DirectiveCall) -> str:
    """One directive call in canonical v2 text."""
    parts = [call.name] + [_emit_tok(t) for t in call.toks]
    return " ".join(parts) + ";"


def migrate_to_v2(recipe: str | list[str] | None) -> str:
    """Rewrite a recipe (v1, v2, or mixed) as canonical v2 text.

    Null / empty / comment-only input yields "" (MigrateToV2Test).
    Pragmas and unresolved `${macro}` statements pass through verbatim
    (the platform substitutes macros before execution)."""
    if recipe is None:
        return ""
    text = recipe if isinstance(recipe, str) else "\n".join(recipe)
    if not text.strip():
        return ""
    calls = parse_recipe(text)
    lines: list[str] = []
    pragmas = calls[0].pragmas if calls else {}
    # re-emit pragmas first (parse_recipe hoists them out of the stream)
    if not calls:
        # comment-only / pragma-only / macro-only recipes: recover the
        # pragma dict by parsing with a sentinel directive appended
        probe = parse_recipe(text + "\nkeep :__probe__;")
        pragmas = probe[0].pragmas if probe else {}
    for name in pragmas.get("load_directives", []) or []:
        lines.append(f"#pragma load-directives {name};")
    if pragmas.get("version"):
        lines.append(f"#pragma version {pragmas['version']};")
    lines.extend(pragmas.get("macros", []) or [])
    lines.extend(emit_v2(c) for c in calls)
    return "\n".join(lines)
