"""Recipe → DataFrame-transform compiler.

The reference interprets directives one row at a time
(executor/RecipePipelineExecutor.java:105-171). Here the whole recipe
compiles into a chain of lazy DataFrame transforms — Catalyst collapses
them into a single whole-stage-codegen'd narrow stage, giving for free
what the reference hand-rolls (SURVEY.md §4): filter fusion, expression
compile-once, column pruning, and pushdown into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from wrangler_spark.errors import UsageError
from wrangler_spark.recipe import registry
from wrangler_spark.recipe.parser import DirectiveCall, parse_recipe
from wrangler_spark.recipe.registry import RecipeContext, Transform

# import populates the registry
import wrangler_spark.directives  # noqa: F401  (registration side-effect)


@dataclass
class CompiledRecipe:
    calls: list[DirectiveCall]
    transforms: list[Transform]
    # CDAP `${macro}` placeholders found at parse time: compiling a
    # recipe with macros SUCCEEDS (reference RecipeCompiler skips them;
    # the platform substitutes before execution), but applying one with
    # macros still unresolved is an error, not a silent partial recipe.
    macros: list[str] = None  # type: ignore[assignment]

    def apply(
        self, df: DataFrame, ctx: RecipeContext | None = None
    ) -> tuple[DataFrame, DataFrame | None]:
        """Run the compiled recipe over a DataFrame.

        Returns (ok, errors) — errors is None when no directive routed
        rows to the error channel (mirrors TestingRig.executeWithErrors,
        reference TestingRig.java:102-118).
        """
        if self.macros:
            raise ValueError(
                f"recipe contains unresolved macros: {self.macros!r} — "
                "substitute them before executing (macros are a "
                "design-time placeholder; compilation tolerates them, "
                "execution cannot)"
            )
        ctx = ctx or RecipeContext(spark=df.sparkSession)
        ctx.spark = ctx.spark or df.sparkSession
        for i, (call, tr) in enumerate(zip(self.calls, self.transforms)):
            ctx.step = i
            ctx.current_name = call.name
            df = tr(df, ctx)
        return df, ctx.errors_df()

    @property
    def names(self) -> list[str]:
        return [c.name for c in self.calls]

    def lineage(self, df: DataFrame) -> list[dict]:
        """Column-level lineage: one record per directive with the
        input columns it read and the columns it added/dropped/kept —
        the reference's FieldOperation stream (wrangler-core
        utils/LineageOperations.java; LineageOperationsTest). Computed
        by stepping the compiled transforms over a ONE-ROW slice of the
        input — parsers infer their output columns from data, so a
        schema-only pass would miss them; the only jobs that run are
        the directives' own compile-time peeks, each over one row.

        Each record: {step, directive, inputs, added, dropped}.
        `inputs` are the pre-existing columns the directive referenced —
        named column arguments plus identifiers in any expression
        argument."""
        from wrangler_spark.expr.jexl import predicate_refs

        ctx = RecipeContext(spark=df.sparkSession)
        cur = df.limit(1)
        ops: list[dict] = []
        for i, (call, tr) in enumerate(zip(self.calls, self.transforms)):
            before = list(cur.columns)
            before_lower = {c.lower(): c for c in before}
            inputs: set[str] = set()
            for t in call.toks:
                if t.kind in ("COL", "IDENT") and str(t.value).lower() in before_lower:
                    inputs.add(before_lower[str(t.value).lower()])
                elif t.kind == "COLLIST":
                    for v in t.value:
                        if str(v).lower() in before_lower:
                            inputs.add(before_lower[str(v).lower()])
                elif t.kind == "EXPR":
                    try:
                        vrefs, nrefs = predicate_refs(str(t.value))
                    except Exception:
                        continue
                    for r in vrefs | nrefs:
                        if r in before_lower:
                            inputs.add(before_lower[r])
            ctx.step = i
            ctx.current_name = call.name
            cur = tr(cur, ctx)
            after = set(cur.columns)
            dropped = [c for c in before if c not in after]
            inputs.update(dropped)  # a dropped column was read by the op
            ops.append(
                {
                    "step": i,
                    "directive": call.name,
                    "inputs": sorted(inputs),
                    "added": [c for c in cur.columns if c not in set(before)],
                    "dropped": dropped,
                }
            )
        return ops

    def renames(self) -> dict[str, str]:
        """old→new column renames declared by the recipe (top-level
        `rename` directives, composed in order). The CDC layer maps
        these to lake-table schema renames — the Iceberg `ALTER TABLE
        RENAME COLUMN` equivalent — so data in pre-rename files stays
        readable under the new name (SURVEY.md §4 item 5)."""
        out: dict[str, str] = {}
        for c in self.calls:
            if c.name != "rename":
                continue
            old, new = c.col(0).lower(), c.col(1)
            # compose: if an earlier rename produced `old`, collapse
            src = next((k for k, v in out.items() if v.lower() == old), None)
            if src is not None:
                out[src] = new
            else:
                out[old] = new
        return out

    def drops(self) -> list[str]:
        """Columns the recipe unconditionally removes (top-level `drop`
        directives, minus anything later re-created by rename/copy/
        set-column). The CDC layer maps these to lake-table DROP COLUMN
        — the last leg of 'column directives mapped to Iceberg schema
        updates' (add/rename/widen/drop)."""
        dropped: set[str] = set()
        for c in self.calls:
            if c.name == "drop":
                for col in c.cols(0):
                    dropped.add(col.lower())
            elif c.name == "rename":
                dropped.discard(c.col(1).lower())
            elif c.name == "copy" and len(c.args) >= 2:
                dropped.discard(c.col(1).lower())
            elif c.name in ("set-column", "set column"):
                dropped.discard(c.col(0).lower())
        return sorted(dropped)


def compile_recipe(
    recipe: str | list[str],
    hoist_filters: bool = True,
    config: dict | None = None,
) -> CompiledRecipe:
    """config is the reference's DirectiveConfig JSON shape
    (parser/ConfigDirectiveContext.java; ConfigDirectiveContextTest):
    {"exclusions": [names...], "aliases": {alias: target}}. An excluded
    name — including an excluded alias — fails compilation; a non-
    excluded alias rewrites to its target before registry lookup."""
    calls = parse_recipe(recipe)
    if config:
        excl = {str(e).lower() for e in config.get("exclusions", [])}
        aliases = {
            str(k).lower(): str(v) for k, v in config.get("aliases", {}).items()
        }
        for c in calls:
            if c.name.lower() in excl:
                raise UsageError(
                    f"directive {c.name!r} is excluded by configuration "
                    f"(line {c.line_no}: {c.source!r})"
                )
            if c.name.lower() in aliases:
                c.name = aliases[c.name.lower()]
    if calls:
        _load_udds(calls[0].pragmas.get("load_directives", []))
    if hoist_filters:
        calls = _hoist_filters(calls)
    transforms = [registry.lookup(c.name)(c) for c in calls]
    if calls:
        macros = calls[0].pragmas.get("macros", [])
    else:
        # macros-only recipe: no calls carry the pragmas, rescan
        from wrangler_spark.recipe.parser import split_statements

        text = recipe if isinstance(recipe, str) else "\n".join(recipe)
        macros = [s for _, s in split_statements(text) if "${" in s]
    return CompiledRecipe(calls=calls, transforms=transforms, macros=macros)


# ------------------------------------------------------- filter hoisting

# Row-preserving 1→1 transforms a filter may bubble across, keyed by the
# written column(s) and whether the write PRESERVES NULLNESS of a
# pre-existing column (output null iff the stored input was null — true
# for in-place string transforms; false for casts, which can null out
# bad values under lenient semantics, and for newly created columns).
# Anything not listed blocks hoisting (row routers, exploders, renames,
# variable setters, parsers, unknown/user directives).

def _transform_info(call: DirectiveCall) -> tuple[set[str], bool] | None:
    """(written columns, null-preserving) if `call` is crossable by a
    filter; None → blocker."""
    n = call.name
    try:
        if n == "find-and-replace":
            # writes a LIST of columns (the bare `a,b` spelling included)
            return {c.lower() for c in call.cols(0)}, True
        if n in {
            "uppercase", "lowercase", "titlecase",
            "trim", "ltrim", "rtrim", "mask-number", "mask-shuffle", "hash",
        }:
            return {call.col(0).lower()}, True
        if n in {"set-column", "format-date", "format-datetime", "set-type"}:
            return {call.col(0).lower()}, False
        if n in {"copy", "cut-character"}:
            return {call.col(1).lower()}, False
        if n == "merge":
            return {call.col(2).lower()}, False
        if _filter_refs(call) is not None:
            return set(), True  # filters commute with each other
    except Exception:  # noqa: BLE001 — unparseable args → blocker
        return None
    return None


def _filter_refs(call: DirectiveCall) -> tuple[set[str], set[str]] | None:
    """(value_refs, nulltest_refs) if `call` is a hoistable pure filter;
    None otherwise."""
    try:
        if call.name in {"filter-row", "filter-row-if-true", "filter-row-if-false"}:
            from wrangler_spark.expr.jexl import predicate_refs

            return predicate_refs(call.expr(0))
        if call.name in {"filter-row-if-matched", "filter-row-if-not-matched"}:
            return {call.col(0).lower()}, set()
        if call.name == "filter-by-regex":
            return {call.col(1).lower()}, set()
    except Exception:  # noqa: BLE001
        return None
    return None


def _hoist_filters(calls: list[DirectiveCall]) -> list[DirectiveCall]:
    """Recipe-level filter pushdown: bubble each pure filter leftwards
    across transforms that provably cannot change its outcome.

    Catalyst cannot do this one: it would have to know that e.g.
    regexp_replace is null-intolerant to push `content == null` below
    the find-and-replace projection — expression-level null-intolerance
    is not exploited for IsNull simplification (verified on Spark 4.1),
    so a filter that only NULL-TESTS a transformed column forces the
    scan to read and transform the column's full bytes. The recipe
    compiler, owning directive semantics, hoists instead:

    a filter crosses a transform iff the transform is row-preserving
    1→1 AND writes no column the filter value-tests AND every written
    column the filter null-tests is written null-preservingly.

    Effect on the CDC probe (the bench recipe): the filter's null test
    evaluates against the RAW column instead of through the
    regexp_replace projection — no regex runs in the probe path — and
    the predicate reaches the scan (PushedFilters:
    Or(IsNotNull(content), EqualNullSafe(op,delete))), enabling
    row-group skipping from parquet null statistics. Measured 1.5-1.9×
    on the LWW probe agg at 4M events. (The content column itself stays
    in the probe's ReadSchema — its nullness is semantically needed.)
    Transforms also run on fewer rows post-hoist. Directive order is
    otherwise preserved; filters never cross error routers, exploders,
    parsers, renames or variable setters."""
    calls = list(calls)
    for i in range(1, len(calls)):
        refs = _filter_refs(calls[i])
        if refs is None:
            continue
        vrefs, nrefs = refs
        j = i
        while j > 0:
            info = _transform_info(calls[j - 1])
            if info is None:
                break
            writes, nullpres = info
            if writes & vrefs:
                break
            if (writes & nrefs) and not nullpres:
                break
            calls[j - 1], calls[j] = calls[j], calls[j - 1]
            j -= 1
    return calls


def _load_udds(names: list[str]) -> None:
    """User-defined directives (SURVEY.md §2.10): `#pragma load-directives
    my-module;` imports the Python module `my_module` (shipped via
    --py-files), whose import registers directives through the same
    @directive decorator as system ones — the UDD equivalent of the
    reference's artifact classloading (registry/UserDirectiveRegistry.java)."""
    import importlib

    for name in names:
        mod = name.replace("-", "_")
        try:
            importlib.import_module(mod)
        except ImportError:
            # the pragma may name individual directives provided by an
            # already-imported module — resolution happens at lookup()
            continue


def apply_precondition(
    df: DataFrame, precondition: str, language: str = "jexl"
) -> DataFrame:
    """Plugin-level precondition filter, applied BEFORE the recipe
    (reference Wrangler.java:414-421 + Precondition.java:64-89; SQL
    variant Wrangler.java:571-589).

    - language='jexl': rows where the condition evaluates TRUE are
      SKIPPED (the reference's semantics — the record bypasses the
      recipe entirely); null/false keeps the row.
    - language='sql': a Spark SQL boolean expression; rows where it is
      TRUE are KEPT (the reference's SQL pushdown keeps matching rows).

    Both compile to plain filters in the pushdown-friendly
    isnull-or-not form, so they reach the parquet scan."""
    from pyspark.sql import functions as F

    if language.lower() == "jexl":
        from pyspark.sql import types as T

        from wrangler_spark.expr.jexl import compile_expr

        raw = compile_expr(precondition, df.schema)
        # the reference rejects non-boolean preconditions
        # (Precondition.java:74-78); analysis-only type probe, no job
        probed = df.select(raw.alias("__pc")).schema[0].dataType
        if not isinstance(probed, (T.BooleanType, T.NullType)):
            raise ValueError(
                f"Precondition '{precondition}' does not result in true or false."
            )
        cond = raw.cast("boolean")
        return df.filter(F.isnull(cond) | ~cond)
    if language.lower() == "sql":
        cond = F.expr(precondition).cast("boolean")
        return df.filter(cond.isNotNull() & cond)
    raise ValueError(f"unknown precondition language {language!r} (jexl|sql)")


def conform_to_schema(df: DataFrame, schema) -> DataFrame:
    """Coerce a recipe's output to a TARGET schema — the reference's
    `RecipePipeline.execute(rows, schema)` / RecordConvertor surface
    (reference: wrangler-core/src/test/java/io/cdap/wrangler/utils/
    RecordConvertorTest.java):

    - columns select in schema order (case-insensitive match); a field
      with no matching column becomes NULL (valid only if nullable);
    - values cast leniently to the field type (int→long, string→double,
      float→double … the RecordConvertor conversion lattice);
    - a NULL (or failed cast) in a NON-nullable field raises at
      execution (the reference throws RecipeException) via a JVM-side
      guard expression — no extra validation job.
    """
    from pyspark.sql import functions as F

    by_l = {c.lower(): c for c in df.columns}
    cols = []
    for f in schema.fields:
        src = by_l.get(f.name.lower())
        c = F.col(src).cast(f.dataType) if src else F.lit(None).cast(f.dataType)
        if not f.nullable:
            if src is None:
                raise UsageError(
                    f"output schema: non-nullable field '{f.name}' has no "
                    "matching column in the recipe output"
                )
            c = F.when(
                c.isNull(),
                F.raise_error(
                    F.lit(
                        f"output schema: non-nullable field '{f.name}' "
                        "received NULL (or an uncastable value)"
                    )
                ).cast(f.dataType),
            ).otherwise(c)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def execute(
    spark, recipe: str | list[str], df: DataFrame,
    lookups: dict[str, DataFrame] | None = None,
    precondition: str | None = None,
    precondition_language: str = "jexl",
    config: dict | None = None,
    output_schema=None,
) -> tuple[DataFrame, DataFrame | None]:
    """One-shot helper mirroring the reference's TestingRig.execute.

    `precondition`: optional plugin-level row filter evaluated before
    the recipe (see apply_precondition); `config`: admin DirectiveConfig
    (exclusions/aliases), same shape compile_recipe takes;
    `output_schema`: optional target StructType the result is conformed
    to (see conform_to_schema — the reference's
    `RecipePipeline.execute(rows, schema)` second argument)."""
    ctx = RecipeContext(spark=spark, lookups=lookups or {})
    if precondition:
        df = apply_precondition(df, precondition, precondition_language)
    ok, err = compile_recipe(recipe, config=config).apply(df, ctx)
    if output_schema is not None:
        ok = conform_to_schema(ok, output_schema)
    return ok, err
