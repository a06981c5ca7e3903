"""Directive registry: name → compile function.

The reference discovers ~85 system directives by classpath scan
(wrangler-core registry/SystemDirectiveRegistry.java:85) and binds
args via UsageDefinition/MapArguments. Here a directive is a plain
Python function ``compile_fn(call: DirectiveCall) -> Transform`` where
``Transform(df, ctx) -> DataFrame`` builds a *lazy* DataFrame — schema
propagation falls out of chaining lazy transforms. User-defined
directives (the UDD surface, SURVEY.md §2.10) register through the
same decorator.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wrangler_spark.errors import DirectiveNotFoundError


@dataclass
class RecipeContext:
    """Per-execution state: error channel + lookup datasets."""

    spark: SparkSession | None = None
    errors: list[DataFrame] = field(default_factory=list)
    lookups: dict[str, DataFrame] = field(default_factory=dict)
    # transient variables (reference aggregates/DefaultTransientStore):
    # name → compiled TypedCol, usable in later expressions of the recipe
    variables: dict = field(default_factory=dict)
    step: int = 0
    current_name: str = ""

    def route_error(self, df: DataFrame, cond, message: str) -> DataFrame:
        """Fork rows matching ``cond`` to the error channel; return the rest.

        Error rows are serialized to a uniform (step, directive, message,
        record-json) schema so heterogenous mid-pipeline schemas union
        cleanly — the DAG-fork equivalent of the reference's error
        collector (row/SendToError.java, RecipePipelineExecutor.java:145-158).
        """
        msg = F.lit(message) if isinstance(message, str) else message.cast("string")
        err = df.filter(cond).select(
            F.lit(self.step).alias("step"),
            F.lit(self.current_name).alias("directive"),
            msg.alias("message"),
            F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("record"),
        )
        self.errors.append(err)
        # null condition values do NOT route to error (JEXL null is falsy).
        # isnull|~cond instead of ~coalesce(cond,false): equivalent, but
        # NullPropagation simplifies this form so the filter still pushes
        # into the parquet scan (same fix as filter-row; a ~coalesce
        # around the condition blocks pushdown).
        return df.filter(F.isnull(cond) | ~cond)

    def errors_df(self) -> DataFrame | None:
        if not self.errors:
            return None
        out = self.errors[0]
        for e in self.errors[1:]:
            out = out.unionByName(e)
        return out


Transform = Callable[[DataFrame, RecipeContext], DataFrame]
CompileFn = Callable[..., Transform]  # (DirectiveCall) -> Transform

DIRECTIVES: dict[str, CompileFn] = {}


def directive(*names: str):
    """Register a directive compile function under one or more names."""

    def deco(fn: CompileFn) -> CompileFn:
        for n in names:
            DIRECTIVES[n.lower()] = fn
        return fn

    return deco


def lookup(name: str) -> CompileFn:
    fn = DIRECTIVES.get(name.lower())
    if fn is None:
        raise DirectiveNotFoundError(
            f"unknown directive {name!r} — known: {', '.join(sorted(DIRECTIVES))}"
        )
    return fn


def all_directives() -> list[str]:
    return sorted(DIRECTIVES)
