"""wrangler_spark — a PySpark-native data-wrangling + CDC ingest engine.

A brand-new engine with the capability surface of CDAP Wrangler
(reference: /root/reference, studied in SURVEY.md), re-expressed
Spark-first: recipes in the Wrangler directive DSL are compiled into
lazy DataFrame/Column transforms (whole-stage-codegen friendly; pandas
UDFs only where Catalyst has no equivalent), and a binlog-style change
event replayer applies insert/update/delete events onto a snapshot
versioned lake table keyed by (repo, path) with last-writer-wins
MERGE semantics, epoch-fenced exactly-once commits and schema
evolution.

Public API:
    from wrangler_spark import execute, compile_recipe
    ok, err = execute(spark, ["uppercase :name", "filter-row exp:{age > 10}"], df)
"""

from wrangler_spark.recipe.compiler import (
    CompiledRecipe,
    apply_precondition,
    compile_recipe,
    execute,
)

__all__ = ["CompiledRecipe", "apply_precondition", "compile_recipe", "execute"]
__version__ = "0.1.0"
