"""Tenth reference JUnit mirror wave: directive configuration and the
registry surface.

- DirectiveConfigTest.java — the DirectiveConfig JSON spec: exclusions
  block compilation (full spec / exclusions-only), aliases rewrite to
  their targets (full spec / aliases-only), and the empty config is a
  no-op. Exactly the reference's four test specs.
- SystemDirectiveRegistryTest.testLoadingDefaults /
  UsageRegistryTest.testUsageRegistry — the system registry loads and
  lists every built-in directive.

The remaining reference test classes (ObjectSerDe, Messages i18n,
NoOpDirectiveContext, ArtifactSummaryComparator, SchemaRegistryClient,
HTTPSchemaLoader, RecordConvertor/StructuredToRow) are CDAP platform
plumbing with no data-plane semantics — their roles map to Spark's own
row/serialization machinery (SURVEY §2.1 scope note).
"""

import json

import pytest

from wrangler_spark import compile_recipe, execute
from wrangler_spark.errors import DirectiveNotFoundError, UsageError
from wrangler_spark.recipe.registry import all_directives, lookup

# DirectiveConfigTest.SPECIFICATION (java:34-46)
SPECIFICATION = json.loads(
    """{
    "exclusions": ["parse-as-csv", "parse-as-excel", "set", "invoke-http"],
    "aliases": {"json-parser": "parse-as-json", "js-parser": "parse-as-json"}
    }"""
)
ONLY_EXCLUSIONS = {"exclusions": ["parse-as-csv", "parse-as-excel", "set", "invoke-http"]}
ONLY_ALIASES = {"aliases": {"json-parser": "parse-as-json", "js-parser": "parse-as-json"}}
EMPTY: dict = {}


def test_config_full_specification(spark):
    """testParsingOfConfiguration: parse-as-csv excluded, parse-as-json
    not; json-parser aliases to parse-as-json and RUNS as it."""
    with pytest.raises(UsageError):
        compile_recipe(["parse-as-csv :body ','"], config=SPECIFICATION)
    # not excluded — compiles
    compile_recipe(["parse-as-json :body 1"], config=SPECIFICATION)
    # alias resolves and executes with the target's semantics
    df = spark.createDataFrame([('{"k": 7}',)], "body string")
    ok, _ = execute(spark, ["json-parser :body 1"], df, config=SPECIFICATION)
    assert ok.first()["body_k"] == 7


def test_config_only_exclusions():
    """testParsingOnlyExclusions: exclusions apply; with no aliases
    declared, json-parser is simply an unknown directive."""
    with pytest.raises(UsageError):
        compile_recipe(["parse-as-csv :body ','"], config=ONLY_EXCLUSIONS)
    compile_recipe(["parse-as-json :body 1"], config=ONLY_EXCLUSIONS)
    with pytest.raises(DirectiveNotFoundError):
        compile_recipe(["json-parser :body 1"], config=ONLY_EXCLUSIONS)


def test_config_only_aliases():
    """testParsingOnlyAliases: nothing excluded, aliases still apply."""
    compile_recipe(["parse-as-csv :body ','"], config=ONLY_ALIASES)
    rec = compile_recipe(["json-parser :body 1"], config=ONLY_ALIASES)
    assert rec.calls[0].name == "parse-as-json"


def test_config_empty():
    """testParsingEmpty: the empty config is a no-op."""
    compile_recipe(["parse-as-csv :body ','"], config=EMPTY)
    with pytest.raises(DirectiveNotFoundError):
        compile_recipe(["json-parser :body 1"], config=EMPTY)


def test_excluded_alias_blocked():
    """ConfigDirectiveContext: exclusion applies to the PRE-alias name;
    an alias whose own name is excluded fails even if its target is
    allowed."""
    cfg = {"exclusions": ["csv-parser"], "aliases": {"csv-parser": "parse-as-csv"}}
    with pytest.raises(UsageError):
        compile_recipe(["csv-parser :body ','"], config=cfg)


# ------------------------------------------- registry loading + usages


def test_system_registry_loads_defaults():
    """SystemDirectiveRegistryTest.testLoadingDefaults +
    UsageRegistryTest.testUsageRegistry: the registry lists every
    built-in and each entry resolves to a compile function."""
    names = all_directives()
    assert len(names) > 90  # 94 registered directives (NORTHRULE.md)
    for name in names:
        assert callable(lookup(name))


def test_registry_unknown_directive_raises():
    with pytest.raises(DirectiveNotFoundError):
        lookup("definitely-not-a-directive")
