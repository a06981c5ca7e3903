"""Seventh wave of reference JUnit mirrors: the parser/validator layer.

- MapArgumentsTest.java — typed argument mapping off the tokenizer:
  required/optional fields, mixed optional tails, and TEXT_LIST
  ('"A", "B"') arguments.
- ColumnNameValidatorTest.java / ReferenceNamesTest.java — name
  validators (identifier rules + Hive reserved words; dataset
  reference-name character set and cleansing).
- JsonConformerTest.java — leaf-flattening of nested validation
  failures into conformance-issue summaries (all five mocked trees).
- ValidateStandardTest.testValidation — validate-standard against the
  reference's own hl7-fhir-r4 schema resource (read as input data).
- FormatAsCurrencyTest.java — format round-trip (fmt == src) and the
  en_IE formatting path.
- SetTransientVariableTest.java — per-row variable semantics (the
  cross-row accumulation half is scoped out per SURVEY §4; the per-row
  projection is pinned here).
"""

import pytest

from wrangler_spark import execute
from wrangler_spark.directives._conformance import (
    ConformanceIssue,
    ValidationNode,
    convert_validation_error,
)
from wrangler_spark.recipe.parser import parse_recipe
from wrangler_spark.validators import (
    ValidatorError,
    cleanse_reference_name,
    validate_column_name,
    validate_reference_name,
)

# ------------------------------------------------------ MapArgumentsTest


def test_map_arguments_all_required():
    """testWithAllRequiredFields: rename :fname :lname → two COLUMN_NAME
    arguments present."""
    (call,) = parse_recipe("rename :fname :lname;")
    assert call.name == "rename"
    assert len(call.toks) == 2
    assert call.col(0) == "fname" and call.col(1) == "lname"


def test_map_arguments_optional_field():
    """testWithOptionalField: rename :fname → optional col2 absent."""
    (call,) = parse_recipe("rename :fname;")
    assert len(call.toks) == 1
    assert call.has(0) and not call.has(1)


def test_map_arguments_multiple_optional():
    """testMultipleArgumentsOptional: the four parse-as-csv shapes map
    to (col,text) / (col,text,bool) / (col,text,bool,expr) / (col,expr)."""
    (c1,) = parse_recipe("parse-as-csv :body ' ';")
    assert [t.kind for t in c1.toks] == ["COL", "TEXT"]

    (c2,) = parse_recipe("parse-as-csv :body ' ' true;")
    assert [t.kind for t in c2.toks] == ["COL", "TEXT", "BOOL"]
    assert c2.bool_(2) is True

    (c3,) = parse_recipe("parse-as-csv :body ' ' true exp: { type == '002' };")
    assert [t.kind for t in c3.toks] == ["COL", "TEXT", "BOOL", "EXPR"]
    assert c3.expr(3) == "type == '002'"

    (c4,) = parse_recipe("parse-as-csv :body exp: { type == '002' };")
    assert [t.kind for t in c4.toks] == ["COL", "EXPR"]


def test_map_arguments_text_list():
    """testTextLists: remove-sensitive-data :body "ALL_BASIC", "AGE" —
    the quoted, comma-joined strings map to ONE TEXT_LIST argument."""
    (call,) = parse_recipe('some-directive :body "ALL_BASIC", "AGE";')
    assert len(call.toks) == 2
    assert call.col(0) == "body"
    assert call.toks[1].kind == "TEXTLIST"
    assert call.texts(1) == ["ALL_BASIC", "AGE"]
    # a single quoted string reads as a one-element list
    (single,) = parse_recipe("some-directive :body 'ONLY';")
    assert single.texts(1) == ["ONLY"]


def test_text_list_does_not_swallow_delimiters():
    """A quoted comma delimiter ending a directive stays a TEXT: the
    list merge requires comma THEN another quoted string."""
    (call,) = parse_recipe("parse-as-csv :body ',' false;")
    assert [t.kind for t in call.toks] == ["COL", "TEXT", "BOOL"]
    assert call.text(1) == ","


# --------------------------------------------- ColumnNameValidatorTest


def test_good_column_names():
    for name in ["first_name", "id", "last_name", "emailid", "address", "adhara_number"]:
        validate_column_name(name)  # must not raise


def test_reserved_word_column():
    with pytest.raises(ValidatorError):
        validate_column_name("timestamp")


def test_non_alphanumeric_column():
    with pytest.raises(ValidatorError):
        validate_column_name("event.timestamp")


def test_long_column_name():
    with pytest.raises(ValidatorError):
        validate_column_name("e" + "a" * 600)


# ------------------------------------------------- ReferenceNamesTest


def test_reference_name_validation():
    for good in ["111-22-33.csv", "abc$2.txt", "1$-2.random"]:
        validate_reference_name(good)
    for bad in ["111-22-33(1).csv", "1*!.csv", "!@#$%^&"]:
        with pytest.raises(ValueError):
            validate_reference_name(bad)


def test_reference_name_cleanse():
    assert cleanse_reference_name("111-22-33.csv") == "111-22-33.csv"
    assert cleanse_reference_name("abc$2.txt") == "abc$2.txt"
    assert cleanse_reference_name("1$-2.random") == "1$-2.random"
    assert cleanse_reference_name("111-22-33(1).csv") == "111-22-331.csv"
    assert cleanse_reference_name("1*!.csv") == "1.csv"
    assert cleanse_reference_name("!@#$%^&") == "$"
    assert cleanse_reference_name("!@#%^&*()") == "sample"


# --------------------------------------------------- JsonConformerTest


def _ve(loc, msg, *causes):
    return ValidationNode(loc, loc, msg, list(causes))


def test_conformance_trivial_root():
    """single (trivial) root exception → the root reports itself."""
    got = convert_validation_error(_ve("#", "Oops"))
    assert got == [ConformanceIssue("#", "#", "Oops")]


def test_conformance_single_child():
    got = convert_validation_error(
        _ve("#", "Root oops", _ve("#/child", "Child oops"))
    )
    assert got == [ConformanceIssue("#/child", "#/child", "Child oops")]


def test_conformance_child_plus_trivial_root_cause():
    """a '#'-pointer cause is trivial and drops."""
    got = convert_validation_error(
        _ve("#", "Root oops", _ve("#/child", "Child oops"), _ve("#", "Root oops"))
    )
    assert got == [ConformanceIssue("#/child", "#/child", "Child oops")]


def test_conformance_multiple_children():
    got = convert_validation_error(
        _ve(
            "#",
            "Root oops",
            _ve("#/child", "Child oops"),
            _ve("#/kid", "Kid oops"),
            _ve("#/moo", "Moo oops"),
        )
    )
    assert got == [
        ConformanceIssue("#/child", "#/child", "Child oops"),
        ConformanceIssue("#/kid", "#/kid", "Kid oops"),
        ConformanceIssue("#/moo", "#/moo", "Moo oops"),
    ]


def test_conformance_nested_chains():
    got = convert_validation_error(
        _ve(
            "#",
            "Root oops",
            _ve(
                "#/a",
                "a oops",
                _ve("#/b", "b oops", _ve("#/c", "c oops"), _ve("#/d", "d oops")),
                _ve("#/e", "e oops", _ve("#/f", "f oops"), _ve("#/g", "g oops")),
            ),
            _ve("#/h", "h oops"),
        )
    )
    assert got == [
        ConformanceIssue("#/a -> #/b -> #/c", "#/c", "c oops"),
        ConformanceIssue("#/a -> #/b -> #/d", "#/d", "d oops"),
        ConformanceIssue("#/a -> #/e -> #/f", "#/f", "f oops"),
        ConformanceIssue("#/a -> #/e -> #/g", "#/g", "g oops"),
        ConformanceIssue("#/h", "#/h", "h oops"),
    ]


# ------------------------------------------------- ValidateStandardTest

FHIR_SCHEMA = (
    "/root/reference/wrangler-core/src/main/resources/schemas/hl7-fhir-r4.json"
)


def test_validate_standard_fhir(spark):
    """testValidation: validate-standard :col1 hl7-fhir-r4 — the row
    with active='meow' (string where boolean required) routes to error;
    the conforming Patient survives. The reference's own schema resource
    is the behavioral spec, read as input data."""
    with open(FHIR_SCHEMA, encoding="utf-8") as f:
        schema_json = f.read()
    bad = '{"resourceType": "Patient", "active": "meow"}'
    good = '{"resourceType": "Patient", "active": true, "gender": "female"}'
    df = spark.createDataFrame([(bad,), (good,)], "col1 string")
    ok, err = execute(
        spark,
        ["validate-standard :col1 hl7-fhir-r4"],
        df,
        lookups={"schema:hl7-fhir-r4": schema_json},
    )
    rows = ok.collect()
    assert len(rows) == 1
    assert rows[0]["col1"] == good
    errs = err.collect()
    assert len(errs) == 1
    assert "hl7-fhir-r4" in errs[0]["message"]


# ------------------------------------------------ FormatAsCurrencyTest


def test_format_as_currency_round_trip(spark):
    """testDefaultOption tail: format-as-currency over the parsed value
    reproduces the original source string for every surviving row."""
    vals = ["$1.56", "$45.56", "$6.78", "$0.09", "1234.56",
            "$8,976.78", "$58,976.78", "$1,234,678.67"]
    df = spark.createDataFrame([(v,) for v in vals], "src string")
    ok, err = execute(
        spark,
        [
            "parse-as-currency :src :dst",
            "format-as-currency :dst :fmt1 'en_US'",
        ],
        df,
    )
    rows = ok.collect()
    assert len(rows) == 7 and err.count() == 1
    for r in rows:
        assert r["fmt1"] == r["src"], (r["src"], r["fmt1"])


def test_format_as_currency_en_ie(spark):
    """testUSDToEUR: formatting doubles with en_IE errors no rows."""
    vals = [1.56, 45.56, 6.78, 0.09, 1234.56, 8976.78, 58976.78, 1234678.67]
    df = spark.createDataFrame([(v,) for v in vals], "src double")
    ok, err = execute(spark, ["format-as-currency :src :dst 'en_IE'"], df)
    assert ok.count() == 8
    assert err is None or err.count() == 0
    out = {r["dst"] for r in ok.collect()}
    assert any(s.startswith("€") for s in out)


# --------------------------------------------- SetTransientVariableTest


def test_set_variable_per_row_projection(spark):
    """SetTransientVariableTest pins 'set-variable test fwd == 0 ? A :
    test' leaving test=2 after both rows. In this engine a transient
    variable is a named per-row Column (the production pipeline resets
    the store per record, Wrangler.java:424-425; cross-row accumulation
    is interactive-workspace-only and scoped out, SURVEY §4): the fwd==0
    row binds test=A=2, the other keeps the (unset → null) prior value."""
    df = spark.createDataFrame([(0, 2), (1, 2)], "fwd int, A int")
    ok, _ = execute(
        spark,
        ["set-variable test fwd == 0 ? A : test", "set-column out test"],
        df,
    )
    got = {r["fwd"]: r["out"] for r in ok.collect()}
    assert got[0] == 2
    assert got[1] is None
