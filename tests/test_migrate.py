"""v1→v2 recipe migration (reference parser/MigrateToV2Test.java +
GrammarMigrator.java). The four JUnit pins are lenient-surface smoke
tests; the semantic pin here is stronger: migrating a v1 recipe and
executing BOTH texts yields identical DataFrames."""

from wrangler_spark import execute
from wrangler_spark.recipe.migrate import migrate_to_v2


def test_null_recipe():
    """MigrateToV2Test.testNullRecipe: no exception, empty output."""
    assert migrate_to_v2(None) == ""


def test_empty_recipe():
    """MigrateToV2Test.testEmptyRecipe."""
    assert migrate_to_v2("") == ""


def test_comment_only_recipe():
    """MigrateToV2Test.testCommentOnlyRecipe."""
    assert migrate_to_v2("// test") == ""


def test_v2_input_passes_through():
    """MigrateToV2Test.testOldDirectivesWithNewSyntax: already-v2 text
    migrates without error and stays executable."""
    out = migrate_to_v2("parse-as-csv :body '\t' true; drop :body;")
    assert out.splitlines() == ["parse-as-csv :body '\t' true;", "drop :body;"]


def test_v1_keyword_forms_rewrite():
    """GrammarMigrator: `set column` → set-column with an exp block,
    rest-of-line conditions become exp:{...}."""
    out = migrate_to_v2(
        "set column salary salary * 1.2\nfilter-row-if-true age > 50"
    )
    assert out.splitlines() == [
        "set-column salary exp:{salary * 1.2};",
        "filter-row-if-true exp:{age > 50};",
    ]


def test_migrated_recipe_is_semantically_identical(spark):
    """Round trip: v1 text and its migration produce the same rows."""
    v1 = (
        "set column doubled amount * 2\n"
        "filter-row-if-true amount > 90\n"
        "rename id ident"
    )
    df = spark.createDataFrame([(1, 50.0), (2, 95.0)], "id int, amount double")
    a, _ = execute(spark, v1, df)
    b, _ = execute(spark, migrate_to_v2(v1), df)
    assert a.columns == b.columns
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pragmas_survive():
    out = migrate_to_v2("#pragma version 2.0;\nkeep :a;")
    assert out.splitlines()[0] == "#pragma version 2.0;"
    assert out.splitlines()[1] == "keep :a;"


def test_cli_migrate(tmp_path, capsys):
    """`wrangler_spark.cli migrate --recipe f` prints the v2 text
    without needing a Spark session."""
    from wrangler_spark.cli import main

    f = tmp_path / "r.wr"
    f.write_text("set column doubled amount * 2\ndrop a,b")
    assert main(["migrate", "--recipe", str(f)]) == 0
    out = capsys.readouterr().out
    assert "set-column doubled exp:{amount * 2};" in out
