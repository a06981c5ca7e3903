"""Plugin-level precondition (reference Wrangler.java:414-421,
Precondition.java:64-89; test semantics mirror PreconditionTest.java)."""

import pytest
from pyspark.sql import functions as F

from wrangler_spark import apply_precondition, execute


@pytest.fixture()
def rows(spark):
    return spark.createDataFrame(
        [(1, "x", 2.06), (2, "y", 1.5), (1, "z", 3.0)], "a int, b string, c double"
    )


def test_jexl_skip_if_true(spark, rows):
    # PreconditionTest: 'a == 1 && b == "x"' is true for row 1 → skipped
    out = apply_precondition(rows, 'a == 1 && b == "x"')
    assert sorted(r["b"] for r in out.collect()) == ["y", "z"]


def test_jexl_constants(spark, rows):
    assert apply_precondition(rows, "true").count() == 0   # all skipped
    assert apply_precondition(rows, "false").count() == 3  # none skipped


def test_jexl_numeric_comparison(spark, rows):
    out = apply_precondition(rows, "c > 2.0")
    assert sorted(r["b"] for r in out.collect()) == ["y"]


def test_jexl_null_condition_keeps_row(spark):
    df = spark.createDataFrame([(None,), (5,)], "a int")
    # a > 3: null → condition null → not true → row KEPT; 5 → skipped
    out = apply_precondition(df, "a > 3").collect()
    assert len(out) == 1 and out[0]["a"] is None


def test_bad_condition_rejected(spark, rows):
    # PreconditionTest.testBadCondition: non-boolean result is an error
    with pytest.raises(ValueError, match="does not result in true or false"):
        apply_precondition(rows, "c")


def test_sql_keep_if_true(spark, rows):
    out = apply_precondition(rows, "a = 1 AND c >= 2.0", language="sql")
    assert sorted(r["b"] for r in out.collect()) == ["x", "z"]


def test_execute_with_precondition(spark, rows):
    ok, err = execute(
        spark, ["uppercase :b"], rows, precondition='b == "x"'
    )
    assert sorted(r["b"] for r in ok.collect()) == ["Y", "Z"]


def test_replayer_precondition(spark, tmp_path):
    from wrangler_spark.cdc.events import generate_events, repo_files_schema
    from wrangler_spark.cdc.replay import Replayer
    from wrangler_spark.lake.table import LakeTable

    ev = generate_events(spark, 1000, n_repos=5, n_paths_per_repo=10, epoch_size=500)
    table = LakeTable.create(
        spark, str(tmp_path / "pc"), repo_files_schema(), ["repo", "path"], num_buckets=8
    )
    # skip every event for repo 'repo-0' before the recipe runs
    rp = Replayer(
        table, str(tmp_path / "pc_ck"), precondition='repo == "org0/repo0"'
    )
    rp.replay(ev)
    repos = {r["repo"] for r in table.read().select("repo").distinct().collect()}
    all_repos = {r["repo"] for r in ev.select("repo").distinct().collect()}
    assert "org0/repo0" in all_repos and "org0/repo0" not in repos
    assert repos == all_repos - {"org0/repo0"}


def test_profile_stats(spark):
    from wrangler_spark.pipeline.profile import profile

    df = spark.createDataFrame(
        [(1, "a", ""), (2, None, "12"), (None, "a", "x")], "id int, s string, t string"
    )
    p = {r["column"]: r for r in profile(df, approx=False).collect()}
    assert p["id"]["total"] == 3 and p["id"]["nulls"] == 1 and p["id"]["distinct"] == 2
    assert p["id"]["min_value"] == "1" and p["id"]["max_value"] == "2"
    assert p["id"]["numeric_frac"] == 1.0
    assert p["s"]["nulls"] == 1 and p["s"]["distinct"] == 1 and p["s"]["empty"] == 0
    assert p["t"]["empty"] == 1
    assert p["t"]["numeric_frac"] == pytest.approx(1 / 3)


def test_profile_native_order_minmax(spark):
    from wrangler_spark.pipeline.profile import profile

    df = spark.createDataFrame([(9,), (10,), (100,)], "n int")
    p = profile(df, approx=False).collect()[0]
    # numeric order, not lexicographic ("9" > "100")
    assert p["min_value"] == "9" and p["max_value"] == "100"
