"""Recipe-level filter hoisting (recipe/compiler.py::_hoist_filters):
a pure filter bubbles leftwards across row-preserving 1→1 transforms
that provably cannot change its outcome, restoring column pruning that
Catalyst cannot recover (it does not exploit expression-level
null-intolerance for IsNull simplification)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from wrangler_spark import execute
from wrangler_spark.recipe.compiler import compile_recipe
from wrangler_spark.recipe.registry import RecipeContext

BENCH_SHAPE = [
    r"find-and-replace :content 's/ssn: \d+/MASKED/g'",
    "set-column :content_sha string:substring(content, 0, 8)",
    "hash :content_sha SHA-256",
    "filter-row exp:{content == null && op != 'delete'} true",
]


def _rows(df):
    return sorted(tuple("∅" if v is None else str(v) for v in r) for r in df.collect())


def test_hoist_moves_nulltest_filter_to_front():
    rec = compile_recipe(BENCH_SHAPE)
    assert rec.names[0] == "filter-row"
    # unhoisted compile keeps source order
    raw = compile_recipe(BENCH_SHAPE, hoist_filters=False)
    assert raw.names[-1] == "filter-row"


def test_hoist_preserves_semantics(spark):
    rows = [
        (1, "update", "ssn: 123 in text"),
        (2, "update", None),           # dropped: content null, op != delete
        (3, "delete", None),           # kept: op == delete
        (4, "insert", "plain"),
    ]
    df = spark.createDataFrame(rows, "seq long, op string, content string")
    ctx1, ctx2 = RecipeContext(spark=spark), RecipeContext(spark=spark)
    hoisted, _ = compile_recipe(BENCH_SHAPE).apply(df, ctx1)
    plain, _ = compile_recipe(BENCH_SHAPE, hoist_filters=False).apply(df, ctx2)
    assert _rows(hoisted) == _rows(plain)
    assert {r["seq"] for r in hoisted.collect()} == {1, 3, 4}


def test_hoisted_probe_predicate_reaches_scan(spark, tmp_path):
    """The CDC probe shape: after hoisting, the filter null-tests the
    RAW column (no regexp_replace in the probe path) and the predicate
    pushes into the parquet scan as PushedFilters — pre-hoist it is an
    opaque expression over a projection and pushes nothing."""
    rows = [(i, "update", f"r{i%3}", f"body {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "seq long, op string, repo string, content string")
    src = str(tmp_path / "ev")
    df.write.parquet(src)
    ev = spark.read.parquet(src)

    def probe_plan(hoist):
        ok, _ = compile_recipe(BENCH_SHAPE, hoist_filters=hoist).apply(
            ev, RecipeContext(spark=spark)
        )
        probe = ok.select("repo", "seq").groupBy("repo").agg(F.max("seq").alias("seq"))
        buf = io.StringIO()
        with redirect_stdout(buf):
            probe.explain("formatted")
        return buf.getvalue()

    hoisted = probe_plan(True)
    pushed = [l for l in hoisted.splitlines() if "PushedFilters" in l and "IsNotNull(content)" in l]
    assert pushed, hoisted
    # the hoisted probe evaluates NO regex anywhere in its plan (the
    # filter sees the raw column and the projection prunes the rest);
    # the plain plan runs regexp_replace just to null-test content
    assert hoisted.count("regexp_replace") == 0, hoisted
    assert probe_plan(False).count("regexp_replace") > 0


def test_value_test_blocks_hoist(spark):
    """A filter that VALUE-tests a transformed column must stay put —
    uppercase changes the value the filter sees."""
    recipe = [
        "uppercase :lang",
        "filter-row exp:{lang == 'EN'} false",  # keep rows where lang=='EN'
    ]
    rec = compile_recipe(recipe)
    assert rec.names == ["uppercase", "filter-row"]
    df = None  # order assertion is the point; semantics covered below
    import pyspark.sql  # noqa: F401


def test_set_column_blocks_nulltest_hoist(spark):
    """set-column can turn a null into a value (or vice versa) — a
    null-test on its written column must not cross it."""
    recipe = [
        "set-column :content op == 'fix' ? 'filled' : content",
        "filter-row exp:{content == null} true",
    ]
    rec = compile_recipe(recipe)
    assert rec.names == ["set-column", "filter-row"]
    rows = [(1, "fix", None), (2, "keep", None), (3, "keep", "x")]
    df = spark.createDataFrame(rows, "seq long, op string, content string")
    ok, _ = rec.apply(df, RecipeContext(spark=spark))
    # row 1's null was FILLED before the filter → survives; row 2 dropped
    assert {r["seq"] for r in ok.collect()} == {1, 3}


def test_error_router_blocks_hoist(spark):
    """Filters never cross send-to-error: rows must reach the error
    channel before the filter can drop them."""
    recipe = [
        "send-to-error exp:{n < 0}",
        "filter-row exp:{n == null} true",
    ]
    rec = compile_recipe(recipe)
    assert rec.names == ["send-to-error", "filter-row"]


def test_regex_filter_hoists_past_untouched_columns(spark):
    recipe = [
        "hash :content SHA-256",
        "filter-by-regex if-not-matched :lang 'en'",
    ]
    rec = compile_recipe(recipe)
    assert rec.names == ["filter-by-regex", "hash"]
    df = spark.createDataFrame([(1, "en", "a"), (2, "de", "b")],
                               "seq long, lang string, content string")
    ok, _ = rec.apply(df, RecipeContext(spark=spark))
    got = {r["seq"]: r["content"] for r in ok.collect()}
    assert set(got) == {1} and got[1] != "a"  # filtered then hashed


def test_bare_column_list_find_replace_blocks_hoist(spark):
    """find-and-replace accepts a BARE column list ('a,b'); the hoist
    analysis must see every written column, so a filter value-testing
    one of them stays put (a col(0)-based extraction would read the
    literal 'a,b' and wrongly hoist)."""
    recipe = [
        "find-and-replace a,b 's/foo/bar/g'",
        "filter-row exp:{a == 'bar'} true",
    ]
    rec = compile_recipe(recipe)
    assert rec.names == ["find-and-replace", "filter-row"]
    df = spark.createDataFrame([(1, "foo", "x"), (2, "bar", "y"), (3, "z", "foo")],
                               "seq long, a string, b string")
    ok, _ = rec.apply(df, RecipeContext(spark=spark))
    # rows 1 (foo→bar) and 2 (bar) are dropped AFTER the replace
    assert {r["seq"] for r in ok.collect()} == {3}


def test_unknown_and_udd_directives_block_hoist():
    """Any directive outside the curated crossable set — including
    user-defined directives loaded via #pragma — blocks hoisting: the
    compiler cannot prove their row/write behavior."""
    recipe = [
        "#pragma load-directives examples.udd_stars;",
        "star-rating :lang",
        "filter-row exp:{lang == null} true",
    ]
    rec = compile_recipe(recipe)
    assert rec.names == ["star-rating", "filter-row"]
