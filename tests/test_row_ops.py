import pytest

from wrangler_spark import execute


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "alice", "CA", 100.0), (2, "bob", "NY", 5.0), (3, "", None, 50.0)],
        "id long, name string, state string, amount double",
    )


def test_filter_row_drops_matching(spark, df):
    ok, _ = execute(spark, ["filter-row exp:{amount > 50} true"], df)
    assert sorted(r["id"] for r in ok.collect()) == [2, 3]


def test_filter_row_if_true(spark, df):
    ok, _ = execute(spark, ['filter-row-if-true state =~ "CA"'], df)
    assert sorted(r["id"] for r in ok.collect()) == [2, 3]


def test_filter_row_if_false(spark, df):
    ok, _ = execute(spark, ["filter-row-if-false amount > 10"], df)
    assert sorted(r["id"] for r in ok.collect()) == [1, 3]


def test_filter_by_regex(spark, df):
    ok, _ = execute(spark, ["filter-by-regex if-matched :name 'b.*'"], df)
    assert sorted(r["id"] for r in ok.collect()) == [1, 3]


def test_filter_empty_or_null(spark, df):
    ok, _ = execute(spark, ["filter-rows-on empty-or-null-columns :name,:state"], df)
    assert sorted(r["id"] for r in ok.collect()) == [1, 2]


def test_send_to_error(spark, df):
    ok, err = execute(spark, ["send-to-error exp:{amount < 10}"], df)
    assert sorted(r["id"] for r in ok.collect()) == [1, 3]
    errs = err.collect()
    assert len(errs) == 1
    assert '"id":2' in errs[0]["record"]


def test_send_to_error_and_continue(spark, df):
    """Matched rows leave the main flow, same as send-to-error — the
    reference executor clears cumulativeRows on ReportErrorAndProceed
    (RecipePipelineExecutor.java:145-151), so the row lands ONLY in the
    error collector."""
    ok, err = execute(spark, ["send-to-error-and-continue exp:{amount < 10}"], df)
    assert ok.count() == 2
    assert err.count() == 1


def test_fail(spark, df):
    from py4j.protocol import Py4JJavaError

    ok, _ = execute(spark, ["fail exp:{amount > 99}"], df)
    with pytest.raises(Exception):
        ok.collect()


def test_fail_no_match_passes(spark, df):
    ok, _ = execute(spark, ["fail exp:{amount > 1000}"], df)
    assert ok.count() == 3


def test_split_to_rows(spark, one_col):
    df = one_col("a,b,c")
    ok, _ = execute(spark, ["split-to-rows :body ','"], df)
    assert [r["body"] for r in ok.collect()] == ["a", "b", "c"]


def test_flatten_zip_with_null_padding(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], [1, 2], "k")],
        "xs array<string>, ys array<int>, key string",
    )
    ok, _ = execute(spark, ["flatten :xs,:ys"], df)
    rows = ok.collect()
    assert [(r["xs"], r["ys"], r["key"]) for r in rows] == [
        ("a", 1, "k"),
        ("b", 2, "k"),
        ("c", None, "k"),
    ]
