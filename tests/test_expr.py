import pytest
from pyspark.sql import functions as F

from wrangler_spark.expr.jexl import compile_expr, parse_expr
from wrangler_spark.errors import ExpressionError


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.5, "CA"), (2, "bob", 20.0, "NY"), (3, None, None, "CA")],
        "id long, name string, amount double, state string",
    )


def run(df, src):
    return [r[0] for r in df.select(compile_expr(src, df.schema).alias("v")).collect()]


def test_arithmetic(df):
    assert run(df, "id * 2 + 1") == [3, 5, 7]


def test_comparison_and_logic(df):
    assert run(df, "id > 1 && state == 'CA'") == [False, False, True]


def test_string_concat_plus(df):
    assert run(df, "name + '!'") == ["alice!", "bob!", None]


def test_ternary(df):
    assert run(df, "id > 1 ? 'big' : 'small'") == ["small", "big", "big"]


def test_regex_match(df):
    assert run(df, "state =~ 'CA'") == [True, False, True]
    assert run(df, "state !~ 'CA'") == [False, True, False]


def test_missing_column_is_null(df):
    assert run(df, "nosuchcol") == [None, None, None]


def test_case_insensitive_columns(df):
    assert run(df, "NAME") == ["alice", "bob", None]


def test_functions_default_ns(df):
    assert run(df, "toInteger(amount)") == [10, 20, None]
    assert run(df, "concat(name, '-', state)") == ["alice-CA", "bob-NY", None]


def test_coalesce(df):
    assert run(df, "coalesce(name, 'missing')") == ["alice", "bob", "missing"]


def test_string_ns(df):
    assert run(df, "string:upperCase(name)") == ["ALICE", "BOB", None]
    assert run(df, "string:substring(name, 1, 3)") == ["li", "ob", None]
    assert run(df, "string:isEmpty(name)") == [False, False, True]


def test_math_ns(df):
    assert run(df, "math:ceil(amount)") == [11, 20, None]
    assert run(df, "math:pow(id, 2)") == [1.0, 4.0, 9.0]
    assert run(df, "math:max(id, 2)") == [2, 2, 3]


def test_dq_ns(df):
    assert run(df, "dq:isnull(name)") == [False, False, True]
    assert run(df, "dq:inrange(amount, 0, 15)") == [True, False, None]


def test_unknown_function_raises(df):
    with pytest.raises(ExpressionError):
        compile_expr("nosuch:fn(1)", df.schema)


def test_parse_error():
    with pytest.raises(ExpressionError):
        parse_expr("a +")


def test_null_literal(df):
    # JEXL equality is Java equals, not SQL three-valued logic: a null
    # cell == null is TRUE, a non-null cell == null is FALSE
    # (reference expression/EL.java evaluates with Java semantics)
    assert run(df, "name == null") == [False, False, True]
    assert run(df, "name != null") == [True, True, False]


def test_not(df):
    assert run(df, "!(id > 1)") == [True, False, False]


def test_modulo(df):
    assert run(df, "id % 2") == [1, 0, 1]
