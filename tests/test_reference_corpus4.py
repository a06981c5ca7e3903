"""Fourth wave of reference JUnit example mirrors: the EL function
surfaces JsonFunctionsTest.java and DDLTest.java — indefinite JsonPath
selection and record-path navigation."""

from wrangler_spark import execute

JSON_SELECTION_EG1 = (
    '{"list":['
    '{"set":[{"a1":"b1"},{"x1":"y1"}],"map":"X1","collection":"Y1"},'
    '{"set":[{"a2":"b2"},{"x2":"y2"}],"map":"X2","collection":"Y2"},'
    '{"set":[{"a3":"b3"},{"x3":"y3"}],"map":"X3","collection":"Y3"}]}'
)


def test_json_select_indefinite_wildcard(spark):
    """JsonFunctionsTest.testJsonSelect: '$.list[*].set.*' flattens to
    the six inner one-key objects, in document order."""
    df = spark.createDataFrame([(JSON_SELECTION_EG1,)], "body string")
    ok, _ = execute(
        spark,
        [
            "set-column mayo json:Parse(body)",
            "drop body",
            "set-column entries json:Select(mayo, '$.list[*].set.*')",
        ],
        df,
    )
    row = ok.collect()[0]
    import json

    assert json.loads(row["entries"]) == [
        {"a1": "b1"}, {"x1": "y1"}, {"a2": "b2"},
        {"x2": "y2"}, {"a3": "b3"}, {"x3": "y3"},
    ]
    # mayo survives as the parsed (key-normalized) document
    assert json.loads(row["mayo"])["list"][0]["map"] == "X1"


def test_json_select_recursive_descent(spark):
    """Jayway '$..map' recursive descent collects every 'map' value."""
    df = spark.createDataFrame([(JSON_SELECTION_EG1,)], "body string")
    ok, _ = execute(
        spark, ["set-column maps json:Select(body, '$..map')"], df
    )
    import json

    assert json.loads(ok.collect()[0]["maps"]) == ["X1", "X2", "X3"]


def test_json_isvalid_branches(spark):
    """JsonFunctionsTest.testBasicJson: IsValid drives an if/else —
    malformed json falls to the else literal."""
    df = spark.createDataFrame(
        [("{a:b,}", '{"a":"b"}')], "malformed string, basic string"
    )
    ok, _ = execute(
        spark,
        [
            "set-column baddata if(json:IsValid(malformed)) "
            "{ json:Parse(malformed) } else { 'Invalid Json'}",
            "set-column badjson json:IsValid(malformed)",
            "set-column goodjson json:IsValid(basic)",
        ],
        df,
    )
    row = ok.collect()[0]
    assert row["baddata"] == "Invalid Json"
    assert row["badjson"] is False
    assert row["goodjson"] is True


# -------------------------------------------------------------- DDLTest


def _nested(spark):
    return spark.sql(
        "SELECT named_struct("
        "'rec1', named_struct('s','str1','l',CAST(3 AS LONG),"
        "  'rec2', array(named_struct('x','strA','y',1),"
        "                named_struct('x','str2','y',2)),"
        "  'm', map('a',1,'b',2)),"
        "'a', array('a','b','c'),"
        "'z', true) AS rec"
    )


def test_ddl_select_paths(spark):
    """DDLTest.testGetRecursiveRecord: dotted paths, array indexes and
    map keys — rec1.s, rec1.l, a[0..2], rec1.rec2[1].x, rec1.m[a/b]."""
    ok, _ = execute(
        spark,
        [
            "set-column s1 ddl:select(rec, 'rec1.s')",
            "set-column l1 ddl:select(rec, 'rec1.l')",
            "set-column a0 ddl:select(rec, 'a[0]')",
            "set-column a1 ddl:select(rec, 'a[1]')",
            "set-column a2 ddl:select(rec, 'a[2]')",
            "set-column x2 ddl:select(rec, 'rec1.rec2[1].x')",
            "set-column ma ddl:select(rec, 'rec1.m[a]')",
            "set-column mb ddl:select(rec, 'rec1.m[b]')",
            "set-column z ddl:select(rec, 'z')",
        ],
        _nested(spark),
    )
    row = ok.collect()[0]
    assert row["s1"] == "str1" and row["l1"] == 3
    assert (row["a0"], row["a1"], row["a2"]) == ("a", "b", "c")
    assert row["x2"] == "str2"
    assert row["ma"] == 1 and row["mb"] == 2
    assert row["z"] is True
