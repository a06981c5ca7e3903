"""Second wave of reference JUnit example mirrors (VERDICT r3 "what's
missing" #3: test-parity breadth). Each test cites the reference test
class it re-expresses; inputs and expected values are the JUnit
sources' literals (behavioral spec, not code).

Covered here:
- column/ChangeColCaseNamesTest.java (lower-casing column names)
- column/KeepTest.java (parse-as-csv then keep two)
- transformation/CharacterCutTest.java (all 7 range forms + '2-')
- transformation/FindAndReplaceTest.java (sed s/"//g over CSV lines)
- transformation/UpperTest / LowerTest / TitleCaseTest.java
- transformation/SplitEmailTest.java (exotic account forms, bad emails)
- transformation/SplitURLTest.java (port extraction)
- row/SplitToRowsTest.java (newline split, no-match, doc example)
- row/FailTest.java (fail condition true -> error, false -> pass)
"""

import pytest

from wrangler_spark import execute
from wrangler_spark.errors import RecipeError


def _rows(spark, directive, vals, schema="body string"):
    df = spark.createDataFrame([(v,) for v in vals], schema)
    ok, _ = execute(
        spark, [directive] if isinstance(directive, str) else directive, df
    )
    return ok


# ------------------------------------------- ChangeColCaseNamesTest


def test_change_column_case_lower(spark):
    """ChangeColCaseNamesTest.testColumnCaseChanges: lower renames
    every column, values untouched."""
    df = spark.createDataFrame(
        [("1", "2", "3", "4")], "Url string, Fname string, LName string, ADDRESS string"
    )
    ok, _ = execute(spark, ["change-column-case lower"], df)
    assert ok.columns == ["url", "fname", "lname", "address"]
    assert ok.collect()[0]["url"] == "1"


def test_change_column_case_preserves_types(spark):
    """ChangeColCaseNamesTest.testGetOutputSchemaForCaseChangedCols:
    the rename is schema-only — int/string/decimal dtypes survive."""
    df = spark.createDataFrame(
        [(1, "random", 143235.016)],
        "ALL_CAPS int, MiXeD_CAse string, all_lower double",
    )
    ok, _ = execute(spark, ["change-column-case lower"], df)
    assert ok.columns == ["all_caps", "mixed_case", "all_lower"]
    assert dict(ok.dtypes) == {
        "all_caps": "int", "mixed_case": "string", "all_lower": "double"
    }


# ----------------------------------------------------------- KeepTest


def test_keep_after_csv_parse(spark):
    """KeepTest.testKeep: parse-as-csv then keep body_1,body_2 leaves
    exactly two columns."""
    out = _rows(
        spark, ["parse-as-csv :body ','", "keep :body_1,:body_2"],
        ["1,2,3,4,5,6,7,8,9,10"],
    )
    row = out.collect()[0]
    assert len(out.columns) == 2
    assert (row["body_1"], row["body_2"]) == ("1", "2")


# -------------------------------------------------- CharacterCutTest


def test_cut_character_all_range_forms(spark):
    """CharacterCutTest.testBasicCharacterCut: 1-3, 5-7, 9-13, 15-,
    1,2,3, -3, and the mixed 1,2,3-5 forms over the same sentence."""
    out = _rows(
        spark,
        [
            "cut-character body one 1-3",
            "cut-character body two 5-7",
            "cut-character body three 9-13",
            "cut-character body four 15-",
            "cut-character body five 1,2,3",
            "cut-character body six -3",
            "cut-character body seven 1,2,3-5",
        ],
        ["one two three four five six seven eight"],
    )
    row = out.collect()[0]
    assert len(out.columns) == 8
    assert row["one"] == "one"
    assert row["two"] == "two"
    assert row["three"] == "three"
    assert row["four"] == "four five six seven eight"
    assert row["five"] == "one"
    assert row["six"] == "one"
    assert row["seven"] == "one t"


def test_cut_character_dollar_string(spark):
    """CharacterCutTest.testDollarIncludedInString: 2- strips the $."""
    out = _rows(spark, "cut-character body value 2-", ["$734.77"])
    assert out.collect()[0]["value"] == "734.77"


# ------------------------------------------------ FindAndReplaceTest


def test_find_and_replace_sed_strip_quotes(spark):
    """FindAndReplaceTest.testSedGrep: s/\"//g over the CFPB complaint
    CSV lines removes every double quote and nothing else."""
    line1 = (
        "07/29/2013,Debt collection,\"Other (i.e. phone, health club, etc.)\","
        "Cont'd attempts collect debt not owed,Debt is not mine,,,"
        "\"NRA Group, LLC\",VA,20147,,N/A,Web,08/07/2013,"
        "Closed with non-monetary relief,Yes,No,467801"
    )
    line2 = (
        "07/29/2013,Mortgage,Conventional fixed mortgage,"
        "\"Loan servicing, payments, escrow account\",,,,"
        "Franklin Credit Management,CT,06106,,N/A,Web,07/30/2013,"
        "Closed with explanation,Yes,No,475823"
    )
    out = _rows(spark, 'find-and-replace body s/"//g', [line1, line2])
    got = [r["body"] for r in out.collect()]
    assert got[0] == (
        "07/29/2013,Debt collection,Other (i.e. phone, health club, etc.),"
        "Cont'd attempts collect debt not owed,Debt is not mine,,,"
        "NRA Group, LLC,VA,20147,,N/A,Web,08/07/2013,"
        "Closed with non-monetary relief,Yes,No,467801"
    )
    assert '"' not in got[1]


# -------------------------------------- UpperTest / LowerTest / TitleCaseTest


@pytest.mark.parametrize(
    "directive,inputs,expected",
    [
        ("uppercase body", ["TITLE", "tiTLE", "title", "TitlE"], ["TITLE"] * 4),
        (
            "uppercase body",
            ["TITLE is TITLE", "tiTLE IS tItle", "title is title", "TitlE Is TiTLE"],
            ["TITLE IS TITLE"] * 4,
        ),
        ("lowercase body", ["TITLE", "tiTLE", "title", "TitlE"], ["title"] * 4),
        (
            "lowercase body",
            ["TITLE is TITLE", "tiTLE IS tItle", "title is title", "TitlE Is TiTLE"],
            ["title is title"] * 4,
        ),
        ("titlecase body", ["TITLE", "tiTLE", "title", "TitlE"], ["Title"] * 4),
        (
            "titlecase body",
            ["TITLE is TITLE", "tiTLE IS tItle", "title is title", "TitlE Is TiTLE"],
            ["Title Is Title"] * 4,
        ),
    ],
)
def test_case_transforms(spark, directive, inputs, expected):
    """UpperTest / LowerTest / TitleCaseTest: single words and
    sentences, every input casing variant."""
    out = _rows(spark, directive, inputs)
    assert sorted(r["body"] for r in out.collect()) == sorted(expected)


# ------------------------------------------------------ SplitEmailTest


def test_split_email_exotic_accounts(spark):
    """SplitEmailTest.testSplitEmail: dotted/underscored accounts,
    quoted-@ accounts, display-name <addr> forms; an unclosed <addr is
    still parsed from the LAST @ (the reference uses lastIndexOf('@')
    and only null-checks emails with no @ at all)."""
    cases = {
        "root@cask.co": ("root", "cask.co"),
        "joltie.xxx@gmail.com": ("joltie.xxx", "gmail.com"),
        "joltie_xxx@hotmail.com": ("joltie_xxx", "hotmail.com"),
        'joltie."@."root."@".@yahoo.com': ('joltie."@."root."@".', "yahoo.com"),
        "Joltie, Root <joltie.root@hotmail.com>": ("joltie.root", "hotmail.com"),
        "Joltie,Root<joltie.root@hotmail.com>": ("joltie.root", "hotmail.com"),
    }
    out = _rows(spark, "split-email email", list(cases), "email string")
    got = {r["email"]: (r["email_account"], r["email_domain"]) for r in out.collect()}
    for email, want in cases.items():
        assert got[email] == want, email


def test_split_email_bad_ids(spark):
    """SplitEmailTest.testBadEmailId: a double-@ email still splits on
    the last @; no-@ / empty / null yield null account and domain."""
    out = _rows(
        spark, "split-email email",
        ["root@hotmail@com", "root.hotmail.com", "", None],
        "email string",
    )
    got = {r["email"]: (r["email_account"], r["email_domain"]) for r in out.collect()}
    assert got["root@hotmail@com"][0] is not None
    assert got["root@hotmail@com"][1] is not None
    assert got["root.hotmail.com"] == (None, None)
    assert got[""] == (None, None)


# -------------------------------------------------------- SplitURLTest


def test_split_url_port(spark):
    """SplitURLTest.testBasicURLWorking: explicit port surfaces as an
    integer url_port, host without the port."""
    out = _rows(
        spark, "split-url url",
        ["http://example.com:80/docs/books/tutorial/index.html?name=networking#DOWNLOADING"],
        "url string",
    )
    row = out.collect()[0]
    assert row["url_host"] == "example.com"
    assert int(row["url_port"]) == 80


# ------------------------------------------------------ SplitToRowsTest


def test_split_to_rows_newline(spark):
    """SplitToRowsTest.testSplitToRows: regex \\n splits into 2 rows."""
    out = _rows(spark, r"split-to-rows body \n", ["AABBCDE\nEEFFFF"])
    assert sorted(r["body"] for r in out.collect()) == ["AABBCDE", "EEFFFF"]


def test_split_to_rows_no_match(spark):
    """SplitToRowsTest.testSplitWhenNoPatternMatch: no separator hit
    keeps the single row intact."""
    out = _rows(spark, "split-to-rows body X", ["AABBCDE\nEEFFFF"])
    assert [r["body"] for r in out.collect()] == ["AABBCDE\nEEFFFF"]


def test_split_to_rows_doc_example(spark):
    """SplitToRowsTest.testDocExample: '\\|' separator explodes the
    codes column while the id column replicates."""
    df = spark.createDataFrame([("1", "USD|AUD|AMD|XCD")], "id string, codes string")
    ok, _ = execute(spark, [r"split-to-rows codes \|"], df)
    rows = sorted((r["id"], r["codes"]) for r in ok.collect())
    assert rows == [("1", "AMD"), ("1", "AUD"), ("1", "USD"), ("1", "XCD")]


# -------------------------------------------------------------- FailTest


def test_fail_condition_true_raises(spark):
    """FailTest.testFailEvaluationToTrue: fail count > 0 with count=1
    aborts the recipe."""
    df = spark.createDataFrame([(1,)], "count int")
    with pytest.raises(Exception) as ei:
        ok, _ = execute(spark, ["fail count > 0"], df)
        ok.collect()  # fail is data-dependent: surfaces on action
    assert "fail" in str(ei.value).lower() or isinstance(ei.value, RecipeError)


def test_fail_condition_false_passes(spark):
    """FailTest.testFailEvaluationToFalse: fail count > 10 with
    count=1 is a no-op."""
    df = spark.createDataFrame([(1,)], "count int")
    ok, _ = execute(spark, ["fail count > 10"], df)
    assert ok.count() == 1
