from wrangler_spark.recipe.parser import parse_recipe


def test_v2_tokens():
    calls = parse_recipe("parse-as-csv :body ',' true")
    c = calls[0]
    assert c.name == "parse-as-csv"
    assert c.col(0) == "body"
    assert c.text(1) == ","
    assert c.bool_(2) is True


def test_v1_bare_words():
    calls = parse_recipe("mask-number demo_18 xxx###")
    c = calls[0]
    assert c.col(0) == "demo_18"
    assert c.text(1) == "xxx###"


def test_expression_block():
    calls = parse_recipe("filter-row exp:{ age > 10 && name == 'joe' } true")
    c = calls[0]
    assert c.name == "filter-row"
    assert c.expr(0) == "age > 10 && name == 'joe'"
    assert c.bool_(1) is True


def test_raw_tail_condition():
    calls = parse_recipe('filter-row-if-true demo_9 =~ "CA"')
    c = calls[0]
    assert c.expr(0) == 'demo_9 =~ "CA"'


def test_set_column_tail():
    calls = parse_recipe("set-column :total price * qty + 1")
    c = calls[0]
    assert c.col(0) == "total"
    assert c.expr(1) == "price * qty + 1"


def test_column_list():
    calls = parse_recipe("drop :a,:b,:c")
    assert calls[0].cols(0) == ["a", "b", "c"]
    calls = parse_recipe("drop a,b,c")
    assert calls[0].cols(0) == ["a", "b", "c"]


def test_multi_statement_and_comments():
    text = """
    // a comment
    uppercase :name;
    lowercase :city
    #pragma load-directives my-udd;
    trim :name
    """
    calls = parse_recipe(text)
    assert [c.name for c in calls] == ["uppercase", "lowercase", "trim"]
    assert calls[0].pragmas["load_directives"] == ["my-udd"]


def test_v1_aliases():
    calls = parse_recipe("set :name lower(name)")
    assert calls[0].name == "set-column"


def test_quoted_semicolon():
    calls = parse_recipe("find-and-replace :body 's/;/,/g'")
    assert calls[0].text(1) == "s/;/,/g"


def test_numlist():
    calls = parse_recipe("parse-as-fixed-length :body 2,4,5")
    assert calls[0].nums(1) == [2, 4, 5]


# ------------------------------------------------- MigrateToV2Test
# parser/MigrateToV2Test.java: null/empty/comment-only recipes migrate
# without error; v2 syntax passes through the v1 migrator untouched.

def test_empty_and_comment_only_recipes():
    from wrangler_spark.recipe.parser import parse_recipe
    assert parse_recipe("") == []
    assert parse_recipe("// test") == []
    assert parse_recipe("\n  \n// a\n//b\n") == []


def test_old_directives_with_new_syntax():
    from wrangler_spark.recipe.parser import parse_recipe
    calls = parse_recipe("parse-as-csv :body '\t' true; drop :body;")
    assert [c.name for c in calls] == ["parse-as-csv", "drop"]
