import pytest

from wrangler_spark import execute


def test_case_ops(spark, one_col):
    df = one_col("hello world")
    ok, _ = execute(spark, ["uppercase :body"], df)
    assert ok.first()["body"] == "HELLO WORLD"
    ok, _ = execute(spark, ["titlecase :body"], df)
    assert ok.first()["body"] == "Hello World"


def test_trim_family(spark, one_col):
    df = one_col("  pad  ")
    for rec, want in [("trim", "pad"), ("ltrim", "pad  "), ("rtrim", "  pad")]:
        ok, _ = execute(spark, [f"{rec} :body"], df)
        assert ok.first()["body"] == want


def test_set_column_expression(spark):
    df = spark.createDataFrame([(2, 3)], "a long, b long")
    ok, _ = execute(spark, ["set-column :c a * b + 1"], df)
    assert ok.first()["c"] == 7


def test_mask_number_ssn(spark, one_col):
    # reference MaskNumberTest.testSSNWithDashesExact (MaskNumberTest.java:33-46)
    df = one_col("000-00-1234")
    ok, _ = execute(spark, ["mask-number :body xxx-xx-####"], df)
    assert ok.first()["body"] == "xxx-xx-1234"


def test_mask_number_extra_pattern(spark, one_col):
    df = one_col("12345")
    ok, _ = execute(spark, ["mask-number :body xxx##"], df)
    assert ok.first()["body"] == "xxx45"


def test_mask_shuffle_deterministic(spark, one_col):
    df = one_col("abc 123")
    ok1, _ = execute(spark, ["mask-shuffle :body"], df)
    ok2, _ = execute(spark, ["mask-shuffle :body"], df)
    v1, v2 = ok1.first()["body"], ok2.first()["body"]
    assert v1 == v2  # java.util.Random(0) determinism
    assert v1 != "abc 123"
    assert len(v1) == len("abc 123")
    assert v1[3] == " "


def test_find_and_replace(spark, one_col):
    df = one_col("hack hack hack")
    ok, _ = execute(spark, ["find-and-replace :body 's/hack/hat/g'"], df)
    assert ok.first()["body"] == "hat hat hat"


def test_extract_regex_groups(spark, one_col):
    # reference naming: <col>_<match>_<group> (ExtractRegexGroups.java:86)
    df = one_col("2024-05-17")
    ok, _ = execute(spark, [r"extract-regex-groups :body '(\d+)-(\d+)-(\d+)'"], df)
    r = ok.first()
    assert (r["body_1_1"], r["body_1_2"], r["body_1_3"]) == ("2024", "05", "17")


def test_split_email(spark, one_col):
    df = one_col("joe@example.com", "bad-email")
    ok, _ = execute(spark, ["split-email :body"], df)
    rows = {r["body"]: r for r in ok.collect()}
    assert rows["joe@example.com"]["body_account"] == "joe"
    assert rows["joe@example.com"]["body_domain"] == "example.com"
    assert rows["bad-email"]["body_account"] is None


def test_split_url(spark, one_col):
    df = one_col("https://example.com:8080/a/b.html?x=1")
    ok, _ = execute(spark, ["split-url :body"], df)
    r = ok.first()
    assert r["body_protocol"] == "https"
    assert r["body_host"] == "example.com"
    assert r["body_port"] == 8080
    assert r["body_path"] == "/a/b.html"
    assert r["body_query"] == "x=1"


def test_cut_character(spark, one_col):
    df = one_col("abcdefghij")
    ok, _ = execute(spark, ["cut-character :body :out '1-3,7'"], df)
    assert ok.first()["out"] == "abcg"


def test_encode_decode_base64(spark, one_col):
    df = one_col("hello")
    ok, _ = execute(spark, ["encode base64 :body"], df)
    assert ok.first()["body_encode_base64"] == "aGVsbG8="
    ok2, _ = execute(spark, ["decode base64 :body_encode_base64"], ok)
    assert ok2.first()["body_encode_base64_decode_base64"] == "hello"


def test_hash_sha256(spark, one_col):
    import hashlib

    df = one_col("content-x")
    ok, _ = execute(spark, ["hash :body SHA-256"], df)
    assert ok.first()["body"] == hashlib.sha256(b"content-x").hexdigest()


def test_fill_null_or_empty(spark):
    df = spark.createDataFrame([("a",), (None,), ("",)], "body string")
    ok, _ = execute(spark, ["fill-null-or-empty :body 'N/A'"], df)
    assert sorted(r["body"] for r in ok.collect()) == ["N/A", "N/A", "a"]


def test_generate_uuid_deterministic(spark, one_col):
    df = one_col("x")
    ok, _ = execute(spark, ["generate-uuid :uid"], df)
    v = ok.first()["uid"]
    assert len(v) == 36 and v.count("-") == 4
    ok2, _ = execute(spark, ["generate-uuid :uid"], df)
    assert ok2.first()["uid"] == v


def test_quantize(spark):
    df = spark.createDataFrame([(5.0,), (15.0,), (50.0,)], "v double")
    ok, _ = execute(spark, ["quantize :v :bucket '0:10=low,10.01:20=mid,20.01:100=high'"], df)
    assert [r["bucket"] for r in ok.orderBy("v").collect()] == ["low", "mid", "high"]


def test_text_distance(spark):
    df = spark.createDataFrame([("kitten", "sitting")], "a string, b string")
    ok, _ = execute(spark, ["text-distance levenshtein :a :b :d"], df)
    assert ok.first()["d"] == 3.0


def test_text_metric_jaccard(spark):
    df = spark.createDataFrame([("a b c", "b c d")], "a string, b string")
    ok, _ = execute(spark, ["text-metric jaccard :a :b :m"], df)
    assert abs(ok.first()["m"] - 0.5) < 1e-6


def test_url_encode_decode(spark, one_col):
    df = one_col("a b&c")
    ok, _ = execute(spark, ["url-encode :body"], df)
    enc = ok.first()["body"]
    assert " " not in enc
    ok2, _ = execute(spark, ["url-decode :body"], ok)
    assert ok2.first()["body"] == "a b&c"


def test_index_split(spark, one_col):
    df = one_col("abcdef")
    ok, _ = execute(spark, ["index-split :body 2 4 :out"], df)
    assert ok.first()["out"] == "bcd"


def test_light_recipe_end_to_end(spark):
    """The reference's published benchmark recipe shape
    (wrangler-docs/performance.md:24-38) minus the CSV-specific columns."""
    df = spark.createDataFrame(
        [("1,joe,CA,000-00-1234,10",), ("2,ann,NY,111-11-5678,20",)],
        "demo string",
    )
    recipe = [
        "parse-as-csv :demo ',' false",
        "drop demo",
        "fill-null-or-empty demo_2 N/A",
        "uppercase demo_2",
        "mask-number demo_4 xxx-xx-####",
        'filter-row-if-true demo_3 =~ "CA"',
    ]
    ok, _ = execute(spark, recipe, df)
    rows = ok.collect()
    assert len(rows) == 1
    assert rows[0]["demo_2"] == "ANN"
    assert rows[0]["demo_4"] == "xxx-xx-5678"


def test_redact_pii_directive(spark):
    """redact-pii masks SSN/email/phone/credit-card/IPv4 in free text;
    kinds argument restricts the battery; unknown kinds raise."""
    import pytest as _pytest

    from wrangler_spark import execute
    from wrangler_spark.errors import UsageError
    txt = ("call 650-897-3839 or mail root@joltie.io, ssn 111-11-1111, "
           "card 4111 1111 1111 1111, host 10.0.0.1")
    df = spark.createDataFrame([(txt,)], "t string")
    ok, _ = execute(spark, ["redact-pii :t"], df)
    out = ok.first()["t"]
    assert ("[US_PHONE]" in out and "[EMAIL]" in out and "[SSN]" in out
            and "[CREDIT_CARD]" in out and "[IPV4]" in out)
    assert "650-897" not in out and "joltie" not in out
    ok2, _ = execute(spark, ["redact-pii :t email"], df)
    out2 = ok2.first()["t"]
    assert "[EMAIL]" in out2 and "650-897-3839" in out2
    with _pytest.raises(UsageError):
        execute(spark, ["redact-pii :t bogus"], df)
