"""Ninth wave of reference JUnit mirrors: the JsonTestData corpus.

SchemaConverterTest.conversionTest runs every JsonTestData document
through json parsing and asserts the values survive schema inference +
record conversion; JsParserTest exercises the same corpus through
parse-as-json. Here each document is pinned through parse-as-json's
flatten semantics (top-level arrays → one row per element, exactly the
reference JsParser contract), plus the JsPathTest json:Select /
json:ArrayLength pin (s6 == 8, nulls counted).
"""

import json

from wrangler_spark import execute

BASIC = '{ "a" : 1, "b" : 2.0, "c" : "test", "d" : true }'
ARRAY_OF_OBJECTS = (
    '[ { "a" : 1, "b" : 2, "c" : "x" }, { "a" : 2, "b" : 3, "c" : "y" },'
    ' { "a" : 3, "b" : 4, "c" : "z" } ]'
)
SIMPLE_JSON_OBJECT = """{
  "fname" : "root", "lname" : "joltie", "age" : 20, "weight" : 182.3,
  "location" : "New York",
  "address" : { "city" : "New York", "state" : "New York", "zip" : 97474,
    "gps" : { "lat" : 12.23, "long" : 14.54,
      "universe" : { "galaxy" : "milky way", "start" : "sun",
        "size" : 24000, "alive" : true } } } }"""
JSON_ARRAY_WITH_OBJECT = (
    '[ { "fname" : "root", "lname" : "joltie", "age" : 20, "weight" : 182.3,'
    ' "location" : "New York", "address" : { "city" : "New York",'
    ' "state" : "New York", "zip" : 97474, "gps" : { "lat" : 12.23,'
    ' "long" : 14.54, "universe" : { "galaxy" : "milky way", "start" : "sun",'
    ' "size" : 24000, "alive" : true, "population" : [ 4,5,6,7,8,9] } } } } ]'
)
COMPLEX_1 = (
    '{ "numbers" : [ 1,2,3,4,5,6], "object" : { "a" : 1, "b" : 2,'
    ' "c" : [ "a", "b", "c", "d" ], "d" : [ { "a" : 1 }, { "a" : 2 },'
    ' { "a" : 3 } ] } }'
)
ARRAY_OF_NUMBERS = "[ 1, 2, 3, 4, 5]"
ARRAY_OF_STRING = '[ "A", "B", "C"]'
COMPLEX_2 = (
    '{ "a" : [ 1, 2, 3, 4], "b" : [ "A", "B", "C"], "d" : true, "e" : 1,'
    ' "f" : "string", "g" : { "g1" : [ 1, 2, 3, 4],'
    ' "g2" : [ { "g21" : 1} ] } }'
)
EMPTY_OBJECT = '{ "dividesplitdetails":{"type0":[]}}'


def _one(spark, doc, recipe):
    df = spark.createDataFrame([(doc,)], "body string")
    ok, _ = execute(spark, recipe, df)
    return ok.collect()


def test_json_basic_types(spark):
    (r,) = _one(spark, BASIC, ["parse-as-json :body 1"])
    assert r["body_a"] == 1 and r["body_b"] == 2.0
    assert r["body_c"] == "test" and r["body_d"] is True


def test_json_array_of_objects_explodes(spark):
    rows = _one(
        spark, ARRAY_OF_OBJECTS, ["parse-as-json :body 1", "parse-as-json :body 1"]
    )
    assert len(rows) == 3
    assert sorted(r["body_a"] for r in rows) == [1, 2, 3]
    assert sorted(r["body_c"] for r in rows) == ["x", "y", "z"]


def test_json_array_of_primitives(spark):
    rows = _one(spark, ARRAY_OF_NUMBERS, ["parse-as-json :body 1"])
    assert sorted(r["body"] for r in rows) == [1, 2, 3, 4, 5]
    rows = _one(spark, ARRAY_OF_STRING, ["parse-as-json :body 1"])
    assert sorted(r["body"] for r in rows) == ["A", "B", "C"]


def test_json_deep_flatten(spark):
    (r,) = _one(spark, SIMPLE_JSON_OBJECT, ["parse-as-json :body 10"])
    assert r["body_address_gps_universe_galaxy"] == "milky way"
    assert r["body_address_gps_universe_size"] == 24000
    assert r["body_address_gps_universe_alive"] is True
    assert r["body_address_zip"] == 97474
    assert r["body_weight"] == 182.3


def test_json_array_with_object(spark):
    rows = _one(
        spark,
        JSON_ARRAY_WITH_OBJECT,
        ["parse-as-json :body 1", "parse-as-json :body 10"],
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["body_address_gps_universe_population"] == [4, 5, 6, 7, 8, 9]
    assert r["body_fname"] == "root"


def test_json_complex_1(spark):
    (r,) = _one(spark, COMPLEX_1, ["parse-as-json :body 10"])
    assert r["body_numbers"] == [1, 2, 3, 4, 5, 6]
    assert r["body_object_c"] == ["a", "b", "c", "d"]
    d = r["body_object_d"]
    assert len(d) == 3
    assert [x["a"] for x in d] == [1, 2, 3]


def test_json_complex_2(spark):
    (r,) = _one(spark, COMPLEX_2, ["parse-as-json :body 10"])
    assert r["body_a"] == [1, 2, 3, 4]
    assert r["body_b"] == ["A", "B", "C"]
    assert r["body_d"] is True and r["body_e"] == 1 and r["body_f"] == "string"
    assert r["body_g_g1"] == [1, 2, 3, 4]
    assert [x["g21"] for x in r["body_g_g2"]] == [1]


def test_json_empty_containers(spark):
    (r,) = _one(spark, EMPTY_OBJECT, ["parse-as-json :body 10"])
    assert r["body_dividesplitdetails_type0"] == []


FB_JSON = json.dumps(
    {
        "apiVersion": "2.0",
        "data": {
            "updated": "2010-01-07T19:58:42.949Z",
            "totalItems": 800,
            "startIndex": 1,
            "itemsPerPage": 1,
            "items": [
                {
                    "id": "hYB0mn5zh2c",
                    "uploaded": "2007-06-05T22:07:03.000Z",
                    "updated": "2010-01-07T13:26:50.000Z",
                    "uploader": "GoogleDeveloperDay",
                    "category": "News",
                    "title": "Google Developers Day US - Maps API Introduction",
                    "description": "Google Maps API Introduction ...",
                    "tags": ["GDD07", "GDD07US", "Maps"],
                    "thumbnail": {
                        "default": "http://i.ytimg.com/vi/hYB0mn5zh2c/default.jpg",
                        "hqDefault": "http://i.ytimg.com/vi/hYB0mn5zh2c/hqdefault.jpg",
                    },
                    "player": {
                        "default": "http://www.youtube.com/watch?vu003dhYB0mn5zh2c"
                    },
                    "duration": 2840,
                    "aspectRatio": "widescreen",
                    "rating": 4.63,
                    "viewCount": 220101,
                    "status": {"value": "restricted", "reason": "limitedSyndication"},
                    "accessControl": {"syndicate": "allowed", "embed": "allowed"},
                }
            ],
        },
    }
)


def test_json_fb_deep_document(spark):
    """The FB_JSON shape: nested arrays of records flatten to usable
    columns at depth; values survive intact."""
    rows = _one(
        spark,
        FB_JSON,
        [
            "parse-as-json :body 10",
            "flatten :body_data_items",
            "flatten-record :body_data_items",
        ],
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["body_apiVersion"] == "2.0"
    assert r["body_data_totalItems"] == 800
    assert r["body_data_items_duration"] == 2840
    assert r["body_data_items_rating"] == 4.63
    assert r["body_data_items_tags"] == ["GDD07", "GDD07US", "Maps"]
    assert r["body_data_items_status"]["value"] == "restricted"
    assert r["body_data_items_accessControl"]["syndicate"] == "allowed"


# ------------------------------------------------------------ JsPathTest

JSPATH_BODY = (
    '{ "name" : { "Fname" : "Joltie", "Lname" : "Root", "mname" : null },'
    ' "coordinates" : [ 12.56, 45.789 ],'
    ' "numbers" : [ 1, 2.1, 3, null, 4, 5, 6, null ],'
    ' "responses" : [ { "a" : 1, "b" : "X", "c" : 2.8},'
    ' { "a" : 2, "b" : "Y", "c" : 232342.8}, { "a" : 3, "b" : "Z", "c" : null},'
    ' { "a" : 4, "b" : "U"} ],'
    ' "integer" : 1, "double" : 2.8, "float" : 45.6,'
    ' "aliases" : [ "root", "joltie", "bunny", null ] }'
)


def test_jspath_select_and_array_length(spark):
    """JsPathTest.testJSONFunctions: case-insensitive Select and
    ArrayLength counting nulls — s6 == 8."""
    df = spark.createDataFrame([(JSPATH_BODY,)], "body string")
    ok, _ = execute(
        spark,
        [
            "set-column body json:Parse(body)",
            "set-column s0 json:Select(body, '$.name.fname', '$.name.lname')",
            "set-column s1 json:Select(body, '$.name.fname')",
            "set-column s6 json:ArrayLength(json:Select(body, '$.numbers'))",
        ],
        df,
    )
    r = ok.first()
    assert r["s6"] == 8
    assert r["s1"] == "Joltie"
    assert json.loads(r["s0"]) == ["Joltie", "Root"]
