"""Deterministic hash splits / samples (pipeline/sampling.py).

The property under test is REPRODUCIBILITY: assignment is a pure
function of (salt, key) — independent of partitioning, row order, and
of which other rows are present (append-stability, the eval-
contamination guard random splits don't give you).
"""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.pipeline.sampling import (
    assign_splits,
    hash_sample,
    split_expr,
    stratified_hash_sample,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "de", f"doc {i}") for i in range(2000)],
        "doc_id long, lang string, text string",
    )


def test_split_assignment_deterministic_across_layout(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in assign_splits(docs, "doc_id", w).collect()}
    shuffled = docs.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    b = {r["doc_id"]: r["split"] for r in assign_splits(shuffled, "doc_id", w).collect()}
    assert a == b
    # fractions roughly honored (hash uniformity at n=2000)
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in w}
    assert abs(frac["train"] - 0.8) < 0.05 and abs(frac["val"] - 0.1) < 0.03


def test_split_append_stability(spark, docs):
    """Computing the split over a SUBSET assigns the shared keys
    identically — appending data never moves old keys across splits."""
    w = {"train": 0.5, "val": 0.5}
    full = {r["doc_id"]: r["split"] for r in assign_splits(docs, "doc_id", w).collect()}
    head = docs.filter("doc_id < 500")
    sub = {r["doc_id"]: r["split"] for r in assign_splits(head, "doc_id", w).collect()}
    assert all(full[k] == v for k, v in sub.items())


def test_split_weights_validation(spark, docs):
    with pytest.raises(ValueError, match="sum"):
        assign_splits(docs, "doc_id", {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError, match="non-empty"):
        assign_splits(docs, "doc_id", {})


def test_split_salt_changes_assignment(spark, docs):
    w = {"train": 0.5, "val": 0.5}
    a = {r["doc_id"]: r["split"] for r in assign_splits(docs, "doc_id", w, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in assign_splits(docs, "doc_id", w, salt="s2").collect()}
    assert a != b  # different salts give independent splits


def test_hash_sample_deterministic_and_sized(spark, docs):
    s1 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs.repartition(7), "doc_id", 0.3).collect()}
    assert s1 == s2
    assert abs(len(s1) / 2000 - 0.3) < 0.05
    # nested property: a smaller fraction is a SUBSET of a larger one
    s3 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    assert s3 <= s1


def test_stratified_hash_sample(spark, docs):
    out = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.5, "de": 1.0})
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    n_de = docs.filter("lang='de'").count()
    assert counts["de"] == n_de  # fraction 1.0 keeps every de row
    n_en = docs.filter("lang='en'").count()
    assert abs(counts["en"] / n_en - 0.5) < 0.07
    # unlisted strata are dropped
    out2 = stratified_hash_sample(docs, "doc_id", "lang", {"de": 1.0})
    assert out2.filter("lang='en'").count() == 0


def test_split_is_pure_column_no_shuffle(spark, docs):
    """The split projection adds no Exchange to the plan."""
    plan = assign_splits(docs, "doc_id", {"a": 0.5, "b": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_expr_remainder_goes_to_last(spark, docs):
    # weights summing below 1: remainder keys land in the LAST split
    out = assign_splits(docs, "doc_id", {"train": 0.1, "rest": 0.1})
    names = {r["split"] for r in out.select("split").distinct().collect()}
    assert names == {"train", "rest"}
