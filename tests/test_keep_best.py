"""Canonical-document selection (pipeline/dedup.py::keep_best_per_cluster)."""

from pyspark.sql import functions as F

from wrangler_spark.pipeline.dedup import dup_clusters, keep_best_per_cluster


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "short"),
            (2, "the longest document of cluster one"),
            (3, "mid length doc"),
            (10, "solo document"),
            (20, "tie a"),
            (21, "tie b"),
        ],
        "doc_id long, text string",
    )


def _pairs(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (20, 21)], "id_a long, id_b long"
    )


def test_keep_best_selects_argmax_and_singletons(spark):
    docs = _docs(spark)
    clusters = dup_clusters(_pairs(spark), docs.select("doc_id"))
    kept = keep_best_per_cluster(docs, clusters, F.length("text"))
    assert {r["doc_id"] for r in kept.collect()} == {2, 10, 20}
    # 2: longest of {1,2,3}; 10: singleton; 20: tie with 21 → smaller id


def test_keep_best_docs_missing_from_clusters_are_kept(spark):
    docs = _docs(spark)
    # clusters computed WITHOUT vertices: only paired docs labeled
    clusters = dup_clusters(_pairs(spark))
    kept = keep_best_per_cluster(docs, clusters, "length(text)")
    assert {r["doc_id"] for r in kept.collect()} == {2, 10, 20}


def test_keep_best_no_window_sort_in_plan(spark):
    """The argmax is a struct-max aggregation, not a payload window."""
    docs = _docs(spark)
    clusters = dup_clusters(_pairs(spark), docs.select("doc_id"))
    kept = keep_best_per_cluster(docs, clusters, F.length("text"))
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
