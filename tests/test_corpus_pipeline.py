"""Composed corpus-prep funnel (pipeline/corpus.py prepare_corpus):
plant one defect per stage and assert exactly the planted rows fall
out, then check the chunk/pack conservation invariants end-to-end.

reference: no single equivalent (transform-only service); stage
behavior is pinned by the per-operator tests — this exercises their
COMPOSITION (shared scan, lazy stages, funnel accounting).
"""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.pipeline.corpus import prepare_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the quiet green forest, where it sleeps for the night."
)
GOOD2 = (
    "a completely different story is told here about ships and the "
    "sea, with sailors who chart the stars and follow them for weeks."
)
BENCH_SNIPPET = (
    "this exact benchmark sentence has quite a few tokens so that the "
    "thirteen gram overlap window is certain to fire on it today."
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (1, GOOD),                                   # kept
        (2, GOOD),                                   # exact dup of 1 -> dropped
        (3, GOOD.replace("lazy", "sleepy")),         # near dup of 1 -> clustered
        (4, GOOD2),                                  # kept
        (5, "x# 123 ###"),                           # low quality -> gated
        # contaminated: standalone text (shares no shingles with 1-4)
        # carrying the benchmark snippet verbatim
        (6, "meanwhile an unrelated article was published which said: "
            + BENCH_SNIPPET),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_funnel_drops_exactly_the_planted_rows(spark, planted):
    bench = spark.createDataFrame([(BENCH_SNIPPET,)], "text string")
    res = prepare_corpus(
        planted, benchmark=bench, min_quality=0.3,
        num_hashes=32, bands=16, shingle_k=3,
        chunk_tokens=16, chunk_overlap=4, pack_budget=48, pack_shards=4,
    )
    # stage by stage: 5 gated (doc 5 out), exact dedup drops doc 2,
    # near-dup collapses {1,3} to one member, decontam drops doc 6
    assert res.gated.count() == 5
    exact_ids = {r.doc_id for r in res.exact.select("doc_id").collect()}
    assert exact_ids == {1, 3, 4, 6}
    cl = {r.doc_id: r.cluster for r in res.clusters.collect()}
    assert cl.get(1) == cl.get(3) == 1  # near-dup pair shares a cluster
    final_ids = {r.doc_id for r in res.docs.select("doc_id").collect()}
    assert 6 not in final_ids, "benchmark-contaminated doc must drop"
    assert 4 in final_ids
    assert len(final_ids & {1, 3}) == 1, "one canonical member per near-dup cluster"
    assert 5 not in final_ids and 2 not in final_ids


def test_chunk_pack_conservation_and_funnel_report(spark, planted):
    res = prepare_corpus(
        planted, benchmark=None, min_quality=0.3,
        num_hashes=32, bands=16, shingle_k=3,
        chunk_tokens=16, chunk_overlap=4, pack_budget=48, pack_shards=4,
    )
    # every retained doc is fully chunked: first chunk starts at token 1,
    # consecutive chunks overlap by exactly 4 tokens, totals reconstruct
    chunks = res.chunks.collect()
    docs_tok = {
        r.doc_id: r.n_tokens for r in res.docs.select("doc_id", "n_tokens").collect()
    }
    per_doc = {}
    for c in chunks:
        per_doc.setdefault(c.doc_id, []).append(c)
    assert set(per_doc) == set(docs_tok)
    step = 16 - 4
    for did, cs in per_doc.items():
        cs.sort(key=lambda c: c.chunk_idx)
        covered = step * (len(cs) - 1) + cs[-1].n_chunk_tokens
        assert covered == docs_tok[did], (did, covered, docs_tok[did])
    # packing: no pack over budget, chunk totals conserved
    packed = res.packed
    over = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("n_chunk_tokens").alias("tok"))
        .filter(F.col("tok") > 48)
        .count()
    )
    assert over == 0
    assert packed.count() == len(chunks)
    # funnel report shape
    funnel = {r.stage: r.rows for r in res.funnel().collect()}
    assert funnel["input"] == 6
    assert funnel["gated"] == 5
    assert funnel["chunks"] == len(chunks)
    assert funnel["packs"] >= 1


def test_lang_gate(spark, planted):
    res = prepare_corpus(
        planted, min_quality=0.0, langs=["en"], num_hashes=16, bands=8,
        shingle_k=3,
    )
    ids = {r.doc_id for r in res.gated.select("doc_id").collect()}
    assert 5 not in ids, "stopword-free garbage must not lang-id as en"


def test_prepare_corpus_incremental_mode(spark):
    """Round-5 incremental mode: prepare_corpus(dedup_state=...) over a
    NEW BATCH only — near-dups of already-ingested corpus docs drop,
    new within-batch dup groups keep their best member, unique new docs
    pass, and the returned clusters cover corpus ∪ batch with the same
    labels a full recompute gives."""
    from pyspark.sql import functions as F

    from wrangler_spark.pipeline.corpus import build_dedup_state, prepare_corpus
    from wrangler_spark.pipeline.dedup import dup_clusters, minhash_lsh_pairs

    corpus = spark.createDataFrame(
        [(1, GOOD), (5, GOOD2)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, GOOD + " tail"),      # near-dup of corpus doc 1 -> drop
            (11, BENCH_SNIPPET + " a b c d e f g h i j k l m n o p q"),
            (12, BENCH_SNIPPET + " a b c d e f g h i j k l m n o p q!"),
            # ^ new within-batch near-dup pair -> keep exactly one
            (13, "an entirely fresh document about glaciers, moraines and "
                 "the slow creep of ancient ice across quiet valleys."),
        ],
        "doc_id long, text string",
    )
    state = build_dedup_state(corpus, shingle_k=3)
    res = prepare_corpus(
        batch, min_quality=0.0, shingle_k=3, dedup_state=state,
        chunk_tokens=64, chunk_overlap=8, pack_budget=256, pack_shards=4,
    )
    kept = sorted(r["doc_id"] for r in res.docs.select("doc_id").collect())
    assert 10 not in kept, "near-dup of existing corpus content must drop"
    assert 13 in kept
    assert len([k for k in kept if k in (11, 12)]) == 1, (
        "within-batch dup pair keeps exactly one member"
    )
    # the carried-forward clusters equal a full recompute over all docs
    alldocs = corpus.union(batch)
    full = {
        r["doc_id"]: r["cluster"]
        for r in dup_clusters(
            minhash_lsh_pairs(alldocs, shingle_k=3), alldocs.select("doc_id")
        ).collect()
    }
    inc = {r["doc_id"]: r["cluster"] for r in res.clusters.collect()}
    assert inc == full
