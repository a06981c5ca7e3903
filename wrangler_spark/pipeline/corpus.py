"""End-to-end pretraining-corpus preparation: the composed funnel a
100 TB training-data pipeline actually runs, built from this package's
stage operators —

    annotate (lang-id, quality, token counts)
      -> quality / language gate
      -> exact dedup (hash groupBy, min-id canonical)
      -> near-dup clustering (MinHash LSH pairs -> connected
         components -> keep best-quality member per cluster)
      -> benchmark decontamination (13-gram overlap, broadcast)
      -> fixed-window chunking -> shard-local sequence packing

Every stage stays lazy: `prepare_corpus` returns the composed
DataFrames, so Catalyst sees one plan per output and the corpus scan
is shared. The only actions are in `funnel()` (an explicit report
helper) and whatever the caller triggers.

Scale shape (the 100 TB story, stage by stage):
  - annotate/gate: pure Column exprs fused into the scan's codegen
    stage — no shuffle, filters run before anything expensive.
  - exact dedup: one shuffle keyed by a 64-bit text hash.
  - near-dup: the banded-minhash bucket shuffle (star-guarded against
    clone-cluster blowup), then label propagation over skinny
    (id, label) rows, then ONE payload shuffle keyed by cluster for
    canonical selection.
  - decontaminate: benchmark n-grams broadcast; corpus side explodes
    map-side, one skinny id dedup shuffle.
  - chunk: in-partition explode, no shuffle.
  - pack: one shuffle keyed by shard; greedy fill is shard-local in
    one Arrow batch stream.

reference: no single equivalent (the reference is a transform
service); the behavioral model is public pretraining pipelines
(SlimPajama / FineWeb / The Pile §6.3 decontamination).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrangler_spark.pipeline.dedup import (
    decontaminate,
    dup_clusters,
    exact_dedup,
    keep_best_per_cluster,
    minhash_index,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
)
from wrangler_spark.pipeline.text import (
    chunk_documents,
    lang_id_expr,
    pack_sequences,
    quality_score_expr,
    token_count_expr,
)


@dataclass
class CorpusResult:
    """Lazy outputs of `prepare_corpus` (nothing is computed until the
    caller acts on a member)."""

    annotated: DataFrame   # input + (lang, quality, n_tokens)
    gated: DataFrame       # after the quality/lang/min-token gate
    exact: DataFrame       # after exact dedup
    clusters: DataFrame    # (id, cluster) near-dup labels over `exact`
    docs: DataFrame        # final retained documents (post decontam)
    chunks: DataFrame      # (id, chunk_idx, chunk_text, n_chunk_tokens)
    packed: DataFrame      # chunks + (shard, pack_id, pack_pos)

    def funnel(self) -> DataFrame:
        """One-row stage-count report (runs one job per stage count —
        a report helper, not part of the data plane)."""
        spark = self.annotated.sparkSession
        rows = [
            ("input", self.annotated.count()),
            ("gated", self.gated.count()),
            ("exact_dedup", self.exact.count()),
            ("near_dedup+decontam", self.docs.count()),
            ("chunks", self.chunks.count()),
            ("packs", self.packed.select("shard", "pack_id").distinct().count()),
        ]
        return spark.createDataFrame(rows, "stage string, rows long")


@dataclass
class DedupState:
    """Persistable incremental-dedup state — the shape a daily 100 TB
    ingest actually runs: signature the corpus ONCE, then each new batch
    probes the persisted index and carries the cluster labels forward,
    so corpus TEXT is never re-shingled.

    Members (both ordinary DataFrames — write them out as parquet,
    `index` partitioned/bucketed by (band, bucket) for co-located
    probes, and reload to resume):
      - index:    one (id, band, bucket) row per doc per band
                  (`minhash_index` schema)
      - clusters: one (id, cluster) row per ingested doc; cluster =
                  min member id of the doc's near-dup component

    The LSH parameters are pinned on the state because the affine hash
    family is deterministic in them — probing with different parameters
    would silently miss every corpus duplicate."""

    index: DataFrame
    clusters: DataFrame
    text_col: str = "text"
    id_col: str = "doc_id"
    num_hashes: int = 64
    bands: int = 16
    shingle_k: int = 5
    max_bucket: int = 1000


def build_dedup_state(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 1000,
) -> DedupState:
    """Initial ingest: full signature pass + LSH pairs + components.
    One-time cost over the seed corpus; after this every batch is
    O(batch) via `ingest_batch`."""
    index = minhash_index(docs, text_col, id_col, num_hashes, bands, shingle_k)
    pairs = minhash_lsh_pairs(
        docs, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        bands=bands, shingle_k=shingle_k, max_bucket=max_bucket,
    )
    clusters = dup_clusters(pairs, docs.select(id_col), id_col=id_col)
    return DedupState(
        index=index, clusters=clusters, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
        max_bucket=max_bucket,
    )


def ingest_batch(state: DedupState, new_docs: DataFrame) -> DedupState:
    """Incremental ingest: probe the new batch against the persisted
    index (`minhash_lsh_pairs_incremental` — corpus side touched only
    at the batch's (band, bucket) keys, corpus text never read), then
    carry the existing cluster labels forward as (cluster ↔ member)
    edges and re-run hash-min components over carry-edges ∪ new pairs.

    Equivalence to a full recompute on corpus ∪ batch (the invariant
    the `dedup_incremental` driver key checks): the old labels preserve
    exactly the connectivity of the old pair graph (each component
    stays connected through its min-id representative), and the
    incremental probe emits every pair involving a new doc, so the
    union's components equal the full pass's — a new doc bridging two
    previously-separate clusters merges them here just as it would in
    the full pass. The star guard changes pair SHAPE on hot buckets in
    either path, never bucket connectivity, so the resulting PARTITION
    (and its min-id labels) is identical.

    Cost shape at 100 TB: batch text is shingled once; everything else
    is skinny-row joins — (id, band, bucket) index probes at batch
    keys, (id, label) propagation rounds — independent of corpus text
    bytes."""
    pairs, new_idx = minhash_lsh_pairs_incremental(
        new_docs, state.index, text_col=state.text_col, id_col=state.id_col,
        num_hashes=state.num_hashes, bands=state.bands,
        shingle_k=state.shingle_k, max_bucket=state.max_bucket,
    )
    id_col = state.id_col
    carry = state.clusters.filter(F.col("cluster") != F.col(id_col)).select(
        F.col("cluster").alias("id_a"), F.col(id_col).alias("id_b")
    )
    all_ids = state.clusters.select(id_col).unionByName(new_docs.select(id_col))
    clusters = dup_clusters(
        pairs.unionByName(carry), all_ids, id_col=id_col
    )
    return DedupState(
        index=state.index.unionByName(new_idx), clusters=clusters,
        text_col=state.text_col, id_col=id_col,
        num_hashes=state.num_hashes, bands=state.bands,
        shingle_k=state.shingle_k, max_bucket=state.max_bucket,
    )


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    langs: list[str] | None = None,
    min_tokens: int = 1,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 1000,
    decontaminate_n: int = 13,
    chunk_tokens: int = 512,
    chunk_overlap: int = 64,
    pack_budget: int = 2048,
    pack_shards: int = 256,
    dedup_state: DedupState | None = None,
) -> CorpusResult:
    """Compose the full corpus-prep funnel; see module docstring for
    the per-stage scale shape. `benchmark` (optional) is the eval set
    to decontaminate against — any doc sharing a `decontaminate_n`-gram
    with it is dropped.

    Incremental mode (round 5): pass `dedup_state` (a persisted
    `DedupState` from a previous run over the existing corpus) and
    `docs` as ONLY THE NEW BATCH — the near-dup stage then runs
    `ingest_batch` (persisted-index probe + cluster-label
    carry-forward) instead of re-signaturing the whole corpus, and the
    returned `clusters` covers corpus ∪ batch while every other stage
    (gate, exact dedup, canonical selection, decontam, chunk, pack)
    runs over the batch docs alone — the shape a daily 100 TB ingest
    actually runs. Canonical selection keeps the best member of each
    cluster AMONG THE BATCH (prior-corpus docs were already retained
    or dropped when they were ingested; re-litigating them would mean
    rewriting history). The LSH parameters must match the state's —
    they are taken FROM the state when one is given."""
    annotated = docs.withColumn("lang", lang_id_expr(F.col(text_col))).withColumn(
        "quality", quality_score_expr(F.col(text_col))
    ).withColumn("n_tokens", token_count_expr(F.col(text_col)).cast("int"))

    gate = (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    if langs:
        gate = gate & F.col("lang").isin(list(langs))
    gated = annotated.filter(gate)

    exact = exact_dedup(gated, text_col=text_col, id_col=id_col)

    if dedup_state is not None:
        new_state = ingest_batch(
            dedup_state, exact.select(id_col, text_col)
        )
        clusters = new_state.clusters
        # daily-ingest retention policy: a batch doc whose cluster
        # contains ANY prior-corpus doc is a near-dup of already-
        # retained (or already-rejected) content — drop it; clusters
        # formed entirely within the batch keep their best member,
        # same as the full pass.
        touches_corpus = (
            clusters.join(dedup_state.clusters.select(id_col), id_col, "left_semi")
            .select("cluster")
            .distinct()
        )
        batch_members = clusters.join(exact.select(id_col), id_col, "left_semi")
        dup_of_corpus = batch_members.join(
            touches_corpus, "cluster", "left_semi"
        ).select(id_col)
        # (keep_best treats docs absent from `clusters` as always-kept
        # singletons, so corpus-dup batch docs must leave `exact`
        # itself, not just the cluster table)
        exact_new = exact.join(dup_of_corpus, id_col, "left_anti")
        batch_only = batch_members.join(touches_corpus, "cluster", "left_anti")
        kept = keep_best_per_cluster(
            exact_new, batch_only, score=F.col("quality"), id_col=id_col
        )
    else:
        pairs = minhash_lsh_pairs(
            exact, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
            max_bucket=max_bucket,
        )
        clusters = dup_clusters(pairs, id_col=id_col)
        kept = keep_best_per_cluster(exact, clusters, score=F.col("quality"), id_col=id_col)

    if benchmark is not None:
        flagged = decontaminate(
            kept, benchmark, text_col=text_col, bench_col=text_col,
            id_col=id_col, n=decontaminate_n,
        )
        final_docs = flagged.filter(~F.col("contaminated")).drop("contaminated")
    else:
        final_docs = kept

    chunks = chunk_documents(
        final_docs, text_col=text_col, id_col=id_col,
        max_tokens=chunk_tokens, overlap=chunk_overlap,
    )
    packed = pack_sequences(
        chunks, budget=pack_budget, token_col="n_chunk_tokens",
        id_cols=(id_col, "chunk_idx"), shards=pack_shards,
    )
    return CorpusResult(
        annotated=annotated, gated=gated, exact=exact, clusters=clusters,
        docs=final_docs, chunks=chunks, packed=packed,
    )
