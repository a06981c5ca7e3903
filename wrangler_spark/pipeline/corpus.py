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
    minhash_lsh_pairs,
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
) -> CorpusResult:
    """Compose the full corpus-prep funnel; see module docstring for
    the per-stage scale shape. `benchmark` (optional) is the eval set
    to decontaminate against — any doc sharing a `decontaminate_n`-gram
    with it is dropped."""
    annotated = docs.withColumn("lang", lang_id_expr(F.col(text_col))).withColumn(
        "quality", quality_score_expr(F.col(text_col))
    ).withColumn("n_tokens", token_count_expr(F.col(text_col)).cast("int"))

    gate = (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    if langs:
        gate = gate & F.col("lang").isin(list(langs))
    gated = annotated.filter(gate)

    exact = exact_dedup(gated, text_col=text_col, id_col=id_col)

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
