"""Runnable end-to-end pretraining-corpus prep over the testdata
`documents` table — the composed funnel from
wrangler_spark.pipeline.corpus:

    spark-submit examples/pretrain_pipeline.py [sf_dir] [out_dir]

Annotates, gates, exact-dedups, near-dedups (MinHash LSH + connected
components + best-quality canonical), decontaminates against a held-out
benchmark sample, chunks, packs, writes the packed sequences as
parquet, and prints the stage funnel.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from wrangler_spark.pipeline.corpus import prepare_corpus


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pretrain_packed"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("pretrain-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # stand-in eval benchmark: a small deterministic slice of the corpus
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")

    res = prepare_corpus(
        docs,
        benchmark=bench,
        min_quality=0.3,
        num_hashes=64,
        bands=16,
        shingle_k=5,
        chunk_tokens=512,
        chunk_overlap=64,
        pack_budget=2048,
        pack_shards=64,
    )
    res.packed.write.mode("overwrite").parquet(out_dir)
    res.funnel().show(truncate=False)
    print(f"packed sequences written to {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
