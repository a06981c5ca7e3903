import os

import pytest
from pyspark.sql import functions as F

from wrangler_spark import execute
from wrangler_spark.sources import (
    bernoulli_sample,
    poisson_sample,
    read_source,
    reservoir_sample,
)


def test_read_source_text_then_recipe(spark, tmp_path):
    p = tmp_path / "lines.csv"
    p.write_text("1,joe,CA\n2,ann,NY\n")
    df = read_source(spark, str(p), "csv")
    assert df.columns == ["body"]
    ok, _ = execute(spark, ["parse-as-csv :body ','", "drop :body"], df)
    assert sorted(r["body_2"] for r in ok.collect()) == ["ann", "joe"]


def test_read_source_parquet(spark):
    df = read_source(spark, "/root/testdata/sf0.001/documents.parquet", "parquet")
    assert "doc_id" in df.columns


def test_sampling(spark):
    df = spark.range(1000)
    r = reservoir_sample(df, 50)
    assert r.count() == 50
    b = bernoulli_sample(df, 0.1, seed=1)
    assert 20 < b.count() < 250
    p = poisson_sample(df, 0.1, seed=1)
    assert p.count() > 0


def test_stream_replay_exactly_once(spark, tmp_path):
    from wrangler_spark.cdc import generate_events, repo_files_schema
    from wrangler_spark.cdc.events import expected_final_state
    from wrangler_spark.cdc.replay import final_state_sha256
    from wrangler_spark.lake import LakeTable
    from wrangler_spark.streaming import stream_replay

    events = generate_events(spark, 1500, n_repos=6, n_paths_per_repo=10, epoch_size=500)
    src_dir = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src_dir)

    table = LakeTable.create(
        spark, str(tmp_path / "tbl"), repo_files_schema(), ["repo", "path"], num_buckets=4
    )
    stream = spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 2).parquet(src_dir)
    q = stream_replay(stream, table, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = sorted(
        (r["repo"], r["path"], r["content_sha256"])
        for r in final_state_sha256(table.read()).collect()
    )
    want = sorted(
        (r["repo"], r["path"], r["content_sha256"])
        for r in final_state_sha256(expected_final_state(events)).collect()
    )
    assert got == want
