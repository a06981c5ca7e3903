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


def test_stateful_key_progress(spark, tmp_path):
    """applyInPandasWithState: per-key running progress over a change
    stream — state accumulates ACROSS micro-batches."""
    from wrangler_spark.cdc import generate_events
    from wrangler_spark.streaming.stateful import key_progress

    events = generate_events(spark, 600, n_repos=4, n_paths_per_repo=5, epoch_size=200)
    src = str(tmp_path / "st_src")
    events.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out_dir = str(tmp_path / "st_out")
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        key_progress(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "st_ck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    # the LAST emitted row per key must equal the batch ground truth
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("repo", "path").orderBy(F.desc("events"))
    final = got.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    truth = events.groupBy("repo", "path").agg(
        F.count(F.lit(1)).alias("events"), F.max("seq").alias("last_seq")
    )
    j = final.alias("g").join(truth.alias("t"), ["repo", "path"])
    bad = j.filter(
        (F.col("g.events") != F.col("t.events")) | (F.col("g.last_seq") != F.col("t.last_seq"))
    ).count()
    assert bad == 0
    assert final.count() == truth.count()


def test_stateful_sessionize_gap(spark, tmp_path):
    """Seq-gap sessionization: a >1000 gap in a key's commit sequence
    closes the episode (deterministic — no wall-clock timeouts)."""
    from wrangler_spark.streaming.stateful import sessionize

    rows = [(s, "r1", "a.py") for s in range(0, 50)]          # session 1
    rows += [(s, "r1", "a.py") for s in range(5000, 5030)]    # session 2
    df = spark.createDataFrame(rows, "seq long, repo string, path string")
    src = str(tmp_path / "sg_src")
    df.write.mode("overwrite").parquet(src)

    out = []
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        sessionize(stream)
        .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "sg_ck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    closed = [r for r in out if r["closed"]]
    open_ = [r for r in out if not r["closed"]]
    assert len(closed) == 1 and closed[0]["session_events"] == 50
    assert closed[0]["first_seq"] == 0 and closed[0]["last_seq"] == 49
    # last open-session emission carries the second burst
    last_open = max(open_, key=lambda r: r["last_seq"])
    assert last_open["session_events"] == 30 and last_open["first_seq"] == 5000


def test_windowed_watermark_counts(spark, tmp_path):
    """Watermarked tumbling windows over a streamed event table must
    converge (append mode: only finalized windows) to the batch window
    aggregation, and the watermark must bound state."""
    import os

    from pyspark.sql import functions as F

    from wrangler_spark.cdc.events import generate_events
    from wrangler_spark.streaming.stateful import windowed_event_counts

    src = str(tmp_path / "wm_src")
    ev = generate_events(spark, 3000, n_repos=5, n_paths_per_repo=10, epoch_size=3000)
    # deterministic event time: one second per seq step from a fixed origin
    ev = ev.withColumn(
        "event_ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("seq"))
    )
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    agg = windowed_event_counts(stream, window_duration="5 minutes",
                                watermark_delay="1 minute")
    rows = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda b, i: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "wm_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {(r["window_start"], r["repo"]): (r["events"], r["last_seq"]) for r in rows}
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window(F.col("event_ts"), "5 minutes"), F.col("repo"))
        .agg(F.count(F.lit(1)).alias("events"), F.max("seq").alias("last_seq"))
        .select(F.col("window.start").alias("ws"), "repo", "events", "last_seq")
    )
    exp_all = {(r["ws"], r["repo"]): (r["events"], r["last_seq"]) for r in batch.collect()}
    # append mode emits only windows the final watermark passed; the
    # last (open) window is withheld — everything emitted must match
    # the batch truth exactly, and most windows must have been emitted
    assert got
    for k, v in got.items():
        assert exp_all[k] == v
    max_ws = max(ws for ws, _ in exp_all)
    assert all(ws < max_ws for ws, _ in got)  # open window withheld
    emitted_windows = {ws for ws, _ in got}
    all_windows = {ws for ws, _ in exp_all}
    assert len(emitted_windows) >= len(all_windows) - 2


def test_windowed_late_epoch_fully_dropped(spark, tmp_path):
    """Late-data edge: a file whose events all lie BEHIND the final
    watermark must contribute nothing — its windows never appear in the
    append output (they are filtered before aggregation, not emitted as
    spurious closed windows)."""
    import time as _time

    from pyspark.sql import functions as F

    from wrangler_spark.streaming.stateful import windowed_event_counts

    t0 = 1_700_000_000
    src = str(tmp_path / "late_src")
    ck = str(tmp_path / "late_ck")
    # run 1: RECENT events advance the watermark (persisted in the
    # checkpoint — the deterministic way to order "recent before late")
    recent = spark.createDataFrame(
        [(s, "r1", "a.py") for s in range(600)], "seq long, repo string, path string"
    ).withColumn("event_ts", F.timestamp_seconds(F.lit(t0 + 100_000) + F.col("seq")))
    recent.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    rows = []

    def run_once():
        agg = windowed_event_counts(
            spark.readStream.schema(schema).parquet(src),
            window_duration="1 minute", watermark_delay="1 minute",
        )
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda b, i: rows.extend(b.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    # run 2: a whole epoch entirely BEHIND the restored watermark
    late = spark.createDataFrame(
        [(s, "r1", "a.py") for s in range(600, 700)], "seq long, repo string, path string"
    ).withColumn("event_ts", F.timestamp_seconds(F.lit(t0) + F.col("seq")))
    late.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(0.1)
    run_once()

    assert rows, "recent windows should have closed"
    import datetime as _dt

    cutoff = _dt.datetime.fromtimestamp(t0 + 100_000, _dt.timezone.utc).replace(tzinfo=None)
    for r in rows:
        ws = r["window_start"]
        if ws.tzinfo is not None:
            ws = ws.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        assert ws >= cutoff, f"late window {ws} leaked into the append output"
    # the recent windows that did close must match batch truth
    batch = (
        recent.groupBy(F.window("event_ts", "1 minute"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(F.col("window.start").alias("ws"), "events")
    )
    truth = {r["ws"]: r["events"] for r in batch.collect()}
    for r in rows:
        assert truth.get(r["window_start"]) == r["events"]


def test_sessionize_closure_across_checkpoint_restart(spark, tmp_path):
    """Stateful session state must survive a checkpoint restart: run a
    query over burst 1 to completion, stop, append burst 2 far past the
    gap, start a FRESH query on the same checkpoint — the closure of
    burst 1 must be emitted by the restarted query (state recovered,
    not recomputed from history)."""
    from wrangler_spark.streaming.stateful import sessionize

    src = str(tmp_path / "sr_src")
    ck = str(tmp_path / "sr_ck")
    burst1 = spark.createDataFrame(
        [(s, "r1", "a.py") for s in range(40)], "seq long, repo string, path string"
    )
    burst1.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        out = []
        q = (
            sessionize(spark.readStream.schema(schema).parquet(src))
            .writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return out

    first = run_once()
    assert [r for r in first if not r["closed"]], "open session expected"
    assert not [r for r in first if r["closed"]]

    burst2 = spark.createDataFrame(
        [(s, "r1", "a.py") for s in range(9000, 9010)], "seq long, repo string, path string"
    )
    burst2.coalesce(1).write.mode("append").parquet(src)
    second = run_once()
    closed = [r for r in second if r["closed"]]
    assert len(closed) == 1
    assert closed[0]["session_events"] == 40
    assert closed[0]["first_seq"] == 0 and closed[0]["last_seq"] == 39
    open_ = [r for r in second if not r["closed"]]
    assert open_ and open_[0]["session_events"] == 10 and open_[0]["first_seq"] == 9000


def test_stream_replay_mor_mode(spark, tmp_path):
    """Streaming front-end in merge-on-read mode: per-batch delta
    commits + compaction cadence converge to the same final state as
    the batch oracle; some batches must actually have taken the delta
    path (pending deltas existed mid-stream or compaction ran)."""
    from wrangler_spark.cdc import generate_events, repo_files_schema
    from wrangler_spark.cdc.events import expected_final_state
    from wrangler_spark.cdc.replay import final_state_sha256
    from wrangler_spark.lake import LakeTable
    from wrangler_spark.streaming import stream_replay

    events = generate_events(spark, 1500, n_repos=6, n_paths_per_repo=10, epoch_size=500)
    src_dir = str(tmp_path / "events_src_mor")
    events.write.mode("overwrite").parquet(src_dir)

    table = LakeTable.create(
        spark, str(tmp_path / "tbl_mor"), repo_files_schema(), ["repo", "path"], num_buckets=4
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    q = stream_replay(
        stream, table, str(tmp_path / "ckpt_mor"), mode="mor", compact_every=2
    )
    q.awaitTermination(120)

    # MoR commits happened: the version log shows delta-bearing
    # snapshots (hydrated — on-disk snapshots are metadata-log diffs)
    import os as _os

    from wrangler_spark.lake.table import _read_snapshot

    meta = _os.path.join(table.path, "_meta")
    had_deltas = any(
        any(
            rels
            for rels in _read_snapshot(
                meta, int(fn[len("version-"):-len(".json")])
            ).get("deltas", {}).values()
        )
        for fn in sorted(_os.listdir(meta))
        if fn.startswith("version-") and fn.endswith(".json")
    )
    assert had_deltas, "no snapshot ever carried pending deltas"

    got = sorted(
        (r["repo"], r["path"], r["content_sha256"])
        for r in final_state_sha256(table.read()).collect()
    )
    want = sorted(
        (r["repo"], r["path"], r["content_sha256"])
        for r in final_state_sha256(expected_final_state(events)).collect()
    )
    assert got == want
