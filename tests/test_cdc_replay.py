import pytest
from pyspark.sql import functions as F

from wrangler_spark.cdc.events import expected_final_state, generate_events, repo_files_schema
from wrangler_spark.cdc.replay import Replayer, final_state_sha256
from wrangler_spark.lake.table import LakeTable

N_EVENTS = 4000
EPOCH_SIZE = 1000


@pytest.fixture(scope="module")
def events(spark):
    return generate_events(
        spark, N_EVENTS, n_repos=10, n_paths_per_repo=20, epoch_size=EPOCH_SIZE
    ).cache()


def _state_sig(df):
    rows = final_state_sha256(df).collect()
    return sorted((r["repo"], r["path"], r["content_sha256"]) for r in rows)


def _mk(spark, tmp_path, name):
    table = LakeTable.create(
        spark, str(tmp_path / name), repo_files_schema(), ["repo", "path"], num_buckets=8
    )
    rp = Replayer(table, str(tmp_path / f"{name}_ckpt"))
    return table, rp


def test_replay_matches_oracle(spark, events, tmp_path):
    table, rp = _mk(spark, tmp_path, "t1")
    res = rp.replay(events)
    assert res["epochs"] == N_EVENTS // EPOCH_SIZE
    oracle = expected_final_state(events)
    assert _state_sig(table.read()) == _state_sig(oracle)


def test_resume_from_checkpoint(spark, events, tmp_path):
    # replay epochs 0-1, then "crash", then resume all — same final state
    table, rp = _mk(spark, tmp_path, "t2")
    rp.replay(events, to_epoch=1)
    assert rp.load_checkpoint()["last_epoch"] == 1
    rp2 = Replayer(table, rp.checkpoint_dir)  # fresh process
    rp2.replay(events)
    oracle = expected_final_state(events)
    assert _state_sig(table.read()) == _state_sig(oracle)


def test_replaying_everything_again_is_noop(spark, events, tmp_path):
    table, rp = _mk(spark, tmp_path, "t3")
    rp.replay(events)
    v = table.version
    res = rp.replay(events, from_epoch=0)  # ignore checkpoint: full replay
    assert res["skipped_epochs"] == res["epochs"]
    assert table.version == v


def test_watermarks_monotonic(spark, events, tmp_path):
    table, rp = _mk(spark, tmp_path, "t4")
    rp.replay(events)
    ck = rp.load_checkpoint()
    assert ck["last_epoch"] == N_EVENTS // EPOCH_SIZE - 1
    assert all(int(v) <= N_EVENTS - 1 for v in ck["watermarks"].values())
    assert max(int(v) for v in ck["watermarks"].values()) == N_EVENTS - 1


def test_replay_with_recipe(spark, events, tmp_path):
    """Recipe plane: mask SSN-ish digits in content during ingest."""
    table = LakeTable.create(
        spark, str(tmp_path / "t5"), repo_files_schema(), ["repo", "path"], num_buckets=8
    )
    rp = Replayer(
        table,
        str(tmp_path / "t5_ckpt"),
        recipe=["find-and-replace :content 's/ssn: \\d{3}-\\d{2}-\\d{4}/ssn: MASKED/g'"],
    )
    rp.replay(events, to_epoch=0)
    got = table.read().filter(F.col("content").contains("ssn:")).first()
    assert "ssn: MASKED" in got["content"]
    assert "000-00-" not in got["content"]


def test_lineage_metrics_written(spark, events, tmp_path):
    import json, os

    table, rp = _mk(spark, tmp_path, "t6")
    rp.replay(events, to_epoch=1)
    path = os.path.join(rp.checkpoint_dir, "lineage.jsonl")
    recs = [json.loads(line) for line in open(path)]
    assert len(recs) == 2
    assert {"events", "inserts", "updates", "deletes", "epoch"} <= set(recs[0])
    assert recs[0]["events"] == EPOCH_SIZE


def test_per_partition_lineage(spark, events, tmp_path):
    """North rule: per-source-partition lineage (events applied, op
    breakdown, high-watermark) is emitted for every epoch."""
    import json, os

    table, rp = _mk(spark, tmp_path, "t7")
    rp.replay(events, to_epoch=0)
    path = os.path.join(rp.checkpoint_dir, "lineage.jsonl")
    rec = json.loads(open(path).readline())
    parts = rec["partitions"]
    assert parts, "expected per-partition lineage"
    # partition counts must sum to the epoch totals
    assert sum(p["events"] for p in parts.values()) == rec["events"]
    assert sum(p["inserts"] for p in parts.values()) == rec["inserts"]
    assert sum(p["deletes"] for p in parts.values()) == rec["deletes"]
    # watermarks: each partition's hwm is a real seq within the epoch,
    # and the checkpoint carries the same values
    for p in parts.values():
        assert 0 <= p["hwm"] < EPOCH_SIZE
        assert {"events", "inserts", "updates", "deletes", "hwm"} <= set(p)
    ckpt = rp.load_checkpoint()
    assert {k: v["hwm"] for k, v in parts.items()} == {
        k: v for k, v in ckpt["watermarks"].items() if k in parts
    }
