"""maintain(): policy-driven compaction/expiry/GC in one metadata-
planned pass (Delta auto-compact + OPTIMIZE bin-packing / Iceberg
maintenance actions), and checkpoint_metadata() (forced metadata-log
checkpoint). The reference has no table-maintenance plane (its output
is a per-pipeline sink); this is north-rule scale machinery — at 10^10
events the compaction worklist must come from snapshot metadata, not a
table scan."""

import json
import os

from pyspark.sql import functions as F

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake.table import LakeTable, _version_path


def ch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


def ins(seq, repo, path, content="x"):
    return (seq, "insert", repo, path, f"c{seq}", "python", content)


def _mk(spark, tmp_path, **kw):
    return LakeTable.create(
        spark, str(tmp_path / "t"), repo_files_schema(), ["repo", "path"],
        num_buckets=4, **kw,
    )


def test_maintain_dry_run_plans_without_touching(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(ch(spark, [ins(1, "a", "f.py")]), epoch=0)
    for e in range(1, 6):  # 5 MoR epochs on one key → 5 deltas in one bucket
        t.merge(ch(spark, [ins(e + 1, "a", "f.py", f"v{e}")]), epoch=e, mode="mor")
    v = t.version
    plan = t.maintain(delta_files_max=4, dry_run=True)
    assert plan["dry_run"] and len(plan["delta_buckets_due"]) == 1
    assert t.version == v  # nothing committed


def test_maintain_compacts_due_buckets_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # pick a second key living in a DIFFERENT bucket from ("a","f.py")
    other = next(
        (f"g{i}.py" for i in range(40)
         if t._bucket_of({"repo": "b", "path": f"g{i}.py"})
         != t._bucket_of({"repo": "a", "path": "f.py"})),
    )
    t.merge(ch(spark, [ins(1, "a", "f.py"), ins(2, "b", other)]), epoch=0)
    for e in range(1, 6):
        t.merge(ch(spark, [ins(e + 2, "a", "f.py", f"v{e}")]), epoch=e, mode="mor")
    # key "b" gets ONE delta — under the threshold, must stay pending
    t.merge(ch(spark, [ins(100, "b", other, "bv")]), epoch=6, mode="mor")
    before = {r["repo"]: r["content"] for r in t.read().collect()}
    out = t.maintain(delta_files_max=4)
    assert out["compact"]["compacted_buckets"] == 1
    after = LakeTable.load(spark, t.path)
    assert {r["repo"]: r["content"] for r in after.read().collect()} == before
    # the under-threshold bucket's delta is untouched
    assert sum(len(v) for v in after.snap["deltas"].values()) == 1


def test_maintain_binpacks_fragmented_buckets(spark, tmp_path):
    t = _mk(
        spark, tmp_path,
        properties={"write.max-records-per-file": "1"},  # force 1 row/file
    )
    t.merge(ch(spark, [ins(i, "a", f"f{i}.py") for i in range(40)]), epoch=0)
    frag = sorted(int(b) for b, r in t.snap["files"].items() if len(r) >= 8)
    assert frag  # the seed actually fragmented at least one bucket
    t.commit({}, properties={"write.max-records-per-file": None}, change_files=[],
             operation="unset-prop")
    out = t.maintain(small_files_max=8)
    after = LakeTable.load(spark, t.path)
    assert out["fragmented_buckets_due"] == frag
    assert all(len(after.snap["files"].get(str(b), [])) <= 2 for b in frag)
    assert after.read().count() == 40


def test_maintain_expiry_and_gc_in_same_pass(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for e in range(4):
        t.merge(ch(spark, [ins(e + 1, f"r{e}", "f.py")]), epoch=e)
    out = t.maintain(expire_keep_last=1, orphan_older_than_s=0.0)
    assert out["expire"]["removed_snapshots"] >= 1
    assert "gc" in out
    assert LakeTable.load(spark, t.path).read().count() == 4


def test_checkpoint_metadata_rewrites_diff_in_place(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(ch(spark, [ins(1, "a", "f.py")]), epoch=0)
    t.merge(ch(spark, [ins(2, "b", "g.py")]), epoch=1)
    mdir = os.path.join(t.path, "_meta")
    with open(_version_path(mdir, t.version)) as f:
        assert "log" in json.load(f)
    res = t.checkpoint_metadata()
    assert res["rewritten"]
    with open(_version_path(mdir, t.version)) as f:
        raw = json.load(f)
    assert "log" not in raw and raw["files"] == t.snap["files"]
    assert t.checkpoint_metadata()["rewritten"] is False  # idempotent
    assert LakeTable.load(spark, t.path).read().count() == 2


def test_maintain_cli_round_trip(spark, tmp_path):
    from wrangler_spark.cli import main as cli

    t = _mk(spark, tmp_path)
    for e in range(5):
        t.merge(ch(spark, [ins(e + 1, "a", "f.py", f"v{e}")]), epoch=e,
                mode="mor" if e else "cow")
    rc = cli(["maintain", "--table", t.path, "--delta-files-max", "4"])
    assert rc == 0
    after = LakeTable.load(spark, t.path)
    assert not any(after.snap["deltas"].values())
    assert [r["content"] for r in after.read().collect()] == ["v4"]


def test_replayer_maintain_cadence(spark, tmp_path):
    """maintain_every=K: the Replayer runs the policy pass every K
    committed epochs — a mor replay with per-epoch deltas ends with the
    overlay folded and (via maintain_opts) history expired."""
    from wrangler_spark.cdc.replay import Replayer

    t = _mk(spark, tmp_path)
    ev = ch(spark, [
        (e * 10 + i, "insert", f"r{i}", "f.py", f"c{e}", "python", f"v{e}")
        for e in range(6) for i in range(3)
    ]).withColumn("epoch", (F.col("seq") / 10).cast("long"))
    r = Replayer(
        t, str(tmp_path / "ckpt"), mode="mor",
        maintain_every=2,
        maintain_opts={"delta_files_max": 1, "expire_keep_last": 3},
    )
    r.replay(ev)
    after = LakeTable.load(spark, t.path)
    # the final maintain pass folded every pending delta (epoch count is
    # a multiple of the cadence) and expiry bounded retained history
    assert not any(after.snap.get("deltas", {}).values())
    retained = [h["version"] for h in after.history()]
    assert len(retained) <= 4  # keep_last=3 (+ the pass's own commit)
    assert {r_["repo"]: r_["content"] for r_ in after.read().collect()} == {
        f"r{i}": "v5" for i in range(3)
    }
