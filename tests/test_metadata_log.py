"""Metadata log: per-commit DIFF snapshots + periodic checkpoints.

Snapshot JSONs must be O(touched buckets) per commit, not O(table
files) — the Delta _delta_log add/remove + checkpoint model (Iceberg
solves the same problem with manifest-list reuse). The reference's
pipeline metadata is driver-side Java (wrangler-api RecipePipeline);
this layer has no counterpart there — it exists for the 10^10-event
north rule, where a 10^6-file table must not rewrite ~100 MB of
metadata JSON per commit.

In-memory snapshots stay fully hydrated; only the serialized form
changes, so every reader below (read/scan/time travel/branches/
expiry/rollback) must see identical state through the log.
"""

import json
import os

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake.table import LakeTable, _read_snapshot, _version_path


def ch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


def ins(seq, repo, path, content):
    return (seq, "insert", repo, path, f"c{seq}", "python", content)


def _mk(spark, tmp_path, n_buckets=8, props=None):
    return LakeTable.create(
        spark,
        str(tmp_path / "t"),
        repo_files_schema(),
        ["repo", "path"],
        num_buckets=n_buckets,
        properties=props or {},
    )


def _raw(t, v, branch=None):
    mdir = (
        os.path.join(t.path, "_meta")
        if not branch
        else os.path.join(t.path, "_meta", f"branch-{branch}")
    )
    with open(_version_path(mdir, v)) as f:
        return json.load(f)


def test_sparse_commit_writes_diff_not_full_listing(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=16)
    t.merge(ch(spark, [ins(i, f"r{i}", f"f{i}.py", "c") for i in range(64)]), epoch=0)
    mdir = os.path.join(t.path, "_meta")
    base_size = os.path.getsize(_version_path(mdir, t.version))
    # one-key epoch → one touched bucket → the diff lists ~1 bucket
    t.merge(ch(spark, [ins(1000, "r0", "f0.py", "x")]), epoch=1)
    raw = _raw(t, t.version)
    assert "log" in raw and "files" not in raw and "deltas" not in raw
    assert len(raw["log"]["files"]) <= 2
    assert os.path.getsize(_version_path(mdir, t.version)) < base_size
    # summary counts ride the diff so history() never hydrates
    assert raw["n_files"] == sum(len(v) for v in t.snap["files"].values())
    # hydrated read-back equals the in-memory truth
    assert _read_snapshot(mdir, t.version)["files"] == t.snap["files"]
    h = {x["version"]: x for x in t.history()}
    assert h[t.version]["n_files"] == raw["n_files"]


def test_every_version_hydrates_to_committed_state(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"metadata.checkpoint-interval": "4"})
    want = {}
    for e in range(9):
        t.merge(ch(spark, [ins(e + 1, f"r{e % 3}", "f.py", f"v{e}")]), epoch=e)
        want[t.version] = {b: sorted(r) for b, r in t.snap["files"].items() if r}
    for v, files in want.items():
        got = LakeTable.load(spark, t.path, version=v)
        assert {b: sorted(r) for b, r in got.snap["files"].items() if r} == files
    # checkpoints landed on the interval; diffs elsewhere
    for v in range(1, t.version + 1):
        raw = _raw(t, v)
        assert ("log" not in raw) == (v % 4 == 0), f"v{v}"


def test_expiry_checkpoints_retained_diffs(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"metadata.checkpoint-interval": "50"})
    for e in range(7):
        t.merge(ch(spark, [ins(e + 1, f"r{e}", "f.py", f"v{e}")]), epoch=e)
    pin = t.version - 3
    state_pin = {
        r["repo"] for r in LakeTable.load(spark, t.path, version=pin).read().collect()
    }
    t.tag("audit", pin)  # tag() adds one more (metadata) commit
    head_state = {r["repo"]: r["content"] for r in t.read().collect()}
    t.expire_snapshots(keep_last=2)
    # the pinned diff's chain was cut — it must have been rewritten full
    assert "log" not in _raw(t, pin)
    again = LakeTable.load(spark, t.path, tag="audit")
    assert {r["repo"] for r in again.read().collect()} == state_pin
    head = LakeTable.load(spark, t.path)
    assert {r["repo"]: r["content"] for r in head.read().collect()} == head_state


def test_rollback_to_diff_snapshot(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(ch(spark, [ins(1, "a", "f.py", "old")]), epoch=0)
    v_old = t.version
    t.merge(ch(spark, [ins(2, "a", "f.py", "new")]), epoch=1)
    assert "log" in _raw(t, t.version)
    t.rollback(v_old)
    assert [r["content"] for r in t.read().collect()] == ["old"]
    # and the rollback commit itself round-trips through the log
    re = LakeTable.load(spark, t.path)
    assert [r["content"] for r in re.read().collect()] == ["old"]


def test_branch_chain_and_fast_forward_through_log(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(ch(spark, [ins(1, "a", "f.py", "base")]), epoch=0)
    bt = t.create_branch("wip")
    assert "log" not in _raw(t, 0, branch="wip")  # branch v0 is a checkpoint
    bt.merge(ch(spark, [ins(2, "b", "g.py", "staged")]), epoch=1)
    assert "log" in _raw(t, bt.version, branch="wip")  # branch commits diff too
    assert {r["repo"] for r in t.read().collect()} == {"a"}  # main untouched
    t.fast_forward("wip")
    assert {r["repo"] for r in LakeTable.load(spark, t.path).read().collect()} == {
        "a",
        "b",
    }


def test_mor_deltas_flow_through_log(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(ch(spark, [ins(1, "a", "f.py", "v1")]), epoch=0)
    t.merge(ch(spark, [ins(2, "a", "f.py", "v2")]), epoch=1, mode="mor")
    raw = _raw(t, t.version)
    assert "log" in raw and raw["log"]["deltas"]  # delta appends recorded as diff
    re = LakeTable.load(spark, t.path)
    assert [r["content"] for r in re.read().collect()] == ["v2"]
    t.compact()
    re2 = LakeTable.load(spark, t.path)
    assert not any(re2.snap.get("deltas", {}).values())
    assert [r["content"] for r in re2.read().collect()] == ["v2"]


def test_log_disabled_property_writes_checkpoints(spark, tmp_path):
    t = _mk(spark, tmp_path, props={"metadata.log.enabled": "false"})
    t.merge(ch(spark, [ins(1, "a", "f.py", "x")]), epoch=0)
    t.merge(ch(spark, [ins(2, "b", "f.py", "y")]), epoch=1)
    for v in range(t.version + 1):
        assert "log" not in _raw(t, v)


def test_wap_staged_publish_lands_as_diff(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(ch(spark, [ins(1, "a", "f.py", "x")]), epoch=0)
    res = t.merge(ch(spark, [ins(2, "b", "g.py", "y")]), epoch=1, staged=True)
    res["staged"].publish()
    head = LakeTable.load(spark, t.path)
    assert {r["repo"] for r in head.read().collect()} == {"a", "b"}
    assert "log" in _raw(head, head.version)


def test_random_op_walk_every_retained_version_hydrates(spark, tmp_path):
    """Seeded 22-op walk over merge(cow|mor)/compact/tag/rollback/
    expire/checkpoint_metadata: after every op, EVERY retained version
    must hydrate to exactly the files/deltas state recorded when it was
    committed — the metadata log's one invariant, under arbitrary
    interleavings of diff chains, in-place checkpoint rewrites, expiry
    rewrites and rollbacks."""
    import random

    rng = random.Random(42)
    t = _mk(spark, tmp_path, props={"metadata.checkpoint-interval": "3"})
    mdir = os.path.join(t.path, "_meta")
    recorded: dict[int, tuple] = {}

    def snap_state(s):
        return (
            {b: sorted(r) for b, r in s["files"].items() if r},
            {b: sorted(r) for b, r in s.get("deltas", {}).items() if r},
        )

    def record():
        recorded[t.version] = snap_state(t.snap)

    record()
    seq = [100]
    tagged = []
    for step in range(22):
        op = rng.choice(
            ["cow", "cow", "mor", "mor", "compact", "tag", "rollback",
             "expire", "ckpt"]
        )
        seq[0] += 1
        if op in ("cow", "mor"):
            t.merge(
                ch(spark, [ins(seq[0], f"r{rng.randrange(5)}", "f.py", f"s{step}")]),
                epoch=100 + step,
                mode=op,
            )
            record()
        elif op == "compact":
            t.compact()
            record()
        elif op == "tag":
            name = f"tag{step}"
            t.tag(name)
            tagged.append(name)
            record()
        elif op == "rollback" and t.version >= 2:
            vs = [v for v in recorded if v < t.version and os.path.exists(
                _version_path(mdir, v))]
            if vs:
                t.rollback(rng.choice(vs))
                record()
        elif op == "expire":
            t.expire_snapshots(keep_last=rng.choice([2, 4]))
            recorded_keep = {
                v for v in recorded if os.path.exists(_version_path(mdir, v))
            }
            for v in list(recorded):
                if v not in recorded_keep:
                    del recorded[v]
        elif op == "ckpt":
            t.checkpoint_metadata()
        # the invariant: every retained recorded version hydrates true
        for v, want in recorded.items():
            got = _read_snapshot(mdir, v)
            assert snap_state(got) == want, f"step {step} ({op}): v{v} diverged"
    # and the final resolved read still works end to end
    assert t.read().count() == len(
        {k for k, _ in
         ((r["repo"], r["path"]) for r in t.read().collect())}
    )
