"""Writable branches + fast-forward publish (lake/table.py).

Iceberg refs model (TestBranching / manageSnapshots().createBranch /
fastForwardBranch are the reference shapes): a branch is a named
version chain under `_meta/branch-<name>/` sharing the table's data
files by relpath. Commits to a branch are invisible to main until
fast_forward publishes them through the same snapshot CAS as every
other write — multi-commit staging, generalizing single-commit WAP.
"""

import os

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake import CommitConflictError, LakeTable


@pytest.fixture()
def mk_table(spark, tmp_path):
    def _mk(name, **kw):
        kw.setdefault("num_buckets", 4)
        return LakeTable.create(
            spark, str(tmp_path / name), repo_files_schema(), ["repo", "path"], **kw
        )

    return _mk


def ch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, lang string, content string",
    )


def seed(spark, table, n=16, epoch=0):
    rows = [
        (epoch * 1000 + i, "insert", f"repo{i % 4}", f"f{i}.py", f"c{i}", "python", f"v{epoch}-{i}")
        for i in range(n)
    ]
    table.merge(ch(spark, rows), epoch=epoch)


def _state(t):
    return sorted((r["repo"], r["path"], r["content"]) for r in t.read().collect())


def test_branch_commits_invisible_until_fast_forward(spark, mk_table):
    t = mk_table("br1")
    seed(spark, t, epoch=0)
    main_before = _state(t)
    v_main = t.version

    b = t.create_branch("audit")
    assert t.branches() == ["audit"]
    assert b.version == 0 and _state(b) == main_before
    b.merge(ch(spark, [(2000, "update", "repo1", "f1.py", "cx", "python", "BR-EDIT")]), epoch=1)
    b.merge(ch(spark, [(3000, "insert", "repoZ", "new.py", "cy", "python", "BR-NEW")]), epoch=2)

    # main untouched — on disk and through a fresh load
    assert LakeTable.load(spark, t.path).version == v_main
    assert _state(LakeTable.load(spark, t.path)) == main_before
    # branch sees both commits; epoch fencing holds on the branch
    rows = {(r["repo"], r["path"]): r["content"] for r in LakeTable.load(spark, t.path, branch="audit").read().collect()}
    assert rows[("repo1", "f1.py")] == "BR-EDIT" and rows[("repoZ", "new.py")] == "BR-NEW"
    res = b.merge(ch(spark, [(2000, "update", "repo1", "f1.py", "cx", "python", "DUPE")]), epoch=1)
    assert res.get("skipped"), "branch epoch fencing failed"

    t2 = LakeTable.load(spark, t.path)
    out = t2.fast_forward("audit")
    assert out["commits_folded"] == 2 and out["version"] == v_main + 1
    t3 = LakeTable.load(spark, t.path)
    got = {(r["repo"], r["path"]): r["content"] for r in t3.read().collect()}
    assert got[("repo1", "f1.py")] == "BR-EDIT" and got[("repoZ", "new.py")] == "BR-NEW"
    assert {1, 2} <= set(t3.committed_epochs)


def test_fast_forward_refused_when_main_moved(spark, mk_table):
    t = mk_table("br2")
    seed(spark, t, epoch=0)
    b = t.create_branch("side")
    b.merge(ch(spark, [(2000, "insert", "repoB", "b.py", "c", "python", "B")]), epoch=1)
    seed(spark, LakeTable.load(spark, t.path), epoch=5)  # main advances
    with pytest.raises(CommitConflictError):
        LakeTable.load(spark, t.path).fast_forward("side")


def test_fast_forward_preserves_cdf_and_rebases(spark, mk_table):
    t = mk_table("br3")
    seed(spark, t, epoch=0)
    v0 = t.version
    b = t.create_branch("wip")
    b.merge(ch(spark, [(2000, "update", "repo0", "f0.py", "c", "python", "ONE")]), epoch=1)
    t = LakeTable.load(spark, t.path)
    t.fast_forward("wip")
    # recorded-changes fast path survived the fold: the ff commit's
    # manifest is a concrete list, and the changelog window is O(delta)
    assert t.snap["changes"], "fast-forward lost the CDF manifests"
    w = t.table_changes(from_version=v0)
    touched = {(r["repo"], r["path"]): r["_change_op"] for r in w.collect()}
    assert touched == {("repo0", "f0.py"): "update"}

    # branch rebases automatically: continue committing, second ff folds
    # ONLY the new commit and its CDF window only carries the new key
    b2 = LakeTable.load(spark, t.path, branch="wip")
    assert int(b2.snap["branch_base"]) == t.version
    b2.merge(ch(spark, [(3000, "insert", "repoQ", "q.py", "c", "python", "TWO")]), epoch=2)
    t2 = LakeTable.load(spark, t.path)
    v1 = t2.version
    out = t2.fast_forward("wip")
    assert out["commits_folded"] == 1
    w2 = {(r["repo"], r["path"]) for r in t2.table_changes(from_version=v1).collect()}
    assert w2 == {("repoQ", "q.py")}
    got = {(r["repo"], r["path"]): r["content"] for r in LakeTable.load(spark, t.path).read().collect()}
    assert got[("repo0", "f0.py")] == "ONE" and got[("repoQ", "q.py")] == "TWO"


def test_branch_files_pinned_until_drop(spark, mk_table):
    """expire_snapshots on main must not collect branch-only files; after
    drop_branch they are orphans and ARE collected."""
    t = mk_table("br4")
    seed(spark, t, epoch=0)
    b = t.create_branch("keepme")
    b.merge(ch(spark, [(2000, "insert", "repoX", "x.py", "c", "python", "X")]), epoch=1)
    branch_rels = {
        r for fl in LakeTable.load(spark, t.path, branch="keepme").snap["files"].values() for r in fl
    } - {r for fl in t.snap["files"].values() for r in fl}
    assert branch_rels, "branch merge produced no new files — test shape broke"

    t2 = LakeTable.load(spark, t.path)
    t2.expire_snapshots(keep_last=1)
    for rel in branch_rels:
        assert os.path.exists(os.path.join(t.path, rel)), f"expiry ate branch file {rel}"
    # branch still reads fine
    assert ("repoX", "x.py", "X") in _state(LakeTable.load(spark, t.path, branch="keepme"))

    t2.drop_branch("keepme")
    assert t2.branches() == []
    t2.expire_snapshots(keep_last=1)
    gone = [rel for rel in branch_rels if not os.path.exists(os.path.join(t.path, rel))]
    assert gone, "dropping the branch released nothing"


def test_branch_time_travel_and_validation(spark, mk_table):
    t = mk_table("br5")
    seed(spark, t, epoch=0)
    base = _state(t)
    b = t.create_branch("tt")
    b.merge(ch(spark, [(2000, "update", "repo0", "f0.py", "c", "python", "EDIT")]), epoch=1)
    assert _state(LakeTable.load(spark, t.path, branch="tt", version=0)) == base
    with pytest.raises(ValueError):
        LakeTable.load(spark, t.path, branch="nope")
    with pytest.raises(ValueError):
        t.create_branch("tt")
    with pytest.raises(ValueError):
        t.create_branch("main")
    with pytest.raises(ValueError):
        b.expire_snapshots()
    with pytest.raises(ValueError):
        b.create_branch("nested")


def test_replayer_targets_branch(spark, mk_table, tmp_path):
    """A Replayer pointed at a branch handle replays there: main is
    untouched until fast-forward, then equals the LWW oracle."""
    from wrangler_spark.cdc import generate_events
    from wrangler_spark.cdc.events import expected_final_state
    from wrangler_spark.cdc.replay import Replayer, final_state_sha256

    t = mk_table("br6")
    ev = generate_events(spark, 1200, epoch_size=400)
    b = t.create_branch("ingest")
    r = Replayer(b, str(tmp_path / "ckpt_br"))
    r.replay(ev)
    assert LakeTable.load(spark, t.path).read().count() == 0
    t2 = LakeTable.load(spark, t.path)
    t2.fast_forward("ingest")
    a = {(x["repo"], x["path"]): x["content_sha256"] for x in final_state_sha256(LakeTable.load(spark, t.path).read()).collect()}
    o = {(x["repo"], x["path"]): x["content_sha256"] for x in final_state_sha256(expected_final_state(ev)).collect()}
    assert a == o


def test_cli_branch_roundtrip(spark, mk_table, capsys):
    import json

    from wrangler_spark.cli import main

    t = mk_table("br_cli")
    seed(spark, t, epoch=0)
    assert main(["branch", "--table", t.path, "--create", "rel"]) == 0
    assert main(["branch", "--table", t.path]) == 0
    out = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert out[0] == {"created": "rel", "base": t.version}
    assert out[1] == {"branches": ["rel"]}

    b = LakeTable.load(spark, t.path, branch="rel")
    b.merge(ch(spark, [(2000, "insert", "repoC", "c.py", "c", "python", "C")]), epoch=1)
    assert main(["branch", "--table", t.path, "--ff", "rel"]) == 0
    ff = json.loads(capsys.readouterr().out)
    assert ff["commits_folded"] == 1
    assert ("repoC", "c.py", "C") in _state(LakeTable.load(spark, t.path))
    assert main(["branch", "--table", t.path, "--drop", "rel"]) == 0
    assert json.loads(capsys.readouterr().out) == {"dropped": "rel"}
    assert main(["gc", "--table", t.path, "--older-than", "0"]) == 0
    gc = json.loads(capsys.readouterr().out)
    assert gc["removed_data_files"] >= 0


def test_racing_branch_writers_fast_forward(spark, mk_table):
    """Round-5 (verdict task #7): two branch writers race their
    fast-forward publishes against a concurrently advancing main — the
    CAS surface most likely to hold an untested interleaving. Each
    loser must drop its branch, re-create from the new head, re-apply
    its batch, and retry; exactly one FF can win any given head.
    Disjoint key namespaces make the final state deterministic: it must
    equal the sequential oracle, and the orchestration guarantees the
    conflict path actually fires (both writers branch from the initial
    head, then publish only after main has advanced)."""
    import itertools
    import threading
    import time

    t = mk_table("brrace")
    seed(spark, t, epoch=0)

    stats = {"conflicts": 0}
    lock = threading.Lock()
    failures: list = []
    main_done = threading.Event()
    branched = {tag: threading.Event() for tag in ("a", "b")}
    main_rounds = 3

    def main_writer():
        try:
            # wait until both writers branched off the initial head so
            # their first fast-forward is GUARANTEED stale
            for ev in branched.values():
                assert ev.wait(timeout=120)
            for e in range(1, main_rounds + 1):
                tt = LakeTable.load(spark, t.path)
                while True:
                    try:
                        seed(spark, tt, epoch=e)
                        break
                    except CommitConflictError:
                        with lock:
                            stats["conflicts"] += 1
                        time.sleep(0.05)
                        tt = LakeTable.load(spark, t.path)
        except Exception as exc:  # noqa: BLE001
            failures.append(("main", exc))
        finally:
            main_done.set()

    def branch_writer(tag: str):
        rows = [
            (10_000 + ord(tag), "insert", f"side-{tag}", f"{tag}.py",
             "c", "python", f"payload-{tag}")
        ]
        try:
            for attempt in itertools.count():
                name = f"br_{tag}_{attempt}"
                head = LakeTable.load(spark, t.path)
                br = head.create_branch(name)
                br.merge(ch(spark, rows))
                if attempt == 0:
                    branched[tag].set()
                    assert main_done.wait(timeout=300)
                try:
                    LakeTable.load(spark, t.path).fast_forward(name)
                    return
                except CommitConflictError:
                    with lock:
                        stats["conflicts"] += 1
                    LakeTable.load(spark, t.path).drop_branch(name)
                    time.sleep(0.05)
                if attempt >= 30:
                    raise RuntimeError(f"writer {tag}: no FF win in 30 attempts")
        except Exception as exc:  # noqa: BLE001
            failures.append((tag, exc))

    threads = [threading.Thread(target=main_writer)] + [
        threading.Thread(target=branch_writer, args=(tag,)) for tag in ("a", "b")
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not failures, failures
    # both first publishes were stale by construction; the post-main
    # retries then raced each other, so at least one more conflict OR
    # both landed on distinct heads — the guaranteed floor is 2
    assert stats["conflicts"] >= 2

    final = LakeTable.load(spark, t.path)
    got = {(r["repo"], r["path"]): r["content"] for r in final.read().collect()}
    want = {
        (f"repo{i % 4}", f"f{i}.py"): f"v{main_rounds}-{i}" for i in range(16)
    }
    want[("side-a", "a.py")] = "payload-a"
    want[("side-b", "b.py")] = "payload-b"
    assert got == want
    # the losers cleaned up after themselves: no dangling branch holds
    # a stale base (only the two winning branches may remain, rebased)
    for name in final.branches():
        bt = LakeTable.load(spark, t.path, branch=name)
        assert int(bt.snap["branch_base"]) <= final.version
