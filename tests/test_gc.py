"""Orphan-file GC and expiry safety (lake/table.py maintenance surface).

Iceberg parity: `remove_orphan_files` (delete on-disk files no retained
snapshot / staged commit / branch references, behind an `older_than`
grace window — RemoveOrphanFilesProcedureTest is the reference shape)
and the staged-commit protection Iceberg gets for free from its
snapshot tree: here a staged WAP snapshot lives OUTSIDE the version
chain, so expiry must read `staged-*.json` explicitly or it would
delete data a later publish() depends on.
"""

import os
import time

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake import LakeTable


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


def seed(spark, table, n=24, epoch=0):
    rows = [
        (epoch * 1000 + i, "insert", f"repo{i % 4}", f"f{i}.py", f"c{i}", "python", f"body{i}")
        for i in range(n)
    ]
    table.merge(ch(spark, rows), epoch=epoch)


def _plant_orphan(table, name, age_s=0.0):
    """Drop an unreferenced file into the data dir (what a crashed or
    CAS-losing writer leaves behind), optionally backdated."""
    full = os.path.join(table.path, "data", name)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(b"orphan-bytes")
    if age_s:
        past = time.time() - age_s
        os.utime(full, (past, past))
    return full


def _state(spark, path):
    t = LakeTable.load(spark, path)
    return sorted((r["repo"], r["path"], r["content"]) for r in t.read().collect())


def test_expire_protects_staged_commit(spark, mk_table):
    """expire_snapshots under a live staged commit must not collect the
    staged data files: publish() afterwards yields a readable table
    containing the staged rows."""
    t = mk_table("gc_staged")
    seed(spark, t, epoch=0)
    seed(spark, t, epoch=1)
    res = t.merge(
        ch(spark, [(9000, "update", "repo1", "f1.py", "c9", "python", "STAGED")]),
        epoch=2,
        staged=True,
    )
    sc = res["staged"]
    staged_rels = sc._new_rels()
    assert staged_rels, "staged commit wrote no files — test shape broke"

    t2 = LakeTable.load(spark, t.path)
    t2.expire_snapshots(keep_last=1)

    for rel in staged_rels:
        assert os.path.exists(os.path.join(t.path, rel)), f"expiry ate staged file {rel}"
    sc.publish()
    rows = {(r["repo"], r["path"]): r["content"] for r in LakeTable.load(spark, t.path).read().collect()}
    assert rows[("repo1", "f1.py")] == "STAGED"
    # and every other seeded row is still intact
    assert len(rows) == 24


def test_expire_grace_protects_inflight_files(spark, mk_table):
    """older_than_s grace: a fresh unreferenced file (a concurrent
    writer mid-commit) survives expiry; with grace 0 it is collected."""
    t = mk_table("gc_grace")
    seed(spark, t)
    fresh = _plant_orphan(t, "inflight-00000.parquet")
    out = t.expire_snapshots(keep_last=1, older_than_s=3600)
    assert os.path.exists(fresh)
    out = t.expire_snapshots(keep_last=1, older_than_s=0)
    assert not os.path.exists(fresh)
    assert out["removed_data_files"] >= 1


def test_remove_orphans_collects_losers_keeps_history(spark, mk_table):
    """remove_orphans deletes only aged unreferenced files; every
    retained snapshot stays time-travelable and table state is
    untouched."""
    t = mk_table("gc_orphans")
    seed(spark, t, epoch=0)
    seed(spark, t, epoch=1)
    before = _state(spark, t.path)
    versions_before = [h["version"] for h in t.history()]

    old = _plant_orphan(t, "v000042-loser/part-0.parquet", age_s=7200)
    fresh = _plant_orphan(t, "v000043-inflight/part-0.parquet")
    # a crash-loser stats sidecar too
    side = os.path.join(t.path, "_meta", "stats-v000042-deadbeef.json")
    with open(side, "w") as f:
        f.write("{}")
    past = time.time() - 7200
    os.utime(side, (past, past))

    out = t.remove_orphans(older_than_s=60)
    assert not os.path.exists(old), "aged orphan not collected"
    assert os.path.exists(fresh), "grace window violated"
    assert not os.path.exists(side), "orphan sidecar not collected"
    assert out["removed_data_files"] == 1 and out["removed_sidecars"] == 1

    t2 = LakeTable.load(spark, t.path)
    assert [h["version"] for h in t2.history()] == versions_before
    assert _state(spark, t.path) == before
    # time travel to v1 still works — no snapshot was expired
    assert LakeTable.load(spark, t.path, version=1).read().count() > 0


def test_remove_orphans_protects_staged_regardless_of_age(spark, mk_table):
    """Staged-commit files are pinned by the live set, not by mtime:
    even backdated past the grace window they survive remove_orphans."""
    t = mk_table("gc_orphan_staged")
    seed(spark, t)
    res = t.merge(
        ch(spark, [(9000, "update", "repo0", "f0.py", "c9", "python", "KEEP")]),
        epoch=1,
        staged=True,
    )
    sc = res["staged"]
    past = time.time() - 10 * 86400
    for rel in sc._new_rels():
        full = os.path.join(t.path, rel)
        if os.path.exists(full):
            os.utime(full, (past, past))
    LakeTable.load(spark, t.path).remove_orphans(older_than_s=86400)
    sc.publish()
    rows = {(r["repo"], r["path"]): r["content"] for r in LakeTable.load(spark, t.path).read().collect()}
    assert rows[("repo0", "f0.py")] == "KEEP"
