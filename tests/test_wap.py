"""Write-Audit-Publish staged commits (lake/wap.py).

Iceberg WAP pattern over this lake's snapshot CAS: stage a merge
invisibly, audit the RESOLVED staged state, publish atomically or
abort without a trace. Composes with epoch fencing (exactly-once),
merge-on-read mode, and concurrent-writer conflict detection.
"""

import os

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake import AuditError, CommitConflictError, LakeTable, StagedCommit


@pytest.fixture()
def mk_table(spark, tmp_path):
    def _mk(name, **kw):
        kw.setdefault("num_buckets", 8)
        return LakeTable.create(
            spark, str(tmp_path / name), repo_files_schema(), ["repo", "path"], **kw
        )

    return _mk


def ch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, lang string, content string",
    )


def seed(spark, table, n=40, mode="cow"):
    rows = [
        (i, "insert", f"repo{i % 10}", f"f{i}.py", f"c{i}", "python", f"body{i:03d}")
        for i in range(n)
    ]
    table.merge(ch(spark, rows), epoch=0, mode=mode)
    return rows


def _state(spark, path):
    t = LakeTable.load(spark, path)
    return sorted(
        (r["repo"], r["path"], r["content"]) for r in t.read().collect()
    )


def test_staged_merge_invisible_until_publish(spark, mk_table):
    t = mk_table("w1")
    seed(spark, t)
    before = _state(spark, t.path)
    v0 = t.version

    res = t.merge(
        ch(spark, [(100, "update", "repo1", "f1.py", "c100", "python", "NEW")]),
        epoch=1,
        staged=True,
    )
    sc = res["staged"]
    assert isinstance(sc, StagedCommit)
    assert res["version"] == v0 + 1
    # committed state unchanged: fresh loads and the writer handle both
    # still see the pre-merge table at the old version
    assert LakeTable.load(spark, t.path).version == v0
    assert _state(spark, t.path) == before
    # the epoch is NOT fenced until published — a direct replay of the
    # same epoch would still apply
    assert 1 not in LakeTable.load(spark, t.path).committed_epochs

    out = sc.publish()
    assert out == {"version": v0 + 1, "published": True}
    t2 = LakeTable.load(spark, t.path)
    assert t2.version == v0 + 1
    assert 1 in t2.committed_epochs
    rows = {(r["repo"], r["path"]): r["content"] for r in t2.read().collect()}
    assert rows[("repo1", "f1.py")] == "NEW"


def test_staged_table_view_reads_post_merge_state(spark, mk_table):
    t = mk_table("w2")
    seed(spark, t)
    res = t.merge(
        ch(
            spark,
            [
                (200, "update", "repo2", "f2.py", "c200", "python", "STAGED"),
                (201, "delete", "repo3", "f3.py", None, None, None),
            ],
        ),
        epoch=1,
        staged=True,
    )
    sc = res["staged"]
    view = {(r["repo"], r["path"]): r["content"] for r in sc.table().read().collect()}
    assert view[("repo2", "f2.py")] == "STAGED"
    assert ("repo3", "f3.py") not in view  # tombstone resolved away
    sc.abort()


def test_audit_expectations_and_row_bounds(spark, mk_table):
    t = mk_table("w3")
    seed(spark, t)
    res = t.merge(
        ch(spark, [(300, "update", "repo4", "f4.py", "c300", "python", "")]),
        epoch=1,
        staged=True,
    )
    sc = res["staged"]
    a = sc.audit(
        expectations={
            "content_present": "content IS NOT NULL",
            "content_nonempty": "length(content) > 0",  # the new row violates
            "lang_known": "lang IN ('python','java','markdown','json','csv')",
        },
        min_rows=1,
    )
    assert a["rows"] == 40
    assert a["violations"] == {
        "content_present": 0,
        "content_nonempty": 1,
        "lang_known": 0,
    }
    assert a["ok"] is False
    with pytest.raises(AuditError):
        sc.publish(require_audit=True)
    # an unguarded publish is still allowed (audit is advisory unless
    # require_audit) — but here we abort instead
    sc.abort()
    assert LakeTable.load(spark, t.path).version == 1

    # a clean epoch audits green and publishes under require_audit
    res2 = t.merge(
        ch(spark, [(301, "update", "repo4", "f4.py", "c301", "python", "ok")]),
        epoch=2,
        staged=True,
    )
    sc2 = res2["staged"]
    assert sc2.audit(
        expectations={"content_nonempty": "length(content) > 0"}, min_rows=40, max_rows=40
    )["ok"]
    sc2.publish(require_audit=True)
    assert LakeTable.load(spark, t.path).version == 2


def test_abort_removes_every_new_file_and_only_those(spark, mk_table):
    t = mk_table("w4", properties={"bloom.cols": "path"})
    seed(spark, t)

    def _all_files(path):
        out = set()
        for root, _dirs, files in os.walk(path):
            for fn in files:
                out.add(os.path.relpath(os.path.join(root, fn), path))
        return out

    before = _all_files(t.path)
    res = t.merge(
        ch(spark, [(400, "insert", "repoX", "new.py", "c400", "python", "x")]),
        epoch=1,
        staged=True,
    )
    sc = res["staged"]
    staged_files = _all_files(t.path)
    assert staged_files > before  # data + change files + staged json exist
    out = sc.abort()
    assert out["aborted"] and out["files_removed"] > 0
    # back to exactly the pre-stage file set (modulo refreshed VERSION
    # mtime; content set identical)
    assert _all_files(t.path) == before
    # committed reads still work and see the seed state
    assert LakeTable.load(spark, t.path).read().count() == 40


def test_staged_mor_merge_and_changelog(spark, mk_table):
    t = mk_table("w5")
    seed(spark, t, mode="mor")
    res = t.merge(
        ch(spark, [(500, "update", "repo5", "f5.py", "c500", "python", "MOR")]),
        epoch=1,
        mode="mor",
        staged=True,
    )
    sc = res["staged"]
    assert LakeTable.load(spark, t.path).version == 1
    sc.publish()
    t2 = LakeTable.load(spark, t.path)
    rows = {(r["repo"], r["path"]): r["content"] for r in t2.read().collect()}
    assert rows[("repo5", "f5.py")] == "MOR"
    # the published staged commit serves the incremental changelog just
    # like a direct one (commit-scoped change files survived staging)
    chg = t2.table_changes(1, 2).collect()
    assert [(r["repo"], r["path"]) for r in chg] == [("repo5", "f5.py")]


def test_publish_conflict_with_concurrent_writer(spark, mk_table):
    t = mk_table("w6")
    seed(spark, t)
    stale = LakeTable.load(spark, t.path)
    res = stale.merge(
        ch(spark, [(600, "update", "repo6", "f6.py", "c600", "python", "STAGED")]),
        epoch=1,
        staged=True,
    )
    sc = res["staged"]
    # another writer publishes first
    t.merge(
        ch(spark, [(601, "update", "repo7", "f7.py", "c601", "python", "RACE")]),
        epoch=2,
    )
    with pytest.raises(CommitConflictError):
        sc.publish()
    # losing stage aborts cleanly; winner's state intact
    sc.abort()
    rows = {(r["repo"], r["path"]): r["content"] for r in LakeTable.load(spark, t.path).read().collect()}
    assert rows[("repo7", "f7.py")] == "RACE"
    assert rows[("repo6", "f6.py")] == "body006"


def test_staged_commit_recoverable_by_id(spark, mk_table):
    t = mk_table("w7")
    seed(spark, t)
    res = t.merge(
        ch(spark, [(700, "update", "repo8", "f8.py", "c700", "python", "RELOADED")]),
        epoch=1,
        staged=True,
    )
    stage_id = res["staged"].stage_id
    assert StagedCommit.list_staged(t.path) == [stage_id]
    # a different process (fresh handle) picks the stage up and finishes
    sc = StagedCommit.load(spark, t.path, stage_id)
    assert sc.audit(expectations={"c": "content IS NOT NULL"})["ok"]
    sc.publish(require_audit=True)
    assert StagedCommit.list_staged(t.path) == []
    rows = {(r["repo"], r["path"]): r["content"] for r in LakeTable.load(spark, t.path).read().collect()}
    assert rows[("repo8", "f8.py")] == "RELOADED"


# ------------------------------------------------------------ replayer gate
def test_replayer_audit_gate(spark, tmp_path):
    """An audited replay fences a poisoned epoch BEFORE readers see it,
    leaves the checkpoint unadvanced, and — after the upstream fix —
    converges to exactly the state an un-audited replay produces."""
    from wrangler_spark.cdc.events import generate_events
    from wrangler_spark.cdc.replay import Replayer, final_state_sha256
    from wrangler_spark.lake.wap import AuditError as WapAuditError

    events = generate_events(
        spark, 2000, n_repos=10, n_paths_per_repo=20, epoch_size=500
    ).cache()
    # poison epoch 2: null out content on its update events
    from pyspark.sql import functions as F

    poisoned = events.withColumn(
        "content",
        F.when(
            (F.col("epoch") == 2) & (F.col("op") != "delete"), F.lit(None)
        ).otherwise(F.col("content")),
    )

    expectations = {"content_present": "content IS NOT NULL"}

    t = LakeTable.create(
        spark, str(tmp_path / "ga"), repo_files_schema(), ["repo", "path"], num_buckets=8
    )
    rp = Replayer(t, str(tmp_path / "ga_ckpt"), audit=expectations)
    with pytest.raises(WapAuditError):
        rp.replay(poisoned)
    # epochs 0-1 published and checkpointed; epoch 2 fenced out entirely
    assert rp.load_checkpoint()["last_epoch"] == 1
    cur = LakeTable.load(spark, t.path)
    assert cur.version == 2  # create + 2 published epochs
    assert 2 not in cur.committed_epochs
    assert cur.read().filter("content IS NULL").count() == 0

    # upstream fixed: same replayer object resumes with the clean feed
    res = rp.replay(events)
    assert res["epochs"] == 2  # epochs 2 and 3

    # oracle: an un-audited replay of the clean feed from scratch
    t2 = LakeTable.create(
        spark, str(tmp_path / "gb"), repo_files_schema(), ["repo", "path"], num_buckets=8
    )
    Replayer(t2, str(tmp_path / "gb_ckpt")).replay(events)

    def sig(table):
        return sorted(
            (r["repo"], r["path"], r["content_sha256"])
            for r in final_state_sha256(LakeTable.load(spark, table.path).read()).collect()
        )

    assert sig(t) == sig(t2)
    events.unpersist()
