"""Incremental table-to-table replication off the changelog: the lake
table as a CDC source feeding a downstream materialized replica
(Delta readChangeFeed / Iceberg incremental-read shape, applied).

Reference parity: the reference is transform-only; these semantics
derive from the north rule's Iceberg sink + CDC loop.
"""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.cdc import Replicator
from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake.table import LakeTable


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


def state(table):
    return sorted(
        (r["repo"], r["path"], r["content"]) for r in table.read().collect()
    )


EPOCH0 = [
    (10, "insert", "r1", "a.py", "c1", "py", "a0"),
    (11, "insert", "r1", "b.py", "c1", "py", "b0"),
    (12, "insert", "r2", "x.go", "c1", "go", "x0"),
]
EPOCH1 = [
    (20, "update", "r1", "a.py", "c2", "py", "a1"),
    (21, "delete", "r2", "x.go", None, None, None),
    (22, "insert", "r3", "y.rs", "c1", "rust", "y0"),
]


def test_replica_converges_and_is_incremental(spark, mk_table):
    src, dst = mk_table("src1"), mk_table("dst1")
    rep = Replicator(src, dst)
    src.merge(ch(spark, EPOCH0), epoch=0)
    r1 = rep.sync()
    assert not r1["skipped"] and state(dst) == state(src)
    # nothing new → metadata-only skip, replica version untouched
    v = dst.version
    assert rep.sync()["skipped"] and dst.version == v
    # next source epoch (update + delete + insert) flows through,
    # including the tombstone
    src.merge(ch(spark, EPOCH1), epoch=1)
    r2 = rep.sync()
    assert not r2["skipped"]
    assert state(dst) == state(src)
    assert ("r2", "x.go", "x0") not in state(dst)
    # window accounting: second sync started where the first ended
    assert r2["from_version"] >= r1["source_version"]


def test_sync_idempotent_after_crash_between_merge_and_stamp(spark, mk_table):
    """If a prior sync's merge committed but its watermark stamp did
    not (crash), the retry must fence the duplicate merge AND still
    advance the watermark instead of wedging forever."""
    src, dst = mk_table("src2"), mk_table("dst2")
    src.merge(ch(spark, EPOCH0), epoch=0)
    rep = Replicator(src, dst)
    rep.sync()
    # simulate the crash: strip the stamp (fresh handle, stale property)
    dst.commit({}, properties={"replicated_source_version": -1})
    rep2 = Replicator(src, LakeTable.load(spark, dst.path))
    r = rep2.sync()
    assert r["skipped"]  # merge fenced by the replica's committed epoch
    assert (
        int(rep2.replica.snap["properties"]["replicated_source_version"])
        == r["source_version"]
    )
    # and the replica still matches
    assert state(rep2.replica) == state(src)


def test_replication_with_recipe_materialized_view(spark, mk_table):
    """A recipe on the change stream = incremental materialized view:
    the replica holds the TRANSFORMED state, deletes still propagate."""
    src, dst = mk_table("src3"), mk_table("dst3")
    rep = Replicator(src, dst, recipe=["uppercase :lang"])
    src.merge(ch(spark, EPOCH0), epoch=0)
    rep.sync()
    src.merge(ch(spark, EPOCH1), epoch=1)
    rep.sync()
    got = sorted((r["repo"], r["path"], r["lang"]) for r in dst.read().collect())
    want = sorted(
        (r["repo"], r["path"], (r["lang"] or "").upper() or None)
        for r in src.read().collect()
    )
    assert got == want


def test_mor_replica_converges(spark, mk_table):
    src, dst = mk_table("src4"), mk_table("dst4")
    rep = Replicator(src, dst, mode="mor")
    src.merge(ch(spark, EPOCH0), epoch=0)
    rep.sync()
    src.merge(ch(spark, EPOCH1), epoch=1)
    rep.sync()
    assert dst.delta_rels() or True  # deltas may exist pre-compaction
    assert state(LakeTable.load(spark, dst.path)) == state(src)


def test_bootstrap_after_changelog_retention_expired(spark, mk_table):
    """When expire_snapshots dropped the last-synced version's metadata,
    sync falls back to a full-state bootstrap (inserts + tombstone
    deletes with stored seqs) and still converges."""
    src, dst = mk_table("src5"), mk_table("dst5")
    rep = Replicator(src, dst)
    src.merge(ch(spark, EPOCH0), epoch=0)
    rep.sync()
    for e, rows in enumerate([EPOCH1] * 3, start=1):
        rows = [(100 * e + i, op, a, b, c, d, f"{v}@{e}" if v else v)
                for i, (_, op, a, b, c, d, v) in enumerate(rows)]
        src.merge(ch(spark, rows), epoch=e)
    src.expire_snapshots(keep_last=1)  # the synced version's metadata is gone
    r = rep.sync()
    assert not r["skipped"]
    assert state(LakeTable.load(spark, dst.path)) == state(src)


def test_replication_with_recipe_through_mid_stream_rename(spark, mk_table):
    """VERDICT r3 task #8: the read-alias path composed with a
    replication recipe. The source renames a column mid-replication;
    the replica (an incremental materialized view) must follow the
    rename — NOT degrade it into add-column, which would wedge the old
    column at NULL — and keep converging in later windows."""
    src, dst = mk_table("src5"), mk_table("dst5")
    rep = Replicator(src, dst, recipe=["uppercase :content"])
    src.merge(ch(spark, EPOCH0), epoch=0)
    rep.sync()

    # mid-stream: source renames lang -> language (one key touched)
    newschema = (
        "seq long, op string, repo string, path string, commit string, "
        "language string, content string"
    )
    c1 = spark.createDataFrame([(30, "update", "r1", "a.py", "c3", "PY", "a2")], newschema)
    src.merge(c1, epoch=1, renames={"lang": "language"})
    rep.sync()

    replica = LakeTable.load(spark, rep.replica.path)
    names = [f.name for f in replica.schema.fields]
    assert "language" in names and "lang" not in names

    def snap(t, xform):
        return {
            (r["repo"], r["path"]): (r["language"], xform(r["content"]))
            for r in t.read().collect()
        }

    # every key — including those whose replica files predate the
    # rename and resolve through the alias — must match the source,
    # with the recipe's transform applied
    assert snap(replica, lambda c: c) == snap(src, lambda c: c and c.upper())

    # post-rename steady state: the next window still flows
    c2 = spark.createDataFrame(
        [(40, "insert", "r9", "z.py", "c9", "py", "zz"),
         (41, "delete", "r3", "y.rs", None, None, None)],
        newschema,
    )
    src.merge(c2, epoch=2)
    rep.sync()
    replica2 = LakeTable.load(spark, rep.replica.path)
    got = snap(replica2, lambda c: c)
    assert got[("r9", "z.py")] == ("py", "ZZ")
    assert ("r3", "y.rs") not in got
    assert got == snap(src, lambda c: c and c.upper())


def test_stream_sync_converges(spark, mk_table, tmp_path):
    """Continuous replication via the lake-changes streaming source:
    commits landing while the stream runs flow into the replica; a
    restart from the same checkpoint is exactly-once (no double-apply,
    tombstones preserved); a recipe applies per microbatch."""
    src, dst = mk_table("ssrc"), mk_table("sdst")
    src.merge(ch(spark, EPOCH0), epoch=0)
    rep = Replicator(src, dst, recipe=["uppercase :lang"])
    ck = str(tmp_path / "repck")

    q = rep.stream_sync(ck, starting_version=0, trigger={"availableNow": True})
    q.awaitTermination(180)
    got = {
        (r["repo"], r["path"]): (r["lang"], r["content"])
        for r in dst.read().collect()
    }
    assert got == {
        ("r1", "a.py"): ("PY", "a0"),
        ("r1", "b.py"): ("PY", "b0"),
        ("r2", "x.go"): ("GO", "x0"),
    }

    # more source commits; resume the stream from the same checkpoint
    src.merge(ch(spark, EPOCH1), epoch=1)
    q2 = rep.stream_sync(ck, starting_version=0, trigger={"availableNow": True})
    q2.awaitTermination(180)
    got2 = {
        (r["repo"], r["path"]): (r["lang"], r["content"])
        for r in dst.read().collect()
    }
    assert got2 == {
        ("r1", "a.py"): ("PY", "a1"),
        ("r1", "b.py"): ("PY", "b0"),
        ("r3", "y.rs"): ("RUST", "y0"),
    }

    # idle resume: no new commits -> replica state and version unchanged
    v = LakeTable.load(spark, dst.path).version
    q3 = rep.stream_sync(ck, starting_version=0, trigger={"availableNow": True})
    q3.awaitTermination(180)
    assert LakeTable.load(spark, dst.path).version == v

    # batch sync() agrees the replica is caught up (shared watermark)
    assert rep.sync()["skipped"]


def test_recipe_drop_maps_to_replica_drop_column(spark, mk_table):
    """A replication recipe that DROPs a payload column maps to replica
    DROP COLUMN (metadata-only, once) — the replica schema loses the
    field instead of wedging it at NULL for every future winner."""
    src, dst = mk_table("dsrc"), mk_table("ddst")
    rep = Replicator(src, dst, recipe=["drop :lang"])
    src.merge(ch(spark, EPOCH0), epoch=0)
    rep.sync()
    assert "lang" not in [f.name for f in dst.schema.fields]
    got = {(r["repo"], r["path"]): r["content"] for r in dst.read().collect()}
    assert got == {("r1", "a.py"): "a0", ("r1", "b.py"): "b0", ("r2", "x.go"): "x0"}
    # later windows flow with the column already absent (idempotent)
    src.merge(ch(spark, EPOCH1), epoch=1)
    r2 = rep.sync()
    assert not r2["skipped"]
    d2 = LakeTable.load(spark, dst.path)
    assert "lang" not in [f.name for f in d2.schema.fields]
    assert {(r["repo"], r["path"]): r["content"] for r in d2.read().collect()} == {
        ("r1", "a.py"): "a1", ("r1", "b.py"): "b0", ("r3", "y.rs"): "y0"
    }


def test_replica_converges_through_dml_commits(spark, mk_table):
    """DML commits (cow delete, mor delete, update, merge-builder) emit
    CDF change files like merges do — a replica syncing off the
    changelog converges through all four without a bootstrap."""
    src, dst = mk_table("srcdml"), mk_table("dstdml")
    rep = Replicator(src, dst)
    src.merge(ch(spark, EPOCH0), epoch=0)
    rep.sync()
    src.delete_where([("repo", "=", "r2")])                      # cow delete
    src.update_where([("path", "=", "a.py")], {"content": "'A!'"})
    rep.sync()
    assert state(dst) == state(src) == [("r1", "a.py", "A!"), ("r1", "b.py", "b0")]
    src.delete_where([("path", "=", "b.py")], mode="mor")        # mor delete
    msrc = spark.createDataFrame(
        [("r9", "new.py", "fresh")], "repo string, path string, content string"
    )
    src.merge_builder(msrc).when_not_matched_insert().execute()
    rep.sync()
    assert state(dst) == state(src) == [("r1", "a.py", "A!"), ("r9", "new.py", "fresh")]
