"""Merge-on-read (delta-file) path: equivalence with copy-on-write,
cross-batch LWW at read time, compaction, changelog reads, rescale.

Reference parity: the target contract is Iceberg v2 merge-on-read
(equality deletes + rewrite_data_files + changelog/incremental read);
the reference engine itself is transform-only, so these semantics are
specified by the north rule's Iceberg sink, not a reference file.
"""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake.table import LakeTable


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


def snap_rows(table):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["content"])
        for r in table.read().collect()
    )


EPOCHS = [
    # epoch 0: seed
    [
        (10, "insert", "r1", "a.py", "c1", "python", "a0"),
        (11, "insert", "r1", "b.py", "c1", "python", "b0"),
        (12, "insert", "r2", "x.go", "c1", "go", "x0"),
        (13, "insert", "r3", "y.rs", "c1", "rust", "y0"),
    ],
    # epoch 1: update + delete + new key; within-epoch LWW on a.py
    [
        (20, "update", "r1", "a.py", "c2", "python", "a1"),
        (22, "update", "r1", "a.py", "c3", "python", "a2"),
        (21, "delete", "r2", "x.go", None, None, None),
        (23, "insert", "r4", "z.c", "c1", "c", "z0"),
    ],
    # epoch 2: out-of-order seqs vs epoch 1 (cross-batch LWW: the stale
    # update of a.py must lose; the late update of the deleted x.go must
    # NOT resurrect it)
    [
        (15, "update", "r1", "a.py", "c9", "python", "STALE"),
        (14, "update", "r2", "x.go", "c9", "go", "GHOST"),
        (30, "update", "r3", "y.rs", "c2", "rust", "y1"),
    ],
]


def _apply(table, spark, mode, compact_at=None):
    for e, rows in enumerate(EPOCHS):
        table.merge(ch(spark, rows), epoch=e, mode=mode)
        if compact_at is not None and e == compact_at:
            table.compact()


def test_mor_matches_cow_final_state(spark, mk_table):
    cow, mor = mk_table("cow"), mk_table("mor")
    _apply(cow, spark, "cow")
    _apply(mor, spark, "mor")
    assert snap_rows(cow) == snap_rows(mor)
    # the mor table really did take the delta path: base files only from
    # the (empty) create, all data pending in deltas
    assert mor.delta_files()
    assert snap_rows(mor) == [
        ("r1", "a.py", "c3", "a2"),
        ("r1", "b.py", "c1", "b0"),
        ("r3", "y.rs", "c2", "y1"),
        ("r4", "z.c", "c1", "z0"),
    ]


def test_mor_merge_reads_no_base_files(spark, mk_table):
    """The whole point: a mor epoch must not read or rewrite base
    buckets — its committed files are delta-only and base lists stay
    byte-identical."""
    t = mk_table("m")
    t.merge(ch(spark, EPOCHS[0]), epoch=0, mode="mor")
    base_before = dict(t.snap["files"])
    n_before = len(t.delta_files())
    res = t.merge(ch(spark, EPOCHS[1]), epoch=1, mode="mor")
    assert res["mode"] == "mor"
    assert dict(t.snap["files"]) == base_before
    assert len(t.delta_files()) > n_before


def test_compact_preserves_state_and_clears_deltas(spark, mk_table):
    t = mk_table("m")
    _apply(t, spark, "mor")
    before = snap_rows(t)
    v = t.version
    res = t.compact()
    assert res["compacted_buckets"] > 0
    assert t.version == v + 1
    assert t.delta_files() == []
    assert snap_rows(t) == before
    # compaction keeps tombstones so later stale updates still lose
    t.merge(
        ch(spark, [(16, "update", "r2", "x.go", "c9", "go", "GHOST2")]),
        epoch=3,
        mode="mor",
    )
    assert ("r2", "x.go", "c9", "GHOST2") not in snap_rows(t)


def test_mor_mid_stream_compact_matches_cow(spark, mk_table):
    cow, mor = mk_table("cow"), mk_table("mor")
    _apply(cow, spark, "cow")
    _apply(mor, spark, "mor", compact_at=1)  # compact between epochs
    assert snap_rows(cow) == snap_rows(mor)


def test_mor_epoch_fencing_idempotent(spark, mk_table):
    t = mk_table("m")
    r1 = t.merge(ch(spark, EPOCHS[0]), epoch=0, mode="mor")
    n_deltas = len(t.delta_files())
    r2 = t.merge(ch(spark, EPOCHS[0]), epoch=0, mode="mor")
    assert not r1["skipped"] and r2["skipped"]
    assert len(t.delta_files()) == n_deltas


def test_cow_merge_absorbs_pending_deltas(spark, mk_table):
    """A cow merge over a table with pending deltas must resolve them in
    its base read and clear them for the rewritten buckets."""
    t = mk_table("m")
    t.merge(ch(spark, EPOCHS[0]), epoch=0, mode="mor")
    t.merge(ch(spark, EPOCHS[1]), epoch=1, mode="mor")
    # cow epoch over every key's bucket clears all deltas
    t.merge(ch(spark, EPOCHS[2]), epoch=2, mode="cow")
    assert snap_rows(t) == [
        ("r1", "a.py", "c3", "a2"),
        ("r1", "b.py", "c1", "b0"),
        ("r3", "y.rs", "c2", "y1"),
        ("r4", "z.c", "c1", "z0"),
    ]
    # buckets the cow epoch touched dropped their deltas
    touched = {
        r["repo"]
        for r in ch(spark, EPOCHS[2]).collect()
    }
    assert touched  # sanity
    deltas = t.snap.get("deltas", {})
    # every remaining delta bucket must NOT be one the cow merge rewrote
    rewritten = {
        b for b, rels in t.snap["files"].items() if any("v000003" in r for r in rels)
    }
    assert not (set(deltas) & rewritten)


def test_mor_degraded_resolution_path(spark, mk_table):
    """Force the non-broadcast read resolution (property bytes bound = 0)
    and check it returns the same answer as the broadcast path."""
    t = mk_table("m")
    _apply(t, spark, "mor")
    want = snap_rows(t)
    t.snap["properties"]["mor.read.broadcast_bytes"] = 0
    assert snap_rows(t) == want


def test_mor_schema_evolution_add_column(spark, mk_table):
    t = mk_table("m")
    t.merge(ch(spark, EPOCHS[0]), epoch=0, mode="mor")
    wide = ch(spark, [(40, "update", "r1", "a.py", "c5", "python", "a5")]).withColumn(
        "stars", F.lit(7)
    )
    t.merge(wide, epoch=1, mode="mor")
    rows = {(r["repo"], r["path"]): r for r in t.read().collect()}
    assert rows[("r1", "a.py")]["stars"] == 7
    assert rows[("r1", "b.py")]["stars"] is None
    t.compact()
    rows = {(r["repo"], r["path"]): r for r in t.read().collect()}
    assert rows[("r1", "a.py")]["stars"] == 7 and rows[("r1", "b.py")]["stars"] is None


def test_expire_snapshots_keeps_live_deltas(spark, mk_table):
    t = mk_table("m")
    _apply(t, spark, "mor")
    t.expire_snapshots(keep_last=1)
    # pending deltas are referenced by the retained snapshot — intact
    assert snap_rows(t) == [
        ("r1", "a.py", "c3", "a2"),
        ("r1", "b.py", "c1", "b0"),
        ("r3", "y.rs", "c2", "y1"),
        ("r4", "z.c", "c1", "z0"),
    ]
    # after compaction, expiry removes the superseded delta files
    t.compact()
    res = t.expire_snapshots(keep_last=1)
    assert res["removed_data_files"] > 0
    import os

    for f_ in t.all_files():
        assert os.path.exists(f_)


def test_table_changes_diff(spark, mk_table):
    t = mk_table("m")
    t.merge(ch(spark, EPOCHS[0]), epoch=0)
    v0 = t.version
    t.merge(ch(spark, EPOCHS[1]), epoch=1)
    t.merge(ch(spark, EPOCHS[2]), epoch=2)
    got = {
        (r["repo"], r["path"]): (r["_change_op"], r["content"], r["_change_seq"])
        for r in t.table_changes(v0).collect()
    }
    assert got == {
        ("r1", "a.py"): ("update", "a2", 22),
        ("r2", "x.go"): ("delete", None, 21),
        ("r3", "y.rs"): ("update", "y1", 30),
        ("r4", "z.c"): ("insert", "z0", 23),
    }
    # self-diff is empty; full-range diff from the empty table = inserts
    assert t.table_changes(t.version).count() == 0
    full = {
        (r["repo"], r["path"]): r["_change_op"] for r in t.table_changes(0).collect()
    }
    assert full == {
        ("r1", "a.py"): "insert",
        ("r1", "b.py"): "insert",
        ("r3", "y.rs"): "insert",
        ("r4", "z.c"): "insert",
    }


def test_table_changes_sees_through_deltas(spark, mk_table):
    t = mk_table("m")
    t.merge(ch(spark, EPOCHS[0]), epoch=0, mode="mor")
    v0 = t.version
    t.merge(ch(spark, EPOCHS[1]), epoch=1, mode="mor")
    got = {
        (r["repo"], r["path"]): r["_change_op"] for r in t.table_changes(v0).collect()
    }
    assert got == {
        ("r1", "a.py"): "update",
        ("r2", "x.go"): "delete",
        ("r4", "z.c"): "insert",
    }


def test_rescale_preserves_state_and_prunes(spark, mk_table):
    t = mk_table("m")
    _apply(t, spark, "mor")
    before = snap_rows(t)
    res = t.rescale(32)
    assert res["num_buckets"] == 32 and t.num_buckets == 32
    assert t.delta_files() == []
    assert snap_rows(t) == before
    # bucket pruning still finds every key under the new layout
    df = t.read()
    for repo, path, _c, content in before:
        b = df.sparkSession.createDataFrame(
            [(repo, path)], "repo string, path string"
        )
        bucket = b.select(t.bucket_expr(b).alias("b")).first()["b"]
        sub = t.read(buckets=[bucket]).filter(
            (F.col("repo") == repo) & (F.col("path") == path)
        )
        assert sub.count() == 1
    # and merges keep working after the rescale
    t.merge(ch(spark, [(99, "update", "r1", "a.py", "c9", "python", "post")]), epoch=9)
    assert ("r1", "a.py", "c9", "post") in snap_rows(t)


def test_replayer_mor_with_compaction_matches_oracle(spark, tmp_path):
    from wrangler_spark.cdc import Replayer, generate_events, repo_files_schema
    from wrangler_spark.cdc.events import expected_final_state
    from wrangler_spark.cdc.replay import final_state_sha256, state_digest

    events = generate_events(spark, 3000, n_repos=8, n_paths_per_repo=15, epoch_size=500)
    table = LakeTable.create(
        spark, str(tmp_path / "tbl"), repo_files_schema(), ["repo", "path"], num_buckets=8
    )
    rep = Replayer(table, str(tmp_path / "ckpt"), mode="mor", compact_every=3)
    rep.replay(events)
    got = state_digest(final_state_sha256(table.read()))
    want = state_digest(final_state_sha256(expected_final_state(events)))
    assert got == want
    # compaction ran on the 3-epoch cadence (6 epochs → at least once)
    assert len(table.delta_files()) == 0 or table.version > 6


def test_bytes_based_compaction_trigger(spark, mk_table):
    """mor.compact.bytes bounds read amplification independent of the
    commit-count cadence: with no compact_every set, a replayed stream
    must still compact once pending delta bytes exceed the cap."""
    from wrangler_spark.cdc import Replayer

    t = mk_table("tbytes", properties={"mor.compact.bytes": 1})  # any delta trips it
    rp = Replayer(t, str(t.path) + "_ck", mode="mor", compact_every=None)
    for e, rows in enumerate(EPOCHS):
        t.merge(ch(spark, rows), epoch=e, mode="mor")
        # emulate the replayer's post-commit check path directly
    # drive through the replayer proper on a fresh table for the real path
    t2 = mk_table("tbytes2", properties={"mor.compact.bytes": 1})
    import pyspark.sql.functions as F

    ev = (
        ch(spark, [r for rows in EPOCHS for r in rows])
        .withColumn("epoch", (F.col("seq") / 20).cast("long"))
    )
    rp2 = Replayer(t2, str(t2.path) + "_ck", mode="mor", compact_every=None)
    rp2.replay(ev)
    assert not t2.delta_rels(), "bytes trigger should have compacted"
    assert snap_rows(t2) == snap_rows(_cow_reference(spark))


def _cow_reference(spark):
    import tempfile

    from wrangler_spark.lake.table import LakeTable
    from wrangler_spark.cdc.events import repo_files_schema

    ref = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="ref_cow_"), repo_files_schema(),
        ["repo", "path"], num_buckets=8,
    )
    for e, rows in enumerate(EPOCHS):
        ref.merge(ch(spark, rows), epoch=e)
    return ref
