"""Commit-scoped change-data files (Delta CDF / Iceberg changelog-scan
equivalent): every merge commit persists its winner set as a change
manifest, so `table_changes` over a recorded window reads O(window
changes) + a bucket-pruned skinny v0 probe — never a full snapshot
diff. These tests pin (a) equivalence with the diff fallback, (b) the
pruning claim via inputFiles(), (c) graceful fallback for windows
containing a manifest-less commit.
"""

import json
import os

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
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


EPOCHS = [
    [
        (10, "insert", "r1", "a.py", "c1", "python", "a0"),
        (11, "insert", "r1", "b.py", "c1", "python", "b0"),
        (12, "insert", "r2", "x.go", "c1", "go", "x0"),
        (13, "insert", "r3", "y.rs", "c1", "rust", "y0"),
    ],
    [
        (20, "update", "r1", "a.py", "c2", "python", "a1"),
        (22, "update", "r1", "a.py", "c3", "python", "a2"),
        (21, "delete", "r2", "x.go", None, None, None),
        (23, "insert", "r4", "z.c", "c1", "c", "z0"),
    ],
    [
        (15, "update", "r1", "a.py", "c9", "python", "STALE"),
        (14, "update", "r2", "x.go", "c9", "go", "GHOST"),
        (30, "update", "r3", "y.rs", "c2", "rust", "y1"),
    ],
]


def changes_map(df):
    return {
        (r["repo"], r["path"]): (r["_change_op"], r["content"], r["_change_seq"])
        for r in df.collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_fast_path_matches_diff_fallback(spark, mk_table, mode):
    t = mk_table(f"eq_{mode}")
    t.merge(ch(spark, EPOCHS[0]), epoch=0, mode=mode)
    v0 = t.version
    t.merge(ch(spark, EPOCHS[1]), epoch=1, mode=mode)
    if mode == "mor":
        t.compact()  # empty-manifest commit mid-window
    t.merge(ch(spark, EPOCHS[2]), epoch=2, mode=mode)
    # every window commit recorded a manifest
    meta = os.path.join(t.path, "_meta")
    for v in range(v0 + 1, t.version + 1):
        with open(os.path.join(meta, f"version-{v:06d}.json")) as f:
            assert json.load(f).get("changes") is not None, f"v{v} missing manifest"
    fast = changes_map(t.table_changes(v0))
    diff = changes_map(t._table_changes_diff(v0, t.version))
    assert fast == diff
    assert fast == {
        ("r1", "a.py"): ("update", "a2", 22),
        ("r2", "x.go"): ("delete", None, 21),
        ("r3", "y.rs"): ("update", "y1", 30),
        ("r4", "z.c"): ("insert", "z0", 23),
    }
    # from the empty table: net inserts only
    assert {k: v[0] for k, v in changes_map(t.table_changes(0)).items()} == {
        ("r1", "a.py"): "insert",
        ("r1", "b.py"): "insert",
        ("r3", "y.rs"): "insert",
        ("r4", "z.c"): "insert",
    }


def test_fast_path_prunes_untouched_buckets(spark, mk_table):
    """The scale claim: a small window over a big table must not read
    base files of buckets the window never touched."""
    t = mk_table("prune", num_buckets=16)
    seed = [
        (i, "insert", f"r{i % 50}", f"f{i}.py", "c1", "python", f"body{i}")
        for i in range(400)
    ]
    t.merge(ch(spark, seed), epoch=0)
    v0 = t.version
    t.merge(
        ch(spark, [(1000, "update", "r1", "f1.py", "c2", "python", "NEW")]), epoch=1
    )
    changes = t.table_changes(v0)
    got = changes_map(changes)
    assert got == {("r1", "f1.py"): ("update", "NEW", 1000)}
    read = set(changes.inputFiles())
    old = LakeTable.load(spark, t.path, version=v0)
    all_base = set(old.all_files())
    touched_b = old._bucket_of({"repo": "r1", "path": "f1.py"})
    allowed = set(old.bucket_files([touched_b]))
    overread = {f for f in read if f in all_base and f not in allowed}
    assert not overread, f"fast path read untouched base files: {overread}"
    # and it really did skip most of the table
    assert len(read & all_base) < len(all_base)


def test_window_with_unknown_commit_falls_back(spark, mk_table):
    t = mk_table("fb")
    t.merge(ch(spark, EPOCHS[0]), epoch=0)
    v0 = t.version
    t.merge(ch(spark, EPOCHS[1]), epoch=1)
    # simulate an external/pre-feature writer: null out one manifest
    meta = os.path.join(t.path, "_meta", f"version-{t.version:06d}.json")
    with open(meta) as f:
        snap = json.load(f)
    snap["changes"] = None
    with open(meta, "w") as f:
        json.dump(snap, f)
    t2 = LakeTable.load(spark, t.path)
    got = {k: v[0] for k, v in changes_map(t2.table_changes(v0)).items()}
    assert got == {
        ("r1", "a.py"): "update",
        ("r2", "x.go"): "delete",
        ("r4", "z.c"): "insert",
    }


def test_fast_path_across_schema_evolution(spark, mk_table):
    t = mk_table("evo")
    t.merge(ch(spark, EPOCHS[0]), epoch=0)
    v0 = t.version
    wide = spark.createDataFrame(
        [(40, "update", "r1", "a.py", "c2", "python", "a1", 99)],
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string, stars long",
    )
    t.merge(wide, epoch=1)
    got = changes_map(t.table_changes(v0))
    assert got == {("r1", "a.py"): ("update", "a1", 40)}
    row = t.table_changes(v0).collect()[0]
    assert row["stars"] == 99


def test_fast_path_tombstone_not_resurrected_and_retry_dropped(spark, mk_table):
    t = mk_table("ghost")
    t.merge(ch(spark, EPOCHS[0]), epoch=0)
    v0 = t.version
    # stale update (seq 9 < stored 10) + exact retry of a stored row:
    # neither changes resolved state → empty changelog
    t.merge(
        ch(spark, [
            (9, "update", "r1", "a.py", "c0", "python", "OLD"),
            (10, "insert", "r1", "a.py", "c1", "python", "a0"),
        ]),
        epoch=1,
    )
    assert t.table_changes(v0).count() == 0


def test_changelog_disabled_property_falls_back(spark, mk_table):
    t = mk_table("off", properties={"changelog.enabled": "false"})
    t.merge(ch(spark, EPOCHS[0]), epoch=0)
    v0 = t.version
    t.merge(ch(spark, EPOCHS[1]), epoch=1)
    snap_changes = t.snap.get("changes")
    assert snap_changes is None  # cow merge recorded no manifest
    got = {k: v[0] for k, v in changes_map(t.table_changes(v0)).items()}
    assert got == {
        ("r1", "a.py"): "update",
        ("r2", "x.go"): "delete",
        ("r4", "z.c"): "insert",
    }


def test_expire_keeps_retained_change_files(spark, mk_table):
    t = mk_table("ret")
    t.merge(ch(spark, EPOCHS[0]), epoch=0)
    t.merge(ch(spark, EPOCHS[1]), epoch=1)
    v_mid = t.version
    t.merge(ch(spark, EPOCHS[2]), epoch=2)
    t.expire_snapshots(keep_last=2)
    # window fully inside retained versions still reads fast
    got = changes_map(t.table_changes(v_mid))
    assert got == {("r3", "y.rs"): ("update", "y1", 30)}


def test_cow_change_files_are_post_image(spark, mk_table):
    """A cow commit's change manifest must hold only rows that BEAT the
    base (Delta CDF post-image): a stale candidate (lower seq than the
    base row — including a base TOMBSTONE for a never-visible key) must
    not appear, or a streaming consumer that never materialized the
    tombstone would resurrect the key."""
    t = mk_table("postimg")
    t.merge(ch(spark, [
        (10, "insert", "r1", "a.py", "c1", "python", "a0"),
        (90, "insert", "r9", "z.py", "c1", "python", "z0"),
        (99, "delete", "r9", "z.py", None, None, None),  # never-visible key
    ]), epoch=0)
    # epoch 1: one real update + one stale update + one stale-vs-tombstone
    t.merge(ch(spark, [
        (20, "update", "r1", "a.py", "c2", "python", "a1"),
        (5, "update", "r1", "a.py", "c0", "python", "STALE"),
        (50, "update", "r9", "z.py", "c9", "python", "GHOST"),  # < 99
    ]), epoch=1)
    rels = t.snap.get("changes")
    assert rels
    cdf = spark.read.parquet(*[os.path.join(t.path, r) for r in rels])
    rows = {(r["repo"], r["path"]): (r["__seq"], r["content"]) for r in cdf.collect()}
    assert rows == {("r1", "a.py"): (20, "a1")}  # no STALE, no GHOST
