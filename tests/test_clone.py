"""Shallow clone — zero-copy table forks (Delta SHALLOW CLONE semantics).

The invariant under test is INDEPENDENCE over SHARED bytes: after
clone(), the two tables reference the same physical files (hardlinks —
zero data bytes rewritten), yet every mutation on either side — merge,
compact, vacuum — is invisible to the other, because the immutable-file
layout only ever adds files and retires names from its own metadata.

Carried state that must keep working on the clone without any rebuild:
stats sidecars (metadata COUNT(*), scan pruning), CHECK constraints,
pending MoR deltas, and the committed-epoch set (exactly-once fencing).
"""

import os

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake.constraints import ConstraintViolationError
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


def seed(spark, table, n=30, mode="cow", epoch=0, start=0):
    rows = [
        (start + i, "insert", f"repo{i % 3}", f"f{i}.py", f"c{i}", "python", f"body{i}")
        for i in range(n)
    ]
    table.merge(ch(spark, rows), epoch=epoch, mode=mode)
    return rows


def state(table):
    return {
        (r["repo"], r["path"]): r["content"] for r in table.read().collect()
    }


def test_clone_is_zero_copy_and_identical(spark, mk_table, tmp_path):
    t = mk_table("src")
    seed(spark, t, n=30)
    c = t.clone(str(tmp_path / "fork"))
    assert state(c) == state(t)
    # zero-copy: every data file is the SAME inode, link count 2
    rels = [r for rels in c.snap["files"].values() for r in rels]
    assert rels
    for rel in rels:
        s = os.stat(os.path.join(t.path, rel))
        d = os.stat(os.path.join(c.path, rel))
        assert s.st_ino == d.st_ino and s.st_nlink >= 2
    # fresh timeline with provenance
    assert c.version == 0
    assert c.snap["cloned_from"]["version"] == t.version
    # stats sidecars carried → metadata COUNT(*) immediately available
    assert c._count_from_metadata() == 30


def test_copy_mode_duplicates_bytes(spark, mk_table, tmp_path):
    t = mk_table("src2")
    seed(spark, t, n=6)
    c = t.clone(str(tmp_path / "fork2"), mode="copy")
    rel = next(r for rels in c.snap["files"].values() for r in rels)
    assert os.stat(os.path.join(t.path, rel)).st_ino != os.stat(
        os.path.join(c.path, rel)
    ).st_ino
    assert state(c) == state(t)


def test_divergence_both_directions(spark, mk_table, tmp_path):
    t = mk_table("src3")
    seed(spark, t, n=20)
    c = t.clone(str(tmp_path / "fork3"))
    before = state(t)
    # mutate the CLONE: source must not move
    c.merge(ch(spark, [(100, "insert", "repoX", "new.py", "c", "go", "clone-only")]), epoch=1)
    t = LakeTable.load(spark, t.path)
    assert state(t) == before
    c = LakeTable.load(spark, c.path)
    assert ("repoX", "new.py") in state(c)
    # mutate the SOURCE: clone must not move
    t.merge(ch(spark, [(101, "delete", "repo0", "f0.py", None, None, None)]), epoch=1)
    c = LakeTable.load(spark, c.path)
    assert ("repo0", "f0.py") in state(c)
    assert ("repo0", "f0.py") not in state(LakeTable.load(spark, t.path))


def test_source_compact_and_vacuum_cannot_starve_clone(spark, mk_table, tmp_path):
    """After the source compacts and vacuums (unlinking its old file
    NAMES), the clone still reads every row — the shared bytes survive
    until the last hardlink drops."""
    t = mk_table("src4")
    seed(spark, t, n=25)
    t.merge(
        ch(spark, [(50, "update", "repo0", "f0.py", "c", "python", "rewritten")]),
        epoch=1,
        mode="mor",
    )
    c = t.clone(str(tmp_path / "fork4"))
    expect = state(c)
    assert expect[("repo0", "f0.py")] == "rewritten"  # MoR deltas carried
    t.compact()
    t.expire_snapshots(keep_last=1)
    c = LakeTable.load(spark, c.path)
    assert state(c) == expect
    # and the clone's own vacuum doesn't break the source either
    c.compact()
    c.expire_snapshots(keep_last=1)
    assert state(LakeTable.load(spark, t.path)) == expect


def test_constraints_and_epoch_fencing_carry(spark, mk_table, tmp_path):
    t = mk_table("src5")
    seed(spark, t, n=10)
    t.add_constraint("lang_known", "lang IN ('python','go','java')")
    c = t.clone(str(tmp_path / "fork5"))
    # exactly-once fencing: the seed epoch is already committed in the clone
    res = c.merge(ch(spark, [(999, "insert", "z", "z.py", "c", "python", "v")]), epoch=0)
    assert res.get("skipped") is True
    # CHECK constraints enforce on the clone's own writes
    with pytest.raises(ConstraintViolationError):
        c.merge(
            ch(spark, [(200, "insert", "bad", "b.py", "c", "cobol", "v")]),
            epoch=2,
        )


def test_clone_guards(spark, mk_table, tmp_path):
    t = mk_table("src6")
    seed(spark, t, n=4)
    with pytest.raises(ValueError, match="inside the source"):
        t.clone(os.path.join(t.path, "sub"))
    dest = str(tmp_path / "fork6")
    t.clone(dest)
    with pytest.raises(ValueError, match="already exists"):
        t.clone(dest)
