"""Snapshot tags (Iceberg CREATE TAG parity): named immutable refs,
resolved at load time, that PIN their snapshot against
expire_snapshots — the audit-retention story. Tags live in the
snapshot metadata and flow through commits untouched.
"""

import json
import os

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake import LakeTable


def ch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), repo_files_schema(), ["repo", "path"],
        num_buckets=4,
    )
    t.merge(
        ch(spark, [(i, "insert", "r0", f"f{i}.py", "c0", "python", f"v1-{i}") for i in range(8)]),
        epoch=0,
    )
    return t


def _contents(t):
    return {r["path"]: r["content"] for r in t.read().collect()}


def test_tag_resolves_and_is_immutable(spark, table):
    v1 = table.version
    table.tag("audited")
    assert table.tags == {"audited": v1}
    # head moves on; the tag still reads the old state
    table.merge(
        ch(spark, [(100, "update", "r0", "f0.py", "c1", "python", "v2-0")]), epoch=1
    )
    assert _contents(LakeTable.load(spark, table.path, tag="audited"))["f0.py"] == "v1-0"
    assert _contents(LakeTable.load(spark, table.path))["f0.py"] == "v2-0"
    # immutable: re-pointing requires drop + re-create
    with pytest.raises(ValueError, match="already points"):
        table.tag("audited")
    with pytest.raises(ValueError, match="no tag"):
        LakeTable.load(spark, table.path, tag="nope")
    with pytest.raises(ValueError, match="at most one"):
        LakeTable.load(spark, table.path, version=0, tag="audited")
    with pytest.raises(ValueError, match="not retained"):
        table.tag("future", version=999)


def test_tagged_snapshot_survives_expiry(spark, table):
    v1 = table.version
    table.tag("keepme", version=v1)
    for e in range(1, 5):
        table.merge(
            ch(spark, [(100 + e, "update", "r0", "f0.py", f"c{e}", "python", f"v{e}-0")]),
            epoch=e,
        )
    out = table.expire_snapshots(keep_last=1)
    assert v1 in out["kept_versions"]
    # the tagged version still time-travels with its files intact
    old = LakeTable.load(spark, table.path, tag="keepme")
    assert _contents(old)["f0.py"] == "v1-0"
    # untagged intermediates are gone
    assert not os.path.exists(
        os.path.join(table.path, "_meta", f"version-{v1 + 1:06d}.json")
    )
    # drop the tag → next expiry collects it
    cur = LakeTable.load(spark, table.path)
    cur.drop_tag("keepme")
    cur.expire_snapshots(keep_last=1)
    assert not os.path.exists(
        os.path.join(table.path, "_meta", f"version-{v1:06d}.json")
    )
    with pytest.raises(ValueError, match="no tag"):
        LakeTable.load(spark, table.path, tag="keepme")


def test_tags_flow_through_commits_and_describe(spark, table):
    table.tag("t1")
    table.merge(
        ch(spark, [(200, "update", "r0", "f1.py", "cZ", "python", "upd")]), epoch=1
    )
    cur = LakeTable.load(spark, table.path)
    assert "t1" in cur.tags
    assert cur.describe()["tags"] == cur.tags
    with pytest.raises(ValueError, match="no tag"):
        cur.drop_tag("missing")


def test_cli_tag_roundtrip(spark, table, capsys):
    from wrangler_spark.cli import main

    assert main(["tag", "--table", table.path, "--name", "rel"]) == 0
    assert main(["describe", "--table", table.path]) == 0
    out = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert out[0]["tag"] == {"rel": table.version}
    assert out[1]["tags"] == {"rel": table.version}
    assert main(["tag", "--table", table.path, "--name", "rel", "--drop"]) == 0
    assert json.loads(capsys.readouterr().out)["dropped"] == "rel"


def test_timestamp_as_of(spark, table):
    """Iceberg TIMESTAMP AS OF: newest retained commit at-or-before ts."""
    v1 = table.version
    ts1 = table.snap["ts"]
    table.merge(
        ch(spark, [(300, "update", "r0", "f0.py", "cT", "python", "later")]), epoch=1
    )
    ts2 = table.snap["ts"]
    old = LakeTable.load(spark, table.path, as_of_ts=ts1)
    assert old.version == v1
    assert _contents(old)["f0.py"] == "v1-0"
    assert LakeTable.load(spark, table.path, as_of_ts=ts2 + 1).version == table.version
    with pytest.raises(ValueError, match="no retained snapshot"):
        LakeTable.load(spark, table.path, as_of_ts=0.5)
    with pytest.raises(ValueError, match="at most one"):
        LakeTable.load(spark, table.path, version=v1, as_of_ts=ts1)


def test_tag_races_merge_cas(spark, table, tmp_path):
    """A metadata-only tag commit races a real merge THREAD into the
    same table: the CAS admits exactly one writer per version, the
    loser retries after reload, and both effects land — the tag pins a
    real retained version and the merge's rows are present."""
    import threading
    import time as _t

    from wrangler_spark.lake.table import CommitConflictError

    failures = []

    def tagger():
        try:
            for i in range(4):
                while True:
                    t = LakeTable.load(spark, table.path)
                    try:
                        t.tag(f"pin{i}")
                        break
                    except CommitConflictError:
                        _t.sleep(0.02)
        except Exception as exc:  # noqa: BLE001
            failures.append(exc)

    def merger():
        try:
            for e in range(1, 5):
                while True:
                    t = LakeTable.load(spark, table.path)
                    try:
                        t.merge(
                            ch(spark, [(100 + e, "update", "r0", f"f{e}.py",
                                        f"c{e}", "python", f"m{e}")]),
                            epoch=e,
                        )
                        break
                    except CommitConflictError:
                        _t.sleep(0.02)
        except Exception as exc:  # noqa: BLE001
            failures.append(exc)

    th = [threading.Thread(target=tagger), threading.Thread(target=merger)]
    [x.start() for x in th]
    [x.join(timeout=300) for x in th]
    assert not failures, failures
    cur = LakeTable.load(spark, table.path)
    # every tag resolves to a retained, loadable version
    for name, v in cur.tags.items():
        assert LakeTable.load(spark, table.path, tag=name).version == v
    assert set(cur.tags) == {f"pin{i}" for i in range(4)}
    # every merge landed exactly once
    got = _contents(cur)
    for e in range(1, 5):
        assert got[f"f{e}.py"] == f"m{e}"
    assert cur.committed_epochs == {0, 1, 2, 3, 4}
