"""Lake changelog as a Structured Streaming source (Python DataSource
API): offsets are snapshot versions, partitions are commit-scoped
change files, rows carry _change_op/_change_seq/_commit_version.

Pins (a) full replay from version 0 matches the per-commit winner sets,
(b) exactly-once resume — a restart from the same checkpoint after new
commits serves ONLY the new window, (c) schema evolution — change files
written before a rename read through the alias map, (d) a manifest-less
window fails loudly rather than silently skipping commits.
"""

import os

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake.table import LakeTable
from wrangler_spark.streaming.change_source import read_stream_changes


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
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


E0 = [
    (10, "insert", "r1", "a.py", "c1", "python", "a0"),
    (11, "insert", "r1", "b.py", "c1", "python", "b0"),
    (12, "insert", "r2", "x.go", "c1", "go", "x0"),
]
E1 = [
    (20, "update", "r1", "a.py", "c2", "python", "a1"),
    (21, "delete", "r2", "x.go", None, None, None),
]
E2 = [
    (30, "insert", "r3", "y.rs", "c1", "rust", "y0"),
]


def drain(spark, path, ckpt, starting_version=0, timeout=180):
    got = []
    q = (
        read_stream_changes(spark, path, starting_version=starting_version)
        .writeStream.foreachBatch(lambda b, i: got.extend(b.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return got


def by_key(rows):
    return {
        (r["repo"], r["path"], r["_commit_version"]): (
            r["_change_op"],
            r["_change_seq"],
            r["content"],
        )
        for r in rows
    }


def test_full_replay_from_v0(spark, mk_table, tmp_path):
    t = mk_table("replay")
    t.merge(ch(spark, E0), epoch=0)
    v1 = t.version
    t.merge(ch(spark, E1), epoch=1)
    v2 = t.version

    rows = drain(spark, t.path, str(tmp_path / "ck0"))
    m = by_key(rows)
    assert m[("r1", "a.py", v1)] == ("upsert", 10, "a0")
    assert m[("r1", "b.py", v1)] == ("upsert", 11, "b0")
    assert m[("r2", "x.go", v1)] == ("upsert", 12, "x0")
    assert m[("r1", "a.py", v2)] == ("upsert", 20, "a1")
    assert m[("r2", "x.go", v2)] == ("delete", 21, None)
    assert len(rows) == 5
    # replaying the resolved stream in order reproduces read()
    final = {}
    for r in sorted(rows, key=lambda r: r["_change_seq"]):
        k = (r["repo"], r["path"])
        if r["_change_op"] == "delete":
            final.pop(k, None)
        else:
            final[k] = r["content"]
    expect = {
        (r["repo"], r["path"]): r["content"] for r in t.read().collect()
    }
    assert final == expect


def test_exactly_once_resume_from_checkpoint(spark, mk_table, tmp_path):
    t = mk_table("resume")
    t.merge(ch(spark, E0), epoch=0)
    t.merge(ch(spark, E1), epoch=1)
    ck = str(tmp_path / "ck1")

    first = drain(spark, t.path, ck)
    assert len(first) == 5

    # new commits land; a restart from the SAME checkpoint must serve
    # only the new window — never re-emit consumed versions
    t.merge(ch(spark, E2), epoch=2)
    v3 = t.version
    second = drain(spark, t.path, ck)
    assert by_key(second) == {("r3", "y.rs", v3): ("upsert", 30, "y0")}

    # and an idle restart serves nothing
    assert drain(spark, t.path, ck) == []


def test_schema_evolution_alias_read(spark, mk_table, tmp_path):
    """Change files written before a rename stream out under the NEW
    name via the alias map (same contract as LakeTable._read_files)."""
    t = mk_table("evolve")
    t.merge(ch(spark, E0), epoch=0)
    t.merge(
        spark.createDataFrame(
            [(40, "update", "r1", "a.py", "c5", "python3", "a9")],
            "seq long, op string, repo string, path string, commit string, "
            "language string, content string",
        ),
        epoch=1,
        renames={"lang": "language"},
    )
    rows = drain(spark, t.path, str(tmp_path / "ck2"))
    langs = {
        (r["repo"], r["path"], r["_change_seq"]): r["language"] for r in rows
    }
    assert langs[("r1", "a.py", 10)] == "python"  # pre-rename file, aliased
    assert langs[("r1", "a.py", 40)] == "python3"
    assert all("lang" not in r.asDict() or "language" in r.asDict() for r in rows)


def test_manifestless_window_fails_loudly(spark, mk_table, tmp_path):
    t = mk_table("gap")
    t.merge(ch(spark, E0), epoch=0)
    # simulate an external/legacy commit with no change manifest
    import json

    p = os.path.join(t.path, "_meta", f"version-{t.version:06d}.json")
    with open(p) as f:
        s = json.load(f)
    s["changes"] = None
    with open(p, "w") as f:
        json.dump(s, f)

    with pytest.raises(Exception) as ei:
        drain(spark, t.path, str(tmp_path / "ck3"), timeout=120)
    assert "no change manifest" in str(ei.value) or "StreamingQueryException" in type(
        ei.value
    ).__name__
