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


def test_max_versions_per_trigger_batches(spark, mk_table, tmp_path):
    """Admission control: with maxVersionsPerTrigger=1, commits landing
    after the run's (uncapped) first microbatch drain one commit per
    trigger, never coalesced."""
    import time

    t = mk_table("ratelim")
    t.merge(ch(spark, E0), epoch=0)

    batches = []
    q = (
        read_stream_changes(
            spark, t.path, starting_version=0, max_versions_per_trigger=1
        )
        .writeStream.foreachBatch(
            lambda b, i: batches.append(
                sorted({r["_commit_version"] for r in b.collect()})
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckr"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and [1] not in batches:
            time.sleep(0.5)
        # backlog lands mid-run: two commits at once
        t.merge(ch(spark, E1), epoch=1)
        t.merge(ch(spark, E2), epoch=2)
        deadline = time.time() + 120
        while time.time() < deadline:
            if sorted(v for b in batches for v in b) == [1, 2, 3]:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    nonempty = [b for b in batches if b]
    # the capped triggers serve versions 2 and 3 in SEPARATE batches
    assert all(len(b) == 1 for b in nonempty), nonempty
    assert sorted(v for b in nonempty for v in b) == [1, 2, 3]


def test_mid_stream_rename_reads_forward_alias(spark, mk_table):
    """A reader constructed BEFORE a rename (schema pinned, as a
    running stream's is) must still read change files committed AFTER
    the rename, via the partition version's alias map inverted."""
    from wrangler_spark.streaming.change_source import LakeChangesStreamReader

    t = mk_table("fwd")
    t.merge(ch(spark, E0), epoch=0)
    reader = LakeChangesStreamReader(t.path, 0)  # schema has `lang`
    t.merge(
        spark.createDataFrame(
            [(50, "update", "r1", "b.py", "c7", "python3", "b9")],
            "seq long, op string, repo string, path string, commit string, "
            "language string, content string",
        ),
        epoch=1,
        renames={"lang": "language"},
    )
    parts = reader.partitions({"version": 1}, {"version": 2})
    rows = [
        r
        for p in parts
        for batch in reader.read(p)
        for r in batch.to_pylist()
    ]
    by_seq = {r["_change_seq"]: r for r in rows}
    assert by_seq[50]["lang"] == "python3"  # new-named file, old stream schema
    assert by_seq[50]["content"] == "b9"


def test_resume_across_rollback_fails_loudly(spark, mk_table, tmp_path):
    """rollback() commits forward with an UNKNOWN change set
    (changes: null) — a stream resuming across it must fail loudly
    (bootstrap from a snapshot read instead), never silently skip the
    rolled-back window."""
    t = mk_table("rb")
    t.merge(ch(spark, E0), epoch=0)
    ck = str(tmp_path / "ckrb")
    assert len(drain(spark, t.path, ck)) == 3

    t.merge(ch(spark, E1), epoch=1)
    t.rollback(1)  # undo epoch 1; new commit, changes unknown
    with pytest.raises(Exception) as ei:
        drain(spark, t.path, ck, timeout=120)
    assert "no change manifest" in str(ei.value)


def test_ending_version_bounds_replay(spark, mk_table, tmp_path):
    """endingVersion (inclusive) caps the replay: commits past it never
    stream, and a later run with the SAME checkpoint but a higher bound
    resumes exactly where the bounded run stopped."""
    t = mk_table("bound")
    t.merge(ch(spark, E0), epoch=0)
    t.merge(ch(spark, E1), epoch=1)
    t.merge(ch(spark, E2), epoch=2)
    ck = str(tmp_path / "ckb")

    def drain_to(end):
        got = []
        q = (
            read_stream_changes(spark, t.path, starting_version=0, ending_version=end)
            .writeStream.foreachBatch(lambda b, i: got.extend(b.collect()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return got

    first = drain_to(1)
    assert {r["_commit_version"] for r in first} == {1}
    second = drain_to(3)
    assert {r["_commit_version"] for r in second} == {2, 3}
