"""Predicate DML (DELETE / UPDATE WHERE) + general MERGE builder.

Semantics bar: Delta Lake `DeltaTable.delete/update/merge` and Iceberg
copy-on-write row-level DML (the reference engine is transform-only;
the north rule's Iceberg sink implies this surface). The scale
invariants — file-granular rewrites planned from metadata, tombstones
fencing late CDC events, changelog continuity — are asserted directly.
"""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake.dml import MergeConflictError
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


def seed(spark, table, n=40, mode="cow"):
    rows = [
        (
            i,
            "insert",
            f"repo{i % 4}",
            f"f{i}.py",
            f"c{i}",
            "python" if i % 2 == 0 else "go",
            f"body{i:03d}",
        )
        for i in range(n)
    ]
    table.merge(ch(spark, rows), epoch=0, mode=mode)
    return rows


def live(table):
    return {
        (r["repo"], r["path"]): (r["lang"], r["content"])
        for r in table.read().collect()
    }


# --------------------------------------------------------------- DELETE


def test_delete_where_removes_matching_rows(spark, mk_table):
    t = mk_table("d1")
    rows = seed(spark, t)
    m = t.delete_where([("lang", "=", "go")])
    assert m["committed"] and m["rows"] == sum(1 for r in rows if r[5] == "go")
    got = live(t)
    assert len(got) == sum(1 for r in rows if r[5] == "python")
    assert all(v[0] == "python" for v in got.values())


def test_delete_nomatch_is_a_noop(spark, mk_table):
    t = mk_table("d2")
    seed(spark, t)
    v0 = t.version
    m = t.delete_where([("lang", "=", "rust")])
    assert m["committed"] is False and m["rows"] == 0
    assert t.version == v0


def test_delete_refuses_unfiltered(spark, mk_table):
    t = mk_table("d3")
    seed(spark, t)
    with pytest.raises(ValueError, match="unfiltered"):
        t.delete_where([])


def test_delete_is_file_granular(spark, mk_table):
    """Sorted, split files + a narrow range predicate: only the files
    whose stats admit the range are rewritten; every other file
    carries over by reference (same relpath in the new snapshot)."""
    t = mk_table(
        "d4",
        num_buckets=1,
        properties={"write.sort.cols": "content", "write.max-records-per-file": 10},
    )
    seed(spark, t, n=80)
    before = set(t.snap["files"]["0"])
    assert len(before) >= 6
    m = t.delete_where([("content", ">=", "body000"), ("content", "<=", "body004")])
    assert m["committed"] and m["rows"] == 5
    assert m["files_rewritten"] <= 2
    assert m["files_stat_skipped"] >= len(before) - 2
    after = set(t.snap["files"]["0"])
    # untouched files carried over by reference
    assert len(before & after) == len(before) - m["files_rewritten"]
    assert ("repo0", "f0.py") not in live(t) and ("repo1", "f5.py") in live(t)


def test_delete_tombstone_fences_late_events(spark, mk_table):
    """A change event replayed AFTER the DML with a lower seq must not
    resurrect the deleted key (the DML stamped max_seq+1)."""
    t = mk_table("d5")
    seed(spark, t, n=10)
    t.delete_where([("repo", "=", "repo1"), ("path", "=", "f1.py")])
    stale = ch(spark, [(5, "update", "repo1", "f1.py", "cX", "python", "LATE")])
    t.merge(stale, epoch=1)
    assert ("repo1", "f1.py") not in live(t)
    fresh = ch(spark, [(10_000, "update", "repo1", "f1.py", "cY", "python", "FRESH")])
    t.merge(fresh, epoch=2)
    assert live(t)[("repo1", "f1.py")] == ("python", "FRESH")


def test_delete_resolves_pending_mor_deltas(spark, mk_table):
    t = mk_table("d6")
    seed(spark, t, n=12)
    upd = ch(spark, [(100 + i, "update", f"repo{i % 4}", f"f{i}.py", "cZ", "go", f"v2-{i}") for i in range(12)])
    t.merge(upd, epoch=1, mode="mor")
    assert t.snap.get("deltas")
    m = t.delete_where([("lang", "=", "go")])
    assert m["committed"] and m["rows"] == 12  # every row is go after the mor update
    assert live(t) == {}
    assert not any(t.snap.get("deltas", {}).values())


def test_delete_changelog_post_image(spark, mk_table):
    t = mk_table("d7")
    seed(spark, t, n=8)
    v0 = t.version
    t.delete_where([("repo", "=", "repo2")])
    changes = t.table_changes(v0).collect()
    deleted = {(r["repo"], r["path"]) for r in changes if r["_change_op"] == "delete"}
    assert deleted == {("repo2", "f2.py"), ("repo2", "f6.py")}


# --------------------------------------------------------------- UPDATE


def test_update_where_sets_expressions(spark, mk_table):
    t = mk_table("u1")
    seed(spark, t, n=10)
    m = t.update_where(
        [("lang", "=", "go")],
        {"content": "upper(content)", "commit": F.lit("patched")},
    )
    assert m["committed"] and m["rows"] == 5
    for r in t.read().collect():
        if r["lang"] == "go":
            assert r["content"].startswith("BODY") and r["commit"] == "patched"
        else:
            assert r["content"].startswith("body")


def test_update_rejects_keys_and_metadata(spark, mk_table):
    t = mk_table("u2")
    seed(spark, t, n=4)
    with pytest.raises(ValueError, match="key column"):
        t.update_where([("lang", "=", "go")], {"repo": "'x'"})
    with pytest.raises(ValueError, match="metadata"):
        t.update_where([("lang", "=", "go")], {"__seq": "0"})
    with pytest.raises(ValueError, match="not a table column"):
        t.update_where([("lang", "=", "go")], {"nope": "'x'"})


def test_update_stamps_fresh_seq_for_lww(spark, mk_table):
    """An updated row wins over a late CDC event whose seq predates the
    DML (the DML stamped max_seq+1); an event with a genuinely newer
    seq still beats the DML — LWW order is preserved both ways."""
    t = mk_table("u3")
    seed(spark, t, n=4)  # seqs 0..3 → DML stamps 4
    t.update_where([("path", "=", "f1.py")], {"content": "'DML'"})
    t.merge(ch(spark, [(2, "update", "repo1", "f1.py", "c", "go", "STALE")]), epoch=1)
    assert live(t)[("repo1", "f1.py")][1] == "DML"
    t.merge(ch(spark, [(9, "update", "repo1", "f1.py", "c", "go", "NEWER")]), epoch=2)
    assert live(t)[("repo1", "f1.py")][1] == "NEWER"


# --------------------------------------------------------------- MERGE


def test_merge_builder_upsert(spark, mk_table):
    t = mk_table("m1")
    seed(spark, t, n=6)
    src = spark.createDataFrame(
        [
            ("repo1", "f1.py", "NEW1"),  # existing key → update
            ("repo9", "fX.py", "NEW2"),  # new key → insert
        ],
        "repo string, path string, content string",
    )
    m = (
        t.merge_builder(src)
        .when_matched_update({"content": "s.content"})
        .when_not_matched_insert()
        .execute()
    )
    assert m["committed"] and m["rows_changed"] == 2
    got = live(t)
    assert got[("repo1", "f1.py")][1] == "NEW1"
    assert got[("repo9", "fX.py")][1] == "NEW2"
    assert len(got) == 7
    # source columns absent from the insert (commit/lang) land NULL
    row = {(r["repo"], r["path"]): r for r in t.read().collect()}[("repo9", "fX.py")]
    assert row["lang"] is None


def test_merge_builder_clause_order_and_conditions(spark, mk_table):
    t = mk_table("m2")
    seed(spark, t, n=6)
    src = spark.createDataFrame(
        [("repo1", "f1.py", "drop"), ("repo2", "f2.py", "keep")],
        "repo string, path string, verdict string",
    )
    (
        t.merge_builder(src)
        .when_matched_delete(condition="s.verdict = 'drop'")
        .when_matched_update({"content": "concat(t.content, '+', s.verdict)"})
        .execute()
    )
    got = live(t)
    assert ("repo1", "f1.py") not in got
    assert got[("repo2", "f2.py")][1] == "body002+keep"


def test_merge_builder_rejects_duplicate_source_keys(spark, mk_table):
    t = mk_table("m3")
    seed(spark, t, n=4)
    src = spark.createDataFrame(
        [("repo1", "f1.py", "a"), ("repo1", "f1.py", "b")],
        "repo string, path string, content string",
    )
    with pytest.raises(MergeConflictError):
        t.merge_builder(src).when_matched_update({"content": "s.content"}).execute()


def test_merge_builder_tombstone_is_not_matched(spark, mk_table):
    """A deleted key matches NOT-MATCHED (insert revives it); with no
    insert clause the tombstone carries over and keeps fencing."""
    t = mk_table("m4")
    seed(spark, t, n=4)
    t.delete_where([("path", "=", "f1.py")])
    src = spark.createDataFrame(
        [("repo1", "f1.py", "REVIVED")], "repo string, path string, content string"
    )
    # update-only merge: tombstone unaffected
    t.merge_builder(src).when_matched_update({"content": "s.content"}).execute()
    assert ("repo1", "f1.py") not in live(t)
    # insert clause revives
    t.merge_builder(src).when_not_matched_insert().execute()
    assert live(t)[("repo1", "f1.py")][1] == "REVIVED"


def test_merge_builder_prunes_untouched_buckets(spark, mk_table):
    t = mk_table("m5", num_buckets=16)
    seed(spark, t, n=40)
    files_before = dict(t.snap["files"])
    src = spark.createDataFrame(
        [("repo1", "f1.py", "X")], "repo string, path string, content string"
    )
    t.merge_builder(src).when_matched_update({"content": "s.content"}).execute()
    changed = [b for b in files_before if t.snap["files"].get(b) != files_before[b]]
    assert len(changed) == 1  # exactly the source key's bucket rewrote


def test_merge_builder_needs_a_clause_and_keys(spark, mk_table):
    t = mk_table("m6")
    seed(spark, t, n=2)
    src = spark.createDataFrame([("repo1",)], "repo string")
    with pytest.raises(ValueError, match="key column"):
        t.merge_builder(src).when_not_matched_insert().execute()
    src2 = spark.createDataFrame([("repo1", "f1.py")], "repo string, path string")
    with pytest.raises(ValueError, match="WHEN clause"):
        t.merge_builder(src2).execute()


# --------------------------------------------------------------- CLI


def test_cli_delete_and_update(spark, mk_table, capsys):
    """delete/update subcommands drive the same DML in-process (the
    spark-submit deployment shape is covered by test_cli.py)."""
    import json

    from wrangler_spark.cli import main

    t = mk_table("cli1")
    seed(spark, t, n=10)
    assert main(["delete", "--table", t.path, "--filter", "lang=go"]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["committed"] and m["rows"] == 5
    assert main([
        "update", "--table", t.path,
        "--filter", "lang=python", "--set", "commit=upper(commit)",
    ]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["rows"] == 5
    t2 = LakeTable.load(spark, t.path)
    assert t2.read().filter("lang='go'").count() == 0
    assert all(r["commit"].startswith("C") for r in t2.read().collect())


# --------------------------------------------------------------- MoR DML


def test_mor_delete_writes_no_base_files(spark, mk_table):
    """mode='mor': tombstones land as delta files; NO base file is
    rewritten (Iceberg v2 equality-delete shape) — the resolved state
    still equals the cow delete's."""
    t = mk_table("md1")
    seed(spark, t, n=20)
    files_before = dict(t.snap["files"])
    m = t.delete_where([("lang", "=", "go")], mode="mor")
    assert m["committed"] and m["rows"] == 10 and m["files_rewritten"] == 0
    assert m["delta_files"] > 0
    assert t.snap["files"] == files_before  # base untouched
    assert any(t.snap.get("deltas", {}).values())
    got = live(t)
    assert len(got) == 10 and all(v[0] == "python" for v in got.values())
    # late lower-seq event still fenced through the delta tombstone
    t.merge(ch(spark, [(3, "update", "repo1", "f1.py", "c", "go", "LATE")]), epoch=1)
    assert ("repo1", "f1.py") not in live(t)
    # compact folds the tombstones into the base; state unchanged
    t.compact()
    assert not any(t.snap.get("deltas", {}).values())
    assert len(live(t)) == 10


def test_mor_update_equals_cow_update(spark, mk_table):
    t1, t2 = mk_table("md2a"), mk_table("md2b")
    seed(spark, t1, n=16)
    seed(spark, t2, n=16)
    kw = ([("lang", "=", "python")], {"content": "upper(content)"})
    m1 = t1.update_where(*kw, mode="cow")
    m2 = t2.update_where(*kw, mode="mor")
    assert m1["rows"] == m2["rows"] == 8
    assert m2["files_rewritten"] == 0 and m1["files_rewritten"] > 0
    assert live(t1) == live(t2)


def test_mor_dml_over_pending_merge_deltas(spark, mk_table):
    """Matching evaluates against the RESOLVED state: a pending merge
    delta that changed the filter column is honored, and the DML delta
    (fresh seq) wins over the older merge delta at read time."""
    t = mk_table("md3")
    seed(spark, t, n=8)
    # mor merge flips f1's lang go→python and f2's python→go
    t.merge(ch(spark, [
        (100, "update", "repo1", "f1.py", "cN", "python", "now-python"),
        (101, "update", "repo2", "f2.py", "cN", "go", "now-go"),
    ]), epoch=1, mode="mor")
    m = t.delete_where([("lang", "=", "go")], mode="mor")
    # gos: f3,f5,f7 (seed odds minus f1 which became python) plus f2
    assert m["rows"] == 4
    got = live(t)
    assert ("repo2", "f2.py") not in got and ("repo1", "f1.py") in got
    assert all(v[0] == "python" for v in got.values())


def test_mor_dml_changelog_continuity(spark, mk_table):
    t = mk_table("md4")
    seed(spark, t, n=8)
    v0 = t.version
    t.delete_where([("repo", "=", "repo2")], mode="mor")
    changes = t.table_changes(v0).collect()
    deleted = {(r["repo"], r["path"]) for r in changes if r["_change_op"] == "delete"}
    assert deleted == {("repo2", "f2.py"), ("repo2", "f6.py")}


def test_compact_min_files_bin_packs_fragmented_bucket(spark, mk_table):
    """compact(min_files=N) bin-packs a bucket fragmented by a
    since-retired bounded-size writer (Delta OPTIMIZE shape) without
    touching healthy buckets or answers."""
    t = mk_table(
        "bp1", num_buckets=1, properties={"write.max-records-per-file": 5}
    )
    seed(spark, t, n=30)
    frag = len(t.snap["files"]["0"])
    assert frag >= 6
    t.set_properties({"write.max-records-per-file": None})
    before = live(t)
    r = t.compact(min_files=4)
    assert r["compacted_buckets"] == 1
    assert len(t.snap["files"]["0"]) < frag
    assert live(t) == before
    # below threshold → no-op
    assert t.compact(min_files=99)["compacted_buckets"] == 0


def test_truncate_is_metadata_only_reset(spark, mk_table):
    t = mk_table("tr1")
    seed(spark, t, n=12)
    t.merge(ch(spark, [(100, "update", "repo1", "f1.py", "c", "go", "d")]), epoch=1, mode="mor")
    r = t.truncate()
    assert r["files_dropped"] and t.read().count() == 0
    assert not any(t.snap.get("deltas", {}).values())
    # a table reset, not a fence: late events re-insert their keys
    t.merge(ch(spark, [(5, "insert", "repoX", "new.py", "c", "py", "hello")]), epoch=2)
    assert live(t) == {("repoX", "new.py"): ("py", "hello")}
    # replica crossing the truncate converges via the snapshot-diff fallback
    from wrangler_spark.cdc import Replicator
    dst = mk_table("tr1_dst")
    Replicator(t, dst).sync()
    assert live(dst) == live(t)
    # time travel still sees the pre-truncate state
    old = LakeTable.load(spark, t.path, version=2)
    assert old.read().count() == 12


def test_cli_filter_in_syntax(spark, mk_table, capsys):
    import json

    from wrangler_spark.cli import main

    t = mk_table("cli_in")
    seed(spark, t, n=12)
    assert main(["delete", "--table", t.path, "--filter", "path in f1.py,f2.py"]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["rows"] == 2


def test_upsert_dataframe_sugar(spark, tmp_path):
    """upsert(df): schema-shaped rows land as LWW winners above the
    high-water seq; new keys insert, existing keys overwrite, tombstoned
    keys revive — then a LATER raw CDC event with a smaller seq must
    stay fenced (the documented monotone-fence semantics)."""
    from wrangler_spark.cdc.events import repo_files_schema
    from wrangler_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "ups"), repo_files_schema(), ["repo", "path"],
        num_buckets=4,
    )
    ev = spark.createDataFrame(
        [(5, "insert", "a", "f.py", "c5", "python", "old"),
         (6, "insert", "b", "g.py", "c6", "python", "gone"),
         (7, "delete", "b", "g.py", None, None, None)],
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    t.merge(ev, epoch=0)
    batch = spark.createDataFrame(
        [("a", "f.py", "cx", "python", "upserted"),     # overwrite
         ("b", "g.py", "cy", "python", "revived"),      # revive tombstone
         ("c", "h.py", "cz", "python", "fresh")],       # new key
        "repo string, path string, commit string, lang string, content string",
    )
    res = t.upsert(batch)
    assert res["events"] == 3
    state = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert state == {("a", "f.py"): "upserted", ("b", "g.py"): "revived",
                     ("c", "h.py"): "fresh"}
    # a late raw CDC event with a small seq loses to the upsert fence
    late = spark.createDataFrame(
        [(8, "update", "a", "f.py", "c8", "python", "stale")],
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    t.merge(late, epoch=1)
    assert {r["content"] for r in t.read().filter("repo='a'").collect()} == {"upserted"}


def test_delete_keys_batch(spark, tmp_path):
    from wrangler_spark.cdc.events import repo_files_schema
    from wrangler_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "dk"), repo_files_schema(), ["repo", "path"],
        num_buckets=4,
    )
    ev = spark.createDataFrame(
        [(i, "insert", f"r{i}", "f.py", f"c{i}", "python", f"v{i}")
         for i in range(1, 6)],
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    t.merge(ev, epoch=0)
    keys = spark.createDataFrame([("r1", "f.py"), ("r3", "f.py")],
                                 "repo string, path string")
    t.delete_keys(keys)
    assert {r["repo"] for r in t.read().collect()} == {"r2", "r4", "r5"}
    # tombstones fence a late lower-seq update for the deleted keys
    late = spark.createDataFrame(
        [(2, "update", "r1", "f.py", "cz", "python", "zombie")],
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )
    t.merge(late, epoch=1)
    assert {r["repo"] for r in t.read().collect()} == {"r2", "r4", "r5"}
