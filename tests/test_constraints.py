"""Table CHECK constraints (lake/constraints.py — Delta ADD CONSTRAINT
parity): existing-data validation on add, fail/drop enforcement in the
CDC merge (pre-LWW, so drop lets an older valid event win), always-fail
enforcement in UPDATE/MERGE DML, delete/tombstone exemption.
"""

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake import ConstraintViolationError, LakeTable


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


def seed(spark, table, n=30):
    rows = [
        (i, "insert", f"repo{i % 5}", f"f{i}.py", f"c{i}", "python", f"body{i:03d}")
        for i in range(n)
    ]
    table.merge(ch(spark, rows), epoch=0)
    return rows


def _content(spark, path):
    t = LakeTable.load(spark, path)
    return {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}


def test_add_validates_existing_data_and_records_property(spark, mk_table):
    t = mk_table("c1")
    seed(spark, t)
    out = t.add_constraint("content_prefix", "content LIKE 'body%'")
    assert out["constraint"] == {"content_prefix": "content LIKE 'body%'"}
    assert t.constraints == {"content_prefix": "content LIKE 'body%'"}
    # violated by existing rows → refused, nothing committed
    v = t.version
    with pytest.raises(ConstraintViolationError, match="existing row"):
        t.add_constraint("impossible", "length(content) > 100")
    assert t.version == v
    # duplicate name refused
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("content_prefix", "true")
    # unparseable expression surfaces at add time
    with pytest.raises(Exception):
        t.add_constraint("bad_expr", "THIS IS NOT (SQL")


def test_merge_fail_mode_fences_epoch_unwritten(spark, mk_table):
    t = mk_table("c2")
    seed(spark, t)
    t.add_constraint("content_present", "content IS NOT NULL")
    before = _content(spark, t.path)
    v = LakeTable.load(spark, t.path).version
    bad = ch(
        spark,
        [
            (100, "update", "repo0", "f0.py", "c100", "python", None),  # violates
            (101, "update", "repo1", "f1.py", "c101", "python", "fine"),
        ],
    )
    with pytest.raises(ConstraintViolationError, match="content_present"):
        t.merge(bad, epoch=1)
    cur = LakeTable.load(spark, t.path)
    assert cur.version == v and 1 not in cur.committed_epochs
    assert _content(spark, t.path) == before
    # the fixed batch replays under the same epoch
    res = t.merge(
        ch(spark, [(100, "update", "repo0", "f0.py", "c100", "python", "fixed")]),
        epoch=1,
    )
    assert res["constraint_violations"] == {"content_present": 0}
    assert _content(spark, t.path)[("repo0", "f0.py")] == "fixed"


def test_drop_mode_discards_events_pre_lww(spark, mk_table):
    t = mk_table("c3")
    seed(spark, t)
    t.add_constraint("content_present", "content IS NOT NULL")
    t.set_properties({"constraints.mode": "drop"})
    res = t.merge(
        ch(
            spark,
            [
                # valid earlier event and an INVALID later one for the
                # same key: the invalid event drops BEFORE LWW, so the
                # valid seq=200 value wins (not the base row)
                (200, "update", "repo2", "f2.py", "c200", "python", "valid-200"),
                (201, "update", "repo2", "f2.py", "c201", "python", None),
                (202, "update", "repo3", "f3.py", "c202", "python", "ok-202"),
            ],
        ),
        epoch=1,
    )
    assert res["constraint_violations"] == {"content_present": 1}
    got = _content(spark, t.path)
    assert got[("repo2", "f2.py")] == "valid-200"
    assert got[("repo3", "f3.py")] == "ok-202"


def test_deletes_exempt_in_both_modes(spark, mk_table):
    t = mk_table("c4")
    seed(spark, t)
    t.add_constraint("content_present", "content IS NOT NULL")
    res = t.merge(
        ch(spark, [(300, "delete", "repo4", "f4.py", None, None, None)]), epoch=1
    )
    assert res["constraint_violations"] == {"content_present": 0}
    assert ("repo4", "f4.py") not in _content(spark, t.path)


def test_mor_merge_enforces_too(spark, mk_table):
    t = mk_table("c5")
    seed(spark, t)
    t.add_constraint("content_present", "content IS NOT NULL")
    with pytest.raises(ConstraintViolationError):
        t.merge(
            ch(spark, [(400, "update", "repo0", "f5.py", "c", "python", None)]),
            epoch=1,
            mode="mor",
        )
    assert LakeTable.load(spark, t.path).delta_files() == []


def test_update_where_and_merge_builder_enforce(spark, mk_table):
    t = mk_table("c6")
    seed(spark, t)
    t.add_constraint("content_nonempty", "length(content) > 0")
    v = LakeTable.load(spark, t.path).version
    with pytest.raises(ConstraintViolationError, match="UPDATE violates"):
        t.update_where([("repo", "=", "repo1")], {"content": "''"})
    assert LakeTable.load(spark, t.path).version == v
    # a valid update passes
    t.update_where([("repo", "=", "repo1")], {"content": "'updated'"})
    assert _content(spark, t.path)[("repo1", "f1.py")] == "updated"

    # MERGE: insert clause producing an empty content violates
    src = spark.createDataFrame(
        [("repoZ", "zz.py", "z1", "python", "")],
        "repo string, path string, commit string, lang string, content string",
    )
    with pytest.raises(ConstraintViolationError, match="MERGE violates"):
        t.merge_builder(src).when_not_matched_insert().execute()
    assert ("repoZ", "zz.py") not in _content(spark, t.path)
    # matched-DELETE through MergeBuilder stays exempt (tombstones)
    src2 = spark.createDataFrame(
        [("repo2", "f2.py", None, None, None)],
        "repo string, path string, commit string, lang string, content string",
    )
    t.merge_builder(src2).when_matched_delete().execute()
    assert ("repo2", "f2.py") not in _content(spark, t.path)


def test_drop_constraint_lifts_enforcement(spark, mk_table):
    t = mk_table("c7")
    seed(spark, t)
    t.add_constraint("content_present", "content IS NOT NULL")
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("nope")
    t.drop_constraint("content_present")
    assert t.constraints == {}
    # the formerly-violating merge now applies
    t.merge(
        ch(spark, [(500, "update", "repo0", "f0.py", "c", "python", None)]), epoch=1
    )
    assert _content(spark, t.path)[("repo0", "f0.py")] is None


def test_replayer_surfaces_violations_in_lineage(spark, mk_table, tmp_path):
    import json
    import os

    from pyspark.sql import functions as F

    from wrangler_spark.cdc.events import generate_events
    from wrangler_spark.cdc.replay import Replayer

    t = mk_table("c8")
    t.add_constraint("content_present", "content IS NOT NULL OR lang IS NULL")
    t.set_properties({"constraints.mode": "drop"})
    events = generate_events(spark, 1000, epoch_size=500)
    poisoned = events.withColumn(
        "content",
        F.when((F.col("epoch") == 1) & (F.col("seq") % 7 == 0), F.lit(None)).otherwise(
            F.col("content")
        ),
    )
    rp = Replayer(t, str(tmp_path / "c8_ckpt"))
    rp.replay(poisoned)
    lines = [
        json.loads(ln)
        for ln in open(os.path.join(rp.checkpoint_dir, "lineage.jsonl"))
    ]
    by_epoch = {r["epoch"]: r for r in lines}
    assert by_epoch[0]["constraint_violations"]["content_present"] == 0
    assert by_epoch[1]["constraint_violations"]["content_present"] > 0
    # dropped events never landed
    assert (
        LakeTable.load(spark, t.path)
        .read()
        .filter("content IS NULL AND lang IS NOT NULL")
        .count()
        == 0
    )


def test_cli_alter_constraints(spark, mk_table, capsys):
    import json

    from wrangler_spark.cli import main

    t = mk_table("c9")
    seed(spark, t)
    rc = main(
        ["alter", "--table", t.path,
         "--add-constraint", "content_present=content IS NOT NULL"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out[0]["constraint"] == {"content_present": "content IS NOT NULL"}
    from wrangler_spark.lake import LakeTable

    assert LakeTable.load(spark, t.path).constraints == {
        "content_present": "content IS NOT NULL"
    }
    assert main(
        ["alter", "--table", t.path, "--drop-constraint", "content_present"]
    ) == 0
    assert json.loads(capsys.readouterr().out)[0]["dropped"] == "content_present"
    assert LakeTable.load(spark, t.path).constraints == {}


# ---------------------------------------------------- property (hypothesis)

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from wrangler_spark.lake.table import LakeTable as _LT  # noqa: E402

_KEYS = [("r1", "a.py"), ("r1", "b.py"), ("r2", "a.py")]


@st.composite
def _event_log(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    seqs = draw(st.lists(st.integers(0, 10_000), min_size=n, max_size=n, unique=True))
    events = []
    for s in seqs:
        k = draw(st.sampled_from(_KEYS))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        poison = op != "delete" and draw(st.booleans())
        events.append((s, op, k[0], k[1], poison))
    cuts = draw(st.lists(st.integers(0, n), max_size=3))
    bounds = sorted(set([0, n, *cuts]))
    return [events[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]


def _fold_valid(batches):
    """Python oracle: LWW over events MINUS poisoned non-delete events
    (drop mode discards them before they can win)."""
    state = {}
    for batch in batches:
        for s, op, repo, path, poison in sorted(batch):
            if poison:
                continue
            cur = state.get((repo, path))
            if cur is None or s > cur[0]:
                state[(repo, path)] = (s, op)
    return {k: f"v{v[0]}" for k, v in state.items() if v[1] != "delete"}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_event_log())
def test_drop_mode_equals_python_fold(spark, tmp_path_factory, batches):
    tmp = tmp_path_factory.mktemp("consprop")
    t = _LT.create(
        spark, str(tmp / "t"), repo_files_schema(), ["repo", "path"], num_buckets=4,
        properties={"constraints.mode": "drop"},
    )
    t.add_constraint("content_present", "content IS NOT NULL")
    for i, batch in enumerate(batches):
        rows = [
            (s, op, r, p, f"c{s}",
             None if op == "delete" else "python",
             None if (op == "delete" or poison) else f"v{s}")
            for s, op, r, p, poison in batch
        ]
        t.merge(ch(spark, rows), epoch=i)
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in _LT.load(spark, t.path).read().collect()
    }
    assert got == _fold_valid(batches)


def test_rename_and_drop_refuse_constrained_columns(spark, mk_table):
    """Delta refuses RENAME/DROP of a column a CHECK references — the
    stored expression would stop resolving and abort every later write.
    Detection is by analysis (lake/constraints.py
    constraints_referencing), so backticks/case/function wrapping all
    count as references."""
    t = mk_table("c_ref")
    seed(spark, t)
    t.add_constraint("lang_known", "Lang IN ('python','java') OR lang IS NULL")
    t.add_constraint("has_content", "length(`content`) > 0")
    with pytest.raises(ValueError, match=r"lang_known.*reference"):
        t.rename_column("lang", "language")
    with pytest.raises(ValueError, match=r"has_content.*reference"):
        t.drop_column("content")
    # an unreferenced column still renames/drops freely
    t.rename_column("commit", "commit_sha")
    t.drop_column("commit_sha")
    # dropping the constraint unblocks the schema change
    t.drop_constraint("lang_known")
    t.rename_column("lang", "language")
    assert "language" in [f.name for f in t.schema.fields]
    # and the surviving constraint still enforces (DML path — the event
    # schema predates the renames, so we assert through update_where)
    with pytest.raises(ConstraintViolationError):
        t.update_where([("repo", "=", "repo0")], {"content": "''"})
