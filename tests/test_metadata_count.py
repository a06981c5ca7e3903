"""Metadata-only COUNT(*) — live-row counts served from the commit-time
stats sidecars with ZERO Spark jobs and zero data-file reads.

Semantics bar: Delta/Iceberg answer SELECT COUNT(*) at plan time from
per-file record counts. Here live = __nrows − __ndel per base file
(tombstones stay physical in cow files to fence late lower-seq events,
so the naive record_count sum over-counts); __ndel is exact — boolean
row-group stats decide all-live/all-dead groups for free, a mixed group
costs one column-pruned read of the boolean column at commit time.

The fallback contract matters as much as the fast path: pending MoR
deltas resolve liveness per key ACROSS files, so the metadata path must
refuse (return None) rather than guess — and come back after compact()
folds the deltas in.
"""

import pytest

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


def seed(spark, table, n=40, mode="cow", epoch=0, start=0):
    rows = [
        (
            start + i,
            "insert",
            f"repo{i % 4}",
            f"f{i}.py",
            f"c{i}",
            "python" if i % 2 == 0 else "go",
            f"body{i:03d}",
        )
        for i in range(n)
    ]
    table.merge(ch(spark, rows), epoch=epoch, mode=mode)
    return rows


def test_cow_insert_only_counts_from_metadata(spark, mk_table):
    t = mk_table("m1")
    seed(spark, t, n=40)
    assert t._count_from_metadata() == 40
    assert t.count_rows() == 40 == t.read().count()


def test_tombstones_subtracted_exactly(spark, mk_table):
    """Deletes keep physical tombstone rows in the cow files; the
    metadata count must subtract them, not report record_count."""
    t = mk_table("m2")
    seed(spark, t, n=40)
    t.merge(
        ch(
            spark,
            [(100 + i, "delete", f"repo{i % 4}", f"f{i}.py", None, None, None) for i in range(7)],
        ),
        epoch=1,
    )
    t = LakeTable.load(spark, t.path)
    assert t.read().count() == 33
    assert t._count_from_metadata() == 33
    # and the naive physical sum really would have been wrong
    phys = sum(st["__nrows"] for rel, st in t.file_stats.items()
               if any(rel in rels for rels in t.snap["files"].values()))
    assert phys == 40
    assert t.count_rows() == 33


def test_dml_delete_update_keep_metadata_count(spark, mk_table):
    t = mk_table("m3")
    seed(spark, t, n=40)
    t.delete_where([("lang", "=", "go")])  # 20 rows
    t = LakeTable.load(spark, t.path)
    assert t._count_from_metadata() == 20 == t.read().count()
    t.update_where([("repo", "=", "repo0")], {"content": "'x'"})
    t = LakeTable.load(spark, t.path)
    assert t._count_from_metadata() == 20 == t.read().count()


def test_mor_deltas_force_fallback_then_compact_restores(spark, mk_table):
    t = mk_table("m4")
    seed(spark, t, n=40)
    t.merge(
        ch(spark, [(200, "delete", "repo0", "f0.py", None, None, None),
                   (201, "insert", "repo9", "new.py", "c", "python", "v")]),
        epoch=1,
        mode="mor",
    )
    t = LakeTable.load(spark, t.path)
    assert t.delta_rels()  # precondition: deltas pending
    assert t._count_from_metadata() is None  # refuses to guess
    assert t.count_rows() == 40 == t.read().count()  # scan fallback exact
    t.compact()
    t = LakeTable.load(spark, t.path)
    assert not t.delta_rels()
    assert t._count_from_metadata() == 40 == t.read().count()


def test_missing_ndel_sidecar_falls_back(spark, mk_table):
    """A sidecar that predates __ndel collection (older writer) makes
    the metadata count unavailable, never wrong."""
    t = mk_table("m5")
    seed(spark, t, n=10)
    stats = t.file_stats
    rel = next(iter(stats))
    stats[rel] = {k: v for k, v in stats[rel].items() if k != "__ndel"}
    t.__dict__["_stats_cache"] = stats
    assert t._count_from_metadata() is None
    assert t.count_rows() == 10


def test_describe_reports_live_rows(spark, mk_table):
    t = mk_table("m6")
    seed(spark, t, n=12)
    t.merge(
        ch(spark, [(50, "delete", "repo0", "f0.py", None, None, None)]), epoch=1
    )
    t = LakeTable.load(spark, t.path)
    d = t.describe()
    assert d["live_rows"] == 11
    # physical accounting (tombstone included) still visible alongside
    assert d["files"]["data"]["rows"] >= 12
