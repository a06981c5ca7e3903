"""Metadata inspection tables (lake/inspect.py — Iceberg `files` /
`partitions` / `snapshots` metadata-table parity, Delta DESCRIBE
DETAIL): counts/bytes must agree with the snapshot manifest and the
on-disk layout, across cow commits, mor deltas, CDF change files,
stats and bloom coverage.
"""

import json
import os

import pytest

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake import LakeTable


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        repo_files_schema(),
        ["repo", "path"],
        num_buckets=4,
        properties={"bloom.cols": "commit"},
    )
    rows = [
        (i, "insert", f"repo{i % 3}", f"f{i}.py", f"c{i}", "python", f"b{i}")
        for i in range(40)
    ]
    t.merge(
        spark.createDataFrame(
            rows,
            "seq long, op string, repo string, path string, commit string, "
            "lang string, content string",
        ),
        epoch=0,
    )
    # a mor epoch leaves delta files; the cow epoch wrote change files
    t.merge(
        spark.createDataFrame(
            [(100, "update", "repo0", "f0.py", "cX", "python", "upd")],
            "seq long, op string, repo string, path string, commit string, "
            "lang string, content string",
        ),
        epoch=1,
        mode="mor",
    )
    return LakeTable.load(spark, t.path)


def test_files_df_matches_manifest_and_disk(spark, table):
    f = table.inspect_files().collect()
    by_kind = {}
    for r in f:
        by_kind.setdefault(r["content"], []).append(r)
    assert len(by_kind["data"]) == len(table.all_files())
    assert len(by_kind["delta"]) == len(table.delta_files())
    assert len(by_kind.get("change", [])) == len(table.snap.get("changes") or [])
    # sizes are the real on-disk sizes; buckets are within range
    for r in f:
        full = os.path.join(table.path, r["file_path"])
        assert r["size_bytes"] == os.stat(full).st_size
        if r["content"] == "change":
            assert r["bucket"] is None
        else:
            assert 0 <= r["bucket"] < table.num_buckets
    # every data file carries footer stats and a bloom for `commit`
    assert all(r["stats_cols"] > 0 for r in by_kind["data"])
    # per-file record counts ride the stats manifest (Iceberg
    # files.record_count): the 40 seeded rows, no tombstones yet
    assert all(r["record_count"] is not None for r in by_kind["data"])
    assert sum(r["record_count"] for r in by_kind["data"]) == 40
    assert all(r["bloom_cols"] == 1 for r in by_kind["data"])
    # deltas are never bloom-indexed (scan exempts delta buckets)
    assert all(r["bloom_cols"] == 0 for r in by_kind["delta"])


def test_partitions_df_is_the_compaction_worklist(spark, table):
    p = {r["bucket"]: r for r in table.inspect_partitions().collect()}
    deltas = table.snap.get("deltas", {})
    for b in range(table.num_buckets):
        assert p[b]["n_data_files"] == len(table.snap["files"].get(str(b), []))
        assert p[b]["n_delta_files"] == len(deltas.get(str(b), []))
    assert sum(r["n_delta_files"] for r in p.values()) == len(table.delta_files())
    assert sum(r["data_rows"] for r in p.values()) == 40
    # bytes agree with files_df
    fsum = sum(
        r["size_bytes"]
        for r in table.inspect_files().collect()
        if r["content"] == "data"
    )
    assert sum(r["data_bytes"] for r in p.values()) == fsum


def test_snapshots_df_mirrors_history(spark, table):
    s = table.inspect_snapshots().collect()
    h = table.history()
    assert [r["version"] for r in s] == [e["version"] for e in h]
    assert [r["operation"] for r in s] == [e["operation"] for e in h]
    assert s[0]["n_delta_files"] == len(table.delta_files())
    assert {e for r in s for e in r["committed_epochs"]} == {0, 1}


def test_describe_detail(spark, table):
    v_before = table.version
    table.add_constraint("content_present", "content IS NOT NULL")
    d = LakeTable.load(spark, table.path).describe()
    assert d["version"] == v_before + 1  # the constraint commit
    assert d["key_cols"] == ["repo", "path"]
    assert d["num_buckets"] == 4
    assert d["constraints"] == {"content_present": "content IS NOT NULL"}
    assert d["committed_epochs"] == [0, 1]
    assert d["files"]["data"]["count"] == len(table.all_files())
    assert d["files"]["delta"]["count"] == len(table.delta_files())
    assert d["files"]["data"]["bytes"] > 0
    assert d["files"]["data"]["rows"] == 40
    assert d["stats_covered_files"] >= d["files"]["data"]["count"]
    json.dumps(d)  # CLI-serializable


def test_cli_describe(spark, table, tmp_path, capsys):
    from wrangler_spark.cli import main

    rc = main(["describe", "--table", table.path, "--files", "--partitions"])
    assert rc == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["num_buckets"] == 4
    kinds = {ln["content"] for ln in lines[1:] if "content" in ln}
    assert {"data", "delta"} <= kinds
    assert any("n_data_files" in ln for ln in lines)


def test_analyze_column_stats(spark, tmp_path):
    """ANALYZE TABLE parity (table.analyze): one agg job stores
    per-column NDV / null counts / avg string length as stats.*
    properties in a metadata-only commit; describe() parses them back.
    At tiny cardinalities HLL++ is exact, so the NDVs are checkable."""
    from wrangler_spark.cdc.events import repo_files_schema
    from wrangler_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "an"), repo_files_schema(), ["repo", "path"],
        num_buckets=4,
    )
    rows = [
        (i, "insert", f"r{i % 3}", f"f{i}.py", f"c{i}", "python" if i % 2 else None,
         "x" * 10)
        for i in range(30)
    ]
    t.merge(
        spark.createDataFrame(
            rows,
            "seq long, op string, repo string, path string, commit string, "
            "lang string, content string",
        ),
        epoch=0,
    )
    v_before = t.version
    res = t.analyze(columns=["repo", "lang", "content"])
    assert t.version == v_before + 1  # metadata-only commit
    assert res["row_count"] == 30 and res["columns"]["repo"] == 3
    d = t.describe()
    cs = d["column_stats"]
    assert cs["repo"]["ndv"] == 3 and cs["repo"]["null_count"] == 0
    assert cs["lang"]["ndv"] == 1 and cs["lang"]["null_count"] == 15
    assert cs["content"]["avg_len"] == 10.0
    # files untouched — the commit carried properties only
    after = LakeTable.load(spark, t.path)
    assert after.snap["files"] == t.snap["files"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no such column"):
        t.analyze(columns=["ghost"])
    # CLI round trip
    from wrangler_spark.cli import main as cli

    assert cli(["analyze", "--table", t.path, "--columns", "repo"]) == 0
