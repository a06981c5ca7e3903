"""Metadata inspection tables (Iceberg `files` / `snapshots` /
`partitions` metadata-table parity, Delta `DESCRIBE DETAIL`).

Each returns a DataFrame over the table's METADATA only — the snapshot
manifest is one JSON document, so building these costs one driver read
plus one `os.stat` per live file (the same listing cost `scan_plan`
already pays); no data file is opened. At 10^6 files the rows are built
driver-side then parallelized — fine for an ops query, and the file
sizes could be captured at commit time instead if the stat round-trips
ever showed up (object-store LIST latency).

Why it matters at 100 TB: compaction targeting (`partitions` shows the
fragmented/skewed buckets `compact(min_files)` should visit), retention
sizing (`snapshots` shows bytes added per commit → expire cadence), and
debugging skipped scans (`files` carries per-file stats presence and
bloom coverage).

Reference parity: the reference engine has no table layer; the shape
here follows Iceberg's metadata tables (`SELECT * FROM t.files`) and
Delta's DESCRIBE DETAIL, both public APIs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FILES_SCHEMA = T.StructType(
    [
        T.StructField("content", T.StringType(), False),  # data|delta|change
        T.StructField("bucket", T.IntegerType(), True),  # None for change files
        T.StructField("file_path", T.StringType(), False),  # table-relative
        T.StructField("size_bytes", T.LongType(), True),  # None if missing
        T.StructField("record_count", T.LongType(), True),  # None if no footer stats
        T.StructField("stats_cols", T.IntegerType(), False),  # footer-stats cols
        T.StructField("bloom_cols", T.IntegerType(), False),  # bloom-indexed cols
    ]
)

_SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType(), False),
        T.StructField("parent", T.LongType(), True),
        T.StructField("ts", T.StringType(), True),
        T.StructField("operation", T.StringType(), False),
        T.StructField("committed_epochs", T.ArrayType(T.LongType()), False),
        T.StructField("n_files", T.LongType(), False),
        T.StructField("n_delta_files", T.LongType(), False),
        T.StructField("n_change_files", T.LongType(), False),
    ]
)


def _file_rows(table) -> list[tuple]:
    snap = table.snap
    stats = table.file_stats
    # the manifest POINTER records which files a sidecar covers but not
    # the column list (that was the table's bloom.cols at build time) —
    # report the current indexed-column count for covered files
    from wrangler_spark.lake.bloom import bloom_cols

    n_bloom_cols = len(bloom_cols(snap))
    bloomed: set[str] = {
        rel for m in snap.get("bloom_manifests") or [] for rel in m["files"]
    }
    rows = []

    def _one(kind: str, bucket: int | None, rel: str):
        full = os.path.join(table.path, rel)
        try:
            size = os.stat(full).st_size
        except OSError:
            size = None
        fstats = stats.get(rel) or {}
        nrows = fstats.get("__nrows")
        rows.append(
            (
                kind,
                bucket,
                rel,
                size,
                None if nrows is None else int(nrows),
                sum(1 for k in fstats if not k.startswith("__")),
                n_bloom_cols if rel in bloomed else 0,
            )
        )

    for b, rels in snap["files"].items():
        for rel in rels:
            _one("data", int(b), rel)
    for b, rels in snap.get("deltas", {}).items():
        for rel in rels:
            _one("delta", int(b), rel)
    for rel in snap.get("changes") or []:
        _one("change", None, rel)
    return rows


def files_df(spark: SparkSession, table) -> DataFrame:
    """One row per file the CURRENT snapshot references (Iceberg
    `t.files` + `t.delete_files`, unioned with the commit's CDF files)."""
    return spark.createDataFrame(_file_rows(table), _FILES_SCHEMA)


def partitions_df(spark: SparkSession, table) -> DataFrame:
    """Per-bucket layout summary (Iceberg `t.partitions`): file/byte
    counts split by base vs delta — the compaction worklist."""
    from pyspark.sql import functions as F

    f = files_df(spark, table).filter(F.col("bucket").isNotNull())
    return (
        f.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("content") == "data", 1).otherwise(0)).alias("n_data_files"),
            F.sum(F.when(F.col("content") == "data", F.col("record_count")).otherwise(0)).alias("data_rows"),
            F.sum(F.when(F.col("content") == "data", F.col("size_bytes")).otherwise(0)).alias("data_bytes"),
            F.sum(F.when(F.col("content") == "delta", 1).otherwise(0)).alias("n_delta_files"),
            F.sum(F.when(F.col("content") == "delta", F.col("size_bytes")).otherwise(0)).alias("delta_bytes"),
        )
        .orderBy("bucket")
    )


def snapshots_df(spark: SparkSession, table) -> DataFrame:
    """Retained commit history as a DataFrame (Iceberg `t.snapshots`,
    Delta DESCRIBE HISTORY). Source of truth is `table.history()`."""
    rows = [
        (
            int(h["version"]),
            None if h.get("parent") is None else int(h["parent"]),
            str(h["ts"]) if h.get("ts") is not None else None,
            h.get("operation", "commit"),
            [int(e) for e in h.get("committed_epochs", [])],
            int(h["n_files"]),
            int(h["n_delta_files"]),
            int(h["n_change_files"]),
        )
        for h in table.history()
    ]
    return spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)


def describe(table) -> dict:
    """DESCRIBE DETAIL: one metadata-only dict for CLI/ops use."""
    snap = table.snap
    rows = _file_rows(table)
    by_kind: dict[str, list] = {"data": [], "delta": [], "change": []}
    for r in rows:
        by_kind[r[0]].append(r)
    return {
        "path": table.path,
        "version": table.version,
        "operation": snap.get("operation"),
        "key_cols": table.key_cols,
        "num_buckets": table.num_buckets,
        "schema": [(f.name, f.dataType.simpleString()) for f in table.schema.fields],
        "aliases": table.aliases,
        "properties": dict(snap.get("properties", {})),
        "constraints": table.constraints,
        "tags": dict(snap.get("tags", {})),
        "committed_epochs": sorted(table.committed_epochs),
        "files": {
            kind: {
                "count": len(v),
                "bytes": sum(x[3] or 0 for x in v),
                "rows": sum(x[4] or 0 for x in v),
            }
            for kind, v in by_kind.items()
        },
        # metadata-exact live-row count (None when a scan is required:
        # pending MoR deltas or pre-__ndel sidecars)
        "live_rows": table._count_from_metadata(),
        "stats_covered_files": sum(1 for r in rows if r[5] > 0),
        "bloom_covered_files": sum(1 for r in rows if r[6] > 0),
        "retained_snapshots": len(table.history()),
        # ANALYZE results (table.analyze()), parsed back out of the
        # stats.col.* properties: {col: {ndv, null_count, avg_len?}}
        "column_stats": _column_stats(snap.get("properties", {})),
    }


def _column_stats(props: dict) -> dict:
    out: dict = {}
    for k, v in props.items():
        if not k.startswith("stats.col."):
            continue
        col, metric = k[len("stats.col."):].rsplit(".", 1)
        out.setdefault(col, {})[metric] = v
    return out
