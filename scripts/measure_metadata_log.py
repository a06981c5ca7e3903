"""Measure per-commit snapshot-metadata bytes: diff log vs full listing.

Builds a table with many files (one sparse epoch per commit), then
compares the serialized snapshot size with `metadata.log.enabled`
on (diff) vs off (full listing per commit). The north-rule scale
argument: at 10^6 files a full listing is ~100 MB per commit; the
diff stays O(touched buckets).

Run: python scripts/measure_metadata_log.py
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrangler_spark.session import get_spark  # noqa: E402
from wrangler_spark.cdc.events import repo_files_schema  # noqa: E402
from wrangler_spark.lake.table import LakeTable, _version_path  # noqa: E402


def ch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


def build(spark, root, enabled: bool, n_seed: int, n_epochs: int):
    t = LakeTable.create(
        spark,
        os.path.join(root, "on" if enabled else "off"),
        repo_files_schema(),
        ["repo", "path"],
        num_buckets=256,
        properties={"metadata.log.enabled": str(enabled).lower()},
    )
    seed = [
        (i, "insert", f"repo{i % 50}", f"f{i}.py", f"c{i}", "python", "x" * 40)
        for i in range(n_seed)
    ]
    t.merge(ch(spark, seed), epoch=0)
    mdir = os.path.join(t.path, "_meta")
    sizes = []
    for e in range(1, n_epochs + 1):
        t.merge(
            ch(spark, [(n_seed + e, "update", f"repo{e % 50}", f"f{e}.py",
                        f"c{n_seed + e}", "python", "y" * 40)]),
            epoch=e,
        )
        sizes.append(os.path.getsize(_version_path(mdir, t.version)))
    n_files = sum(len(v) for v in t.snap["files"].values())
    return n_files, sizes


def main():
    spark = get_spark(parallelism=8, app_name="measure-metadata-log")
    root = tempfile.mkdtemp(prefix="metalog-")
    try:
        n_seed, n_epochs = 20_000, 8
        files_on, on = build(spark, root, True, n_seed, n_epochs)
        files_off, off = build(spark, root, False, n_seed, n_epochs)
        out = {
            "table_files": files_off,
            "sparse_epoch_snapshot_bytes_full": sum(off) // len(off),
            "sparse_epoch_snapshot_bytes_diff": sum(on) // len(on),
            "ratio": round(sum(off) / max(1, sum(on)), 1),
            "note": (
                "per-commit metadata bytes for a 1-key epoch on a "
                f"{files_off}-file table; diff log vs full listing"
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
