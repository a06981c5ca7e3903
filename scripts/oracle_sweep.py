#!/usr/bin/env python
"""Run EVERY __spark_entry__ query against its DuckDB oracle at a given
SF dir (default sf0.01 — the driver's correctness scale) and print one
status line per query. Mirrors the driver's compare: sort columns by
name, compare row count, column names, and per-row value strings.

    python scripts/oracle_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from wrangler_spark.session import get_spark

    d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(parallelism=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(d, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, d).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {e!r}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle, by design) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {e!r}")
            n_fail += 1
            continue
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL  {name}: columns {list(sdf.columns)} vs {list(odf.columns)}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            n_fail += 1
            continue
        # Faithful to the driver: sort ROWS by all columns with pandas
        # sort_values (factorizes object cells — unhashable list/dict
        # cells raise TypeError here exactly like the driver's
        # canonicalizer; r03's fill_null red row passed the old
        # stringify-first sweep while failing the driver).
        try:
            sdf = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
            odf = odf.sort_values(list(odf.columns)).reset_index(drop=True)
        except TypeError as e:
            print(f"FAIL  {name}: driver-style row sort raised {e!r} "
                  f"(unhashable cell type — emit scalars, not lists)")
            n_fail += 1
            continue
        s1 = sdf.astype(str).apply("|".join, axis=1).reset_index(drop=True)
        s2 = odf.astype(str).apply("|".join, axis=1).reset_index(drop=True)
        if not (s1 == s2).all():
            bad = (s1 != s2).idxmax()
            print(f"FAIL  {name}: value mismatch at sorted row {bad}:\n"
                  f"      spark  {s1[bad][:160]}\n      oracle {s2[bad][:160]}")
            n_fail += 1
            continue
        print(f"pass  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} FAIL "
          f"of {len(qs)} queries at {d}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
