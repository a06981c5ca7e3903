"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against oracle_sql() via DuckDB —
row count + order-insensitive, column-name-sorted value comparison."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os as _os

# default sf0.001 for speed; set ORACLE_SF_DIR=/root/testdata/sf0.01 to
# mirror the driver's exact scale
SF_DIR = _os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_all_oracles(spark, duck):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = set(oracles) - set(queries)
    assert not unknown, f"oracle_sql keys without queries: {unknown}"

    failures = []
    for name, sql in oracles.items():
        try:
            sdf = queries[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rel = duck.execute(sql)
            d_cols = [c[0] for c in rel.description]
            d_rows = rel.fetchall()
            sc, sr = _norm_rows(s_cols, s_rows)
            dc, dr = _norm_rows(d_cols, d_rows)
            if sc != dc:
                failures.append(f"{name}: column mismatch spark={sc} duck={dc}")
            elif len(sr) != len(dr):
                failures.append(f"{name}: row count spark={len(sr)} duck={len(dr)}")
            elif sr != dr:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
                )
                failures.append(f"{name}: value mismatch at sorted-row {diff}")
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: EXCEPTION {type(e).__name__}: {str(e)[:200]}")
    assert not failures, "\n".join(failures)


def test_rows_only_queries_run(spark):
    """Queries without oracles still must run and return a stable schema."""
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in set(queries) - set(oracles):
        df = queries[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert len(df.schema.fields) > 0, name
