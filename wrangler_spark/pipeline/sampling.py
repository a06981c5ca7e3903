"""Deterministic, reproducible dataset splitting and sampling for
training-data pipelines.

Random sampling (sources/readers.py: reservoir / bernoulli / poisson)
answers "give me a representative subset"; TRAINING pipelines need the
stronger property that the assignment of a document to train/val/test
is a pure function of its identity — stable across runs, machines,
Spark versions, partition counts and row order, so (a) re-running the
pipeline after appending data never moves an old document across the
split boundary (no eval contamination by churn), and (b) two teams
computing the split independently agree. The standard trick (used by
e.g. TFDS's split slicing and every large-scale dedup/eval pipeline):
hash the document key with a STABLE hash, take the value modulo a
grain, and cut the grain into named ranges.

sha2/md5 are used rather than xxhash64/crc32 because they are defined
identically everywhere (DuckDB, Presto, Python's hashlib), making the
split auditable outside Spark — the driver oracle recomputes it
relationally.

100 TB story: the split/sample column is a pure per-row projection
(two JVM hash calls) — no shuffle, no UDF, fully codegen'd; a
stratified variant composes the same expression per stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_expr", "assign_splits", "hash_sample", "stratified_hash_sample"]

_GRAIN = 10_000


def _bucket(key_col: Column, salt: str, grain: int = _GRAIN) -> Column:
    """Stable [0, grain) bucket of a key: the first 15 hex digits of
    sha256(salt || key) as an integer, mod grain. 15 hex digits = 60
    bits — safely inside a long, and enough that the mod is unbiased
    to ~2^-47 for any sane grain."""
    h = F.sha2(F.concat(F.lit(salt), key_col.cast("string")), 256)
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % grain


def split_expr(
    key_col: Column,
    weights: dict[str, float],
    salt: str = "split",
    grain: int = _GRAIN,
) -> Column:
    """A Column assigning each row a split name from `weights`
    (name → fraction, must sum to ≤ 1; any remainder falls into the
    LAST listed split). Assignment is a pure function of (salt, key):
    appending rows later never reassigns an existing key."""
    total = sum(weights.values())
    if not weights or total > 1.0 + 1e-9:
        raise ValueError(f"split weights must be non-empty and sum to ≤ 1, got {weights}")
    b = _bucket(key_col, salt, grain)
    expr = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name]
        cond = b < int(round(hi * grain))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def assign_splits(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """df + a `split` column: deterministic train/val/test assignment."""
    return df.withColumn(out_col, split_expr(F.col(key), weights, salt=salt))


def hash_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ~fraction sample keyed on `key`: the same keys are
    chosen on every run (unlike df.sample, whose output depends on
    partitioning). Appending data never changes an old key's fate."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(F.col(key), salt) < int(round(fraction * _GRAIN)))


def stratified_hash_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict, salt: str = "sample"
) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy's reproducible
    cousin): `fractions` maps a stratum value → fraction; strata not
    listed are dropped. One pure-Column filter, no shuffle."""
    b = _bucket(F.col(key), salt)
    cond = F.lit(False)
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1], got {frac}")
        cond = cond | (
            (F.col(strata_col) == F.lit(value)) & (b < int(round(frac * _GRAIN)))
        )
    return df.filter(cond)
