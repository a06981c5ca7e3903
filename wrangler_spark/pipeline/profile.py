"""Column statistics / profile — the interactive `/summary` surface.

Reference: wrangler-core statistics/BasicStatistics.java:28-82 computes
per-column type% / stat% over the workspace sample, exposed through the
service's `/summary` endpoint (DirectivesHandler.java:595-610).

Spark-first shape: ONE aggregation pass over the table computes every
column's stats simultaneously (null/empty fractions, distinct count,
min/max, and a numeric-parsability fraction — the TypeInference
equivalent for string columns). All measures are algebraic or sketch
aggregates, so they combine map-side: a single shuffle of constant-size
state per column, which holds at any table size. `approx=True`
(default) uses HyperLogLog distinct counts — the 100 TB path;
`approx=False` uses exact distinct (expand-based) for small samples
and oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUM_RE = r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*$"


def profile(df: DataFrame, columns: list[str] | None = None, approx: bool = True) -> DataFrame:
    """Per-column profile: (column, dtype, total, non_null, nulls,
    null_frac, empty, distinct, min_value, max_value, numeric_frac).

    min/max/values are stringified so heterogeneous column types fit one
    long-format result. numeric_frac is the fraction of non-null cells
    that parse as a number — string columns only (1.0 for numeric
    types, matching the reference's type-inference percentages).
    """
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        dt = fields[c]
        is_str = isinstance(dt, T.StringType)
        sc = F.col(c)
        aggs.append(F.count(sc).alias(f"{c}__nn"))
        aggs.append(
            (
                F.count_distinct(sc)
                if not approx
                else F.approx_count_distinct(sc)
            ).alias(f"{c}__dist")
        )
        # min/max on the NATIVE type (numeric order), stringified after
        aggs.append(F.min(sc).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(sc).cast("string").alias(f"{c}__max"))
        if is_str:
            aggs.append(F.sum(F.when(sc == "", 1).otherwise(0)).alias(f"{c}__empty"))
            aggs.append(
                F.sum(F.when(sc.rlike(_NUM_RE), 1).otherwise(0)).alias(f"{c}__num")
            )
        elif isinstance(dt, T.NumericType):
            aggs.append(F.lit(0).alias(f"{c}__empty"))
            aggs.append(F.count(sc).alias(f"{c}__num"))
        else:
            aggs.append(F.lit(0).alias(f"{c}__empty"))
            aggs.append(F.lit(0).alias(f"{c}__num"))
    row = df.agg(*aggs).first()

    total = int(row["__total"])
    out_rows = []
    for c in cols:
        nn = int(row[f"{c}__nn"])
        out_rows.append(
            (
                c,
                fields[c].simpleString(),
                total,
                nn,
                total - nn,
                float(total - nn) / total if total else 0.0,
                int(row[f"{c}__empty"] or 0),
                int(row[f"{c}__dist"]),
                row[f"{c}__min"],
                row[f"{c}__max"],
                float(row[f"{c}__num"] or 0) / nn if nn else 0.0,
            )
        )
    schema = (
        "column string, dtype string, total long, non_null long, nulls long, "
        "null_frac double, empty long, distinct long, min_value string, "
        "max_value string, numeric_frac double"
    )
    return df.sparkSession.createDataFrame(out_rows, schema)


# --------------------------------------------------------- semantic types
# The reference's BasicStatistics (statistics/BasicStatistics.java) runs
# a FinderEngine regex battery (resources/wrangler-finder.xml) over every
# cell and reports per-column type percentages through the /summary
# service. Same surface here, as ONE global aggregation: for each string
# column x type, a map-side rlike sum — full-scan + partial agg, no extra
# shuffle, so it holds at 100 TB. Patterns are standard forms written
# fresh (SSN, US phone, zip, ipv4, email, URL, date, currency, ...).

SEMANTIC_TYPES: dict[str, str] = {
    "ssn": r"^\d{3}[- ]\d{2}[- ]\d{4}$",
    "us_phone": r"^(\+?1[-. ])?(\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}$",
    "zip_code": r"^\d{5}(-\d{4})?$",
    "ipv4": r"^((25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(25[0-5]|2[0-4]\d|1?\d?\d)$",
    "mac_address": r"^([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}$",
    "email": r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$",
    "url": r"^(https?|ftp)://[^\s/$.?#].[^\s]*$",
    "date": r"^(\d{1,2}/\d{1,2}/\d{4}|\d{4}-\d{2}-\d{2})$",
    "time": r"^\d{1,2}:\d{2}(:\d{2})?( ?[AaPp][Mm])?$",
    "currency": r"^\(?[$€£¥]\s?[\d,]+(\.\d+)?\)?$",
    "gender": r"^(?i)(m|f|male|female|non-binary|nb)$",
    "boolean": r"^(?i)(true|false|yes|no|t|f|y|n)$",
    "integer": r"^[+-]?\d+$",
    "number": r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$",
}


def semantic_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format (column, type, matches, non_null, frac) for every
    string column x semantic type with at least one match."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = [
        c for c in (columns or df.columns)
        if isinstance(fields[c], T.StringType)
    ]
    aggs = []
    for c in cols:
        sc = F.col(c)
        aggs.append(F.count(sc).alias(f"{c}__nn"))
        for tname, rx in SEMANTIC_TYPES.items():
            aggs.append(
                F.sum(F.when(sc.rlike(rx), 1).otherwise(0)).alias(f"{c}__{tname}")
            )
    if not aggs:
        return df.sparkSession.createDataFrame(
            [], "column string, type string, matches long, non_null long, frac double"
        )
    row = df.agg(*aggs).first()
    out = []
    for c in cols:
        nn = int(row[f"{c}__nn"] or 0)
        for tname in SEMANTIC_TYPES:
            m = int(row[f"{c}__{tname}"] or 0)
            if m:
                out.append((c, tname, m, nn, float(m) / nn if nn else 0.0))
    return df.sparkSession.createDataFrame(
        out, "column string, type string, matches long, non_null long, frac double"
    )
