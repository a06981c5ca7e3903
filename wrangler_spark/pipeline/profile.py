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
