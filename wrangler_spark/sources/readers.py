"""spark.read wrappers + sampling algorithms."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wrangler_spark.errors import UsageError

_TEXT_FORMATS = {"csv", "tsv", "text", "log", "json", "jsonl"}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: dict | None = None,
) -> DataFrame:
    """Read a source for recipe processing.

    Text-ish formats (csv/tsv/text/log/json) load as a single `body`
    string column — the reference's model where parser *directives*
    decode formats inside rows (SURVEY.md §2.2) — so the same recipe
    works on a file, a Kafka value, or a CDC payload. Columnar formats
    (parquet/orc/avro) load natively.
    """
    options = options or {}
    fmt = fmt.lower()
    if fmt in _TEXT_FORMATS:
        df = spark.read.options(**options).text(path)
        return df.withColumnRenamed("value", "body")
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.format(fmt).load(path)
    except Exception as e:  # noqa: BLE001
        raise UsageError(f"read_source: cannot read {path!r} as {fmt!r}: {e}") from e


def reservoir_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Uniform n-row sample (reference sampling/Reservoir.java:35).

    rand-key + global top-n: Spark plans orderBy+limit as
    TakeOrderedAndProject — each partition keeps n candidates, the
    driver merges; no full sort, no full shuffle."""
    return (
        df.withColumn("__r", F.rand(seed))
        .orderBy("__r")
        .limit(n)
        .drop("__r")
    )


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Per-row coin flip (reference sampling/Bernoulli.java)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def poisson_sample(df: DataFrame, mean_fraction: float, seed: int = 42) -> DataFrame:
    """Poisson sampling — rows may repeat (reference sampling/Poisson.java)."""
    return df.sample(withReplacement=True, fraction=mean_fraction, seed=seed)
