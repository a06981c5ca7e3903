"""Large-scale training-data pipeline operators.

Beyond the reference's directive surface: deduplication, similarity
search, text analysis, multimodal plumbing — the operations a 100 TB
training-data pipeline needs, built Spark-first.
"""

from wrangler_spark.pipeline import dedup, multimodal, similarity, text  # noqa: F401
