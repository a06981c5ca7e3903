"""Sources & sampling (SURVEY.md §2.1).

The reference's core engine has no scans — rows arrive from the host;
its service module samples connections (S3/GCS/BQ/Kafka…) with
reservoir/Bernoulli/Poisson samplers (wrangler-core sampling/*.java).
Here the data plane IS Spark, so sources are `spark.read` wrappers
that feed recipes, and the samplers map to native `df.sample` /
TakeOrdered plans.
"""

from wrangler_spark.sources.readers import (
    bernoulli_sample,
    poisson_sample,
    read_source,
    reservoir_sample,
)

__all__ = ["read_source", "reservoir_sample", "bernoulli_sample", "poisson_sample"]
