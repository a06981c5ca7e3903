from wrangler_spark.cdc.events import generate_events, repo_files_schema
from wrangler_spark.cdc.replay import Replayer
from wrangler_spark.cdc.replicate import Replicator

__all__ = ["generate_events", "repo_files_schema", "Replayer", "Replicator"]
