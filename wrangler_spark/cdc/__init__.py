from wrangler_spark.cdc.events import generate_events, repo_files_schema
from wrangler_spark.cdc.replay import Replayer

__all__ = ["generate_events", "repo_files_schema", "Replayer"]
