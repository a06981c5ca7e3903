from wrangler_spark.streaming.replay import stream_replay
from wrangler_spark.streaming.stateful import key_progress, sessionize

__all__ = ["stream_replay", "key_progress", "sessionize"]
