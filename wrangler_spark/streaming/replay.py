"""Structured-Streaming front-end for the CDC replayer.

Batch replay (cdc/replay.py) is the canonical path; this wraps the
same merge in `readStream → foreachBatch`, the standard Spark shape
for a continuously tailed binlog: each micro-batch is LWW-merged with
the micro-batch id as the fencing epoch, so Structured Streaming's
at-least-once foreachBatch becomes exactly-once through the table's
idempotent epoch-fenced commit — the documented pattern for
transactional sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from wrangler_spark.cdc.replay import Replayer
from wrangler_spark.lake.table import LakeTable
from wrangler_spark.recipe.compiler import CompiledRecipe


def stream_replay(
    stream: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    recipe: str | list[str] | CompiledRecipe | None = None,
    trigger_available_now: bool = True,
    seq_col: str = "seq",
    op_col: str = "op",
    mode: str = "cow",
    compact_every: int | None = None,
):
    """Start a streaming query that upserts each micro-batch into the
    table. Returns the StreamingQuery (caller awaits/stops it).

    `mode="mor"` merges each micro-batch as merge-on-read delta files
    (the low-latency shape for a continuously tailed binlog — per-batch
    cost is O(batch), not O(touched buckets)), compacting every
    `compact_every` batches; identical resolved state either way."""
    rp = Replayer(table, checkpoint_dir, recipe=recipe, seq_col=seq_col, op_col=op_col)
    since_compact = {"n": 0}

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        transformed, _err = rp._apply_recipe(batch_df)
        if rp.epoch_col in transformed.columns:
            transformed = transformed.drop(rp.epoch_col)
        res = table.merge(
            transformed, seq_col=seq_col, op_col=op_col, epoch=int(batch_id), mode=mode
        )
        if mode == "mor" and compact_every and not res.get("skipped"):
            since_compact["n"] += 1
            if since_compact["n"] >= compact_every:
                table.compact()
                since_compact["n"] = 0

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", f"{checkpoint_dir}/spark"
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
