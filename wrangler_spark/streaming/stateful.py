"""Custom stateful streaming operators via applyInPandasWithState.

The batch replayer covers the lake-upsert path; these cover the
*streaming-native* stateful surface the reference's transient-variable
directives imply at GLOBAL scope (SURVEY.md §2.6) when the input is an
unbounded change stream:

- `key_progress`: per-key running state over the CDC stream — events
  seen, last commit sequence, ops breakdown — maintained incrementally
  in GroupState (no re-aggregation of history), emitted once per
  micro-batch for keys that changed.
- `sessionize`: commit-sequence-gap session windows per key — a gap
  of more than `gap` in the key's seq stream closes the episode and
  opens the next. Gap-by-sequence (not wall clock) keeps sessionization
  DETERMINISTIC under replay-from-checkpoint, matching the engine's
  exactly-once story. (ProcessingTimeTimeout-based sessions crash the
  Python worker in this PySpark build; sequence gaps are also the more
  faithful notion for a binlog.)

Both are Arrow-batched (pandas per key-group), never per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("events", T.LongType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("inserts", T.LongType()),
        T.StructField("updates", T.LongType()),
        T.StructField("deletes", T.LongType()),
    ]
)

_PROGRESS_STATE = T.StructType(
    [
        T.StructField("events", T.LongType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("inserts", T.LongType()),
        T.StructField("updates", T.LongType()),
        T.StructField("deletes", T.LongType()),
    ]
)


def _progress_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        events, last_seq, ins, upd, dele = state.get
    else:
        events, last_seq, ins, upd, dele = 0, -1, 0, 0, 0
    for pdf in pdfs:
        events += len(pdf)
        if len(pdf):
            last_seq = max(last_seq, int(pdf["seq"].max()))
            ops = pdf["op"].value_counts()
            ins += int(ops.get("insert", 0))
            upd += int(ops.get("update", 0))
            dele += int(ops.get("delete", 0))
    state.update((events, last_seq, ins, upd, dele))
    yield pd.DataFrame(
        {
            "repo": [key[0]],
            "path": [key[1]],
            "events": [events],
            "last_seq": [last_seq],
            "inserts": [ins],
            "updates": [upd],
            "deletes": [dele],
        }
    )


def key_progress(stream: DataFrame) -> DataFrame:
    """Per-(repo, path) running progress over an unbounded change
    stream; one updated row per changed key per micro-batch. State is
    O(keys), never the event history."""
    return stream.groupBy("repo", "path").applyInPandasWithState(
        _progress_fn,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_PROGRESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("session_events", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("session_events", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("last_seq", T.LongType()),
    ]
)


_SESSION_GAP = 1000  # default max in-session seq gap


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, first, last = state.get
    else:
        n, first, last = 0, -1, -1
    closed: list[tuple[int, int, int]] = []
    seqs: list[int] = []
    for pdf in pdfs:
        if len(pdf):
            seqs.extend(int(v) for v in pdf["seq"].tolist())
    for sq in sorted(seqs):
        if last >= 0 and sq - last > _SESSION_GAP:
            closed.append((n, first, last))
            n, first = 0, sq
        if first < 0:
            first = sq
        n += 1
        last = sq
    state.update((int(n), int(first), int(last)))
    out = {
        "repo": [], "path": [], "session_events": [],
        "first_seq": [], "last_seq": [], "closed": [],
    }
    for cn, cf, cl in closed:
        out["repo"].append(key[0]); out["path"].append(key[1])
        out["session_events"].append(cn); out["first_seq"].append(cf)
        out["last_seq"].append(cl); out["closed"].append(True)
    out["repo"].append(key[0]); out["path"].append(key[1])
    out["session_events"].append(n); out["first_seq"].append(first)
    out["last_seq"].append(last); out["closed"].append(False)
    yield pd.DataFrame(out)


def sessionize(stream: DataFrame) -> DataFrame:
    """Commit-burst sessions per (repo, path): a gap of more than
    _SESSION_GAP in the key's commit-sequence stream closes the episode
    (emitted with closed=True) and opens the next. Emits the running
    open session on every update; deterministic under replay."""
    return stream.groupBy("repo", "path").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    ts_col: str = "event_ts",
    key_col: str = "repo",
    seq_col: str = "seq",
):
    """Watermarked tumbling-window aggregation over the change stream —
    the late-data surface (Structured Streaming's canonical shape:
    `withWatermark` bounds state, late events beyond the delay are
    dropped, windows finalize once the watermark passes their end).

    Returns (window_start, window_end, key, events, last_seq) per
    closed window. Pure built-in operators: watermark + window groupBy
    compile to a streaming aggregation with state-store-backed partial
    aggregates — scales with keys × open windows, not with history.
    """
    from pyspark.sql import functions as F

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.max(seq_col).alias("last_seq"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(key_col),
            "events",
            "last_seq",
        )
    )
