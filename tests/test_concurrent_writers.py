"""Two Replayers racing REAL THREADS into one table: the optimistic-
concurrency CAS (exclusive create of version-N.json) must let exactly
one writer win each version, the loser's reload-and-retry must
converge, and the final state must equal the sequential LWW oracle.

Round-3 CAS tests simulated the conflict sequentially via stale
handles (tests/test_lake_scan.py); this exercises the actual
interleaving: concurrent merges, concurrent VERSION-pointer updates,
epoch fencing observed mid-race. Models HA failover — two replayers
tailing the same binlog — where both must be safe to run at once
(BASELINE.json north rule: exactly-once under replay from any point).
"""

import threading
import time

from pyspark.sql import functions as F

from wrangler_spark.cdc import generate_events
from wrangler_spark.cdc.events import expected_final_state, repo_files_schema
from wrangler_spark.cdc.replay import Replayer, final_state_sha256
from wrangler_spark.lake.table import CommitConflictError, LakeTable

N_EPOCHS = 6


def _race(spark, tmp_path, mode):
    ev = generate_events(
        spark, 1800, n_repos=12, n_paths_per_repo=30, epoch_size=300
    ).cache()
    path = str(tmp_path / f"tbl_{mode}")
    LakeTable.create(spark, path, repo_files_schema(), ["repo", "path"], num_buckets=4)

    stats = {"conflicts": 0, "fenced_skips": 0}
    lock = threading.Lock()
    failures: list = []

    def worker(tag: str):
        try:
            rp = Replayer(
                LakeTable.load(spark, path),
                str(tmp_path / f"ckpt_{mode}_{tag}"),
                mode=mode,
            )
            for e in range(N_EPOCHS):
                while True:
                    try:
                        res = rp.replay_epoch(ev, e)
                        if res.get("skipped"):
                            with lock:
                                stats["fenced_skips"] += 1
                        break
                    except CommitConflictError:
                        with lock:
                            stats["conflicts"] += 1
                        time.sleep(0.05)
                        rp.table = LakeTable.load(spark, path)
        except Exception as exc:  # noqa: BLE001 — surfaced in main thread
            failures.append((tag, exc))

    threads = [threading.Thread(target=worker, args=(t,)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not failures, failures

    final = LakeTable.load(spark, path)
    # every epoch committed exactly once, regardless of which thread won
    assert final.committed_epochs == set(range(N_EPOCHS))
    # the racing interleaving converged to the sequential oracle
    got = {tuple(r) for r in final_state_sha256(final.read()).collect()}
    want = {tuple(r) for r in final_state_sha256(expected_final_state(ev)).collect()}
    assert got == want and got
    # exactly one row per key survives (MoR tied-seq retry guard)
    dup = (
        final.read().groupBy("repo", "path").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    ev.unpersist()
    return stats


def test_two_replayers_race_cow(spark, tmp_path):
    stats = _race(spark, tmp_path, "cow")
    # with 2 threads replaying the same 6 epochs, the duplicate work
    # must surface as conflicts and/or fenced skips — 6 epochs were
    # attempted twice but committed once
    assert stats["conflicts"] + stats["fenced_skips"] >= N_EPOCHS


def test_two_replayers_race_mor(spark, tmp_path):
    stats = _race(spark, tmp_path, "mor")
    assert stats["conflicts"] + stats["fenced_skips"] >= N_EPOCHS


def test_dml_races_replay(spark, tmp_path):
    """A DML writer (DELETE WHERE, one key per commit) races a CDC
    Replayer into the same table on a DISJOINT key set — so the final
    state is deterministic regardless of interleaving: the replay's
    LWW oracle plus zero surviving DML keys. Exercises the CAS from
    the DML commit path (orphaned rewrite files on a lost race must be
    retried after reload, never double-applied)."""
    ev = generate_events(
        spark, 1200, n_repos=10, n_paths_per_repo=30, epoch_size=300
    ).cache()
    path = str(tmp_path / "tbl_dmlrace")
    t0 = LakeTable.create(
        spark, path, repo_files_schema(), ["repo", "path"], num_buckets=4
    )
    # seed keys the event stream never touches (its repos are org*/repo*)
    dml_rows = [
        (1_000_000 + i, "insert", "dmlzone", f"k{i}.py", "c", "python", f"v{i}")
        for i in range(8)
    ]
    t0.merge(
        spark.createDataFrame(
            dml_rows,
            "seq long, op string, repo string, path string, commit string, lang string, content string",
        ),
        epoch=999,
    )

    stats = {"conflicts": 0}
    lock = threading.Lock()
    failures: list = []

    def replayer():
        try:
            rp = Replayer(LakeTable.load(spark, path), str(tmp_path / "ck_dmlrace"))
            for e in range(4):
                while True:
                    try:
                        rp.replay_epoch(ev, e)
                        break
                    except CommitConflictError:
                        with lock:
                            stats["conflicts"] += 1
                        time.sleep(0.05)
                        rp.table = LakeTable.load(spark, path)
        except Exception as exc:  # noqa: BLE001
            failures.append(("replay", exc))

    def dml_writer():
        try:
            for i in range(8):
                tb = LakeTable.load(spark, path)
                while True:
                    try:
                        tb.delete_where(
                            [("repo", "=", "dmlzone"), ("path", "=", f"k{i}.py")],
                            mode="cow" if i % 2 == 0 else "mor",
                        )
                        break
                    except CommitConflictError:
                        with lock:
                            stats["conflicts"] += 1
                        time.sleep(0.05)
                        tb = LakeTable.load(spark, path)
        except Exception as exc:  # noqa: BLE001
            failures.append(("dml", exc))

    threads = [
        threading.Thread(target=replayer),
        threading.Thread(target=dml_writer),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not failures, failures

    final = LakeTable.load(spark, path)
    assert final.read().filter(F.col("repo") == "dmlzone").count() == 0
    got = {
        tuple(r)
        for r in final_state_sha256(
            final.read().filter(F.col("repo") != "dmlzone")
        ).collect()
    }
    want = {tuple(r) for r in final_state_sha256(expected_final_state(ev)).collect()}
    assert got == want and got
    dup = (
        final.read().groupBy("repo", "path").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    ev.unpersist()
