"""Round-5 chaos sweep (round-4 verdict task #8): parameterized
kill-point injection over the merge's write sequence —

    CDF write -> bucket write -> snapshot CAS -> watermark stamp

— in BOTH merge modes, asserting at every point that a crash leaves no
partial state visible, replay from the surviving checkpoint converges
to the full-replay oracle (per-key content sha256 equality), and
`remove_orphans` reclaims every stranded staging file while committed
data survives.

Generalizes tests/test_lake_merge.py::
test_crash_between_cdf_and_bucket_write_is_replayable (the single
bucket-write point) into the full sweep the north rule's exactly-once
clause implies: idempotent epoch-fenced commits must make replay from
ANY checkpoint reproduce the reference final state regardless of where
the previous attempt died.
"""

import os

import pytest

from wrangler_spark.cdc.events import (
    expected_final_state,
    generate_events,
    repo_files_schema,
)
from wrangler_spark.cdc.replay import Replayer, final_state_sha256
from wrangler_spark.lake.table import LakeTable

N_EVENTS = 3000
EPOCH_SIZE = 1000  # epochs 0, 1, 2 — the kill lands mid-stream, on epoch 1


@pytest.fixture(scope="module")
def events(spark):
    return generate_events(
        spark, N_EVENTS, n_repos=8, n_paths_per_repo=15, epoch_size=EPOCH_SIZE
    ).cache()


@pytest.fixture(scope="module")
def oracle_sig(events):
    df = expected_final_state(events)
    rows = final_state_sha256(df).collect()
    return sorted((r["repo"], r["path"], r["content_sha256"]) for r in rows)


def _sig(df):
    rows = final_state_sha256(df).collect()
    return sorted((r["repo"], r["path"], r["content_sha256"]) for r in rows)


def _parquets(root):
    out = set()
    for dirpath, _dirs, names in os.walk(root):
        out.update(os.path.join(dirpath, n) for n in names if n.endswith(".parquet"))
    return out


# (kill point, merge mode). write_change_files is cow-only — in mor the
# delta files ARE the change files, so its sequence has no separate CDF
# step; commit/stamp points apply to both modes.
CASES = [
    ("cdf_write", "cow"),
    ("bucket_write", "cow"),
    ("bucket_write", "mor"),
    ("commit_cas", "cow"),
    ("commit_cas", "mor"),
    ("watermark_stamp", "cow"),
    ("watermark_stamp", "mor"),
]


@pytest.mark.parametrize("kill,mode", CASES, ids=[f"{k}-{m}" for k, m in CASES])
def test_killpoint_replay_converges(
    spark, events, oracle_sig, tmp_path, monkeypatch, kill, mode
):
    table = LakeTable.create(
        spark,
        str(tmp_path / "tbl"),
        repo_files_schema(),
        ["repo", "path"],
        num_buckets=8,
    )
    ckpt_dir = str(tmp_path / "ckpt")
    rp = Replayer(table, ckpt_dir, mode=mode)
    rp.replay(events, to_epoch=0)  # healthy first epoch
    v0 = LakeTable.load(spark, table.path).version
    before = _parquets(table.path)

    target = {
        "cdf_write": (LakeTable, "write_change_files"),
        "bucket_write": (LakeTable, "write_buckets"),
        "commit_cas": (LakeTable, "commit"),
        "watermark_stamp": (Replayer, "save_checkpoint"),
    }[kill]
    orig = getattr(target[0], target[1])

    def boom(self, *a, **k):
        raise RuntimeError(f"injected crash at {kill}")

    monkeypatch.setattr(target[0], target[1], boom)
    with pytest.raises(RuntimeError, match="injected"):
        rp.replay(events, to_epoch=1)
    monkeypatch.setattr(target[0], target[1], orig)

    crashed = LakeTable.load(spark, table.path)
    if kill == "watermark_stamp":
        # the commit published before the stamp: epoch 1 is fenced,
        # the checkpoint is behind — exactly the window fencing covers
        assert 1 in crashed.committed_epochs
        assert Replayer(crashed, ckpt_dir, mode=mode).load_checkpoint()[
            "last_epoch"
        ] == 0
    else:
        # nothing published: version unchanged, epoch 1 unfenced, and
        # the epoch-0 state is still served intact
        assert crashed.version == v0
        assert 1 not in crashed.committed_epochs
        assert _sig(crashed.read()) == _sig(expected_final_state(
            events.filter("epoch <= 0")
        ))

    # resume from the surviving checkpoint in a "fresh process":
    # fenced epochs skip, unfenced epochs re-run, stragglers follow
    rp2 = Replayer(LakeTable.load(spark, table.path), ckpt_dir, mode=mode)
    rp2.replay(events)
    final = LakeTable.load(spark, table.path)
    assert _sig(final.read()) == oracle_sig

    # orphaned staging from the crashed attempt is reclaimed; nothing
    # referenced by the final snapshot is touched
    final.remove_orphans(older_than_s=0)
    after_gc = LakeTable.load(spark, final.path)
    assert _sig(after_gc.read()) == oracle_sig
    # every surviving parquet is referenced by SOME retained snapshot:
    # base, delta, or change files — i.e. the crashed attempt's staging
    # is gone and GC deleted nothing it shouldn't
    hist_refs = set()
    for v in range(after_gc.version + 1):
        try:
            s = LakeTable.load(spark, table.path, version=v)
        except Exception:
            continue
        hist_refs |= {os.path.join(table.path, r) for r in s.all_files()}
        hist_refs |= {os.path.join(table.path, r) for r in s.delta_rels()}
        hist_refs |= {
            os.path.join(table.path, r) for r in (s.snap.get("changes") or [])
        }
    leaked = _parquets(table.path) - hist_refs
    assert not leaked, f"unreferenced files survived GC: {leaked}"
