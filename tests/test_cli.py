"""End-to-end test of the spark-submit deployment shape.

Builds the --py-files zip, then drives gen-events → init-table →
replay (half the epochs) via `python -m wrangler_spark`, finishes the
replay with a REAL `spark-submit --py-files dist.zip scripts/replay_job.py`
invocation run from a foreign cwd (so the engine import must come from
the zip), and checks the final table digest against the all-at-once
in-process oracle.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_EVENTS = 10_000
EPOCH_SIZE = 2_500  # -> 4 epochs


def _run(cmd, cwd=REPO, env_extra=None):
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_DRIVER_MEM"] = "2g"
    env.setdefault("PYTHONPATH", REPO)
    if env_extra:
        env.update(env_extra)
    out = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=420
    )
    assert out.returncode == 0, f"{cmd}\nSTDOUT:{out.stdout[-2000:]}\nSTDERR:{out.stderr[-4000:]}"
    # last JSON line of stdout is the command's result
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {}


def _spark_submit() -> str | None:
    for cand in (shutil.which("spark-submit"), "/opt/spark/bin/spark-submit"):
        if cand and os.path.exists(cand):
            return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


@pytest.mark.slow
def test_spark_submit_deployment(tmp_path, spark):
    events_dir = str(tmp_path / "events")
    table_dir = str(tmp_path / "table")
    ckpt_dir = str(tmp_path / "ckpt")

    # package for --py-files
    zres = _run([sys.executable, "-m", "wrangler_spark", "package",
                 "--out", str(tmp_path / "wrangler_spark.zip")])
    zip_path = zres["zip"]
    assert os.path.exists(zip_path)

    _run([sys.executable, "-m", "wrangler_spark", "gen-events",
          "--out", events_dir, "--n", str(N_EVENTS),
          "--epoch-size", str(EPOCH_SIZE), "--repos", "10", "--paths", "40"])
    assert os.path.isdir(os.path.join(events_dir, "epoch=0"))

    _run([sys.executable, "-m", "wrangler_spark", "init-table",
          "--table", table_dir, "--buckets", "8"])

    # first half of the epochs in-process
    r1 = _run([sys.executable, "-m", "wrangler_spark", "replay",
               "--events", events_dir, "--table", table_dir,
               "--checkpoint", ckpt_dir, "--to-epoch", "1"])
    assert r1["epochs"] == 2 and r1["skipped_epochs"] == 0

    # remaining epochs via genuine spark-submit --py-files, from a cwd
    # that does NOT contain the package — imports must resolve from zip
    ss = _spark_submit()
    if ss is None:
        pytest.skip("spark-submit not available")
    sres = _run(
        [ss, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "scripts", "replay_job.py"),
         "replay", "--events", events_dir, "--table", table_dir,
         "--checkpoint", ckpt_dir],
        cwd=str(tmp_path),
        env_extra={"PYTHONPATH": ""},
    )
    assert sres["epochs"] == 2 and sres["skipped_epochs"] == 0

    v = _run([sys.executable, "-m", "wrangler_spark", "verify", "--table", table_dir])

    # oracle: all-at-once expected state in-process
    from wrangler_spark.cdc.events import expected_final_state, generate_events
    from wrangler_spark.cdc.replay import final_state_sha256
    from pyspark.sql import functions as F

    ev = generate_events(spark, N_EVENTS, n_repos=10, n_paths_per_repo=40,
                         epoch_size=EPOCH_SIZE)
    exp = final_state_sha256(expected_final_state(ev))
    from wrangler_spark.cdc.replay import state_digest

    rows, digest = state_digest(exp)
    assert v["rows"] == rows
    assert v["table_digest"] == digest


def test_cli_lineage(tmp_path, spark):
    """lineage command: one JSON line per directive with column graph."""
    import json as _json
    import subprocess
    import sys

    src = str(tmp_path / "in.parquet")
    spark.createDataFrame([("a", "b")], "x string, y string").write.parquet(src)
    recipe = tmp_path / "r.txt"
    recipe.write_text("drop :y\nset-column :z concat(x, '!')\n")
    out = subprocess.run(
        [sys.executable, "-m", "wrangler_spark.cli", "lineage",
         "--input", src, "--recipe", str(recipe)],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ops = [_json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    assert ops[0]["dropped"] == ["y"]
    assert ops[1]["inputs"] == ["x"] and ops[1]["added"] == ["z"]


@pytest.mark.slow
def test_cli_replicate_stream(tmp_path, spark):
    """`replicate --stream`: continuous replication through the
    lake-changes streaming source from the CLI, bounded by
    --timeout-sec; the replica's digest must equal the source's."""
    events_dir = str(tmp_path / "events")
    src_dir = str(tmp_path / "src")
    dst_dir = str(tmp_path / "dst")

    _run([sys.executable, "-m", "wrangler_spark", "gen-events",
          "--out", events_dir, "--n", "4000",
          "--epoch-size", "1000", "--repos", "8", "--paths", "30"])
    _run([sys.executable, "-m", "wrangler_spark", "init-table",
          "--table", src_dir, "--buckets", "8"])
    _run([sys.executable, "-m", "wrangler_spark", "init-table",
          "--table", dst_dir, "--buckets", "8"])
    _run([sys.executable, "-m", "wrangler_spark", "replay",
          "--events", events_dir, "--table", src_dir,
          "--checkpoint", str(tmp_path / "ck")])

    r = _run([sys.executable, "-m", "wrangler_spark", "replicate",
              "--source", src_dir, "--replica", dst_dir,
              "--stream", "--checkpoint", str(tmp_path / "repck"),
              "--trigger-interval", "1 seconds", "--timeout-sec", "45"])
    assert r.get("stream") is True

    vs = _run([sys.executable, "-m", "wrangler_spark", "verify", "--table", src_dir])
    vd = _run([sys.executable, "-m", "wrangler_spark", "verify", "--table", dst_dir])
    assert vd["rows"] == vs["rows"]
    assert vd["table_digest"] == vs["table_digest"]
