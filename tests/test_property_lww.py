"""Property-based check of the LWW merge (hypothesis): for ANY sequence
of insert/update/delete events with unique seqs, split arbitrarily into
epochs, the table's final state equals a per-key fold of the events by
seq — the reference-semantics oracle computed in plain Python."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wrangler_spark.cdc.events import repo_files_schema
from wrangler_spark.lake.table import LakeTable

KEYS = [("r1", "a.py"), ("r1", "b.py"), ("r2", "a.py")]


@st.composite
def event_log(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    seqs = draw(
        st.lists(st.integers(0, 10_000), min_size=n, max_size=n, unique=True)
    )
    events = []
    for s in seqs:
        k = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        events.append((s, op, k[0], k[1], f"c{s}", "python", f"v{s}"))
    cuts = draw(st.lists(st.integers(0, n), max_size=3))
    bounds = sorted(set([0, n, *cuts]))
    batches = [events[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]
    return events, batches


def _fold(events):
    state = {}
    for s, op, repo, path, commit, lang, content in sorted(events):
        cur = state.get((repo, path))
        if cur is None or s > cur[0]:
            state[(repo, path)] = (s, op, content)
    return {
        k: v[2] for k, v in state.items() if v[1] != "delete"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(event_log())
def test_lww_merge_matches_python_fold(spark, tmp_path_factory, log):
    events, batches = log
    tmp = tmp_path_factory.mktemp("prop")
    table = LakeTable.create(
        spark, str(tmp / "t"), repo_files_schema(), ["repo", "path"], num_buckets=4
    )
    for i, batch in enumerate(batches):
        df = spark.createDataFrame(
            [
                (s, op, r, p, None if op == "delete" else c,
                 None if op == "delete" else lang,
                 None if op == "delete" else content)
                for (s, op, r, p, c, lang, content) in batch
            ],
            "seq long, op string, repo string, path string, commit string, lang string, content string",
        )
        table.merge(df, epoch=i)
    got = {
        (r["repo"], r["path"]): r["content"] for r in table.read().collect()
    }
    assert got == _fold(events)
