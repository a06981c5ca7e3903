"""Lake table as a first-class BATCH Python DataSource.

    register_lake_source(spark)
    df = (spark.read.format("lake")
          .option("path", table_path)
          .option("version", 7)          # or tag=..., branch=...,
          .load())                        #    asOfTimestamp=...

PySpark 4's Python DataSource API (SPARK-44076) + batch filter
pushdown (SPARK 4.1 `pushFilters`) make the snapshot-versioned lake
table readable through Spark's native reader the way Delta/Iceberg
tables are — `LakeTable.read()` stays the primary engine path; this
source is the API-parity surface for consumers that speak
`spark.read.format(...)` (SQL `CREATE TABLE ... USING`, notebooks,
connectors).

Scale design, mirroring the streaming `lake-changes` source:
- **Planning is metadata-only.** The snapshot (hydrated through the
  metadata diff log), its stats sidecars and the option-resolved
  version/tag/branch pin are all plain-JSON reads in the planning
  worker — no SparkSession, no file listing, no data-file opens.
- **Partitions are buckets.** Keys are bucket-aligned, so each bucket's
  base+delta files are a self-contained LWW resolution domain: one
  `InputPartition` per non-empty bucket, read EXECUTOR-side with
  pyarrow. No data moves through the driver.
- **Filter pushdown prunes files, Spark re-applies residuals.** Pushed
  =/</<=/>/>=/IN conjuncts drop files whose footer [min, max] provably
  excludes every row (same conservative contract as
  `LakeTable.scan_plan`); ALL filters are returned to Spark as
  remaining, so pruning can only cut I/O, never change answers.
  Buckets holding pending merge-on-read deltas are exempt from file
  skipping (dropping a base row there could let a stale lower-seq
  delta row win read-time resolution — the scan_plan stale-delta trap).
- **MoR resolution is per-bucket.** highest `__seq` wins, base wins
  seq ties (the copy-on-write `s.seq > t.seq` guard), duplicate tied
  delta rows collapse to one — byte-identical semantics to
  `LakeTable._resolved`; tombstones are filtered from the output.

reference: Wrangler has no lake/table source (its connectors are
format parsers, surveyed in SURVEY.md §2.1); the public behavioral
model here is Delta's `spark.read.format("delta")` path pruning and
Iceberg's metadata-plan scan.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from wrangler_spark.streaming.change_source import _arrow_type

_META = "_meta"


def _mdir(path: str, branch: str | None) -> str:
    return (
        os.path.join(path, _META)
        if not branch
        else os.path.join(path, _META, f"branch-{branch}")
    )


def _current_version(mdir: str) -> int:
    with open(os.path.join(mdir, "VERSION")) as f:
        return int(f.read().strip())


def _resolve_snapshot(options) -> tuple[dict, str]:
    """Option-resolved snapshot pin (version / tag / asOfTimestamp /
    branch — at most one of the first three), hydrated through the
    metadata log. Pure JSON: runs in the planning worker, no session."""
    from wrangler_spark.lake.table import _read_snapshot, _version_path

    path = options.get("path")
    if not path:
        raise ValueError("lake: option 'path' is required")
    branch = options.get("branch")
    mdir = _mdir(path, branch)
    if not os.path.isdir(mdir):
        raise ValueError(f"lake: no table/branch metadata at {mdir}")
    picks = [k for k in ("version", "tag", "asoftimestamp") if options.get(k)]
    if len(picks) > 1:
        raise ValueError(f"lake: pass at most one of version/tag/asOfTimestamp, got {picks}")
    head = _read_snapshot(mdir, _current_version(mdir))
    v: int | None = None
    if options.get("version") is not None:
        v = int(options["version"])
    elif options.get("tag"):
        tags = head.get("tags", {})
        if options["tag"] not in tags:
            raise ValueError(f"lake: no tag {options['tag']!r} (have {sorted(tags)})")
        v = int(tags[options["tag"]])
    elif options.get("asoftimestamp"):
        ts = float(options["asoftimestamp"])
        cands = []
        for fn in os.listdir(mdir):
            if fn.startswith("version-") and fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    s = json.load(f)
                if s.get("ts") is not None and float(s["ts"]) <= ts:
                    cands.append(int(s["version"]))
        if not cands:
            raise ValueError(f"lake: no retained snapshot at or before ts={ts}")
        v = max(cands)
    snap = head if v is None else _read_snapshot(mdir, v)
    return snap, path


def _load_stats(path: str, snap: dict) -> dict:
    """rel -> per-file footer stats, merged from the snapshot's sidecar
    manifests (pure JSON — the planning-time working set)."""
    out: dict = dict(snap.get("stats") or {})  # legacy inline
    for m in snap.get("stats_manifests") or []:
        p = os.path.join(path, m["path"])
        try:
            with open(p) as f:
                out.update(json.load(f))
        except FileNotFoundError:
            pass  # expired sidecar: files it covered are gone too
    return out


def _can_match(fstats: dict | None, aliases: dict, filters: list) -> bool:
    """Footer-stats exclusion check — the `_file_can_match` contract,
    restricted to string/int/float literals (datetimes never prune
    here: the source has no session timezone to interpret them in)."""
    if not fstats or not filters:
        return True
    for col, op, val in filters:
        names = [col] + [str(a).lower() for a in aliases.get(col, [])]
        st = next((fstats[n] for n in names if n in fstats), None)
        if st is None:
            continue
        mn, mx = st[0], st[1]
        vals = list(val) if op == "in" else [val]
        if not vals:
            continue  # empty IN: Spark folds it to false; never prune on it
        if not all(isinstance(x, (str, int, float)) and not isinstance(x, bool) for x in vals):
            continue
        bound = mn if mn is not None else mx
        if bound is not None and not all(
            isinstance(x, str) == isinstance(bound, str) for x in vals
        ):
            continue  # cross-type compare is not provable
        def outside(v):
            if op in ("=", "in"):
                return (mn is not None and v < mn) or (mx is not None and v > mx)
            if op == "<":
                return mn is not None and mn >= v
            if op == "<=":
                return mn is not None and mn > v
            if op == ">":
                return mx is not None and mx <= v
            if op == ">=":
                return mx is not None and mx < v
            return False
        try:
            if all(outside(v) for v in vals):
                return False
        except TypeError:
            continue  # unprovable comparison: keep the file
    return True


@dataclass
class _BucketPartition(InputPartition):
    bucket: int
    base_files: list = field(default_factory=list)
    delta_files: list = field(default_factory=list)


class LakeBatchReader(DataSourceReader):
    def __init__(self, options):
        snap, path = _resolve_snapshot(options)
        self.path = path
        self.schema_json = snap["schema"]
        self.aliases = {
            str(k).lower(): [str(a).lower() for a in v]
            for k, v in (snap.get("aliases") or {}).items()
        }
        self.key_cols = [str(k) for k in snap["key_cols"]]
        self.files = {b: list(r) for b, r in snap.get("files", {}).items() if r}
        self.deltas = {b: list(r) for b, r in (snap.get("deltas") or {}).items() if r}
        self.stats = _load_stats(path, snap)
        self.pushed: list = []
        self.files_skipped = 0

    def pushFilters(self, filters):
        """Record =/range/IN conjuncts on top-level columns for FILE
        PRUNING; every filter is returned as remaining, so Spark always
        re-applies the full predicate (pruning cuts I/O only)."""
        for f_ in filters:
            if isinstance(f_, EqualTo) and len(f_.attribute) == 1:
                self.pushed.append((f_.attribute[0].lower(), "=", f_.value))
            elif isinstance(f_, In) and len(f_.attribute) == 1:
                self.pushed.append((f_.attribute[0].lower(), "in", list(f_.value)))
            elif isinstance(f_, GreaterThan) and len(f_.attribute) == 1:
                self.pushed.append((f_.attribute[0].lower(), ">", f_.value))
            elif isinstance(f_, GreaterThanOrEqual) and len(f_.attribute) == 1:
                self.pushed.append((f_.attribute[0].lower(), ">=", f_.value))
            elif isinstance(f_, LessThan) and len(f_.attribute) == 1:
                self.pushed.append((f_.attribute[0].lower(), "<", f_.value))
            elif isinstance(f_, LessThanOrEqual) and len(f_.attribute) == 1:
                self.pushed.append((f_.attribute[0].lower(), "<=", f_.value))
        return filters  # conservative: Spark evaluates everything again

    def partitions(self):
        parts = []
        buckets = sorted({*self.files, *self.deltas}, key=int)
        for b in buckets:
            base = [os.path.join(self.path, r) for r in self.files.get(b, [])]
            deltas = [os.path.join(self.path, r) for r in self.deltas.get(b, [])]
            if not deltas and self.pushed:
                kept = [
                    p for p, rel in zip(base, self.files.get(b, []))
                    if _can_match(self.stats.get(rel), self.aliases, self.pushed)
                ]
                self.files_skipped += len(base) - len(kept)
                base = kept
            if base or deltas:
                parts.append(_BucketPartition(int(b), base, deltas))
        # the stats working set is planning-only — don't ship O(files)
        # metadata to every executor with the pickled reader
        self.stats = {}
        # the engine requires >=1 partition; an empty table (or a fully
        # pruned scan) reads as one no-op partition
        return parts or [_BucketPartition(-1, [], [])]

    def read(self, partition: _BucketPartition):
        """Executor-side: the bucket's base∪delta files → LWW-resolved
        live rows as Arrow batches. Aliases resolve pre-rename files;
        missing columns null-fill (Iceberg read-time projection)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = T.StructType.fromJson(self.schema_json)
        fields = [(f_.name, _arrow_type(f_.dataType)) for f_ in schema.fields]

        def load(path_):
            tbl = pq.read_table(path_)
            names_l = {n.lower(): n for n in tbl.column_names}

            def col(name_l, target):
                src = names_l.get(name_l)
                if src is None:
                    for a in self.aliases.get(name_l, []):
                        src = names_l.get(a)
                        if src is not None:
                            break
                if src is None:
                    return pa.nulls(tbl.num_rows, type=target)
                c = tbl.column(src)
                return c.cast(target) if c.type != target else c

            arrays = [col(n.lower(), at) for n, at in fields]
            out_fields = [pa.field(n, at) for n, at in fields]
            arrays.append(col("__seq", pa.int64()))
            out_fields.append(pa.field("__seq", pa.int64()))
            deleted = col("__deleted", pa.bool_())
            import pyarrow.compute as pc

            arrays.append(pc.fill_null(deleted, False))
            out_fields.append(pa.field("__deleted", pa.bool_()))
            return pa.table(arrays, schema=pa.schema(out_fields))

        import pyarrow.compute as pc

        base = [load(p) for p in partition.base_files]
        out = pa.concat_tables(base) if base else None
        if partition.delta_files:
            delta = pa.concat_tables([load(p) for p in partition.delta_files])
            both = delta if out is None else pa.concat_tables(
                [out.append_column("__is_base", pa.nulls(out.num_rows, pa.bool_()).fill_null(True)),
                 delta.append_column("__is_base", pa.nulls(delta.num_rows, pa.bool_()).fill_null(False))]
            )
            if out is None:
                both = both.append_column(
                    "__is_base", pa.nulls(both.num_rows, pa.bool_()).fill_null(False)
                )
            pdf = both.to_pandas()
            keys = [
                next(n for n, _ in fields if n.lower() == k.lower())
                for k in self.key_cols
            ]
            # highest seq wins; base wins ties; tied duplicate delta
            # rows collapse to one — LakeTable._resolved semantics
            pdf = (
                pdf.sort_values([*keys, "__seq", "__is_base"], kind="stable")
                .groupby(keys, as_index=False, sort=False)
                .tail(1)
            )
            pdf = pdf[~pdf["__deleted"]].drop(columns=["__seq", "__deleted", "__is_base"])
            out = pa.Table.from_pandas(
                pdf, schema=pa.schema([pa.field(n, at) for n, at in fields]),
                preserve_index=False,
            )
        else:
            if out is None:
                return iter(())
            out = out.filter(pc.equal(out.column("__deleted"), False))
            out = out.drop(["__seq", "__deleted"])
        yield from out.to_batches()


class LakeDataSource(DataSource):
    """`spark.read.format("lake").option("path", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "lake"

    def schema(self) -> str:
        snap, _ = _resolve_snapshot(self.options)
        schema = T.StructType.fromJson(snap["schema"])
        return ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )

    def reader(self, schema) -> LakeBatchReader:
        return LakeBatchReader(self.options)


def register_lake_source(spark) -> None:
    """Register the batch source on a session (idempotent). Python
    data-source filter pushdown is a runtime SQL conf — enable it so
    the stats-pruning pushFilters path is live (get_spark sets it by
    default; this covers foreign sessions)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeDataSource)


def read_lake(
    spark,
    path: str,
    version: int | None = None,
    tag: str | None = None,
    as_of_ts: float | None = None,
    branch: str | None = None,
):
    """Convenience wrapper: a batch DataFrame of the table's resolved
    live rows at the pinned snapshot (current head by default)."""
    register_lake_source(spark)
    r = spark.read.format("lake").option("path", path)
    if version is not None:
        r = r.option("version", str(version))
    if tag is not None:
        r = r.option("tag", tag)
    if as_of_ts is not None:
        r = r.option("asOfTimestamp", str(as_of_ts))
    if branch is not None:
        r = r.option("branch", branch)
    return r.load()
