"""Write-Audit-Publish (staged commits).

The Iceberg WAP pattern (`write.wap.enabled` / branch staging;
Netflix's audit pipelines) adapted to this lake's snapshot model: a
merge or DML run does ALL of its work — data files written, stats and
bloom sidecars collected, the snapshot JSON fully built — but instead
of CAS-publishing `version-N.json` it parks the snapshot under
`_meta/staged-<id>.json`, invisible to every reader. The staged state
is then audited (row counts, CHECK-style expectations over the
RESOLVED staged table) and either published (one atomic CAS, identical
to a direct commit) or aborted (staged data files deleted; committed
state untouched).

Why this matters for CDC at 100 TB: an epoch's merge is the expensive
part; the audit is a cheap scan of the already-written output. Fencing
a bad upstream batch BEFORE readers see it turns "replay + rollback +
re-replay" into "abort + re-stage", and the publish itself is O(1)
metadata. Exactly-once semantics are unchanged — the epoch is recorded
in the staged snapshot's `committed_epochs`, so it only fences replays
once published.

Reference parity note: the reference engine (data-integrations/
wrangler) has no table format at all; this mirrors Iceberg's WAP and
Delta's CDF-era staging semantics, composed with the recipe
preconditions the reference DOES have (Precondition.java) as audit
expectations.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F

_META = "_meta"


class AuditError(RuntimeError):
    """publish(require_audit=True) on a staged commit whose audit
    failed or never ran."""


class StagedCommit:
    """A fully-materialized but unpublished snapshot.

    Created by `LakeTable.commit(..., staged=True)` (normally reached
    via `table.merge(..., staged=True)` or the DML surface). The handle
    is also recoverable after a crash: `StagedCommit.load(spark, path,
    stage_id)` re-attaches to the parked snapshot, so an orchestrator
    can audit/publish from a different process than the writer.
    """

    def __init__(self, spark, path: str, snapshot: dict, stage_id: str):
        self.spark = spark
        self.path = path
        self.snapshot = snapshot
        self.stage_id = stage_id
        self.audit_result: dict | None = None

    # ------------------------------------------------------------ lifecycle
    @staticmethod
    def stage(table, snapshot: dict) -> "StagedCommit":
        """Park `snapshot` (built by LakeTable.commit) without
        publishing it. The staging file is atomic-unique per stage."""
        stage_id = uuid.uuid4().hex[:12]
        from wrangler_spark.lake.table import _atomic_write

        _atomic_write(
            os.path.join(table.path, _META, f"staged-{stage_id}.json"),
            json.dumps(snapshot, indent=1),
        )
        return StagedCommit(table.spark, table.path, snapshot, stage_id)

    @staticmethod
    def load(spark, path: str, stage_id: str) -> "StagedCommit":
        with open(os.path.join(path, _META, f"staged-{stage_id}.json")) as f:
            snap = json.load(f)
        return StagedCommit(spark, path, snap, stage_id)

    @staticmethod
    def list_staged(path: str) -> list[str]:
        meta = os.path.join(path, _META)
        out = []
        for fn in sorted(os.listdir(meta)):
            if fn.startswith("staged-") and fn.endswith(".json"):
                out.append(fn[len("staged-"):-len(".json")])
        return out

    # ------------------------------------------------------------ views
    @property
    def version(self) -> int:
        return int(self.snapshot["version"])

    @property
    def parent(self) -> int:
        return int(self.snapshot["parent"])

    def table(self):
        """A read-only view of the staged state — a LakeTable pinned to
        the staged snapshot. read()/scan()/table_changes all work; a
        write through it would race the publish CAS and lose."""
        from wrangler_spark.lake.table import LakeTable

        return LakeTable(self.spark, self.path, json.loads(json.dumps(self.snapshot)))

    def _new_rels(self) -> list[str]:
        """Files referenced by the staged snapshot but not by its
        parent — exactly the writer's output (data, delta, change-data
        and bloom sidecar files), safe to delete on abort because no
        committed snapshot can reference them (names are uuid-unique
        per write)."""

        def _refs(snap: dict) -> set:
            refs: set[str] = set()
            for rels in snap.get("files", {}).values():
                refs.update(rels)
            for rels in snap.get("deltas", {}).values():
                refs.update(rels)
            refs.update(snap.get("changes") or [])
            for m in snap.get("bloom_manifests", []):
                refs.add(m["path"])
            for m in snap.get("stats_manifests", []):
                refs.add(m["path"])
            return refs

        from wrangler_spark.lake.table import LakeTable

        parent = LakeTable.load(self.spark, self.path, version=self.parent)
        return sorted(_refs(self.snapshot) - _refs(parent.snap))

    # ------------------------------------------------------------ audit
    def audit(
        self,
        expectations: dict[str, str] | None = None,
        min_rows: int | None = None,
        max_rows: int | None = None,
    ) -> dict:
        """Validate the RESOLVED staged table (post-merge state, deltas
        resolved, tombstones dropped — what a reader would see after
        publish). `expectations` maps name -> SQL boolean expression; a
        row violates when the expression is NOT TRUE (null counts as a
        violation, the CHECK-constraint convention). All expectations
        and the row count run in ONE aggregation job over one scan.

        Returns {"ok", "rows", "violations": {name: count}} and caches
        it on the handle for publish(require_audit=True)."""
        t = self.table()
        df = t.read()
        aggs = [F.count(F.lit(1)).alias("__rows")]
        names = list(expectations or {})
        for name in names:
            expr = (expectations or {})[name]
            bad = ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
            aggs.append(F.sum(bad.cast("long")).alias(f"__v_{name}"))
        row = df.agg(*aggs).first()
        rows = int(row["__rows"])
        violations = {name: int(row[f"__v_{name}"] or 0) for name in names}
        ok = all(v == 0 for v in violations.values())
        if min_rows is not None and rows < int(min_rows):
            violations["__min_rows"] = int(min_rows) - rows
            ok = False
        if max_rows is not None and rows > int(max_rows):
            violations["__max_rows"] = rows - int(max_rows)
            ok = False
        self.audit_result = {"ok": ok, "rows": rows, "violations": violations}
        return self.audit_result

    # ------------------------------------------------------------ outcomes
    def publish(self, require_audit: bool = False) -> dict:
        """Atomically make the staged snapshot the table's next version
        — the same CAS as a direct commit (`version-N.json` exclusive
        create + VERSION pointer), so a concurrent writer that
        committed since staging raises CommitConflictError; re-stage
        from the new head and retry (epoch fencing makes the re-merge
        of an already-published epoch a no-op)."""
        if require_audit and not (self.audit_result and self.audit_result["ok"]):
            raise AuditError(
                "staged commit not published: audit "
                + ("failed" if self.audit_result else "never ran")
                + f" ({self.audit_result})"
            )
        from wrangler_spark.lake.table import LakeTable

        t = LakeTable(self.spark, self.path, self.snapshot)
        t._write_snapshot()  # CAS — raises CommitConflictError on a race
        self._drop_staging_file()
        return {"version": self.version, "published": True}

    def abort(self) -> dict:
        """Discard the staged commit: delete every file the staged
        write produced and the staging snapshot itself. Committed state
        is untouched (the staged files live in uuid-unique staging
        directories, never shared with a published snapshot).

        Whole staging directories are removed, not just the manifest's
        parquet rels — the Spark writer also leaves `_SUCCESS`/checksum
        markers there. A directory is only eligible when NO live rel
        from the parent chain resides under it (guaranteed by the
        uuid-per-write layout; asserted anyway)."""
        import shutil

        rels = self._new_rels()
        from wrangler_spark.lake.table import LakeTable, _DATA

        parent = LakeTable.load(self.spark, self.path, version=self.parent)
        parent_refs: set[str] = set(parent.snap.get("changes") or [])
        for snap_rels in parent.snap.get("files", {}).values():
            parent_refs.update(snap_rels)
        for snap_rels in parent.snap.get("deltas", {}).values():
            parent_refs.update(snap_rels)
        # every historical snapshot ≤ parent may still be time-traveled
        # to — only remove dirs no committed snapshot references
        from wrangler_spark.lake.table import _hydrate

        meta = os.path.join(self.path, _META)
        for fn in os.listdir(meta):
            if fn.startswith("version-") and fn.endswith(".json"):
                with open(os.path.join(meta, fn)) as f:
                    s = _hydrate(meta, json.load(f))
                parent_refs.update(s.get("changes") or [])
                for snap_rels in s.get("files", {}).values():
                    parent_refs.update(snap_rels)
                for snap_rels in s.get("deltas", {}).values():
                    parent_refs.update(snap_rels)

        removed, roots = 0, set()
        for rel in rels:
            parts = rel.split(os.sep)
            if parts[0] == _DATA and len(parts) > 2:
                roots.add(os.path.join(parts[0], parts[1]))
            else:
                full = os.path.join(self.path, rel)
                if os.path.exists(full):
                    os.remove(full)
                    removed += 1
        for root in sorted(roots):
            if any(r == root or r.startswith(root + os.sep) for r in parent_refs):
                continue  # shared with committed state — leave intact
            full = os.path.join(self.path, root)
            if os.path.isdir(full):
                removed += sum(len(fs) for _, _, fs in os.walk(full))
                shutil.rmtree(full)
        self._drop_staging_file()
        return {"aborted": True, "files_removed": removed}

    def _drop_staging_file(self) -> None:
        p = os.path.join(self.path, _META, f"staged-{self.stage_id}.json")
        if os.path.exists(p):
            os.remove(p)
