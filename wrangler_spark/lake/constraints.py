"""Table CHECK constraints (Delta Lake `ALTER TABLE ADD CONSTRAINT`
parity).

A constraint is a named SQL boolean expression stored as a table
property `constraint.<name>`; a row SATISFIES it when the expression
evaluates TRUE (NULL counts as a violation — the SQL CHECK
convention Delta uses). Enforcement happens at every write:

- CDC merge (`merge_into`): the incoming batch's non-delete EVENTS are
  validated BEFORE the LWW resolution. `constraints.mode` property:
  `fail` (default, Delta semantics) aborts the whole epoch with
  per-constraint counts — nothing is written, the epoch stays
  unfenced and replays after the upstream fix; `drop` discards only
  the violating events (an older, valid event for the same key may
  then win LWW — the right CDC semantics for "reject bad events") and
  reports counts in the merge metrics.
- DML `update_where` / `MergeBuilder`: the rows the statement would
  write must satisfy every constraint — violations always raise
  (Delta raises on UPDATE/MERGE CHECK violations; there is no event
  stream to drop from).
- Deletes/tombstones are exempt everywhere (null payload by design).

Adding a constraint validates EXISTING data first (one scan of the
resolved table), exactly like Delta's ADD CONSTRAINT.

Cost model at scale: zero when no constraints are set (a metadata
check); with constraints, one extra aggregation job over the incoming
batch per epoch — O(batch), never O(table).

Reference parity: the reference's row-level validations (Precondition,
send-to-error, validate-standard) guard the TRANSFORM stage; these
guard the TABLE, the layer the reference lacks. Composes with the
write-audit-publish gate (wap.py), which audits whole-table state
post-merge rather than per-event pre-merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PREFIX = "constraint."


class ConstraintViolationError(RuntimeError):
    """Rows violate a table CHECK constraint; nothing was committed."""


def table_constraints(snap: dict) -> dict[str, str]:
    return {
        k[len(PREFIX):]: v
        for k, v in snap.get("properties", {}).items()
        if k.startswith(PREFIX)
    }


def satisfies_all(cons: dict[str, str]) -> Column:
    """TRUE iff the row satisfies every constraint (NULL → violation)."""
    c = F.lit(True)
    for expr in cons.values():
        c = c & F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
    return c


def violation_agg(df: DataFrame, cons: dict[str, str]) -> DataFrame:
    """The single-row aggregation plan behind `violation_counts` —
    exposed so the plan audit (PLANS.md) can show it: one HashAggregate
    pair (partial map-side, final 1-group) over the batch, no joins, no
    table scan."""
    aggs = [
        F.sum(
            (~F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))).cast("long")
        ).alias(f"__c_{i}")
        for i, expr in enumerate(cons.values())
    ]
    return df.agg(*aggs)


def violation_counts(df: DataFrame, cons: dict[str, str]) -> dict[str, int]:
    """Per-constraint violating-row counts, one aggregation job."""
    row = violation_agg(df, cons).first()
    return {
        name: int(row[f"__c_{i}"] or 0) for i, name in enumerate(cons.keys())
    }


def add_constraint(table, name: str, expr: str) -> dict:
    """Validate existing data, then record `constraint.<name>` in a
    metadata-only commit. Raises ConstraintViolationError when current
    rows violate (Delta ADD CONSTRAINT behavior)."""
    if not name or not name.replace("_", "").replace("-", "").isalnum():
        raise ValueError(f"bad constraint name {name!r} (letters/digits/_/- only)")
    key = PREFIX + name
    if key in table.snap.get("properties", {}):
        raise ValueError(f"constraint {name!r} already exists; drop it first")
    # parse check + existing-data validation in one scan of the
    # resolved table (an unparseable expression surfaces here, before
    # anything is committed)
    bad = int(
        table.read()
        .agg(
            F.sum(
                (~F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))).cast("long")
            ).alias("n")
        )
        .first()["n"]
        or 0
    )
    if bad:
        raise ConstraintViolationError(
            f"cannot add constraint {name!r}: {bad} existing row(s) violate {expr!r}"
        )
    table.commit({}, properties={key: expr}, change_files=[], operation="add-constraint")
    return {"version": table.version, "constraint": {name: expr}}


def drop_constraint(table, name: str) -> dict:
    key = PREFIX + name
    if key not in table.snap.get("properties", {}):
        raise ValueError(f"no constraint {name!r} on this table")
    table.commit({}, properties={key: None}, change_files=[], operation="drop-constraint")
    return {"version": table.version, "dropped": name}


def constraints_referencing(table, column: str) -> list[str]:
    """Names of CHECK constraints that reference `column` — used by
    rename_column/drop_column to refuse schema changes that would leave
    an unevaluable constraint behind (Delta refuses the same way:
    a CHECK referencing a renamed/dropped column would otherwise abort
    EVERY subsequent merge with an analysis error, permanently).

    Detection is by ANALYSIS, not string matching: each expression is
    planned against an empty frame built from the schema minus
    `column`; an expression that no longer resolves references it.
    Driver-only plan work — no Spark job runs."""
    cons = table_constraints(table.snap)
    if not cons:
        return []
    import pyspark.sql.types as T

    c_l = column.lower()
    reduced = T.StructType(
        [f for f in table.schema.fields if f.name.lower() != c_l]
    )
    probe = table.spark.createDataFrame([], reduced)
    hit = []
    for name, expr in cons.items():
        try:
            probe.select(F.expr(expr).cast("boolean"))
        except Exception:
            hit.append(name)
    return sorted(hit)
