"""Last-writer-wins MERGE INTO for LakeTable.

The CDC upsert core (BASELINE.json north_rule): apply a batch of
insert/update/delete change events keyed by the table's key columns,
choosing the event with the highest commit sequence per key (monotonic
LWW ordering), rewriting only the hash-buckets that contain changed
keys.

Scale design notes (the 100 TB story):
- LWW dedup = max-seq agg over a (keys, seq) projection + join back.
  Only key+seq bytes flow through the agg shuffle and MAX combines
  map-side, so hot-key skew collapses before the shuffle; the join
  back is AQE-broadcastable. (max_by(struct) measured 10× slower —
  payload copies into the agg buffer per row.)
- The base-table side reads ONLY affected buckets (bucket pruning via
  snapshot metadata), and the anti-join of base-vs-changed-keys is
  AQE-planned: epochs with small change sets become broadcast joins at
  runtime without us collecting anything.
- Deletes are LWW winners with op='delete': the key simply doesn't
  reappear in the rewritten bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrangler_spark.lake.table import LakeTable, evolve_schema


def lww_dedup(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    salted: bool = False,
    salt_buckets: int = 16,
    unique_seq: bool = True,
    broadcast_keys_max: int = 0,
    _handles: list | None = None,
) -> DataFrame:
    """One row per key: the change with max seq (last writer wins).

    Plan: tiny max-seq aggregation over a (keys, seq) projection, then an
    equality join back to the full rows. Measured 10× faster than
    max_by(struct) (which copies the whole payload into the aggregation
    buffer per row), and it is the scalable shape:
    - only (keys, seq) — a few dozen bytes/row — flows through the agg
      shuffle, and MAX combines map-side, so a hot repo with 10^7 updates
      in an epoch contributes one row per upstream partition (skew-immune
      without salting);
    - the join back is AQE-planned: when the distinct-key count is small
      the max-seq side broadcasts and the full payload never shuffles.

    `salted=True` additionally two-stages the max agg for pathological
    single-key floods. `unique_seq=False` switches to a window row_number
    for sources whose (key, seq) pairs can tie (a real binlog's commit
    sequence is unique, so the default assumes uniqueness).

    `broadcast_keys_max` > 0 enables a manual runtime-stats broadcast:
    the (keys, max-seq) agg is cached and counted — a job over key+seq
    bytes only — and when the distinct-key count is at most the bound
    the join-back build side is broadcast EXPLICITLY. AQE's own
    SMJ→BHJ conversion decides too late to save the payload stream's
    shuffle WRITE (both query stages materialize concurrently); the
    static hint keeps the full payload entirely shuffle-free, which
    measured ~2× on the whole replay. Caller must unpersist the handle
    appended to `_handles` after the merge materializes.
    """
    if not unique_seq:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*key_cols).orderBy(F.desc(seq_col))
        return (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    proj = changes.select(*key_cols, seq_col)
    if salted:
        salt = F.pmod(F.xxhash64(F.col(seq_col)), F.lit(salt_buckets))
        stage1 = proj.groupBy(*key_cols, salt.alias("__salt")).agg(
            F.max(seq_col).alias(seq_col)
        )
        mx = stage1.groupBy(*key_cols).agg(F.max(seq_col).alias(seq_col))
    else:
        mx = proj.groupBy(*key_cols).agg(F.max(seq_col).alias(seq_col))
    if broadcast_keys_max:
        mx = mx.cache()
        if _handles is not None:
            _handles.append(mx)
        if mx.count() <= broadcast_keys_max:
            mx = F.broadcast(mx)
    return changes.join(mx, on=[*key_cols, seq_col], how="inner")


def merge_into(
    table: LakeTable,
    changes: DataFrame,
    seq_col: str = "seq",
    op_col: str = "op",
    epoch: int | None = None,
    evolve: bool = True,
    salted: bool = False,
    metrics: dict | None = None,
    broadcast_hint_keys: int | None = None,
    renames: dict | None = None,
    broadcast_keys_max: int = 500_000,
    explain_sink: list | None = None,
    mode: str = "cow",
    staged: bool = False,
) -> dict:
    """Apply a change batch; returns lineage metrics.

    `staged=True` runs the FULL merge (data files, stats, blooms, the
    snapshot itself) but parks the result as a write-audit-publish
    staged commit instead of publishing: the returned dict carries the
    `StagedCommit` handle under "staged"; nothing is visible to
    readers until `handle.publish()` (see lake/wap.py). Epoch fencing
    applies only once published.

    `mode="cow"` (default) rewrites the affected base buckets
    (copy-on-write). `mode="mor"` (merge-on-read) writes ONLY the
    epoch's LWW winner rows as bucketed delta files — no base bucket is
    read or written, so merge I/O is proportional to the epoch size
    even when its keys touch every bucket; readers resolve deltas per
    key (LakeTable._resolved) and `LakeTable.compact()` folds them back
    on a cadence. A cow merge over a table holding pending deltas
    resolves them in its base read and clears them for the buckets it
    rewrites.

    changes must contain the table key columns, `seq_col`, `op_col`
    (insert|update|delete) and payload columns. Epoch fencing: if this
    epoch was already committed the merge is skipped (idempotent replay).

    `metrics`: optional precomputed batch metrics (events/inserts/
    updates/deletes/max_seq) — the replayer derives them from its
    watermark agg, saving this function's own full-batch scan. May be a
    zero-arg callable resolved just before commit, letting the caller
    run its metrics job CONCURRENTLY with the merge (they're needed
    only for commit properties and the result dict).

    `broadcast_hint_keys`: deprecated, ignored. The broadcast decision
    now reads the exact winner count from the bucket-pruning probe (a
    key+seq-bytes-only job that runs anyway), so a stale hint can never
    force an oversized build side into memory.
    """
    if epoch is not None and int(epoch) in table.committed_epochs:
        return {"skipped": True, "epoch": epoch, "version": table.version}

    keys = table.key_cols

    # ---- schema evolution (Iceberg ALTER TABLE equivalent): declared
    # renames become in-place field renames with read aliases; new
    # payload columns are added; numeric types widen
    payload_fields = [f for f in changes.schema.fields if f.name not in (seq_col, op_col)]
    incoming = type(table.schema)(payload_fields)  # StructType
    if renames:
        bad = [o for o in renames if o.lower() in {k.lower() for k in keys}]
        if bad:
            raise ValueError(f"cannot rename table key column(s): {bad}")
    if evolve:
        schema, aliases = evolve_schema(
            table.schema, incoming, renames=renames, aliases=table.aliases,
            dropped=table.snap.get("dropped", []),
        )
    else:
        schema, aliases = table.schema, table.aliases

    # ---- CHECK constraints (Delta ADD CONSTRAINT parity): validate the
    # incoming batch's non-delete events BEFORE the LWW agg — one
    # O(batch) aggregation job, only when constraints exist. `fail`
    # aborts the epoch unfenced (nothing written, replays after the
    # upstream fix); `drop` discards the violating EVENTS so an older
    # valid event for the same key may still win LWW.
    from wrangler_spark.lake.constraints import (
        ConstraintViolationError,
        satisfies_all,
        table_constraints,
        violation_counts,
    )

    cons = table_constraints(table.snap)
    constraint_viol: dict | None = None
    if cons:
        constraint_viol = violation_counts(
            changes.filter(F.col(op_col) != "delete"), cons
        )
        total_viol = sum(constraint_viol.values())
        if total_viol:
            cmode = str(
                table.snap.get("properties", {}).get("constraints.mode", "fail")
            ).lower()
            if cmode == "fail":
                raise ConstraintViolationError(
                    f"epoch {epoch}: {total_viol} event(s) violate table "
                    f"constraints {constraint_viol}; nothing committed "
                    "(set constraints.mode=drop to discard violating events)"
                )
            changes = changes.filter(
                (F.col(op_col) == "delete") | satisfies_all(cons)
            )

    # ---- LWW winner per key (salted two-stage hash agg; no window sort).
    # Shape: tiny max-seq agg over a (keys, seq) projection, cached, then
    # a join back to the full rows (measured 10× faster than
    # max_by(struct), which copies the payload into the agg buffer).
    # The bucket-pruning probe runs on the AGG side, before the payload
    # join, so it (a) costs only key+seq bytes and (b) yields the EXACT
    # distinct-key count that gates the static broadcast — no stale
    # previous-epoch hint can force a huge build side into driver memory
    # (a key-count burst degrades gracefully to the shuffle join, the
    # right plan at that size). broadcast keeps the full payload stream
    # shuffle-free for typical epochs (≤500k keys).
    import time as _time

    _t0 = _time.time()
    proj = changes.select(*keys, seq_col)
    if salted:
        salt = F.pmod(F.xxhash64(F.col(seq_col)), F.lit(16))
        stage1 = proj.groupBy(*keys, salt.alias("__salt")).agg(
            F.max(seq_col).alias(seq_col)
        )
        mx = stage1.groupBy(*keys).agg(F.max(seq_col).alias(seq_col))
    else:
        mx = proj.groupBy(*keys).agg(F.max(seq_col).alias(seq_col))
    mx = mx.withColumn("__b", table.bucket_expr(mx)).cache()

    # ---- bucket pruning probe (≤ num_buckets rows collected) — also the
    # broadcast sizing job and the winner count, all in one tiny job
    bucket_counts = mx.groupBy("__b").count().collect()
    affected = sorted(r["__b"] for r in bucket_counts)
    n_winners = sum(r["count"] for r in bucket_counts)
    _t_probe = _time.time() - _t0

    winners_broadcast = n_winners <= broadcast_keys_max
    build = F.broadcast(mx) if winners_broadcast else mx
    # join-back carries __b from the agg side for free
    # Cache the winner payload ONLY when a second action will re-read
    # it: the degraded shuffle merge consumes it twice (merge join +
    # brand-new anti-join) inside the bucket write on top of the CDF
    # write. The broadcast and mor paths consume it exactly once (the
    # CDF write feeds the merge union back via the written files), so
    # caching there would materialize an epoch-sized payload in executor
    # memory for zero reuse — a spill hazard at large epochs.
    winners = changes.join(build, on=[*keys, seq_col], how="inner")
    if not winners_broadcast and mode != "mor":
        winners = winners.cache()

    # ---- metrics on the change batch (precomputed by the replayer's
    # watermark agg when available; one small agg job otherwise)
    if metrics is None:
        mrow = changes.agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.when(F.col(op_col) == "insert", 1).otherwise(0)).alias("inserts"),
            F.sum(F.when(F.col(op_col) == "update", 1).otherwise(0)).alias("updates"),
            F.sum(F.when(F.col(op_col) == "delete", 1).otherwise(0)).alias("deletes"),
            F.max(seq_col).alias("max_seq"),
        ).first()
        metrics = {k: mrow[k] for k in ("events", "inserts", "updates", "deletes", "max_seq")}

    wb = winners

    def _align(df: DataFrame, extra: list) -> DataFrame:
        cols = []
        have = {c.lower() for c in df.columns}
        schema_l = {f_.name.lower() for f_ in schema.fields}
        for f_ in schema.fields:
            # a late producer may still emit a PRE-RENAME name: resolve
            # the payload through the read aliases (current name wins
            # when both are present) so old-name batches land in the
            # renamed column instead of null (mirrors _read_files)
            cands = [f_.name.lower()] + [
                a
                for a in aliases.get(f_.name.lower(), [])
                if a in have and a not in schema_l
            ]
            src = next((c for c in cands if c in have), None)
            if src is not None:
                cols.append(F.col(src).cast(f_.dataType).alias(f_.name))
            else:
                cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        return df.select(*cols, *extra)

    # winners aligned to the evolved schema, carrying merge metadata:
    # __seq (LWW guard) and __deleted (tombstone — deletes are KEPT as
    # tombstone rows so a late, lower-seq update cannot resurrect a key)
    changes_aligned = _align(
        wb,
        [
            F.col(seq_col).cast("long").alias("__seq"),
            (F.col(op_col) == "delete").alias("__deleted"),
            F.col("__b"),
        ],
    )

    if mode not in ("cow", "mor"):
        raise ValueError(f"unknown merge mode: {mode!r} (cow|mor)")
    if mode == "mor":
        # merge-on-read: the winners ARE the commit — write them as
        # bucketed delta files and stop. No base bucket is read, so the
        # epoch's cost is O(epoch), not O(touched buckets); the strict
        # seq guard moves to read time (LakeTable._resolved, base wins
        # ties), preserving cross-batch out-of-order LWW exactly.
        new_version = table.version + 1
        if explain_sink is not None:
            import io as _io
            from contextlib import redirect_stdout as _rs

            _buf = _io.StringIO()
            with _rs(_buf):
                changes_aligned.explain("formatted")
            explain_sink.append(_buf.getvalue())
        _t1 = _time.time()
        delta_files = table.write_buckets(changes_aligned, new_version)
        _t_write = _time.time() - _t1
        if callable(metrics):
            metrics = metrics()
        props = {}
        if epoch is not None:
            props["last_epoch"] = int(epoch)
        if metrics["max_seq"] is not None:
            props["max_seq"] = int(metrics["max_seq"])
        # mor change-data manifest is FREE: the delta files ARE this
        # commit's change candidates (winner rows + __seq/__deleted) —
        # table_changes reads them instead of diffing snapshots
        change_rels = [r for rels in delta_files.values() for r in rels]
        sc = table.commit(
            {}, epoch=epoch, properties=props, schema=schema, aliases=aliases,
            new_delta_files=delta_files, change_files=change_rels,
            operation="merge(mor)", staged=staged,
        )
        winners.unpersist()
        mx.unpersist()
        return {
            "skipped": False,
            "epoch": epoch,
            "staged": sc,
            "constraint_violations": constraint_viol,
            "version": sc.version if sc is not None else table.version,
            "events": metrics["events"],
            "inserts": metrics["inserts"],
            "updates": metrics["updates"],
            "deletes": metrics["deletes"],
            "keys": n_winners,
            "affected_buckets": len(affected),
            "mode": "mor",
            "timings": {
                "probe_sec": round(_t_probe, 3),
                "write_sec": round(_t_write, 3),
                "broadcast_path": winners_broadcast,
            },
        }

    # base rows of the affected buckets, with stored metadata — if the
    # table holds pending merge-on-read deltas for these buckets the
    # read resolves them, and the commit below clears them (the rewrite
    # absorbs their effect)
    base = table.read(buckets=affected, with_meta=True, schema=schema, aliases=aliases)
    base_aligned = _align(base, [F.col("__seq"), F.col("__deleted")])
    base_aligned = base_aligned.withColumn("__b", table.bucket_expr(base_aligned))

    # seq-guarded merge (`WHEN MATCHED AND s.seq > t.seq`). Two plans:
    #
    # Broadcast path (n_winners ≤ 500k — the typical epoch): base rows
    # join ONLY against the broadcast (keys, max-seq) projection, so the
    # base payload provably never shuffles — bucket alignment holds by
    # construction, not by hoping AQE picks BHJ for a payload-bearing
    # side. The changed-row payload (winners that beat the base, plus
    # brand-new keys) is the small side and repartitions by bucket once.
    #
    # Degraded path (key-count burst): classic two-join SMJ merge; base
    # rows shuffle on keys, so the write explicitly re-clusters by
    # bucket (without it, every write task would span many buckets and
    # emit tasks × buckets small files per version).
    data_cols = [f.name for f in schema.fields]
    mxk = mx.select(
        *[F.col(k).alias(f"__w_{k}") for k in keys],
        F.col(seq_col).cast("long").alias("__w_seq"),
    )
    join_cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__w_{k}"))
        join_cond = c if join_cond is None else (join_cond & c)

    if winners_broadcast:
        bj = base_aligned.join(F.broadcast(mxk), join_cond, "left")
        newer = F.col("__w_seq").isNotNull() & (F.col("__w_seq") > F.col("__seq"))
        # base rows that survive (no change, or a stale change)
        base_keep = bj.filter(~F.coalesce(newer, F.lit(False))).select(
            *keys, *[c for c in data_cols if c not in keys], "__seq", "__deleted", "__b"
        )
        # keys where the base won (stale change) — bounded by n_winners;
        # Catalyst prunes this second base scan to keys+__seq only
        losers = bj.filter(F.coalesce(F.col("__w_seq") <= F.col("__seq"), F.lit(False))).select(
            *[F.col(f"__w_{k}").alias(f"__l_{k}") for k in keys]
        )
        lose_cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__l_{k}"))
            lose_cond = c if lose_cond is None else (lose_cond & c)
        changed = changes_aligned.join(F.broadcast(losers), lose_cond, "left_anti").select(
            *keys, *[c for c in data_cols if c not in keys], "__seq", "__deleted", "__b"
        )
        merged = base_keep.unionByName(changed.repartition(F.col("__b")))
        pre_partitioned = True
        post_image = changed  # winners that actually beat the base
    else:
        w = changes_aligned.select(
            *[F.col(k).alias(f"__w_{k}") for k in keys],
            *[F.col(c).alias(f"__wv_{c}") for c in data_cols if c not in keys],
            F.col("__seq").alias("__w_seq"),
            F.col("__deleted").alias("__w_deleted"),
        )
        joined = base_aligned.join(w, join_cond, "left")
        newer = F.col("__w_seq").isNotNull() & (F.col("__w_seq") > F.col("__seq"))
        resolved_cols = [F.col(k) for k in keys]
        for c in data_cols:
            if c not in keys:
                resolved_cols.append(
                    F.when(newer, F.col(f"__wv_{c}")).otherwise(F.col(c)).alias(c)
                )
        resolved_cols.append(F.when(newer, F.col("__w_seq")).otherwise(F.col("__seq")).alias("__seq"))
        resolved_cols.append(
            F.when(newer, F.col("__w_deleted")).otherwise(F.col("__deleted")).alias("__deleted")
        )
        resolved_cols.append(F.col("__b"))
        existing = joined.select(*resolved_cols)
        brand_new = changes_aligned.join(
            base_aligned.select(*keys), on=keys, how="left_anti"
        ).select(*keys, *[F.col(c) for c in data_cols if c not in keys], "__seq", "__deleted", "__b")
        merged = existing.unionByName(brand_new)
        pre_partitioned = False
        # post-image for the change manifest: drop candidates the base
        # beat (Catalyst prunes this base probe to keys + __seq)
        stale_keys = (
            base_aligned.join(
                w.select(*[F.col(f"__w_{k}") for k in keys], "__w_seq"), join_cond
            )
            .filter(F.col("__w_seq") <= F.col("__seq"))
            .select(*keys)
        )
        post_image = changes_aligned.join(stale_keys, on=keys, how="left_anti")

    new_version = table.version + 1
    _t1 = _time.time()
    # change-data files (Delta CDF equivalent): persist THIS commit's
    # POST-IMAGE — batch winners that actually beat the base — so
    # table_changes over the window is O(changes), never a full
    # snapshot diff, AND every row in a cow change file reflects a real
    # state transition. The base-stale filter matters for the streaming
    # changelog source: a consumer that missed a key's tombstone (a
    # batch-synced replica never sees deletes of never-visible keys)
    # has no seq to reject a stale candidate with — so cow files must
    # not carry them. (mor change files remain within-batch winners by
    # construction; their guard lives at read time.)
    #
    # Written BEFORE the bucket write, and in the broadcast path the
    # bucket write's union re-reads the (winners-sized) change files
    # instead of recomputing their lineage: capturing the changelog
    # costs one small parquet round-trip, not a second column-pruned
    # base scan + anti-join per epoch. An interrupted merge leaves
    # them as unreferenced staging files — the commit below is what
    # publishes them; GC reclaims orphans.
    change_rels: list[str] | None
    if str(table.snap.get("properties", {}).get("changelog.enabled", "true")).lower() != "false":
        change_rels = table.write_change_files(post_image, new_version)
        if winners_broadcast:
            if change_rels:
                import os as _os

                from pyspark.sql import types as _T

                cdf_schema = _T.StructType(
                    list(schema.fields)
                    + [
                        _T.StructField("__seq", _T.LongType()),
                        _T.StructField("__deleted", _T.BooleanType()),
                    ]
                )
                # Read-after-write assumption (documented, round-4
                # ADVICE): the bucket write re-reads change files this
                # same merge just wrote, so the table store must be
                # read-after-write consistent for new objects — true of
                # the local/posix FS this lake targets and of S3/GCS
                # since 2020/always. A torn write cannot pass silently:
                # parquet footer validation fails the read, and
                # write_change_files raises on write failure, so the
                # epoch aborts unfenced (replayable) rather than
                # dropping changed rows.
                changed_back = table.spark.read.schema(cdf_schema).parquet(
                    *[_os.path.join(table.path, r) for r in change_rels]
                )
                changed_back = changed_back.withColumn(
                    "__b", table.bucket_expr(changed_back)
                )
                merged = base_keep.unionByName(
                    changed_back.repartition(F.col("__b"))
                )
            else:
                # fully-stale epoch: zero winners beat the base — no
                # change files were produced, so don't re-derive the
                # (empty) changed side from the batch a second time
                merged = base_keep
    else:
        change_rels = None
    if explain_sink is not None:
        # plan-audit hook (scripts/explain_audit.py → PLANS.md): the
        # formatted physical plan of the merge output as WRITTEN —
        # after the CDF-reuse rebuild, so the audited union shows the
        # change-file re-read, not the recomputed lineage
        import io as _io
        from contextlib import redirect_stdout as _rs

        _buf = _io.StringIO()
        with _rs(_buf):
            merged.explain("formatted")
        explain_sink.append(_buf.getvalue())
    bucket_files = table.write_buckets(merged, new_version, pre_partitioned=pre_partitioned)
    _t_write = _time.time() - _t1
    # buckets that were affected but ended up empty (all keys deleted)
    for b in affected:
        bucket_files.setdefault(str(b), [])

    # metrics may be a callable (caller's concurrent metrics job) —
    # resolve now that the merge's own jobs are done
    if callable(metrics):
        metrics = metrics()

    props = {}
    if epoch is not None:
        props["last_epoch"] = int(epoch)
    if metrics["max_seq"] is not None:
        props["max_seq"] = int(metrics["max_seq"])
    sc = table.commit(
        bucket_files, epoch=epoch, properties=props, schema=schema, aliases=aliases,
        clear_delta_buckets=affected, change_files=change_rels,
        operation="merge", staged=staged,
    )
    winners.unpersist()
    mx.unpersist()

    return {
        "skipped": False,
        "epoch": epoch,
        "staged": sc,
        "constraint_violations": constraint_viol,
        "version": sc.version if sc is not None else table.version,
        "events": metrics["events"],
        "inserts": metrics["inserts"],
        "updates": metrics["updates"],
        "deletes": metrics["deletes"],
        "keys": n_winners,
        "affected_buckets": len(affected),
        "timings": {
            "probe_sec": round(_t_probe, 3),
            "write_sec": round(_t_write, 3),
            "broadcast_path": winners_broadcast,
        },
    }
