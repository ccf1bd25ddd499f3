"""The micro-batch apply path: dedup -> guard -> copy-on-write MERGE.

This is the Spark rebuild of the reference's task chain
``task_find_new_records -> task_read_records -> task_merge_metadata ->
update_storage`` (tasks.py:34-119, app.py:24-74) collapsed into one
DataFrame plan executed per micro-batch inside ``foreachBatch``:

1. **LWW dedup** of the batch per url (operators.lww — skew-safe partial
   aggregation; explicit salting available).
2. **Bucket pruning**: only the table buckets containing the batch's urls
   are read and rewritten (the semantic twin of the reference's
   changed-record short-circuit, tasks.py:52-64 — prune untouched data
   before the expensive merge).
3. **Stale filter**: a winner is applied only if (warc_ts, log_offset) is
   strictly newer than the stored row (idempotent upsert, app.py:34-39).
4. **Tombstone guard** against resurrection by stale events
   (app.py:54-67).
5. **HTML->text** extraction (vectorized pandas UDF) for applied upserts
   only — never for losers.
6. **Atomic commit** of rewritten buckets + tombstone audit appends +
   per-partition lineage + the commit epoch, in one manifest flip
   (exactly-once under foreachBatch replays).
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from .evolve import align_to_schema, reconcile_schema
from .functions.html import html_to_text
from .lake.table import CommitConflictError, LakeTable, bucket_expr
from .operators.cdc import tombstone_guard
from .operators.lww import lww_dedup, lww_dedup_salted, lww_dedup_semi, lww_winner_rows
from .schema import LINEAGE_SCHEMA, OP_DELETE, TOMBSTONE_SCHEMA


def _text_after_html_fields(
    fields: list[T.StructField], skip: str
) -> list[T.StructField]:
    """THE target-row field order: input fields minus ``skip``, with the
    derived ``text`` column inserted right after ``html``.  One definition —
    pages_schema_for and the fused bulk path's Arrow output schema must
    agree on it exactly."""
    out: list[T.StructField] = []
    for f in fields:
        if f.name == skip:
            continue
        out.append(f)
        if f.name == "html":
            out.append(T.StructField("text", T.StringType(), True))
    return out


def pages_schema_for(batch_schema: T.StructType) -> T.StructType:
    """Target row schema for a change-event schema: drop ``op``, add ``text``
    right after ``html`` (schema evolution on the stream flows through)."""
    return T.StructType(_text_after_html_fields(batch_schema.fields, "op"))


def _bulk_upserts(
    batch_df: DataFrame,
    key: str,
    n_buckets: int,
    target_schema: T.StructType,
    cleanup: list,
) -> DataFrame:
    """Fresh-table bulk apply: winner rows -> ONE bucket-keyed payload shuffle
    -> in-partition duplicate collapse + HTML->text in a single Arrow pass.

    The general path pays two winner-payload shuffles (the LWW collapse keyed
    by url, then the write's repartition keyed by bucket) plus a separate
    Arrow round-trip for extraction.  But bucket = f(url), so one shuffle
    keyed by bucket already co-locates every url's duplicate deliveries in
    one partition — the collapse becomes a vectorized in-partition
    ``drop_duplicates`` fused into the same ``mapInArrow`` pass that
    extracts text.  Net: half the payload shuffle bytes, one Arrow hop.

    Correct only when exact duplicates are the ONLY multiplicity left, i.e.
    after :func:`lww_winner_rows` (winner rows share the max
    (warc_ts, log_offset), and log_offset uniquely identifies an event, so
    co-keyed rows are byte-identical deliveries — keeping any one is LWW).
    """
    winners = lww_winner_rows(
        batch_df, key, cleanup=cleanup, unique_order_col="log_offset"
    )
    upserts = winners.filter(F.col("op") != OP_DELETE).drop("op")
    # explicit partition count at 4 tasks/core: AQE's post-shuffle coalesce
    # targets bytes-per-partition, which at this payload size lands a task
    # count BELOW the core count's next multiple (measured: 5 tasks on 4
    # cores = a full wave of 4 then a 1-task straggler wave, ~40% of the
    # stage idle).  The extract stage is python-worker-bound, so wave
    # balance — not bytes — is the binding constraint; 4x parallelism keeps
    # the tail short at every cluster size and still amortizes per-task
    # setup.  Cluster-scale: defaultParallelism = total executor cores.
    # NOTE: the repartition hashes on _bucket, so the number of NON-EMPTY
    # partitions is bounded by min(n_parts, n_buckets) — n_parts beyond
    # n_buckets buys nothing; size n_buckets >= cores*4 to keep waves full.
    n_parts = max(upserts.sparkSession.sparkContext.defaultParallelism * 4, 8)
    tagged = upserts.withColumn("_bucket", bucket_expr(key, n_buckets)).repartition(
        n_parts, F.col("_bucket")
    )

    out_fields = _text_after_html_fields(tagged.schema.fields, "_bucket")
    out_schema = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def _collapse_and_extract(it: "Iterator") -> "Iterator":
        # mapInArrow, not mapInPandas: the row payload (html binary, text)
        # stays in Arrow buffers end-to-end — a pandas pass materialized
        # every html as a Python bytes object and every text as a Python
        # str TWICE (in and out), the dominant python-side cost of this
        # stage.  Only the ~30-byte urls are materialized, for the
        # cross-batch duplicate collapse.
        import pyarrow as pa

        from .functions.html import extract_text_arrow

        seen: set = set()  # urls of THIS partition only (one bucket group)
        for batch in it:
            urls = batch.column(batch.schema.get_field_index(key)).to_pylist()
            mask = []
            for u in urls:
                if u in seen:
                    mask.append(False)
                else:
                    seen.add(u)
                    mask.append(True)
            fresh = batch.filter(pa.array(mask, type=pa.bool_()))
            if fresh.num_rows == 0:
                continue
            cols = {name: fresh.column(fresh.schema.get_field_index(name))
                    for name in fresh.schema.names}
            cols["text"] = extract_text_arrow(cols["html"])
            yield pa.RecordBatch.from_arrays(
                [cols[name] for name in out_cols], names=out_cols
            )

    final = tagged.mapInArrow(_collapse_and_extract, out_schema)
    return align_to_schema(final, target_schema)


def apply_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: int,
    epoch_source: str = "cdc",
    salted: bool = False,
    n_salts: int = 16,
    merge_partitions: int | None = None,
    dedup_strategy: str = "semi",
    prune_buckets: bool = True,
    compact_appends_every: int = 32,
    decision_col: str | None = None,
    keep_applied: list | None = None,
) -> dict:
    """Apply one micro-batch of change events. Returns stats. Idempotent:
    re-delivery of an already-committed batch_id is a no-op.

    ``decision_col`` names a pre-resolution column (the stateful in-stream
    LWW operator's ``decision``): only rows marked ``'apply'`` are applied,
    and — because the state store already guarantees each such row is
    strictly newer than everything previously seen for its url — the
    stale-filter and tombstone-guard joins against the stored table are
    skipped entirely (the operator's whole point: per-batch work stays
    proportional to the batch, not the table).  The tombstone audit still
    sees EVERY delete delivery, resolved or not (reference app.py:15-21
    appends every delete).

    ``keep_applied``: when a list is passed, the applied-upserts frame
    (post stale-filter/guard, WITH extracted ``text``) is persisted and
    appended to it instead of being torn down — the caller owns the
    unpersist.  A derived-index maintainer (update_lsh_index) can then
    consume the rows this batch actually applied at O(batch) cost with no
    table read-back and no second HTML->text extraction: the write job
    materializes the cache, the index reads it.  Empty when the batch was
    an epoch no-op (caller falls back to a table read for that
    crash-recovery case)."""
    if batch_id <= table.last_epoch(epoch_source):
        return {"batch_id": batch_id, "skipped": True}

    t0 = time.time()
    phases: dict[str, float] = {}

    def _mark(name: str) -> None:
        now = time.time()
        phases[name] = round(now - (t0 + sum(phases.values())), 3)

    m = table.manifest()
    key, nb = m["key"], m["n_buckets"]
    # batch_df is deliberately NOT cached: its passes (touched discovery,
    # lineage stats, dedup, tombstone scan) each prune to a few columns, so
    # columnar re-reads from the source beat materializing full rows on heap
    _caches: list = []
    persisted: list = []
    try:
        _mark("manifest_read")  # time since t0: the manifest open above

        # pre-resolved mode: only 'apply' rows flow to the merge; the raw
        # batch is kept for the tombstone audit + lineage stats
        resolved = (
            batch_df.filter(F.col(decision_col) == "apply").drop(decision_col)
            if decision_col
            else batch_df
        )

        # 1. bucket pruning: which table buckets does this batch touch?
        #    Discovered from the RAW batch (same distinct url set as the
        #    dedup output — a narrow url-column scan, so the deduped payload
        #    never needs persisting just for discovery).  A bulk replay
        #    touches every bucket anyway — prune_buckets=False skips the job.
        if prune_buckets:
            touched = [
                r[0]
                for r in resolved.select(bucket_expr(key, nb).alias("b")).distinct().collect()
            ]
        else:
            touched = list(range(nb))
        # manifest-level emptiness: a fresh table / bulk first replay has no
        # stored rows and no tombstones — skip the stale-filter and guard
        # joins outright instead of shuffling every winner (wide rows!)
        # against provably-empty sides.  With pre-resolved rows the state
        # store already proved strictly-newer, so both joins are skipped
        # even against a populated table.
        has_current = any(m["buckets"].get(str(b)) for b in touched)
        has_tombs = bool(m["tombstone_files"])
        need_stale_filter = has_current and not decision_col
        need_guard = has_tombs and not decision_col
        evolved = reconcile_schema(table.schema(m), pages_schema_for(resolved.schema))
        _mark("dedup_and_touched")

        if (
            not has_current
            and not need_guard
            and not salted
            and dedup_strategy == "semi"
            and not merge_partitions
        ):
            # FUSED bulk path: no stored rows and no guard means the
            # stale filter and guard are provably no-ops — winner rows go
            # through one bucket-keyed shuffle with the duplicate collapse
            # and text extraction fused into a single Arrow pass.  Passed
            # as a thunk: the winner-offset collect inside it (a full
            # narrow scan) then runs in overwrite_buckets' pool thread,
            # overlapping the tombstone/lineage append jobs.
            if keep_applied is not None:
                def new_data() -> DataFrame:
                    df = _bulk_upserts(resolved, key, nb, evolved, _caches)
                    df = df.persist(StorageLevel.MEMORY_AND_DISK)
                    keep_applied.append(df)
                    return df
            else:
                new_data = lambda: _bulk_upserts(resolved, key, nb, evolved, _caches)  # noqa: E731
            pre_partitioned = True
        else:
            pre_partitioned = False
            # 2. in-batch LWW dedup (explicit salting optional per
            #    north_rule).  'semi' shuffles ordering keys only (payloads
            #    of losing events never move).
            if salted:
                dedup = lww_dedup_salted(resolved, key, n_salts=n_salts)
            elif dedup_strategy == "semi":
                dedup = lww_dedup_semi(
                    resolved, key, cleanup=_caches, unique_order_col="log_offset"
                )
            else:
                dedup = lww_dedup(resolved, key)
            if merge_partitions:
                dedup = dedup.repartition(merge_partitions, key)

            current = align_to_schema(table.read_buckets(touched, m), evolved)

            # 3. stale filter: strictly-newer-than-stored (struct comparison
            #    is lexicographic on (warc_ts, log_offset) — the LWW order)
            if need_stale_filter:
                stored = current.select(
                    F.col(key),
                    F.struct(F.col("warc_ts").alias("ts"), F.col("log_offset").alias("off")).alias("_stored"),
                )
                j = dedup.join(stored, key, "left")
                newer = F.col("_stored").isNull() | (
                    F.struct(F.col("warc_ts").alias("ts"), F.col("log_offset").alias("off")) > F.col("_stored")
                )
                appliable = j.filter(newer).drop("_stored")
            else:
                appliable = dedup

            # 4. resurrection guard vs prior-batch tombstones.  Tombstones
            #    are pruned to the batch's touched buckets first: the guard
            #    then joins against a slice proportional to the batch, not
            #    the table's whole delete history (strategy left to AQE).
            if need_guard:
                tombs = table.read_tombstones(TOMBSTONE_SCHEMA).withColumnRenamed("deleted_ts", "warc_ts")
                if prune_buckets and len(touched) < nb:
                    tombs = tombs.filter(bucket_expr(key, nb).isin(touched))
                appliable = tombstone_guard(appliable, tombs, key)
            if has_current:
                # two consumers ahead (anti-join keys + upsert projection)
                # whenever stored rows exist — including the decision-col
                # path, where appliable IS dedup (the state store already
                # proved strictly-newer) but the winner join would still
                # re-run once per consumer without the cache.  Without
                # stored rows there is only the upsert path — no cache.
                appliable = appliable.persist(StorageLevel.MEMORY_AND_DISK)
                persisted.append(appliable)

            applied_keys = appliable.select(key)
            upserts = (
                appliable.filter(F.col("op") != OP_DELETE)
                .withColumn("text", html_to_text(F.col("html")))
            )
            upserts = align_to_schema(upserts, evolved)
            if keep_applied is not None:
                upserts = upserts.persist(StorageLevel.MEMORY_AND_DISK)
                keep_applied.append(upserts)

            # 5. copy-on-write: survivors of touched buckets + applied upserts
            if has_current:
                new_data = current.join(applied_keys, key, "left_anti").unionByName(upserts)
            else:
                new_data = upserts

        # 6. tombstone audit: every delete event in the batch (reference
        #    app.py:15-21 appends every delete to change_log).  Anti-join
        #    against already-stored tombstones so a duplicate delivery that
        #    lands in a *different* micro-batch than its original does not
        #    append a second (url, ts, offset) row — the audit log stays a
        #    distinct set, matching replay_oracle's semantics exactly.
        #    Passed as a THUNK: its driver-side plan construction runs in
        #    overwrite_buckets' pool thread, overlapped with the main write.
        def _tomb_appends() -> DataFrame:
            t = (
                batch_df.filter(F.col("op") == OP_DELETE)
                .select(
                    F.col(key).alias("url"),
                    F.col("warc_ts").alias("deleted_ts"),
                    F.lit("deleted").alias("key"),
                    F.col("log_offset"),
                )
                .distinct()
            )
            if has_tombs:
                t = t.join(
                    table.read_tombstones(TOMBSTONE_SCHEMA).select(
                        "url", "deleted_ts", "log_offset"
                    ),
                    ["url", "deleted_ts", "log_offset"],
                    "left_anti",
                )
            return t

        # lineage: per-source-partition offset range + row counts
        # (north_rule).  A pure transformation — no driver collect; plan
        # built in the pool thread, write runs as a concurrent Spark job
        # alongside the data write inside overwrite_buckets.  The reported
        # merge latency is captured HERE (plan time), not at thunk call.
        latency_ms = (time.time() - t0) * 1000.0

        def _lineage_df() -> DataFrame:
            ldf = (
                batch_df.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(
                    F.min("log_offset").alias("offset_start"),
                    F.max("log_offset").alias("offset_end"),
                    F.count(F.lit(1)).alias("rows_applied"),
                )
                .select(
                    F.lit(int(batch_id)).alias("batch_id"),
                    "partition_id",
                    "offset_start",
                    "offset_end",
                    "rows_applied",
                    F.lit(float(latency_ms)).alias("merge_latency_ms"),
                    F.lit(int(batch_id)).alias("commit_epoch"),
                )
            )
            return align_to_schema(ldf, LINEAGE_SCHEMA)

        _mark("plan_build")
        version = table.overwrite_buckets(
            new_data,
            touched,
            epoch_source=epoch_source,
            epoch=batch_id,
            new_schema=evolved,
            tombstone_appends=_tomb_appends,
            lineage_appends=_lineage_df,
            pre_partitioned=pre_partitioned,
            # revalidation parent = the snapshot THIS batch's plan read at
            # its top (bucket pruning, has_current, epochs all came from it)
            parent_version=m["version"],
        )
        _mark("commit_write")
        # periodic fold of the append-only tombstone/lineage branches keeps
        # per-batch guard reads and the manifest O(1) over the table's
        # lifetime (its own atomic commit; a crash between the two commits
        # loses only the fold, never data).  The fold is COSMETIC: losing a
        # CAS to a concurrent maintenance job (compact/expire between the
        # data commit above and here) must not kill the streaming query —
        # absorb one conflict with a fresh re-plan, and if the table is
        # racing that hard this trigger just skips; the next scheduled
        # batch folds everything anyway.
        if compact_appends_every and batch_id % compact_appends_every == compact_appends_every - 1:
            try:
                table.compact_appends(retries=1)
            except CommitConflictError:
                pass
            _mark("compact_appends")
        return {
            "batch_id": batch_id,
            "skipped": False,
            "version": version,
            "touched_buckets": len(touched),
            "latency_ms": latency_ms,
            "phases": phases,
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
    finally:
        for _c in persisted + _caches:
            try:
                _c.unpersist()
            except Exception:
                pass
