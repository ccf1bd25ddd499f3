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
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from .evolve import align_to_schema, reconcile_schema
from .functions.html import html_to_text
from .lake.table import LakeTable, bucket_expr
from .operators.cdc import tombstone_guard
from .operators.lww import lww_dedup, lww_dedup_salted, lww_dedup_semi
from .schema import LINEAGE_SCHEMA, OP_DELETE, TOMBSTONE_SCHEMA


def pages_schema_for(batch_schema: T.StructType) -> T.StructType:
    """Target row schema for a change-event schema: drop ``op``, add ``text``
    right after ``html`` (schema evolution on the stream flows through)."""
    fields = []
    for f in batch_schema.fields:
        if f.name == "op":
            continue
        fields.append(f)
        if f.name == "html":
            fields.append(T.StructField("text", T.StringType(), True))
    return T.StructType(fields)


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
) -> dict:
    """Apply one micro-batch of change events. Returns stats. Idempotent:
    re-delivery of an already-committed batch_id is a no-op."""
    if batch_id <= table.last_epoch(epoch_source):
        return {"batch_id": batch_id, "skipped": True}

    t0 = time.time()
    phases: dict[str, float] = {}

    def _mark(name: str) -> None:
        now = time.time()
        phases[name] = round(now - (t0 + sum(phases.values())), 3)

    m = table.manifest()
    key, nb = m["key"], m["n_buckets"]
    # batch_df is deliberately NOT cached: its three passes (lineage stats,
    # dedup, tombstone scan) each prune to a few columns, so columnar re-reads
    # from the source beat materializing the full rows on the heap
    try:
        _mark("lineage_stats")

        # 1. in-batch LWW dedup (explicit salting optional per north_rule);
        #    persisted — reused by bucket discovery AND the merge join, so the
        #    big groupBy shuffle runs once.  'semi' shuffles ordering keys
        #    only (payloads of losing events never move).
        _caches: list = []
        if salted:
            dedup = lww_dedup_salted(batch_df, key, n_salts=n_salts)
        elif dedup_strategy == "semi":
            dedup = lww_dedup_semi(batch_df, key, cleanup=_caches)
        else:
            dedup = lww_dedup(batch_df, key)
        if merge_partitions:
            dedup = dedup.repartition(merge_partitions, key)

        # 2. bucket pruning: read only touched buckets of the target table.
        #    A bulk replay touches every bucket anyway — prune_buckets=False
        #    skips the discovery job (incremental micro-batches keep it: a
        #    small batch touching k buckets reads/rewrites only those k)
        if prune_buckets:
            dedup = dedup.persist(StorageLevel.MEMORY_AND_DISK)
            touched = [
                r[0]
                for r in dedup.select(bucket_expr(key, nb).alias("b")).distinct().collect()
            ]
        else:
            touched = list(range(nb))
        _mark("dedup_and_touched")
        evolved = reconcile_schema(table.schema(m), pages_schema_for(batch_df.schema))
        current = align_to_schema(table.read_buckets(touched, m), evolved)
        # manifest-level emptiness: a fresh table / bulk first replay has no
        # stored rows and no tombstones — skip the stale-filter and guard
        # joins outright instead of shuffling every winner (wide rows!)
        # against provably-empty sides.
        has_current = any(m["buckets"].get(str(b)) for b in touched)
        has_tombs = bool(m["tombstone_files"])
        # NOTE on caching: with pruning on, dedup is persisted above (it
        # feeds both the touched-bucket discovery action and the merge
        # plan).  Otherwise every downstream consumer flows through the
        # single `appliable` plan, which is persisted below when it is more
        # than a pass-through — caching dedup too would only add a
        # write+read of every winner payload.

        # 3. stale filter: strictly-newer-than-stored (struct comparison is
        #    lexicographic on (warc_ts, log_offset) — the LWW order)
        if has_current:
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

        # 4. resurrection guard vs prior-batch tombstones.  Tombstones are
        #    pruned to the batch's touched buckets first: the guard then
        #    joins against a slice proportional to the batch, not the
        #    table's whole delete history (join strategy left to AQE).
        if has_tombs:
            tombs = table.read_tombstones(TOMBSTONE_SCHEMA).withColumnRenamed("deleted_ts", "warc_ts")
            if prune_buckets and len(touched) < nb:
                tombs = tombs.filter(bucket_expr(key, nb).isin(touched))
            appliable = tombstone_guard(appliable, tombs, key)
        if has_current and appliable is not dedup:
            # two consumers ahead (anti-join keys + upsert projection);
            # without stored rows there is only the upsert path — no cache
            appliable = appliable.persist(StorageLevel.MEMORY_AND_DISK)

        applied_keys = appliable.select(key)
        upserts = (
            appliable.filter(F.col("op") != OP_DELETE)
            .withColumn("text", html_to_text(F.col("html")))
        )
        upserts = align_to_schema(upserts, evolved)

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
        tomb_appends = (
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
            tomb_appends = tomb_appends.join(
                table.read_tombstones(TOMBSTONE_SCHEMA).select("url", "deleted_ts", "log_offset"),
                ["url", "deleted_ts", "log_offset"],
                "left_anti",
            )

        # lineage: per-source-partition offset range + row counts
        # (north_rule).  A pure transformation — no driver collect; its
        # write runs as a concurrent Spark job alongside the data write
        # inside overwrite_buckets.
        latency_ms = (time.time() - t0) * 1000.0
        lineage_df = (
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
        lineage_df = align_to_schema(lineage_df, LINEAGE_SCHEMA)

        _mark("plan_build")
        version = table.overwrite_buckets(
            new_data,
            touched,
            epoch_source=epoch_source,
            epoch=batch_id,
            new_schema=evolved,
            tombstone_appends=tomb_appends,
            lineage_appends=lineage_df,
        )
        _mark("commit_write")
        # periodic fold of the append-only tombstone/lineage branches keeps
        # per-batch guard reads and the manifest O(1) over the table's
        # lifetime (its own atomic commit; a crash between the two commits
        # loses only the fold, never data)
        if compact_appends_every and batch_id % compact_appends_every == compact_appends_every - 1:
            table.compact_appends()
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
        for _df in ("dedup", "appliable"):
            try:
                locals()[_df].unpersist()
            except Exception:
                pass
        for _c in locals().get("_caches", []):
            try:
                _c.unpersist()
            except Exception:
                pass
