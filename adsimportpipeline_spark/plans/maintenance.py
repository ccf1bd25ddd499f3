"""Maintenance plans: orphan deletion and tombstone replay.

Reference lifecycle §3.3 (SURVEY.md): ``--process-deletions`` computes
store-keys − feed-keys (app.py:106-117), aborts above a cap (run.py:65-72),
deletes each orphan + writes a tombstone (app.py:15-21); ``--replay-
deletions`` re-submits tombstoned keys (run.py:330-333).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..apply import apply_batch
from ..lake.table import LakeTable
from ..operators.cdc import guard_deletion_cap, orphaned_records
from ..schema import TOMBSTONE_SCHEMA


def delete_orphans(
    table: LakeTable,
    feed: DataFrame,
    batch_id: int,
    max_deletions: int = 2000,
    epoch_source: str = "maintenance",
) -> dict:
    """Delete every stored url absent from the canonical feed.

    Orphans become synthetic delete events ordered strictly after the
    stored row (same warc_ts, log_offset+1) so the LWW merge applies them
    deterministically; the deletion cap guards against a truncated feed
    wiping the table (reference run.py:185-188).
    """
    stored = table.read().select("url", "warc_ts", "log_offset")
    orphans = orphaned_records(stored, feed, key="url")
    n = guard_deletion_cap(orphans, max_deletions)
    if n == 0:
        return {"deleted": 0, "skipped": True}
    delete_events = orphans.select(
        "url",
        F.col("warc_ts"),
        (F.col("log_offset") + 1).alias("log_offset"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("lang"),
        F.lit("maintenance").alias("source_origin"),
        F.lit(None).cast("string").alias("fingerprint"),
    )
    stats = apply_batch(table, delete_events, batch_id, epoch_source=epoch_source)
    stats["deleted"] = n
    return stats


def replay_deletions(table: LakeTable) -> DataFrame:
    """Re-read the tombstone audit log as a batch source
    (reference run.py:330-333 ChangeLog scan)."""
    return table.read_tombstones(TOMBSTONE_SCHEMA)
