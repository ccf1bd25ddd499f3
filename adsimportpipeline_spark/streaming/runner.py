"""Structured Streaming wiring: change stream -> foreachBatch apply.

Replaces the reference's RabbitMQ/Celery orchestration (config.py:38-39
at-least-once) with checkpointed foreachBatch + the lake's commit-epoch
manifest => exactly-once end-to-end.  ``trigger(availableNow=True)`` is the
bounded-replay mode (process the whole backlog as micro-batches, then stop);
kill-and-resume works because the checkpoint replays the in-flight batch id
and the epoch check makes the replay a no-op.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..apply import apply_batch
from ..lake.table import LakeTable
from ..sources.changelog import stream_change_log


def run_replay(
    spark: SparkSession,
    log_path: str,
    table_root: str,
    checkpoint: str,
    max_files_per_trigger: int | None = 8,
    salted: bool = False,
    available_now: bool = True,
    collect_stats: list | None = None,
) -> None:
    """Replay the change log into the lake table; blocks until done."""
    table = LakeTable.load(spark, table_root)
    stream = stream_change_log(spark, log_path, max_files_per_trigger)

    def _apply(batch_df, batch_id):
        stats = apply_batch(table, batch_df, batch_id, salted=salted)
        if collect_stats is not None:
            collect_stats.append(stats)

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .queryName("cdc-replay")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
        return q
