"""Change-log sources: batch and streaming readers of the CDC event log.

Replaces the reference's feed readers (read_bibcodes run.py:34-62, direct
log tails run.py:228-271) with Spark sources.  The streaming variant is a
file-stream over an append-only parquet directory — at cluster scale the
same contract is served by a Kafka/binlog source; only this module changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import CHANGE_EVENT_SCHEMA


def read_change_log(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the whole log (replay mode)."""
    return spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(path)


def stream_change_log(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Incremental file-stream over the log directory.

    ``maxFilesPerTrigger`` is the backpressure knob — the analog of the
    reference's BIBCODES_PER_JOB chunking (run.py:77-91, config.py:32).
    """
    r = spark.readStream.schema(CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def read_feed_tsv(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Priority-ordered TSV feed reader: ``key \\t fingerprint`` lines,
    first-file-wins on duplicate keys, '#'/blank/malformed lines skipped.

    Faithful port of the reference feed semantics (run.py:34-62: OrderedDict
    setdefault => first writer wins across files read in priority order;
    comment/malformed filtering run.py:47-57) as a window over file priority.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dfs = []
    for prio, p in enumerate(paths):
        dfs.append(
            spark.read.text(p).select(
                F.col("value"), F.lit(prio).alias("_prio")
            )
        )
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d)
    parts = F.split(F.col("value"), "\t")
    parsed = (
        df.filter(~F.col("value").startswith("#"))
        .filter(F.trim(F.col("value")) != "")
        .withColumn("_parts", parts)
        .filter(F.size("_parts") == 2)
        .select(
            F.col("_parts")[0].alias("key"),
            F.col("_parts")[1].alias("fingerprint"),
            F.col("_prio"),
        )
    )
    w = Window.partitionBy("key").orderBy(F.col("_prio").asc())
    return (
        parsed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )
