"""spark-submit entry point: replay a change log into a lake table.

Cluster deployment (north_rule):

    python scripts/package.py                       # builds dist/adsimportpipeline_spark.zip
    spark-submit --py-files dist/adsimportpipeline_spark.zip \
        scripts/submit_replay.py <log_path> <table_root> <checkpoint_dir> [max_files_per_trigger]

The script only uses the package through its public API, so it runs
identically on local[] masters and multi-executor clusters — the package
reaches executors via --py-files (no installation required).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    log_path, table_root, checkpoint = sys.argv[1:4]
    max_files = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    spark = SparkSession.builder.appName("cdc-replay-submit").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from adsimportpipeline_spark.lake.table import LakeTable
    from adsimportpipeline_spark.schema import PAGES_SCHEMA
    from adsimportpipeline_spark.streaming.runner import run_replay

    LakeTable.create(spark, table_root, PAGES_SCHEMA)
    stats: list = []
    run_replay(spark, log_path, table_root, checkpoint,
               max_files_per_trigger=max_files, collect_stats=stats)
    table = LakeTable.load(spark, table_root)
    print(json.dumps({
        "batches": len(stats),
        "rows": table.read().count(),
        "version": table.current_version(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
