"""Continuous (processingTime) streaming mode: events appended to the log
directory after the query starts are picked up and applied."""

from __future__ import annotations

import time

from adsimportpipeline_spark.datagen import GenSpec, generate_change_log
from adsimportpipeline_spark.lake.table import LakeTable
from adsimportpipeline_spark.schema import PAGES_SCHEMA
from adsimportpipeline_spark.streaming.runner import run_replay


def test_continuous_mode_picks_up_new_files(spark, tmp_path):
    log = str(tmp_path / "log")
    root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    ev = generate_change_log(spark, GenSpec(n_events=2000, n_urls=100, seed=21))
    ev.filter("log_offset < 1000").coalesce(1).write.mode("overwrite").parquet(log)
    table = LakeTable.create(spark, root, PAGES_SCHEMA, n_buckets=8)

    stats: list = []
    q = run_replay(
        spark, log, root, ckpt, max_files_per_trigger=4,
        available_now=False, collect_stats=stats,
    )
    try:
        deadline = time.time() + 120
        while not stats and time.time() < deadline:
            time.sleep(1)
        assert stats, "first micro-batch never arrived"
        n1 = table.read().count()
        assert n1 > 0

        # append more events while the query runs
        ev.filter("log_offset >= 1000").coalesce(1).write.mode("append").parquet(log)
        deadline = time.time() + 120
        while len(stats) < 2 and time.time() < deadline:
            time.sleep(1)
        assert len(stats) >= 2, "appended file was not consumed"
        q.processAllAvailable()
        assert table.read().count() >= n1
    finally:
        q.stop()
