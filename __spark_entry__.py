"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship CDC query — synthesize a deterministic change log,
LWW-dedup it, drop deleted urls, extract text with the vectorized pandas UDF
(the end-to-end plan of SURVEY.md §7.2) on sf0.001 scale inputs.

queries()/oracle_sql(): one entry per implemented operator from SURVEY.md §2
plus the training-data pipeline ops; oracles run on DuckDB over the same
parquet tables.  See adsimportpipeline_spark/plans/driver_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adsimportpipeline_spark.plans.driver_queries import (
    DRIVER_REGISTRY,
    ORACLES,
    QUERIES,
)
from adsimportpipeline_spark.session import ensure_shipped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0 with a stable schema."""
    ensure_shipped(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_shipped(spark)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return inner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # DRIVER_REGISTRY is the <=50-row driver-facing registry (the gate
    # records only the first 50 rows); QUERIES stays the full superset
    # for bench timings and tests.
    return {name: _wrap(QUERIES[name]) for name in DRIVER_REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {name: ORACLES[name] for name in DRIVER_REGISTRY if name in ORACLES}
