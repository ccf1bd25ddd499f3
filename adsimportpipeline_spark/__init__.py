"""adsimportpipeline_spark — a from-scratch PySpark-native CDC / incremental-
ingest engine with the capabilities of adsabs/ADSImportPipeline.

The reference (``/root/reference``, adsabs/ADSImportPipeline @ 2025-08-08) is a
RabbitMQ/Celery pipeline that detects changed records by fingerprint diff,
merges multi-origin versions with per-field priority + last-writer-wins rules,
and upserts canonical records into Postgres with delete tombstones.  This
package re-expresses those semantics Spark-first:

- change feed        -> append-only change-event parquet/stream source
- fingerprint diff   -> changed/new join filters (``operators.cdc``)
- priority+LWW merge -> window / max_by aggregation (``operators.lww``,
                        ``operators.merge_rules``)
- Postgres upsert    -> bucketed copy-on-write lake table with atomic
                        manifest commits (``lake.table``); Iceberg
                        ``MERGE INTO`` is the drop-in at cluster scale
- Celery workers     -> Structured Streaming ``foreachBatch`` with
                        commit-epoch idempotency (``apply``, ``streaming``)

Everything is DataFrame-first; the only Python on the hot path is vectorized
pandas/Arrow UDFs (HTML->text extraction).
"""

__version__ = "0.1.0"
