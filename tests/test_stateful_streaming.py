"""applyInPandasWithState in-stream LWW: decisions across micro-batches must
reproduce the global LWW outcome the pure-Python oracle computes — late,
out-of-order and duplicated events decided from streaming STATE, no table
reads."""

from __future__ import annotations

from adsimportpipeline_spark.datagen import GenSpec, generate_change_log, write_change_log
from adsimportpipeline_spark.sources.changelog import stream_change_log
from adsimportpipeline_spark.streaming.stateful import stateful_lww_decisions


def test_stateful_lww_matches_oracle(spark, tmp_path):
    from adsimportpipeline_spark.datagen import replay_oracle

    spec = GenSpec(n_events=3000, n_urls=200, seed=7)
    log = str(tmp_path / "log")
    write_change_log(spark, log, spec, n_files=6)

    stream = stream_change_log(spark, log, max_files_per_trigger=2)  # 3 batches
    out = stateful_lww_decisions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("lww_decisions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM lww_decisions").collect()

    events = generate_change_log(spark, spec).collect()
    assert len(rows) == len(events)  # one decision per event

    pages, _ = replay_oracle([r.asDict() for r in events])
    # oracle winner per url including deletes-as-winners
    best: dict[str, tuple] = {}
    for ev in events:
        k = (ev["warc_ts"], ev["log_offset"])
        if ev["url"] not in best or k > best[ev["url"]]:
            best[ev["url"]] = k

    applied: dict[str, tuple] = {}
    for r in rows:
        if r["decision"] != "apply":
            continue
        k = (r["warc_ts"], r["log_offset"])
        # every apply is strictly newer than the previous applies of its url
        assert r["url"] not in applied or k > applied[r["url"]]
        applied[r["url"]] = max(applied.get(r["url"], k), k)

    assert applied == best  # last apply per url IS the global LWW winner

    # deterministic decision mix: duplicates exist in the generated log
    kinds = {r["decision"] for r in rows}
    assert kinds == {"apply", "stale", "duplicate"}


def test_stateful_first_event_pre_epoch_is_applied(spark, tmp_path):
    """Absence of state is the fresh-url sentinel: a url whose FIRST-ever
    event carries a pre-1970 warc_ts (negative epoch micros — corrupted or
    zero-adjusted crawl data) must be 'apply', not 'stale'.  A magic
    (-1, -1) high-water mark classified it as stale and silently dropped
    it."""
    from datetime import datetime, timezone

    from adsimportpipeline_spark.schema import CHANGE_EVENT_SCHEMA

    pre = datetime(1969, 12, 30, tzinfo=timezone.utc).replace(tzinfo=None)
    post = datetime(1970, 1, 2)
    rows = [
        ("u-pre", pre, 1, "insert", b"<p>old</p>", "en", "crawl", "fp1"),
        ("u-pre", post, 2, "update", b"<p>new</p>", "en", "crawl", "fp2"),
        ("u-norm", post, 3, "insert", b"<p>x</p>", "en", "crawl", "fp3"),
    ]
    log = str(tmp_path / "prelog")
    spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA).write.parquet(log)

    stream = stream_change_log(spark, log, max_files_per_trigger=10)
    q = (
        stateful_lww_decisions(stream)
        .writeStream.format("memory")
        .queryName("pre_epoch_decisions")
        .option("checkpointLocation", str(tmp_path / "preckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["url"], r["log_offset"]): r["decision"]
        for r in spark.sql("SELECT * FROM pre_epoch_decisions").collect()
    }
    assert got[("u-pre", 1)] == "apply"   # pre-epoch first sight
    assert got[("u-pre", 2)] == "apply"   # strictly newer
    assert got[("u-norm", 3)] == "apply"


def test_stateful_replay_kill_and_resume(spark, tmp_path):
    """The FULL state-store replay mode (run_replay_stateful): in-stream LWW
    decisions drive the sink with no stale/guard table joins; an injected
    crash mid-replay, then resume from the same checkpoint — the state store
    rolls back to the failed batch's version, decisions replay identically,
    committed epochs no-op, and the final table equals the oracle."""
    import pytest

    from adsimportpipeline_spark.apply import apply_batch
    from adsimportpipeline_spark.datagen import replay_oracle
    from adsimportpipeline_spark.lake.table import LakeTable
    from adsimportpipeline_spark.schema import PAGES_SCHEMA, TOMBSTONE_SCHEMA
    from adsimportpipeline_spark.streaming.runner import run_replay_stateful

    spec = GenSpec(n_events=6000, n_urls=300, seed=11)
    log = str(tmp_path / "slog")
    root = str(tmp_path / "stbl")
    ckpt = str(tmp_path / "sckpt")
    write_change_log(spark, log, spec, n_files=8)
    table = LakeTable.create(spark, root, PAGES_SCHEMA, n_buckets=16)

    # crash injection: run the stateful pipeline manually, die on batch 2
    from pyspark.sql import functions as F

    from adsimportpipeline_spark.streaming.stateful import stateful_lww_decisions

    hits: list = []

    def _apply_once(batch_df, batch_id):
        if len(hits) >= 2:
            raise RuntimeError("injected crash")
        hits.append(batch_id)
        pruned = batch_df.filter(
            (F.col("decision") == "apply") | (F.col("op") == "delete")
        )
        apply_batch(table, pruned, batch_id, decision_col="decision")

    decided = stateful_lww_decisions(
        stream_change_log(spark, log, 2), passthrough_payload=True
    )
    q = (
        decided.writeStream.foreachBatch(_apply_once)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    assert len(hits) == 2  # crashed mid-replay with real progress committed

    # resume from the same checkpoint: the in-flight batch replays against
    # the rolled-back state version, later batches complete the backlog
    run_replay_stateful(spark, log, root, ckpt, max_files_per_trigger=2)

    events = [r.asDict() for r in generate_change_log(spark, spec).collect()]
    pages, tombs = replay_oracle(events)
    got = {r["url"]: r.asDict() for r in table.read().collect()}
    assert len(got) == len(pages)
    for url, exp in pages.items():
        assert got[url]["text"] == exp["text"]
        assert got[url]["log_offset"] == exp["log_offset"]
        assert got[url]["warc_ts"] == exp["warc_ts"]
    got_tombs = sorted(
        (r["url"], r["deleted_ts"], r["log_offset"])
        for r in table.read_tombstones(TOMBSTONE_SCHEMA).collect()
    )
    assert got_tombs == tombs


def test_stateful_replay_maintains_lsh_index(spark, tmp_path):
    """Stateful replay with lsh_index_root: the in-stream LWW path maintains
    the same band index as the default path — valid pairs equal a full batch
    recompute over the final table."""
    from adsimportpipeline_spark.lake.table import LakeTable
    from adsimportpipeline_spark.operators import dedup
    from adsimportpipeline_spark.operators.incremental_dedup import lsh_index_pairs
    from adsimportpipeline_spark.schema import PAGES_SCHEMA
    from adsimportpipeline_spark.streaming.runner import run_replay_stateful

    spec = GenSpec(n_events=3000, n_urls=150, seed=23)
    log = str(tmp_path / "log")
    write_change_log(spark, log, spec, n_files=5)
    table = LakeTable.create(spark, str(tmp_path / "pages"), PAGES_SCHEMA, n_buckets=8)
    run_replay_stateful(
        spark, log, table.root, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, lsh_index_root=str(tmp_path / "lsh"),
    )
    index = LakeTable.load(spark, str(tmp_path / "lsh"))
    final = table.read()
    incremental = {
        tuple(r)
        for r in lsh_index_pairs(
            index, final.select("url", "warc_ts", "log_offset")
        ).collect()
    }
    sigs = dedup.minhash_signatures(
        dedup.word_shingles(final, id_col="url"), id_col="url"
    )
    batch = {
        tuple(r) for r in dedup.lsh_candidate_pairs(sigs, id_col="url").collect()
    }
    assert incremental == batch
    assert incremental
