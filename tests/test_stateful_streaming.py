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
