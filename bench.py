"""Benchmark: CDC replay throughput at two parallelism levels + headline
query timings.

Prints ONE JSON line:
  {"metric": "change_events_per_sec", "value": <events/sec at high
   parallelism>, "unit": "events/sec", "queries": {name: sec, ...},
   "sf": <sf>, "scaling": {...}}

The scaling section evidences the north_rule's two-cluster-size criterion in
this single-node sandbox: the identical replay job runs at N and 4N local
cores on the same input; efficiency = (thr_4N / thr_N) / 4 (target >= 0.8).
Also writes BENCH/BASELINE.md with the same numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
SF = float(SF_DIR.rstrip("/").split("sf")[-1])

#: replay size scales with sf; sf0.1 -> 1.2M events over 60k urls
N_EVENTS = max(int(12_000_000 * SF), 50_000)
N_URLS = max(int(600_000 * SF), 2_000)

HEADLINE = [
    "cdc_final_state",
    "lww_latest",
    "lww_latest_salted",
    "origin_trust_merge",
    "pricing_summary",
    "top_revenue_orders",
    "semi_join_lookup",
    "doc_minhash_pairs",
    "doc_simhash",
    "ann_topk",
]


def _fresh_spark(cores: int, name: str):
    from adsimportpipeline_spark.session import get_spark

    return get_spark(name, master=f"local[{cores}]", shuffle_partitions=max(cores * 2, 16))


def replay_once(cores: int, log_path: str, n_events: int) -> float:
    """End-to-end replay of the pre-written change log into a fresh lake
    table at the given core count; returns events/sec."""
    from adsimportpipeline_spark.apply import apply_batch
    from adsimportpipeline_spark.lake.table import LakeTable
    from adsimportpipeline_spark.schema import PAGES_SCHEMA
    from adsimportpipeline_spark.sources.changelog import read_change_log

    spark = _fresh_spark(cores, f"bench-replay-{cores}")
    try:
        root = tempfile.mkdtemp(prefix=f"benchtbl{cores}-")
        table = LakeTable.create(spark, root, PAGES_SCHEMA, n_buckets=max(cores * 4, 32))
        df = read_change_log(spark, log_path)
        t0 = time.time()
        apply_batch(table, df, batch_id=0, salted=False, merge_partitions=max(cores * 2, 16))
        wall = time.time() - t0
        shutil.rmtree(root, ignore_errors=True)
        return n_events / wall
    finally:
        spark.stop()


def main() -> None:
    from adsimportpipeline_spark.datagen import GenSpec, write_change_log
    from adsimportpipeline_spark.plans.driver_queries import QUERIES

    # --- write the shared replay input once (not timed) -----------------
    gen_spark = _fresh_spark(CPUS, "bench-datagen")
    log_path = os.path.join(tempfile.gettempdir(), f"bench_log_sf{SF}")
    spec = GenSpec(n_events=N_EVENTS, n_urls=N_URLS, seed=42)
    write_change_log(gen_spark, log_path, spec, n_files=max(CPUS * 2, 16))
    gen_spark.stop()

    # --- scaling: same job, N and 4N cores ------------------------------
    n_low = max(CPUS // 4, 2)
    n_high = CPUS
    thr_low = replay_once(n_low, log_path, N_EVENTS)
    thr_high = replay_once(n_high, log_path, N_EVENTS)
    efficiency = (thr_high / thr_low) / (n_high / n_low)

    # --- headline queries at full parallelism ---------------------------
    spark = _fresh_spark(CPUS, "bench-queries")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()

    result = {
        "metric": "change_events_per_sec",
        "value": round(thr_high, 1),
        "unit": "events/sec",
        "queries": timings,
        "sf": SF,
        "replay_events": N_EVENTS,
        "replay_urls": N_URLS,
        "scaling": {
            "cores_low": n_low,
            "cores_high": n_high,
            "events_per_sec_low": round(thr_low, 1),
            "events_per_sec_high": round(thr_high, 1),
            "efficiency": round(efficiency, 3),
        },
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH — CDC replay scaling evidence\n\n"
            "Same job (full change-log replay into a fresh lake table, LWW dedup +\n"
            "tombstones + vectorized HTML->text + copy-on-write commit) on identical\n"
            f"input ({N_EVENTS} events, {N_URLS} urls, seed 42):\n\n"
            "| parallelism | events/sec |\n|---|---|\n"
            f"| local[{n_low}] | {thr_low:,.0f} |\n"
            f"| local[{n_high}] | {thr_high:,.0f} |\n\n"
            f"Scaling efficiency N->{n_high//n_low}N: **{efficiency:.3f}** "
            "(north_rule target >= 0.8).\n\n"
            f"Headline query timings at sf={SF} on local[{CPUS}]:\n\n"
            "| query | sec |\n|---|---|\n"
            + "".join(f"| {k} | {v} |\n" for k, v in timings.items())
        )

    shutil.rmtree(log_path, ignore_errors=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
