"""Per-query isolation bench (guide §1.4) — NOT the official bench.

Times each headline query with the noop sink at a chosen SF, min-of-N
passes, and optionally dumps .explain("formatted") per query to a plans
dir.  bench.py stays frozen; this file exists so optimization work can
measure query-by-query without touching the official protocol.

Usage:
    python bench_extra.py [--sf-dir DIR] [--queries a,b,c] [--passes N]
                          [--plans-dir plans/r06] [--suffix _before]
Prints one JSON line: {"sf_dir": ..., "timings": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from adsimportpipeline_spark.functions.html import html_to_text
    from adsimportpipeline_spark.plans.driver_queries import QUERIES
    from adsimportpipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # same conf as bench.py's _fresh_spark queries child, for comparability
    spark = get_spark(
        "bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(2 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # same headline set as bench.py (order preserved)
    headline = [
        "cdc_final_state", "cdc_apply_replay", "lww_latest",
        "lww_latest_salted", "origin_trust_merge", "record_merge",
        "pricing_summary", "top_revenue_orders", "semi_join_lookup",
        "embedding_near_dups_lsh", "doc_minhash_pairs", "doc_simhash",
        "ann_topk", "lsh_ann_topk", "ivf_ann_topk",
    ]
    names = [n for n in args.queries.split(",") if n] or headline
    stash_list = {"ann_topk", "lsh_ann_topk", "ivf_ann_topk",
                  "embedding_near_dups_lsh"}
    warm_sf = "/root/testdata/sf0.001"

    # python workers warm (same as bench.py)
    spark.range(0, cpus * 2, 1, cpus * 2).select(
        html_to_text(F.encode(F.lit("<p>warm</p>"), "utf-8"))
    ).write.format("noop").mode("overwrite").save()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        import sys

        print(f"bench_extra: unknown queries skipped: {unknown}", file=sys.stderr)
    timings: dict[str, float] = {}
    for name in names:
        if name not in QUERIES:
            continue
        if args.plans_dir:
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        if not args.no_warm:
            try:
                QUERIES[name](spark, warm_sf).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
        best = None
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = QUERIES[name](spark, args.sf_dir)
            if name in stash_list:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        timings[name] = best
    spark.stop()
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": cpus, "timings": timings}))


if __name__ == "__main__":
    main()
