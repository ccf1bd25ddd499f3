"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, canonicalize both
(sort columns by name, stringify, sort rows, hash), and report matches.

Usage: python scripts/correctness_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
# data-fitted oracle literals (IVF centroids, author-merge VALUES) must be
# generated from the swept dataset; set UNCONDITIONALLY before
# __spark_entry__ loads — a stale pre-exported env silently fitting the
# oracle on the wrong dataset produced false mismatches (round-4 advice)
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF
ONLY = set(sys.argv[2:]) if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> tuple[int, str, str]:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify-then-sort mirrors the driver's value-hash tolerance path:
    # floats rounded to 6 significant-ish decimals, None/NaN unified
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)
    rows = sorted("\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    schema = ",".join(sorted(df.columns))
    return len(df), schema, h


def main() -> None:
    import __spark_entry__ as entry
    from adsimportpipeline_spark.session import get_spark

    spark = get_spark("correctness-sweep", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
            odf = con.execute(oracles[name]).df()
            sn, ss, sh = _canon(sdf)
            on, os_, oh = _canon(odf)
            ok = (sn == on) and (ss == os_) and (sh == oh)
            results[name] = {"rows": sn == on, "schema": ss == os_, "hash": sh == oh,
                             "spark_rows": sn, "oracle_rows": on}
            flag = "OK " if ok else ("ROWS" if sn != on else ("SCHEMA" if ss != os_ else "HASH"))
            print(f"{flag:6} {name} ({sn}/{on})", flush=True)
            if ss != os_:
                print(f"   spark cols: {ss}\n   oracle cols: {os_}")
        except Exception as ex:
            results[name] = {"err": str(ex)[:200]}
            print(f"ERR    {name}: {str(ex)[:160]}", flush=True)
    bad = {k: v for k, v in results.items() if v.get("err") or not (v.get("rows") and v.get("schema") and v.get("hash"))}
    print(json.dumps({"total": len(results), "green": len(results) - len(bad), "bad": sorted(bad)}))
    spark.stop()


if __name__ == "__main__":
    main()
