"""Every driver query vs its DuckDB oracle: row count, column names, and an
order-insensitive value hash — a local mirror of the driver's correctness
gate (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import math

import duckdb
import pytest

from adsimportpipeline_spark.plans.driver_queries import ORACLES, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _hashable(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    import pandas as pd

    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    # harness-faithful canonicalization: the driver's _canon does a pandas
    # sort_values over every column, which raises on unhashable (array)
    # values — mirror it so array-typed outputs fail HERE, not at the driver
    if srows:
        pd.DataFrame(srows, columns=scols).sort_values(by=sorted(scols))

    res = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rows {len(srows)} vs {len(orows)}"
    sh, oh = _hashable(srows, scols), _hashable(orows, ocols)
    mismatches = [(a, b) for a, b in zip(sh, oh) if a != b][:5]
    assert sh == oh, f"{name}: value mismatch, first diffs: {mismatches}"


def test_driver_registry_contract():
    """The driver records only the FIRST 50 rows of queries(): the exposed
    registry must stay <=50, resolve every name, pair every row with an
    oracle, and lead with the rows that were orphaned past position 50 in
    rounds 3-4 (the ANN suite + author_merge)."""
    from adsimportpipeline_spark.plans.driver_queries import DRIVER_REGISTRY

    assert len(DRIVER_REGISTRY) <= 50
    assert len(set(DRIVER_REGISTRY)) == len(DRIVER_REGISTRY)
    assert set(DRIVER_REGISTRY) <= set(QUERIES)
    assert set(DRIVER_REGISTRY) <= set(ORACLES)
    lead = set(DRIVER_REGISTRY[:8])
    assert {
        "author_merge", "ann_topk", "lsh_ann_topk", "ivf_ann_topk",
        "embedding_near_dups", "embedding_near_dups_lsh",
        "multimodal_decode", "doc_textstats",
    } <= lead


def test_oracleless_queries_run(spark, sf_dir):
    """Every registry query without a DuckDB twin must still execute.  The
    set is currently EMPTY — even author_merge carries a generated oracle —
    which used to surface as pytest's unexplained 'empty parameter set'
    SKIP; a plain loop keeps the suite at zero skips while still covering
    any oracle-less query someone adds later."""
    names = sorted(set(QUERIES) - set(ORACLES))
    for name in names:
        sdf = QUERIES[name](spark, sf_dir)
        assert sdf.count() >= 0
        assert len(sdf.columns) > 0
