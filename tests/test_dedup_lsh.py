"""LSH hygiene: a boilerplate corpus (hundreds of near-identical pages that
all land in one band bucket) must NOT produce a quadratic candidate-pair
explosion once the bucket cap is on, and the cap must be auditable (never
silent) via lsh_bucket_stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from adsimportpipeline_spark.operators.dedup import (
    lsh_bucket_stats,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)

N_BOILER = 60


def _corpus(spark):
    # 60 identical boilerplate docs (one mega-bucket) + 2 genuine near-dups
    rows = [(i, "cookie banner accept terms privacy policy contact") for i in range(N_BOILER)]
    rows += [
        (1000, "quick brown fox jumps over the lazy dog in the misty park tonight"),
        (1001, "quick brown fox jumps over the lazy dog in the misty park today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_cap_bounds_pairs_and_is_audited(spark):
    docs = _corpus(spark)
    sh = word_shingles(docs, "doc_id", "text", 3)
    sigs = minhash_signatures(sh, "doc_id", 8).persist()

    uncapped = lsh_candidate_pairs(sigs, "doc_id", 8, 2).count()
    assert uncapped >= N_BOILER * (N_BOILER - 1) // 2  # quadratic explosion

    capped = lsh_candidate_pairs(sigs, "doc_id", 8, 2, bucket_cap=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # boilerplate pairs gone, the genuine near-dup pair survives
    assert (1000, 1001) in pairs
    assert len(pairs) < 10

    stats = lsh_bucket_stats(sigs, "doc_id", 8, 2, bucket_cap=10)
    dropped = stats.filter(F.col("dropped")).agg(F.sum("members")).collect()[0][0]
    assert dropped and dropped >= N_BOILER  # the cap is visible, not silent
    sigs.unpersist()


def test_jaccard_verify_equi_join_matches_set_formula(spark):
    """The (pair, shingle) equi-join count must reproduce the literal
    set-intersection/union Jaccard exactly (same 6-dp rounding), including
    dropping sub-threshold and zero-intersection pairs."""
    from adsimportpipeline_spark.operators.dedup import jaccard_verify, word_shingles

    docs = _corpus(spark)
    sh = word_shingles(docs, "doc_id", "text", 3)
    pairs = spark.createDataFrame(
        [(1000, 1001), (0, 1), (0, 1000)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_verify(pairs, sh, "doc_id", threshold=0.1).collect()
    }
    # oracle: python sets over the same shingles
    sh_rows = sh.collect()
    sets: dict = {}
    for r in sh_rows:
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    want = {}
    for a, b in [(1000, 1001), (0, 1), (0, 1000)]:
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        jac = round(inter / union, 6)
        if jac >= 0.1:
            want[(a, b)] = jac
    assert got == want
    assert (0, 1000) not in got  # zero-intersection pair dropped


def test_brute_near_dups_refuses_big_scans(spark, sf_dir, tmp_path):
    """The O(n^2) baseline must refuse when footers prove the input exceeds
    max_rows, and point at the LSH twin."""
    import pytest as _pytest

    from adsimportpipeline_spark.operators.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with _pytest.raises(ValueError, match="embedding_near_dups_lsh"):
        embedding_near_dups(emb, max_rows=100)
    # under the bound it runs; explicit override also runs
    assert embedding_near_dups(emb, threshold=0.25).count() > 0


def test_lsh_ann_recall_floor(spark, sf_dir):
    """Multi-probe LSH-ANN must recall a healthy share of the exact top-5
    and never less than single-probe (the recall lever actually levers)."""
    from pyspark.sql import functions as F

    from adsimportpipeline_spark.operators.similarity import (
        brute_force_topk,
        lsh_ann_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(emb, queries, k=5).collect()}
    single = {
        (r["query_id"], r["vec_id"])
        for r in lsh_ann_topk(emb, queries, k=5, multi_probe=False).collect()
    }
    multi = {
        (r["query_id"], r["vec_id"])
        for r in lsh_ann_topk(emb, queries, k=5, multi_probe=True).collect()
    }
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.5

    # both standard recall levers composed — multi-probe x 3 independent
    # hash tables — must clear the production bar
    tabled = {
        (r["query_id"], r["vec_id"])
        for r in lsh_ann_topk(emb, queries, k=5, multi_probe=True, n_tables=3).collect()
    }
    r_tabled = len(exact & tabled) / len(exact)
    assert r_tabled >= r_multi
    assert r_tabled >= 0.9


def test_ivf_ann_probe_lever_and_exactness(spark, sf_dir):
    """IVF-ANN: recall must be monotone in n_probe (the dial actually
    dials), and probing ALL cells must equal the exact brute-force top-k —
    IVF's precision is exact by construction, recall is the only
    approximation."""
    from pyspark.sql import functions as F

    from adsimportpipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    recalls = []
    for probe in (1, 2, 8):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_ann_topk(
                emb, queries, k=5, n_lists=8, n_probe=probe
            ).collect()
        }
        recalls.append(len(exact & got) / len(exact))
    assert recalls == sorted(recalls)  # monotone in n_probe
    assert recalls[1] >= 0.5  # the bench configuration's floor
    assert recalls[2] == 1.0  # all cells probed == exact top-k


def test_ivf_fitted_centroids_lift_recall(spark):
    """On a clusterable corpus, seeded-Lloyd's centroids must lift IVF
    recall decisively over the naive first-k init at the SAME 2-of-8 probe
    budget (the sandbox's synthetic embeddings are isotropic, where no
    centroid choice can matter — this is the operator's real claim)."""
    import numpy as np

    from adsimportpipeline_spark.operators.similarity import (
        brute_force_topk,
        fit_ivf_centroids,
        ivf_ann_topk,
    )

    rng = np.random.RandomState(7)
    centers = rng.randn(8, 64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.vstack([c + (0.6 / 8.0) * rng.randn(120, 64) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    )
    queries = df.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(df, queries, k=5).collect()}

    def _recall(centroids):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_ann_topk(
                df, queries, k=5, n_lists=8, n_probe=2, centroids=centroids
            ).collect()
        }
        return len(exact & got) / len(exact)

    r_naive = _recall(None)  # first-8 rows: all from cluster 0
    r_fit = _recall(fit_ivf_centroids(pts, 8, 3, 13))
    assert r_fit >= 0.9
    assert r_fit > r_naive


def test_embedding_near_dup_lsh_recall_vs_brute(spark, sf_dir):
    """The bucketed embedding near-dup path must (a) be a SUBSET of the brute
    pairs at the same threshold (verification is exact, only candidate
    recall is approximate) and (b) recall at least the analytic expectation
    minus slack.  The corpus' strongest pair is cos~0.46, i.e. the WEAK
    regime: per-table collision is (1-theta/pi)^planes, so with planes=2 x
    tables=4 at the 0.25 threshold (theta<=75.5deg) expected recall is
    >=1-(1-0.336)^4 ~ 0.81."""
    from pyspark.sql import functions as F

    from adsimportpipeline_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") % 5 == 0
    )
    brute = {(r["id_a"], r["id_b"]) for r in embedding_near_dups(emb, threshold=0.25).collect()}
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups_lsh(
            emb, threshold=0.25, n_planes=2, n_tables=4
        ).collect()
    }
    assert lsh <= brute
    assert brute  # non-trivial corpus
    assert len(lsh & brute) / len(brute) >= 0.6


def test_duplicate_clusters_components_and_survivors(spark):
    """Connected components over an explicit pair graph: a 4-chain (its
    diameter exercises the pointer-jumping rounds), a 2-cycle-free pair,
    and singletons must each resolve to the component-min label — matching
    a pure-Python union-find oracle."""
    from adsimportpipeline_spark.operators.dedup import duplicate_clusters

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20, 7]], "doc_id long")
    # chain 1-2-3-4 (edges given in "worst" order), pair 10-11, singletons 20 and 7
    pairs = spark.createDataFrame(
        [(3, 4), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )

    # union-find oracle
    parent = {i: i for i in [1, 2, 3, 4, 10, 11, 20, 7]}
    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x
    for a, b in [(3, 4), (1, 2), (2, 3), (10, 11)]:
        ra, rb = find(a), find(b)
        parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in parent}

    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(nodes, pairs).collect()}
    assert got == expected


def test_duplicate_clusters_long_chain_converges_fast(spark):
    """A 33-node path graph (diameter 32) must converge well inside
    max_iter thanks to pointer jumping — plain propagation would need 32
    rounds; the default cap of 25 would fail without the jump step."""
    from adsimportpipeline_spark.operators.dedup import duplicate_clusters

    n = 33
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(nodes, pairs).collect()}
    assert got == {i: 0 for i in range(n)}


def test_duplicate_clusters_reliable_checkpoint_dir(spark, tmp_path):
    """The cluster deployment mode: with ``checkpoint_dir`` the CC loop
    truncates lineage via RELIABLE df.checkpoint() into the given dir and
    must converge to the same labels as the localCheckpoint default; the
    dir must actually receive checkpoint data (driver-restart safety is
    real, not a code path that silently fell back)."""
    import os

    from adsimportpipeline_spark.operators.dedup import duplicate_clusters

    n = 17
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    ckdir = str(tmp_path / "cc_ckpt")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(
            nodes, pairs, checkpoint_dir=ckdir
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}
    walked = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert walked, "reliable checkpoint dir stayed empty — fallback happened"


def test_jaccard_verify_assume_distinct_false_dedups_dirty_inputs(spark):
    """Duplicate (doc, shingle) and (id_a, id_b) rows inflate the equi-join
    counts; assume_distinct=False must dedup first and reproduce the clean
    result exactly."""
    from adsimportpipeline_spark.operators.dedup import jaccard_verify, word_shingles

    docs = _corpus(spark)
    sh = word_shingles(docs, "doc_id", "text", 3)
    pairs = spark.createDataFrame(
        [(1000, 1001), (0, 1), (0, 1000)], "id_a long, id_b long"
    )
    clean = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_verify(pairs, sh, "doc_id", threshold=0.1).collect()
    }
    dirty = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_verify(
            pairs.union(pairs),
            sh.union(sh),
            "doc_id",
            threshold=0.1,
            assume_distinct=False,
        ).collect()
    }
    assert dirty == clean and clean
