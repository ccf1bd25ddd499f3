"""Golden cases for the per-field merge driver, mirroring the reference's
tests/classic/test_merger.py:22-118 (multipleOriginMerger, takeAll,
booleanMerger, referencesMerger, publicationMerger/altpublications) plus the
equalTrustFallback asymmetry (merger.py:320-339): same-origin ties resolve
by modtime, cross-origin equal-priority ties by content length."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import types as T

from adsimportpipeline_spark.operators.record_merge import record_merge

PRIO = {"iop": 1.0, "simbad": 0.8, "sti": 0.5, "crossref": 0.5, "author": 0.3}

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("field", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("modtime", T.TimestampType()),
        T.StructField("offset", T.LongType()),
        T.StructField("alternate", T.BooleanType()),
    ]
)


def _merge(spark, rows, rules, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = record_merge(
        df, rules, key="url", alternate_col="alternate", priority_map=PRIO, **kw
    )
    return {r["url"]: r.asDict() for r in out.collect()}


def _t(i):
    return datetime(2020, 1, 1, 0, 0, i)


def test_origin_trust_priority_and_cascade(spark):
    rows = [
        # u1: higher-priority origin wins regardless of recency/length
        ("u1", "titles", "Publisher title", "iop", _t(1), 1, False),
        ("u1", "titles", "SIMBAD much longer title", "simbad", _t(9), 2, False),
        # u2: same origin twice -> latest modtime wins even though shorter
        ("u2", "titles", "old but much longer text", "sti", _t(1), 3, False),
        ("u2", "titles", "new short", "sti", _t(5), 4, False),
        # u3: equal-priority different origins -> LONGER content wins
        #     even though the other is newer (cross-origin cascade)
        ("u3", "titles", "the much longer older title", "sti", _t(1), 5, False),
        ("u3", "titles", "newer short", "crossref", _t(9), 6, False),
        # u4: empty content loses to non-empty despite higher priority
        ("u4", "titles", "", "iop", _t(9), 7, False),
        ("u4", "titles", "something", "author", _t(1), 8, False),
    ]
    out = _merge(spark, rows, {"titles": "origin_trust"})
    assert out["u1"]["titles"] == "Publisher title"
    assert out["u2"]["titles"] == "new short"
    assert out["u3"]["titles"] == "the much longer older title"
    assert out["u4"]["titles"] == "something"


def test_take_all_and_priority_order(spark):
    rows = [
        ("u1", "keywords", "b", "sti", _t(1), 1, False),
        ("u1", "keywords", "a", "sti", _t(1), 2, False),
        ("u1", "keywords", "b", "iop", _t(1), 3, False),  # dup: first kept
        ("u1", "doi", "10.1/x", "sti", _t(1), 4, False),
        ("u1", "doi", "10.1/pub", "iop", _t(1), 5, False),  # priority first
        ("u1", "refereed", "false", "sti", _t(1), 6, False),
        ("u1", "refereed", "true", "iop", _t(1), 7, False),
    ]
    out = _merge(
        spark,
        rows,
        {"keywords": "take_all", "doi": "take_all_by_priority", "refereed": "boolean"},
    )
    assert out["u1"]["keywords"] == ["b", "a"]  # encounter order, dedup'd
    assert out["u1"]["doi"] == ["10.1/pub", "10.1/x"]  # publisher DOI first
    assert out["u1"]["refereed"] is True


def test_references_always_append(spark):
    rows = [
        ("u1", "references", "r1;r2", "iop", _t(5), 1, False),  # trust winner
        ("u1", "references", "r9", "sti", _t(1), 2, False),  # loses, dropped
        ("u1", "references", "r2;r3", "author", _t(1), 3, False),  # appended
    ]
    out = _merge(
        spark,
        rows,
        {"references": "references"},
        references_always_append=["author"],
    )
    # winner list first, append-origin values unioned in, dedup keeps first
    assert out["u1"]["references"] == ["r1", "r2", "r3"]


def test_publication_and_altpublications(spark):
    rows = [
        ("u1", "publication", "ApJ vol 1", "iop", _t(1), 1, False),
        ("u1", "publication", "ApJ preprint", "sti", _t(2), 2, False),
        ("u1", "publication", "arXiv alt", "author", _t(3), 3, True),
        ("u1", "publication", "conf alt", "sti", _t(4), 4, True),
    ]
    out = _merge(spark, rows, {"publication": "publication"})
    assert out["u1"]["publication"] == "ApJ vol 1"  # alternates never compete
    assert out["u1"]["altpublications"] == ["arXiv alt", "conf alt"]


def test_absent_field_is_null(spark):
    rows = [
        ("u1", "titles", "t", "sti", _t(1), 1, False),
    ]
    out = _merge(spark, rows, {"titles": "origin_trust", "keywords": "take_all"})
    assert out["u1"]["titles"] == "t"
    assert out["u1"]["keywords"] is None


def test_author_merge_composition(spark):
    """A10 end-to-end (reference test_merger.py test_AuthorMerger shape):
    the higher-priority block's author list wins; winners lacking an
    affiliation get it from the matched loser author."""
    from adsimportpipeline_spark.operators.enrich import author_merge

    rows = [
        # winner block (iop, priority 1.0): two authors, first lacks affil
        ("u1", "iop", _t(5), "accomazzi, alberto", None, 0),
        ("u1", "iop", _t(5), "grant, carolyn s.", "ADS", 1),
        # loser block (sti): matching names carry affiliations
        ("u1", "sti", _t(1), "accomazzi, a.", "CfA", 0),
        ("u1", "sti", _t(1), "stern grant, c.", "Harvard", 1),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, origin string, modtime timestamp, name string, "
        "affiliation string, author_pos int",
    )
    out = {r["name"]: r.asDict() for r in author_merge(df, PRIO).collect()}
    assert set(out) == {"accomazzi, alberto", "grant, carolyn s."}  # winner list
    assert out["accomazzi, alberto"]["affiliation"] == "CfA"  # filled from loser
    assert out["grant, carolyn s."]["affiliation"] == "ADS"  # kept


def test_name_normalization_and_ratio_metric():
    """F6/F16/F17: pairwise precision truncation + Levenshtein *ratio*
    (substitution cost 2, author_match.py:341).  'Stern Grant, C.' must
    match 'Grant, Carolyn S.' at >= 0.6 — the reference's test_AuthorMerger
    C1/C2 pair — which the plain normalized-distance metric would reject."""
    from adsimportpipeline_spark.operators.enrich import (
        _lev_ratio,
        _normalize_pair,
    )

    a, b = _normalize_pair("Grant, Carolyn S.", "Stern Grant, C.")
    assert (a, b) == ("grant, c", "stern grant, c")
    assert _lev_ratio(a, b) >= 0.6
    # full-vs-initial first names compare equal after truncation
    x, y = _normalize_pair("Accomazzi, Alberto", "Accomazzi, A.")
    assert _lev_ratio(x, y) == 1.0


def test_lev_ratio_batch_matches_scalar_and_is_fast():
    """The vectorized pair-batch Levenshtein must agree bit-for-bit with the
    scalar DP on random strings (incl. empty/unicode edges), and beat it by
    a wide margin on a 500-author-group-sized pair batch (reference
    precedent: numpy impl auto-selected at n>=500, author_match.py:344-350)."""
    import random
    import time

    import numpy as np

    from adsimportpipeline_spark.operators.enrich import _lev_ratio, _lev_ratio_batch

    rng = random.Random(7)
    alphabet = "abcdefgh ,.-éß"
    xs = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 18))) for _ in range(300)]
    ys = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 18))) for _ in range(300)]
    xs += ["", "", "abc"]
    ys += ["", "xyz", ""]
    batch = _lev_ratio_batch(xs, ys)
    scalar = np.array([_lev_ratio(x, y) for x, y in zip(xs, ys)])
    assert np.allclose(batch, scalar, atol=0), (
        f"first diff at {int(np.argmax(batch != scalar))}"
    )

    # 500-author group => ~250k normalized pairs through the metric
    names = [f"name{i % 97}, first{i % 31}" for i in range(500)]
    pairs_x = [names[i % 500] for i in range(20_000)]
    pairs_y = [names[(i * 7 + 3) % 500] for i in range(20_000)]
    t0 = time.time()
    _lev_ratio_batch(pairs_x, pairs_y)
    t_batch = time.time() - t0
    t0 = time.time()
    for x, y in zip(pairs_x[:2000], pairs_y[:2000]):
        _lev_ratio(x, y)
    t_scalar_per_pair = (time.time() - t0) / 2000
    # conservative floor: vectorized must be >= 5x the scalar rate
    assert t_batch / 20_000 < t_scalar_per_pair / 5
