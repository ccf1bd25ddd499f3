"""Grouped enrichment via array-vs-array matching — the reference's
author-merge slot (J4/A10) as a grouped ``applyInPandas``.

Reference behavior (SURVEY.md §2.3 J4, §2.4 A10): after the priority fold
picks a winner author list (merger.py:133-153), missing affiliations are
filled from the loser list by bipartite name matching — Kuhn-Munkres over a
Levenshtein similarity matrix (author_match.py:318-363), pairs accepted at
score >= 0.6, whole merge abandoned below 0.5 (author_match.py:385-387,
398-410).

Matching is OPTIMAL assignment (Kuhn-Munkres), like the reference
(author_match.py:142-264 ships two Hungarian implementations and
auto-selects, 344-350): greedy matching silently diverges on crossing
matches — two winners both closest to the same loser — so a from-scratch
O(n^3) shortest-augmenting-path Hungarian runs per group.  The greedy
variant is kept only for the regression test that demonstrates the
divergence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAIR_ACCEPT = 0.6   # reference author_match.py:398-410
MERGE_BAIL = 0.5    # reference author_match.py:385-387

ENRICHED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("affiliation", T.StringType(), True),
        T.StructField("match_score", T.DoubleType(), True),
    ]
)


def _parse_name(n: str) -> list[str]:
    """'Last, F[irst] M.' -> [last, first, middle...] with initial dots
    stripped (F6 name normalization, author_match.py:266-283)."""
    last, _, rest = n.partition(", ")
    toks = [t[:-1] if t.endswith(".") else t for t in rest.split(" ") if t]
    return [last] + toks


def _normalize_pair(x: str, y: str) -> tuple[str, str]:
    """Pairwise precision truncation (F17, author_match.py:290-315): each
    name-token pair is cut to the shorter token's length so a full first
    name is never compared against its initial."""
    if not x or not y:
        return x, y
    px, py = _parse_name(x.lower()), _parse_name(y.lower())
    a, b = px[0] + ",", py[0] + ","
    for tx, ty in zip(px[1:], py[1:]):
        t = min(len(tx), len(ty))
        a += " " + tx[:t]
        b += " " + ty[:t]
    return a, b


def _sim_matrix(a: list[str], b: list[str]) -> np.ndarray:
    """Similarity matrix over pairwise-normalized names — ONE vectorized
    numpy DP over all n*m pairs at once (reference precedent: the numpy
    implementation auto-selected at n>=500, author_match.py:344-350).
    Measured ~28x over the per-pair char loop on a 500-author group."""
    if not a or not b:
        return np.zeros((len(a), len(b)))
    xs, ys = [], []
    for x in a:
        for y in b:
            nx, ny = _normalize_pair(x, y)
            xs.append(nx)
            ys.append(ny)
    return _lev_ratio_batch(xs, ys).reshape(len(a), len(b))


def _chars(strs: list[str], width: int) -> np.ndarray:
    """(n, width) uint32 code-point matrix, zero-padded."""
    out = np.zeros((len(strs), width), dtype=np.uint32)
    for i, s in enumerate(strs):
        if s:
            out[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
    return out


def _lev_ratio_batch(xs: list[str], ys: list[str]) -> np.ndarray:
    """Vectorized :func:`_lev_ratio` over aligned pair lists.

    Identity used: with substitution cost 2 a substitution never beats
    delete+insert, so dist = |x|+|y| - 2*LCS(x, y) and
    ratio = 2*LCS/(|x|+|y|).  The LCS row recurrence
    ``cur[j] = max(prev[j], prev[j-1]+eq, cur[j-1])`` vectorizes as an
    elementwise max followed by a running max (``np.maximum.accumulate``),
    giving one numpy pass per character of the longest x instead of a
    Python loop per character pair.  Bit-for-bit equal to the scalar
    :func:`_lev_ratio` (property-tested)."""
    n = len(xs)
    if n == 0:
        return np.zeros(0)
    lx = np.array([len(x) for x in xs], dtype=np.int64)
    ly = np.array([len(y) for y in ys], dtype=np.int64)
    tot = lx + ly
    if int(lx.max()) == 0 or int(ly.max()) == 0:
        return np.where(tot == 0, 1.0, 0.0)
    A = _chars(xs, int(lx.max()))
    B = _chars(ys, int(ly.max()))
    prev = np.zeros((n, B.shape[1] + 1), dtype=np.int32)
    for i in range(A.shape[1]):
        eq = (B == A[:, i : i + 1]).astype(np.int32)
        cand = np.maximum(prev[:, 1:], prev[:, :-1] + eq)
        cur = np.maximum.accumulate(cand, axis=1)
        active = i < lx
        prev[active, 1:] = cur[active]
    lcs = prev[np.arange(n), ly]
    return np.where(tot == 0, 1.0, 2.0 * lcs / np.maximum(tot, 1))


def _lev_ratio(x: str, y: str) -> float:
    """Levenshtein *ratio* with substitution cost 2 — the exact metric of
    python-Levenshtein's ``ratio`` the reference scores with
    (author_match.py:341): ratio = (|x|+|y| - dist_indel2) / (|x|+|y|)."""
    if not x and not y:
        return 1.0
    lx, ly = len(x), len(y)
    prev = np.arange(ly + 1)
    for i in range(1, lx + 1):
        cur = np.empty(ly + 1, dtype=np.int64)
        cur[0] = i
        xs = x[i - 1]
        for j in range(1, ly + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if xs == y[j - 1] else 2),
            )
        prev = cur
    return 1.0 - prev[ly] / (lx + ly)


def _greedy_match(sim: np.ndarray) -> list[tuple[int, int, float]]:
    """Deterministic greedy max-weight matching: best pairs first, ties by
    (i, j).  Kept for the divergence regression test only — NOT optimal on
    crossing matches."""
    pairs = [(-sim[i, j], i, j) for i in range(sim.shape[0]) for j in range(sim.shape[1])]
    pairs.sort()
    used_i: set[int] = set()
    used_j: set[int] = set()
    out = []
    for negs, i, j in pairs:
        if i in used_i or j in used_j:
            continue
        used_i.add(i)
        used_j.add(j)
        out.append((i, j, -negs))
    return out


def _hungarian_min(cost: np.ndarray) -> list[int]:
    """Optimal assignment minimizing total cost: the classic potentials +
    shortest-augmenting-path Hungarian, O(n^2 m).  Requires n <= m; returns
    for each row i the column assigned to it."""
    n, m = cost.shape
    assert n <= m
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    match_of_col = [0] * (m + 1)  # 1-based row matched to each column
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        match_of_col[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = match_of_col[j0], INF, -1
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[match_of_col[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if match_of_col[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            match_of_col[j0] = match_of_col[j1]
            j0 = j1
    ans = [0] * n
    for j in range(1, m + 1):
        if match_of_col[j]:
            ans[match_of_col[j] - 1] = j - 1
    return ans


def optimal_match(sim: np.ndarray) -> list[tuple[int, int, float]]:
    """Max-weight optimal bipartite matching over a similarity matrix
    (reference Kuhn-Munkres, author_match.py:142-264).  Every row of the
    smaller side is matched; callers filter pairs by acceptance threshold."""
    if sim.size == 0:
        return []
    transposed = sim.shape[0] > sim.shape[1]
    a = sim.T if transposed else sim
    cols = _hungarian_min(-a.astype(float))
    out = []
    for i, j in enumerate(cols):
        pair = (j, i) if transposed else (i, j)
        out.append((pair[0], pair[1], float(sim[pair[0], pair[1]])))
    out.sort()
    return out


def enrich_affiliations(
    winners: DataFrame,
    losers: DataFrame,
    key: str = "url",
    pos_col: str | None = None,
) -> DataFrame:
    """Fill winner rows' missing ``affiliation`` from the loser list of the
    same key by name matching (grouped applyInPandas).

    Inputs: (key, name, affiliation) rows for winner and loser versions.
    Output: winner rows with affiliations enriched where a loser name matched
    at score >= 0.6; merge skipped entirely if mean match < 0.5.

    ``pos_col`` names an author-position column: each side is sorted by it
    before matching, making the in-group row order — and therefore any
    tie-break the assignment takes between equal-weight matchings — fully
    deterministic regardless of shuffle arrival order (an author list is an
    ordered entity; without a position the arrival order decides ties).
    """
    cols = [key, "name", "affiliation"] + ([pos_col] if pos_col else [])
    w = winners.selectExpr(*cols).withColumn("_side", F.lit("w"))
    l_ = losers.selectExpr(*cols).withColumn("_side", F.lit("l"))
    both = w.unionByName(l_)

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if pos_col:
            pdf = pdf.sort_values(pos_col, kind="stable")
        wrows = pdf[pdf["_side"] == "w"].reset_index(drop=True)
        lrows = pdf[pdf["_side"] == "l"].reset_index(drop=True)
        url = pdf[key].iloc[0]
        if wrows.empty:
            return pd.DataFrame(columns=["url", "name", "affiliation", "match_score"])
        out = wrows[["name", "affiliation"]].copy()
        out["match_score"] = np.nan
        if not lrows.empty:
            sim = _sim_matrix(list(wrows["name"]), list(lrows["name"]))
            matches = optimal_match(sim)
            scores = [s for _, _, s in matches]
            if scores and float(np.mean(scores)) >= MERGE_BAIL:
                for i, j, s in matches:
                    if s >= PAIR_ACCEPT:
                        out.loc[i, "match_score"] = s
                        if pd.isna(out.loc[i, "affiliation"]) or out.loc[i, "affiliation"] in (None, ""):
                            out.loc[i, "affiliation"] = lrows.loc[j, "affiliation"]
        out.insert(0, "url", url)
        return out

    return both.groupBy(key).applyInPandas(_merge, ENRICHED_SCHEMA)


def author_merge(
    blocks: DataFrame,
    priority_map: dict[str, float],
    key: str = "url",
    origin_col: str = "origin",
    modtime_col: str = "modtime",
    pos_col: str | None = None,
) -> DataFrame:
    """A10 authorMerger (merger.py:133-153) end-to-end: the origin-trust fold
    picks the winning author LIST per key, then winners' missing
    affiliations are filled from the losing list by optimal bipartite name
    matching — exactly the reference composition (A3 fold + J4 match).

    Input: one row per (key, origin, author): ``key, origin, modtime, name,
    affiliation, author_pos``.  Output: the winner list enriched, one row
    per author with ``match_score`` where a loser matched.
    """
    from .merge_rules import priority_expr

    # trust fold over LISTS: the winning (origin) block per key — content
    # length = list size (merger.py:332-334 compares len of the field)
    per_block = blocks.groupBy(key, origin_col).agg(
        F.max(F.col(modtime_col)).alias("_mt"),
        F.count(F.lit(1)).alias("_sz"),
    )
    winner_block = (
        per_block.groupBy(key)
        .agg(
            F.max_by(
                F.col(origin_col),
                F.struct(
                    priority_expr(origin_col, priority_map).alias("p"),
                    F.col("_sz").alias("clen"),
                    F.col("_mt").alias("mt"),
                    F.col(origin_col).alias("o"),
                ),
            ).alias("_worigin")
        )
    )
    tagged = blocks.join(winner_block, key)
    side_cols = [key, "name", "affiliation"] + ([pos_col] if pos_col else [])
    winners = tagged.filter(F.col(origin_col) == F.col("_worigin")).select(*side_cols)
    losers = tagged.filter(F.col(origin_col) != F.col("_worigin")).select(*side_cols)
    return enrich_affiliations(winners, losers, key=key, pos_col=pos_col)
