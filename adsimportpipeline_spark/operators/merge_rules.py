"""Deterministic multi-version merge rules — the reference's merge core
(SURVEY.md §2.4) re-expressed as DataFrame aggregations.

The reference merges N per-origin metadata blocks into one canonical record
via per-field rules (merger.py):

- ``originTrustMerger`` (merger.py:311-318 + _getBestOrigin 286-309): fold
  picking the block whose origin has max priority.
- ``equalTrustFallback`` (merger.py:320-339): tie-break cascade — primary
  flag, latest modtime, longer content, arbitrary-but-deterministic last.
- ``takeAll`` (merger.py:226-241): order-preserving union-distinct.
- ``takeAllByPriority`` (merger.py:244-265): priority-sorted union-distinct.
- ``booleanMerger`` (merger.py:155-158): OR.
- ``referencesMerger`` (merger.py:160-176): winner list + always-append
  origins unioned in.

All are expressed as associative aggregates (max_by / collect_list +
array ops) so map-side partial aggregation keeps them skew-safe; none use
Python UDFs.  Priority maps become broadcast-free literal CASE/map lookups
(reference PRIORITIES config.py:93-336).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: reference semantics: unknown origins score as PUBLISHER (merger.py:305)
DEFAULT_PRIORITY = 0.5


def priority_expr(origin_col: str, priority_map: dict[str, float]) -> Column:
    """origin -> priority score as a literal map lookup (no shuffle, no UDF)."""
    m = F.create_map(*[F.lit(x) for kv in priority_map.items() for x in kv])
    return F.coalesce(m[F.col(origin_col)], F.lit(DEFAULT_PRIORITY))


def origin_trust_merge(
    df: DataFrame,
    key: str,
    origin_col: str,
    priority_map: dict[str, float],
    modtime_col: str,
    content_col: str,
    primary_col: str | None = None,
    offset_col: str | None = None,
) -> DataFrame:
    """One winner row per key, faithful to the reference cascade
    (_getBestOrigin merger.py:286-309 + equalTrustFallback merger.py:320-339):

    1. non-empty content beats empty content (merger.py:288-289)
    2. higher origin priority wins (merger.py:295-309)
    3. primary flag (merger.py:321-325)
    4. **same-origin** ties: latest modtime (merger.py:327-331)
    5. cross-origin equal-priority ties: longer content, then latest
       modtime (merger.py:332-337)
    6. deterministic last resort: max offset (the reference returns an
       arbitrary one, merger.py:338-339 — we determinize)

    The same-origin-vs-cross-origin asymmetry (step 4 before step 5 only
    within one origin) is not a single total order, so this runs as TWO
    associative ``max_by`` phases — each partial-agg friendly, both
    skew-safe:

    - phase 1 per ``(key, origin)``: struct(has_content, primary, modtime,
      content_length, offset) — within one origin modtime outranks length;
    - phase 2 per ``key`` over origin champions: struct(has_content,
      priority, primary, content_length, modtime, offset) — across origins
      length outranks modtime, per the reference.

    The reference's pairwise pop-order fold is non-associative when three
    or more origins tie; this decomposition agrees with it on every
    pairwise comparison and determinizes the rest.
    """
    payload = [c for c in df.columns if c != key]
    has_content = (F.coalesce(F.length(F.col(content_col)), F.lit(0)) > 0).cast("int")
    prim = (
        F.coalesce(F.col(primary_col).cast("int"), F.lit(0))
        if primary_col
        else F.lit(0)
    )
    clen = F.coalesce(F.length(F.col(content_col)), F.lit(0))
    off = F.col(offset_col) if offset_col else F.lit(0)

    intra = F.struct(
        has_content.alias("hc"),
        prim.alias("prim"),
        F.col(modtime_col).alias("mt"),
        clen.alias("clen"),
        off.alias("off"),
    )
    champions = (
        df.groupBy(key, origin_col)
        .agg(F.max_by(F.struct(*payload), intra).alias("w"))
        .select(key, *[F.col(f"w.{c}").alias(c) for c in payload])
    )

    inter = F.struct(
        has_content.alias("hc"),
        priority_expr(origin_col, priority_map).alias("p"),
        prim.alias("prim"),
        clen.alias("clen"),
        F.col(modtime_col).alias("mt"),
        off.alias("off"),
    )
    out = champions.groupBy(key).agg(
        F.max_by(F.struct(*payload), inter).alias("w")
    )
    return out.select(key, *[F.col(f"w.{c}").alias(c) for c in payload])


def merge_text(
    df: DataFrame,
    key: str,
    content_col: str,
    origin_col: str,
    priority_map: dict[str, float],
    modtime_col: str,
    offset_col: str | None = None,
) -> DataFrame:
    """A11 mergeText (merger.py:83-104): fold a text field's blocks to one
    ``(content, provider, modtime)`` per key via the pairwise
    ``_getBestOrigin`` cascade — which is exactly the
    :func:`origin_trust_merge` fold applied to a text column, projected to
    the reference's output shape (merger.py:99-101)."""
    out = origin_trust_merge(
        df,
        key=key,
        origin_col=origin_col,
        priority_map=priority_map,
        modtime_col=modtime_col,
        content_col=content_col,
        offset_col=offset_col,
    )
    return out.select(
        key,
        F.col(content_col).alias("content"),
        F.col(origin_col).alias("provider"),
        F.col(modtime_col).alias("modtime"),
    )


def _first_occurrence_dedup(
    df: DataFrame, key: str, value_col: str, order_col: Column, out_col: str
) -> DataFrame:
    """Order-preserving distinct: keep each value's first occurrence under
    order_col, then re-assemble the array in that order (merger.py:226-241
    preserves encounter order)."""
    w = Window.partitionBy(key, value_col).orderBy(order_col)
    ranked = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return ranked.groupBy(key).agg(
        F.array_sort(
            F.collect_list(F.struct(order_col.alias("o"), F.col(value_col).alias("v")))
        ).alias("_s")
    ).select(key, F.transform("_s", lambda s: s["v"]).alias(out_col))


def take_all(
    df: DataFrame, key: str, value_col: str, order_col: str, out_col: str = "values"
) -> DataFrame:
    """Union-distinct preserving first-encounter order (A5, merger.py:226-241)."""
    return _first_occurrence_dedup(df, key, value_col, F.col(order_col), out_col)


def take_all_by_priority(
    df: DataFrame,
    key: str,
    value_col: str,
    origin_col: str,
    priority_map: dict[str, float],
    order_col: str,
    out_col: str = "values",
) -> DataFrame:
    """Union-distinct with origin-priority-desc encounter order (A6,
    merger.py:244-265 — e.g. publisher DOIs sort first)."""
    order = F.struct(
        (-priority_expr(origin_col, priority_map)).alias("np"),
        F.col(order_col).alias("o"),
    )
    return _first_occurrence_dedup(df, key, value_col, order, out_col)


def boolean_merge(df: DataFrame, key: str, bool_col: str, out_col: str = "merged") -> DataFrame:
    """OR over blocks (A7, merger.py:155-158)."""
    return df.groupBy(key).agg(F.max(F.col(bool_col).cast("boolean")).alias(out_col))


def references_merge(
    df: DataFrame,
    key: str,
    value_col: str,
    origin_col: str,
    priority_map: dict[str, float],
    modtime_col: str,
    always_append_origins: list[str],
    out_col: str = "references",
) -> DataFrame:
    """Priority-fold winner's values unioned with values from always-append
    origins, dedup'd (A8, merger.py:160-176; REFERENCES_ALWAYS_APPEND
    config.py:340)."""
    prio = priority_expr(origin_col, priority_map)
    winner = df.groupBy(key).agg(
        F.max_by(
            F.col(value_col), F.struct(prio.alias("p"), F.col(modtime_col).alias("mt"))
        ).alias("_winner_vals")
    )
    appends = (
        df.filter(F.col(origin_col).isin(always_append_origins))
        .groupBy(key)
        .agg(F.flatten(F.collect_list(value_col)).alias("_appended"))
    )
    return (
        winner.join(appends, key, "left")
        .select(
            key,
            F.array_sort(
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("_winner_vals"), F.array()),
                        F.coalesce(F.col("_appended"), F.array()),
                    )
                )
            ).alias(out_col),
        )
    )
