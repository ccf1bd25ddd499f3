"""Alternate-key canonicalization — the J3 alias-mapping join.

Reference: every bibcode resolves to its canonical form via lookup tables
(conversions.py:37-58 ``Canonicalize``, getAlternates 16-35); alternates'
fingerprints fold into the canonical record's fingerprint set
(read_records.py:41-81, ';'.join(sorted) at 78).  Webtext analog: URL
canonicalization (mirrors, redirects, tracking params) via a broadcast
alias-dimension join, then fingerprint aggregation per canonical key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize(
    events: DataFrame,
    alias_map: DataFrame,
    key: str = "url",
    alias_col: str = "alias",
    canonical_col: str = "canonical",
) -> DataFrame:
    """Rewrite each event's key to its canonical form.

    ``alias_map`` is the small dimension (alias -> canonical); broadcast so
    the event stream never shuffles for the lookup (reference cached the
    lookup in-process: run.py:293-298).  Keys absent from the map are
    already canonical and pass through.
    """
    m = F.broadcast(
        alias_map.select(
            F.col(alias_col).alias("_alias"), F.col(canonical_col).alias("_canon")
        )
    )
    j = events.join(m, events[key] == m["_alias"], "left")
    return (
        j.withColumn(key, F.coalesce(F.col("_canon"), F.col(key)))
        .drop("_alias", "_canon")
    )


def canonical_fingerprints(
    events: DataFrame,
    alias_map: DataFrame,
    key: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Canonicalize, then fold all alternates' fingerprints into the
    canonical key's sorted ';'-joined set (read_records.py:64-78)."""
    canon = canonicalize(events, alias_map, key)
    return canon.groupBy(key).agg(
        F.array_join(F.sort_array(F.collect_set(fp_col)), ";").alias("fingerprint_agg")
    )
