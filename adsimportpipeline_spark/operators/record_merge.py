"""Per-field merge driver: N typed block rows -> ONE canonical record per key.

This is the reference's most-used code path — ``Merger.merge`` dispatching a
rule per field over the block histogram (merger.py:107-131) with the rule
table ``MERGER_RULES`` (config.py:48-91) — rebuilt as *conditional
aggregation*: every field's rule becomes a ``max_by`` / ``collect_list``
aggregate guarded by ``WHEN field = <f>``, so merging ALL fields of ALL
records costs two shuffles total (one per cascade phase), independent of the
number of fields.  No per-field job, no eval dispatch (merger.py:76-80), no
driver-side loop over records.

Field rules (names follow the reference):

- ``origin_trust``  — originTrustMerger (merger.py:311-318): the two-phase
  trust cascade of :mod:`.merge_rules`.
- ``take_all``      — takeAll (merger.py:226-241): first-encounter-ordered
  union-distinct.
- ``take_all_by_priority`` — takeAllByPriority (merger.py:244-265).
- ``boolean``       — booleanMerger (merger.py:155-158): OR.
- ``references``    — referencesMerger (merger.py:160-176): trust winner's
  list plus values from always-append origins, first-occurrence dedup.
- ``publication``   — publicationMerger (merger.py:178-223): trust winner
  over non-alternate blocks; alternate blocks are *collected* into an
  ``altpublications`` array (merger.py:196-205), not just counted.

The reference's "first pass: singly-defined fields verbatim, second pass:
dispatch" (merger.py:119-131) needs no split here: every rule is an
associative aggregate, and an aggregate over a single row IS the verbatim
value, so the histogram short-circuit falls out for free (and the partial
aggregation keeps hot keys skew-safe).

Input envelope (long form — one row per (record key, field occurrence)):
``key, field, value:string, origin, modtime, offset`` and optionally
``alternate:boolean`` (publication rule).  List-valued fields travel as
``;``-joined strings, the long-form analog of the reference's per-block
lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .merge_rules import priority_expr

#: output column name for collected alternate publication blocks
ALT_OUT = "altpublications"

_TRUST_RULES = ("origin_trust", "references", "publication")


def _when(field_col: str, f: str, expr: Column) -> Column:
    return F.when(F.col(field_col) == f, expr)


def record_merge(
    blocks: DataFrame,
    rules: dict[str, str],
    key: str = "url",
    field_col: str = "field",
    value_col: str = "value",
    origin_col: str = "origin",
    modtime_col: str = "modtime",
    offset_col: str = "offset",
    alternate_col: str | None = None,
    priority_map: dict[str, float] | None = None,
    references_always_append: list[str] | None = None,
    list_sep: str = ";",
) -> DataFrame:
    """Merge typed block rows into one canonical record per ``key`` with one
    output column per field in ``rules`` (plus ``altpublications`` when a
    ``publication`` rule is present)."""
    priority_map = priority_map or {}
    references_always_append = references_always_append or []

    trust_fields = [f for f, r in rules.items() if r in _TRUST_RULES]
    other_fields = [f for f, r in rules.items() if r not in _TRUST_RULES]

    val = F.col(value_col)
    has_content = (F.coalesce(F.length(val), F.lit(0)) > 0).cast("int")
    clen = F.coalesce(F.length(val), F.lit(0))
    off = F.col(offset_col)
    is_alt = (
        F.coalesce(F.col(alternate_col), F.lit(False))
        if alternate_col
        else F.lit(False)
    )

    joined: list[DataFrame] = []

    # ---- trust-cascade fields: two associative phases ------------------
    if trust_fields:
        tslice = blocks.filter(F.col(field_col).isin(trust_fields))
        # publication rule: alternates never compete for the winner
        # (merger.py:178-194 folds primaries only)
        pub_fields = [f for f in trust_fields if rules[f] == "publication"]
        if pub_fields:
            competes = ~is_alt | ~F.col(field_col).isin(pub_fields)
        else:
            competes = F.lit(True)

        intra = F.struct(
            has_content.alias("hc"),
            F.col(modtime_col).alias("mt"),
            clen.alias("clen"),
            off.alias("off"),
        )
        champ = (
            tslice.filter(competes)
            .groupBy(key, field_col, origin_col)
            .agg(
                F.max_by(
                    F.struct(
                        val.alias("v"),
                        F.col(modtime_col).alias("mt"),
                        clen.alias("clen"),
                        off.alias("off"),
                    ),
                    intra,
                ).alias("w")
            )
        )
        inter = F.struct(
            (F.coalesce(F.col("w.clen"), F.lit(0)) > 0).cast("int").alias("hc"),
            priority_expr(origin_col, priority_map).alias("p"),
            F.col("w.clen").alias("clen"),
            F.col("w.mt").alias("mt"),
            F.col("w.off").alias("off"),
        )
        trust_aggs = [
            F.max_by(_when(field_col, f, F.col("w.v")), _when(field_col, f, inter)).alias(
                f"_win_{f}"
            )
            for f in trust_fields
        ]
        winners = champ.groupBy(key).agg(*trust_aggs)
        joined.append(winners)

    # ---- order-preserving collections + booleans: one pass -------------
    ref_fields = [f for f, r in rules.items() if r == "references"]
    need_other = other_fields or ref_fields or (alternate_col and any(
        r == "publication" for r in rules.values()
    ))
    if need_other:
        aggs: list[Column] = []
        for f in other_fields:
            rule = rules[f]
            if rule == "boolean":
                aggs.append(
                    F.max(_when(field_col, f, val.cast("boolean"))).alias(f)
                )
                continue
            if rule == "take_all_by_priority":
                order = F.struct(
                    (-priority_expr(origin_col, priority_map)).alias("np"),
                    off.alias("o"),
                    val.alias("v"),
                )
            else:  # take_all: first-encounter order = log offset
                order = F.struct(off.alias("o"), val.alias("v"))
            collected = F.array_sort(
                F.collect_list(_when(field_col, f, F.struct(order.alias("o"), val.alias("v"))))
            )
            # array_distinct keeps FIRST occurrence -> the reference's
            # encounter-order dedup (merger.py:226-241); a key with no rows
            # for this field gets NULL (field absent from the record), not []
            deduped = F.array_distinct(F.transform(collected, lambda s: s["v"]))
            aggs.append(
                F.when(F.size(deduped) > 0, deduped).alias(f)
            )
        for f in ref_fields:
            # always-append values in encounter order (merger.py:169-176)
            cond = (F.col(field_col) == f) & F.col(origin_col).isin(
                references_always_append
            )
            collected = F.array_sort(
                F.collect_list(
                    F.when(cond, F.struct(off.alias("o"), val.alias("v")))
                )
            )
            aggs.append(
                F.transform(collected, lambda s: s["v"]).alias(f"_app_{f}")
            )
        for f in [f for f, r in rules.items() if r == "publication"]:
            if alternate_col:
                cond = (F.col(field_col) == f) & is_alt
                collected = F.array_sort(
                    F.collect_list(
                        F.when(cond, F.struct(off.alias("o"), val.alias("v")))
                    )
                )
                aggs.append(
                    F.transform(collected, lambda s: s["v"]).alias(f"_alt_{f}")
                )
        others = blocks.groupBy(key).agg(*aggs)
        joined.append(others)

    out = joined[0]
    for d in joined[1:]:
        out = out.join(d, key, "full_outer")

    # ---- final projection: rule outputs under their field names --------
    cols: list[Column] = [F.col(key)]
    for f, rule in rules.items():
        if rule == "origin_trust":
            cols.append(F.col(f"_win_{f}").alias(f))
        elif rule == "references":
            winner_list = F.coalesce(
                F.split(F.col(f"_win_{f}"), list_sep), F.array()
            )
            appended = F.coalesce(F.col(f"_app_{f}"), F.array())
            flat = F.flatten(
                F.transform(appended, lambda s: F.split(s, list_sep))
            )
            combined = F.array_distinct(F.concat(winner_list, flat))
            cols.append(F.when(F.size(combined) > 0, combined).alias(f))
        elif rule == "publication":
            cols.append(F.col(f"_win_{f}").alias(f))
            if alternate_col:
                cols.append(
                    F.coalesce(F.col(f"_alt_{f}"), F.array()).alias(ALT_OUT)
                )
        else:
            cols.append(F.col(f).alias(f))
    return out.select(*cols)
