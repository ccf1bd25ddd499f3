"""Ragged-scalar normalization surface — the reference's §2.7 tail rebuilt
for webtext, every function a pure column expression with an exact SQL twin.

- :func:`ensure_language_schema` — F5 (enforce_schema.py:21-38
  ensureLanguageSchema): a value that is EITHER a plain string OR a list of
  raggedly-keyed structs (``@lang``/``#text``) normalizes to one
  ``array<struct<lang,text>>`` via the ``transform`` higher-order function
  (struct rebuild, no UDF).
- :func:`host_stem_mapper` — F7 (solr_adapter.py:752-776 bibstem_mapper):
  fixed-position substring slicing with a special-case when-chain and the
  digit-spill reset, over hostnames instead of bibcodes.
- :func:`source_class_mapper` — F9 (solr_adapter.py:658-705
  simbad/ned_type_mapper): prefix/equality/contains when-chain folding raw
  source tags into a small facet vocabulary.
- :func:`positional_zip_filter` — J6 (solr_adapter.py:518-532 orcid claims):
  two parallel arrays zipped POSITIONALLY (``arrays_zip``), elements kept
  where the companion array's element passes a predicate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


# ------------------------------------------------------------------- F5

def ensure_language_schema(plain: Column, structs: Column) -> Column:
    """Normalize a ragged language value to ``array<struct<lang,text>>``.

    ``plain`` (string) and ``structs`` (array<struct<at_lang,hash_text>>)
    are the two shapes the raw feed can carry (exactly one is non-null per
    row — the relational encoding of the reference's isinstance check).  A
    plain string becomes ``[('en', s)]``; structs are rebuilt with missing
    ``@lang`` defaulting to ``''`` (enforce_schema.py:28-37).
    """
    from_plain = F.array(F.struct(F.lit("en").alias("lang"), plain.alias("text")))
    from_structs = F.transform(
        structs,
        lambda s: F.struct(
            F.coalesce(s["at_lang"], F.lit("")).alias("lang"),
            s["hash_text"].alias("text"),
        ),
    )
    return F.when(plain.isNotNull(), from_plain).otherwise(from_structs)


def ensure_language_schema_sql(plain: str, structs: str) -> str:
    """DuckDB twin (struct field names match the Spark build)."""
    return (
        f"CASE WHEN {plain} IS NOT NULL THEN "
        f"[{{'lang': 'en', 'text': {plain}}}] "
        f"ELSE list_transform({structs}, s -> "
        f"{{'lang': coalesce(s.at_lang, ''), 'text': s.hash_text}}) END"
    )


# ------------------------------------------------------------------- F4

def ensure_list(scalar: Column, arr: Column, element_type: str = "string") -> Column:
    """F4 ensureList (enforce_schema.py:40-43): None -> [], scalar -> [scalar],
    list passes through.

    A Spark column has one static type, so the ragged shapes arrive as two
    columns — at most one non-null per row (the relational encoding of the
    reference's isinstance branch, same convention as
    :func:`ensure_language_schema`).
    """
    return F.coalesce(
        arr,
        F.when(scalar.isNotNull(), F.array(scalar)),
        F.array().cast(f"array<{element_type}>"),
    )


def ensure_list_sql(scalar: str, arr: str) -> str:
    """DuckDB twin of :func:`ensure_list`."""
    return (
        f"coalesce({arr}, CASE WHEN {scalar} IS NOT NULL THEN [{scalar}] END, "
        f"[]::VARCHAR[])"
    )


# ------------------------------------------------------------------- F7

#: hosts whose 4-char stem spills into the 5th position (the analog of the
#: reference's PUB_VOLUME_SPILLS_LEFT bibstem quirk)
SPILL_STEMS = ("src1", "src2")


def host_stem_mapper(host: Column) -> tuple[Column, Column]:
    """(short_stem, long_stem) of a hostname — fixed-position slices with
    special cases, mirroring bibstem_mapper's shape:

    1. a leading ``www.`` is stripped before slicing
    2. mobile hosts (``m.``) collapse to the sentinel stem ``mob..``
    3. if the 4-char stem is a known spill and position 5 is a digit, the
       digit is reset to ``.`` (volume-spill rule)
    4. long_stem = short_stem + the next 4 chars, ``.``-padded
    """
    h = F.when(host.startswith("www."), F.substring(host, 5, 1024)).otherwise(host)
    short = F.rpad(F.substring(h, 1, 5), 5, ".")
    c5 = F.substring(h, 5, 1)
    is_digit = (c5 >= "0") & (c5 <= "9")
    spill = F.substring(h, 1, 4).isin(*SPILL_STEMS) & is_digit
    short = F.when(h.startswith("m."), F.lit("mob..")).when(
        spill, F.concat(F.substring(h, 1, 4), F.lit("."))
    ).otherwise(short)
    tail = F.rpad(F.substring(h, 6, 4), 4, ".")
    long = F.when(h.startswith("m."), F.lit("mob......")).otherwise(
        F.concat(short, tail)
    )
    return short, long


def host_stem_mapper_sql(host: str) -> tuple[str, str]:
    spills = ", ".join(f"'{s}'" for s in SPILL_STEMS)
    h = f"(CASE WHEN starts_with({host}, 'www.') THEN substr({host}, 5) ELSE {host} END)"
    is_digit = f"(substr({h}, 5, 1) >= '0' AND substr({h}, 5, 1) <= '9')"
    spill = f"(substr({h}, 1, 4) IN ({spills}) AND {is_digit})"
    short = (
        f"CASE WHEN starts_with({h}, 'm.') THEN 'mob..' "
        f"WHEN {spill} THEN substr({h}, 1, 4) || '.' "
        f"ELSE rpad(substr({h}, 1, 5), 5, '.') END"
    )
    long = (
        f"CASE WHEN starts_with({h}, 'm.') THEN 'mob......' "
        f"ELSE ({short}) || rpad(substr({h}, 6, 4), 4, '.') END"
    )
    return short, long


# ------------------------------------------------------------------- F9

def source_class_mapper(source: Column) -> Column:
    """Fold raw source tags into a small facet vocabulary (the when-chain
    shape of simbad_type_mapper — prefix, equality, contains tests in a
    fixed precedence order)."""
    return (
        F.when(source == "src0", F.lit("Origin"))
        .when(source.startswith("src1"), F.lit("Aggregator"))
        .when(source.endswith("2") | source.contains("3"), F.lit("Mirror"))
        .when(source.startswith("src4") | source.startswith("src5"), F.lit("Archive"))
        .otherwise(F.lit("Other"))
    )


def source_class_mapper_sql(source: str) -> str:
    return (
        f"CASE WHEN {source} = 'src0' THEN 'Origin' "
        f"WHEN starts_with({source}, 'src1') THEN 'Aggregator' "
        f"WHEN ends_with({source}, '2') OR contains({source}, '3') THEN 'Mirror' "
        f"WHEN starts_with({source}, 'src4') OR starts_with({source}, 'src5') THEN 'Archive' "
        f"ELSE 'Other' END"
    )


# ------------------------------------------------------------------- F1/F2

def parse_date_multi(datestr: Column) -> Column:
    """Full parseDate semantics (enforce_schema.py:55-83) as one expression:

    - try formats in order: ISO-with-micros, ``%Y-%m-%d``, ``%Y-%m``, ``%Y``
    - a ``-00`` month/day is repaired to ``-01`` (and the date is no longer
      'full', enforce_schema.py:69-71)
    - full dates (>= 10 chars, no ``-00``) get the +30-minute solr offset
      (enforce_schema.py:55, 77-78)
    - output string form: years <= 1900 render as isoformat + ``.000000Z``
      (strftime rejects them, enforce_schema.py:56-59)
    """
    fixed = F.replace(datestr, F.lit("-00"), F.lit("-01"))
    full = (~datestr.contains("-00")) & (F.length(datestr) >= 10)
    parsed = F.coalesce(
        F.try_to_timestamp(fixed, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
        F.try_to_timestamp(fixed, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(fixed, F.lit("yyyy-MM")),
        F.try_to_timestamp(fixed, F.lit("yyyy")),
    )
    shifted = F.when(full, parsed + F.expr("INTERVAL 30 MINUTES")).otherwise(parsed)
    return F.when(
        F.year(shifted) <= 1900,
        F.concat(F.date_format(shifted, "yyyy-MM-dd'T'HH:mm:ss"), F.lit(".000000Z")),
    ).otherwise(F.date_format(shifted, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))


def parse_date_multi_sql(datestr: str) -> str:
    fixed = f"replace({datestr}, '-00', '-01')"
    full = f"(NOT contains({datestr}, '-00') AND length({datestr}) >= 10)"
    parsed = (
        f"coalesce(try_strptime({fixed}, '%Y-%m-%dT%H:%M:%S.%fZ'), "
        f"try_strptime({fixed}, '%Y-%m-%d'), "
        f"try_strptime({fixed}, '%Y-%m'), "
        f"try_strptime({fixed}, '%Y'))"
    )
    shifted = f"(CASE WHEN {full} THEN {parsed} + INTERVAL 30 MINUTE ELSE {parsed} END)"
    return (
        f"CASE WHEN year({shifted}) <= 1900 "
        f"THEN strftime({shifted}, '%Y-%m-%dT%H:%M:%S') || '.000000Z' "
        f"ELSE strftime({shifted}, '%Y-%m-%dT%H:%M:%S.%fZ') END"
    )


# ------------------------------------------------------------------- J6

def filter_typed_elements(arr: Column, type_field: str, allowed: list[str]) -> Column:
    """P7/P8 (solr_adapter.py AUTHOR_TYPES predicate / link-type filter):
    keep struct elements whose ``type_field`` is in ``allowed`` — a pure
    ``filter`` HOF, no explode, no shuffle."""
    return F.filter(arr, lambda x: x[type_field].isin(allowed))


def positional_zip_filter(
    values: Column, companions: Column, keep: Callable[[Column], Column]
) -> Column:
    """Keep ``values[i]`` where ``keep(companions[i])`` — the positional
    claims join (arrays_zip + filter + transform, all JVM-side HOFs)."""
    zipped = F.arrays_zip(values.alias("v"), companions.alias("c"))
    kept = F.filter(zipped, lambda x: keep(x["c"]))
    return F.transform(kept, lambda x: x["v"])
