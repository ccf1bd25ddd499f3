"""Enforcer: one raw change event -> N typed block rows (the engine's UDTF).

Analog of the reference's enforce_schema dispatcher (enforce_schema.py:14-19:
one XML record explodes into `general`/`properties`/`references`/`relations`
blocks keyed by ``@type``) — SURVEY.md §2.9 calls this "our only UDTF".

Implemented with ``mapInPandas``: Arrow batches of raw events stream in, a
(possibly larger) batch of typed block rows streams out.  Block extraction is
pandas-vectorized (no per-row Python): the html payload is split into a
``meta`` block (title line), a ``text`` block (body text), and a ``links``
block (href count) — the webtext counterpart of the reference's block types.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .html import _extract_series

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("log_offset", T.LongType(), True),
        T.StructField("source_origin", T.StringType(), True),
        T.StructField("block_type", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)


def enforce_blocks(events: DataFrame) -> DataFrame:
    """Explode raw events into typed block rows (UDTF-style mapInPandas)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            html = pdf["html"]
            text = _extract_series(html)
            title = (
                html.str.decode("utf-8", errors="replace")
                .str.extract(r"(?is)<title[^>]*>(.*?)</title>", expand=False)
                .fillna("")
            )
            n_links = (
                html.str.decode("utf-8", errors="replace")
                .str.count(r"(?i)<a\s")
                .astype("int64")
                .astype(str)
            )
            base = pdf[["url", "warc_ts", "log_offset", "source_origin"]]
            out = []
            for btype, content in (("meta", title), ("text", text), ("links", n_links)):
                b = base.copy()
                b["block_type"] = btype
                b["content"] = content
                out.append(b)
            yield pd.concat(out, ignore_index=True)

    return events.mapInPandas(_batches, BLOCK_SCHEMA)
