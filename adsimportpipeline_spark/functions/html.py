"""Vectorized HTML -> text extraction.

Analog of the reference's per-record normalization hot path (xmltodict parse,
read_records.py:84-89, + control-char/entity cleanup ArXivDirect.py:70-80),
rebuilt as a pandas/Arrow UDF per BASELINE.json input_hint ("no per-row
Python").  The extraction spec is deterministic and byte-stable:

1. decode UTF-8 (errors=replace)
2. drop <script>/<style> blocks
3. block-level closing tags and <br> become newlines
4. strip remaining tags
5. decode the basic HTML entities
6. collapse horizontal whitespace, trim line edges, collapse blank lines,
   strip the ends

Both the vectorized path (pandas ``.str`` ops) and the scalar oracle path
(:func:`extract_text_str`) execute the *same* ``re`` patterns in the same
order, so outputs are byte-identical per url — the invariant the north_star
demands ("extracted text is byte-identical per url").
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# (pattern, replacement) applied in order; identical for scalar and pandas.
_RE_STEPS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"(?is)<script\b.*?</script>"), ""),
    (re.compile(r"(?is)<style\b.*?</style>"), ""),
    (re.compile(r"(?i)<br\s*/?>"), "\n"),
    (re.compile(r"(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|section|article|header|footer|blockquote|pre)>"), "\n"),
    (re.compile(r"<[^>]*>"), ""),
    (re.compile(r"&nbsp;"), " "),
    (re.compile(r"&lt;"), "<"),
    (re.compile(r"&gt;"), ">"),
    (re.compile(r"&quot;"), '"'),
    (re.compile(r"&#39;"), "'"),
    (re.compile(r"&amp;"), "&"),
    (re.compile(r"[ \t\r\f\v]+"), " "),
    (re.compile(r" ?\n ?"), "\n"),
    (re.compile(r"\n+"), "\n"),
]


def extract_text_str(html: bytes | None) -> str | None:
    """Scalar oracle implementation — same regex chain as the pandas UDF."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    for pat, repl in _RE_STEPS:
        s = pat.sub(repl, s)
    return s.strip()


def _extract_series(html: pd.Series) -> pd.Series:
    s = html.str.decode("utf-8", errors="replace")
    for pat, repl in _RE_STEPS:
        s = s.str.replace(pat, repl, regex=True)
    return s.str.strip()


@pandas_udf(T.StringType())
def html_to_text(html: pd.Series) -> pd.Series:
    """Arrow-batched binary->string extraction (the engine hot path)."""
    return _extract_series(html)


def with_text(col: str | Column = "html") -> Column:
    """Column expression: extracted text of an html binary column."""
    c = F.col(col) if isinstance(col, str) else col
    return html_to_text(c)


def extract_text_sql(expr: str) -> str:
    """ANSI/DuckDB SQL twin of the extraction chain, generated from the SAME
    ``_RE_STEPS`` table so the two can never drift.

    RE2 interprets the escape sequences (\\t, \\f, ...) inside the pattern
    itself, so patterns pass through as plain SQL string literals; newline
    *replacements* are spelled ``chr(10)`` to stay escape-free.  The final
    ``trim`` strips the same whitespace set as Python ``str.strip()``.
    """
    s = expr
    for pat, repl in _RE_STEPS:
        p = pat.pattern.replace("'", "''")
        r = "chr(10)" if repl == "\n" else "'" + repl.replace("'", "''") + "'"
        s = f"regexp_replace({s}, '{p}', {r}, 'g')"
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
    return f"trim({s}, {ws})"
