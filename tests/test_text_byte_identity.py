"""Property test for the north_star invariant: extracted text is
byte-identical between the vectorized pandas path (engine) and the scalar
path (oracle), for arbitrary byte inputs including malformed HTML and
invalid UTF-8."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from adsimportpipeline_spark.functions.html import _extract_series, extract_text_str

html_ish = st.one_of(
    st.binary(max_size=400),
    st.text(max_size=300).map(lambda s: f"<html><body><p>{s}</p></body></html>".encode()),
    st.sampled_from(
        [
            b"<script>x</script>rest",
            b"<SCRIPT a=b>\nmulti\nline</ScRiPt><p>keep</p>",
            b"<style>s</style><br><br/>a<BR>b",
            b"&amp;&lt;&gt;&quot;&#39;&nbsp;",
            b"\xff\xfe invalid utf8 \x80",
            b"<div>a</div><div>b</div>",
            b"no tags at all",
            b"",
            b"<p>tab\there</p>\r\n<p>crlf</p>",
            b"<a href='x'>link</a> trailing  spaces  ",
        ]
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(html_ish, min_size=1, max_size=20))
def test_pandas_path_matches_scalar_path(payloads):
    series = pd.Series(payloads, dtype=object)
    vec = _extract_series(series).tolist()
    scalar = [extract_text_str(p) for p in payloads]
    assert vec == scalar
