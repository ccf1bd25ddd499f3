"""TSV feed reader: priority order, first-writer-wins, malformed-line
filtering (reference run.py:34-62, 47-57)."""

from __future__ import annotations

from adsimportpipeline_spark.sources.changelog import read_feed_tsv


def test_feed_tsv_first_writer_wins(spark, tmp_path):
    f1 = tmp_path / "canonical.tsv"
    f2 = tmp_path / "alternates.tsv"
    f1.write_text("# comment line\nkey1\tfpA\nkey2\tfpB\n\nmalformed_line_no_tab\n")
    f2.write_text("key2\tfpX\nkey3\tfpC\nalso\tbad\textra\n")
    out = {r["key"]: r["fingerprint"] for r in read_feed_tsv(spark, [str(f1), str(f2)]).collect()}
    # key2 keeps the higher-priority (first file) fingerprint
    assert out == {"key1": "fpA", "key2": "fpB", "key3": "fpC"}
