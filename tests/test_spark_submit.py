"""Deployment test: the engine runs through real ``spark-submit --py-files``
with the zipped package (north_rule's deployment mode), from a cwd outside
the repo so only the zip provides the package."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys

import pytest

from adsimportpipeline_spark.datagen import GenSpec, write_change_log

def _find_spark_submit() -> str | None:
    """PATH first, then the launcher pyspark itself ships (pip installs
    carry bin/spark-submit inside the package, not on PATH)."""
    found = shutil.which("spark-submit")
    if found:
        return found
    try:
        import os

        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        if os.access(cand, os.X_OK):
            return cand
    except Exception:
        pass
    return None


SUBMIT = _find_spark_submit()


@pytest.mark.skipif(SUBMIT is None, reason="no spark-submit on PATH or in pyspark")
def test_spark_submit_py_files_replay(spark, tmp_path):
    sys.path.insert(0, "/root/repo")
    from scripts.package import build

    zip_path = build()
    log = str(tmp_path / "log")
    write_change_log(spark, log, GenSpec(n_events=2000, n_urls=100, seed=31), n_files=4)

    out = subprocess.run(
        [
            SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            "/root/repo/scripts/submit_replay.py",
            log,
            str(tmp_path / "tbl"),
            str(tmp_path / "ckpt"),
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # not the repo: the zip must supply the package
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["rows"] > 0 and result["batches"] >= 2
