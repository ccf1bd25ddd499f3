"""Build dist/adsimportpipeline_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    base = os.path.join(dist, "adsimportpipeline_spark")
    return shutil.make_archive(base, "zip", REPO, "adsimportpipeline_spark")


if __name__ == "__main__":
    print(build())
