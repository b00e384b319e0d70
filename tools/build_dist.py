#!/usr/bin/env python
"""Build the --py-files artifact: dist/gfw_raster_analysis_lambda_spark.zip.

The zip contains the package only (no tests, no caches) and is what a
cluster run ships to executors:

    spark-submit --master <cluster> \\
        --py-files dist/gfw_raster_analysis_lambda_spark.zip \\
        jobs/zonal_submit.py --images ... --aoi ... --sql "..." ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "gfw_raster_analysis_lambda_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
