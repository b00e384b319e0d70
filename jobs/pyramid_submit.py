#!/usr/bin/env python
"""spark-submit entry point for building tile-pyramid overview levels.

The write-side companion to jobs/zonal_submit.py: aggregate a base-level
images corpus into one or more coarser registered grids (the COG/gdaladdo
overview build as a Spark job; see operators/pyramid.py). Ships to a
cluster as:

    python tools/build_dist.py
    spark-submit --master <url> \\
        --py-files dist/gfw_raster_analysis_lambda_spark.zip \\
        jobs/pyramid_submit.py \\
        --images /data/images_parquet --src-grid 10/100000 \\
        --dst-grids 10/40000 \\
        --output /data/overviews [--method mean|nearest|max] \\
        [--cell-sorted]

With several --dst-grids (comma-separated, fine -> coarse) each level is
built from the PREVIOUS level's output — the log(levels) tree reduction —
and written under ``<output>/<grid name with / replaced by _>``.
``--cell-sorted`` writes each level in the cell-colocated layout so the
zero-shuffle zonal strategy applies to overview queries directly
(resolution-aware routing: operators.pyramid.choose_overview_grid).
"""

from __future__ import annotations

import argparse
import os


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--src-grid", required=True)
    ap.add_argument("--dst-grids", required=True,
                    help="comma-separated registered grid names, fine -> coarse")
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", default="mean", choices=["mean", "nearest", "max"])
    ap.add_argument("--cell-sorted", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from gfw_raster_analysis_lambda_spark.operators.pyramid import build_overviews
    from gfw_raster_analysis_lambda_spark.sources.images import (
        read_images,
        write_images_cell_sorted,
    )

    spark = SparkSession.builder.appName("pyramid_submit").getOrCreate()
    level = read_images(spark, args.images)
    src = args.src_grid
    for dst in [g.strip() for g in args.dst_grids.split(",") if g.strip()]:
        out = build_overviews(level, src, dst, method=args.method)
        path = os.path.join(args.output, dst.replace("/", "_"))
        if args.cell_sorted:
            write_images_cell_sorted(out, path)
            level = read_images(spark, path)
        else:
            out.write.mode("overwrite").parquet(path)
            level = spark.read.parquet(path)
        print(f"wrote overview level {dst} -> {path}")
        src = dst


if __name__ == "__main__":
    main()
