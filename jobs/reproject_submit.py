#!/usr/bin/env python
"""spark-submit entry point for cross-grid raster reprojection.

Re-tiles an images corpus (input-hint schema) from one grid family onto
another — the re-gridding backfill a 10^12-image corpus needs when a
consumer wants a coarser cell size or a different pixel resolution.
Ships to a cluster as:

    python tools/build_dist.py
    spark-submit --master <url> [--num-executors N ...] \\
        --py-files dist/gfw_raster_analysis_lambda_spark.zip \\
        jobs/reproject_submit.py \\
        --images /data/images_parquet --src-grid 4/1024 \\
        --dst-grid 1/250 --output /data/out \\
        [--layers tcl_year,tcd_threshold] [--fill 0] [--fmt png]

Output is the same images layout (cell-sorted parquet) on the
destination grid, so every downstream job — zonal, pyramid, focal —
reads it unchanged. One shuffle end to end (the dst-cell groupBy inside
``reproject_nearest``); the writer's range partitioning reuses its
output ordering. See operators/reproject.py for the exact-rational
sampling contract.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--src-grid", required=True)
    ap.add_argument("--dst-grid", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--layers", default=None,
                    help="comma-separated layer filter (default: all)")
    ap.add_argument("--fill", type=float, default=0)
    ap.add_argument("--fmt", default="png")
    args = ap.parse_args()

    # imports resolve from --py-files on executors and driver alike
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.operators.reproject import (
        reproject_nearest,
    )
    from gfw_raster_analysis_lambda_spark.sources.images import (
        read_images,
        write_images_cell_sorted,
    )

    spark = SparkSession.builder.appName("reproject_submit").getOrCreate()
    images = read_images(spark, args.images)
    if args.layers:
        images = images.filter(
            F.col("layer").isin([s.strip() for s in args.layers.split(",")])
        )
    out = reproject_nearest(
        images, args.src_grid, args.dst_grid, fill=args.fill, fmt=args.fmt
    )
    # images layout parity: caption/phash are not reprojected artifacts;
    # write empty caption and a recomputed-phash-free placeholder column
    # set so read_images round-trips (it derives layer/cell_id itself)
    out = out.select(
        "image_id", "bytes", "w", "h", "fmt",
        F.lit("").alias("caption"), F.lit(0).cast("long").alias("phash"),
    )
    write_images_cell_sorted(out, args.output)
    spark.stop()


if __name__ == "__main__":
    main()
