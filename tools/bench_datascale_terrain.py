#!/usr/bin/env python
"""Data-size scaling for the terrain-analysis closers: viewshed and
cost-distance at 16x corpus growth with FIXED query extent (radius /
budget). Both operators are partition-pruned by construction — the
radius disc / budget wave touches the same tiles regardless of corpus
size — so the scaling claim under test is "growth << 1": a 100-TB
corpus costs the same viewshed as a 1-TB one. Appends to
BENCH/DATASCALE_r05.md."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gfw_raster_analysis_lambda_spark.operators import costdist, viewshed  # noqa: E402
from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402
from gfw_raster_analysis_lambda_spark.sources import fixtures  # noqa: E402
from gfw_raster_analysis_lambda_spark.sources.images import with_derived_keys  # noqa: E402

X0, Y0, TILE = fixtures.X0, fixtures.Y0, fixtures.TILE
GX0, GY0 = X0 * TILE, Y0 * TILE


def world(spark, layer, n):
    rows = fixtures.generate_images_rows(layers=[layer], nx=n, ny=n)
    img = with_derived_keys(
        spark.createDataFrame(rows, fixtures.IMAGES_SCHEMA)
    ).filter(F.col("layer") == layer)
    return img.localCheckpoint(eager=True)  # time the operator, not the synth


def run(fn, reps=3):
    best = float("inf")
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        samples.append(dt)
        best = min(best, dt)
    return best, samples


def main():
    spark = get_spark("datascale_terrain", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    sizes = (4, 16)  # 16 tiles -> 256 tiles (16x)
    results = {}
    raw = {}
    for n in sizes:
        dem = world(spark, "ttc_percent", n)
        cost = world(spark, "tcd_threshold", n)
        nt = dem.count()

        def vs():
            viewshed.viewshed_zonal(
                dem, (GX0 + 96, GY0 + 96), tower=400, radius=80
            ).collect()

        def cd():
            costdist.cost_distance_zonal(
                cost,
                [(GX0 + 40, GY0 + 40), (GX0 + 200, GY0 + 130)],
                budget=90, cost_offset=1,
            ).collect()

        for name, fn in (("viewshed_zonal (r=80)", vs),
                         ("cost_distance_zonal (b=90)", cd)):
            best, samples = run(fn)
            results.setdefault(name, {})[nt] = best
            raw.setdefault(name, {})[nt] = samples
            print(f"{name} n_tiles={nt}: best {best:.3f}s {samples}")

    lines = [
        "",
        "## Terrain closers: 16x corpus growth, FIXED query extent",
        "",
        "Best-of-3 seconds, local[32]; `growth` = time ratio / tile ratio. "
        "Radius disc / budget wave touch the same tiles at any corpus size — "
        "partition pruning by construction, so the target is growth << 1.",
        "",
        "| op | tiles A | A s | tiles B | B s | growth |",
        "|---|---|---|---|---|---|",
    ]
    for name, d in results.items():
        (na, ta), (nb, tb) = sorted(d.items())
        growth = (tb / ta) / (nb / na)
        lines.append(
            f"| {name} | {na} | {ta:.3f} | {nb} | {tb:.3f} | {growth:.2f} |"
        )
    lines += ["", f"Raw samples: {raw}", ""]
    out = os.path.join(REPO, "BENCH", "DATASCALE_r05.md")
    with open(out, "a") as f:
        f.write("\n".join(lines))
    print(f"appended to {out}")


if __name__ == "__main__":
    main()
