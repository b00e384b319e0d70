#!/usr/bin/env python
"""Data-size scaling for the vector-geometry operator family.

The main datascale harness (tools/bench_datascale.py) sweeps the
driver's parquet tables; the geometry operators consume VECTOR batches
instead, so this sweep synthesizes them directly: N features scattered
at CONSTANT density (the region area grows with N), which is the regime
where the cell-equi-join candidate sets — and therefore the work — are
provably O(N). growth = (t_10N / t_N) / 10; <= ~1 means linear or
better. Best-of-3 per point, noop materialization, one Spark session.

Writes BENCH/GEOMSCALE_r05.md. Run alone (no concurrent Spark).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gfw_raster_analysis_lambda_spark.functions import geometry as geo  # noqa: E402
from gfw_raster_analysis_lambda_spark.functions import grid as G  # noqa: E402

GRID = G.GRID_FIXTURE  # 0.25-deg cells
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "GEOMSCALE_r05.md")


def _span(n: int) -> float:
    """Region side (degrees) holding n features at constant density
    (~6 boxes per 0.25-deg cell)."""
    cells = max(n / 6.0, 4.0)
    return math.sqrt(cells) * GRID.tile_deg


def _boxes(spark, n: int):
    span = _span(n)
    rows = []
    for k in range(n):
        x1 = -30.0 + ((k * 9973) % 1000003) / 1000003.0 * span
        y1 = 20.0 - ((k * 7919) % 1000033) / 1000033.0 * span
        w = 0.04 + 0.07 * ((k * 31) % 7) / 7.0
        h = 0.03 + 0.06 * ((k * 17) % 5) / 5.0
        rows.append((f"b{k:06d}", geo.wkb_dumps(geo.box(x1, y1, x1 + w, y1 + h))))
    return spark.createDataFrame(rows, "aoi_id string, geom_wkb binary")


def _lines(spark, n: int):
    span = _span(n)
    rows = []
    for k in range(n):
        x1 = -30.0 + ((k * 6007) % 1000003) / 1000003.0 * span
        y1 = 20.0 - ((k * 4001) % 1000033) / 1000033.0 * span
        pts = np.array([
            [x1, y1],
            [x1 + 0.11 + 0.05 * (k % 3), y1 - 0.07 - 0.04 * (k % 2)],
            [x1 + 0.05, y1 - 0.19],
        ])
        rows.append((f"l{k:06d}", geo.wkb_dumps_lines([pts])))
    return spark.createDataFrame(rows, "line_id string, geom_wkb binary")


def _points(spark, n: int):
    span = _span(n)
    rows = [
        (f"p{k:06d}",
         -30.0 + ((k * 5003) % 1000003) / 1000003.0 * span,
         20.0 - ((k * 3001) % 1000033) / 1000033.0 * span)
        for k in range(n)
    ]
    return spark.createDataFrame(rows, "point_id string, lon double, lat double")


def workloads(spark, n: int):
    from gfw_raster_analysis_lambda_spark.operators import lines as line_ops
    from gfw_raster_analysis_lambda_spark.operators import spatial_join

    def overlay():
        return spatial_join.polygon_pair_overlap(_boxes(spark, n), GRID.name)

    def geom_dedup():
        return spatial_join.geometry_dedup_keepers(_boxes(spark, n), GRID.name, 0.5)

    def line_zonal():
        return line_ops.line_zonal(_lines(spark, n), _boxes(spark, n), GRID.name)

    def snap():
        return line_ops.snap_points_to_lines(
            _points(spark, n), _lines(spark, n), 0.1, GRID.name
        )

    return {
        "spatial_overlay": overlay,
        "spatial_geom_dedup": geom_dedup,
        "spatial_line_zonal": line_zonal,
        "spatial_snap_points": snap,
    }


def best_of(fn, k: int = 3) -> tuple[float, list]:
    samples = []
    for _ in range(k):
        t = time.time()
        fn().write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t, 3))
    return min(samples), samples


def main():
    from gfw_raster_analysis_lambda_spark.session import get_spark

    spark = get_spark("geomscale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n_small, n_big = 2000, 20000
    # warm the JVM/Arrow path
    workloads(spark, 200)["spatial_overlay"]().write.format("noop").mode(
        "overwrite").save()

    table = {}
    for n in (n_small, n_big):
        for name, fn in workloads(spark, n).items():
            sec, samples = best_of(fn)
            table.setdefault(name, {})[n] = (sec, samples)
            print(f"N={n:6d} {name:22s} {sec:8.3f}s  {samples}", flush=True)

    lines = [
        "## Vector-geometry operator scaling (round 5)", "",
        f"N features at CONSTANT density (~6 boxes / 0.25-deg cell; region "
        f"area grows with N), best-of-3 on local[32]. growth = "
        f"(t_{n_big} / t_{n_small}) / {n_big // n_small}; <= ~1 is linear "
        "or better — the expected shape, since candidate generation is a "
        "cell equi-join whose pair fan-out is bounded by constant local "
        "density.", "",
        f"| op | t N={n_small} | t N={n_big} | growth |",
        "|---|---|---|---|",
    ]
    for name, by in table.items():
        t_s, t_b = by[n_small][0], by[n_big][0]
        g = (t_b / t_s) / (n_big / n_small)
        lines.append(f"| {name} | {t_s:.3f}s | {t_b:.3f}s | {g:.2f} |")
    lines += ["", f"raw samples: {table}", ""]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
