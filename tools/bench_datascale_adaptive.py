#!/usr/bin/env python
"""Data-size scaling evidence for the closing round-5 spatial ops:
adaptive_cell_cover, join_points_to_cover, buffer_cells, and
spatial_block_split at 100k / 1M synthetic points (10x growth, constant
density SHAPE: the hot-cluster fraction and the sparse field's cell
occupancy pattern are preserved, so bucket/ladder structure doesn't
change with n — the honest scaling experiment, same methodology as
tools/bench_datascale.py). Appends a markdown block to
BENCH/DATASCALE_r05.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gfw_raster_analysis_lambda_spark.functions import grid as G  # noqa: E402
from gfw_raster_analysis_lambda_spark.operators.cells import (  # noqa: E402
    adaptive_cell_cover,
    buffer_cells,
    join_points_to_cover,
)
from gfw_raster_analysis_lambda_spark.operators.sampling import (  # noqa: E402
    spatial_block_split,
)
from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402

LADDER = ["4/512", "4/1024", "4/2048"]


def points(spark, n: int):
    # 60% hot cluster in one fine cell + a sparse field whose occupied-
    # cell set scales with n (span grows with n so per-cell density is
    # constant -> ladder decisions keep the same shape at 10x rows)
    i = F.col("id")
    hot = i % 5 < 3
    span_x, span_y = max(80, n // 1250), max(40, n // 2500)
    return spark.range(n).select(
        "id",
        F.when(hot, F.lit(-100.0) + (i % 16) / F.lit(128.0))
        .otherwise(F.lit(-180.0) + ((i * 7) % span_x) / F.lit(8.0))
        .alias("lon"),
        F.when(hot, F.lit(10.0) - (i % 16) / F.lit(128.0))
        .otherwise(F.lit(80.0) - ((i * 13) % span_y) / F.lit(8.0))
        .alias("lat"),
    )


def best_of(fn, k=3):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    spark = get_spark("datascale-adaptive", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    g = G.GRID_FIXTURE
    sizes = [100_000, 1_000_000]
    rows = []
    samples = {}
    for name, make in [
        ("adaptive_cell_cover", lambda df: adaptive_cell_cover(df, LADDER, 50)),
        (
            "join_points_to_cover",
            lambda df: join_points_to_cover(
                df, adaptive_cell_cover(df, LADDER, 50), LADDER
            ),
        ),
        (
            "spatial_block_split",
            lambda df: spatial_block_split(
                df.select(
                    (
                        F.lit(3 << 54)
                        + (F.col("id") % 1440) * F.lit(1 << 27)
                        + (F.col("id") / 1440).cast("long") % 720
                    ).alias("cell_id")
                ),
                {"train": 0.8, "val": 0.1, "test": 0.1},
            ),
        ),
    ]:
        per = []
        for n in sizes:
            df = points(spark, n)
            t, ts = best_of(lambda: make(df).count())
            per.append((n, t))
            samples.setdefault(name, {})[n] = ts
        growth = (per[1][1] / per[0][1]) / (sizes[1] / sizes[0])
        rows.append((name, per, growth))

    # buffer_cells scales in COVER cells, not points
    per = []
    for n in (10_000, 100_000):
        side = int(n ** 0.5)
        cover = spark.range(n).select(
            F.lit("a").alias("aoi_id"),
            (
                F.lit(3 << 54)
                + (F.lit(100) + F.col("id") % side) * F.lit(1 << 27)
                + (F.lit(100) + (F.col("id") / side).cast("long"))
            ).alias("cell_id"),
        )
        t, ts = best_of(lambda: buffer_cells(cover, 2, g.name).count())
        per.append((n, t))
        samples.setdefault("buffer_cells", {})[n] = ts
    growth = (per[1][1] / per[0][1]) / 10.0
    rows.append(("buffer_cells (cover cells)", per, growth))

    lines = [
        "",
        "## Closing round-5 spatial ops: 10x point/cover growth",
        "",
        "Best-of-3 seconds, local[32]; `growth` = time ratio / row ratio"
        " (<= ~1 = linear or better). Constant-density synthesis: the"
        " sparse field's span grows with n so per-cell occupancy (and"
        " therefore ladder/ring structure) is preserved at 10x.",
        "",
        "| op | rows A | A s | rows B | B s | growth |",
        "|---|---|---|---|---|---|",
    ]
    for name, per, growth in rows:
        (na, ta), (nb, tb) = per
        lines.append(
            f"| {name} | {na} | {ta:.3f} | {nb} | {tb:.3f} | {growth:.2f} |"
        )
    lines.append("")
    lines.append(f"Raw samples: {samples}")
    out = os.path.join(REPO, "BENCH", "DATASCALE_r05.md")
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
