#!/usr/bin/env python
"""Data-size scaling evidence for skyline_2d at 10x input growth
(constant-density synthesis, same methodology as
tools/bench_datascale.py). Appends a markdown block to
BENCH/DATASCALE_r05.md."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gfw_raster_analysis_lambda_spark.operators.skyline import skyline_2d  # noqa: E402
from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402


def best_of(fn, k=3):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    spark = get_spark("datascale-skyline", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    per, samples = [], {}
    for n in (1_000_000, 10_000_000):
        # 8 groups; objectives drawn from a fixed 2^20 x 2^20 lattice so
        # frontier size stays O(log n)-ish while rows grow 10x
        df = spark.range(n).selectExpr(
            "id % 8 AS g",
            "(id * 2654435761) % 1048576 AS cost",
            "CAST((id * 40503 + 17) % 1048576 AS DOUBLE) AS score",
        )
        t, ts = best_of(lambda: skyline_2d(df, ["g"], "cost", "score").count())
        per.append((n, t))
        samples[n] = ts
    growth = (per[1][1] / per[0][1]) / (per[1][0] / per[0][0])
    lines = [
        "",
        "## Pareto skyline: 10x input growth",
        "",
        "Best-of-3 seconds, local[32]; `growth` = time ratio / row ratio"
        " (<= ~1 = linear or better). 8 groups, uniform integer objectives"
        " on a fixed lattice: phase-1 local frontiers keep the one grouped"
        " shuffle at O(frontier) candidates regardless of corpus size.",
        "",
        "| op | rows A | A s | rows B | B s | growth |",
        "|---|---|---|---|---|---|",
        f"| skyline_2d (8 groups) | {per[0][0]} | {per[0][1]:.3f} "
        f"| {per[1][0]} | {per[1][1]:.3f} | {growth:.2f} |",
        "",
        f"Raw samples: {samples}",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "DATASCALE_r05.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
