#!/usr/bin/env python
"""Data-size scaling evidence for the last round-5 additions:
hilbert_index, count_min (+estimates), bloom_pass_col,
convex_hull_stats, and otsu_threshold at 10x input growth
(constant-density synthesis, same methodology as
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

from gfw_raster_analysis_lambda_spark.operators import (  # noqa: E402
    multimodal,
    sketches,
    spatial_join,
)
from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402


def best_of(fn, k=3):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def otsu_corpus(spark, n_tiles: int):
    def synth(batches):
        import numpy as np
        import pandas as pd

        from gfw_raster_analysis_lambda_spark.functions.codecs import (
            encode_tile,
        )

        for pdf in batches:
            rows = []
            for t in pdf["id"].astype(int):
                i, j = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
                arr = ((t * 37 + i * 11 + j * 5) % 256).astype(np.uint8)
                rows.append(
                    (f"o/{t}", encode_tile(arr, "raw_u8"), 64, 64, "raw_u8")
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return spark.range(n_tiles).repartition(32).mapInPandas(
        synth, "image_id string, bytes binary, w int, h int, fmt string"
    )


def main():
    spark = get_spark("datascale-late5b", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    samples = {}

    def record(name, per):
        growth = (per[1][1] / per[0][1]) / (per[1][0] / per[0][0])
        rows.append((name, per, growth))

    # hilbert_index: pure codegen chain + block groupBy
    per = []
    for n in (1_000_000, 10_000_000):
        df = spark.range(n).selectExpr(
            "id % 4096 AS x", "(id * 7) % 4096 AS y"
        )
        t, ts = best_of(
            lambda: spatial_join.hilbert_index(df, 12, keep=[])
            .selectExpr("hilbert >> 8 AS b").groupBy("b").count().count()
        )
        per.append((n, t))
        samples.setdefault("hilbert_index", {})[n] = ts
    record("hilbert_index (order 12)", per)

    # count_min registers + 100-probe estimates; key density constant
    per = []
    for n in (1_000_000, 10_000_000):
        df = spark.range(n).selectExpr(f"id % {n // 100} AS key")
        probes = spark.range(100).selectExpr(f"id * {n // 10_000} AS key")

        def run():
            regs = sketches.count_min(df, "key", w=1024, d=3)
            sketches.count_min_estimate(regs, probes, "key", 1024, 3).count()

        t, ts = best_of(run)
        per.append((n, t))
        samples.setdefault("count_min", {})[n] = ts
    record("count_min + estimate", per)

    # bloom probe of a growing fact against a fixed 10k-key filter
    keys = spark.range(10_000).selectExpr("id * 13 AS k")
    words = sketches.bloom_words(keys, "k", m=1 << 17, k=3)
    words.cache().count()
    per = []
    for n in (1_000_000, 10_000_000):
        fact = spark.range(n).selectExpr("id % 200000 AS fk")
        t, ts = best_of(
            lambda: sketches.bloom_pass_col(fact, "fk", words, 1 << 17, 3)
            .filter("bloom_pass").count()
        )
        per.append((n, t))
        samples.setdefault("bloom_pass", {})[n] = ts
    record("bloom_pass_col (fixed filter)", per)

    # convex hull: 16 groups, uniform square (hull ~ O(log n) of survivors)
    per = []
    for n in (1_000_000, 10_000_000):
        df = spark.range(n).selectExpr(
            "id % 16 AS g",
            "(id * 2654435761) % 1000000 AS x",
            "(id * 40503 + 17) % 1000000 AS y",
        )
        t, ts = best_of(
            lambda: spatial_join.convex_hull_stats(df, "g").count()
        )
        per.append((n, t))
        samples.setdefault("convex_hull", {})[n] = ts
    record("convex_hull_stats (16 groups)", per)

    # otsu over 64x64 tiles, 10x tile count
    per = []
    for n in (512, 5_120):
        corpus = otsu_corpus(spark, n)
        t, ts = best_of(
            lambda: multimodal.otsu_threshold(corpus).count()
        )
        per.append((n, t))
        samples.setdefault("otsu_threshold", {})[n] = ts
    record("otsu_threshold (64x64 tiles)", per)

    lines = [
        "",
        "## Last round-5 additions: 10x input growth",
        "",
        "Best-of-3 seconds, local[32]; `growth` = time ratio / row ratio"
        " (<= ~1 = linear or better). Constant-density synthesis: key"
        " multiplicity, filter size, group count, and tile size are held"
        " fixed while rows grow 10x.",
        "",
        "| op | rows A | A s | rows B | B s | growth |",
        "|---|---|---|---|---|---|",
    ]
    for name, per, growth in rows:
        lines.append(
            f"| {name} | {per[0][0]} | {per[0][1]:.3f} "
            f"| {per[1][0]} | {per[1][1]:.3f} | {growth:.2f} |"
        )
    lines += ["", f"Raw samples: {samples}", ""]
    out = os.path.join(REPO, "BENCH", "DATASCALE_r05.md")
    with open(out, "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
