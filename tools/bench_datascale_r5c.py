#!/usr/bin/env python
"""Data-size scaling evidence for the late round-5 additions:
exact_substring_dedup, template_match, and ssim_pairs at 10x input
growth (constant-density synthesis, same methodology as
tools/bench_datascale.py). Appends a markdown block to
BENCH/DATASCALE_r05.md.

Constant shape: exact-substr docs keep ~300 chars each and a fixed
50-doc boilerplate class size (classes scale with n, so window-group
multiplicity — and therefore per-key shuffle fan-in — is invariant);
the image ops keep 64x64 tiles and grow only the tile count.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from gfw_raster_analysis_lambda_spark.operators import multimodal, text  # noqa: E402
from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402


def best_of(fn, k=3):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def docs_corpus(spark, n):
    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for t in pdf["id"].astype(int):
                t = int(t)
                cls = t // 50  # 50 docs share each boilerplate class
                boiler = "".join(
                    chr(97 + (cls * 31 + q * 7) % 26) for q in range(80)
                )
                unique = " ".join(
                    f"w{(t * 131 + q * 17) % 100000}" for q in range(30)
                )
                rows.append((t, unique[:100] + " " + boiler + " " + unique[100:220]))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    return spark.range(n).repartition(32).mapInPandas(
        synth, "doc_id long, text string"
    )


def tiles_corpus(spark, n_tiles):
    def synth(batches):
        import pandas as pd

        from gfw_raster_analysis_lambda_spark.functions.codecs import encode_tile

        for pdf in batches:
            rows = []
            for t in pdf["id"].astype(int):
                i, j = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
                arr = ((int(t) * 37 + i * 11 + j * 5) % 256).astype(np.uint8)
                rows.append((f"t/{t}", encode_tile(arr, "raw_u8"), 64, 64, "raw_u8"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return spark.range(n_tiles).repartition(32).mapInPandas(
        synth, "image_id string, bytes binary, w int, h int, fmt string"
    )


def main():
    spark = get_spark("datascale-r5c")
    spark.sparkContext.setLogLevel("ERROR")
    tpl = (np.arange(64).reshape(8, 8) * 7 % 251).astype(np.uint8)
    results = {}

    for name, sizes, make, run in [
        (
            "exact_substring_dedup",
            (10_000, 100_000),
            docs_corpus,
            lambda df: text.exact_substring_dedup(df, min_len=40, key_on_hash=True)
            .agg({"removed_chars": "sum"}).collect(),
        ),
        (
            "template_match",
            (512, 5120),
            tiles_corpus,
            lambda df: multimodal.template_match(df, tpl)
            .agg({"n_match": "sum"}).collect(),
        ),
        (
            "ssim_pairs",
            (512, 5120),
            tiles_corpus,
            lambda df: multimodal.ssim_pairs(
                df, df.withColumn("image_id", F_id()), block=8
            ),
        ),
    ]:
        results[name] = {}
        for n in sizes:
            df = make(spark, n)
            df = df.cache(); df.count()
            if name == "ssim_pairs":
                from gfw_raster_analysis_lambda_spark.operators.multimodal import (
                    ssim_pairs,
                )
                t, ts = best_of(
                    lambda: ssim_pairs(df, df, block=8)
                    .agg({"n_low": "sum"}).collect()
                )
            else:
                t, ts = best_of(lambda: run(df))
            results[name][n] = ts
            df.unpersist()

    lines = [
        "",
        "## Late round-5c additions: 10x input growth",
        "",
        "Best-of-3 seconds, local[32]; `growth` = time ratio / row ratio"
        " (<= ~1 = linear or better). exact-substr keeps the 50-doc"
        " boilerplate class size constant as docs grow 10x (window-group"
        " fan-in invariant); image ops grow tile count only.",
        "",
        "| op | rows A | A s | rows B | B s | growth |",
        "|---|---|---|---|---|---|",
    ]
    for name, sizes in results.items():
        (na, nb) = sorted(sizes)
        ta, tb = min(sizes[na]), min(sizes[nb])
        growth = (tb / ta) / (nb / na)
        lines.append(
            f"| {name} | {na} | {ta:.3f} | {nb} | {tb:.3f} | {growth:.2f} |"
        )
    lines += ["", f"Raw samples: {results}", ""]
    with open(os.path.join(REPO, "BENCH", "DATASCALE_r05.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


def F_id():
    from pyspark.sql import functions as F

    return F.col("image_id")


if __name__ == "__main__":
    main()
