#!/usr/bin/env python
"""Data-size scaling for the suffix-array family: suffix_ranks and
repeated_substring_stats at 10x docs growth (constant duplicate
structure: 50-doc boilerplate classes scale with n, so rank-group sizes
and LCP-boundary counts are invariant). Appends to BENCH/DATASCALE_r05.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gfw_raster_analysis_lambda_spark.operators import text  # noqa: E402
from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402


def docs_corpus(spark, n):
    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for t in pdf["id"].astype(int):
                t = int(t)
                cls = t // 50
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


def best_of(fn, k=3):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    spark = get_spark("datascale-r5d")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name, run in [
        ("suffix_ranks (cap 64)",
         lambda df: text.suffix_ranks(df, max_prefix=64)
         .agg({"rank": "max"}).collect()),
        ("repeated_substring_stats",
         lambda df: text.repeated_substring_stats(df, max_prefix=64, min_len=40)
         .agg({"n_rep": "sum"}).collect()),
    ]:
        results[name] = {}
        for n in (2_000, 20_000):
            df = docs_corpus(spark, n).cache()
            df.count()
            t, ts = best_of(lambda: run(df), k=2)
            results[name][n] = ts
            df.unpersist()

    lines = [
        "",
        "## Suffix-array family: 10x docs growth",
        "",
        "Best-of-2 seconds, local[32]; `growth` = time ratio / row ratio"
        " (<= ~1 = linear or better). 50-doc boilerplate classes scale"
        " with n, so rank-group sizes and LCP-boundary counts are"
        " invariant as the corpus grows.",
        "",
        "| op | rows A | A s | rows B | B s | growth |",
        "|---|---|---|---|---|---|",
    ]
    for name, sizes in results.items():
        (na, nb) = sorted(sizes)
        ta, tb = min(sizes[na]), min(sizes[nb])
        growth = (tb / ta) / (nb / na)
        lines.append(f"| {name} | {na} | {ta:.3f} | {nb} | {tb:.3f} | {growth:.2f} |")
    lines += ["", f"Raw samples: {results}", ""]
    with open(os.path.join(REPO, "BENCH", "DATASCALE_r05.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
