#!/usr/bin/env python
"""Round-6 optimization harness (bench.py stays FROZEN — see its header).

Two modes over the exact bench.py query set:

- ``time``:     per-query wall seconds through the noop sink (guide §1.4),
                best-of-N, with job descriptions for UI attribution.
- ``checksum``: order-independent content checksum of each query's result
                (count + sum of xxhash64 over the stringified row) — the
                before/after equivalence proof for every optimization.

Usage:
  python bench_extra.py time     [query ...]        # default: all
  python bench_extra.py checksum [query ...]
  python bench_extra.py explain  [query ...]        # formatted plans to stdout

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py),
BENCH_EXTRA_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402  (frozen harness: reuse its query registry)
from gfw_raster_analysis_lambda_spark.session import get_spark  # noqa: E402


def checksum(df):
    cols = df.columns
    row = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(row).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return {"cols": cols, "n": agg["n"], "hash": str(agg["h"])}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    wanted = sys.argv[2:]
    runs = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))
    spark = get_spark(
        "bench_extra", master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS, arrow_batch_rows=256,
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.ensure_corpus(spark)
    q, _images, _aoi = bench.bench_queries(spark)
    names = wanted or list(q)
    out = {}
    for name in names:
        fn = q[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if mode == "checksum":
            out[name] = checksum(fn())
            print(f"{name}: {out[name]}", flush=True)
        elif mode == "explain":
            plan_dir = os.environ.get("BENCH_EXTRA_PLAN_DIR")
            suffix = os.environ.get("BENCH_EXTRA_PLAN_SUFFIX", "before")
            df = fn()
            if plan_dir:
                os.makedirs(plan_dir, exist_ok=True)
                path = os.path.join(plan_dir, f"{name}_{suffix}.txt")
                with open(path, "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
                print(f"{name}: wrote {path}", flush=True)
            else:
                print(f"===== {name} =====")
                df.explain("formatted")
        else:
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
            out[name] = {"min": min(samples), "samples": samples}
            print(f"{name}: {out[name]}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"mode": mode, "sf_dir": bench.SF_DIR, "results": out}))


if __name__ == "__main__":
    main()
