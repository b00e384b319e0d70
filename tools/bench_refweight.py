#!/usr/bin/env python
"""Reference-weight tile benchmark: the flagship zonal query over
5000x5000-px tiles (25 M px — the reference Lambda's actual per-window
size, reference README.md:358 / globals.py:21 CHUNK=5000) on the real
10/40000 grid (GRID_30M), pinning per-task peak memory and Arrow batch
sizing at reference weight.

The scaling bench (tools/bench_scaling.py) uses 1024px tiles to get
statistically many tasks; this one answers the orthogonal question:
does ONE task at the reference's full window size stay inside a sane
executor memory budget, and what does per-tile throughput look like
when the kernel works at 25 M px per (cell, layer) image?

Per-task peak memory is read from the pyspark worker daemons' VmHWM
(/proc), which in local mode are the exact processes that run the
Arrow-batched zonal kernel.

Usage: python tools/bench_refweight.py          # prints one JSON line
       writes BENCH/REFWEIGHT_r05.md
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = 8                 # concurrent 25M-px kernels; 32 would be memory-silly
ARROW_ROWS = 2           # 2 tiles/batch x 25 MB raw = the batch-size story
SNX = SNY = 3            # 3x3 cells x 4 layers = 36 reference-weight tiles
N_AOI = 8
CELLS_PER_AOI = 4


def _worker_peak_rss_mb() -> float:
    """Max VmHWM (MiB) across live pyspark daemon/worker processes."""
    peak = 0.0
    for status in glob.glob("/proc/[0-9]*/status"):
        pid = status.split("/")[2]
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            if "pyspark.daemon" not in cmd and "pyspark.worker" not in cmd:
                continue
            with open(status) as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        peak = max(peak, float(line.split()[1]) / 1024.0)
                        break
        except OSError:
            continue
    return round(peak, 1)


def main() -> None:
    import bench
    from gfw_raster_analysis_lambda_spark.api import zonal_statistics
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.plans.planner import aoi_cells
    from gfw_raster_analysis_lambda_spark.session import get_spark
    from gfw_raster_analysis_lambda_spark.sources import fixtures
    from gfw_raster_analysis_lambda_spark.sources.images import (
        read_images,
        write_images_cell_sorted,
    )

    grid = G.GRID_30M  # 10/40000: 5000px chunks, 1.25 deg cells
    spark = get_spark(
        "refweight", master=f"local[{CPUS}]", shuffle_partitions=CPUS,
        arrow_batch_rows=ARROW_ROWS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    sx0 = int((0.0 + 180.0) / grid.tile_deg)
    sy0 = int((90.0 - 12.0) / grid.tile_deg)
    path = os.path.join(
        REPO, ".bench_cache",
        f"corpus_refw_{grid.name.replace('/', '_')}_i{grid.index}_{SNX}x{SNY}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = fixtures.generate_images_df(
            spark, grid, bench.BLAYERS, sx0, sy0, SNX, SNY,
            parallelism=CPUS,
        )
        write_images_cell_sorted(df, path)
    images = read_images(spark, path)
    aoi = spark.createDataFrame(
        fixtures.bench_aois(grid, sx0, sy0, SNX, SNY, N_AOI, CELLS_PER_AOI),
        fixtures.AOI_SCHEMA,
    )
    env = fixtures.fixture_environment(grid=grid.name)

    def job():
        return zonal_statistics(
            spark, images, aoi,
            "SELECT tcl_year, SUM(area__ha) AS loss_ha, COUNT(*) AS n "
            "FROM tcl_year WHERE tcd_threshold >= 25 AND is_primary = 'true' "
            "GROUP BY tcl_year",
            env, grid.name, strategy="colocated",
        )

    tile_tasks = (
        aoi_cells(aoi, grid.name).select("aoi_id", "cell_id")
        .join(images.select("cell_id").distinct(), "cell_id").count()
    )

    secs = []
    for _ in range(3):  # first = warmup (JVM + page cache), not kept
        t0 = time.perf_counter()
        job().write.format("noop").mode("overwrite").save()
        secs.append(time.perf_counter() - t0)
    best = min(secs[1:])
    px_per_tile = grid.chunk_px * grid.chunk_px
    report = {
        "metric": "reference-weight zonal throughput (5000x5000-px tiles)",
        "grid": grid.name,
        "tile_px": grid.chunk_px,
        "mpx_per_tile": round(px_per_tile / 1e6, 1),
        "layers": len(bench.BLAYERS),
        "aoi_cell_tasks": tile_tasks,
        "cpus": CPUS,
        "arrow_rows_per_batch": ARROW_ROWS,
        "seconds_best": round(best, 3),
        "all_runs": [round(s, 3) for s in secs],
        "tiles_per_sec": round(tile_tasks / best, 2),
        "mpx_per_sec": round(tile_tasks * px_per_tile / best / 1e6, 1),
        "worker_peak_rss_mb": _worker_peak_rss_mb(),
    }
    print(json.dumps(report))

    md = os.path.join(REPO, "BENCH", "REFWEIGHT_r05.md")
    with open(md, "w") as f:
        f.write(
            "# Reference-weight tile benchmark (round 5)\n\n"
            "The reference Lambda analyzes one 5000x5000-px raster window "
            "per invocation (CHUNK=5000). This run drives the SAME flagship "
            "zonal query through the engine's kernel at that exact tile "
            "weight on the production 10/40000 grid, answering: per-task "
            "memory and throughput at 25 M px/tile.\n\n"
            "```json\n" + json.dumps(report, indent=2) + "\n```\n\n"
            f"- {report['aoi_cell_tasks']} (AOI, cell) kernel tasks x "
            f"{report['layers']} layers of {report['mpx_per_tile']} Mpx tiles, "
            f"local[{CPUS}], {ARROW_ROWS} tiles/Arrow batch.\n"
            f"- Best of 2 timed runs (1 warmup): {report['seconds_best']} s = "
            f"{report['tiles_per_sec']} tile-tasks/s = "
            f"{report['mpx_per_sec']} Mpx/s of masked-aggregate work.\n"
            f"- Peak pyspark-worker RSS {report['worker_peak_rss_mb']} MiB — "
            "the per-task budget an executor slot needs at reference "
            "weight; set spark.executor.memory/cores from this number.\n"
        )


if __name__ == "__main__":
    main()
