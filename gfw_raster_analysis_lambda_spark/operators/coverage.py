"""Partial-pixel-coverage zonal statistics.

The zonal engine (operators/zonal.py) uses center-containment
rasterization — the reference's semantics (reference data_cube.py:74-109,
GDAL ``geometry_mask`` convention): a pixel is all-in or all-out by where
its center falls. For AOIs whose boundary length is large relative to
their area (smallholder plots, riparian buffers, anything near the pixel
scale) that quantization dominates the error budget. This module is the
standard accuracy upgrade: every pixel carries a COVERAGE FRACTION
(``functions.geometry.coverage_counts`` — k x k supersampled centers, the
antialiased-rasterization approach), and aggregates weight by it.

Spark shape — identical to the zonal fast path, no new Exchange:

    tiles scan -> mapInPandas kernel (decode once, coverage counts per
    AOI from the broadcast AOI index, integer partial sums) ->
    groupBy(aoi_id) partial/final agg of O(aoi x cells) rows.

Everything that can be an integer stays one: subpixel counts and
value-weighted counts are int64-exact end to end (a DuckDB twin
replicates them bit-for-bit on the k-times-finer grid); only the
area-hectare output multiplies the per-tile geodesic pixel area in as a
double, and the one mean divides at the very end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs, geodesy
from ..functions import grid as G


def coverage_zonal(
    tiles: DataFrame,
    aoi_df: DataFrame,
    grid_name: str,
    k: int = 4,
) -> DataFrame:
    """Area-weighted zonal statistics with partial pixel coverage.

    Per AOI over the given single-layer tile set, with every pixel
    weighted by the fraction of its k x k subpixel centers inside the
    AOI polygon:

    - ``cov_sub``  int64: total in-AOI subpixel count (= covered pixel
      area x k^2 — exact integers, the twin-checkable core),
    - ``wsum_sub`` int64: sum of pixel_value x subpixel_count,
    - ``n_any``   int64: pixels with any coverage,
    - ``n_full``  int64: fully covered pixels,
    - ``cov_px``  double: covered area in pixel units (cov_sub / k^2),
    - ``area_ha`` double: geodesic covered area (per-tile mean pixel
      area, like the zonal engine's ``area__ha``),
    - ``wmean``   double: coverage-weighted mean pixel value.

    ``n_any - n_full`` is the boundary band the center-containment
    engine quantizes to all-or-nothing. The kernel decodes each tile
    once and rasterizes the fine mask per overlapping AOI from the same
    broadcast AOI index the zonal planner uses, so the only shuffle is
    the final O(aoi x cells) re-aggregation."""
    from ..plans.planner import prepare_aoi_index
    from . import zonal as _zonal

    if k < 1 or k > 16:
        raise ValueError("need 1 <= k <= 16 (k^2 subsamples per pixel)")
    spark = tiles.sparkSession
    idx = prepare_aoi_index(spark, aoi_df, grid_name)
    if idx is None:
        raise ValueError("AOI batch exceeds the broadcastable index bound")
    lookup = idx.lookup
    kk = int(k)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import geometry as geo

        grid = G.get_grid(grid_name)
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in (
                "aoi_id", "cov_sub", "wsum_sub", "n_any", "n_full", "area_sub"
            )}
            for cell, data, w, h, fmt in zip(
                pdf["cell_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                entry = lookup.value.get(int(cell))
                if entry is None:
                    continue
                arr = codecs.decode_tile(
                    bytes(data), int(w), int(h), fmt
                ).astype(np.int64)
                x0, y0, ps = G.cell_affine(grid, int(cell))
                lat_c = float(
                    G.cell_centroid_lat(grid, np.array([int(cell)]))[0]
                )
                mean_area = float(geodesy.pixel_area_ha(lat_c, ps))
                for aoi_id, wkb in entry[1]:
                    geom, g_edges, _ = _zonal._geom_edges(bytes(wkb))
                    cnt = geo.coverage_counts(
                        geom, x0, y0, ps, int(w), int(h), k=kk, edges=g_edges
                    ).astype(np.int64)
                    cov = int(cnt.sum())
                    if cov == 0:
                        continue
                    out["aoi_id"].append(aoi_id)
                    out["cov_sub"].append(cov)
                    out["wsum_sub"].append(int((arr * cnt).sum()))
                    out["n_any"].append(int((cnt > 0).sum()))
                    out["n_full"].append(int((cnt == kk * kk).sum()))
                    out["area_sub"].append(mean_area * cov)
            yield pd.DataFrame(out)

    per_cell = tiles.select("cell_id", "bytes", "w", "h", "fmt").mapInPandas(
        kern,
        "aoi_id string, cov_sub long, wsum_sub long, n_any long, "
        "n_full long, area_sub double",
    )
    k2 = float(kk * kk)
    return (
        per_cell.groupBy("aoi_id")
        .agg(
            F.sum("cov_sub").alias("cov_sub"),
            F.sum("wsum_sub").alias("wsum_sub"),
            F.sum("n_any").alias("n_any"),
            F.sum("n_full").alias("n_full"),
            F.sum("area_sub").alias("area_sub"),
        )
        .select(
            "aoi_id", "cov_sub", "wsum_sub", "n_any", "n_full",
            (F.col("cov_sub") / F.lit(k2)).alias("cov_px"),
            (F.col("area_sub") / F.lit(k2)).alias("area_ha"),
            (
                F.col("wsum_sub").cast("double")
                / F.col("cov_sub").cast("double")
            ).alias("wmean"),
        )
    )
