"""Per-AOI clipped raster export — the "download this raster" feature.

The reference serves zonal NUMBERS; the product next to it serves
clipped raster DOWNLOADS of the same layers (a bbox window of the layer
mosaicked from tiles). This operator is that export as one Spark job:

- **Plan**: AOI -> cells via the SAME planner machinery as zonal
  (``plans.planner.aoi_cells`` — broadcast AOI catalog, cell
  enumeration in Catalyst), one equi-join attaches the layer's encoded
  tiles, ONE shuffle grouped by ``aoi_id``, and an ``applyInPandas``
  kernel decodes, places each tile at its window position, and
  re-encodes the assembled window. Output is O(AOIs) rows.
- **Window**: the pixel bounding box of the AOI's cell set (cells are
  the storage atom; sub-cell cropping is a downstream slice with the
  returned origin). Missing tiles inside the bbox fill with ``fill`` —
  the reference's missing-tile tolerance, visible in the export instead
  of silently shrinking it.
- **Guard rail**: ``max_px`` fails fast BEFORE assembly when an AOI's
  window exceeds it (a continent-sized AOI is a re-tiling job, not an
  export); the check is per-group metadata, no pixels are touched.

At scale the shuffle moves each selected tile's encoded bytes exactly
once, keyed by aoi_id; group size is bounded by max_px / chunk_px², so
no task can balloon past the guard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs
from ..functions import grid as G


def mosaic_aoi(
    images: DataFrame,
    aoi: DataFrame,
    layer: str,
    grid_name: str,
    max_px: int = 64_000_000,
    fill: float = 0,
    fmt: str = "png",
) -> DataFrame:
    """One clipped raster per AOI: (aoi_id, bytes, w, h, fmt, gx0, gy0)
    where (gx0, gy0) is the window's global pixel origin on the grid.
    ``images`` is the input-hint table; ``aoi`` is (aoi_id, geom_wkb)."""
    from ..plans.planner import aoi_cells
    from ..sources.images import with_derived_keys

    grid = G.get_grid(grid_name)
    cs = grid.chunk_px
    if "cell_id" not in images.columns or "layer" not in images.columns:
        images = with_derived_keys(images)
    tiles = images.filter(F.col("layer") == layer).select(
        "cell_id", "bytes", "w", "h", "fmt"
    )
    pairs = (
        aoi_cells(aoi, grid_name).select("aoi_id", "cell_id")
        .join(tiles, "cell_id", "left")
    )
    fmt_out = fmt
    max_cells = max(int(max_px) // (cs * cs), 1)

    def assemble(key, pdf):
        aoi_id = key[0]
        if len(pdf) > max_cells:
            raise ValueError(
                f"AOI {aoi_id!r} spans {len(pdf)} cells "
                f"({len(pdf) * cs * cs} px) — over the max_px={max_px} "
                "export guard; raise it or split the AOI"
            )
        xs, ys = G.cell_to_xy(pdf["cell_id"].to_numpy())
        x0, y0 = int(xs.min()), int(ys.min())
        nx, ny = int(xs.max()) - x0 + 1, int(ys.max()) - y0 + 1
        if nx * ny * cs * cs > max_px:
            raise ValueError(
                f"AOI {aoi_id!r} window is {nx * cs}x{ny * cs} px — over "
                f"the max_px={max_px} export guard"
            )
        first = next(
            (r for r in pdf.itertuples(index=False) if r.bytes is not None), None
        )
        dtype = (
            codecs.decode_tile(
                bytes(first.bytes), int(first.w), int(first.h), str(first.fmt)
            ).dtype
            if first is not None else np.uint8
        )
        win = np.full((ny * cs, nx * cs), fill, dtype=dtype)
        for r, cx, cy in zip(pdf.itertuples(index=False), xs, ys):
            if r.bytes is None:
                continue  # missing tile keeps the fill value
            arr = codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt))
            win[(int(cy) - y0) * cs:(int(cy) - y0 + 1) * cs,
                (int(cx) - x0) * cs:(int(cx) - x0 + 1) * cs] = arr
        payload = codecs.encode_tile(np.ascontiguousarray(win), fmt_out)
        return pd.DataFrame(
            [(aoi_id, payload, nx * cs, ny * cs, fmt_out,
              x0 * cs, y0 * cs)],
            columns=["aoi_id", "bytes", "w", "h", "fmt", "gx0", "gy0"],
        )

    return pairs.groupBy("aoi_id").applyInPandas(
        assemble,
        "aoi_id string, bytes binary, w int, h int, fmt string, "
        "gx0 long, gy0 long",
    )
