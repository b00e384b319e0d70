"""Per-AOI clipped raster export — the "download this raster" feature.

The reference serves zonal NUMBERS; the product next to it serves
clipped raster DOWNLOADS of the same layers (a bbox window of the layer
mosaicked from tiles). This operator is that export as one Spark job:

- **Plan**: AOI -> cells via the SAME planner machinery as zonal
  (``plans.planner.aoi_cells`` — broadcast AOI catalog, cell
  enumeration in Catalyst). The (aoi, cell) set and the per-AOI window
  bbox are both TINY and broadcast; the big tiles table streams through
  one BroadcastHashJoin, so encoded tile bytes cross the wire exactly
  ONCE — in the single Exchange grouped by ``aoi_id`` that feeds the
  ``applyInPandas`` assembly kernel (decode, place, re-encode). A
  naive left join from the cell list would shuffle tile bytes TWICE
  (cell-keyed SortMergeJoin + the aoi groupBy); the plan test pins the
  single-byte-shuffle shape.
- **Window**: the pixel bounding box of the AOI's FULL cell set
  (computed relationally from the cell list, so a missing edge tile
  cannot silently shrink the export). Missing tiles inside the bbox
  fill with ``fill`` — the reference's missing-tile tolerance, visible
  in the export instead of hidden. An AOI with NO stored tiles at all
  produces no output row (there is nothing to export).
- **Guard rail**: ``max_px`` fails fast when an AOI's window exceeds it
  (a continent-sized AOI is a re-tiling job, not an export); the check
  runs on the bbox metadata before any pixel is decoded.

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
    acells = aoi_cells(aoi, grid_name).select("aoi_id", "cell_id")
    yb, mask = G._Y_BITS, G._XY_MASK
    cx = F.shiftright("cell_id", yb).bitwiseAND(F.lit(mask))
    cy = F.col("cell_id").bitwiseAND(F.lit(mask))
    # per-AOI window bbox over the FULL cell set (missing tiles cannot
    # shrink the export); tiny frame, broadcast
    bbox = (
        acells.select("aoi_id", cx.alias("__x"), cy.alias("__y"))
        .groupBy("aoi_id")
        .agg(
            F.min("__x").alias("__x0"), F.min("__y").alias("__y0"),
            F.max("__x").alias("__x1"), F.max("__y").alias("__y1"),
        )
    )
    # tiles stream through ONE BroadcastHashJoin; bytes shuffle only in
    # the aoi_id groupBy below
    pairs = (
        tiles.join(F.broadcast(acells), "cell_id")
        .join(F.broadcast(bbox), "aoi_id")
    )
    fmt_out = fmt

    def assemble(key, pdf):
        aoi_id = key[0]
        x0, y0 = int(pdf["__x0"].iloc[0]), int(pdf["__y0"].iloc[0])
        nx = int(pdf["__x1"].iloc[0]) - x0 + 1
        ny = int(pdf["__y1"].iloc[0]) - y0 + 1
        if nx * ny * cs * cs > max_px:
            raise ValueError(
                f"AOI {aoi_id!r} window is {nx * cs}x{ny * cs} px — over "
                f"the max_px={max_px} export guard; raise it or split the AOI"
            )
        first = pdf.iloc[0]
        dtype = codecs.decode_tile(
            bytes(first["bytes"]), int(first["w"]), int(first["h"]),
            str(first["fmt"]),
        ).dtype
        win = np.full((ny * cs, nx * cs), fill, dtype=dtype)
        xs, ys = G.cell_to_xy(pdf["cell_id"].to_numpy())
        for r, tx, ty in zip(pdf.itertuples(index=False), xs, ys):
            arr = codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt))
            win[(int(ty) - y0) * cs:(int(ty) - y0 + 1) * cs,
                (int(tx) - x0) * cs:(int(tx) - x0 + 1) * cs] = arr
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
