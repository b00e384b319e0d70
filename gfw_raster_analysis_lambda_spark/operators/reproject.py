"""Cross-grid raster reprojection — ``gdalwarp -r near`` as ONE shuffle.

The reference engine serves every layer on its own fixed grid and the
zonal kernel co-registers co-anchored integer-ratio grids on the fly
(reference raster.py window reads; this repo's
``functions/grid.py:upsample_to_cell``). What it cannot do is MOVE a
layer between grid families — e.g. re-tile the 0.25-degree fixture
family onto 1-degree cells with a different (non-integer-ratio) pixel
size for a coarser product or a differently-tiled consumer. This
operator adds that as a first-class Spark job:

- **Plan**: derive each source tile's destination cell with pure
  Catalyst bit arithmetic (no UDF), shuffle encoded tile BYTES once,
  grouped by ``(layer, dst cell)`` — every group holds exactly the
  k x k source tiles that mosaic into one destination tile (k =
  dst.tile_deg / src.tile_deg, validated integer). ``applyInPandas``
  decodes the group, mosaics, samples, re-encodes. Output is O(dst
  tiles); nothing is ever collected.
- **Sampling**: nearest-neighbor at destination PIXEL CENTERS with
  EXACT RATIONAL integer arithmetic — both grids define
  ``pixel_size = degrees / pixels`` with integer numerators, so
  ``src_px = floor((dst_px + 0.5) * dst_ps / src_ps)``
  becomes ``((2*dst_px + 1) * dst_deg * src_pix) // (2 * dst_pix *
  src_deg)`` in int64. No float crosses the mapping, which is what
  lets a DuckDB twin regenerate every sampled pixel bit-exactly
  (and what keeps results identical across platforms at any scale).
- **Missing source tiles** fill with ``fill`` (the reference's
  missing-tile tolerance, reference tiling.py: absent windows read as
  NoData).

At 100 TB this is the one unavoidable full-data shuffle of a re-tiling
backfill; the group key is the destination cell so skew is impossible
(every group is exactly <= k*k rows) and AQE has nothing to re-plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs
from ..functions import grid as G


def _dst_cell_expr(src: G.Grid, dst: G.Grid, k: int):
    """Catalyst column: destination cell_id of a source cell_id — pure
    bit arithmetic (src x//k, y//k re-packed under the dst grid index)."""
    xb, yb = G._X_BITS, G._Y_BITS
    mask = G._XY_MASK
    x = F.shiftright("cell_id", yb).bitwiseAND(F.lit(mask))
    y = F.col("cell_id").bitwiseAND(F.lit(mask))
    dx = (x / k).cast("long")  # non-negative -> floor
    dy = (y / k).cast("long")
    return (
        F.lit(int(dst.index)).cast("long") * F.lit(1 << (xb + yb))
        + F.shiftleft(dx, yb) + dy
    )


def reproject_nearest(
    images: DataFrame,
    src_grid: str,
    dst_grid: str,
    fill: float = 0,
    fmt: str = "png",
) -> DataFrame:
    """Re-tile ``images`` (input-hint schema, tiles on ``src_grid``) onto
    ``dst_grid`` by nearest-neighbor pixel-center sampling. Returns an
    images-shaped frame (image_id, bytes, w, h, fmt, layer, cell_id)
    on the destination grid. ``dst_grid``'s cell size must be an integer
    multiple of ``src_grid``'s (cells nest); pixel sizes may be ANY
    rational ratio — that is the point."""
    src, dst = G.get_grid(src_grid), G.get_grid(dst_grid)
    ratio = dst.tile_deg / src.tile_deg
    k = int(round(ratio))
    if abs(ratio - k) > 1e-9 or k < 1:
        raise ValueError(
            f"dst cell ({dst.tile_deg} deg) must be an integer multiple "
            f"of src cell ({src.tile_deg} deg); got ratio {ratio}"
        )
    from ..sources.images import with_derived_keys

    if "cell_id" not in images.columns or "layer" not in images.columns:
        images = with_derived_keys(images)

    cs, cd = src.chunk_px, dst.chunk_px
    # exact rational pixel mapping: src_px = ((2*dst_px+1) * num) // den
    num = dst.degrees * src.pixels
    den = 2 * dst.pixels * src.degrees
    if int(num) != num or int(den) != den:
        raise ValueError("grid degrees/pixels must be integers")
    num, den = int(num), int(den)
    fmt_out = fmt

    keyed = images.withColumn("__dst_cell", _dst_cell_expr(src, dst, k))

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "layer string, cell_id long"
    )

    def assemble(key, pdf):
        layer, dst_cell = str(key[0]), int(key[1])
        dx, dy = G.cell_to_xy(dst_cell)
        dx, dy = int(dx), int(dy)
        # mosaic of the k x k source tiles, missing ones filled
        first = codecs.decode_tile(
            bytes(pdf["bytes"].iloc[0]), int(pdf["w"].iloc[0]),
            int(pdf["h"].iloc[0]), str(pdf["fmt"].iloc[0]),
        )
        mosaic = np.full((k * cs, k * cs), fill, dtype=first.dtype)
        for r in pdf.itertuples(index=False):
            sx, sy = G.cell_to_xy(int(r.cell_id))
            sx, sy = int(sx), int(sy)
            arr = codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt))
            mosaic[(sy - dy * k) * cs:(sy - dy * k + 1) * cs,
                   (sx - dx * k) * cs:(sx - dx * k + 1) * cs] = arr
        # dst pixel centers -> src global px -> mosaic-local (exact int64)
        jj = np.arange(cd, dtype=np.int64)
        gx = dx * cd + jj
        gy = dy * cd + jj
        lx = (2 * gx + 1) * num // den - dx * k * cs
        ly = (2 * gy + 1) * num // den - dy * k * cs
        out = mosaic[np.ix_(ly, lx)]
        payload = codecs.encode_tile(np.ascontiguousarray(out), fmt_out)
        return pd.DataFrame(
            [(f"{layer}/{dst_cell:016x}", payload, cd, cd, fmt_out,
              layer, dst_cell)],
            columns=["image_id", "bytes", "w", "h", "fmt", "layer", "cell_id"],
        )

    return (
        keyed.select("layer", "__dst_cell", "cell_id", "bytes", "w", "h", "fmt")
        .groupBy("layer", "__dst_cell")
        .applyInPandas(assemble, schema)
    )


def reproject_bilinear(
    images: DataFrame,
    src_grid: str,
    dst_grid: str,
    fill: float = 0,
) -> DataFrame:
    """``gdalwarp -r bilinear``: re-tile onto ``dst_grid`` with each
    destination pixel the bilinearly weighted average of the 4 source
    pixel centers around it. Same one-shuffle plan as
    :func:`reproject_nearest` plus a HALO: a source tile on its
    destination cell's border is ALSO shipped to the adjacent
    destination group(s) (corner tiles to 3), so interpolation across
    destination-cell seams uses the true neighbor pixels — no per-chunk
    edge artifacts; duplication factor is (k+1)^2/k^2. Where the halo
    pixel's source tile is absent (corpus edge / missing tile), the
    mosaic edge replicates (per-axis clamp — `gdalwarp`'s source-extent
    edge behavior); missing interior tiles fill with ``fill``, the
    engine's standard missing-tile tolerance.

    EXACT-INTEGER interpolation: with rational grids the fractional
    position of a destination center between source centers is
    A/den with ``A = (2*dst_px + 1)*num - den//2`` (int64), so the
    4-corner weighted sum is computed as an int64 NUMERATOR over den^2
    and divided exactly once — a DuckDB twin regenerates every output
    pixel bit-for-bit (through the final float32). Float sources
    (``raw_f32``) interpolate on a float64 canvas with the same integer
    weights — no truncation, NaN holes propagate — so chained re-grids
    of this operator's own output are exact too. Output tiles are
    ``raw_f32``."""
    src, dst = G.get_grid(src_grid), G.get_grid(dst_grid)
    ratio = dst.tile_deg / src.tile_deg
    k = int(round(ratio))
    if abs(ratio - k) > 1e-9 or k < 1:
        raise ValueError("dst cell must be an integer multiple of src cell")
    from ..sources.images import with_derived_keys

    if "cell_id" not in images.columns or "layer" not in images.columns:
        images = with_derived_keys(images)

    cs, cd = src.chunk_px, dst.chunk_px
    num = dst.degrees * src.pixels
    den = 2 * dst.pixels * src.degrees
    if int(num) != num or int(den) != den or int(den) % 2:
        raise ValueError("grid degrees/pixels must be integers, den even")
    num, den = int(num), int(den)
    half = den // 2
    xb, yb = G._X_BITS, G._Y_BITS
    mask = G._XY_MASK

    sx = F.shiftright("cell_id", yb).bitwiseAND(F.lit(mask))
    sy = F.col("cell_id").bitwiseAND(F.lit(mask))
    dxc, dyc = (sx / k).cast("long"), (sy / k).cast("long")
    rx, ry = sx - dxc * F.lit(k), sy - dyc * F.lit(k)
    hi_bits = F.lit(int(dst.index)).cast("long") * F.lit(1 << (xb + yb))

    def _pack(ddx, ddy):
        return hi_bits + F.shiftleft(ddx, yb) + ddy

    cands = [F.struct(_pack(dxc, dyc).alias("c"), F.lit(True).alias("own"))]
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            if ox == 0 and oy == 0:
                continue
            on_border = F.lit(True)
            if ox == -1:
                on_border = on_border & (rx == 0)
            if ox == 1:
                on_border = on_border & (rx == k - 1)
            if oy == -1:
                on_border = on_border & (ry == 0)
            if oy == 1:
                on_border = on_border & (ry == k - 1)
            tx, ty = dxc + ox, dyc + oy
            in_grid = (
                (tx >= 0) & (tx < dst.nx) & (ty >= 0) & (ty < dst.ny)
            )
            cands.append(
                F.when(
                    on_border & in_grid,
                    F.struct(_pack(tx, ty).alias("c"), F.lit(False).alias("own")),
                ).otherwise(F.lit(None))
            )
    keyed = (
        images.withColumn(
            "__t", F.explode(F.filter(F.array(*cands), lambda c: c.isNotNull()))
        )
        .withColumn("__dst_cell", F.col("__t.c"))
        .withColumn("__own", F.col("__t.own"))
        .drop("__t")
    )

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "layer string, cell_id long"
    )
    kcs = k * cs

    def assemble(key, pdf):
        layer, dst_cell = str(key[0]), int(key[1])
        if not bool(pdf["__own"].any()):
            # halo-only group: this destination cell has no source data
            return pd.DataFrame(
                columns=["image_id", "bytes", "w", "h", "fmt", "layer", "cell_id"]
            )
        dx, dy = (int(v) for v in G.cell_to_xy(dst_cell))
        tiles = [
            (
                int(r.cell_id),
                codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt)),
            )
            for r in pdf.itertuples(index=False)
        ]
        # int64 canvas keeps the integer-numerator path bit-exact for the
        # DuckDB twin; float sources get a float64 canvas (no truncation,
        # and no sentinel value that could collide with real pixels — an
        # explicit unset mask tracks the halo ring instead).
        is_float = any(np.issubdtype(a.dtype, np.floating) for _, a in tiles)
        ctype = np.float64 if is_float else np.int64
        canvas = np.full((kcs + 2, kcs + 2), fill if is_float else int(fill),
                         dtype=ctype)
        unset = np.ones((kcs + 2, kcs + 2), dtype=bool)
        unset[1:-1, 1:-1] = False  # missing interior tiles keep `fill`
        for cell_id, arr in tiles:
            tx, ty = (int(v) for v in G.cell_to_xy(cell_id))
            relx, rely = tx - dx * k, ty - dy * k
            y0, x0 = 1 + rely * cs, 1 + relx * cs
            ys, ye = max(0, y0), min(kcs + 2, y0 + cs)
            xs, xe = max(0, x0), min(kcs + 2, x0 + cs)
            if ys < ye and xs < xe:
                canvas[ys:ye, xs:xe] = arr[ys - y0:ye - y0, xs - x0:xe - x0]
                unset[ys:ye, xs:xe] = False
        # unfilled halo cells replicate the clamped interior (per-axis)
        if unset.any():
            iy, ix = np.nonzero(unset)
            canvas[iy, ix] = canvas[np.clip(iy, 1, kcs), np.clip(ix, 1, kcs)]

        jj = np.arange(cd, dtype=np.int64)
        ax = (2 * (dx * cd + jj) + 1) * num - half
        ay = (2 * (dy * cd + jj) + 1) * num - half
        p0x = ax // den - dx * kcs  # local src px of the left neighbor
        p0y = ay // den - dy * kcs
        wx1, wy1 = ax % den, ay % den
        wx0, wy0 = den - wx1, den - wy1
        cx0 = np.clip(p0x + 1, 0, kcs + 1)     # canvas indices
        cx1 = np.clip(p0x + 2, 0, kcs + 1)
        cy0 = np.clip(p0y + 1, 0, kcs + 1)
        cy1 = np.clip(p0y + 2, 0, kcs + 1)
        v00 = canvas[np.ix_(cy0, cx0)]
        v01 = canvas[np.ix_(cy0, cx1)]
        v10 = canvas[np.ix_(cy1, cx0)]
        v11 = canvas[np.ix_(cy1, cx1)]
        numer = (
            v00 * (wy0[:, None] * wx0[None, :])
            + v01 * (wy0[:, None] * wx1[None, :])
            + v10 * (wy1[:, None] * wx0[None, :])
            + v11 * (wy1[:, None] * wx1[None, :])
        )
        out = (numer.astype(np.float64) / float(den * den)).astype(np.float32)
        payload = codecs.encode_tile(np.ascontiguousarray(out), "raw_f32")
        return pd.DataFrame(
            [(f"{layer}/{dst_cell:016x}", payload, cd, cd, "raw_f32",
              layer, dst_cell)],
            columns=["image_id", "bytes", "w", "h", "fmt", "layer", "cell_id"],
        )

    return (
        keyed.select(
            "layer", "__dst_cell", "__own", "cell_id", "bytes", "w", "h", "fmt"
        )
        .groupBy("layer", "__dst_cell")
        .applyInPandas(assemble, schema)
    )
