"""Tile-pyramid overview builder: aggregate fine-grid tiles into coarser
grid levels (the COG/`gdaladdo` overview step, and the inverse of the
finest-grid co-registration upsample in functions.grid.upsample_to_cell).

The reference serves pre-built raster pyramids and co-registers by
upsampling at query time (reference query.py:196-210, window.py:96-101);
building the coarser levels from the base level is the companion
write-side job. Spark shape: derive each tile's parent cell id with pure
bit arithmetic (one Catalyst projection), ``groupBy(layer, parent)`` and
assemble+reduce each parent window in an Arrow-batched kernel. The
shuffle carries each tile's bytes exactly once, grouped k^2-to-1 — the
natural tree reduction; chaining calls builds the full pyramid in
log(levels) jobs.

Reduction methods (GDAL resampling names):
- ``mean``: block average, truncated back to the integer dtype
  (FLOOR(AVG) — matches multimodal.resize_tiles); NaN-skipping for float
  layers (all-NaN blocks stay NaN, the raster NoData convention).
- ``nearest``: top-left sample of each block (categorical layers).
- ``max``: block maximum (presence/alert layers).
"""

from __future__ import annotations

import warnings
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs
from ..functions import grid as G

_METHODS = ("mean", "nearest", "max")


def parent_cell_col(src: G.Grid, dst: G.Grid):
    """Catalyst expression: parent cell id on ``dst`` of a ``cell_id`` on
    ``src`` (integer-divide the packed (x, y) by the cell ratio)."""
    k = _cell_ratio(src, dst)
    xb, yb = G._X_BITS, G._Y_BITS
    x = F.shiftright(F.col("cell_id"), yb).bitwiseAND(F.lit((1 << xb) - 1))
    y = F.col("cell_id").bitwiseAND(F.lit((1 << yb) - 1))
    base = F.lit(dst.index << (xb + yb))
    # `/` on Columns is FLOAT division in Spark SQL; subtract the modulo
    # first so the quotient is exact, then cast back to long
    px = ((x - x % k) / k).cast("long")
    py = ((y - y % k) / k).cast("long")
    return base + F.shiftleft(px, yb) + py


def _cell_ratio(src: G.Grid, dst: G.Grid) -> int:
    k = dst.tile_deg / src.tile_deg
    if abs(k - round(k)) > 1e-9 or round(k) < 1:
        raise ValueError(f"{dst.name} cells must be an integer multiple of {src.name} cells")
    return int(round(k))


def build_overviews(
    images: DataFrame,  # (layer, cell_id, bytes, w, h, fmt) on src grid
    src_grid_name: str,
    dst_grid_name: str,
    method: str = "mean",
) -> DataFrame:
    """One overview level: tiles on ``src_grid_name`` -> tiles on the
    coarser ``dst_grid_name``. Missing child tiles zero-fill their window
    (S2 missing-tile convention; NaN for float layers so ``mean`` does not
    dilute real data with synthetic zeros)."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}")
    src, dst = G.get_grid(src_grid_name), G.get_grid(dst_grid_name)
    k = _cell_ratio(src, dst)
    if (k * src.chunk_px) % dst.chunk_px != 0:
        raise ValueError(
            f"window {k}x{src.chunk_px}px does not divide into {dst.chunk_px}px tiles"
        )
    f = (k * src.chunk_px) // dst.chunk_px
    chunk = src.chunk_px

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        layer = str(pdf["layer"].iloc[0])
        parent = int(pdf["parent_cell"].iloc[0])
        px, py = (int(v) for v in G.cell_to_xy(parent))
        fmt = str(pdf["fmt"].iloc[0])
        canvas = None
        for r in pdf.itertuples(index=False):
            arr = codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt)
                                     )
            if canvas is None:
                fill = np.nan if arr.dtype.kind == "f" else 0
                canvas = np.full((k * chunk, k * chunk), fill, dtype=arr.dtype)
            cx, cy = (int(v) for v in G.cell_to_xy(int(r.cell_id)))
            row0, col0 = (cy - py * k) * chunk, (cx - px * k) * chunk
            canvas[row0:row0 + chunk, col0:col0 + chunk] = arr
        blocks = canvas.reshape(dst.chunk_px, f, dst.chunk_px, f)
        if method == "nearest":
            out = canvas[::f, ::f]
        elif method == "max":
            out = blocks.max(axis=(1, 3))
        elif canvas.dtype.kind == "f":
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN blocks
                out = np.nanmean(blocks, axis=(1, 3)).astype(canvas.dtype)
        else:
            out = np.floor(blocks.mean(axis=(1, 3))).astype(canvas.dtype)
        payload = codecs.encode_tile(np.ascontiguousarray(out), fmt)
        return pd.DataFrame({
            "image_id": [f"{layer}/{parent:016x}"],
            "layer": [layer],
            "cell_id": np.array([parent], dtype=np.int64),
            "bytes": [payload],
            "w": np.array([dst.chunk_px], dtype=np.int32),
            "h": np.array([dst.chunk_px], dtype=np.int32),
            "fmt": [fmt],
        })

    tiles = images.select("layer", "cell_id", "bytes", "w", "h", "fmt").withColumn(
        "parent_cell", parent_cell_col(src, dst)
    )
    return tiles.groupBy("layer", "parent_cell").applyInPandas(
        assemble,
        "image_id string, layer string, cell_id long, bytes binary, w int, h int, fmt string",
    )


def choose_overview_grid(
    aoi_df: DataFrame,
    candidate_grids: list[str],
    min_pixels: int = 10_000,
) -> str:
    """Resolution-aware query routing over a tile pyramid: the coarsest
    candidate grid at which the SMALLEST AOI of the batch still covers at
    least ``min_pixels`` pixels (by bbox area). Tile servers and map-algebra
    engines route zoomed-out queries to overview levels for exactly this
    reason — a country-scale AOI over 30 m pixels reads ~10^12 px at base
    level but ~10^8 at a 100x coarser overview, with sub-percent error on
    area aggregates. Falls back to the finest candidate."""
    from ..functions import geometry as geo

    @F.pandas_udf("double")
    def bbox_area(wkbs: pd.Series) -> pd.Series:
        out = []
        for w in wkbs:
            minx, miny, maxx, maxy = geo.bounds(geo.wkb_loads(bytes(w)))
            out.append(max(maxx - minx, 0.0) * max(maxy - miny, 0.0))
        return pd.Series(out)

    min_area = aoi_df.select(F.min(bbox_area("geom_wkb")).alias("a")).collect()[0]["a"]
    if min_area is None:
        return min(candidate_grids, key=lambda g: G.get_grid(g).pixel_size)
    for name in sorted(candidate_grids, key=lambda g: -G.get_grid(g).pixel_size):
        ps = G.get_grid(name).pixel_size
        if min_area / (ps * ps) >= min_pixels:
            return name
    return min(candidate_grids, key=lambda g: G.get_grid(g).pixel_size)


def touched_parent_overviews(
    base_images: DataFrame,  # the CURRENT base level (must include the batch)
    batch: DataFrame,        # newly arrived/changed tiles (layer, cell_id, ...)
    src_grid_name: str,
    dst_grid_name: str,
    method: str = "mean",
) -> DataFrame:
    """Incremental overview maintenance: recompute ONLY the parent tiles
    whose windows a batch of new/changed base tiles touched. Work is
    O(touched parents), not O(corpus) — the streaming-ingest companion to
    :func:`build_overviews` (call from ``foreachBatch`` and overwrite the
    affected parent partitions; parent recompute is idempotent, so replays
    are exact). The touched-parent set of a micro-batch is small by
    construction and broadcasts."""
    src, dst = G.get_grid(src_grid_name), G.get_grid(dst_grid_name)
    touched = batch.select(
        "layer", parent_cell_col(src, dst).alias("_p")
    ).distinct()
    scoped = (
        base_images.withColumn("_p", parent_cell_col(src, dst))
        .join(F.broadcast(touched), ["layer", "_p"], "left_semi")
        .drop("_p")
    )
    return build_overviews(scoped, src_grid_name, dst_grid_name, method)


def tile_diff(
    images: DataFrame,
    layer_a: str,
    layer_b: str,
    images_b: DataFrame | None = None,
) -> DataFrame:
    """Per-cell change detection between two raster layers (or two
    VERSIONS of one layer when ``images_b`` carries the second snapshot):
    ``(cell_id, n_px, n_diff, mean_abs_diff, max_abs_diff)``.

    The raster-version diff job (what changed between two corpus drops) as
    one equi-join on cell_id + an Arrow kernel — tile bytes cross the wire
    once per side, stats are O(cells) rows. NaN pixels (float NoData)
    count as different from any value except another NaN."""
    a = images.filter(F.col("layer") == layer_a).select(
        "cell_id", F.col("bytes").alias("bytes_a"), F.col("w").alias("w_a"),
        F.col("h").alias("h_a"), F.col("fmt").alias("fmt_a"),
    )
    bsrc = images if images_b is None else images_b
    b = bsrc.filter(F.col("layer") == layer_b).select(
        "cell_id", F.col("bytes").alias("bytes_b"), F.col("w").alias("w_b"),
        F.col("h").alias("h_b"), F.col("fmt").alias("fmt_b"),
    )

    def diff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                va = codecs.decode_tile(bytes(r.bytes_a), int(r.w_a), int(r.h_a), str(r.fmt_a)).astype(np.float64)
                vb = codecs.decode_tile(bytes(r.bytes_b), int(r.w_b), int(r.h_b), str(r.fmt_b)).astype(np.float64)
                d = np.abs(va - vb)
                nan_a, nan_b = np.isnan(va), np.isnan(vb)
                changed = (d > 0) | (nan_a != nan_b)
                changed[nan_a & nan_b] = False
                finite = d[~(nan_a | nan_b)]
                rows.append((
                    int(r.cell_id), int(va.size), int(changed.sum()),
                    float(finite.mean()) if finite.size else 0.0,
                    float(finite.max()) if finite.size else 0.0,
                ))
            yield pd.DataFrame(
                rows, columns=["cell_id", "n_px", "n_diff", "mean_abs_diff", "max_abs_diff"]
            )

    return a.join(b, "cell_id").mapInPandas(
        diff,
        "cell_id long, n_px long, n_diff long, mean_abs_diff double, max_abs_diff double",
    )
