"""Line x polygon overlay: length-in-AOI zonal statistics.

The engine's third vector type. The reference analyzes polygons against
rasters only; real GFW-adjacent products also ask linear questions —
"km of roads / rivers inside each admin area / concession" — which is a
line x polygon overlay, not a rasterization (a road thinner than a pixel
still has exact length). Spark shape mirrors the polygon overlay join:

    lines -> covering cells (supercover enumeration, Arrow UDF)
    AOIs  -> covering cells (the zonal planner's aoi_cells)
    cell equi-join proposes candidate (line, AOI) pairs — COMPLETE,
      because any point of line ∩ AOI lies in a cell both enumerate —
    exact clip length per candidate in one Arrow pass
    (functions.geometry.line_length_in_region: split at every boundary
    crossing, classify piece midpoints, closed-region semantics).

Never a cross join; geometry re-attach uses the same broadcast-vs-
shuffle probe as polygon_pairs. Output is pair-grain (aoi_id, line_id,
length) — totals are one tiny aggregation away.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geometry as geo
from ..functions import grid as G
from ..plans.planner import aoi_cells
from .spatial_join import PAIR_BROADCAST_ROW_LIMIT, PAIR_BROADCAST_WKB_BYTES


def line_cells(lines_df: DataFrame, grid_name: str) -> DataFrame:
    """(line_id, geom_wkb) -> one row per covering cell, the line twin
    of the planner's ``aoi_cells``."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cells_of(geoms: pd.Series) -> pd.Series:
        grid = G.get_grid(grid_name)
        out = []
        for wkb in geoms:
            cells = G.line_to_cells(grid, geo.wkb_loads_lines(bytes(wkb)))
            out.append(cells.tolist())
        return pd.Series(out)

    return lines_df.withColumn("cell_id", F.explode(cells_of("geom_wkb")))


def line_zonal(
    lines_df: DataFrame,  # (line_id string, geom_wkb binary) — MULTILINESTRING WKB
    aoi_df: DataFrame,  # (aoi_id string, geom_wkb binary)
    grid_name: str,
    broadcast_bytes_limit: int = PAIR_BROADCAST_WKB_BYTES,
) -> DataFrame:
    """Planar length of each line inside each AOI (closed even-odd
    region — a road riding an admin border still counts), one row per
    intersecting ``(aoi_id, line_id)`` pair with ``length_deg`` > 0.
    Degree units on the lon/lat plane; callers scale to metric with the
    geodesy helpers. Cost: O(covering cells) join rows + one exact clip
    per candidate pair."""
    lc = line_cells(lines_df.select("line_id", "geom_wkb"), grid_name).select(
        "line_id", "cell_id"
    )
    ac = aoi_cells(aoi_df, grid_name).select("aoi_id", "cell_id")
    cand = lc.join(ac, "cell_id").select("aoi_id", "line_id").distinct()

    def _fits(df: DataFrame) -> bool:
        s = df.select(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.length("geom_wkb")), F.lit(0)).alias("b"),
        ).collect()[0]
        return s["n"] <= PAIR_BROADCAST_ROW_LIMIT and s["b"] <= broadcast_bytes_limit

    ga = aoi_df.select("aoi_id", F.col("geom_wkb").alias("wkb_aoi"))
    gl = lines_df.select("line_id", F.col("geom_wkb").alias("wkb_line"))
    pairs = cand.join(F.broadcast(ga) if _fits(aoi_df) else ga, "aoi_id").join(
        F.broadcast(gl) if _fits(lines_df) else gl, "line_id"
    )

    @F.pandas_udf("double")
    def clip_len(wl: pd.Series, wa: pd.Series) -> pd.Series:
        return pd.Series([
            geo.line_length_in_region(
                geo.wkb_loads_lines(bytes(l)), geo.wkb_loads(bytes(a))
            )
            for l, a in zip(wl, wa)
        ])

    return (
        pairs.withColumn("length_deg", clip_len(F.col("wkb_line"), F.col("wkb_aoi")))
        .filter(F.col("length_deg") > 0.0)
        .select("aoi_id", "line_id", "length_deg")
    )
