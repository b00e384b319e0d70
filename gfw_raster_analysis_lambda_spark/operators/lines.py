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
from .spatial_join import (
    PAIR_BROADCAST_WKB_BYTES,
    broadcast_fits,
    broadcast_fits_many,
)


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

    ga = aoi_df.select("aoi_id", F.col("geom_wkb").alias("wkb_aoi"))
    gl = lines_df.select("line_id", F.col("geom_wkb").alias("wkb_line"))
    fits_aoi, fits_lines = broadcast_fits_many(
        [aoi_df, lines_df], broadcast_bytes_limit
    )
    pairs = cand.join(F.broadcast(ga) if fits_aoi else ga, "aoi_id").join(
        F.broadcast(gl) if fits_lines else gl, "line_id"
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


def snap_points_to_lines(
    points: DataFrame,  # (point_id string, lon double, lat double)
    lines_df: DataFrame,  # (line_id string, geom_wkb binary)
    radius_deg: float,
    grid_name: str,
    broadcast_bytes_limit: int = PAIR_BROADCAST_WKB_BYTES,
) -> DataFrame:
    """Snap each point to its nearest polyline within ``radius_deg``
    (map-matching's first half: GPS pings -> road network). Returns
    ``(point_id, line_id, dist2, snap_lon, snap_lat)`` — the winning
    line, the exact squared planar distance, and the foot of the
    perpendicular (clamped to the segment) — one row per point that has
    a line in range. Ties break to the lowest (line_id, segment index).

    Plan: points bucket to cells (pure Catalyst bit arithmetic) and
    explode their (2r+1)^2 Chebyshev neighborhood; lines enumerate their
    supercover cells; ONE equi-join proposes candidates — complete,
    because the nearest on-line point within the radius lies in a
    neighborhood cell the line's supercover contains. The exact
    point-segment distance is pure IEEE +,-,*,/ with a LEAST/GREATEST
    clamp, evaluated in the same operation order as the ANSI-SQL twin,
    so both engines compute the IDENTICAL doubles — no rounding in the
    contract."""
    import math

    import numpy as np

    from .spatial_join import cell_expr

    grid = G.get_grid(grid_name)
    ring = max(int(math.ceil(float(radius_deg) / grid.tile_deg)), 0)
    xb, yb = G._X_BITS, G._Y_BITS
    pts = points.select(
        "point_id", "lon", "lat",
        cell_expr(grid, F.col("lon"), F.col("lat")).alias("__cell"),
    )
    x = F.shiftright("__cell", yb).bitwiseAND(F.lit(G._XY_MASK))
    y = F.col("__cell").bitwiseAND(F.lit(G._XY_MASK))
    hi = F.lit(int(grid.index) << (xb + yb)).cast("long")
    neighbors = F.array(*[
        hi + F.shiftleft(x + dx, yb) + (y + dy)
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
    ])
    cand = (
        pts.select("point_id", "lon", "lat", F.explode(neighbors).alias("cell_id"))
        .join(
            line_cells(lines_df.select("line_id", "geom_wkb"), grid_name)
            .select("line_id", "cell_id"),
            "cell_id",
        )
        .select("point_id", "lon", "lat", "line_id")
        .distinct()
    )
    gl = lines_df.select("line_id", F.col("geom_wkb").alias("wkb_line"))
    fits = broadcast_fits(lines_df, broadcast_bytes_limit)
    pairs = cand.join(F.broadcast(gl) if fits else gl, "line_id")

    @F.pandas_udf("struct<dist2: double, snap_lon: double, snap_lat: double>")
    def nearest(wl: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        d2o, qxo, qyo = [], [], []
        for wkb, px, py in zip(wl, lon, lat):
            e = geo.line_edges(geo.wkb_loads_lines(bytes(wkb)))
            x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
            dx, dy = x2 - x1, y2 - y1
            ll = dx * dx + dy * dy
            with np.errstate(divide="ignore", invalid="ignore"):
                t = ((px - x1) * dx + (py - y1) * dy) / ll
            tc = np.minimum(1.0, np.maximum(0.0, t))
            # zero-length segments: distance to the vertex itself
            tc = np.where(ll == 0.0, 0.0, tc)
            qx, qy = x1 + tc * dx, y1 + tc * dy
            ddx, ddy = px - qx, py - qy
            d2 = ddx * ddx + ddy * ddy
            si = int(np.argmin(d2))  # first minimum = lowest segment index
            d2o.append(float(d2[si]))
            qxo.append(float(qx[si]))
            qyo.append(float(qy[si]))
        return pd.DataFrame({"dist2": d2o, "snap_lon": qxo, "snap_lat": qyo})

    from pyspark.sql import Window

    r2 = float(radius_deg) * float(radius_deg)
    w = Window.partitionBy("point_id").orderBy(
        F.asc("dist2"), F.asc("line_id")
    )
    return (
        pairs.withColumn("nn", nearest(F.col("wkb_line"), F.col("lon"), F.col("lat")))
        .select(
            "point_id", "line_id",
            F.col("nn.dist2").alias("dist2"),
            F.col("nn.snap_lon").alias("snap_lon"),
            F.col("nn.snap_lat").alias("snap_lat"),
        )
        .filter(F.col("dist2") <= F.lit(r2))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
