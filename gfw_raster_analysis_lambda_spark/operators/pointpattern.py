"""Point-pattern statistics: Ripley's K, the empirical semivariogram,
and kernel-density rasterization — the classic spatial-statistics trio
(Ripley 1976; Matheron 1963; Silverman 1986), built on the engine's
cell-bucketed range join instead of the kd-trees a single-node stack
would use.

The reference has no point-pattern module (its unit of analysis is the
polygon, reference geoprocessing.py); these extend the beyond-reference
geospatial surface the same way Moran's I / Getis-Ord did for rasters:
every statistic decomposes into exact integer (or exact-IEEE double)
accumulators so the DuckDB contract twins are hash-exact, and every
plan is the one you'd want at 10^12 points:

- ``ripley_k``      ONE range join at max(radii), then a conditional-sum
                    re-read of the pair set per radius — never one join
                    per radius, never all-pairs.
- ``semivariogram`` the same range join with the value column carried
                    through (``carry=``), so no join-back to the point
                    table; per-lag-bin sums are exact int64.
- ``kde_cells``     a bounded (2R+1)^2 splat + ONE groupBy(cell) — the
                    scatter formulation of KDE (each point writes its
                    kernel footprint) rather than the gather one (each
                    cell searches for points), because scatter is an
                    equi-shuffle and gather is a range join per cell.

Distances are planar squared degrees (dx*dx + dy*dy on exact binary-
fraction coordinates): pure IEEE +,-,* both engines compute bit-equal.
``sqrt`` is IEEE-754 correctly rounded in both the JVM and DuckDB, so
``floor(sqrt(dist2) / w)`` lag-binning is also engine-exact when ``w``
is a binary fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import grid as G
from . import spatial_join


def ripley_k(
    points: DataFrame,
    radii: "list[float]",
    grid_name: str,
    area: float,
    id_col: str = "image_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Ripley's K function: for each radius r, the count of unordered
    point pairs within r and the estimator
    ``K_hat(r) = area * 2 * pairs(r) / (n * (n - 1))`` (Ripley 1976,
    border-uncorrected form). Under complete spatial randomness
    K_hat(r) ~ pi*r^2; excess indicates clustering at that scale.

    ONE range join at max(radii) produces the pair set; each smaller
    radius is a conditional count over it (a pair within r is within
    max(radii) by definition), so the cost is one equi-join regardless
    of how many radii are probed. Zero-pair radii still emit a row.

    Returns (radius, pair_count, k_hat) — pair_count exact int64,
    k_hat rounded to 6 (one float divide of exact integers).
    """
    rs = sorted(float(r) for r in radii)
    if not rs or rs[0] <= 0.0:
        raise ValueError("radii must be positive")
    pairs = spatial_join.geo_distance_pairs(
        points, rs[-1], grid_name, id_col, lon_col, lat_col
    )
    hits = pairs.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("radius"),
                    (F.col("dist2") <= F.lit(r * r)).cast("long").alias("__hit"),
                )
                for r in rs
            ])
        ).alias("s")
    ).select("s.radius", "s.__hit")
    counts = hits.groupBy("radius").agg(F.sum("__hit").alias("pair_count"))
    base = points.sparkSession.createDataFrame(
        [(r,) for r in rs], "radius double"
    )
    n = points.agg(F.count(F.lit(1)).alias("__n"))
    return (
        base.join(counts, "radius", "left")
        .withColumn("pair_count", F.coalesce("pair_count", F.lit(0).cast("long")))
        .crossJoin(F.broadcast(n))
        .select(
            "radius",
            "pair_count",
            F.round(
                F.lit(float(area)) * (F.col("pair_count") * 2).cast("double")
                / (F.col("__n") * (F.col("__n") - 1)).cast("double"),
                6,
            ).alias("k_hat"),
        )
        .orderBy("radius")
    )


def semivariogram(
    points: DataFrame,
    value_col: str,
    max_lag: float,
    n_bins: int,
    grid_name: str,
    id_col: str = "image_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Empirical (Matheron) semivariogram: pair the points within
    ``max_lag``, bin by lag distance into ``n_bins`` equal rings of
    width ``w = max_lag / n_bins``, and per bin report
    ``gamma(h) = sum((z_a - z_b)^2) / (2 * n_pairs)`` — the structure
    function kriging fits its model to.

    ``w`` must be a binary fraction for the contract gate (floor(sqrt/w)
    is then engine-exact; see module docstring). Values are integer
    (curation scores, alert counts, DN values): the squared-difference
    sums accumulate as exact int64 and gamma is one float divide.

    The value column rides the range join via ``carry=`` — no second
    join back to the point table, so the whole statistic is ONE
    equi-shuffle plus an O(n_bins)-row aggregate. Empty bins emit
    (n_pairs=0, gamma NULL). Returns
    (lag_bin, lag_lo, n_pairs, sq_diff_sum, gamma).
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    w = float(max_lag) / int(n_bins)
    pairs = spatial_join.geo_distance_pairs(
        points, float(max_lag), grid_name, id_col, lon_col, lat_col,
        carry=(value_col,),
    )
    lag_bin = F.least(
        F.floor(F.sqrt("dist2") / F.lit(w)), F.lit(int(n_bins) - 1)
    ).cast("int")
    d = (
        F.col(f"a_{value_col}").cast("long")
        - F.col(f"b_{value_col}").cast("long")
    )
    binned = (
        pairs.select(lag_bin.alias("lag_bin"), (d * d).alias("__sq"))
        .groupBy("lag_bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("__sq").alias("sq_diff_sum"),
        )
    )
    base = points.sparkSession.createDataFrame(
        [(b,) for b in range(int(n_bins))], "lag_bin int"
    )
    return (
        base.join(binned, "lag_bin", "left")
        .select(
            "lag_bin",
            F.round(F.col("lag_bin") * F.lit(w), 6).alias("lag_lo"),
            F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
            F.coalesce("sq_diff_sum", F.lit(0).cast("long")).alias("sq_diff_sum"),
            F.round(
                F.col("sq_diff_sum").cast("double")
                / (F.col("n_pairs") * 2).cast("double"),
                6,
            ).alias("gamma"),
        )
        .orderBy("lag_bin")
    )


def kde_cells(
    points: DataFrame,
    radius_cells: int,
    grid_name: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Kernel-density rasterization: splat every point onto the grid
    cells within ``radius_cells`` (Chebyshev-bounded, Euclidean-gated)
    with an integer Epanechnikov-shaped weight
    ``w(dx, dy) = R^2 + 1 - (dx^2 + dy^2)`` — center weighs R^2+1, the
    rim weighs 1, outside the disc contributes nothing. Integer weights
    make the density surface exact (the real Epanechnikov kernel is a
    scaled version of this discrete profile; callers needing the
    normalized float surface divide by the constant kernel mass once,
    after aggregation).

    Scatter formulation: each point explodes its O(R^2) footprint (pure
    Catalyst arithmetic on the floor-divided cell coordinates — no
    Python, no join), then ONE groupBy((x, y)) sums contributions. At
    10^12 points this is a single bounded-fanout equi-shuffle of
    (long, long, long) rows; the gather alternative (range join per
    cell) would shuffle the point table once per output ring.

    Returns (x, y, n_contrib, density): row-major cell coordinates of
    the grid (x east from -180, y south from +90 — grid.py:21), the
    number of contributing points, and the integer density sum.
    """
    grid = G.get_grid(grid_name)
    R = int(radius_cells)
    if R < 0:
        raise ValueError("radius_cells must be >= 0")
    offs = [
        (dx, dy, R * R + 1 - dx * dx - dy * dy)
        for dx in range(-R, R + 1)
        for dy in range(-R, R + 1)
        if dx * dx + dy * dy <= R * R
    ]
    x = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(grid.tile_deg)).cast("long")
    y = F.floor((F.lit(90.0) - F.col(lat_col)) / F.lit(grid.tile_deg)).cast("long")
    splat = points.select(
        F.explode(
            F.array(*[
                F.struct(
                    (x + F.lit(dx)).alias("x"),
                    (y + F.lit(dy)).alias("y"),
                    F.lit(int(wgt)).cast("long").alias("__w"),
                )
                for dx, dy, wgt in offs
            ])
        ).alias("s")
    ).select("s.*")
    return splat.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("n_contrib"),
        F.sum("__w").alias("density"),
    )
