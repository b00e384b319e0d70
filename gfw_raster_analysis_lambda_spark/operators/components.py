"""Connected components over cell sets: spatial clustering of raster
phenomena (e.g. grouping alert cells into contiguous events).

The reference reports per-AOI aggregates only; clustering contiguous
alert regions is the standard downstream ask, and it is the one operator
class here that is genuinely ITERATIVE. Spark shape: hash-to-min label
propagation — each round every cell takes the minimum label in its
closed neighborhood, all as relational joins (adjacency from pure
Catalyst bit arithmetic on the packed cell id, NEVER a materialized
all-pairs set), iterated to a fixpoint with an early-stop count.

Rounds needed = graph diameter in the worst case (a long snake), which
is fine for the compact blobs raster clustering produces. For
adversarial diameters swap in pointer-jumping (label -> label joins,
O(log n) rounds) — the per-round plan is identical, so the physical
story does not change.

DuckDB oracle twin: recursive reachability CTE + MIN over reached
(driver contract query ``cc_alert_cells``) — same labels, engine-
independent."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import grid as G


def cell_adjacency(cells: DataFrame, diagonal: bool = True) -> DataFrame:
    """Directed adjacency (a, b) between cells of the input set whose
    packed (x, y) coordinates differ by at most 1 (8- or 4-neighborhood).
    Built by exploding each cell into its neighbor ids (pure Catalyst bit
    arithmetic) and semi-joining back on the set — O(cells x 8) rows, no
    cross join."""
    xb, yb = G._X_BITS, G._Y_BITS
    offsets = [
        (dx, dy)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0) and (diagonal or dx == 0 or dy == 0)
    ]
    c = cells.select(F.col("cell_id").cast("long")).distinct()
    neigh = c.select(
        "cell_id",
        F.explode(
            F.array(*[
                F.col("cell_id") + F.lit((dx << yb) + dy) for dx, dy in offsets
            ])
        ).alias("nbr"),
    )
    # keep only neighbors that exist in the set (also drops x/y underflow
    # artifacts: a wrapped id is not a member)
    return neigh.join(
        c.withColumnRenamed("cell_id", "nbr"), "nbr", "left_semi"
    ).select(F.col("cell_id").alias("a"), F.col("nbr").alias("b"))


def connected_cell_components(
    cells: DataFrame,
    diagonal: bool = True,
    max_iter: int = 30,
) -> DataFrame:
    """(cell_id, component): component = min cell_id reachable through
    the adjacency graph. Hash-to-min iterated until no label changes
    (early-stop count per round) or ``max_iter``."""
    spark = cells.sparkSession
    edges = cell_adjacency(cells, diagonal).persist()
    labels = (
        cells.select(F.col("cell_id").cast("long")).distinct()
        .withColumn("component", F.col("cell_id"))
        .persist()
    )
    labels.count()
    for _ in range(max_iter):
        prop = edges.join(
            labels, edges.a == labels.cell_id
        ).select(F.col("b").alias("cell_id"), "component")
        new = (
            labels.select("cell_id", "component").unionByName(prop)
            .groupBy("cell_id")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "cell_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("cell_id", "component")
