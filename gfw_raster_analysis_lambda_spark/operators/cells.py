"""Hierarchical cell-set compaction (the H3 ``compact_cells`` role).

The engine's spatial index is a flat fixed-resolution cell grid
(functions/grid.py): AOI covers, image-tile assignments, and kNN probes
are all sets of int64 cell ids at ONE resolution, exactly like the
reference's per-tile chunk lists (reference grid.py:33-51 enumerates every
fixed-degree chunk a geometry touches). At 10^12-image scale a
continent-sized AOI covered at the finest grid is O(area / fine_cell) ids
— tens of millions of rows that every downstream equi-join must carry.

``compact_cells`` applies the standard hierarchical fix (the public H3
``compactCells`` semantics): wherever ALL r x r children of a coarser,
grid-aligned cell are present, replace them by the parent, recursively up
a resolution ladder. Interior regions collapse by ~r^2 per level while the
boundary stays at fine resolution, so a cover shrinks from O(area) to
O(perimeter) at the fine grid plus O(area / coarsest_cell) parents.
``uncompact_cells`` is the exact inverse (every cell explodes to its
descendant set at the target grid), so ``uncompact(compact(S)) == S`` for
any single-resolution set S — pinned by tests and by the driver's oracle
gate.

Spark shape: one groupBy(parent) per ladder rung, each strictly smaller
than the last; complete groups emit the parent, incomplete groups re-emit
their children from the grouped array (collect_list is bounded by r^2 <=
16 here), so there is NO join-back and exactly one Exchange per level.
Everything is integer bit arithmetic on the packed (grid, x, y) codec —
pure Catalyst, mirrored 1:1 in the DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import grid as G

_XY_BITS = G._X_BITS  # x and y share the same width (27 bits)
_HDR_SHIFT = 2 * _XY_BITS


def _ratio(fine: G.Grid, coarse: G.Grid) -> int:
    """Integer side ratio fine-cells-per-coarse-cell; raises if the two
    grids do not nest exactly (same origin, integer multiple tile size)."""
    r = coarse.tile_deg / fine.tile_deg
    ri = int(round(r))
    if ri < 2 or abs(r - ri) > 1e-12:
        raise ValueError(
            f"grids {fine.name} -> {coarse.name} do not nest: ratio {r}"
        )
    return ri


def cell_xy(cell: Column) -> tuple[Column, Column]:
    x = F.shiftright(cell, _XY_BITS).bitwiseAND(F.lit(G._XY_MASK))
    y = cell.bitwiseAND(F.lit(G._XY_MASK))
    return x, y


def pack_cell(grid: G.Grid, x: Column, y: Column) -> Column:
    return (
        F.shiftleft(F.lit(grid.index).cast("long"), _HDR_SHIFT)
        .bitwiseOR(F.shiftleft(x.cast("long"), _XY_BITS))
        .bitwiseOR(y.cast("long"))
    )


def parent_cell_expr(fine: G.Grid, coarse: G.Grid, cell: Column) -> Column:
    """Packed id of the coarse cell containing ``cell`` (integer divide —
    both grids share the (-180, 90) origin so alignment is exact)."""
    r = _ratio(fine, coarse)
    x, y = cell_xy(cell)
    return pack_cell(coarse, (x / r).cast("long"), (y / r).cast("long"))


def compact_cells(
    df: DataFrame,
    levels: "list[str]",
    cell_col: str = "cell_id",
    materialize_rungs: bool = True,
) -> DataFrame:
    """Compact a single-resolution cell set up a resolution ladder.

    ``levels`` is grid names finest-first (e.g. ``["4/1024", "4/512",
    "1/250"]``); the input must be entirely at ``levels[0]``. Returns one
    ``cell_id`` column mixing resolutions: each id is at the coarsest
    grid whose cell was completely covered by the input.

    One Exchange per rung: groupBy(parent) with a bounded (<= r^2)
    collect_list, then either the parent id (complete) or the re-emitted
    children (incomplete). Incomplete groups exit the ladder immediately;
    only promoted parents — at most 1/r^2 of the previous rung — continue,
    so the shuffles shrink geometrically. No joins, no driver collects.

    Each rung's emission is referenced by TWO branches (the finished
    union and the next rung), so by default it is localCheckpoint-ed —
    the repo's standard per-round materialization for iterative
    operators (see components/bpe_train) — guaranteeing each rung's
    shuffle runs exactly once and the final plan holds exactly
    ``len(levels) - 1`` Exchanges regardless of AQE exchange-reuse
    behavior. ``materialize_rungs=False`` keeps the operator fully lazy
    (AQE reuse then dedupes the repeated subtrees at runtime).
    """
    grids = [G.get_grid(n) for n in levels]
    if len(grids) < 2:
        return df.select(F.col(cell_col).alias("cell_id"))
    done: "DataFrame | None" = None
    cur = df.select(F.col(cell_col).cast("long").alias("cell_id"))
    for fine, coarse in zip(grids, grids[1:]):
        r = _ratio(fine, coarse)
        parent = parent_cell_expr(fine, coarse, F.col("cell_id"))
        grouped = (
            cur.groupBy(parent.alias("__parent"))
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.collect_list("cell_id").alias("__kids"),
            )
        )
        emitted = grouped.select(
            F.explode(
                F.when(
                    F.col("__n") == r * r, F.array(F.col("__parent"))
                ).otherwise(F.col("__kids"))
            ).alias("cell_id"),
            (F.col("__n") == r * r).alias("__promoted"),
        )
        if materialize_rungs:
            emitted = emitted.localCheckpoint(eager=True)
        finished = emitted.filter(~F.col("__promoted")).select("cell_id")
        done = finished if done is None else done.unionByName(finished)
        cur = emitted.filter(F.col("__promoted")).select("cell_id")
    return cur if done is None else done.unionByName(cur)


def uncompact_cells(
    df: DataFrame,
    target: str,
    cell_col: str = "cell_id",
) -> DataFrame:
    """Explode a mixed-resolution cell set to ``target`` resolution —
    the exact inverse of :func:`compact_cells`. Each cell at a grid R x
    coarser than the target emits its R^2 descendants; cells already at
    the target pass through. Pure Catalyst (sequence/transform/flatten
    inside one projection, then explode) — zero shuffle."""
    tgt = G.get_grid(target)
    by_index = {g.index: g for g in G.GRIDS.values()}
    cell = F.col(cell_col).cast("long")
    gidx = F.shiftright(cell, _HDR_SHIFT)
    x, y = cell_xy(cell)

    def children(grid: G.Grid) -> Column:
        if grid.index == tgt.index:
            return F.array(cell)
        r = _ratio(tgt, grid)
        return F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(r - 1)),
                lambda dx: F.transform(
                    F.sequence(F.lit(0), F.lit(r - 1)),
                    lambda dy: pack_cell(tgt, x * r + dx, y * r + dy),
                ),
            )
        )

    guarded: "Column | None" = None
    for idx, grid in sorted(by_index.items()):
        try:
            arm = children(grid)
        except ValueError:
            continue  # grid does not nest over the target: no arm
        guarded = (
            F.when(gidx == idx, arm)
            if guarded is None
            else guarded.when(gidx == idx, arm)
        )
    if guarded is None:
        raise ValueError(f"no registered grid nests over target {target}")
    # cells at a grid with no arm (non-nesting index) hit the implicit
    # NULL default and are rejected loudly rather than silently dropped
    guarded = guarded.otherwise(
        F.raise_error(
            F.concat(
                F.lit("uncompact_cells: cell at non-nesting grid index "),
                gidx.cast("string"),
            )
        )
    )
    return df.select(F.explode(guarded).alias("cell_id"))


def buffer_cells(
    cells: DataFrame,
    radius: int,
    grid_name: str,
    cell_col: str = "cell_id",
    group_col: "str | None" = "aoi_id",
) -> DataFrame:
    """Buffered cell cover — the GIS *buffer* primitive at cell
    granularity (``ST_Buffer`` over an indexed cover; the H3
    ``gridDiskDistances`` role). For every input cell, emits all cells
    within chebyshev distance <= ``radius`` rings, tagged with ``ring``
    = the MINIMUM ring distance to any input cell of the same group —
    ring 0 is the original cover, ring k the k-th dilation shell.

    This is how an engine widens an AOI cover for proximity queries
    ("tiles within 10 km of the park boundary"), pre-fetches halo tiles
    for focal kernels, or builds the dead zone for spatial splits at
    query time — without re-rasterizing the polygon at a padded extent.

    Spark shape: two nested ``explode(sequence(-r, r))`` projections
    fan each cover cell to its (2r+1)^2 neighborhood (x wraps at the
    antimeridian, y clips at the poles — exactly :func:`~..functions.
    grid.k_ring`'s rule), then ONE groupBy((group, cell)) MIN(ring)
    dedups overlapping shells. Output is O(cover x (2r+1)^2) before
    the combine and O(buffered cover) after; map-side partial MIN makes
    the Exchange carry only the deduped rows per partition. All integer
    bit arithmetic — zero Python, one shuffle.
    """
    if radius < 0:
        raise ValueError("radius must be >= 0")
    g = G.get_grid(grid_name)
    x, y = cell_xy(F.col(cell_col))
    keys = [group_col] if group_col else []
    df = (
        cells.select(*keys, x.alias("__x"), y.alias("__y"))
        .withColumn("__dx", F.explode(F.sequence(F.lit(-radius), F.lit(radius))))
        .withColumn("__dy", F.explode(F.sequence(F.lit(-radius), F.lit(radius))))
        .select(
            *keys,
            # antimeridian wrap in x (pmod keeps the result non-negative)
            F.pmod(F.col("__x") + F.col("__dx"), F.lit(g.nx)).alias("__nx"),
            (F.col("__y") + F.col("__dy")).alias("__ny"),
            F.greatest(F.abs(F.col("__dx")), F.abs(F.col("__dy"))).alias("__ring"),
        )
        .filter((F.col("__ny") >= 0) & (F.col("__ny") < g.ny))
    )
    return (
        df.groupBy(*keys, "__nx", "__ny")
        .agg(F.min("__ring").alias("ring"))
        .select(
            *keys,
            pack_cell(g, F.col("__nx"), F.col("__ny")).alias(cell_col),
            "ring",
        )
    )


def adaptive_cell_cover(
    points: DataFrame,
    ladder: "list[str]",
    max_count: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Adaptive multi-resolution cell cover over a point set — the
    quadtree/S2-style answer to SPATIAL SKEW. A fixed-resolution grid
    either drowns hot spots (one cell holding 10^8 points breaks every
    downstream equi-join partition) or shatters sparse regions into
    billions of empty cells. This operator emits each region at the
    COARSEST rung of ``ladder`` (grid names, coarse -> fine, must nest)
    where its point count is <= ``max_count``; regions still heavy at
    the finest rung are emitted there regardless (a single hot fine
    cell is the irreducible floor — salt it downstream).

    The output ``(cell_id, n_points)`` is a disjoint cover of the input
    points whose per-cell counts are bounded by max_count everywhere
    the ladder could achieve it — exactly the balanced partition map a
    web-scale spatial shuffle wants (build once per corpus snapshot,
    broadcast, range-partition by it).

    Scale shape: points shuffle ONCE (groupBy finest cell); every later
    step — parent derivation, per-rung window totals, the emit-rung
    decision, the final regroup — runs on the O(distinct fine cells)
    count table, not the points. Decision is per fine cell and depends
    only on its ancestor totals, so the cover is deterministic and
    independent of partitioning. All integer bit math; the DuckDB twin
    replays it with window sums.
    """
    from .spatial_join import cell_expr

    grids = [G.get_grid(n) for n in ladder]
    if len(grids) < 2:
        raise ValueError("ladder needs >= 2 grids (coarse -> fine)")
    fine = grids[-1]
    counts = points.groupBy(
        cell_expr(fine, F.col(lon_col), F.col(lat_col)).alias("cell_id")
    ).agg(F.count("*").alias("n"))
    return adaptive_cover_from_counts(counts, ladder, max_count)


def adaptive_cover_from_counts(
    fine_counts: DataFrame,
    ladder: "list[str]",
    max_count: int,
) -> DataFrame:
    """The count-table half of :func:`adaptive_cell_cover`, exposed
    for INCREMENTAL maintenance: fine-cell counts are additive, so an
    ingest wave updates the cover by summing the stored counts with the
    delta's counts and re-running this (tiny) relational tail — the
    corpus is never re-scanned, and the result is provably identical to
    a full rebuild (pinned by pytest). Input: ``(cell_id, n)`` at the
    finest ladder grid."""
    from pyspark.sql.window import Window

    grids = [G.get_grid(n) for n in ladder]
    fine = grids[-1]
    df = fine_counts.groupBy(F.col("cell_id").alias("__c")).agg(
        F.sum("n").alias("__n")
    )
    for gi, g in enumerate(grids[:-1]):
        df = df.withColumn(
            f"__p{gi}", parent_cell_expr(fine, g, F.col("__c"))
        )
        df = df.withColumn(
            f"__t{gi}", F.sum("__n").over(Window.partitionBy(f"__p{gi}"))
        )
    chosen = None
    for gi in range(len(grids) - 1):
        cond = F.col(f"__t{gi}") <= int(max_count)
        arm = F.col(f"__p{gi}")
        chosen = F.when(cond, arm) if chosen is None else chosen.when(cond, arm)
    chosen = chosen.otherwise(F.col("__c"))
    return (
        df.groupBy(chosen.alias("cell_id"))
        .agg(F.sum("__n").alias("n_points"))
    )


def join_points_to_cover(
    points: DataFrame,
    cover: DataFrame,
    ladder: "list[str]",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Assign every point its covering cell from a MIXED-resolution
    cover (the output of :func:`adaptive_cell_cover`) — the join that
    turns the cover into a working partition map. A point's covering
    cell is its own cell at whichever rung the cover emitted for that
    region; since the cover is a disjoint partition of space across
    rungs, exactly one rung matches per point.

    Spark shape: the point computes its cell id at EVERY rung (pure
    bit arithmetic, no fan-out — one column per rung), then ONE
    equi-join against the cover on ``coalesce``-free rung dispatch:
    the cover row's grid index (top 8 bits of its cell_id) selects
    which rung column to compare, expressed as a join on an array
    containment — in practice we union per-rung equi-joins, each of
    which Catalyst plans as a broadcast when the cover is small (it is
    O(regions), not O(points)). Output: the point columns plus
    ``cell_id`` (covering cell).
    """
    from .spatial_join import cell_expr

    grids = [G.get_grid(n) for n in ladder]
    fine = grids[-1]
    pts = points.withColumn(
        "__cf", cell_expr(fine, F.col(lon_col), F.col(lat_col))
    )
    for gi, g in enumerate(grids[:-1]):
        pts = pts.withColumn(f"__c{gi}", parent_cell_expr(fine, g, F.col("__cf")))
    rung_cols = [F.col(f"__c{gi}") for gi in range(len(grids) - 1)] + [F.col("__cf")]
    parts = []
    for g, c in zip(grids, rung_cols):
        side = cover.filter(
            F.shiftright(F.col("cell_id"), _HDR_SHIFT) == F.lit(g.index)
        ).select("cell_id")
        parts.append(
            pts.join(F.broadcast(side), c == F.col("cell_id"), "inner")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    drop = ["__cf"] + [f"__c{gi}" for gi in range(len(grids) - 1)]
    return out.drop(*drop)
