"""Planner: ZonalQuery -> executable DataFrame pipeline.

The reference's coordinator (tile fan-out, DynamoDB partials, polling,
merge — reference tiling.py + results_store.py) is replaced by one Spark
plan:

  aoi -> polygon_to_cells (pandas UDF, batched)     [J1: theta -> equi join]
      -> explode -> join(images, on cell_id)        [partition-pruned scan]
      -> groupBy(aoi_id, cell_id).applyInPandas     [the zonal kernel]
      -> groupBy(group cols).sum                    [A6 final merge, Catalyst]
      -> decode / isoweek regroup / order / limit   [P11, F1, O1, O2]

Join-strategy policy (reference has a fixed 10-way fanout; we pick by
size — SURVEY.md section 4):
- AOI-cell side small (the common zonal case) -> broadcast it so the
  images scan never shuffles.
- Large AOI batches -> shuffle hash join on cell_id with AQE skew
  splitting; optional explicit salting is in operators/spatial_join.py.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geometry as geo
from ..functions import grid as G
from ..functions.expressions import compile_expression
from ..operators import zonal
from ..sources.catalog import (
    FROM_DATA,
    DataEnvironment,
    DerivedLayer,
    MultiDerivedLayer,
    SourceLayer,
)
from .ir import Aggregate, ZonalQuery

BROADCAST_CELL_LIMIT = 2_000_000  # aoi-cell rows we are happy to broadcast
MAX_AOIS_PER_TASK = 64  # hot-cell salting threshold (cell kernel AOI loop)


def _in_long_set(col: str, ids) -> "F.Column":
    """``col IN (<literal longs>)`` as ONE parsed SQL expression.
    ``Column.isin`` builds a py4j literal per element — one driver<->JVM
    round trip each, ~1 s of plan-construction time for a 2k-cell AOI
    batch. One expr string is one round trip regardless of set size."""
    return F.expr(f"`{col}` IN ({','.join(str(int(c)) for c in ids)})")


# ---------------------------------------------------------------------------
# J1: polygon -> cells (the spatial join key derivation)
# ---------------------------------------------------------------------------

def aoi_cells(aoi_df: DataFrame, grid_name: str) -> DataFrame:
    """(aoi_id, geom_wkb) -> (aoi_id, geom_wkb, cell_id) — one row per
    intersecting cell. The pandas UDF enumerates cells per polygon in a
    batch (H3 polygon_to_cells role); explode turns the intersects-join
    into an equi-join on cell_id."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cells_of(geoms: pd.Series) -> pd.Series:
        grid = G.get_grid(grid_name)
        out = []
        for wkb in geoms:
            cells = G.polygon_to_cells(grid, geo.wkb_loads(bytes(wkb)))
            out.append(cells.tolist())
        return pd.Series(out)

    return (
        aoi_df.withColumn("cell_id", F.explode(cells_of("geom_wkb")))
    )


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def run_zonal_query(
    spark: SparkSession,
    images: DataFrame,  # must carry layer + cell_id (sources.images.with_derived_keys)
    aoi_df: DataFrame,  # (aoi_id, geom_wkb)
    query: ZonalQuery,
    env: DataEnvironment,
    grid_name: str | None = None,
    per_aoi: bool = True,
    broadcast_aoi: bool | None = None,
    strategy: str | None = None,
    aoi_index: "AoiIndex | None" = None,
) -> DataFrame:
    """Execute a zonal query; returns the final result DataFrame with one
    block of rows per AOI (column ``aoi_id`` first when ``per_aoi``).

    ``strategy`` picks the kernel-stage physical plan:

    - ``"cell"`` (default): one shuffle of the tile rows clustered by
      ``cell_id``; each cell is decoded ONCE and its AOIs (from a broadcast
      lookup) are looped in the kernel, with explicit salting (tile rows
      duplicated per salt) for cells hotter than MAX_AOIS_PER_TASK AOIs.
    - ``"colocated"``: ZERO shuffle of tile bytes — requires the images
      input to be cell-sorted on disk (sources.images.write_images_cell_sorted);
      the kernel streams over the scan with mapInPandas and regroups cells
      within each partition. Only partial-aggregate rows ever shuffle.
    - ``"aoi_cell"``: the reference-shaped plan (one task per (aoi, cell),
      tile bytes shuffled per overlapping AOI). Skew-free by construction
      but maximally redundant on hot cells; kept for parity testing AND as
      the fallback for AOI batches too large to broadcast as a lookup
      (pass ``broadcast_aoi=False`` for a plain shuffle join with AQE
      skew splitting — nothing is ever collected to the driver).
    """
    grid_name = resolve_target_grid(query, env, grid_name)
    if any(a.func in VALUE_ROLLUP_FUNCS for a in query.aggregates):
        return _run_value_rollup_query(
            spark, images, aoi_df, query, env, grid_name,
            strategy=strategy, aoi_index=aoi_index,
        )
    if strategy in (None, "auto"):
        # frames read straight off a cell-sorted layout (sources.images
        # sidecar) default to the zero-shuffle colocated scan; anything
        # else takes the one-shuffle cell-clustered plan
        strategy = "colocated" if getattr(images, "_gfw_cell_sorted", False) else "cell"
    needed = env.source_layer_names(query.layer_names())
    if any(env.get_layer(n).grid != grid_name for n in needed) and strategy != "cell":
        strategy = "cell"  # multi-grid co-registration needs the remapped plan
    if strategy == "aoi_cell":
        cells = aoi_cells(aoi_df, grid_name)
        if query.select_pixels:
            out = build_pixels(images, cells, query, env, grid_name, broadcast_aoi)
            return _finalize_pixels(out, query)
        partials = build_partials(images, cells, query, env, grid_name, broadcast_aoi)
        return finalize_partials(partials, query, env)
    if aoi_index is not None:
        if aoi_index.grid_name != grid_name:
            raise ValueError(
                f"aoi_index was prepared on grid {aoi_index.grid_name!r} but the "
                f"query resolves to {grid_name!r}; prepare one per target grid"
            )
        out = build_partials_with_lookup(
            images, aoi_index.lookup, aoi_index.salted, query, env, grid_name,
            colocated=(strategy == "colocated"),
        )
    else:
        out = build_partials_by_cell(
            images, aoi_df, query, env, grid_name, colocated=(strategy == "colocated")
        )
    if query.select_pixels:
        return _finalize_pixels(out, query)
    return finalize_partials(out, query, env)


VALUE_ROLLUP_FUNCS = ("percentile", "mode", "count_distinct", "variance", "stddev")


def _run_value_rollup_query(
    spark, images, aoi_df, query: ZonalQuery, env, grid_name,
    strategy=None, aoi_index=None,
) -> DataFrame:
    """Single-query entry for the value-rollup rewrite (see
    :func:`_rollup_plan`): run the inner group-by-value count query
    through the normal kernel path, then apply the relational finisher."""
    inner, finish = _rollup_plan(query, env)
    counts = run_zonal_query(
        spark, images, aoi_df, inner, env, grid_name,
        per_aoi=True, strategy=strategy, aoi_index=aoi_index,
    )
    return finish(counts)


def _rollup_plan(query: ZonalQuery, env):
    """PERCENTILE/MEDIAN/MODE/COUNT(DISTINCT) as PLAN REWRITES, no kernel
    changes: each is group-by-value counts (the kernel's native bincount
    partial, shuffle volume O(distinct values) not O(pixels)) followed by
    a cheap relational rollup partitioned by the query's group keys:

    - ``percentile``: windowed cumulative-count selection. Discrete-
      percentile semantics match DuckDB's ``quantile_disc`` exactly: the
      1-based ``ceil(p * n)``-th ordered element. Raw numeric layers only.
    - ``mode``: per-(aoi, groups) argmax of the value counts; ties break
      to the SMALLEST value (deterministic, oracle-matchable). Categorical
      layers are allowed — counts are re-summed per decoded meaning first,
      so a many-raw-to-one-meaning table still yields the majority meaning.
    - ``count_distinct``: count of distinct (decoded) values per group.

    SEVERAL such selectors are allowed in one query when they all read
    the SAME layer (``PERCENTILE(x, .25), MEDIAN(x), COUNT(DISTINCT x)``):
    they share one kernel pass and one counts frame, and their per-key
    results join back on the group keys (tiny frames, broadcast-sized
    per key-group). No other aggregates, no isoweek/pixel/order/limit.

    Returns ``(inner_query, finish)`` where ``inner_query`` is the plain
    count-by-value :class:`ZonalQuery` (executable standalone OR as one
    member of a fused :func:`run_zonal_queries` pass — its partials are
    the same bincount rows the fused kernel already produces) and
    ``finish(counts_df)`` maps the finalized inner result to the rollup's
    final frame."""
    from functools import reduce

    aggs = query.aggregates
    if (
        not aggs or query.select_pixels or query.isoweek_layers
        or query.order_by or query.limit
        or any(a.func not in VALUE_ROLLUP_FUNCS for a in aggs)
        or len({a.layer for a in aggs}) != 1
    ):
        raise ValueError(
            "percentile/mode/count_distinct queries take exactly one such "
            "selector (or several over the SAME layer), no other "
            "aggregates, and no isoweek/pixel/order/limit clauses"
        )
    a0 = aggs[0]
    layer = env.get_layer(a0.layer)
    if any(a.func == "percentile" for a in aggs) and (
        getattr(layer, "decode_expression", None) or getattr(layer, "raster_table", None)
    ):
        raise ValueError(
            "percentile is defined over raw numeric layers; "
            f"{a0.layer!r} has a decode/meaning mapping"
        )
    if any(a.func in ("variance", "stddev") for a in aggs):
        if getattr(layer, "decode_expression", None) or getattr(layer, "raster_table", None):
            raise ValueError(
                "variance/stddev are defined over raw numeric layers; "
                f"{a0.layer!r} has a decode/meaning mapping"
            )
        dt = str(getattr(layer, "dtype", "") or "")
        if not (dt.startswith("int") or dt.startswith("uint")):
            # the rewrite promises ENGINE-EXACT results: it folds the
            # bincount into integer (n*s2 - s1^2) before the one float
            # division, which requires integer pixel values. Scale float
            # layers to integer units (the repo-wide cross-engine-float
            # rule) instead of summing doubles in shuffle order.
            raise ValueError(
                f"variance/stddev need an integer raw layer; {a0.layer!r} "
                f"is {dt or 'unknown'} — scale to integer units first"
            )
    if a0.layer in query.group_layers:
        raise ValueError(f"{a0.func} layer cannot also be a GROUP BY key")
    if len({a.alias for a in aggs}) != len(aggs):
        raise ValueError("value-rollup selectors need distinct aliases")
    inner = ZonalQuery(
        base_layer=query.base_layer,
        group_layers=tuple(query.group_layers) + (a0.layer,),
        aggregates=(Aggregate("count", None, "__pc_n"),),
        where=query.where,
    )
    vcol = a0.layer
    keys = ["aoi_id"] + list(query.group_layers)

    def finish(counts: DataFrame) -> DataFrame:
        # ``counts`` is the FINAL (aoi_id, <groups>, <layer>, __pc_n)
        # frame — group-by-value counts straight off the kernel's
        # bincount partial (single-path run_zonal_query or one fused-set
        # member's finalize)
        if len(aggs) == 1:
            return _rollup_one(counts, aggs[0], vcol, keys)
        # shared counts: cache for the per-selector rollups, then eagerly
        # materialize the (tiny, per-key) joined result and RELEASE the
        # cache — no pinned storage survives the call (the round-2 lesson
        # behind ZonalResultSet.close(), applied here where the result is
        # small enough to checkpoint eagerly instead of handing back a
        # handle)
        cached = counts.persist()
        try:
            results = [_rollup_one(cached, a, vcol, keys) for a in aggs]
            # NULL-SAFE reduce-join: a GROUP BY layer with a raster_table
            # but default_meaning=None decodes unmapped raws to NULL, and
            # NULL keys never match under plain equality — such groups
            # would silently vanish from multi-selector results while the
            # single-selector path keeps them. eqNullSafe treats
            # NULL = NULL as a match.
            out = reduce(lambda l, r: _join_nullsafe(l, r, keys), results)
            out = out.select(
                *keys, *[a.alias for a in aggs]
            ).localCheckpoint(eager=True)
        finally:
            cached.unpersist()
        return out

    return inner, finish


def _join_nullsafe(l: DataFrame, r: DataFrame, keys: list) -> DataFrame:
    """Inner join on ``keys`` with NULL-safe equality, keeping one copy of
    each key column (the left's)."""
    from functools import reduce

    renamed = r
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__r_{k}")
    cond = reduce(
        lambda acc, k: acc & l[k].eqNullSafe(renamed[f"__r_{k}"]),
        keys[1:],
        l[keys[0]].eqNullSafe(renamed[f"__r_{keys[0]}"]),
    )
    return l.join(renamed, cond).drop(*[f"__r_{k}" for k in keys])


def _rollup_one(partials, a: Aggregate, vcol: str, keys: list) -> DataFrame:
    """One rollup selector's per-key result frame from the shared
    group-by-value counts."""
    from pyspark.sql import Window

    if a.func in ("variance", "stddev"):
        # population variance from the bincount, ALL-INTEGER until the
        # final division: var = (n*s2 - s1^2) / n^2 with s1 = sum(c*v),
        # s2 = sum(c*v^2). Integer sums are shuffle-order-independent, so
        # the result is bit-identical to any other engine evaluating the
        # same closed form (the float-summation-order trap in the repo
        # memory notes); sqrt is IEEE-correctly-rounded, so stddev
        # inherits the exactness.
        # Accumulate in decimal(38,0), not int64: n*s2 - s1^2 wraps int64
        # silently (non-ANSI) once a uint8 group passes ~3.8e8 pixels —
        # ~5800 256-px tiles, tiny against the 100-TB design point. The
        # per-row products stay in int64 (pc_n is a per-task bincount,
        # <= pixels-per-task ~25M, times v^2 <= 2^32 stays < 2^63); the
        # cross-row sums and the final closed form are exact decimals.
        # Worst case bound: n <= 1e14 px * s2 <= 4.3e23 -> 4.3e37 < 1e38.
        v = F.col(vcol).cast("long")
        dec = "decimal(38,0)"
        stats = partials.groupBy(*keys).agg(
            F.sum(F.col("__pc_n").cast(dec)).cast(dec).alias("__n"),
            F.sum((F.col("__pc_n") * v).cast(dec)).cast(dec).alias("__s1"),
            F.sum((F.col("__pc_n") * v * v).cast(dec)).cast(dec).alias("__s2"),
        )
        var = (
            (F.col("__n") * F.col("__s2") - F.col("__s1") * F.col("__s1"))
            .cast("double") / (F.col("__n") * F.col("__n")).cast("double")
        )
        out = F.sqrt(var) if a.func == "stddev" else var
        return stats.select(*keys, out.alias(a.alias))
    if a.func in ("mode", "count_distinct"):
        # collapse duplicate value rows first: a raster_table can map many
        # raw values to one decoded meaning, and the majority/distinct set
        # is defined over MEANINGS. Re-grouping on the same leading keys
        # reuses the finalize shuffle's hash partitioning (no new Exchange).
        counts = partials.groupBy(*keys, vcol).agg(F.sum("__pc_n").alias("__pc_n"))
        if a.func == "count_distinct":
            return counts.groupBy(*keys).agg(
                F.count(F.lit(1)).cast("long").alias(a.alias)
            )
        w_top = Window.partitionBy(*keys).orderBy(
            F.col("__pc_n").desc(), F.col(vcol).asc()
        )
        return (
            counts.withColumn("__rn", F.row_number().over(w_top))
            .filter(F.col("__rn") == 1)
            .select(*keys, F.col(vcol).alias(a.alias))
        )
    w_cum = (
        Window.partitionBy(*keys).orderBy(F.col(vcol))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*keys)
    w_rn = Window.partitionBy(*keys).orderBy(F.col(vcol))
    ranked = (
        partials
        .withColumn("__cum", F.sum("__pc_n").over(w_cum))
        .withColumn("__tot", F.sum("__pc_n").over(w_tot))
    )
    return (
        # epsilon guards binary-float overshoot: 0.07*100 = 7.0000000000000009
        # in doubles, and naive ceil would pick the 8th element where
        # quantile_disc picks the 7th. RELATIVE epsilon (a few hundred
        # ulps) plus an absolute floor: a fixed 1e-9 is smaller than one
        # ulp of p*tot once totals pass ~4.5e6 pixels, letting the
        # off-by-one reappear at raster scale
        ranked.filter(
            F.col("__cum") >= F.ceil(
                F.lit(float(a.param)) * F.col("__tot")
                - F.greatest(
                    F.lit(1e-9),
                    F.lit(float(a.param)) * F.col("__tot") * F.lit(1e-13),
                )
            )
        )
        .withColumn("__rn", F.row_number().over(w_rn))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.col(vcol).cast("double").alias(a.alias))
    )


# ---------------------------------------------------------------------------
# Cell-clustered kernel plans (decode-once-per-cell; see operators.zonal)
# ---------------------------------------------------------------------------

DRIVER_ENUM_AOI_LIMIT = 100_000  # AOI rows enumerated driver-side
DRIVER_ENUM_WKB_BYTES = 256 * 2**20  # total geometry bytes collected driver-side


def _probe_aoi_batch(aoi_df: DataFrame) -> list | None:
    """Collect the AOI batch for driver-side enumeration — or return None
    when it must take the distributed path. The row-count AND total WKB
    bytes are probed RELATIONALLY first (one tiny agg job, no geometry
    crosses the wire), so a batch of million-vertex country polygons is
    rejected before a single vertex is materialized on the driver."""
    stats = aoi_df.select(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.length("geom_wkb")), F.lit(0)).alias("b"),
    ).collect()[0]
    if stats["n"] > DRIVER_ENUM_AOI_LIMIT or stats["b"] > DRIVER_ENUM_WKB_BYTES:
        return None
    return aoi_df.select("aoi_id", "geom_wkb").collect()


def _aoi_lookup_from_aois(spark: SparkSession, rows: list, grid_name: str,
                          max_aois_per_task: int, cell_limit: int | None = None):
    """Driver-side polygon->cells enumeration — the reference's coordinator
    does exactly this (tiling.py:220-237 enumerates tiles in-process). For
    AOI batches within the broadcast bound this avoids a whole Spark job
    (pandas-UDF workers + collect) per query; the distributed ``aoi_cells``
    path remains for larger batches. ``rows`` are collected
    (aoi_id, geom_wkb) rows.

    With ``cell_limit`` set, enumeration aborts as soon as the total
    aoi-cell count exceeds it and returns ``(None, None)`` — the caller
    must route to the distributed shuffle-join plan instead of holding an
    over-bound lookup on the driver (a single ">1 billion ha" AOI, the
    reference's own envelope, would otherwise OOM here)."""
    grid = G.get_grid(grid_name)
    by_cell: dict[int, list] = {}
    total = 0
    for r in rows:
        wkb = bytes(r["geom_wkb"])
        cells = G.polygon_to_cells(grid, geo.wkb_loads(wkb)).tolist()
        total += len(cells)
        if cell_limit is not None and total > cell_limit:
            return None, None
        for c in cells:
            by_cell.setdefault(c, []).append((r["aoi_id"], wkb))
    return _lookup_from_by_cell(spark, by_cell, max_aois_per_task)


def _aoi_lookup(spark: SparkSession, cells: DataFrame, max_aois_per_task: int):
    """Collect the (small, broadcastable — same bound as the broadcast
    join) AOI-cell list to a dict {cell_id: (n_salt, [(aoi_id, wkb)...])}
    and ship it as a Spark broadcast variable. n_salt > 1 flags hot cells
    whose AOI loop the planner splits across salted replicas."""
    rows = cells.select("cell_id", "aoi_id", "geom_wkb").collect()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell_id"], []).append((r["aoi_id"], bytes(r["geom_wkb"])))
    return _lookup_from_by_cell(spark, by_cell, max_aois_per_task)


def _lookup_from_by_cell(spark: SparkSession, by_cell: dict, max_aois_per_task: int):
    lookup: dict[int, tuple] = {}
    salted: dict[int, int] = {}
    for c, lst in by_cell.items():
        lst.sort(key=lambda t: t[0])
        n_salt = max(1, -(-len(lst) // max_aois_per_task))
        lookup[c] = (n_salt, lst)
        if n_salt > 1:
            salted[c] = n_salt
    return spark.sparkContext.broadcast(lookup), salted


class AoiIndex:
    """Driver-prepared AOI->cell index, reusable across queries.

    A real batch workload runs MANY queries over ONE geometry list — the
    reference enumerates tiles once per request and feeds every analysis
    from that list (reference tiling.py:220-237). Preparing the index once
    amortizes the per-query AOI collect + polygon->cells enumeration +
    broadcast (~1-2 s of driver time per query on a 512-AOI batch) across
    the whole query set. Only valid for the grid it was built on."""

    __slots__ = ("grid_name", "lookup", "salted")

    def __init__(self, grid_name: str, lookup, salted: dict):
        self.grid_name = grid_name
        self.lookup = lookup          # Broadcast[{cell: (n_salt, [(aoi, wkb)...])}]
        self.salted = salted          # {cell_id: n_salt} hot-cell summary

    def unpersist(self):
        self.lookup.unpersist()


def prepare_aoi_index(
    spark: SparkSession,
    aoi_df: DataFrame,
    grid_name: str,
    max_aois_per_task: int = MAX_AOIS_PER_TASK,
) -> AoiIndex | None:
    """Build an :class:`AoiIndex` for ``aoi_df`` on ``grid_name``; returns
    ``None`` when the batch exceeds the broadcast bound (callers then run
    the normal per-query path, which routes to the distributed
    shuffle-join plan)."""
    probe = _probe_aoi_batch(aoi_df)
    if probe is None:
        return None
    lookup, salted = _aoi_lookup_from_aois(
        spark, probe, grid_name, max_aois_per_task, cell_limit=BROADCAST_CELL_LIMIT
    )
    if lookup is None:
        return None
    return AoiIndex(grid_name, lookup, salted)


def build_partials_by_cell(
    images: DataFrame,
    aoi_df: DataFrame,  # (aoi_id, geom_wkb)
    query: ZonalQuery,
    env: DataEnvironment,
    grid_name: str,
    colocated: bool = False,
    max_aois_per_task: int = MAX_AOIS_PER_TASK,
) -> DataFrame:
    """Partial rows via the per-cell kernel. Tile bytes cross the wire at
    most once (``colocated=False``: one repartition by cell_id, plus salted
    replicas of hot cells only) or never (``colocated=True``: mapInPandas
    straight over a cell-sorted scan).

    The cell-kernel plans need the AOI-cell map on the driver (it ships as
    a broadcast). That is only safe up to ``BROADCAST_CELL_LIMIT`` aoi-cell
    rows; beyond it — a giant AOI or a country-scale batch — this function
    automatically falls back to the distributed shuffle-join plan
    (``build_partials``/``build_pixels`` with ``broadcast_aoi=False``),
    which collects NOTHING and relies on AQE skew splitting. Both plans
    emit the identical partial schema, so callers never notice beyond the
    physical strategy."""
    spark = images.sparkSession
    probe = _probe_aoi_batch(aoi_df)
    lookup = salted = None
    if probe is not None:
        # small batch: enumerate cells on the driver (one collect, no UDF
        # job), aborting early if the volume exceeds the broadcast bound
        lookup, salted = _aoi_lookup_from_aois(
            spark, probe, grid_name, max_aois_per_task,
            cell_limit=BROADCAST_CELL_LIMIT,
        )
        cells = None
    else:
        # big batch: count the aoi-cell rows DISTRIBUTED first; collect the
        # lookup only when it provably fits the broadcast bound. The
        # polygon->cells enumeration is the expensive part, so persist it:
        # count, (collect | shuffle-join plan) all reuse one job's output.
        cells = aoi_cells(aoi_df, grid_name).persist()
        stats = cells.select(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.length("geom_wkb")), F.lit(0)).alias("b"),
        ).collect()[0]
        # collecting the lookup pulls one geometry copy PER aoi-cell row,
        # so the byte bound applies here too — over it, never collect
        if stats["n"] <= BROADCAST_CELL_LIMIT and stats["b"] <= DRIVER_ENUM_WKB_BYTES:
            lookup, salted = _aoi_lookup(spark, cells, max_aois_per_task)
            cells.unpersist()
    if lookup is not None:
        return build_partials_with_lookup(
            images, lookup, salted, query, env, grid_name, colocated
        )
    # over the broadcast bound: reference-shaped shuffle-join plan
    if cells is None:
        cells = aoi_cells(aoi_df, grid_name)
    builder = build_pixels if query.select_pixels else build_partials
    return builder(images, cells, query, env, grid_name, broadcast_aoi=False)


def resolve_target_grid(query: ZonalQuery, env: DataEnvironment, grid_name: str | None) -> str:
    """The finest-grid rule (reference query.py:196-210): unless overridden,
    the query executes on the minimum-pixel grid among its source layers;
    coarser layers are co-registered by upsampling inside the kernel."""
    if grid_name:
        return grid_name
    names = env.source_layer_names(query.layer_names())
    grids = {env.get_layer(n).grid for n in names}
    if not grids:
        return "4/1024"
    return min(grids, key=lambda g: G.get_grid(g).pixel_size)


def _regrid_images(imgs: DataFrame, env: DataEnvironment, needed: list, target: G.Grid) -> DataFrame:
    """Attach ``src_cell_id`` and remap coarser-grid layers' rows onto the
    target grid's cell ids: each coarse tile row explodes into the
    ratio^2 finer cells it covers (pure Catalyst bit arithmetic on the
    packed (grid, x, y) cell id). Same-grid layers pass through."""
    xb, yb = G._X_BITS, G._Y_BITS
    by_grid: dict[str, list] = {}
    for n in needed:
        by_grid.setdefault(env.get_layer(n).grid, []).append(n)
    parts = []
    for gname, lnames in by_grid.items():
        sub = imgs.filter(F.col("layer").isin(lnames))
        if gname == target.name:
            parts.append(sub.withColumn("src_cell_id", F.col("cell_id")))
            continue
        src = G.get_grid(gname)
        r = G.cell_ratio(src, target)
        x = F.shiftright(F.col("cell_id"), yb).bitwiseAND(F.lit((1 << xb) - 1))
        y = F.col("cell_id").bitwiseAND(F.lit((1 << yb) - 1))
        base = F.lit(target.index << (xb + yb))
        children = F.flatten(F.transform(
            F.sequence(F.lit(0), F.lit(r - 1)),
            lambda i: F.transform(
                F.sequence(F.lit(0), F.lit(r - 1)),
                lambda j: base + F.shiftleft(x * r + i, yb) + (y * r + j),
            ),
        ))
        parts.append(
            sub.withColumn("src_cell_id", F.col("cell_id"))
            .withColumn("cell_id", F.explode(children))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


MAX_EXACT_IN_CELLS = 2048   # below this: one literal IN predicate
MAX_PRUNE_RANGES = 64       # above: OR of <= this many disjoint BETWEENs


def _gap_split_ranges(cell_ids, max_ranges: int = MAX_PRUNE_RANGES) -> list:
    """Split a cell-id set into <= max_ranges disjoint [lo, hi] runs, cut
    at the largest gaps. Packed (grid, x, y) ids are spatially ordered, so
    a real AOI batch — even a scattered one (two countries on opposite
    sides of the world) — collapses into a handful of dense runs; the
    pathological single min/max BETWEEN that spans the whole corpus only
    happens if we refuse to split. Contiguous ids (gap == 1) never split."""
    ids = np.asarray(sorted({int(c) for c in cell_ids}), dtype=np.int64)
    if ids.size == 0:
        return []
    if ids.size == 1:
        return [(int(ids[0]), int(ids[0]))]
    gaps = np.diff(ids)
    k = min(max_ranges - 1, int(gaps.size))
    if k <= 0:
        return [(int(ids[0]), int(ids[-1]))]
    cand = np.argpartition(gaps, -k)[-k:]
    splits = np.sort(cand[gaps[cand] > 1])
    ranges, start = [], 0
    for s in splits:
        ranges.append((int(ids[start]), int(ids[s])))
        start = int(s) + 1
    ranges.append((int(ids[start]), int(ids[-1])))
    return ranges


def _prune_cells(imgs: DataFrame, cell_ids: list) -> DataFrame:
    """Push the AOI-cell set into the tile scan: exact IN for small sets;
    for large ones, an OR of gap-split BETWEEN ranges (pushed to the
    parquet scan for row-group/file pruning — a scattered AOI batch scans
    its footprint, not the corpus) followed by an exact broadcast
    semi-join so non-AOI cells inside a range never cross the kernel
    shuffle either."""
    if not cell_ids:
        return imgs.filter(F.lit(False))
    if len(cell_ids) <= MAX_EXACT_IN_CELLS:
        return imgs.filter(_in_long_set("cell_id", cell_ids))
    ranges = _gap_split_ranges(cell_ids)
    cond = " OR ".join(f"(`cell_id` BETWEEN {lo} AND {hi})" for lo, hi in ranges)
    imgs = imgs.filter(F.expr(cond))
    spark = imgs.sparkSession
    cells_df = spark.createDataFrame(
        pd.DataFrame({"cell_id": np.asarray(sorted({int(c) for c in cell_ids}), dtype=np.int64)})
    )
    return imgs.join(F.broadcast(cells_df), "cell_id", "left_semi")


def _with_missing_cells(spark, imgs: DataFrame, cell_ids: list) -> DataFrame:
    """Missing-cell tolerance (S2): synthesize one null tile row for each
    AOI cell with no stored tiles, so FROM_DATA queries count them."""
    present = imgs.select("cell_id").distinct()
    missing = (
        spark.createDataFrame([(int(c),) for c in cell_ids], "cell_id long")
        .join(F.broadcast(present), "cell_id", "left_anti")
        .select(
            F.lit(None).cast("string").alias("layer"),
            F.col("cell_id"),
            F.lit(None).cast("binary").alias("bytes"),
            F.lit(None).cast("int").alias("w"),
            F.lit(None).cast("int").alias("h"),
            F.lit(None).cast("string").alias("fmt"),
            F.col("cell_id").alias("src_cell_id"),
        )
    )
    return imgs.unionByName(missing)


def _dispatch_cell_plan(spark, imgs: DataFrame, salted: dict, wrapped, schema: str,
                        colocated: bool) -> DataFrame:
    """Kernel-stage dispatch shared by the single and fused builders:
    colocated zero-shuffle stream (with hot-cell diversion — a cell shared
    by thousands of AOIs would be ONE serial AOI loop in one colocated
    task, so cells hotter than MAX_AOIS_PER_TASK take the salted cell
    plan while everything else streams shuffle-free) or the salted
    cell-clustered shuffle plan."""
    if colocated:
        if salted:
            hot = [int(c) for c in salted]
            cold_part = imgs.filter(~_in_long_set("cell_id", hot)).mapInPandas(
                _streaming_cells(wrapped), schema
            )
            hot_part = _salted_cell_plan(
                spark, imgs.filter(_in_long_set("cell_id", hot)), salted, wrapped, schema
            )
            return cold_part.unionByName(hot_part)
        return imgs.mapInPandas(_streaming_cells(wrapped), schema)
    return _salted_cell_plan(spark, imgs, salted, wrapped, schema)


def build_partials_with_lookup(
    images: DataFrame,
    lookup,  # Broadcast[{cell_id: (n_salt, [(aoi_id, wkb)...])}]
    salted: dict,
    query: ZonalQuery,
    env: DataEnvironment,
    grid_name: str,
    colocated: bool = False,
) -> DataFrame:
    """Cell-kernel plan over an explicit AOI-cell lookup (used directly by
    the checkpoint layer, whose resume anti-join simply removes committed
    (aoi, cell) pairs from the lookup)."""
    spark = images.sparkSession
    cell_ids = list(lookup.value.keys())
    needed = env.source_layer_names(query.layer_names())

    target = G.get_grid(grid_name)
    multigrid = any(env.get_layer(n).grid != grid_name for n in needed)
    if multigrid and colocated:
        raise ValueError(
            "colocated strategy requires a single-grid query (coarse-layer "
            "rows live at other cells' file positions); use strategy='cell'"
        )

    imgs = images.select("layer", "cell_id", "bytes", "w", "h", "fmt")
    if needed:
        imgs = imgs.filter(F.col("layer").isin(needed))
    if multigrid:
        imgs = _regrid_images(imgs, env, needed, target)
    else:
        imgs = imgs.withColumn("src_cell_id", F.col("cell_id"))
    imgs = _prune_cells(imgs, cell_ids)
    if query.base_layer == FROM_DATA:
        imgs = _with_missing_cells(spark, imgs, cell_ids)

    kernel = zonal.make_cell_kernel(query, env.to_json(), grid_name, lookup)
    if query.select_pixels:
        schema = "`aoi_id` string, " + zonal.pixel_schema_ddl(query)
        wrapped = _wrap_cell_kernel(kernel, with_cell=False)
    else:
        schema = "`aoi_id` string, `cell_id` long, `_ms` double, " + zonal.partial_schema_ddl(query)
        wrapped = _wrap_cell_kernel(kernel)
    return _dispatch_cell_plan(spark, imgs, salted, wrapped, schema, colocated)


def build_multi_partials_with_lookup(
    images: DataFrame,
    lookup,
    salted: dict,
    queries: list,  # [ZonalQuery] — aggregate-mode, single-grid
    env: DataEnvironment,
    grid_name: str,
    colocated: bool = False,
) -> DataFrame:
    """FUSED cell-kernel plan: one scan + decode + per-(aoi, cell)
    rasterize serving every query of a batch (zonal.make_multi_cell_kernel).
    Output rows are NARROW: ``_q`` tags the owning query and ``vals``
    packs exactly that query's partial values (``partial_columns``
    order) as one array<double>; split per query with
    :func:`split_multi_partials`."""
    spark = images.sparkSession
    cell_ids = list(lookup.value.keys())
    union_layers: list = []
    for q in queries:
        for n in env.source_layer_names(q.layer_names()):
            if n not in union_layers:
                union_layers.append(n)
    if any(env.get_layer(n).grid != grid_name for n in union_layers):
        raise ValueError("fused execution requires a single-grid query set")

    imgs = images.select("layer", "cell_id", "bytes", "w", "h", "fmt")
    if union_layers:
        imgs = imgs.filter(F.col("layer").isin(union_layers))
    imgs = imgs.withColumn("src_cell_id", F.col("cell_id"))
    imgs = _prune_cells(imgs, cell_ids)
    if any(q.base_layer == FROM_DATA for q in queries):
        imgs = _with_missing_cells(spark, imgs, cell_ids)

    kernel = zonal.make_multi_cell_kernel(queries, env.to_json(), grid_name, lookup)
    schema = (
        "`aoi_id` string, `cell_id` long, `_ms` double, "
        + zonal.multi_partial_schema_ddl(queries)
    )
    wrapped = _wrap_cell_kernel(kernel)
    return _dispatch_cell_plan(spark, imgs, salted, wrapped, schema, colocated)


def split_multi_partials(partials: DataFrame, qi: int, query: ZonalQuery) -> DataFrame:
    """Project query ``qi``'s rows and columns back out of the fused
    narrow partial frame: filter on the ``_q`` tag, then unpack the
    ``vals`` array positionally into the query's named partial columns
    (the result feeds :func:`finalize_partials` unchanged). Packed
    values are all-double; the cast restores each column's single-path
    type (count partials are integral doubles, the cast is exact; null
    elements — empty-group min/max — stay NULL)."""
    cols = [F.col("aoi_id"), F.col("cell_id"), F.col("_ms")] + [
        F.col("vals").getItem(j).cast(t).alias(n)
        for j, (n, t) in enumerate(zonal.partial_columns(query))
    ]
    return partials.filter(F.col("_q") == qi).select(*cols)


class ZonalResultSet(dict):
    """{name: result DataFrame} plus an EXPLICIT cleanup handle for the
    fused execution's shared state (the persisted partial frame and, when
    this call built it, the AOI-index broadcast). DataFrame-attribute
    stamping is fragile — the attribute vanishes after any further
    transformation — so the handle lives on the returned mapping itself.
    Use as a context manager, or call :meth:`close` after materializing
    the results; on the non-fused fallback close() is a no-op."""

    def __init__(self, results, partials=None, aoi_index=None, owns_index=False):
        super().__init__(results)
        self._partials = partials
        self._aoi_index = aoi_index
        self._owns_index = owns_index

    def materialize(self, writer=None, parallel: bool = True) -> None:
        """Drive every member's final aggregation, CONCURRENTLY by
        default. The per-query finalizes are independent Spark jobs over
        the same cached partial frame, so running them from a thread pool
        overlaps their (small) shuffles instead of paying them serially —
        the batch-request wall time drops by roughly (n_queries - 1) x
        finalize-latency. The FIRST member runs alone: its action builds
        the shared partial cache as a side effect (one kernel pass,
        pipelined straight into that member's aggregation — cheaper than
        the separate count() pass this used to spend, r6), and only then
        do the remaining members run concurrently, so nothing ever races
        to build a not-yet-materialized persisted frame (which can be
        computed twice under concurrent actions). ``writer`` defaults to
        a noop-format write (materialize-only); pass e.g.
        ``lambda df: df.write.parquet(...)`` to land results."""
        w = writer or (
            lambda df: df.write.format("noop").mode("overwrite").save()
        )
        vals = list(self.values())
        if parallel and len(vals) > 1:
            from concurrent.futures import ThreadPoolExecutor

            first = 1 if self._partials is not None else 0
            if first:
                w(vals[0])
            with ThreadPoolExecutor(max_workers=min(len(vals), 8)) as ex:
                list(ex.map(w, vals[first:]))
        else:
            for df in vals:
                w(df)

    def close(self) -> None:
        if self._partials is not None:
            self._partials.unpersist()
            self._partials = None
        if self._owns_index and self._aoi_index is not None:
            self._aoi_index.unpersist()
        self._aoi_index = None

    def __enter__(self) -> "ZonalResultSet":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def run_zonal_queries(
    spark: SparkSession,
    images: DataFrame,
    aoi_df: DataFrame,
    queries: "dict[str, ZonalQuery]",
    env: DataEnvironment,
    grid_name: str | None = None,
    strategy: str | None = None,
    aoi_index: "AoiIndex | None" = None,
) -> "dict[str, DataFrame]":
    """Execute a WHOLE query set over one AOI batch in ONE fused pass —
    the reference's request shape (each analysis request runs several
    canned queries over the same geostore list, reference lambdas run
    them serially). The scan, tile decode, and per-(aoi, cell) rasterize
    are shared across the set; the fused partial frame is cached so each
    query's final aggregation reads it without re-running the kernel.

    Falls back to per-query :func:`run_zonal_query` when the set cannot
    fuse (pixel-select queries, multigrid layers, or an AOI batch over
    the broadcast bound). Returns a :class:`ZonalResultSet` — a plain
    {name: result DataFrame} mapping whose ``close()`` (or context-manager
    exit) releases the fused partial cache and, when this call built it,
    the AOI-index broadcast."""
    qlist = list(queries.values())
    names = list(queries.keys())
    # value-rollup members (percentile/median/mode/count_distinct) fuse
    # through their PLAN REWRITE: the inner group-by-value count query
    # joins the shared kernel pass (its partials are the same bincount
    # rows the fused kernel already produces) and the relational finisher
    # runs on that member's finalized frame afterwards
    finishers: "dict[str, object]" = {}
    exec_list: "list[ZonalQuery]" = []
    for name, q in zip(names, qlist):
        if any(a.func in VALUE_ROLLUP_FUNCS for a in q.aggregates):
            inner, fin = _rollup_plan(q, env)
            finishers[name] = fin
            exec_list.append(inner)
        else:
            exec_list.append(q)
    grids = {resolve_target_grid(q, env, grid_name) for q in exec_list}
    fusable = (
        len(grids) == 1
        and not any(q.select_pixels for q in exec_list)
        and strategy in (None, "auto", "cell", "colocated")
    )
    target = grids.pop() if len(grids) == 1 else None
    if fusable:
        union_layers = {
            n for q in exec_list for n in env.source_layer_names(q.layer_names())
        }
        fusable = all(env.get_layer(n).grid == target for n in union_layers)
    idx = aoi_index
    if fusable and idx is not None and idx.grid_name != target:
        raise ValueError(
            f"aoi_index was prepared on grid {idx.grid_name!r} but the query "
            f"set resolves to {target!r}; prepare one per target grid"
        )
    if fusable and idx is None:
        idx = prepare_aoi_index(spark, aoi_df, target)
        fusable = idx is not None
    if not fusable:
        # per-query fallback: forward the caller's index only to queries
        # whose resolved grid matches it (mixed-grid sets would otherwise
        # crash on the single-path grid check)
        return ZonalResultSet({
            name: run_zonal_query(
                spark, images, aoi_df, q, env, grid_name,
                strategy=strategy,
                aoi_index=(
                    aoi_index
                    if aoi_index is not None
                    and resolve_target_grid(q, env, grid_name) == aoi_index.grid_name
                    else None
                ),
            )
            for name, q in queries.items()
        })
    if strategy in (None, "auto"):
        colocated = bool(getattr(images, "_gfw_cell_sorted", False))
    else:
        colocated = strategy == "colocated"
    partials = build_multi_partials_with_lookup(
        images, idx.lookup, idx.salted, exec_list, env, target, colocated=colocated
    ).persist()
    out: "dict[str, DataFrame]" = {}
    for qi, (name, q) in enumerate(zip(names, exec_list)):
        res = finalize_partials(split_multi_partials(partials, qi, q), q, env)
        out[name] = finishers[name](res) if name in finishers else res
    return ZonalResultSet(
        out, partials=partials, aoi_index=idx, owns_index=aoi_index is None
    )


def _salted_cell_plan(spark, imgs: DataFrame, salted: dict, wrapped, schema: str) -> DataFrame:
    """The shuffle-clustered cell-kernel stage: tile rows repartitioned by
    cell (plus a salt replica per MAX_AOIS_PER_TASK-sized AOI slice of hot
    cells) and fed to the kernel via applyInPandas."""
    group_keys = ["cell_id"]
    if salted:
        salt_dim = spark.createDataFrame(
            [(int(c), int(n)) for c, n in salted.items()], "cell_id long, _n_salt int"
        )
        imgs = (
            imgs.join(F.broadcast(salt_dim), "cell_id", "left")
            .withColumn(
                "_salt",
                F.explode(F.sequence(F.lit(0), F.coalesce(F.col("_n_salt"), F.lit(1)) - 1)),
            )
            .drop("_n_salt")
        )
        group_keys = ["cell_id", "_salt"]
    n = spark.sparkContext.defaultParallelism * 3
    return imgs.repartition(n, *group_keys).groupBy(*group_keys).applyInPandas(wrapped, schema)


def _wrap_cell_kernel(kernel, with_cell: bool = True):
    """The cell kernel emits aoi_id itself; add cell_id + amortized _ms."""
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        out = kernel(pdf)
        if with_cell:
            ms = (time.perf_counter() - t0) * 1000.0 / max(len(out), 1)
            out.insert(1, "_ms", ms)
            out.insert(1, "cell_id", np.int64(pdf["cell_id"].iloc[0]))
        return out

    return run


def _streaming_cells(wrapped):
    """mapInPandas adapter: regroup a cell-sorted row stream into per-cell
    kernel calls. Correct whenever each cell's rows are contiguous within
    the partition's stream (guaranteed by write_images_cell_sorted:
    repartitionByRange(cell_id) makes files disjoint in cell ranges and
    sortWithinPartitions makes cells contiguous within each file; Arrow
    scan batches preserve file row order). The trailing run of each batch
    is buffered in case the same cell continues in the next batch."""
    def run(batches):
        buf = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if not len(pdf):
                continue
            ids = pdf["cell_id"].to_numpy()
            nonlast = np.flatnonzero(ids != ids[-1])
            k = int(nonlast.max() + 1) if len(nonlast) else 0
            complete, buf = pdf.iloc[:k], pdf.iloc[k:].reset_index(drop=True)
            for _, g in complete.groupby("cell_id", sort=False):
                yield wrapped(g)
        if buf is not None and len(buf):
            yield wrapped(buf)

    return run


def _joined_tiles(
    images: DataFrame,
    cells: DataFrame,
    query: ZonalQuery,
    env: DataEnvironment,
    broadcast_aoi: bool | None,
) -> DataFrame:
    needed = env.source_layer_names(query.layer_names())

    # column-pruned, layer-pruned scan (Catalyst pushes layer IN (...) and
    # the join's cell_id filter down to the parquet/Iceberg scan)
    imgs = images.select("layer", "cell_id", "bytes", "w", "h", "fmt")
    if needed:
        imgs = imgs.filter(F.col("layer").isin(needed))

    if broadcast_aoi is None:
        broadcast_aoi = True  # zonal AOI sets are small; explicit override for big batches
    cells_side = F.broadcast(cells) if broadcast_aoi else cells
    joined = imgs.join(cells_side, "cell_id")

    # Missing-tile tolerance (S2): an AOI cell with no stored tiles must
    # still produce rows when FROM data drops the base NoData mask (the
    # reference synthesizes zero tiles, window.py:103-119). An outer join
    # can't broadcast its preserved side, so instead we union in the
    # missing cells explicitly — `present` is tiny (bounded by the AOI
    # cell list) so both joins below stay broadcast.
    if query.base_layer == FROM_DATA:
        present = joined.select("cell_id").distinct()
        missing = (
            cells.join(F.broadcast(present), "cell_id", "left_anti")
            .withColumn("layer", F.lit(None).cast("string"))
            .withColumn("bytes", F.lit(None).cast("binary"))
            .withColumn("w", F.lit(None).cast("int"))
            .withColumn("h", F.lit(None).cast("int"))
            .withColumn("fmt", F.lit(None).cast("string"))
        )
        joined = joined.unionByName(missing.select(*joined.columns))
    return joined


def build_partials(
    images: DataFrame,
    cells: DataFrame,  # (aoi_id, geom_wkb, cell_id) — from aoi_cells()
    query: ZonalQuery,
    env: DataEnvironment,
    grid_name: str,
    broadcast_aoi: bool | None = None,
) -> DataFrame:
    """Partial-aggregate DataFrame keyed by (aoi_id, cell_id) — the unit
    the checkpoint/lineage layer persists and resumes. Carries a ``_ms``
    per-group kernel wall-time column for the lineage table."""
    joined = _joined_tiles(images, cells, query, env, broadcast_aoi)
    kernel = zonal.make_zonal_kernel(query, env.to_json(), grid_name)
    schema = "`aoi_id` string, `cell_id` long, `_ms` double, " + zonal.partial_schema_ddl(query)
    return _cluster_for_kernel(joined).groupBy("aoi_id", "cell_id").applyInPandas(
        _wrap_with_keys(kernel), schema
    )


def build_pixels(
    images: DataFrame,
    cells: DataFrame,
    query: ZonalQuery,
    env: DataEnvironment,
    grid_name: str,
    broadcast_aoi: bool | None = None,
) -> DataFrame:
    joined = _joined_tiles(images, cells, query, env, broadcast_aoi)
    kernel = zonal.make_zonal_kernel(query, env.to_json(), grid_name)
    schema = "`aoi_id` string, " + zonal.pixel_schema_ddl(query)
    return _cluster_for_kernel(joined).groupBy("aoi_id", "cell_id").applyInPandas(
        _wrap_with_keys(kernel, with_cell=False), schema
    )


def _cluster_for_kernel(joined: DataFrame) -> DataFrame:
    """Partition the joined tiles for the kernel stage with an *explicit*
    partition count. AQE's partition coalescing sizes partitions by shuffle
    bytes, but a tile row is tiny on the wire (compressed payload) and huge
    in CPU (w*h decoded pixels + masks) — byte-based coalescing collapses
    the kernel stage to a handful of tasks and idles the cluster. An
    explicit ``repartition(n, keys)`` is exempt from AQE coalescing, and
    because it hash-clusters on exactly the groupBy keys, the downstream
    ``groupBy(aoi_id, cell_id)`` reuses the partitioning instead of
    shuffling again. n = 3x parallelism balances stragglers (cells per
    task vary with AOI overlap)."""
    spark = joined.sparkSession
    n = spark.sparkContext.defaultParallelism * 3
    return joined.repartition(n, "aoi_id", "cell_id")


def _wrap_with_keys(kernel, with_cell: bool = True):
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        out = kernel(pdf)
        if with_cell:
            # amortize over the group's rows so SUM(_ms) = true kernel time
            ms = (time.perf_counter() - t0) * 1000.0 / max(len(out), 1)
            out.insert(0, "_ms", ms)
            out.insert(0, "cell_id", np.int64(pdf["cell_id"].iloc[0]))
        out.insert(0, "aoi_id", pdf["aoi_id"].iloc[0])
        return out

    return run


def finalize_partials(partials: DataFrame, query: ZonalQuery, env: DataEnvironment) -> DataFrame:
    return _finalize_aggregates(partials.drop("cell_id", "_ms"), query, env)


# ---------------------------------------------------------------------------
# Final relational shell (all Catalyst)
# ---------------------------------------------------------------------------

def _finalize_aggregates(partials: DataFrame, query: ZonalQuery, env: DataEnvironment) -> DataFrame:
    group_cols = ["aoi_id"]
    for g in query.group_layers:
        if g in query.isoweek_layers:
            # isoweek is pushed down into the kernel (zonal._isoweek_pushdown);
            # partials already carry the (isoyear, isoweek) key columns
            group_cols += [f"{g}__isoyear", f"{g}__isoweek"]
        else:
            group_cols.append(g)

    aggs = []
    for a in query.aggregates:
        if a.func == "count":
            aggs.append(F.sum(F.col(a.alias)).cast("long").alias(a.alias))
        elif a.func in ("sum",):
            aggs.append(F.sum(a.alias).alias(a.alias))
        elif a.func == "avg":
            if query.compat_avg:
                aggs.append(F.sum(a.alias).alias(a.alias))
            else:
                # try_divide: a group can have ZERO valid pixels (every
                # value NaN-masked, e.g. a ratio layer whose denominator
                # is NoData across a sliver AOI) — SQL semantics say the
                # AVG is NULL, not a divide-by-zero error (ANSI mode)
                aggs.append(
                    F.try_divide(
                        F.sum(f"{a.alias}__sum"), F.sum(f"{a.alias}__cnt")
                    ).alias(a.alias)
                )
        elif a.func == "min":
            aggs.append(F.min(a.alias).alias(a.alias))
        elif a.func == "max":
            aggs.append(F.max(a.alias).alias(a.alias))
    df = partials.groupBy(*group_cols).agg(*aggs)

    # decode group values raw -> meaning (P11); isoweek (F1) already
    # happened inside the kernel
    df = _decode_group_columns(df, query, env)

    return _order_and_limit(df, query, [c for c in group_cols if c in df.columns])


def _order_and_limit(df: DataFrame, query: ZonalQuery, default_sort: list[str]) -> DataFrame:
    """ORDER BY / LIMIT (O1/O2). The reference runs one query per AOI, so
    LIMIT is per-AOI: a windowed top-k partitioned by aoi_id (Catalyst
    rewrites rank-filter windows to a per-partition TopK, no full sort of
    non-surviving rows)."""
    order = (
        [F.col(o.column).asc() if o.ascending else F.col(o.column).desc() for o in query.order_by]
        if query.order_by
        else [F.col(c) for c in default_sort if c != "aoi_id"]
    )
    if query.limit is not None and order:
        from pyspark.sql import Window

        w = Window.partitionBy("aoi_id").orderBy(*order)
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= query.limit)
            .drop("__rn")
        )
    elif query.limit is not None:
        df = df.limit(query.limit)
    # deterministic presentation order across the whole batch
    return df.orderBy(F.col("aoi_id"), *order) if order else df.orderBy("aoi_id")


def _decode_group_columns(df: DataFrame, query: ZonalQuery, env: DataEnvironment) -> DataFrame:
    for g in query.group_layers:
        if g in query.isoweek_layers:
            continue  # replaced by __isoyear/__isoweek in the kernel
        layer = env.get_layer(g)
        if not isinstance(layer, (SourceLayer, DerivedLayer, MultiDerivedLayer)):
            continue
        if layer.raster_table:
            # JVM-side decode: CASE map literal + default (broadcast-dim-join
            # equivalent without a join; the table is tiny by construction)
            meanings = layer.raster_table
            all_int = all(isinstance(v, (int, np.integer)) for v in meanings.values())
            pairs = []
            for raw, meaning in meanings.items():
                pairs.extend([F.lit(int(raw)), F.lit(meaning)])
            m = F.create_map(*pairs)[F.col(g).cast("long")]
            if layer.default_meaning is not None:
                m = F.coalesce(m, F.lit(layer.default_meaning))
            df = df.withColumn(g, m.cast("long") if all_int else m)
        elif layer.decode_expression:
            fn_src = layer.decode_expression
            decode = compile_expression(fn_src)

            @F.pandas_udf(T.StringType())
            def decode_udf(vals: pd.Series) -> pd.Series:
                out = decode(vals.to_numpy(dtype=np.int64))
                return pd.Series(np.asarray(out, dtype=object).astype(str))

            df = df.withColumn(g, decode_udf(F.col(g)))
        elif not zonal.layer_is_float(env, g):
            df = df.withColumn(g, F.col(g).cast("long"))
    return df


def _finalize_pixels(df: DataFrame, query: ZonalQuery) -> DataFrame:
    return _order_and_limit(df, query, [])
