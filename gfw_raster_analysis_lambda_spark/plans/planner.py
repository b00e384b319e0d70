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
from ..sources.catalog import FROM_DATA, DataEnvironment, DerivedLayer, SourceLayer
from .ir import ZonalQuery

BROADCAST_CELL_LIMIT = 2_000_000  # aoi-cell rows we are happy to broadcast


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
    grid_name: str = "4/1024",
    per_aoi: bool = True,
    broadcast_aoi: bool | None = None,
) -> DataFrame:
    """Execute a zonal query; returns the final result DataFrame with one
    block of rows per AOI (column ``aoi_id`` first when ``per_aoi``)."""
    cells = aoi_cells(aoi_df, grid_name)
    if query.select_pixels:
        out = build_pixels(images, cells, query, env, grid_name, broadcast_aoi)
        return _finalize_pixels(out, query)
    partials = build_partials(images, cells, query, env, grid_name, broadcast_aoi)
    return finalize_partials(partials, query, env)


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
                aggs.append(
                    (F.sum(f"{a.alias}__sum") / F.sum(f"{a.alias}__cnt")).alias(a.alias)
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
        if not isinstance(layer, (SourceLayer, DerivedLayer)):
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
