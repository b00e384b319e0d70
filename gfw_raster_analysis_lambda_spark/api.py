"""Top-level API: run Raster-SQL zonal statistics over the images corpus.

The one-call equivalent of the reference's tiled_analysis entry point
(reference lambdas/tiled_analysis handler): parse -> plan -> execute,
returning the final Spark DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans.planner import run_zonal_query
from .plans.sql_frontend import parse_raster_sql
from .sources.catalog import DataEnvironment


def zonal_statistics(
    spark: SparkSession,
    images: DataFrame,
    aoi: DataFrame,
    sql: str,
    env: DataEnvironment,
    grid_name: str | None = None,
    **kwargs,
) -> DataFrame:
    query = parse_raster_sql(sql, env)
    return run_zonal_query(spark, images, aoi, query, env, grid_name, **kwargs)


def zonal_statistics_batch(
    spark: SparkSession,
    images: DataFrame,
    aoi: DataFrame,
    sql: str,
    env: DataEnvironment,
    grid_name: str | None = None,
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """AOI-list batch with a failed-geometry side output.

    The reference runs each geometry of a list through its own tiled
    analysis under a Step Functions distributed map with 100% tolerated
    failures, then splits the manifest into analysis results and
    ``failed_geometries.json`` (reference step_functions/process_list
    .json.tmpl:44-108 + lambdas/aggregation/src/lambda_function.py:12-99).
    Here the whole list is ONE Spark job; AOIs whose WKB cannot be parsed
    or repaired are diverted to the second returned DataFrame
    ``(aoi_id, error)`` instead of aborting the batch. Empty-extent AOIs
    are successes with empty results, matching the reference's e2e
    semantics (test_raster_analysis.py:463-473)."""
    from .functions import geometry as geo

    rows = aoi.select("aoi_id", "geom_wkb").collect()
    good, failed = [], []
    for r in rows:
        try:
            geom = geo.normalize(geo.wkb_loads(bytes(r["geom_wkb"])))
            geo.bounds(geom) if not geo.is_empty(geom) else None
            good.append((r["aoi_id"], bytes(r["geom_wkb"])))
        except Exception as exc:  # unparseable / irreparable geometry
            failed.append((r["aoi_id"], f"{type(exc).__name__}: {exc}"))
    good_df = spark.createDataFrame(good or [], "aoi_id string, geom_wkb binary")
    failed_df = spark.createDataFrame(failed or [], "aoi_id string, error string")
    query = parse_raster_sql(sql, env)
    result = run_zonal_query(spark, images, good_df, query, env, grid_name, **kwargs)
    return result, failed_df
