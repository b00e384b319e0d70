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
