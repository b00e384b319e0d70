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
    semantics (test_raster_analysis.py:463-473).

    Validation runs DISTRIBUTED (an Arrow-batched pandas UDF per
    partition) and the split is relational — nothing is collected to the
    driver, so the "one job for the whole list" claim holds for the
    country-scale batches that motivated it."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .functions import geometry as geo

    # no type hints: `from __future__ import annotations` stringifies
    # them and Spark's hint inference cannot resolve the local pd import
    @F.pandas_udf(T.StringType())
    def validation_error(wkbs):
        out = []
        for w in wkbs:
            try:
                geom = geo.normalize(geo.wkb_loads(bytes(w)))
                if not geo.is_empty(geom):
                    geo.bounds(geom)
                out.append(None)
            except Exception as exc:  # unparseable / irreparable geometry
                out.append(f"{type(exc).__name__}: {exc}")
        return pd.Series(out, dtype=object)

    checked = aoi.select("aoi_id", "geom_wkb").withColumn(
        "_err", validation_error("geom_wkb")
    )
    good_df = checked.filter(F.col("_err").isNull()).drop("_err")
    failed_df = checked.filter(F.col("_err").isNotNull()).select(
        "aoi_id", F.col("_err").alias("error")
    )
    query = parse_raster_sql(sql, env)
    result = run_zonal_query(spark, images, good_df, query, env, grid_name, **kwargs)
    return result, failed_df
