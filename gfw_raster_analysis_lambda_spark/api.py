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


def zonal_statistics_multi(
    spark: SparkSession,
    images: DataFrame,
    aoi: DataFrame,
    sqls: "dict[str, str]",
    env: DataEnvironment,
    grid_name: str | None = None,
    **kwargs,
) -> "dict[str, DataFrame]":
    """Run a WHOLE Raster-SQL query set over one AOI batch in a single
    fused pass (shared scan/decode/rasterize — the reference runs its
    per-request query set serially; see plans.planner.run_zonal_queries)."""
    from .plans.planner import run_zonal_queries

    queries = {name: parse_raster_sql(s, env) for name, s in sqls.items()}
    return run_zonal_queries(spark, images, aoi, queries, env, grid_name, **kwargs)


def aoi_from_geojson(
    spark: SparkSession,
    src,
    id_property: str = "id",
    simplify_tolerance: float | None = None,
) -> DataFrame:
    """Normalize GeoJSON input to the engine's AOI table
    ``(aoi_id string, geom_wkb binary)``.

    The reference's preprocessing lambda accepts a feature collection, a
    single feature/geometry, or a file URI and emits the geometry list the
    analysis fans out over (reference lambdas/preprocessing/src/
    lambda_function.py:30-90). ``src`` here is a path to a ``.geojson``
    file, an already-parsed GeoJSON ``dict``, or a ``list`` of features.
    Accepted shapes: FeatureCollection, Feature, bare Polygon /
    MultiPolygon. Geometries get the engine's validity repair
    (:func:`functions.geometry.normalize` — degenerate rings dropped).

    AOI ids come from the feature ``id`` field, then
    ``properties[id_property]``, then a stable ``feature_{i}`` fallback.

    Parsing is driver-side (GeoJSON is a single-document format and this
    mirrors the reference's preprocessing step); country-scale AOI batches
    should land as parquet and skip this helper entirely."""
    import json as _json

    import numpy as np

    from .functions import geometry as geo

    if isinstance(src, str):
        with open(src) as f:
            src = _json.load(f)
    if isinstance(src, dict):
        t = src.get("type")
        if t == "FeatureCollection":
            features = src.get("features", [])
        elif t == "Feature":
            features = [src]
        elif t in ("Polygon", "MultiPolygon"):
            features = [{"type": "Feature", "geometry": src, "properties": {}}]
        else:
            raise ValueError(f"unsupported GeoJSON type: {t!r}")
    elif isinstance(src, list):
        features = src
    else:
        raise TypeError("src must be a path, GeoJSON dict, or feature list")

    rows = []
    for i, feat in enumerate(features):
        g = feat.get("geometry") or {}
        gt = g.get("type")
        coords = g.get("coordinates", [])
        if gt == "Polygon":
            polys = [coords]
        elif gt == "MultiPolygon":
            polys = coords
        else:
            raise ValueError(
                f"feature {i}: unsupported geometry type {gt!r} "
                "(Polygon/MultiPolygon only)"
            )
        geom = [
            [np.asarray(ring, dtype=np.float64)[:, :2] for ring in poly]
            for poly in polys
        ]
        geom = geo.normalize(geom)
        if simplify_tolerance:
            # huge-vertex AOIs inflate the broadcast AOI-cell lookup; the
            # reference's progressive simplify fallback, made opt-in here
            geom = geo.simplify(geom, simplify_tolerance)
        props = feat.get("properties") or {}
        # RFC 7946 allows id 0 / "": falsy ids are still ids
        aoi_id = feat.get("id")
        if aoi_id is None:
            aoi_id = props.get(id_property)
        if aoi_id is None:
            aoi_id = f"feature_{i}"
        rows.append((str(aoi_id), geo.wkb_dumps(geom)))
    return spark.createDataFrame(rows or [], "aoi_id string, geom_wkb binary")


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
    ).persist()  # good/failed splits and the planner probe each drive an
    # action; without the persist the WKB parse+repair would re-run per
    # consumer (3-4x on exactly the country-scale batches this targets)
    good_df = checked.filter(F.col("_err").isNull()).drop("_err")
    failed_df = checked.filter(F.col("_err").isNotNull()).select(
        "aoi_id", F.col("_err").alias("error")
    )
    query = parse_raster_sql(sql, env)
    result = run_zonal_query(spark, images, good_df, query, env, grid_name, **kwargs)
    return result, failed_df
