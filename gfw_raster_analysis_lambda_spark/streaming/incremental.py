"""Incremental zonal statistics over a growing images corpus
(Structured Streaming).

The reference has no streaming path — its "near-real-time" GLAD alert
layers are plain rasters re-read per request (reference
tests/fixtures/fixtures.py:170-189) and freshness comes from re-running
the analysis. At 10^12-image scale that re-scan is the wrong shape: this
module keeps zonal partials CONTINUOUSLY up to date as new tiles land.

Design: `readStream` over the images directory (file source tracks new
parquet files exactly-once via its own source checkpoint) ->
`foreachBatch` runs the per-cell zonal kernel on just the micro-batch's
tiles and APPENDS the (aoi, cell)-keyed partial rows to the same
partials/lineage layout the batch checkpoint layer uses. Because zonal
aggregates are associative partial sums, the up-to-date result is always
one `finalize_partials` over everything appended so far — no state store
needed, late tiles are just late partials, and a crashed stream resumes
from the source checkpoint without double-counting (micro-batch id keyed
idempotent writes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import query_fingerprint
from ..plans import planner
from ..plans.ir import ZonalQuery
from ..sources.catalog import DataEnvironment
from ..sources.images import with_derived_keys

IMAGES_SCHEMA_DDL = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def incremental_zonal(
    spark: SparkSession,
    images_dir: str,
    aoi_df: DataFrame,
    query: ZonalQuery,
    env: DataEnvironment,
    grid_name: str,
    out_dir: str,
    trigger_once: bool = True,
):
    """Start (and by default run-once) the incremental zonal stream.

    Returns the StreamingQuery. Partials accumulate under
    ``{out_dir}/partials/q={fingerprint}``; read the current result with
    :func:`read_incremental_result`. ``trigger_once=False`` leaves a
    continuous micro-batch stream running."""
    fp = query_fingerprint(query, env, grid_name)
    pdir = f"{out_dir}/partials/q={fp}"
    bdir = f"{out_dir}/batches/q={fp}"

    lookup, salted = planner._aoi_lookup_from_aois(
        spark, aoi_df.select("aoi_id", "geom_wkb").collect(), grid_name,
        planner.MAX_AOIS_PER_TASK,
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotence across restarts: a replayed micro-batch id skips
        done_marker = os.path.join(bdir, f"b={batch_id}")
        if os.path.exists(done_marker):
            return
        imgs = with_derived_keys(batch_df)
        partials = planner.build_partials_with_lookup(
            imgs, lookup, salted, query, env, grid_name
        ).withColumn("_batch", F.lit(batch_id))
        partials.write.mode("append").parquet(pdir)
        os.makedirs(done_marker, exist_ok=True)

    stream = (
        spark.readStream.schema(IMAGES_SCHEMA_DDL)
        .parquet(images_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", f"{out_dir}/source_ckpt/q={fp}")
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()


def read_incremental_result(
    spark: SparkSession,
    query: ZonalQuery,
    env: DataEnvironment,
    grid_name: str,
    out_dir: str,
) -> DataFrame:
    """The current zonal result over every tile ingested so far."""
    fp = query_fingerprint(query, env, grid_name)
    partials = spark.read.parquet(f"{out_dir}/partials/q={fp}").drop("_batch")
    return planner.finalize_partials(partials, query, env)
