"""Incremental zonal via Structured Streaming: tiles arriving in two
waves must converge to exactly the batch result, and a replayed stream
must not double-count."""

import os

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.plans.ir import Aggregate, FilterLeaf, ZonalQuery
from gfw_raster_analysis_lambda_spark.plans.planner import run_zonal_query
from gfw_raster_analysis_lambda_spark.sources import fixtures
from gfw_raster_analysis_lambda_spark.sources.images import read_images
from gfw_raster_analysis_lambda_spark.streaming import (
    incremental_zonal,
    read_incremental_result,
)

GRID_NAME = fixtures.GRID.name


def _query():
    return ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(
            Aggregate("sum", "area__ha", "loss_ha"),
            Aggregate("count", None, "n"),
        ),
        where=FilterLeaf("tcd_threshold", "in", (5, 6, 7)),
    )


@pytest.mark.slow
def test_incremental_matches_batch(spark, corpus, tmp_path):
    env = fixtures.fixture_environment()
    aoi = spark.read.parquet(corpus["aoi"])
    q = _query()

    rows = fixtures.generate_images_rows()
    half = len(rows) // 2
    stream_dir = str(tmp_path / "stream_images")
    out_dir = str(tmp_path / "inc")
    os.makedirs(stream_dir, exist_ok=True)

    def ingest(batch_rows, n):
        spark.createDataFrame(batch_rows, fixtures.IMAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        sq = incremental_zonal(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
        sq.awaitTermination(120)

    # wave 1: half the tiles
    ingest(rows[:half], 1)
    partial_result = read_incremental_result(spark, q, env, GRID_NAME, out_dir).toPandas()
    assert len(partial_result) > 0

    # wave 2: the rest; a second availableNow run picks up only new files
    ingest(rows[half:], 2)
    got = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )

    exp = (
        run_zonal_query(spark, read_images(spark, corpus["images"]),
                        aoi, q, env, GRID_NAME)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )
    assert got["aoi_id"].tolist() == exp["aoi_id"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    np.testing.assert_allclose(got["loss_ha"], exp["loss_ha"], rtol=1e-9)

    # replay: re-running with no new files must not change anything
    sq = incremental_zonal(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    sq.awaitTermination(120)
    again = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )
    assert again["n"].tolist() == got["n"].tolist()
