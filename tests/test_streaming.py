"""Incremental zonal via Structured Streaming.

The hard cases round 1 got wrong (caught in review):

- a cell's layers arriving in DIFFERENT micro-batches (base layer today,
  filter layer tomorrow) — waves here are split BY LAYER so batch 1 has
  only `tcl_year` and batch 2 only `tcd_threshold`; the kernel zero-fills
  absent layers, so any design that computes from the batch's rows alone
  under-counts silently;
- a late layer SHRINKING a cell's result (the zero-filled filter layer
  passed pixels that the real data excludes) — stale partials must be
  overwritten, not appended to;
- replaying the stream must not double-count;
- FROM-data queries owe rows for AOI cells that never received any tile —
  exactly once, however many batches ran.
"""

import os

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.plans.ir import Aggregate, FilterLeaf, ZonalQuery
from gfw_raster_analysis_lambda_spark.plans.planner import run_zonal_query
from gfw_raster_analysis_lambda_spark.sources import fixtures
from gfw_raster_analysis_lambda_spark.sources.catalog import FROM_DATA
from gfw_raster_analysis_lambda_spark.sources.images import read_images, with_derived_keys
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


def _ingest(spark, stream_dir, batch_rows):
    spark.createDataFrame(batch_rows, fixtures.IMAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)


def _run_stream(spark, stream_dir, aoi, q, env, grid_name, out_dir):
    sq = incremental_zonal(spark, stream_dir, aoi, q, env, grid_name, out_dir)
    sq.awaitTermination(120)


@pytest.mark.slow
def test_incremental_matches_batch_layers_split_across_batches(spark, corpus, tmp_path):
    env = fixtures.fixture_environment()
    aoi = spark.read.parquet(corpus["aoi"])
    q = _query()

    # wave 1 = ONLY the base/group layer; wave 2 = ONLY the filter layer.
    # generate_images_rows emits layer-by-layer, so slicing by layer name
    # guarantees every cell's layer set straddles the two micro-batches.
    rows = fixtures.generate_images_rows()
    wave1 = [r for r in rows if r[0].startswith("tcl_year/")]
    wave2 = [r for r in rows if not r[0].startswith("tcl_year/")]
    assert wave1 and wave2
    stream_dir = str(tmp_path / "stream_images")
    out_dir = str(tmp_path / "inc")
    os.makedirs(stream_dir, exist_ok=True)

    def batch_result(images_path_or_rows):
        if isinstance(images_path_or_rows, str):
            imgs = read_images(spark, images_path_or_rows)
        else:
            imgs = with_derived_keys(
                spark.createDataFrame(images_path_or_rows, fixtures.IMAGES_SCHEMA)
            )
        return (
            run_zonal_query(spark, imgs, aoi, q, env, GRID_NAME)
            .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
        )

    # wave 1: base layer only. tcd_threshold zero-fills -> the IN (5,6,7)
    # filter excludes everything; the incremental result must equal the
    # batch engine run over exactly the wave-1 corpus (both empty here).
    _ingest(spark, stream_dir, wave1)
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    got1 = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )
    exp1 = batch_result(wave1)
    assert got1["n"].tolist() == exp1["n"].tolist()

    # wave 2: the filter layer lands late; touched cells recompute against
    # the full corpus and converge to the all-at-once batch result.
    _ingest(spark, stream_dir, wave2)
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    got = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )
    exp = batch_result(corpus["images"])
    assert got["aoi_id"].tolist() == exp["aoi_id"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    np.testing.assert_allclose(got["loss_ha"], exp["loss_ha"], rtol=1e-9)

    # replay: re-running with no new files must not change anything
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    again = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )
    assert again["n"].tolist() == got["n"].tolist()


@pytest.mark.slow
def test_incremental_late_filter_layer_shrinks_result(spark, corpus, tmp_path):
    """A late-arriving filter layer can legitimately REMOVE pixels that the
    zero-filled placeholder admitted; overwrite semantics (not append) must
    let the result shrink."""
    env = fixtures.fixture_environment()
    aoi = spark.read.parquet(corpus["aoi"])
    q = ZonalQuery(
        base_layer="tcl_year",
        aggregates=(Aggregate("count", None, "n"),),
        where=FilterLeaf("tcd_threshold", "==", (0,)),  # passes on zero-fill
    )
    rows = fixtures.generate_images_rows()
    wave1 = [r for r in rows if r[0].startswith("tcl_year/")]
    wave2 = [r for r in rows if r[0].startswith("tcd_threshold/")]
    stream_dir = str(tmp_path / "stream_images")
    out_dir = str(tmp_path / "inc")
    os.makedirs(stream_dir, exist_ok=True)

    _ingest(spark, stream_dir, wave1)
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    n1 = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir)
        .toPandas()["n"].sum()
    )
    assert n1 > 0  # zero-filled threshold == 0 admits pixels

    _ingest(spark, stream_dir, wave2)
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    got = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir)
        .toPandas().sort_values("aoi_id").reset_index(drop=True)
    )
    imgs = with_derived_keys(spark.createDataFrame(wave1 + wave2, fixtures.IMAGES_SCHEMA))
    exp = (
        run_zonal_query(spark, imgs, aoi, q, env, GRID_NAME)
        .toPandas().sort_values("aoi_id").reset_index(drop=True)
    )
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["n"].sum() < n1  # the real layer shrank the result


@pytest.mark.slow
def test_incremental_from_data_missing_cells_once(spark, corpus, tmp_path):
    """FROM-data: AOI cells with no ingested tiles still owe area rows —
    synthesized once at read time, regardless of how many batches ran."""
    env = fixtures.fixture_environment()
    aoi = spark.read.parquet(corpus["aoi"])
    q = ZonalQuery(
        base_layer=FROM_DATA,
        aggregates=(Aggregate("sum", "area__ha", "area_ha"),),
    )
    rows = fixtures.generate_images_rows(layers=["tcl_year"])
    half = len(rows) // 2
    stream_dir = str(tmp_path / "stream_images")
    out_dir = str(tmp_path / "inc")
    os.makedirs(stream_dir, exist_ok=True)

    _ingest(spark, stream_dir, rows[:half])
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    _ingest(spark, stream_dir, rows[half:])
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)

    got = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir, aoi_df=aoi)
        .toPandas().sort_values("aoi_id").reset_index(drop=True)
    )
    imgs = with_derived_keys(spark.createDataFrame(rows, fixtures.IMAGES_SCHEMA))
    exp = (
        run_zonal_query(spark, imgs, aoi, q, env, GRID_NAME)
        .toPandas().sort_values("aoi_id").reset_index(drop=True)
    )
    assert got["aoi_id"].tolist() == exp["aoi_id"].tolist()
    np.testing.assert_allclose(got["area_ha"], exp["area_ha"], rtol=1e-9)


@pytest.mark.slow
def test_incremental_multigrid_coarse_batch_triggers_recompute(spark, corpus, tmp_path):
    """A micro-batch carrying ONLY a coarser-grid layer (biomass on 4/512)
    must still trigger recompute: its cell ids live on the source grid and
    must be mapped onto the query-grid lookup (regression: the change
    signal used raw ids and silently skipped the batch forever)."""
    env = fixtures.fixture_environment()
    aoi = spark.read.parquet(corpus["aoi"])
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("count", None, "n"),),
        where=FilterLeaf("biomass", ">", (50,)),
    )
    rows = fixtures.generate_images_rows(layers=["tcl_year", "biomass"])
    wave1 = [r for r in rows if r[0].startswith("tcl_year/")]
    wave2 = [r for r in rows if r[0].startswith("biomass/")]
    assert wave1 and wave2
    stream_dir = str(tmp_path / "stream_images")
    out_dir = str(tmp_path / "inc")
    os.makedirs(stream_dir, exist_ok=True)

    _ingest(spark, stream_dir, wave1)
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    n1 = read_incremental_result(spark, q, env, GRID_NAME, out_dir).toPandas()["n"].sum()
    assert n1 == 0  # biomass zero-fills -> filter excludes everything

    _ingest(spark, stream_dir, wave2)  # coarse-grid cell ids only
    _run_stream(spark, stream_dir, aoi, q, env, GRID_NAME, out_dir)
    got = (
        read_incremental_result(spark, q, env, GRID_NAME, out_dir)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )
    imgs = with_derived_keys(spark.createDataFrame(rows, fixtures.IMAGES_SCHEMA))
    exp = (
        run_zonal_query(spark, imgs, aoi, q, env, GRID_NAME)
        .toPandas().sort_values(["aoi_id", "tcl_year"]).reset_index(drop=True)
    )
    assert got["n"].sum() > 0
    assert got["n"].tolist() == exp["n"].tolist()


def test_incremental_read_before_any_partials(spark, corpus, tmp_path):
    """read_incremental_result on an out_dir no batch has written yet must
    return the correct empty / FROM-data-synthesized result, not crash."""
    env = fixtures.fixture_environment()
    aoi = spark.read.parquet(corpus["aoi"])
    out_dir = str(tmp_path / "never_written")

    q = _query()
    assert read_incremental_result(spark, q, env, GRID_NAME, out_dir).count() == 0

    qd = ZonalQuery(
        base_layer=FROM_DATA,
        aggregates=(Aggregate("sum", "area__ha", "area_ha"),),
    )
    got = (
        read_incremental_result(spark, qd, env, GRID_NAME, out_dir, aoi_df=aoi)
        .toPandas().sort_values("aoi_id").reset_index(drop=True)
    )
    # FROM data with zero ingested tiles = full zero-filled AOI area
    empty_imgs = with_derived_keys(
        spark.createDataFrame([], fixtures.IMAGES_SCHEMA)
    )
    exp = (
        run_zonal_query(spark, empty_imgs, aoi, qd, env, GRID_NAME)
        .toPandas().sort_values("aoi_id").reset_index(drop=True)
    )
    assert got["aoi_id"].tolist() == exp["aoi_id"].tolist()
    np.testing.assert_allclose(got["area_ha"], exp["area_ha"], rtol=1e-9)


# over-bound AOI batches must be REFUSED by the streaming entry (its
# partial store is keyed on a driver broadcast — there is no distributed
# fallback shape here), and nothing unbounded may be collected first:
# the probe is relational, so no geometry bytes reach the driver.
def test_incremental_over_bound_aoi_batch_refused(spark, corpus, tmp_path, monkeypatch):
    from gfw_raster_analysis_lambda_spark.plans import planner
    from gfw_raster_analysis_lambda_spark.streaming import incremental as inc

    aoi = spark.read.parquet(corpus["aoi"])
    env = fixtures.fixture_environment()

    monkeypatch.setattr(planner, "DRIVER_ENUM_AOI_LIMIT", 1)

    def no_enum(*a, **k):
        raise AssertionError("over-bound batch reached driver-side enumeration")

    monkeypatch.setattr(planner, "_aoi_lookup_from_aois", no_enum)
    with pytest.raises(ValueError, match="broadcast bound"):
        incremental_zonal(
            spark, str(tmp_path / "stream"), aoi, _query(), env, GRID_NAME,
            str(tmp_path / "out"),
        )

    # same refusal when the batch is few rows but huge geometry payloads
    monkeypatch.setattr(planner, "DRIVER_ENUM_AOI_LIMIT", 100_000)
    monkeypatch.setattr(planner, "DRIVER_ENUM_WKB_BYTES", 8)
    with pytest.raises(ValueError, match="broadcast bound"):
        incremental_zonal(
            spark, str(tmp_path / "stream"), aoi, _query(), env, GRID_NAME,
            str(tmp_path / "out"),
        )


def test_incremental_focal_late_neighbor_converges(spark, tmp_path):
    """Incremental focal maintenance: a tile arriving LATE must trigger
    recomputation of its neighbors (their edge windows read its pixels),
    and the maintained table must converge to the batch focal_stats over
    the full corpus. Replays change nothing (idempotent overwrite)."""
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators import focal
    from gfw_raster_analysis_lambda_spark.streaming.focal_inc import (
        incremental_focal,
        read_incremental_focal,
    )

    rows = fixtures.generate_images_rows(layers=["tcl_year"])
    late_cell = int(G.cell_from_xy(fixtures.GRID, fixtures.X0 + 1, fixtures.Y0 + 1))
    late_hex = format(late_cell, "016x")
    wave1 = [r for r in rows if not r[0].endswith(late_hex)]
    wave2 = [r for r in rows if r[0].endswith(late_hex)]
    assert len(wave2) == 1
    stream_dir = str(tmp_path / "focal_images")
    out_dir = str(tmp_path / "focal_inc")
    os.makedirs(stream_dir, exist_ok=True)

    def batch_expected(batch_rows):
        imgs = with_derived_keys(
            spark.createDataFrame(batch_rows, fixtures.IMAGES_SCHEMA)
        )
        return {
            r["cell_id"]: (r["focal_sum"], r["focal_n"])
            for r in focal.focal_stats(imgs, radius=1).collect()
        }

    def run_once():
        sq = incremental_focal(spark, stream_dir, "tcl_year", out_dir)
        sq.awaitTermination(120)

    def current():
        return {
            r["cell_id"]: (r["focal_sum"], r["focal_n"])
            for r in read_incremental_focal(spark, out_dir, "tcl_year").collect()
        }

    _ingest(spark, stream_dir, wave1)
    run_once()
    got1 = current()
    assert got1 == batch_expected(wave1)
    # the missing interior tile shrank its neighbors' windows
    nbr = late_cell + (1 << G._Y_BITS)
    assert got1[nbr][1] < 9 * fixtures.TILE * fixtures.TILE

    _ingest(spark, stream_dir, wave2)
    run_once()
    got2 = current()
    assert got2 == batch_expected(rows)  # converged, incl. recomputed ring
    assert got2[nbr][1] > got1[nbr][1]
    assert late_cell in got2

    run_once()  # replay with no new files: nothing changes
    assert current() == got2


def test_incremental_kernel_param_maintains_terrain(spark, tmp_path):
    """The generalized kernel parameter: an incrementally-maintained
    TERRAIN table (Horn gradients) converges to the batch terrain_stats
    after a late interior tile arrives — same invalidation ring, the
    kernel is just a different member of the focal family."""
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.operators import focal
    from gfw_raster_analysis_lambda_spark.streaming.focal_inc import (
        incremental_focal,
        read_incremental_focal,
    )

    rows = fixtures.generate_images_rows(layers=["tcl_year"])
    late_cell = int(G.cell_from_xy(fixtures.GRID, fixtures.X0 + 1, fixtures.Y0 + 1))
    late_hex = format(late_cell, "016x")
    wave1 = [r for r in rows if not r[0].endswith(late_hex)]
    wave2 = [r for r in rows if r[0].endswith(late_hex)]
    stream_dir = str(tmp_path / "terr_images")
    out_dir = str(tmp_path / "terr_inc")
    os.makedirs(stream_dir, exist_ok=True)

    def batch_expected(batch_rows):
        imgs = with_derived_keys(
            spark.createDataFrame(batch_rows, fixtures.IMAGES_SCHEMA)
        )
        return {
            r["cell_id"]: (r["n_grad"], r["grad2_sum"], r["steep_n"])
            for r in focal.terrain_stats(imgs).collect()
        }

    def run_once():
        sq = incremental_focal(
            spark, stream_dir, "tcl_year", out_dir,
            kernel=focal.terrain_stats,
        )
        sq.awaitTermination(120)

    def current():
        return {
            r["cell_id"]: (r["n_grad"], r["grad2_sum"], r["steep_n"])
            for r in read_incremental_focal(spark, out_dir, "tcl_year").collect()
        }

    _ingest(spark, stream_dir, wave1)
    run_once()
    assert current() == batch_expected(wave1)

    _ingest(spark, stream_dir, wave2)
    run_once()
    got = current()
    assert got == batch_expected(rows)
    assert late_cell in got
