"""End-to-end: Spark zonal engine vs the single-process numpy oracle.

One test per reference e2e shape (SURVEY.md section 5 / FIXTURES.md
section 4): grouped masked sums, ungrouped area sums, categorical decode,
default-meaning groups, NoData semantics, packed-date derivation, isoweek,
order/limit, pixel-row selects, empty extents, degenerate geometry.
Tolerances follow the reference's own tests: exact for counts, rel 1e-9
here (same kernels both sides; the reference uses 1e-2 against *foreign*
goldens)."""

import numpy as np
import pandas as pd
import pytest

from gfw_raster_analysis_lambda_spark import oracle
from gfw_raster_analysis_lambda_spark.plans.ir import (
    Aggregate,
    FilterAnd,
    FilterLeaf,
    FilterOr,
    OrderBy,
    ZonalQuery,
)
from gfw_raster_analysis_lambda_spark.plans.planner import run_zonal_query
from gfw_raster_analysis_lambda_spark.sources import fixtures
from gfw_raster_analysis_lambda_spark.sources.catalog import DataEnvironment
from gfw_raster_analysis_lambda_spark.sources.images import read_images

GRID_NAME = fixtures.GRID.name


@pytest.fixture(scope="module")
def env():
    return fixtures.fixture_environment()


@pytest.fixture(scope="module")
def tables(spark, corpus):
    images = read_images(spark, corpus["images"])
    aoi = spark.read.parquet(corpus["aoi"])
    return images, aoi


def run_both(spark, tables, env, query, aois=None):
    images, aoi_df = tables
    aois = aois or [a for a in fixtures.fixture_aois()]
    ids = [a[0] for a in aois]
    aoi_df = aoi_df.filter(aoi_df.aoi_id.isin(ids))
    got = (
        run_zonal_query(spark, images, aoi_df, query, env, GRID_NAME)
        .toPandas()
        .reset_index(drop=True)
    )
    exp = oracle.run_oracle(query, env, aois)
    return got, exp


def assert_frames_match(got: pd.DataFrame, exp: pd.DataFrame, sort_cols=None):
    assert list(got.columns) == list(exp.columns), f"{got.columns} vs {exp.columns}"
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}\n{got}\n{exp}"
    if len(exp) == 0:
        return
    sort_cols = sort_cols or list(got.columns)
    g = got.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    e = exp.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    for c in got.columns:
        if np.issubdtype(np.asarray(e[c]).dtype, np.number):
            np.testing.assert_allclose(
                g[c].to_numpy(dtype=np.float64),
                e[c].to_numpy(dtype=np.float64),
                rtol=1e-9,
                atol=1e-12,
                err_msg=f"column {c}",
            )
        else:
            assert g[c].astype(str).tolist() == e[c].astype(str).tolist(), f"column {c}"


# 1. grouped masked sum + alias (reference test:269-286)
def test_grouped_masked_area_sum(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(
            Aggregate("sum", "area__ha", "loss_ha"),
            Aggregate("sum", "emissions_Mg", "emissions"),
        ),
        where=FilterAnd(
            (
                FilterLeaf("is_primary", "in", (1,)),  # = 'true' encoded
                FilterLeaf("tcd_threshold", "in", (5, 6, 7)),  # >= 30 encoded
            )
        ),
    )
    got, exp = run_both(spark, tables, env, q)
    assert len(got) > 10
    assert_frames_match(got, exp)


# 2. ungrouped area sum FROM data (reference test:342-352)
def test_ungrouped_area_sum_from_data(spark, tables, env):
    q = ZonalQuery(
        base_layer="data",
        aggregates=(Aggregate("sum", "area__ha", "area_ha"),),
    )
    aois = [a for a in fixtures.fixture_aois() if a[0] == "aoi_box_aligned"]
    got, exp = run_both(spark, tables, env, q, aois)
    assert_frames_match(got, exp)
    # grid-snapped 2x2-cell box: mask = full tiles -> analytic pixel count
    # appears via area: got == 4 tiles * 64*64 px * pixel_area summed per tile
    assert len(got) == 1 and got.area_ha[0] > 0


# 3. OR filter + multi-agg no-group (reference test:476-496)
def test_multi_agg_or_filter(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        aggregates=(
            Aggregate("count", None, "n"),
            Aggregate("sum", "emissions", "em_sum"),
            Aggregate("avg", "emissions", "em_avg"),
            Aggregate("min", "emissions", "em_min"),
            Aggregate("max", "emissions", "em_max"),
        ),
        where=FilterOr(
            (
                FilterLeaf("tcl_year", ">=", (15,)),
                FilterLeaf("is_primary", "in", (1,)),
            )
        ),
    )
    got, exp = run_both(spark, tables, env, q)
    assert_frames_match(got, exp)


# 4. two-column group-by + order (reference test:373-382)
def test_two_column_groupby_order(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year", "tcd_threshold"),
        aggregates=(Aggregate("count", None, "n"),),
        order_by=(
            OrderBy("n", ascending=False),
            OrderBy("tcl_year", ascending=True),  # deterministic tie-break
            OrderBy("tcd_threshold", ascending=True),
        ),
        limit=100,
    )
    got, exp = run_both(spark, tables, env, q)
    # order-by with ties is nondeterministic across engines: compare sets
    assert_frames_match(
        got.sort_values(list(got.columns)).reset_index(drop=True),
        exp.sort_values(list(exp.columns)).reset_index(drop=True),
    )


# 5. categorical decode incl. default_meaning (reference test:431-446, 573-595)
def test_categorical_decode_default_meaning(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("drivers",),
        aggregates=(Aggregate("sum", "area__ha", "area_ha"),),
    )
    got, exp = run_both(spark, tables, env, q)
    assert "Unknown" in set(got["drivers"])  # raw 0 kept via default_meaning
    assert_frames_match(got, exp)


# 6. packed date decode + isoweek regroup (reference test:385-394)
def test_isoweek_count(spark, tables, env):
    q = ZonalQuery(
        base_layer="alert_date_conf",
        group_layers=("alert_date",),
        aggregates=(Aggregate("count", None, "alert_count"),),
        isoweek_layers=("alert_date",),
    )
    got, exp = run_both(spark, tables, env, q)
    assert list(got.columns) == ["aoi_id", "alert_date__isoyear", "alert_date__isoweek", "alert_count"]
    assert_frames_match(got, exp)


# 7. derived __ha auto-layer (reference test:533-548)
def test_auto_ha_derivation(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("sum", "tcl__ha", "tcl_ha"),),
    )
    # tcl__ha should auto-derive from tcl_year via where(A > 0, area, 0)
    got, exp = run_both(spark, tables, env, q)
    assert_frames_match(got, exp)


# 8. NoData=255 + NoData=None semantics (reference test:551-641)
def test_nodata_255_and_none(spark, tables, env):
    q = ZonalQuery(
        base_layer="ttc_percent",
        aggregates=(Aggregate("count", None, "n"), Aggregate("avg", "ttc_percent", "m")),
    )
    got, exp = run_both(spark, tables, env, q)
    assert_frames_match(got, exp)
    # photo has no_data=None: FROM photo masks nothing
    q2 = ZonalQuery(base_layer="photo", aggregates=(Aggregate("count", None, "n"),))
    got2, exp2 = run_both(spark, tables, env, q2)
    assert_frames_match(got2, exp2)


# 9. empty extent -> empty result (reference test:463-473)
def test_empty_extent(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("sum", "area__ha", "a"),),
    )
    aois = [a for a in fixtures.fixture_aois() if a[0] == "aoi_outside"]
    got, exp = run_both(spark, tables, env, q, aois)
    assert len(got) == 0 and len(exp) == 0


# 10. degenerate self-touching polygon still runs (buffer(0) parity)
def test_degenerate_polygon_repair(spark, tables, env):
    q = ZonalQuery(base_layer="data", aggregates=(Aggregate("count", None, "n"),))
    aois = [a for a in fixtures.fixture_aois() if a[0] == "aoi_degenerate"]
    got, exp = run_both(spark, tables, env, q, aois)
    assert_frames_match(got, exp)
    assert got.n[0] > 0


# 11. concave multipolygon with hole + island
def test_concave_hole_geometry(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("count", None, "n"),),
    )
    aois = [a for a in fixtures.fixture_aois() if a[0] == "aoi_concave_hole"]
    got, exp = run_both(spark, tables, env, q, aois)
    assert_frames_match(got, exp)


# 12. pixel-row select with lat/lon (reference test:302-316)
def test_pixel_select_latlon(spark, tables, env):
    q = ZonalQuery(
        base_layer="alert_date_conf",
        select_pixels=("latitude", "longitude", "alert_date", "alert_conf"),
        where=FilterLeaf("alert_conf", "==", (3,)),
    )
    aois = [a for a in fixtures.fixture_aois() if a[0] == "aoi_box_offset"]
    got, exp = run_both(spark, tables, env, q, aois)
    got = got.drop(columns=["aoi_id"])
    exp = exp.drop(columns=["aoi_id"])
    assert_frames_match(got, exp, sort_cols=["latitude", "longitude"])
    assert (got["alert_conf"] == 3.0).all()


# 13. compat AVG quirk (A3): per-group sums divided by tile total
def test_compat_avg_quirk(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("is_primary",),
        aggregates=(Aggregate("avg", "emissions", "m"),),
        compat_avg=True,
    )
    images, aoi_df = (t for t in tables)
    aois = [a for a in fixtures.fixture_aois() if a[0] == "aoi_box_aligned"]
    got, _ = run_both(spark, tables, env, q, aois)
    q2 = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("is_primary",),
        aggregates=(Aggregate("avg", "emissions", "m"),),
        compat_avg=False,
    )
    got2, exp2 = run_both(spark, tables, env, q2, aois)
    assert_frames_match(got2, exp2)
    # the quirk mode gives different (smaller) numbers than the true mean
    assert (got["m"].to_numpy() != got2["m"].to_numpy()).any()


# 14. strategy parity: aoi_cell / cell / salted-cell / colocated must agree
def _parity_query():
    return ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(
            Aggregate("sum", "area__ha", "loss_ha"),
            Aggregate("count", None, "n"),
        ),
        where=FilterLeaf("tcd_threshold", "in", (5, 6, 7)),
    )


def test_strategy_parity_cell_vs_aoi_cell(spark, tables, env):
    images, aoi_df = tables
    q = _parity_query()
    ref = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="aoi_cell").toPandas()
    got = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell").toPandas()
    assert_frames_match(got, ref)


def test_prepared_aoi_index_parity(spark, tables, env):
    """A prepared AoiIndex (enumerate+salt+broadcast once, reuse across
    queries) must produce bit-identical results to the per-query path, and
    reject grid mismatches."""
    from gfw_raster_analysis_lambda_spark.plans import planner

    images, aoi_df = tables
    q = _parity_query()
    idx = planner.prepare_aoi_index(spark, aoi_df, GRID_NAME)
    assert idx is not None
    ref = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell").toPandas()
    got = run_zonal_query(
        spark, images, aoi_df, q, env, GRID_NAME, strategy="cell", aoi_index=idx
    ).toPandas()
    assert_frames_match(got, ref)
    # second query over the SAME index (the amortization the API exists for)
    q2 = ZonalQuery(
        base_layer="tcl_year",
        aggregates=(Aggregate("count", None, "n"),),
    )
    ref2 = run_zonal_query(spark, images, aoi_df, q2, env, GRID_NAME, strategy="cell").toPandas()
    got2 = run_zonal_query(
        spark, images, aoi_df, q2, env, GRID_NAME, strategy="cell", aoi_index=idx
    ).toPandas()
    assert_frames_match(got2, ref2)
    with pytest.raises(ValueError, match="prepared on grid"):
        run_zonal_query(
            spark, images, aoi_df, q, env, "4/4096", strategy="cell", aoi_index=idx
        )


def test_strategy_parity_salted(spark, tables, env):
    from gfw_raster_analysis_lambda_spark.plans import planner

    images, aoi_df = tables
    q = _parity_query()
    ref = planner.finalize_partials(
        planner.build_partials_by_cell(images, aoi_df, q, env, GRID_NAME), q, env
    ).toPandas()
    # max_aois_per_task=1 -> every multi-AOI cell gets salted replicas
    salted = planner.finalize_partials(
        planner.build_partials_by_cell(
            images, aoi_df, q, env, GRID_NAME, max_aois_per_task=1
        ),
        q, env,
    ).toPandas()
    assert_frames_match(salted, ref)


def test_strategy_parity_colocated(spark, tables, env, tmp_path):
    from gfw_raster_analysis_lambda_spark.sources.images import (
        images_cell_sorted,
        write_images_cell_sorted,
    )

    images, aoi_df = tables
    path = str(tmp_path / "sorted_images")
    write_images_cell_sorted(images.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    ), path, n_files=5)
    assert images_cell_sorted(path)
    sorted_images = read_images(spark, path)
    q = _parity_query()
    ref = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell").toPandas()
    got = run_zonal_query(
        spark, sorted_images, aoi_df, q, env, GRID_NAME, strategy="colocated"
    ).toPandas()
    assert_frames_match(got, ref)


def test_strategy_parity_pixel_mode(spark, tables, env):
    images, aoi_df = tables
    q = ZonalQuery(
        base_layer="tcl_year",
        select_pixels=("latitude", "longitude", "tcl_year"),
        where=FilterLeaf("tcd_threshold", "in", (6, 7)),
    )
    ref = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="aoi_cell").toPandas()
    got = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell").toPandas()
    assert_frames_match(
        got.sort_values(list(got.columns)).reset_index(drop=True),
        ref.sort_values(list(ref.columns)).reset_index(drop=True),
    )


def test_lookup_paths_agree(spark, tables):
    from gfw_raster_analysis_lambda_spark.plans import planner

    _, aoi_df = tables
    rows = aoi_df.select("aoi_id", "geom_wkb").collect()
    b1, s1 = planner._aoi_lookup_from_aois(spark, rows, GRID_NAME, 64)
    b2, s2 = planner._aoi_lookup(spark, planner.aoi_cells(aoi_df, GRID_NAME), 64)
    assert s1 == s2
    assert b1.value == b2.value


# 15. finest-grid co-registration: biomass lives on 4/512 (2x coarser);
# querying it with 4/1024 layers must upsample it inside the kernel
def test_multigrid_coarse_layer_upsample(spark, tables, env):
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(
            Aggregate("sum", "biomass", "bio_sum"),
            Aggregate("count", None, "n"),
        ),
        where=FilterLeaf("biomass", ">", (50,)),
    )
    got, exp = run_both(spark, tables, env, q)
    assert len(got) > 10
    assert_frames_match(got, exp)


def test_multigrid_target_grid_resolution(spark, tables, env):
    from gfw_raster_analysis_lambda_spark.plans import planner

    # finest rule: biomass-only query resolves to its native 4/512 grid
    q1 = ZonalQuery(base_layer="biomass", aggregates=(Aggregate("count", None, "n"),))
    assert planner.resolve_target_grid(q1, env, None) == "4/512"
    # mixed query resolves to the finest grid among its layers
    q2 = ZonalQuery(
        base_layer="tcl_year",
        aggregates=(Aggregate("sum", "biomass", "b"),),
    )
    assert planner.resolve_target_grid(q2, env, None) == "4/1024"
    assert planner.resolve_target_grid(q2, env, "4/2048") == "4/2048"


def test_streaming_cells_regroup_unit():
    """_streaming_cells must reassemble cells that span Arrow batch
    boundaries (incl. one cell spanning 3 batches) and call the kernel
    exactly once per cell with all its rows."""
    import pandas as pd

    from gfw_raster_analysis_lambda_spark.plans.planner import _streaming_cells

    calls = []

    def fake_kernel(pdf):
        calls.append((int(pdf["cell_id"].iloc[0]), len(pdf)))
        return pd.DataFrame({"cell_id": [int(pdf["cell_id"].iloc[0])], "n": [len(pdf)]})

    def batches():
        # cell 1 (2 rows) | cell 2 spans 3 batches (1+2+1) | cell 3 (1 row)
        yield pd.DataFrame({"cell_id": [1, 1, 2]})
        yield pd.DataFrame({"cell_id": [2, 2]})
        yield pd.DataFrame({"cell_id": [2, 3]})
        yield pd.DataFrame({"cell_id": []}).astype({"cell_id": "int64"})

    out = list(_streaming_cells(fake_kernel)(batches()))
    assert calls == [(1, 2), (2, 4), (3, 1)]
    assert len(out) == 3


# 16. generic-kernel path (NaN aggregate layer) + isoweek groups + a
# zero-masked AOI sharing a cell with a nonzero AOI: the empty AOI's
# column set must match the raw group names the nonzero AOIs emit
# (regression: mixed g vs g__isoyear/g__isoweek keys crashed the task)
def test_generic_path_isoweek_zero_masked_aoi(spark, tables, env):
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo

    q = ZonalQuery(
        base_layer="alert_date_conf",
        group_layers=("alert_date",),
        aggregates=(Aggregate("sum", "emissions", "em_sum"),),  # NaN -> generic
        isoweek_layers=("alert_date",),
    )
    # both AOIs intersect the same fixture cell (lon 10..10.25, lat 20.75..21);
    # the sliver sits between pixel-center columns so it rasterizes to ZERO px
    normal = ("aoi_norm", geo.wkb_dumps(geo.box(10.01, 20.80, 10.20, 20.95)))
    sliver = ("aoi_sliver", geo.wkb_dumps(geo.box(10.0021, 20.80, 10.0035, 20.95)))
    images, _ = tables
    aoi_df = spark.createDataFrame([normal, sliver], "aoi_id string, geom_wkb binary")
    got = (
        run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell")
        .toPandas().reset_index(drop=True)
    )
    exp = (
        run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="aoi_cell")
        .toPandas().reset_index(drop=True)
    )
    assert set(got["aoi_id"]) == {"aoi_norm"}  # sliver legitimately empty
    assert_frames_match(got, exp)


# 17. colocated scans must never split a file across tasks (a cell
# straddling a split is processed by two tasks, each zero-filling the
# other's layers). The writer records max_file_bytes; read_images raises
# maxPartitionBytes + openCostInBytes above it (split size is
# min(maxPartitionBytes, max(openCost, bytesPerCore)), and bytesPerCore
# shrinks under pruning, so both knobs matter).
def test_colocated_split_safe_guard(spark, corpus, env, tmp_path):
    from pyspark.sql import functions as F

    from gfw_raster_analysis_lambda_spark.sources.images import (
        _parse_bytes,
        read_images,
        write_images_cell_sorted,
    )

    path = str(tmp_path / "cs_small_groups")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", "16384")  # many row groups per file
    try:
        write_images_cell_sorted(spark.read.parquet(corpus["images"]), path, n_files=1)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)

    keys = ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set(keys[0], "65536")
        spark.conf.set(keys[1], "0")

        def cells_spanning_tasks(df):
            return (
                df.select("cell_id")
                .withColumn("pid", F.spark_partition_id())
                .groupBy("cell_id").agg(F.countDistinct("pid").alias("np"))
                .filter("np > 1").count()
            )

        # hazard is real: a guard-less read at this conf splits cells
        assert cells_spanning_tasks(spark.read.parquet(path)) > 0

        # read_images applies the guard: confs bumped, no cell splits,
        # and the colocated result matches the shuffle-join plan
        images = read_images(spark, path)
        assert _parse_bytes(spark.conf.get(keys[0])) > 65536
        assert _parse_bytes(spark.conf.get(keys[1])) > 0
        assert cells_spanning_tasks(images) == 0

        q = ZonalQuery(
            base_layer="tcl_year",
            group_layers=("tcl_year",),
            aggregates=(Aggregate("count", None, "n"),),
        )
        aois = fixtures.fixture_aois()[:2]
        aoi_df = spark.createDataFrame(aois, "aoi_id string, geom_wkb binary")
        got = (
            run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME,
                            strategy="colocated")
            .toPandas().reset_index(drop=True)
        )
        exp = (
            run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME,
                            strategy="aoi_cell")
            .toPandas().reset_index(drop=True)
        )
        assert_frames_match(got, exp)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# 18. broadcast-volume guard: an AOI batch whose aoi-cell map exceeds
# BROADCAST_CELL_LIMIT must take the distributed shuffle-join plan —
# nothing collected to the driver — and agree with the broadcast plan
def test_auto_fallback_over_broadcast_limit(spark, tables, env, monkeypatch):
    from gfw_raster_analysis_lambda_spark.plans import planner

    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("count", None, "n"),),
    )
    images, _ = tables
    aois = fixtures.fixture_aois()[:2]
    aoi_df = spark.createDataFrame(aois, "aoi_id string, geom_wkb binary")
    exp = (
        run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell")
        .toPandas().reset_index(drop=True)
    )

    monkeypatch.setattr(planner, "BROADCAST_CELL_LIMIT", 2)  # force over-bound
    took = {}
    orig = planner.build_partials

    def spy(images_, cells_, query_, env_, grid_name_, broadcast_aoi=None):
        took["shuffle_plan"] = True
        assert broadcast_aoi is False
        return orig(images_, cells_, query_, env_, grid_name_, broadcast_aoi)

    monkeypatch.setattr(planner, "build_partials", spy)

    def no_collect(*a, **k):
        raise AssertionError("over-bound batch collected the cell map to the driver")

    monkeypatch.setattr(planner, "_aoi_lookup", no_collect)
    got = (
        run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell")
        .toPandas().reset_index(drop=True)
    )
    assert took.get("shuffle_plan")
    assert_frames_match(got, exp)


# 19. colocated hot-cell diversion: a cell stacked with hundreds of AOIs
# must not serialize into one colocated task — it takes the salted cell
# plan while cold cells keep the zero-shuffle stream; results must match
# the reference-shaped aoi_cell plan exactly
def test_colocated_hot_cell_diversion(spark, corpus, env, tmp_path, monkeypatch):
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo
    from gfw_raster_analysis_lambda_spark.plans import planner
    from gfw_raster_analysis_lambda_spark.sources.images import (
        read_images,
        write_images_cell_sorted,
    )

    path = str(tmp_path / "cs_hot")
    write_images_cell_sorted(spark.read.parquet(corpus["images"]), path)
    images = read_images(spark, path)

    # 300 tiny AOIs stacked inside ONE cell (lon 10..10.25, lat 20.75..21)
    # -> n_salt = ceil(300/64) = 5 salted slices; plus two normal AOIs
    rows = []
    for i in range(300):
        lon = 10.01 + (i % 20) * 0.011
        lat = 20.76 + (i // 20) * 0.015
        rows.append((f"hot_{i:03d}", geo.wkb_dumps(geo.box(lon, lat, lon + 0.009, lat + 0.012))))
    rows += [(a, w) for a, w in fixtures.fixture_aois()[:2]]
    aoi_df = spark.createDataFrame(rows, "aoi_id string, geom_wkb binary")

    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("count", None, "n"),),
    )

    took = {}
    orig = planner._salted_cell_plan

    def spy(spark_, imgs_, salted_, wrapped_, schema_):
        took["salted"] = dict(salted_)
        return orig(spark_, imgs_, salted_, wrapped_, schema_)

    monkeypatch.setattr(planner, "_salted_cell_plan", spy)
    got = (
        run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="colocated")
        .toPandas().reset_index(drop=True)
    )
    assert took["salted"] and max(took["salted"].values()) >= 5  # diverted + salted
    exp = (
        run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="aoi_cell")
        .toPandas().reset_index(drop=True)
    )
    assert_frames_match(got, exp)


def test_auto_strategy_prefers_colocated_on_sorted_layout(spark, tables, env, tmp_path):
    """strategy=None over a read_images() frame from a cell-sorted layout
    must take the zero-shuffle colocated plan (MapInPandas, no grouped
    shuffle) and match the explicit cell strategy's results."""
    from gfw_raster_analysis_lambda_spark.sources.images import (
        read_images,
        write_images_cell_sorted,
    )

    images, aoi_df = tables
    path = str(tmp_path / "auto_sorted")
    write_images_cell_sorted(images.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    ), path, n_files=5)
    sorted_images = read_images(spark, path)
    q = _parity_query()
    auto = run_zonal_query(spark, sorted_images, aoi_df, q, env, GRID_NAME)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan  # no grouped-shuffle kernel
    ref = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell").toPandas()
    assert_frames_match(auto.toPandas(), ref)
    # a frame NOT read from a sorted layout keeps the cell plan
    plain = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME)
    plan2 = plain._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan2


def test_fused_multi_query_parity(spark, tables, env):
    """run_zonal_queries (one fused kernel pass for the whole query set)
    must produce bit-identical results to per-query execution, across a
    mixed set: grouped masked sum, FROM_DATA area (missing-cell union),
    and an isoweek date query."""
    from gfw_raster_analysis_lambda_spark.plans.planner import run_zonal_queries

    images, aoi_df = tables
    qs = {
        "grouped": _parity_query(),
        "from_data": ZonalQuery(
            base_layer="data",
            aggregates=(Aggregate("sum", "area__ha", "area_ha"),
                        Aggregate("count", None, "n_px")),
        ),
        "isoweek": ZonalQuery(
            base_layer="alert_date_conf",
            group_layers=("alert_date",),
            aggregates=(Aggregate("count", None, "alert_count"),),
            isoweek_layers=("alert_date",),
        ),
        "minmax": ZonalQuery(
            base_layer="tcl_year",
            aggregates=(Aggregate("min", "emissions", "em_min"),
                        Aggregate("max", "emissions", "em_max"),
                        Aggregate("avg", "emissions", "em_avg")),
        ),
    }
    fused = run_zonal_queries(spark, images, aoi_df, qs, env, GRID_NAME)
    for name, q in qs.items():
        single = run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME).toPandas()
        got = fused[name].toPandas()
        assert_frames_match(got, single)
    # the fused partial frame is cached once, shared by every result, and
    # released through the explicit handle (not a fragile DataFrame attr)
    assert fused._partials is not None
    assert fused._partials.storageLevel.useMemory
    fused.close()
    assert fused._partials is None


def test_fused_set_with_rollups_shares_kernel(spark, tables, env, monkeypatch):
    """A query set mixing plain aggregates with percentile / mode /
    count_distinct members must FUSE: the rollup members' inner
    count-by-value queries join the one shared kernel pass (their
    partials are the bincount rows the fused kernel already produces)
    and only the cheap relational finisher runs per member. Results are
    bit-identical to per-query execution."""
    from gfw_raster_analysis_lambda_spark.plans import planner
    from gfw_raster_analysis_lambda_spark.plans.ir import Aggregate as Agg
    from gfw_raster_analysis_lambda_spark.plans.planner import run_zonal_queries

    images, aoi_df = tables
    qs = {
        "grouped": _parity_query(),
        "p50": ZonalQuery(
            base_layer="ttc_percent",
            aggregates=(Agg("percentile", "ttc_percent", "p50", param=0.5),),
        ),
        "rollup_multi": ZonalQuery(
            base_layer="ttc_percent",
            aggregates=(
                Agg("percentile", "ttc_percent", "p25", param=0.25),
                Agg("count_distinct", "ttc_percent", "n_vals"),
                Agg("variance", "ttc_percent", "ttc_var"),
                Agg("stddev", "ttc_percent", "ttc_sd"),
            ),
        ),
        "major": ZonalQuery(
            base_layer="tcl_year",
            aggregates=(Agg("mode", "drivers", "major_driver"),),
        ),
    }
    singles = {
        name: run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME).toPandas()
        for name, q in qs.items()
    }
    # spy the kernel entrypoints: the whole set must run ONE fused kernel
    # pass — no per-query single-path kernel builds behind the scenes
    calls = {"multi": 0, "single": 0}
    orig_multi = planner.build_multi_partials_with_lookup

    def spy_multi(*a, **k):
        calls["multi"] += 1
        return orig_multi(*a, **k)

    def spy_single(*a, **k):
        calls["single"] += 1
        raise AssertionError("single-path kernel build inside fused run")

    monkeypatch.setattr(planner, "build_multi_partials_with_lookup", spy_multi)
    monkeypatch.setattr(planner, "build_partials_with_lookup", spy_single)
    monkeypatch.setattr(planner, "build_partials_by_cell", spy_single)
    fused = run_zonal_queries(spark, images, aoi_df, qs, env, GRID_NAME)
    assert fused._partials is not None  # fused path, not the fallback
    for name in qs:
        assert_frames_match(fused[name].toPandas(), singles[name])
    assert calls == {"multi": 1, "single": 0}
    # every member's rows came out of the SAME cached partial frame: the
    # lineage _ms stamp rides the fused partials, so each (cell, query)
    # slice is accounted to exactly one kernel invocation
    n_kernel_rows = fused._partials.count()
    assert n_kernel_rows > 0
    fused.close()


def test_fused_disjoint_layer_cells_parity(spark, env):
    """A cell holding only query B's layer must not leak zero-synthesized
    tiles into query A (worst case: A's base layer has no_data=None, so a
    fake zero tile would count every pixel). Fused == serial on a corpus
    where the two queries' layers live in disjoint cells."""
    import numpy as np

    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.plans.planner import run_zonal_queries
    from gfw_raster_analysis_lambda_spark.sources import fixtures

    grid = fixtures.GRID
    chunk = grid.chunk_px
    c1 = int(G.cell_from_xy(grid, 760, 276))  # tcl_year only
    c2 = int(G.cell_from_xy(grid, 761, 276))  # photo only
    arr = np.full((chunk, chunk), 5, dtype=np.uint8)
    rows = []
    for cell, layer in ((c1, "tcl_year"), (c2, "photo")):
        rows.append((
            f"{layer}/{cell:016x}", layer, cell,
            codecs.encode_tile(arr, "png"), chunk, chunk, "png",
        ))
    images = spark.createDataFrame(
        rows,
        "image_id string, layer string, cell_id long, bytes binary, w int, h int, fmt string",
    )
    aoi = spark.createDataFrame(
        [("both", geo.wkb_dumps(geo.box(10.0, 20.75, 10.5, 21.0)))],
        fixtures.AOI_SCHEMA,
    )
    qs = {
        "photo_n": ZonalQuery(base_layer="photo",
                              aggregates=(Aggregate("count", None, "n"),)),
        "tcl_n": ZonalQuery(base_layer="tcl_year",
                            aggregates=(Aggregate("count", None, "n"),)),
    }
    fused = run_zonal_queries(spark, images, aoi, qs, env, GRID_NAME)
    for name, q in qs.items():
        single = run_zonal_query(spark, images, aoi, q, env, GRID_NAME).toPandas()
        assert_frames_match(fused[name].toPandas(), single)
        # each query must see exactly one cell's pixels
        assert single["n"].tolist() == [chunk * chunk]
    fused.close()


def test_percentile_float_hazard_rank(spark, env):
    """p*n that overshoots in binary floats (0.07*100 = 7.000...01) must
    still pick the 7th element like DuckDB quantile_disc, not the 8th."""
    import numpy as np

    from gfw_raster_analysis_lambda_spark.functions import codecs
    from gfw_raster_analysis_lambda_spark.functions import geometry as geo
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.sources import fixtures

    grid = fixtures.GRID
    chunk = grid.chunk_px
    cell = int(G.cell_from_xy(grid, 760, 276))
    # 100 pixels of values 1..100 (ttc_percent dtype u8, nodata 255 -> the
    # remaining pixels are 255 and masked out)
    arr = np.full((chunk, chunk), 255, dtype=np.uint8)
    arr.flat[:100] = np.arange(1, 101)
    images = spark.createDataFrame(
        [(f"ttc_percent/{cell:016x}", "ttc_percent", cell,
          codecs.encode_tile(arr, "png"), chunk, chunk, "png")],
        "image_id string, layer string, cell_id long, bytes binary, w int, h int, fmt string",
    )
    aoi = spark.createDataFrame(
        [("a", geo.wkb_dumps(geo.box(10.0, 20.75, 10.25, 21.0)))], fixtures.AOI_SCHEMA
    )
    from gfw_raster_analysis_lambda_spark.plans.ir import Aggregate as Agg

    q = ZonalQuery(
        base_layer="ttc_percent",
        aggregates=(Agg("percentile", "ttc_percent", "p", param=0.07),),
    )
    got = run_zonal_query(spark, images, aoi, q, env, GRID_NAME).toPandas()
    import duckdb

    exp = duckdb.sql(
        "SELECT quantile_disc(x, 0.07) FROM (SELECT unnest(range(1, 101)) AS x)"
    ).fetchone()[0]
    assert got["p"].tolist() == [float(exp)] == [7.0]


@pytest.mark.parametrize("seed", [3, 11, 29, 47, 101, 137, 211, 499])
def test_random_query_fuzz_vs_oracle(spark, tables, env, seed, monkeypatch):
    """Randomized query shapes (base/filters/groups/aggs drawn per seed)
    must match the single-process numpy oracle — guards the operator
    COMBINATIONS no hand-written test exercises. Seeds also vary the
    EXECUTION PATH: odd seeds force the multi-range prune (gap-split
    BETWEEN + semi-join) and every 4th seed runs through the fused
    executor. (A one-off 200-seed sweep of the same generator ran clean
    across all path combinations — round 3.)"""
    from gfw_raster_analysis_lambda_spark.plans import planner as _pl

    if seed % 2:
        monkeypatch.setattr(_pl, "MAX_EXACT_IN_CELLS", 2)
    rng = np.random.RandomState(seed)
    bases = ["tcl_year", "ttc_percent", "data", "alert_date_conf"]
    base = bases[rng.randint(len(bases))]
    leaves = [
        FilterLeaf("tcd_threshold", "in", (4, 5, 6, 7)),
        FilterLeaf("tcl_year", ">=", (int(rng.randint(1, 20)),)),
        FilterLeaf("is_primary", "in", (1,)),
        FilterLeaf("drivers", "!=", (0,)),
    ]
    picked = [leaves[i] for i in rng.choice(len(leaves), rng.randint(0, 3), replace=False)]
    where = None
    if len(picked) == 1:
        where = picked[0]
    elif len(picked) == 2:
        where = (FilterAnd if rng.rand() < 0.5 else FilterOr)(tuple(picked))
    group_pool = ["tcl_year", "tcd_threshold", "drivers"]
    groups = tuple(
        group_pool[i] for i in rng.choice(3, rng.randint(0, 3), replace=False)
    )
    agg_pool = [
        Aggregate("count", None, "n"),
        Aggregate("sum", "area__ha", "ha"),
        Aggregate("sum", "emissions", "em"),
        Aggregate("min", "emissions", "em_min"),
        Aggregate("max", "emissions", "em_max"),
        # multi-derived layers: cross-grid float ratio + int product
        Aggregate("sum", "loss_prim", "lp"),
        Aggregate("avg", "em_per_bio", "epb"),
    ]
    kept = [agg_pool[i] for i in rng.choice(len(agg_pool), 1 + rng.randint(3), replace=False)]
    if not any(a.func == "count" for a in kept):
        kept.append(agg_pool[0])
    q = ZonalQuery(
        base_layer=base, group_layers=groups, aggregates=tuple(kept), where=where
    )
    if seed % 4 == 0:
        from gfw_raster_analysis_lambda_spark.plans.planner import run_zonal_queries

        images, aoi_df = tables
        with run_zonal_queries(spark, images, aoi_df, {"q": q}, env, GRID_NAME) as res:
            got = res["q"].toPandas().reset_index(drop=True)
        exp = oracle.run_oracle(q, env, fixtures.fixture_aois())
        assert_frames_match(got, exp)
    else:
        got, exp = run_both(spark, tables, env, q)
        assert_frames_match(got, exp)


# 22. multi-range cell pruning: a scattered AOI batch (two far-apart
# clusters) must scan its footprint, not the min..max span of the corpus.
# Above MAX_EXACT_IN_CELLS the pruner pushes an OR of gap-split BETWEEN
# ranges to the scan and an exact broadcast semi-join before the kernel
# shuffle — nothing outside the clusters crosses the wire.
def test_prune_cells_multirange_footprint(spark, tables, env, monkeypatch):
    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.plans import planner

    images, _ = tables
    imgs = images.select("layer", "cell_id", "bytes", "w", "h", "fmt")
    grid, x0, y0 = fixtures.GRID, fixtures.X0, fixtures.Y0
    cluster_a = [int(G.cell_from_xy(grid, x0, y0)), int(G.cell_from_xy(grid, x0, y0 + 1))]
    cluster_b = [int(G.cell_from_xy(grid, x0 + 3, y0 + 2)), int(G.cell_from_xy(grid, x0 + 3, y0 + 3))]
    cells = cluster_a + cluster_b

    # gap-split: two disjoint ranges, together covering a tiny fraction of
    # the min..max span the old single-BETWEEN fallback would have scanned
    ranges = planner._gap_split_ranges(cells)
    assert len(ranges) == 2
    assert ranges[0][1] < ranges[1][0]
    covered = sum(hi - lo + 1 for lo, hi in ranges)
    assert covered * 10 < (max(cells) - min(cells) + 1)

    monkeypatch.setattr(planner, "MAX_EXACT_IN_CELLS", 2)  # force range path
    pruned = planner._prune_cells(imgs, cells)
    got = {r.cell_id for r in pruned.select("cell_id").distinct().collect()}
    assert got == set(cells)
    assert pruned.count() == imgs.filter(imgs.cell_id.isin(cells)).count()

    # what reaches the scan (the range predicates alone) already reads only
    # footprint rows — no corpus-wide span
    cond = " OR ".join(f"(cell_id BETWEEN {lo} AND {hi})" for lo, hi in ranges)
    assert imgs.filter(cond).count() == imgs.filter(imgs.cell_id.isin(cells)).count()


def test_gap_split_ranges_properties():
    import numpy as np

    from gfw_raster_analysis_lambda_spark.plans.planner import _gap_split_ranges

    rng = np.random.RandomState(7)
    clusters = [
        np.arange(1_000_000, 1_001_000),
        np.arange(5_000_000, 5_000_500),
        rng.randint(9_000_000, 9_100_000, size=2000),
    ]
    ids = np.concatenate(clusters)
    ranges = _gap_split_ranges(ids, max_ranges=16)
    assert 1 <= len(ranges) <= 16
    arr = np.sort(np.unique(ids))
    # disjoint, sorted, and every id covered
    for (lo, hi), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo <= hi < lo2
    covered = np.zeros(arr.shape, dtype=bool)
    for lo, hi in ranges:
        covered |= (arr >= lo) & (arr <= hi)
    assert covered.all()
    # the two dense runs must not be merged across the 4M gap
    assert len(ranges) >= 3
    assert _gap_split_ranges([]) == []
    assert _gap_split_ranges([42]) == [(42, 42)]
    assert _gap_split_ranges(np.arange(100), max_ranges=4) == [(0, 99)]


# 23. WKB-bytes probe: a batch of few-but-huge polygons must take the
# distributed plan WITHOUT materializing any geometry on the driver —
# the probe is a relational sum(length(geom_wkb)), not a collect.
def test_wkb_bytes_cap_routes_distributed(spark, tables, env, monkeypatch):
    from gfw_raster_analysis_lambda_spark.plans import planner

    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("count", None, "n"),),
    )
    images, _ = tables
    aois = fixtures.fixture_aois()[:2]
    aoi_df = spark.createDataFrame(aois, "aoi_id string, geom_wkb binary")
    exp = (
        run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell")
        .toPandas().reset_index(drop=True)
    )

    monkeypatch.setattr(planner, "DRIVER_ENUM_WKB_BYTES", 4)  # force over-bound

    def no_enum(*a, **k):
        raise AssertionError("over-bound WKB batch was enumerated on the driver")

    monkeypatch.setattr(planner, "_aoi_lookup_from_aois", no_enum)
    monkeypatch.setattr(planner, "_aoi_lookup", no_enum)  # cells-collect path too
    got = (
        run_zonal_query(spark, images, aoi_df, q, env, GRID_NAME, strategy="cell")
        .toPandas().reset_index(drop=True)
    )
    assert_frames_match(got, exp)
    assert planner.prepare_aoi_index(spark, aoi_df, GRID_NAME) is None


# 24. corrupt-tile tolerance (opt-in): default raises loudly; with
# env.skip_corrupt_tiles the bad tile degrades to MISSING-tile semantics
# (zero-filled), isolating the failure like the reference's per-tile
# Lambda instead of failing the whole analysis.
def test_corrupt_tile_tolerance(spark, env):
    from gfw_raster_analysis_lambda_spark.sources.catalog import DataEnvironment
    from gfw_raster_analysis_lambda_spark.sources.images import with_derived_keys

    from gfw_raster_analysis_lambda_spark.functions import grid as G
    from gfw_raster_analysis_lambda_spark.sources.fixtures import image_id_for

    rows = fixtures.generate_images_rows()
    # corrupt ONE tcl_year tile INSIDE the queried AOI (box_aligned covers
    # cells x in {760, 761}, y in {277, 278})
    in_aoi = image_id_for(
        "tcl_year", int(G.cell_from_xy(fixtures.GRID, fixtures.X0, fixtures.Y0 + 1))
    )
    bad_idx = next(i for i, r in enumerate(rows) if r[0] == in_aoi)
    bad_id = rows[bad_idx][0]
    corrupted = list(rows)
    r = corrupted[bad_idx]
    corrupted[bad_idx] = (r[0], b"\x89PNGgarbage-not-a-tile", *r[2:])
    images_bad = with_derived_keys(
        spark.createDataFrame(corrupted, fixtures.IMAGES_SCHEMA)
    )
    aois = [a for a in fixtures.fixture_aois() if a[0] == "aoi_box_aligned"]
    aoi_df = spark.createDataFrame(aois, "aoi_id string, geom_wkb binary")
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("count", None, "n"),),
    )
    with pytest.raises(Exception):
        run_zonal_query(spark, images_bad, aoi_df, q, env, GRID_NAME).collect()

    tol_env = DataEnvironment(env.layers, skip_corrupt_tiles=True)
    # round-trips through the kernel's env_json serialization
    assert DataEnvironment.from_json(tol_env.to_json()).skip_corrupt_tiles
    got = (
        run_zonal_query(spark, images_bad, aoi_df, q, tol_env, GRID_NAME)
        .toPandas().reset_index(drop=True)
    )
    # expected = the same corpus WITHOUT the corrupt tile (missing-tile path)
    images_missing = with_derived_keys(
        spark.createDataFrame(
            [r for r in rows if r[0] != bad_id], fixtures.IMAGES_SCHEMA
        )
    )
    exp = (
        run_zonal_query(spark, images_missing, aoi_df, q, env, GRID_NAME)
        .toPandas().reset_index(drop=True)
    )
    assert_frames_match(got, exp)


def test_mode_vs_oracle_counts(spark, tables, env):
    """MODE plan rewrite vs the numpy oracle: expected majority is derived
    from the ORACLE's group-by-value counts (an independent kernel) reduced
    in pandas with the same deterministic tie-break (count desc, value asc)."""
    images, aoi_df = tables
    aois = fixtures.fixture_aois()[:2]
    ids = [a[0] for a in aois]
    aoi_df = aoi_df.filter(aoi_df.aoi_id.isin(ids))
    mode_q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year",),
        aggregates=(Aggregate("mode", "drivers", "major_driver"),),
    )
    got = (
        run_zonal_query(spark, images, aoi_df, mode_q, env, GRID_NAME)
        .toPandas()
        .sort_values(["aoi_id", "tcl_year"])
        .reset_index(drop=True)
    )
    inner_q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("tcl_year", "drivers"),
        aggregates=(Aggregate("count", None, "n"),),
    )
    counts = oracle.run_oracle(inner_q, env, aois)
    # many-raw-to-one-meaning safety: re-sum per decoded meaning first
    counts = counts.groupby(["aoi_id", "tcl_year", "drivers"], as_index=False)["n"].sum()
    exp = (
        counts.sort_values(
            ["aoi_id", "tcl_year", "n", "drivers"],
            ascending=[True, True, False, True],
        )
        .groupby(["aoi_id", "tcl_year"])
        .first()
        .reset_index()[["aoi_id", "tcl_year", "drivers"]]
        .rename(columns={"drivers": "major_driver"})
        .sort_values(["aoi_id", "tcl_year"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["aoi_id", "tcl_year", "major_driver"]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_count_distinct_vs_oracle_counts(spark, tables, env):
    images, aoi_df = tables
    aois = fixtures.fixture_aois()[:2]
    ids = [a[0] for a in aois]
    aoi_df = aoi_df.filter(aoi_df.aoi_id.isin(ids))
    cd_q = ZonalQuery(
        base_layer="alert_date_conf",
        aggregates=(Aggregate("count_distinct", "alert_date", "n_days"),),
        where=FilterLeaf("alert_conf", ">=", (2,)),
    )
    got = (
        run_zonal_query(spark, images, aoi_df, cd_q, env, GRID_NAME)
        .toPandas()
        .sort_values("aoi_id")
        .reset_index(drop=True)
    )
    inner_q = ZonalQuery(
        base_layer="alert_date_conf",
        group_layers=("alert_date",),
        aggregates=(Aggregate("count", None, "n"),),
        where=FilterLeaf("alert_conf", ">=", (2,)),
    )
    counts = oracle.run_oracle(inner_q, env, aois)
    exp = (
        counts.groupby("aoi_id")["alert_date"]
        .nunique()
        .reset_index(name="n_days")
        .sort_values("aoi_id")
        .reset_index(drop=True)
    )
    assert got["n_days"].dtype.kind == "i"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_mode_rejects_bad_shapes(spark, tables, env):
    images, aoi_df = tables
    with pytest.raises(ValueError, match="GROUP BY"):
        run_zonal_query(
            spark, images, aoi_df,
            ZonalQuery(
                base_layer="tcl_year",
                group_layers=("drivers",),
                aggregates=(Aggregate("mode", "drivers", "m"),),
            ),
            env, GRID_NAME,
        )
    with pytest.raises(ValueError, match="exactly one"):
        run_zonal_query(
            spark, images, aoi_df,
            ZonalQuery(
                base_layer="tcl_year",
                aggregates=(
                    Aggregate("mode", "drivers", "m"),
                    Aggregate("count", None, "n"),
                ),
            ),
            env, GRID_NAME,
        )


def test_multi_derived_layer_vs_oracle(spark, tables, env):
    """Multi-layer map algebra (A, B positional): float ratio ACROSS
    grids with NaN-excluded AVG, int product with SUM — engine vs the
    numpy oracle (which evaluates the same whitelisted calc)."""
    q = ZonalQuery(
        base_layer="data",
        aggregates=(
            Aggregate("avg", "em_per_bio", "epb_avg"),
            Aggregate("sum", "loss_prim", "lp_sum"),
            Aggregate("count", None, "n"),
        ),
    )
    got, exp = run_both(spark, tables, env, q)
    assert_frames_match(got, exp)


def test_multi_derived_group_and_filter(spark, tables, env):
    """Multi-derived layers work as GROUP BY keys and in WHERE leaves."""
    q = ZonalQuery(
        base_layer="tcl_year",
        group_layers=("loss_prim",),
        aggregates=(Aggregate("count", None, "n"),),
        where=FilterLeaf("loss_prim", ">=", (10,)),
    )
    got, exp = run_both(spark, tables, env, q)
    assert_frames_match(got, exp)


def test_multi_derived_catalog_roundtrip():
    from gfw_raster_analysis_lambda_spark.sources.catalog import (
        DataEnvironment,
        MultiDerivedLayer,
    )

    env = fixtures.fixture_environment()
    env2 = DataEnvironment.from_json(env.to_json())
    l = env2.get_layer("em_per_bio")
    assert isinstance(l, MultiDerivedLayer)
    assert l.source_layers == ("emissions", "biomass")
    assert l.dtype == "float64"
    # column pruning resolves BOTH sources
    assert set(env2.source_layer_names(["em_per_bio"])) == {"emissions", "biomass"}


def test_rollup_multi_selector_validation(spark, tables, env):
    """Mixed-layer rollup selectors are rejected; same-layer mixes work
    (the oracle gate covers values; here just the contract)."""
    images, aoi_df = tables
    with pytest.raises(ValueError, match="SAME layer"):
        run_zonal_query(
            spark, images, aoi_df,
            ZonalQuery(
                base_layer="ttc_percent",
                aggregates=(
                    Aggregate("percentile", "ttc_percent", "p", param=0.5),
                    Aggregate("mode", "drivers", "m"),
                ),
            ),
            env, GRID_NAME,
        )
    with pytest.raises(ValueError, match="distinct aliases"):
        run_zonal_query(
            spark, images, aoi_df,
            ZonalQuery(
                base_layer="ttc_percent",
                aggregates=(
                    Aggregate("percentile", "ttc_percent", "p", param=0.5),
                    Aggregate("percentile", "ttc_percent", "p", param=0.75),
                ),
            ),
            env, GRID_NAME,
        )


def test_rollup_multi_selector_keeps_null_groups(spark, tables):
    """A GROUP BY layer with a PARTIAL raster_table and default_meaning
    None decodes unmapped raws to NULL; the multi-selector reduce-join
    must keep those groups (NULL-safe equality) — they used to vanish
    while the single-selector path kept them."""
    base = fixtures.fixture_environment()
    from gfw_raster_analysis_lambda_spark.sources.catalog import SourceLayer

    layers = [l for l in base.layers if l.name != "drivers"]
    layers.append(SourceLayer(
        "drivers", grid=GRID_NAME, dtype="uint8", fmt="png", no_data=0,
        # raws 3,4,5 are unmapped and there is NO default -> NULL group
        raster_table={1: "Agriculture", 2: "Forestry"},
    ))
    env2 = DataEnvironment(layers=layers)

    def run(aggs):
        q = ZonalQuery(
            base_layer="ttc_percent", group_layers=("drivers",),
            aggregates=aggs,
        )
        images, aoi_df = tables
        return (
            run_zonal_query(spark, images, aoi_df, q, env2, GRID_NAME)
            .toPandas()
        )

    multi = run((
        Aggregate("percentile", "ttc_percent", "p50", param=0.5),
        Aggregate("percentile", "ttc_percent", "p90", param=0.9),
    ))
    single = run((Aggregate("percentile", "ttc_percent", "p50", param=0.5),))
    assert multi["drivers"].isna().any(), "fixture must produce a NULL group"
    key = ["aoi_id", "drivers"]

    def keyset(df):
        return {tuple(r) for r in df[key].astype(object).where(df[key].notna(), None).itertuples(index=False)}

    assert keyset(multi) == keyset(single)
    merged = multi.merge(single, on=key, how="outer", suffixes=("_m", "_s"))
    assert (merged["p50_m"] == merged["p50_s"]).all()


@pytest.mark.parametrize("seed", range(101, 113))
def test_random_rollup_fuzz_vs_oracle(spark, tables, env, seed):
    """Randomized PERCENTILE/MODE/COUNT(DISTINCT) shapes (single and
    multi-selector, grouped and not, filtered and not) vs the numpy
    oracle's independent pandas reduction."""
    rng = np.random.RandomState(seed)
    # (layer, allowed funcs): percentile needs raw numeric layers
    pools = [
        ("ttc_percent", ["percentile", "mode", "count_distinct"]),
        ("emissions", ["percentile"]),
        ("drivers", ["mode", "count_distinct"]),
    ]
    vlayer, funcs = pools[rng.randint(len(pools))]
    n_sel = 1 + rng.randint(2)
    aggs = []
    for i in range(n_sel):
        f = funcs[rng.randint(len(funcs))]
        if f == "percentile":
            p = float(rng.choice([0.07, 0.25, 0.5, 0.75, 0.9]))
            aggs.append(Aggregate("percentile", vlayer, f"a{i}", param=p))
        else:
            aggs.append(Aggregate(f, vlayer, f"a{i}"))
    base = ["data", "tcl_year"][rng.randint(2)]
    groups = ()
    if vlayer != "drivers" and rng.rand() < 0.5:
        groups = ("tcl_year",)
    where = None
    if rng.rand() < 0.5:
        where = FilterLeaf("is_primary", "in", (1,))
    q = ZonalQuery(
        base_layer=base, group_layers=groups, aggregates=tuple(aggs), where=where
    )
    images, aoi_df = tables
    aois = fixtures.fixture_aois()[:2]
    ids = [a[0] for a in aois]
    got = (
        run_zonal_query(
            spark, images, aoi_df.filter(aoi_df.aoi_id.isin(ids)), q, env, GRID_NAME
        )
        .toPandas()
        .sort_values(["aoi_id", *groups])
        .reset_index(drop=True)
    )
    exp = oracle.run_oracle(q, env, aois)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        if got[c].dtype.kind == "f":
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float), exp[c].to_numpy(dtype=float),
                rtol=1e-9, atol=0, err_msg=f"seed {seed} col {c}\n{got}\n{exp}",
            )
        else:
            assert list(got[c].astype(str)) == list(exp[c].astype(str)), (
                f"seed {seed} col {c}\n{got}\n{exp}"
            )


def test_resultset_materialize_parallel_parity(spark, tables, env):
    """ZonalResultSet.materialize drives every member concurrently over
    the one cached partial frame; a collecting writer must see the same
    frames as serial per-member collection, and the cache must be built
    exactly once (partials storage is populated before the pool starts)."""
    import threading

    from gfw_raster_analysis_lambda_spark.plans.planner import run_zonal_queries

    images, aoi_df = tables
    qs = {
        "grouped": _parity_query(),
        "area": ZonalQuery(
            base_layer="data",
            aggregates=(Aggregate("sum", "area__ha", "area_ha"),
                        Aggregate("count", None, "n_px")),
        ),
    }
    fused = run_zonal_queries(spark, images, aoi_df, qs, env, GRID_NAME)
    serial = {name: fused[name].toPandas() for name in qs}
    got = {}
    lock = threading.Lock()

    def writer(df):
        pdf = df.toPandas()
        with lock:
            got[len(got)] = pdf
    fused.materialize(writer=writer, parallel=True)
    assert len(got) == len(qs)
    by_cols = {tuple(sorted(p.columns)): p for p in got.values()}
    for name, exp in serial.items():
        assert_frames_match(by_cols[tuple(sorted(exp.columns))], exp)
    fused.close()
