"""Tile-stats collection and value-predicate cell pruning
(operators/tilestats.py): bounds vs numpy, pruning PARITY (results
identical with and without pruning — the soundness contract) and
EFFECTIVENESS (cells actually pruned)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_raster_analysis_lambda_spark.api import zonal_statistics
from gfw_raster_analysis_lambda_spark.functions import codecs
from gfw_raster_analysis_lambda_spark.functions import grid as G
from gfw_raster_analysis_lambda_spark.operators import tilestats
from gfw_raster_analysis_lambda_spark.sources import fixtures
from gfw_raster_analysis_lambda_spark.sources.catalog import (
    DataEnvironment,
    SourceLayer,
)
from gfw_raster_analysis_lambda_spark.sources.images import with_derived_keys

GRID = fixtures.GRID  # 4/1024 fixture grid, 64-px chunks


def _corpus(spark):
    """8 cells in a row; cell k's 'v' tile holds values k..k+2 (plus a
    nodata-0 stripe), so a predicate v >= 5 can only match cells >= 3."""
    rows = []
    rng = np.random.RandomState(7)
    for k in range(8):
        x, y = 760 + k, 276
        cell = int(G.cell_from_xy(GRID, x, y))
        arr = rng.randint(k, k + 3, size=(64, 64)).astype(np.uint8)
        arr[0, :] = 0  # nodata stripe
        rows.append(
            (f"v/{cell:016x}", codecs.encode_tile(arr, "png"),
             64, 64, "png", "", 0)
        )
    df = spark.createDataFrame(rows, fixtures.IMAGES_SCHEMA)
    return with_derived_keys(df), [760 + k for k in range(8)]


def _env():
    return DataEnvironment(
        layers=[SourceLayer("v", grid=GRID.name, dtype="uint8", fmt="png",
                            no_data=0)]
    )


def _aoi(spark):
    # one box spanning all 8 cells (lon 10..12, lat 20.75..21)
    import struct

    def wkb_box(x0, y0, x1, y1):
        pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        return (
            struct.pack("<BII", 1, 3, 1)
            + struct.pack("<I", len(pts))
            + b"".join(struct.pack("<dd", *p) for p in pts)
        )

    return spark.createDataFrame(
        [("box", wkb_box(10.0, 20.75, 12.0, 21.0))],
        "aoi_id string, geom_wkb binary",
    )


def test_stats_bounds_match_numpy(spark):
    images, xs = _corpus(spark)
    stats = tilestats.collect_tile_stats(images, {"v": 0.0}).collect()
    assert len(stats) == 8
    by_cell = {r.cell_id: r for r in stats}
    for k in range(8):
        cell = int(G.cell_from_xy(GRID, 760 + k, 276))
        r = by_cell[cell]
        lo = max(k, 1)  # 0 is nodata, excluded
        assert r.vmin >= lo and r.vmax <= k + 2 and r.n_px == 4096
        assert r.n_valid < 4096  # the stripe (and k=0 values) excluded


@pytest.mark.parametrize("lo,expect_kept", [(5.0, 5), (7.0, 3), (1.0, 8)])
def test_pruning_parity_and_effectiveness(spark, lo, expect_kept):
    images, _ = _corpus(spark)
    env, aoi = _env(), _aoi(spark)
    sql = (
        f"SELECT COUNT(*) AS n, SUM(v) AS s FROM v WHERE v >= {int(lo)}"
    )
    full = zonal_statistics(spark, images, aoi, sql, env, GRID.name).collect()

    stats = tilestats.collect_tile_stats(images, {"v": 0.0})
    viable = tilestats.viable_cells(stats, "v", lo=lo)
    kept = viable.count()
    # cell k holds values max(k,?)..k+2: vmax >= lo iff k+2 >= lo
    assert kept == expect_kept
    pruned = tilestats.prune_images(images, viable)
    got = zonal_statistics(spark, pruned, aoi, sql, env, GRID.name).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in full]


def test_zero_fill_missing_layer_kept(spark):
    """A cell in the corpus WITHOUT the layer's tile zero-fills: it must
    survive pruning iff 0 is inside the predicate interval."""
    images, _ = _corpus(spark)
    # second layer 'm' present only in the first 2 cells
    extra = []
    for k in range(2):
        cell = int(G.cell_from_xy(GRID, 760 + k, 276))
        arr = np.full((64, 64), 9, dtype=np.uint8)
        extra.append((f"m/{cell:016x}", codecs.encode_tile(arr, "png"),
                      64, 64, "png", "", 0))
    both = images.unionByName(
        with_derived_keys(
            images.sparkSession.createDataFrame(extra, fixtures.IMAGES_SCHEMA)
        )
    )
    stats = tilestats.collect_tile_stats(both, {"v": 0.0, "m": 0.0})
    # predicate m >= 1: missing-m cells zero-fill to 0 -> prunable
    assert tilestats.viable_cells(stats, "m", lo=1.0).count() == 2
    # predicate m <= 3: 0 passes -> the 6 missing-m cells survive via
    # zero-fill; the 2 cells whose m tiles are all 9s still prune
    assert tilestats.viable_cells(stats, "m", hi=3.0).count() == 6


def test_sniff_png_headers_detects_corruption(spark):
    """Corrupt payloads: wrong signature, truncated header, metadata
    lying about dimensions — all flagged without a decode."""
    from gfw_raster_analysis_lambda_spark.operators.multimodal import (
        sniff_png_headers,
    )

    good = codecs.encode_tile(np.arange(64, dtype=np.uint8).reshape(8, 8), "png")
    wide = codecs.encode_tile(np.zeros((8, 16), dtype=np.uint8), "png")
    rows = [
        ("ok", good, 8, 8, "png", "", 0),
        ("badsig", b"\x00" + good[1:], 8, 8, "png", "", 0),
        ("lying_meta", wide, 8, 8, "png", "", 0),  # header says 16x8
        ("plan_b", codecs.encode_tile(
            np.zeros((8, 8), dtype=np.uint16), "png"), 8, 8, "png", "", 0),
    ]
    df = spark.createDataFrame(rows, fixtures.IMAGES_SCHEMA)
    got = {r.image_id: r for r in sniff_png_headers(df).collect()}
    assert got["ok"].sig_ok and got["ok"].w_match and got["ok"].bit_depth == 8
    assert not got["badsig"].sig_ok and got["badsig"].hdr_w is None
    assert got["lying_meta"].sig_ok and not got["lying_meta"].w_match
    assert got["lying_meta"].hdr_w == 16
    assert got["plan_b"].bit_depth == 16 and got["plan_b"].color_type == 0
    # zero shuffle, zero Python: pure codegen projection
    plan = sniff_png_headers(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_query_level_auto_pruning(spark):
    """prune_images_for_query: intervals derived from the parsed WHERE
    tree — AND conjuncts prune, OR across layers must NOT prune (no
    sound single-layer bound exists), parity always holds."""
    from gfw_raster_analysis_lambda_spark.operators.tilestats import (
        filter_interval,
        prune_images_for_query,
    )
    from gfw_raster_analysis_lambda_spark.plans.sql_frontend import (
        parse_raster_sql,
    )

    images, _ = _corpus(spark)
    env, aoi = _env(), _aoi(spark)
    stats = tilestats.collect_tile_stats(images, {"v": 0.0})

    q_and = parse_raster_sql("SELECT COUNT(*) AS n FROM v WHERE v >= 6", _env())
    assert filter_interval(q_and.where, "v") == (6.0, None)
    pruned = prune_images_for_query(images, stats, q_and, env)
    n_cells = pruned.select("cell_id").distinct().count()
    assert n_cells == 4  # cells k>=4 have vmax k+2 >= 6
    full = zonal_statistics(
        spark, images, aoi, "SELECT COUNT(*) AS n FROM v WHERE v >= 6", env,
        GRID.name).collect()
    got = zonal_statistics(
        spark, pruned, aoi, "SELECT COUNT(*) AS n FROM v WHERE v >= 6", env,
        GRID.name).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in full]

    # IN-set: hull [2, 7]
    q_in = parse_raster_sql(
        "SELECT COUNT(*) AS n FROM v WHERE v in (2, 7)", _env())
    assert filter_interval(q_in.where, "v") == (2.0, 7.0)

    # OR across layers: no sound bound on either -> corpus unchanged
    env2 = DataEnvironment(layers=[
        SourceLayer("v", grid=GRID.name, dtype="uint8", fmt="png", no_data=0),
        SourceLayer("m", grid=GRID.name, dtype="uint8", fmt="png", no_data=0),
    ])
    q_or = parse_raster_sql(
        "SELECT COUNT(*) AS n FROM v WHERE v >= 6 OR m >= 1", env2)
    assert filter_interval(q_or.where, "v") == (None, None)
    same = prune_images_for_query(images, stats, q_or, env2)
    assert same.count() == images.count()


def test_update_tile_stats_incremental(spark, tmp_path):
    """Stats stay fresh via snapshot changes: only new tiles decode,
    replays are idempotent, and the merged stats equal a full rebuild."""
    from gfw_raster_analysis_lambda_spark.operators.tilestats import (
        update_tile_stats,
    )
    from gfw_raster_analysis_lambda_spark.sources.snapshots import SnapshotTable

    images, _ = _corpus(spark)
    rows = images.drop("layer", "cell_id")
    corpus = SnapshotTable.create(spark, str(tmp_path / "corpus"))
    stats_t = SnapshotTable.create(
        spark, str(tmp_path / "stats"), partition_by=["src_snap"]
    )
    first = rows.limit(3)
    corpus.append(first)
    sid1 = update_tile_stats(spark, corpus, stats_t, {"v": 0.0})
    assert sid1 == 1
    assert stats_t.read().count() == 3
    # nothing new: no-op
    assert update_tile_stats(spark, corpus, stats_t, {"v": 0.0}) is None

    corpus.append(rows.subtract(first))
    sid2 = update_tile_stats(spark, corpus, stats_t, {"v": 0.0})
    assert sid2 is not None
    got = stats_t.read().drop("src_snap")
    full = tilestats.collect_tile_stats(images, {"v": 0.0})
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in full.collect())
    assert a == b
