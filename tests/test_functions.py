"""Unit tests for the pure-numpy kernels: geodesy, geometry, grid, codecs,
expression compiler. These run without a SparkSession."""

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.functions import codecs, expressions, geodesy
from gfw_raster_analysis_lambda_spark.functions import geometry as geo
from gfw_raster_analysis_lambda_spark.functions import grid as G


# ---------------------------------------------------------------- geodesy
def test_earth_total_area():
    # WGS84 surface area is 5.1007e14 m^2 (public constant)
    assert geodesy.earth_area_m2() == pytest.approx(5.1007e14, rel=1e-4)


def test_pixel_area_decreases_with_latitude():
    ps = 0.00025
    a_eq = geodesy.pixel_area_ha(0.0, ps)
    a_60 = geodesy.pixel_area_ha(60.0, ps)
    assert a_eq == pytest.approx(0.0773, rel=0.01)  # ~30m pixel ~= 0.077 ha
    assert a_60 < a_eq * 0.55  # ~cos(60) = 0.5


def test_band_area_symmetry():
    assert geodesy.band_area_m2(-10, 10, 360) == pytest.approx(
        2 * geodesy.band_area_m2(0, 10, 360), rel=1e-12
    )


# ---------------------------------------------------------------- geometry
def test_wkb_roundtrip():
    g = geo.box(1.0, 2.0, 3.0, 4.0)
    g2 = geo.wkb_loads(geo.wkb_dumps(g))
    assert len(g2) == 1 and len(g2[0]) == 1
    np.testing.assert_allclose(g2[0][0], g[0][0])


def test_wkb_polygon_with_hole():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)
    g = [[outer, hole]]
    g2 = geo.wkb_loads(geo.wkb_dumps(g))
    inside = geo.contains_points(g2, [2.0, 5.0], [2.0, 5.0])
    assert inside.tolist() == [True, False]  # hole punched out (even-odd)


def test_contains_points_box():
    g = geo.box(0, 0, 10, 10)
    xs = [5, -1, 11, 5]
    ys = [5, 5, 5, 15]
    assert geo.contains_points(g, xs, ys).tolist() == [True, False, False, False]


def test_rasterize_mask_full_and_partial():
    # box covering exactly left half of a 4x4 tile at origin (0,4), ps=1
    g = geo.box(0, 0, 2, 4)
    m = geo.rasterize_mask(g, x0=0.0, y0=4.0, pixel_size=1.0, width=4, height=4)
    expected = np.zeros((4, 4), bool)
    expected[:, :2] = True
    np.testing.assert_array_equal(m, expected)


def test_rasterize_box_fast_path_matches_scanline():
    # same rectangle as a 4-edge ring (fast path) and with a redundant
    # collinear vertex (5 edges -> general scanline path) must agree,
    # including boundary parity, on boxes on and off pixel-center lines
    rng = np.random.default_rng(7)
    for _ in range(25):
        x1, y1 = rng.uniform(-1, 3, 2)
        w, h = rng.uniform(0.3, 4, 2)
        x2, y2 = x1 + w, y1 + h
        fast = geo.box(x1, y1, x2, y2)
        ring = np.array(
            [[x1, y1], [x1 + w / 2, y1], [x2, y1], [x2, y2], [x1, y2]], float
        )
        slow = [[ring]]
        mf = geo.rasterize_mask(fast, x0=-1.0, y0=7.0, pixel_size=0.5, width=16, height=16)
        ms = geo.rasterize_mask(slow, x0=-1.0, y0=7.0, pixel_size=0.5, width=16, height=16)
        np.testing.assert_array_equal(mf, ms)
    # boundary exactly on pixel centers: box (0.5,0.5)-(2.5,2.5) on ps=1 grid
    fast = geo.box(0.5, 0.5, 2.5, 2.5)
    ring = np.array([[0.5, 0.5], [1.5, 0.5], [2.5, 0.5], [2.5, 2.5], [0.5, 2.5]], float)
    mf = geo.rasterize_mask(fast, x0=0.0, y0=4.0, pixel_size=1.0, width=4, height=4)
    ms = geo.rasterize_mask([[ring]], x0=0.0, y0=4.0, pixel_size=1.0, width=4, height=4)
    np.testing.assert_array_equal(mf, ms)


def test_rasterize_mask_triangle_center_containment():
    tri = [[np.array([[0, 0], [4, 0], [0, 4]], float)]]
    m = geo.rasterize_mask(tri, x0=0.0, y0=4.0, pixel_size=1.0, width=4, height=4)
    # pixel centers at (.5..3.5); inside iff x+y < 4 strictly below hypotenuse
    exp = np.zeros((4, 4), bool)
    for i in range(4):
        for j in range(4):
            cx, cy = j + 0.5, 4 - (i + 0.5)
            exp[i, j] = (cx + cy) < 4 and cx > 0 and cy > 0
    np.testing.assert_array_equal(m, exp)


def test_intersects_rect():
    g = geo.box(0, 0, 10, 10)
    assert geo.intersects_rect(g, 5, 5, 15, 15)       # overlap
    assert geo.intersects_rect(g, 10, 0, 20, 10)      # edge touch counts
    assert not geo.intersects_rect(g, 10.001, 0, 20, 10)
    assert geo.intersects_rect(g, 3, 3, 4, 4)         # rect fully inside
    big = geo.box(-50, -50, 50, 50)
    assert geo.intersects_rect(big, -1, -1, 1, 1)     # geom covers rect


def test_clip_to_rect():
    g = geo.box(0, 0, 10, 10)
    c = geo.clip_to_rect(g, 5, 5, 20, 20)
    assert geo.bounds(c) == (5.0, 5.0, 10.0, 10.0)
    assert geo.is_empty(geo.clip_to_rect(g, 11, 11, 20, 20))


def test_normalize_drops_degenerate():
    bad = [[np.array([[0, 0], [1, 1]], float)]]
    assert geo.is_empty(geo.normalize(bad))


# ---------------------------------------------------------------- grid
def test_cell_roundtrip():
    g = G.GRID_FIXTURE
    cells = G.latlng_to_cell(g, [-179.9, 0.1, 179.9], [89.9, 0.1, -89.9])
    x, y = G.cell_to_xy(cells)
    back = G.cell_from_xy(g, x, y)
    np.testing.assert_array_equal(cells, back)
    assert (G.cell_grid_index(cells) == g.index).all()


def test_cell_bounds_contain_point():
    g = G.GRID_FIXTURE
    lon, lat = 12.34, -45.67
    c = G.latlng_to_cell(g, [lon], [lat])[0]
    minx, miny, maxx, maxy = G.cell_bounds(g, c)
    assert minx <= lon < maxx and miny <= lat < maxy
    assert maxx - minx == pytest.approx(g.tile_deg)


def test_polygon_to_cells_box_exact():
    g = G.GRID_FIXTURE  # tile_deg = 0.25
    # box spanning exactly 2x2 cells, interior-aligned (no boundary touch)
    geom = geo.box(10.01, 20.01, 10.49, 20.49)
    cells = G.polygon_to_cells(g, geom)
    assert len(cells) == 4
    # grid-snapped box: bbox floor-snap excludes min-edge-touching
    # neighbors, but the max edge falls in the next cell and touching
    # counts for `intersects` -> 3x3 candidates all kept (reference
    # tiling semantics: snap bbox, keep intersecting tiles)
    geom2 = geo.box(10.0, 20.0, 10.5, 20.5)
    cells2 = G.polygon_to_cells(g, geom2)
    assert len(cells2) == 9


def test_polygon_to_cells_concave():
    g = G.GRID_FIXTURE
    # L-shape that skips the NE cell of its bbox
    ring = np.array(
        [[10.01, 20.01], [10.49, 20.01], [10.49, 20.24], [10.24, 20.24],
         [10.24, 20.49], [10.01, 20.49]], float
    )
    cells = G.polygon_to_cells(g, [[ring]])
    assert len(cells) == 3  # bbox has 4 cells; NE corner cell untouched


def test_k_ring():
    g = G.GRID_FIXTURE
    c = G.latlng_to_cell(g, [0.1], [0.1])[0]
    ring = G.k_ring(g, int(c), 1)
    assert len(ring) == 9 and int(c) in ring.tolist()


def test_tile_ids():
    assert G.tile_id_nw(10, 10) == "10N_010E"
    assert G.tile_id_nw(-10, -110) == "10S_110W"
    assert G.tile_id_nwse(10, -20, 20, -10) == "10_-20_20_-10"


# ---------------------------------------------------------------- codecs
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_png_roundtrip(dtype):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, np.iinfo(dtype).max, size=(64, 64)).astype(dtype)
    out = codecs.png_decode(codecs.png_encode(arr))
    assert out.dtype == arr.dtype
    np.testing.assert_array_equal(out, arr)


@pytest.mark.parametrize("fmt,dtype", [("raw_u8", np.uint8), ("raw_u16", np.uint16), ("raw_f32", np.float32)])
def test_raw_roundtrip(fmt, dtype):
    rng = np.random.default_rng(7)
    arr = (rng.random((32, 32)) * 100).astype(dtype)
    out = codecs.decode_tile(codecs.encode_tile(arr, fmt), 32, 32, fmt)
    np.testing.assert_array_equal(out, arr)


def test_jpeg_standin_lossy_psnr():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    out = codecs.decode_tile(codecs.encode_tile(arr, "jpeg"), 64, 64, "jpeg")
    assert not np.array_equal(out, arr)  # genuinely lossy
    assert codecs.psnr(arr, out) >= 40.0  # the input_hint invariant


def test_phash64_stability_and_sensitivity():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(64, 64)).astype(np.uint8)
    h1 = codecs.phash64(a)
    assert h1 == codecs.phash64(a.copy())
    b = a.copy()
    b[:32] = 255  # gross change flips many bits
    hb = codecs.phash64(b)
    assert bin((h1 ^ hb) & ((1 << 64) - 1)).count("1") > 8
    assert -(1 << 63) <= h1 < (1 << 63)


# ---------------------------------------------------------------- expressions
def test_expression_basic_calcs():
    A = np.array([0, 5, 12345, 23456], dtype=np.uint32)
    assert expressions.compile_expression("A % 10000")(A).tolist() == [0, 5, 2345, 3456]
    np.testing.assert_array_equal(
        expressions.compile_expression("floor(A / 10000)")(A), [0, 0, 1, 2]
    )
    area = 0.077
    np.testing.assert_allclose(
        expressions.compile_expression("where(A > 0, area, 0)")(A, area),
        [0, 0.077, 0.077, 0.077],
    )
    np.testing.assert_allclose(
        expressions.compile_expression("A * area")(A.astype(float), 2.0), A * 2.0
    )


def test_expression_date_decode():
    A = np.array([0, 365], dtype=np.int64)
    f = expressions.compile_expression("(A + 16436).astype('datetime64[D]').astype('str')")
    out = f(A)
    assert out.tolist() == ["2015-01-01", "2016-01-01"]


def test_expression_rejects_unsafe():
    for bad in [
        "__import__('os')",
        "open('/etc/passwd')",
        "A.__class__",
        "(lambda: 1)()",
        "exec('x')",
        "globals()",
    ]:
        with pytest.raises(expressions.UnsafeExpressionError):
            expressions.compile_expression(bad)


def test_covers_rect_conservative():
    big = geo.box(0, 0, 10, 10)
    assert geo.covers_rect(big, 2, 2, 4, 4)          # interior rect
    assert not geo.covers_rect(big, -1, 2, 4, 4)     # spills out
    # axis-aligned box fast path is EXACT: edge-touching rect is covered
    # (every pixel center of the rect is strictly inside the closed box
    # under the rasterize parity rule)
    assert geo.covers_rect(big, 0, 0, 4, 4)
    # ...but a non-box geometry with the same shape stays conservative
    pent = [[np.array([[0, 0], [10, 0], [10, 10], [5, 10], [0, 10]], float)]]
    assert not geo.covers_rect(pent, 0, 0, 4, 4)
    assert geo.covers_rect(pent, 2, 2, 4, 4)
    assert not geo.covers_rect(geo.box(5, 5, 6, 6), 2, 2, 8, 8)  # geom inside rect
    # polygon with hole: rect containing the hole is NOT covered
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)
    g = [[outer, hole]]
    assert not geo.covers_rect(g, 3, 3, 7, 7)
    assert geo.covers_rect(g, 1, 1, 2, 2)            # beside the hole
    assert not geo.covers_rect(g, 4.2, 4.2, 5.8, 5.8)  # inside the hole


def test_polygon_to_cells_big_path_parity():
    """The vectorized giant-AOI enumeration must return every cell with
    interior pixel overlap and only cells the exact path also returns;
    any difference must be touch-only cells (no pixel centers inside)."""
    g = G.GRID_FIXTURE
    rng = np.random.default_rng(11)
    for trial in range(6):
        # random concave polygon with bbox ~ 20x20 .. 90x90 cells
        n = int(rng.integers(5, 12))
        cx0, cy0 = rng.uniform(-20, 20, 2)
        r_out = rng.uniform(2.0, 11.0)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = r_out * rng.uniform(0.3, 1.0, n)
        ring = np.stack([cx0 + rad * np.cos(ang), cy0 + rad * np.sin(ang)], axis=1)
        geom = [[ring]]

        old = G.BIG_ENUM_THRESHOLD
        try:
            G.BIG_ENUM_THRESHOLD = 10**9
            exact = set(G.polygon_to_cells(g, geom).tolist())
            G.BIG_ENUM_THRESHOLD = 1
            fast = set(G.polygon_to_cells(g, geom).tolist())
        finally:
            G.BIG_ENUM_THRESHOLD = old

        assert fast <= exact, f"trial {trial}: fast returned non-intersecting cells"
        # any cell the fast path dropped must have NO pixel centers inside
        for c in exact - fast:
            minx, miny, maxx, maxy = G.cell_bounds(g, c)
            px = (np.arange(g.chunk_px) + 0.5) * g.pixel_size
            xs, ys = np.meshgrid(minx + px, maxy - px)
            inside = geo.contains_points(geom, xs.ravel(), ys.ravel())
            assert not inside.any(), f"trial {trial}: dropped cell {c} has pixels"


def test_simplify_douglas_peucker():
    # a square with collinear edge midpoints: tolerance removes exactly the
    # midpoints and preserves corners (and therefore the rasterized mask)
    ring = np.array([
        [0, 0], [5, 0], [10, 0], [10, 5], [10, 10],
        [5, 10], [0, 10], [0, 5],
    ], dtype=float)
    g = [[ring]]
    s = geo.simplify(g, 0.01)
    assert len(s[0][0]) == 4
    m0 = geo.rasterize_mask(g, 0.0, 10.0, 1.0, 10, 10)
    m1 = geo.rasterize_mask(s, 0.0, 10.0, 1.0, 10, 10)
    np.testing.assert_array_equal(m0, m1)
    # a wiggly edge within tolerance collapses; outside tolerance survives
    wig = np.array([[0, 0], [5, 0.4], [10, 0], [10, 10], [0, 10]], dtype=float)
    assert len(geo.simplify([[wig]], 0.5)[0][0]) == 4
    assert len(geo.simplify([[wig]], 0.1)[0][0]) == 5
    # rings that collapse entirely are dropped (normalize repair rule)
    sliver = np.array([[0, 0], [10, 0.001], [20, 0]], dtype=float)
    assert geo.simplify([[sliver]], 0.5) == []


def test_unbound_multi_calc_name_rejected_at_compile():
    """A calc referencing a layer name beyond its bound inputs fails at
    PLAN time with UnsafeExpressionError, not with a KeyError inside an
    executor task."""
    with pytest.raises(expressions.UnsafeExpressionError, match="not bound"):
        expressions.compile_expression("B * 2", n_inputs=1)
    with pytest.raises(expressions.UnsafeExpressionError, match="not bound"):
        expressions.compile_expression("(A - C)", n_inputs=2)
    # bound names evaluate fine through the shared multi binding
    import numpy as np
    out = expressions.evaluate_multi_calc(
        "(A - B) / (A + B)", [np.array([4.0]), np.array([2.0])], None
    )
    assert out[0] == pytest.approx(1.0 / 3.0)
