"""Cell grid: the engine's spatial index (H3/S2 role).

The reference tiles the world into fixed-degree blocks ("10/40000" = 10-deg
blocks of 40000 px, i.e. 0.00025-deg pixels) and processes chunks of
5000x5000 px = 1.25 deg (reference grid.py:33-51, README.md:358). Our cell
grid keeps that geometry exactly — a *cell* is one tile chunk — but gives
each cell a packed int64 id so that:

- ``latlng_to_cell`` is pure integer/float arithmetic, batchable in numpy
  (and mirrorable in ANSI SQL for the DuckDB oracle);
- the images table can be hash/range partitioned and joined on ``cell_id``
  (equi-join instead of a theta intersects-join — the key design move);
- ``k_ring`` gives cheap spatial neighborhoods for kNN candidate pruning.

Why not real H3/S2: neither library ships in this environment, and exact
parity with the reference's degree-aligned tiles requires a degree-aligned
grid anyway. The packing (res, x, y) is S2-like: cells of one resolution
tile the planet disjointly; ids are stable and sortable so that sorting by
cell_id gives spatial locality (row-major space filling).

Packing: ``cell_id = (grid_index << 54) | (x << 27) | y`` where
``x = floor((lon + 180) / tile_deg)``, ``y = floor((90 - lat) / tile_deg)``
(row-major from the north-west corner, matching raster row order). Grid
tile sizes are binary-exact fractions of a degree so the arithmetic is
float-exact and reproducible across engines.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import geometry as geo

_X_BITS = 27
_Y_BITS = 27
_XY_MASK = (1 << _X_BITS) - 1


@dataclass(frozen=True)
class Grid:
    """A fixed-resolution tiling of the WGS84 lon/lat plane.

    ``degrees / pixels`` defines the pixel size (reference grid spec);
    ``chunk_px`` is the tile-chunk side in pixels (reference CHUNK = 5000,
    globals.py:21). ``tile_deg = pixel_size * chunk_px`` is the cell size.
    """

    name: str
    degrees: float
    pixels: int
    chunk_px: int
    index: int  # 8-bit registry slot, part of every cell_id

    @property
    def pixel_size(self) -> float:
        return self.degrees / self.pixels

    @property
    def tile_deg(self) -> float:
        return self.pixel_size * self.chunk_px

    @property
    def nx(self) -> int:
        return int(round(360.0 / self.tile_deg))

    @property
    def ny(self) -> int:
        return int(round(180.0 / self.tile_deg))


# Registry: the two production grids (30 m and 10 m classes) plus a small
# fixture grid whose numbers are binary-exact and tiny enough for tests.
GRIDS: dict[str, Grid] = {}


def _register(name: str, degrees: float, pixels: int, chunk_px: int, index: int) -> Grid:
    """Register a grid under an EXPLICIT, permanent index. The index is
    baked into every cell_id (high bits), so it must never depend on
    registration order or shift between versions — stored corpora would
    silently stop joining. New grids take fresh indices; old indices are
    never reused."""
    if index in {g.index for g in GRIDS.values()}:
        raise ValueError(f"grid index {index} already taken")
    g = Grid(name, degrees, pixels, chunk_px, index=index)
    GRIDS[name] = g
    return g


GRID_30M = _register("10/40000", 10.0, 40000, 5000, index=1)   # 0.00025 deg px, 1.25 deg cells
GRID_10M = _register("10/100000", 10.0, 100000, 5000, index=2)  # 0.0001 deg px, 0.5 deg cells
GRID_FIXTURE = _register("4/1024", 4.0, 1024, 64, index=3)      # 0.00390625 deg px, 0.25 deg cells
GRID_FIXTURE_FINE = _register("4/2048", 4.0, 2048, 64, index=4)  # finest-grid resampling tests
GRID_BENCH = _register("4/4096", 4.0, 4096, 256, index=5)  # bench: 0.25 deg cells, 256x256 px tiles
GRID_FIXTURE_COARSE = _register("4/512", 4.0, 512, 64, index=6)  # 2x coarser px, 0.5 deg cells
GRID_SCALE = _register("4/16384", 4.0, 16384, 1024, index=7)  # scaling bench: 1024x1024 px tiles
# reprojection target: 1-deg cells of 250px (0.004-deg px) — deliberately a
# NON-integer pixel ratio vs the 4/1024 family (128/125) so nearest-neighbor
# resampling is exercised for real, while cells still nest 4x4
GRID_REPRO = _register("1/250", 1.0, 250, 250, index=8)

_BY_INDEX = {g.index: g for g in GRIDS.values()}


def get_grid(name: str) -> Grid:
    return GRIDS[name]


# ---------------------------------------------------------------------------
# Cell codec (all vectorized over numpy arrays)
# ---------------------------------------------------------------------------

def cell_from_xy(grid: Grid, x, y):
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (np.int64(grid.index) << np.int64(_X_BITS + _Y_BITS)) | (x << np.int64(_Y_BITS)) | y


def cell_to_xy(cell_id):
    c = np.asarray(cell_id, dtype=np.int64)
    return (c >> np.int64(_Y_BITS)) & np.int64(_XY_MASK), c & np.int64(_XY_MASK)


def cell_grid_index(cell_id):
    return np.asarray(cell_id, dtype=np.int64) >> np.int64(_X_BITS + _Y_BITS)


def grid_of_cell(cell_id: int) -> Grid:
    return _BY_INDEX[int(cell_grid_index(cell_id))]


def latlng_to_cell(grid: Grid, lons, lats):
    """Batched point -> cell (H3 ``latlng_to_cell`` role)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    x = np.floor((lons + 180.0) / grid.tile_deg).astype(np.int64)
    y = np.floor((90.0 - lats) / grid.tile_deg).astype(np.int64)
    x = np.clip(x, 0, grid.nx - 1)
    y = np.clip(y, 0, grid.ny - 1)
    return cell_from_xy(grid, x, y)


def cell_bounds(grid: Grid, cell_id):
    """Vectorized cell -> (minx, miny, maxx, maxy)."""
    x, y = cell_to_xy(cell_id)
    minx = -180.0 + x.astype(np.float64) * grid.tile_deg
    maxy = 90.0 - y.astype(np.float64) * grid.tile_deg
    return minx, maxy - grid.tile_deg, minx + grid.tile_deg, maxy


def cell_centroid_lat(grid: Grid, cell_id):
    _, miny, _, maxy = cell_bounds(grid, cell_id)
    return (miny + maxy) / 2.0


def cell_affine(grid: Grid, cell_id: int) -> tuple[float, float, float]:
    """(x0, y0, pixel_size) of the cell's raster window (north-up)."""
    minx, _, _, maxy = cell_bounds(grid, cell_id)
    return float(minx), float(maxy), grid.pixel_size


BIG_ENUM_THRESHOLD = 4096  # bbox candidate cells before the vectorized path


def cell_ratio(src: Grid, dst: Grid) -> int:
    """Integer tile-extent ratio src/dst (src coarser); raises otherwise."""
    r = src.tile_deg / dst.tile_deg
    if abs(r - round(r)) > 1e-9 or r < 1:
        raise ValueError(f"grid {src.name} is not an integer coarsening of {dst.name}")
    return int(round(r))


def upsample_to_cell(arr: np.ndarray, src: Grid, dst: Grid, src_cell: int, dst_cell: int) -> np.ndarray:
    """Resample a coarser grid's tile to one finer cell's window — the
    finest-grid co-registration rule (reference query.py:196-210 +
    window.py:96-101: all layers are read at the minimum-pixel grid;
    coarser rasters resolve by nearest/repeat). Slices the finer cell's
    sub-window out of the coarse tile, then pixel-repeats to the finer
    resolution. Requires integer extent and pixel ratios."""
    x0, y0, ps = cell_affine(dst, dst_cell)
    cx0, cy0, cps = cell_affine(src, src_cell)
    ncols = int(round(dst.chunk_px * ps / cps))  # fine extent in coarse px
    if dst.chunk_px % ncols != 0:
        raise ValueError(f"non-integer pixel ratio {src.name} -> {dst.name}")
    col0 = int(round((x0 - cx0) / cps))
    row0 = int(round((cy0 - y0) / cps))
    sub = arr[row0:row0 + ncols, col0:col0 + ncols]
    k = dst.chunk_px // ncols
    return np.repeat(np.repeat(sub, k, axis=0), k, axis=1)


def polygon_to_cells(grid: Grid, geom: geo.Geometry) -> np.ndarray:
    """All cells whose tile rectangle intersects the geometry — the tile
    enumeration that turns the spatial join into an equi-join (reference
    tiling.py:220-250 semantics: snap bbox to the grid, keep intersecting
    tiles; boundary touch counts)."""
    geom = geo.normalize(geom)
    if geo.is_empty(geom):
        return np.zeros(0, dtype=np.int64)
    minx, miny, maxx, maxy = geo.bounds(geom)
    td = grid.tile_deg
    x_lo = max(int(np.floor((minx + 180.0) / td)), 0)
    x_hi = min(int(np.floor((maxx + 180.0) / td)), grid.nx - 1)
    y_lo = max(int(np.floor((90.0 - maxy) / td)), 0)
    y_hi = min(int(np.floor((90.0 - miny) / td)), grid.ny - 1)
    # axis-aligned rectangle fast path: the geometry equals its bbox, so
    # every bbox-snapped candidate cell intersects — skip the per-cell test
    e = geo.all_edges(geom)
    if len(e) == 4 and np.all((e[:, 0] == e[:, 2]) | (e[:, 1] == e[:, 3])):
        xs, ys = np.meshgrid(np.arange(x_lo, x_hi + 1), np.arange(y_lo, y_hi + 1))
        return np.asarray(cell_from_xy(grid, xs.ravel(), ys.ravel()))
    # giant-AOI path (the reference's ">1 billion ha" case): the per-cell
    # Python intersects test is O(bbox cells x edges); switch to the
    # vectorized boundary-walk + interior-fill enumeration
    if (x_hi - x_lo + 1) * (y_hi - y_lo + 1) > BIG_ENUM_THRESHOLD:
        return _polygon_to_cells_big(grid, geom, e, x_lo, x_hi, y_lo, y_hi)
    out = []
    for y in range(y_lo, y_hi + 1):
        cmaxy = 90.0 - y * td
        for x in range(x_lo, x_hi + 1):
            cminx = -180.0 + x * td
            if geo.intersects_rect(geom, cminx, cmaxy - td, cminx + td, cmaxy):
                out.append((x, y))
    if not out:
        return np.zeros(0, dtype=np.int64)
    arr = np.asarray(out, dtype=np.int64)
    return np.asarray(cell_from_xy(grid, arr[:, 0], arr[:, 1]))


def _polygon_to_cells_big(grid: Grid, geom, e: np.ndarray,
                          x_lo: int, x_hi: int, y_lo: int, y_hi: int) -> np.ndarray:
    """Vectorized cell enumeration for large bboxes.

    Pixel-contribution-exact: returns every cell that can contribute pixels
    (any pixel CENTER could be inside), as the union of

    - cells whose center lies inside the polygon (vectorized even-odd per
      scanline row), and
    - cells the polygon BOUNDARY passes through: for every edge, its
      endpoints' cells plus, at each crossing of a grid line, the cells on
      both sides — all computed as flat numpy batches, no per-cell Python.

    Cells touched only on their closed boundary (zero interior overlap)
    may differ from the small-path `intersects_rect` answer; such cells
    contain no pixel centers of the polygon and contribute no rows, so
    tile ASSIGNMENTS (cells with actual pixel overlap) are identical.
    """
    td = grid.tile_deg
    nx_c = x_hi - x_lo + 1
    ny_c = y_hi - y_lo + 1

    # -- interior: cell-center containment, row-vectorized scanline --------
    cx = -180.0 + (np.arange(x_lo, x_hi + 1) + 0.5) * td
    cy = 90.0 - (np.arange(y_lo, y_hi + 1) + 0.5) * td
    x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    dy = y2 - y1
    keep = np.zeros((ny_c, nx_c), dtype=bool)
    slope = (x2 - x1) / np.where(dy == 0, 1.0, dy)
    for r in range(ny_c):
        py = cy[r]
        straddles = (y1 <= py) != (y2 <= py)
        if straddles.any():
            xc = x1[straddles] + (py - y1[straddles]) * slope[straddles]
            xc.sort()
            nright = len(xc) - np.searchsorted(xc, cx, side="right")
            keep[r] = (nright % 2).astype(bool)

    # -- boundary: cells crossed by edges ----------------------------------
    def mark(xs: np.ndarray, ys: np.ndarray) -> None:
        gx = np.clip(np.floor((xs + 180.0) / td).astype(np.int64), x_lo, x_hi) - x_lo
        gy = np.clip(np.floor((90.0 - ys) / td).astype(np.int64), y_lo, y_hi) - y_lo
        keep[gy, gx] = True

    mark(np.concatenate([x1, x2]), np.concatenate([y1, y2]))  # endpoints
    # crossings with vertical grid lines x = k*td: mark both neighbor cells
    exmin, exmax = np.minimum(x1, x2), np.maximum(x1, x2)
    k_lo = np.ceil((exmin + 180.0) / td).astype(np.int64)
    k_hi = np.floor((exmax + 180.0) / td).astype(np.int64)
    counts = np.maximum(k_hi - k_lo + 1, 0)
    if counts.sum() > 0:
        eidx = np.repeat(np.arange(len(e)), counts)
        ks = np.concatenate([np.arange(a, b + 1) for a, b in zip(k_lo, k_hi) if b >= a])
        xs = -180.0 + ks * td
        dx = x2[eidx] - x1[eidx]
        t = np.where(dx == 0, 0.0, (xs - x1[eidx]) / np.where(dx == 0, 1.0, dx))
        ys = y1[eidx] + t * (y2[eidx] - y1[eidx])
        half = td * 1e-6
        mark(xs - half, ys)
        mark(xs + half, ys)
    # crossings with horizontal grid lines y = 90 - k*td
    eymin, eymax = np.minimum(y1, y2), np.maximum(y1, y2)
    k_lo = np.ceil((90.0 - eymax) / td).astype(np.int64)
    k_hi = np.floor((90.0 - eymin) / td).astype(np.int64)
    counts = np.maximum(k_hi - k_lo + 1, 0)
    if counts.sum() > 0:
        eidx = np.repeat(np.arange(len(e)), counts)
        ks = np.concatenate([np.arange(a, b + 1) for a, b in zip(k_lo, k_hi) if b >= a])
        ys = 90.0 - ks * td
        dyv = y2[eidx] - y1[eidx]
        t = np.where(dyv == 0, 0.0, (ys - y1[eidx]) / np.where(dyv == 0, 1.0, dyv))
        xs = x1[eidx] + t * (x2[eidx] - x1[eidx])
        half = td * 1e-6
        mark(xs, ys - half)
        mark(xs, ys + half)

    gy, gx = np.nonzero(keep)
    return np.asarray(cell_from_xy(grid, gx + x_lo, gy + y_lo))


def k_ring(grid: Grid, cell_id: int, k: int = 1) -> np.ndarray:
    """The (2k+1)^2 neighborhood of a cell (kNN candidate pruning)."""
    x, y = cell_to_xy(cell_id)
    xs, ys = np.meshgrid(
        np.arange(int(x) - k, int(x) + k + 1), np.arange(int(y) - k, int(y) + k + 1)
    )
    xs = np.mod(xs.ravel(), grid.nx)  # wrap antimeridian
    ys = ys.ravel()
    keep = (ys >= 0) & (ys < grid.ny)
    return np.asarray(cell_from_xy(grid, xs[keep], ys[keep]))


# ---------------------------------------------------------------------------
# Reference tile-id string parity (source-URI naming shims, grid.py:53-127)
# ---------------------------------------------------------------------------

def tile_id_nw(lat_top: float, lon_left: float) -> str:
    """GFW data-lake style NW-corner tile name, e.g. ``10N_010E``."""
    ns = "N" if lat_top >= 0 else "S"
    ew = "E" if lon_left >= 0 else "W"
    return f"{abs(int(lat_top)):02d}{ns}_{abs(int(lon_left)):03d}{ew}"


def tile_id_nwse(lon_w: float, lat_s: float, lon_e: float, lat_n: float) -> str:
    """W_S_E_N style tile name used by some layers."""
    return f"{int(lon_w)}_{int(lat_s)}_{int(lon_e)}_{int(lat_n)}"


def line_to_cells(grid: Grid, lines) -> np.ndarray:
    """All cells whose tile rectangle the polyline touches — the
    supercover enumeration that turns a line x polygon intersects-join
    into a cell equi-join (same role as :func:`polygon_to_cells` for
    AOIs; boundary touch counts, matching the line kernel's
    closed-region semantics). Per-segment bbox candidates filtered by
    the exact Liang-Barsky rectangle test, so a long diagonal transect
    enumerates O(cells touched), not O(bbox)."""
    e = geo.line_edges(lines)
    if not len(e):
        return np.zeros(0, dtype=np.int64)
    td = grid.tile_deg
    seen: set = set()
    for seg in e:
        sminx, smaxx = (seg[0], seg[2]) if seg[0] <= seg[2] else (seg[2], seg[0])
        sminy, smaxy = (seg[1], seg[3]) if seg[1] <= seg[3] else (seg[3], seg[1])
        x_lo = max(int(np.floor((sminx + 180.0) / td)), 0)
        x_hi = min(int(np.floor((smaxx + 180.0) / td)), grid.nx - 1)
        y_lo = max(int(np.floor((90.0 - smaxy) / td)), 0)
        y_hi = min(int(np.floor((90.0 - sminy) / td)), grid.ny - 1)
        s1 = seg[None, :]
        for y in range(y_lo, y_hi + 1):
            cmaxy = 90.0 - y * td
            for x in range(x_lo, x_hi + 1):
                if (x, y) in seen:
                    continue
                cminx = -180.0 + x * td
                if geo._segments_intersect_rect(
                    s1, cminx, cmaxy - td, cminx + td, cmaxy
                ):
                    seen.add((x, y))
    if not seen:
        return np.zeros(0, dtype=np.int64)
    arr = np.asarray(sorted(seen), dtype=np.int64)
    return np.asarray(cell_from_xy(grid, arr[:, 0], arr[:, 1]))
