"""Pure-numpy planar geometry: WKB codec, point-in-polygon, rasterization.

This replaces the reference's shapely + rasterio dependency surface
(reference geometry.py, data_cube.py:74-109) with vectorized numpy kernels,
because the execution environment ships neither library and because the
kernels must run inside Arrow-batched pandas UDFs with no per-row Python.

Geometry model
--------------
A geometry is a list of polygons; a polygon is a list of rings; a ring is
an ``(N, 2)`` float64 array of (lon, lat) vertices (closure implicit).
The first ring of a polygon is the exterior, the rest are holes — but all
containment uses the **even-odd rule** over the union of all rings, which
is also what burning a polygon onto a raster grid does (GDAL-style center
containment, the reference's `geometry_mask(..., invert=True)` semantics,
reference data_cube.py:39-41). Even-odd is robust to the self-touching /
self-intersecting inputs the reference repairs with ``.buffer(0)``
(reference tiling.py:52), so "validity repair" reduces to dropping
degenerate rings here.

Containment convention: a point exactly on a boundary is half-open
(counted via the ``y1 <= y < y2`` crossing rule); fixtures place AOI edges
off pixel centers so boundary ties never decide a test.
"""

from __future__ import annotations

import struct

import numpy as np

# WKB geometry type codes (OGC simple features, public spec)
_WKB_POINT = 1
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6

Ring = np.ndarray  # (N, 2) float64
Polygon = list  # list[Ring]
Geometry = list  # list[Polygon]


# ---------------------------------------------------------------------------
# WKB codec
# ---------------------------------------------------------------------------

def wkb_dumps(geom: Geometry) -> bytes:
    """Serialize to little-endian WKB (MULTIPOLYGON always, for stability)."""
    out = [b"\x01", struct.pack("<I", _WKB_MULTIPOLYGON), struct.pack("<I", len(geom))]
    for poly in geom:
        out.append(b"\x01")
        out.append(struct.pack("<I", _WKB_POLYGON))
        out.append(struct.pack("<I", len(poly)))
        for ring in poly:
            r = np.asarray(ring, dtype=np.float64)
            # explicit closure on disk (WKB convention)
            if len(r) and not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            out.append(struct.pack("<I", len(r)))
            out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def _read_ring(buf: memoryview, off: int, bo: str) -> tuple[Ring, int]:
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype=("<f8" if bo == "<" else ">f8"), count=2 * n, offset=off)
    off += 16 * n
    ring = pts.reshape(n, 2).astype(np.float64)
    # drop explicit closure for the in-memory form
    if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring, off


def _read_polygon_body(buf: memoryview, off: int, bo: str) -> tuple[Polygon, int]:
    (nrings,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        ring, off = _read_ring(buf, off, bo)
        if len(ring) >= 3:
            rings.append(ring)
    return rings, off


def wkb_loads(data: bytes) -> Geometry:
    """Parse WKB Polygon / MultiPolygon (either endianness) to a Geometry."""
    buf = memoryview(data)
    off = 0

    def header(off: int) -> tuple[str, int, int]:
        bo = "<" if buf[off] == 1 else ">"
        (gtype,) = struct.unpack_from(bo + "I", buf, off + 1)
        return bo, gtype & 0xFF, off + 5  # mask out SRID/Z flags

    bo, gtype, off = header(off)
    if gtype == _WKB_POLYGON:
        poly, off = _read_polygon_body(buf, off, bo)
        return [poly] if poly else []
    if gtype == _WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        geom: Geometry = []
        for _ in range(npoly):
            bo2, gtype2, off = header(off)
            if gtype2 != _WKB_POLYGON:
                raise ValueError(f"unexpected member type {gtype2} in MultiPolygon")
            poly, off = _read_polygon_body(buf, off, bo2)
            if poly:
                geom.append(poly)
        return geom
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def box(minx: float, miny: float, maxx: float, maxy: float) -> Geometry:
    """Axis-aligned box geometry (CCW exterior)."""
    ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]], dtype=np.float64
    )
    return [[ring]]


# ---------------------------------------------------------------------------
# Basic measures
# ---------------------------------------------------------------------------

def bounds(geom: Geometry) -> tuple[float, float, float, float]:
    xs_min = ys_min = np.inf
    xs_max = ys_max = -np.inf
    for poly in geom:
        for ring in poly:
            xs_min = min(xs_min, float(ring[:, 0].min()))
            xs_max = max(xs_max, float(ring[:, 0].max()))
            ys_min = min(ys_min, float(ring[:, 1].min()))
            ys_max = max(ys_max, float(ring[:, 1].max()))
    return xs_min, ys_min, xs_max, ys_max


def all_edges(geom: Geometry) -> np.ndarray:
    """All ring edges as an (E, 4) array of (x1, y1, x2, y2)."""
    segs = []
    for poly in geom:
        for ring in poly:
            nxt = np.roll(ring, -1, axis=0)
            segs.append(np.hstack([ring, nxt]))
    if not segs:
        return np.zeros((0, 4), dtype=np.float64)
    return np.vstack(segs)


def is_empty(geom: Geometry) -> bool:
    return not geom or all(not poly for poly in geom)


# ---------------------------------------------------------------------------
# Containment (even-odd crossing number, vectorized)
# ---------------------------------------------------------------------------

def contains_points(geom: Geometry, xs, ys, edges: np.ndarray | None = None) -> np.ndarray:
    """Even-odd point-in-polygon for arrays of points. O(E * P) broadcast,
    chunked so memory stays bounded for large point sets. ``edges`` lets
    hot callers reuse a precomputed :func:`all_edges` array."""
    xs = np.asarray(xs, dtype=np.float64).ravel()
    ys = np.asarray(ys, dtype=np.float64).ravel()
    e = all_edges(geom) if edges is None else edges
    if len(e) == 0 or len(xs) == 0:
        return np.zeros(len(xs), dtype=bool)
    x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    out = np.zeros(len(xs), dtype=bool)
    chunk = max(1, int(4_000_000 // max(len(e), 1)))
    for s in range(0, len(xs), chunk):
        px = xs[s : s + chunk][:, None]
        py = ys[s : s + chunk][:, None]
        # half-open vertical rule avoids double counting shared vertices
        straddles = (y1[None, :] <= py) != (y2[None, :] <= py)
        # over="ignore": dividing by a subnormal dy overflows only for
        # NON-straddling near-horizontal edges, all masked out by the
        # `straddles &` on the next line (straddles bound |py-y1| <= |dy|).
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            xcross = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        hits = straddles & (xcross > px)
        out[s : s + chunk] = (hits.sum(axis=1) % 2).astype(bool)
    return out


def rasterize_mask(
    geom: Geometry,
    x0: float,
    y0: float,
    pixel_size: float,
    width: int,
    height: int,
    edges: np.ndarray | None = None,
) -> np.ndarray:
    """Burn the geometry onto a north-up grid: ``mask[i, j]`` is True iff
    the center of pixel (row i, col j) lies inside the geometry (even-odd).

    Grid convention: pixel (0, 0) has its *top-left corner* at (x0, y0) and
    rows increase southward — the reference's affine layout. The zonal AOI
    mask (reference data_cube.py:74-109) is exactly this operator.

    Scanline algorithm: for each pixel-center latitude, collect the edge
    crossings' longitudes and count, per pixel center, how many crossings
    lie strictly to its right via a sorted ``searchsorted`` — O(H * E log E)
    and fully vectorized along the width axis.
    """
    e = all_edges(geom) if edges is None else edges
    mask = np.zeros((height, width), dtype=bool)
    if len(e) == 0:
        return mask
    cx = x0 + (np.arange(width, dtype=np.float64) + 0.5) * pixel_size
    cy = y0 - (np.arange(height, dtype=np.float64) + 0.5) * pixel_size
    x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    dy = y2 - y1

    # Axis-aligned rectangle fast path (the AOI-clip of a box AOI — the
    # overwhelmingly common zonal shape): the even-odd mask is an outer
    # product of two 1-D interval tests, O(H + W) instead of O(H*E*W).
    if len(e) == 4 and np.all((x1 == x2) | (y1 == y2)):
        minx, maxx = min(x1.min(), x2.min()), max(x1.max(), x2.max())
        miny, maxy = min(y1.min(), y2.min()), max(y1.max(), y2.max())
        # match the scanline parity exactly: the straddle test
        # (y1 <= py) != (y2 <= py) admits miny <= py < maxy, and "odd
        # crossings strictly right of the center" admits minx <= px < maxx
        row_in = (cy >= miny) & (cy < maxy)
        col_in = (cx >= minx) & (cx < maxx)
        return np.logical_and(row_in[:, None], col_in[None, :])

    # Fully vectorized path for modest edge counts (the common AOI-clip
    # case): crossings for all (row, edge) pairs at once, then a broadcast
    # count of crossings right of each pixel center. Peak temp is the
    # H x E x W comparison cube, so gate on its size.
    if len(e) * height * width <= 32_000_000:
        py = cy[:, None]                                   # H x 1
        straddles = (y1[None, :] <= py) != (y2[None, :] <= py)  # H x E
        # over="ignore": a NON-straddling near-horizontal edge can overflow
        # the slope product, but every such entry is masked to -inf on the
        # next line; straddling edges are bounded (|py-y1| <= |dy| there).
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            xc = x1[None, :] + (py - y1[None, :]) * ((x2 - x1) / np.where(dy == 0, 1.0, dy))[None, :]
        xc = np.where(straddles, xc, -np.inf)              # non-crossings never right of a center
        nright = (xc[:, :, None] > cx[None, None, :]).sum(axis=1)  # H x W
        return (nright % 2).astype(bool)

    for i in range(height):
        py = cy[i]
        straddles = (y1 <= py) != (y2 <= py)
        if not straddles.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xc = x1[straddles] + (py - y1[straddles]) * (x2[straddles] - x1[straddles]) / dy[straddles]
        xc.sort()
        # crossings strictly right of each center; odd count => inside
        nright = len(xc) - np.searchsorted(xc, cx, side="right")
        mask[i] = (nright % 2).astype(bool)
    return mask


def coverage_counts(
    geom: Geometry,
    x0: float,
    y0: float,
    pixel_size: float,
    width: int,
    height: int,
    k: int = 4,
    edges: np.ndarray | None = None,
) -> np.ndarray:
    """Supersampled PARTIAL-PIXEL coverage: ``counts[i, j]`` is how many
    of pixel (i, j)'s k x k subpixel centers lie inside the geometry
    (0..k^2); ``counts / k**2`` is the antialiased coverage fraction.
    This is the standard accuracy upgrade over center-containment
    rasterization for AOIs small relative to the pixel (GDAL exposes the
    same idea as oversampled `gdal_rasterize`; exact per-pixel clip
    areas cost a polygon clip per boundary pixel for one extra bit of
    precision). Subpixel centers sit at x0 + (jk + 0.5) * pixel_size/k
    — the same half-open center-containment convention as
    :func:`rasterize_mask`, evaluated on the k-times-finer grid, so an
    exact SQL twin can replicate every count with interval predicates.
    Cost: one rasterize at k^2 the pixels + one reshape-sum."""
    fine = rasterize_mask(
        geom, x0, y0, pixel_size / k, width * k, height * k, edges=edges
    )
    return (
        fine.reshape(height, k, width, k).sum(axis=(1, 3)).astype(np.int32)
    )


# ---------------------------------------------------------------------------
# Rectangle predicates / clipping (tile enumeration + per-tile clip)
# ---------------------------------------------------------------------------

def _segments_intersect_rect(e: np.ndarray, minx, miny, maxx, maxy) -> bool:
    """Liang-Barsky: does any segment have a non-empty intersection with the
    closed rectangle? Vectorized over segments."""
    if len(e) == 0:
        return False
    x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    dx, dy = x2 - x1, y2 - y1
    t0 = np.zeros(len(e))
    t1 = np.ones(len(e))
    ok = np.ones(len(e), dtype=bool)
    for p, q in (
        (-dx, x1 - minx),
        (dx, maxx - x1),
        (-dy, y1 - miny),
        (dy, maxy - y1),
    ):
        para = p == 0
        ok &= ~(para & (q < 0))  # parallel and fully outside
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(para, 0.0, q / np.where(p == 0, 1.0, p))
        t0 = np.where(ok & ~para & (p < 0), np.maximum(t0, r), t0)
        t1 = np.where(ok & ~para & (p > 0), np.minimum(t1, r), t1)
    return bool((ok & (t0 <= t1)).any())


def intersects_rect(geom: Geometry, minx, miny, maxx, maxy) -> bool:
    """Closed-set intersection test between the geometry and a rectangle —
    the tile-enumeration predicate (reference tiling.py:220-237 keeps every
    grid tile with ``geom.intersects(tile)``; boundary touch counts)."""
    if is_empty(geom):
        return False
    gminx, gminy, gmaxx, gmaxy = bounds(geom)
    if gminx > maxx or gmaxx < minx or gminy > maxy or gmaxy < miny:
        return False
    # any rect corner or center strictly inside the polygon (rect within geom)
    cxs = [minx, maxx, minx, maxx, (minx + maxx) / 2]
    cys = [miny, miny, maxy, maxy, (miny + maxy) / 2]
    if contains_points(geom, cxs, cys).any():
        return True
    # any edge touches the rect (covers geom-vertex-in-rect too)
    return _segments_intersect_rect(all_edges(geom), minx, miny, maxx, maxy)


def cover_meta(geom: Geometry, edges: np.ndarray | None = None) -> tuple:
    """Precomputed acceleration data for repeated :func:`covers_rect` calls
    against ONE geometry (the zonal full-cover memo probes every overlapped
    cell of every AOI): ``(is_aa_box, (gminx, gminy, gmaxx, gmaxy), ex_lo,
    ex_hi, ey_lo, ey_hi)``. A single axis-aligned box covers exactly the
    rects inside its closed bbox, so the per-call test collapses to O(1) —
    the overwhelmingly common AOI shape (bbox batches)."""
    e = all_edges(geom) if edges is None else edges
    if len(e) == 0:
        return (False, (0.0, 0.0, -1.0, -1.0), e, e, e, e)
    ex_lo = np.minimum(e[:, 0], e[:, 2])
    ex_hi = np.maximum(e[:, 0], e[:, 2])
    ey_lo = np.minimum(e[:, 1], e[:, 3])
    ey_hi = np.maximum(e[:, 1], e[:, 3])
    bbox = (float(ex_lo.min()), float(ey_lo.min()), float(ex_hi.max()), float(ey_hi.max()))
    is_aa_box = False
    if (
        len(geom) == 1 and len(geom[0]) == 1 and len(e) == 4
        and bbox[2] > bbox[0] and bbox[3] > bbox[1]
    ):
        horiz = e[e[:, 1] == e[:, 3]]
        vert = e[e[:, 0] == e[:, 2]]
        # a true rectangle: exactly two horizontal edges spanning the full
        # x-extent at y=miny/maxy and two verticals spanning the full
        # y-extent at x=minx/maxx. A degenerate zero-area ring (repeated
        # vertices) can also present 4 axis-aligned edges with a fat bbox,
        # but encloses nothing under the even-odd rule.
        is_aa_box = (
            len(horiz) == 2 and len(vert) == 2
            and sorted(horiz[:, 1].tolist()) == [bbox[1], bbox[3]]
            and sorted(vert[:, 0].tolist()) == [bbox[0], bbox[2]]
            and bool(np.all(np.minimum(horiz[:, 0], horiz[:, 2]) == bbox[0]))
            and bool(np.all(np.maximum(horiz[:, 0], horiz[:, 2]) == bbox[2]))
            and bool(np.all(np.minimum(vert[:, 1], vert[:, 3]) == bbox[1]))
            and bool(np.all(np.maximum(vert[:, 1], vert[:, 3]) == bbox[3]))
        )
    return (is_aa_box, bbox, ex_lo, ex_hi, ey_lo, ey_hi)


def covers_rect(geom: Geometry, minx, miny, maxx, maxy,
                edges: np.ndarray | None = None, meta: tuple | None = None) -> bool:
    """CONSERVATIVE full-containment test: True only when the closed rect
    is certainly inside the geometry. Used to skip rasterize+mask for tiles
    interior to an AOI (their zonal mask is all-True by construction, so
    the per-cell static-mask result can be reused). False negatives are
    fine — callers fall back to rasterizing.

    Fast paths (``meta`` from :func:`cover_meta`): O(1) bbox rejection, and
    an O(1) exact answer for a single axis-aligned box (rect within the
    closed bbox => every pixel CENTER of the rect is inside under the
    rasterize parity rule, so full-cover reuse stays correct even when the
    rect touches the box boundary). General geometries keep the
    conservative test: no edge bbox may touch the rect (a hole inside the
    rect would bring its edges with it) and the rect's corners are inside."""
    e = all_edges(geom) if edges is None else edges
    if len(e) == 0:
        return False
    if meta is None:
        meta = cover_meta(geom, e)
    is_aa_box, (gminx, gminy, gmaxx, gmaxy), ex_lo, ex_hi, ey_lo, ey_hi = meta
    if minx < gminx or maxx > gmaxx or miny < gminy or maxy > gmaxy:
        return False
    if is_aa_box:
        return True
    if bool(np.any((ex_hi >= minx) & (ex_lo <= maxx) & (ey_hi >= miny) & (ey_lo <= maxy))):
        return False
    return bool(
        contains_points(
            geom, [minx, maxx, minx, maxx], [miny, miny, maxy, maxy], edges=e
        ).all()
    )


def _clip_ring_rect(ring: Ring, minx, miny, maxx, maxy) -> Ring | None:
    """Sutherland-Hodgman clip of one ring against the rectangle."""
    pts = ring
    for axis, bound, keep_ge in (
        (0, minx, True),
        (0, maxx, False),
        (1, miny, True),
        (1, maxy, False),
    ):
        if len(pts) == 0:
            return None
        out = []
        n = len(pts)
        for i in range(n):
            cur = pts[i]
            prv = pts[i - 1]
            cur_in = cur[axis] >= bound if keep_ge else cur[axis] <= bound
            prv_in = prv[axis] >= bound if keep_ge else prv[axis] <= bound
            if cur_in != prv_in:
                t = (bound - prv[axis]) / (cur[axis] - prv[axis])
                out.append(prv + t * (cur - prv))
            if cur_in:
                out.append(cur)
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return None
    return pts


def clip_to_rect(geom: Geometry, minx, miny, maxx, maxy) -> Geometry:
    """Clip geometry to a rectangle (per-tile geometry, reference
    geometry.py:11-40). Even-odd semantics let rings clip independently."""
    out: Geometry = []
    for poly in geom:
        rings = []
        for ring in poly:
            c = _clip_ring_rect(ring, minx, miny, maxx, maxy)
            if c is not None:
                rings.append(c)
        if rings:
            out.append(rings)
    return out


def simplify(geom: Geometry, tolerance: float) -> Geometry:
    """Douglas–Peucker ring simplification (max perpendicular deviation
    <= ``tolerance`` degrees). The reference shrinks over-limit geometry
    payloads with progressive shapely ``simplify(0.005/0.01)`` (reference
    geometry.py:43-63, a Lambda payload-size workaround); here the use
    case is shrinking multi-million-vertex AOIs before they enter the
    broadcast AOI-cell lookup. Rings that collapse below 3 distinct
    vertices are dropped (same repair rule as :func:`normalize`)."""
    out: Geometry = []
    for poly in geom:
        rings = []
        for ring in poly:
            r = np.asarray(ring, dtype=np.float64)
            closed = np.vstack([r, r[:1]]) if len(r) and not np.array_equal(r[0], r[-1]) else r
            kept = _douglas_peucker(closed, float(tolerance))
            if np.array_equal(kept[0], kept[-1]):
                kept = kept[:-1]
            if len(np.unique(kept, axis=0)) >= 3:
                rings.append(kept)
        if rings:
            out.append(rings)
    return out


def _douglas_peucker(points: np.ndarray, tol: float) -> np.ndarray:
    n = len(points)
    if n <= 2:
        return points
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = points[j] - points[i]
        length = float(np.hypot(seg[0], seg[1]))
        rel = points[i + 1: j] - points[i]
        if length == 0.0:
            d = np.hypot(rel[:, 0], rel[:, 1])
        else:
            d = np.abs(seg[0] * rel[:, 1] - seg[1] * rel[:, 0]) / length
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return points[keep]


def normalize(geom: Geometry) -> Geometry:
    """Validity repair: drop rings with <3 distinct vertices, fully
    collinear rings (zero even-odd interior — they rasterize to nothing
    and must not count as overlap in :func:`interiors_intersect`), and
    empty polygons. Even-odd masking makes heavier repair (buffer(0))
    unneeded."""
    out: Geometry = []
    for poly in geom:
        rings = []
        for ring in poly:
            r = np.asarray(ring, dtype=np.float64)
            u = np.unique(r, axis=0)
            if len(u) < 3:
                continue
            d = u[1:] - u[0]
            if np.all(d[0, 0] * d[:, 1] - d[0, 1] * d[:, 0] == 0.0):
                continue  # all vertices on one line: no interior
            rings.append(r)
        if rings:
            out.append(rings)
    return out


# ---------------------------------------------------------------------------
# Polygon x polygon interiors-intersect (vector-overlay predicate)
# ---------------------------------------------------------------------------

def _pairwise_intersection_ys(edges: np.ndarray) -> np.ndarray:
    """y-coordinates of every pairwise segment intersection within the
    edge set (proper and endpoint crossings of non-parallel pairs).
    Collinear overlaps contribute no NEW levels: an overlap endpoint is
    always an original vertex of one of the two segments, whose y is in
    the vertex level set already. Row-chunked to bound the pair-grid
    memory; fine for AOI-scale rings — swap in an interval sweep for
    megavertex geometries."""
    n = len(edges)
    if n < 2:
        return np.empty(0)
    q1 = edges[None, :, 0:2]
    q2 = edges[None, :, 2:4]
    d2 = q2 - q1
    out = []
    for lo in range(0, n, 256):
        e = edges[lo:lo + 256]
        p1 = e[:, None, 0:2]
        p2 = e[:, None, 2:4]
        d1 = p2 - p1
        den = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]
        w = q1 - p1
        # NaN/inf from den == 0 rows are discarded by the `ok` mask
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            t = (w[..., 0] * d2[..., 1] - w[..., 1] * d2[..., 0]) / den
            u = (w[..., 0] * d1[..., 1] - w[..., 1] * d1[..., 0]) / den
            yc = p1[..., 1] + t * d1[..., 1]
        ok = (den != 0.0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
        if ok.any():
            out.append(yc[ok])
    return np.concatenate(out) if out else np.empty(0)


def _in_intervals_at(edges: np.ndarray, y: float):
    """Sorted boundary-crossing x's of the even-odd region on the
    scanline at ``y`` — consecutive pairs are the region's open
    in-intervals. Returns None for a scanline whose crossing count is
    odd (a vertex landed exactly on it after float midpointing): that
    slab is skipped, losing only a measure-zero configuration."""
    y1, y2 = edges[:, 1], edges[:, 3]
    m = (y1 <= y) != (y2 <= y)
    if not m.any():
        return None
    e = edges[m]
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        xs = e[:, 0] + (y - e[:, 1]) * (e[:, 2] - e[:, 0]) / (e[:, 3] - e[:, 1])
    xs.sort()
    if len(xs) % 2:
        return None
    return xs


def _open_intervals_overlap(a: np.ndarray, b: np.ndarray) -> bool:
    """Any STRICT overlap between two sorted flat interval lists
    ((a[0],a[1]),(a[2],a[3]),...) — open-interval semantics, so a shared
    endpoint is not an overlap.

    The strictness carries a float-resolution tolerance: a collinear
    DOUBLE WALL's two crossings are mathematically equal but computed
    from two different edge parametrizations, so they can differ by an
    ulp — without the tolerance that resurrects the zero-width interval
    as a sliver and re-introduces the false accept the scanline design
    eliminates. 1e-9 in degree units is ~0.1 mm on the ground: genuine
    overlaps thinner than that are below the engine's float resolution
    (the exact-rational test oracle keeps strict-zero semantics, and the
    fuzz families sit far above the threshold on both sides)."""
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i], b[j])
        hi = min(a[i + 1], b[j + 1])
        if hi - lo > 1e-9 * (1.0 + abs(lo) + abs(hi)):
            return True
        if a[i + 1] < b[j + 1]:
            i += 2
        else:
            j += 2
    return False


def interiors_intersect(g1: Geometry, g2: Geometry) -> bool:
    """True iff the polygon INTERIORS (even-odd open regions) overlap —
    the overlay-join predicate; boundary-touching neighbors do not
    count, matching strict interval overlap for boxes. Inputs should be
    :func:`normalize`\\ d (zero-interior rings dropped).

    Decision: ONE sound-and-complete rule — a slab scanline over the
    critical y-levels of the combined edge arrangement (every vertex y
    plus every pairwise edge-intersection y, self- and cross-
    intersections alike). Between consecutive levels the arrangement
    has no vertex, so each region's in-intervals at the slab mid-line
    classify the whole slab; ``int(g1) & int(g2)`` is an open polygonal
    set whose every face spans at least one full slab (its vertices all
    sit on critical levels), and a face shows up as a STRICT overlap of
    open in-intervals at its slab's mid-line. Conversely any strict
    overlap is a positive-length segment strictly inside both — so no
    probe-point degeneracy can produce a false accept. This replaced a
    proper-crossing + probe-point cascade after a 12k-pair fuzz found
    its two traps on self-intersecting even-odd inputs: a collinear
    DOUBLE WALL (two opposite-direction traversals of one segment)
    yields genuine segment crossings that flip no region parity, and a
    probe midpoint can land exactly ON the other boundary where float
    parity is arbitrary. Verified against the independent exact-
    rational oracle (tests/geom_oracle.py) over seeded random rotated/
    concave/holed and lattice-degenerate families."""
    if is_empty(g1) or is_empty(g2):
        return False
    b1, b2 = bounds(g1), bounds(g2)
    if b1[0] >= b2[2] or b2[0] >= b1[2] or b1[1] >= b2[3] or b2[1] >= b1[3]:
        return False
    e1, e2 = all_edges(g1), all_edges(g2)
    if not len(e1) or not len(e2):
        return False
    lo, hi = max(b1[1], b2[1]), min(b1[3], b2[3])
    eall = np.vstack([e1, e2])
    ys = np.concatenate(
        [eall[:, 1], eall[:, 3], _pairwise_intersection_ys(eall)]
    )
    ys = np.unique(ys[(ys >= lo) & (ys <= hi)])
    for ym in (ys[:-1] + ys[1:]) / 2.0:
        xs1 = _in_intervals_at(e1, ym)
        if xs1 is None:
            continue
        xs2 = _in_intervals_at(e2, ym)
        if xs2 is None:
            continue
        if _open_intervals_overlap(xs1, xs2):
            return True
    return False


def _overlap_length(a: np.ndarray, b: np.ndarray) -> float:
    """Total length of the intersection of two sorted flat interval
    lists. Unlike :func:`_open_intervals_overlap` this MEASURES instead
    of deciding, so it needs no strictness tolerance: an ulp-split
    double wall contributes an ulp of length, not a wrong verdict."""
    i = j = 0
    total = 0.0
    while i < len(a) and j < len(b):
        lo = max(a[i], b[j])
        hi = min(a[i + 1], b[j + 1])
        if hi > lo:
            total += hi - lo
        if a[i + 1] < b[j + 1]:
            i += 2
        else:
            j += 2
    return total


def _slab_area(pieces: list, lo: float, hi: float) -> float:
    """Sum of h x mid-line-overlap over the slabs of the combined edge
    arrangement of ``pieces`` (each an edge array), clipped to y in
    [lo, hi]. Exact for polygonal regions because between consecutive
    critical levels every boundary x is linear in y with a fixed
    ordering, so each overlap-interval length is linear in y and its
    integral over the slab equals slab height times its mid-line value.
    A slab whose mid-line degenerates (odd crossing count, only possible
    when float midpointing collapses onto a level — an ulp-thin slab)
    is skipped, losing at most an ulp-sized sliver of area."""
    if hi <= lo:
        return 0.0
    eall = np.vstack(pieces)
    ys = np.concatenate(
        [eall[:, 1], eall[:, 3], _pairwise_intersection_ys(eall)]
    )
    ys = np.unique(ys[(ys >= lo) & (ys <= hi)])
    area = 0.0
    for y0, y1 in zip(ys[:-1], ys[1:]):
        ym = (y0 + y1) / 2.0
        xs = [_in_intervals_at(e, ym) for e in pieces]
        if any(x is None for x in xs):
            continue
        length = xs[0][1::2].sum() - xs[0][0::2].sum() if len(pieces) == 1 \
            else _overlap_length(xs[0], xs[1])
        if length > 0.0:
            area += (y1 - y0) * length
    return area


def region_area(geom: Geometry) -> float:
    """Planar area of the even-odd region (degrees^2 on the lon/lat
    plane — multiply by geodesy for hectares). Same slab-scanline rule
    as :func:`interiors_intersect`, so it is exact on self-intersecting
    even-odd inputs where the shoelace formula over-counts double-wall
    and bowtie configurations."""
    if is_empty(geom):
        return 0.0
    e = all_edges(geom)
    if not len(e):
        return 0.0
    b = bounds(geom)
    return _slab_area([e], b[1], b[3])


def intersection_area(g1: Geometry, g2: Geometry) -> float:
    """Planar area of ``int(g1) & int(g2)`` (even-odd interiors), the
    measured form of :func:`interiors_intersect`: the same critical-
    level slab decomposition, accumulating h x overlap-length instead
    of deciding strict overlap. Zero for disjoint or merely
    boundary-touching inputs (a zero-width overlap has zero measure).
    Union area and IoU follow as |A| + |B| - |A&B| without new
    machinery."""
    if is_empty(g1) or is_empty(g2):
        return 0.0
    b1, b2 = bounds(g1), bounds(g2)
    if b1[0] >= b2[2] or b2[0] >= b1[2] or b1[1] >= b2[3] or b2[1] >= b1[3]:
        return 0.0
    e1, e2 = all_edges(g1), all_edges(g2)
    if not len(e1) or not len(e2):
        return 0.0
    return _slab_area([e1, e2], max(b1[1], b2[1]), min(b1[3], b2[3]))


# ---------------------------------------------------------------------------
# Linestrings: WKB codec + exact length-in-region (the vector-raster
# engine's third geometry type — roads/rivers per admin area queries)
# ---------------------------------------------------------------------------

_WKB_LINESTRING = 2
_WKB_MULTILINESTRING = 5

# a line geometry is a list of paths; a path is an (N, 2) float64 array of
# consecutive vertices (NOT closed)
Path = np.ndarray
Lines = list


def wkb_dumps_lines(lines: Lines) -> bytes:
    """Serialize paths to little-endian WKB (MULTILINESTRING always)."""
    out = [b"\x01", struct.pack("<I", _WKB_MULTILINESTRING),
           struct.pack("<I", len(lines))]
    for path in lines:
        p = np.asarray(path, dtype=np.float64)
        out.append(b"\x01")
        out.append(struct.pack("<I", _WKB_LINESTRING))
        out.append(struct.pack("<I", len(p)))
        out.append(p.astype("<f8").tobytes())
    return b"".join(out)


def wkb_loads_lines(data: bytes) -> Lines:
    """Parse WKB LineString / MultiLineString (either endianness)."""
    buf = memoryview(data)

    def header(off: int) -> tuple[str, int, int]:
        bo = "<" if buf[off] == 1 else ">"
        (gtype,) = struct.unpack_from(bo + "I", buf, off + 1)
        return bo, gtype & 0xFF, off + 5

    def path_body(off: int, bo: str) -> tuple[Path, int]:
        (n,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        pts = np.frombuffer(
            buf, dtype=("<f8" if bo == "<" else ">f8"), count=2 * n, offset=off
        )
        return pts.reshape(n, 2).astype(np.float64), off + 16 * n

    bo, gtype, off = header(0)
    if gtype == _WKB_LINESTRING:
        path, _ = path_body(off, bo)
        return [path] if len(path) >= 2 else []
    if gtype == _WKB_MULTILINESTRING:
        (npath,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        lines: Lines = []
        for _ in range(npath):
            bo2, g2, off = header(off)
            if g2 != _WKB_LINESTRING:
                raise ValueError(f"unexpected member type {g2} in MultiLineString")
            path, off = path_body(off, bo2)
            if len(path) >= 2:
                lines.append(path)
        return lines
    raise ValueError(f"unsupported WKB line geometry type {gtype}")


def lines_bounds(lines: Lines) -> tuple[float, float, float, float]:
    pts = np.vstack(lines)
    return (
        float(pts[:, 0].min()), float(pts[:, 1].min()),
        float(pts[:, 0].max()), float(pts[:, 1].max()),
    )


def lines_length(lines: Lines) -> float:
    """Total planar length (degree units on the lon/lat plane)."""
    total = 0.0
    for path in lines:
        d = np.diff(np.asarray(path, dtype=np.float64), axis=0)
        total += float(np.hypot(d[:, 0], d[:, 1]).sum())
    return total


def line_length_in_region(lines: Lines, geom: Geometry) -> float:
    """Planar length of the paths inside the CLOSED even-odd region
    (interior + boundary — GIS ``ST_Length(ST_Intersection(line,
    polygon))`` semantics: a road riding an admin border still counts).

    Per segment: split at every parameter where it meets a region edge
    (generic crossings via the segment-pair solve; collinear overlaps
    via endpoint projection), then classify each piece by its midpoint —
    inside by the even-odd crossing rule, or ON an edge within a
    float-resolution tolerance (a boundary-riding piece's midpoint is
    mathematically on the edge but float-split endpoints can sit an ulp
    off it). Between consecutive split parameters the segment stays
    entirely in, on, or out, so midpoints classify exactly; the exact-
    rational test oracle (tests/geom_oracle.py) re-derives the same
    rule with strict-zero tolerances."""
    if not lines or is_empty(geom):
        return 0.0
    e = all_edges(geom)
    if not len(e):
        return 0.0
    x1, y1, x2, y2 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    d2x, d2y = x2 - x1, y2 - y1
    total = 0.0
    for path in lines:
        p = np.asarray(path, dtype=np.float64)
        for s in range(len(p) - 1):
            px, py = p[s]
            dx, dy = p[s + 1, 0] - px, p[s + 1, 1] - py
            # sqrt(dx*dx + dy*dy), NOT hypot: same operation order as
            # an ANSI-SQL twin (SQRT(dx*dx + dy*dy)), so lengths agree
            # bit-for-bit across engines
            seg_len = float(np.sqrt(dx * dx + dy * dy))
            if seg_len == 0.0:
                continue
            den = dx * d2y - dy * d2x
            wx, wy = x1 - px, y1 - py
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                t = (wx * d2y - wy * d2x) / den
                u = (wx * dy - wy * dx) / den
            gen = (den != 0.0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
            cuts = [np.array([0.0, 1.0]), t[gen]]
            # collinear edges: project both endpoints onto the segment
            col = (den == 0.0) & (wx * dy - wy * dx == 0.0)
            if col.any():
                ll = dx * dx + dy * dy
                for j in np.flatnonzero(col):
                    for ex, ey in ((x1[j], y1[j]), (x2[j], y2[j])):
                        tt = ((ex - px) * dx + (ey - py) * dy) / ll
                        if 0.0 <= tt <= 1.0:
                            cuts.append(np.array([tt]))
            ts = np.unique(np.concatenate(cuts))
            tm = (ts[:-1] + ts[1:]) / 2.0
            mx, my = px + tm * dx, py + tm * dy
            inside = contains_points(geom, mx, my, edges=e)
            # on-boundary (closed-region semantics), tolerance-scaled
            cr = (
                d2x[None, :] * (my[:, None] - y1[None, :])
                - d2y[None, :] * (mx[:, None] - x1[None, :])
            )
            scale = 1e-9 * (
                np.abs(d2x[None, :]) + np.abs(d2y[None, :])
            ) * (1.0 + np.abs(mx[:, None]) + np.abs(my[:, None]))
            on = (
                (np.abs(cr) <= scale)
                & (mx[:, None] >= np.minimum(x1, x2)[None, :] - 1e-12)
                & (mx[:, None] <= np.maximum(x1, x2)[None, :] + 1e-12)
                & (my[:, None] >= np.minimum(y1, y2)[None, :] - 1e-12)
                & (my[:, None] <= np.maximum(y1, y2)[None, :] + 1e-12)
            ).any(axis=1)
            keep = inside | on
            if keep.any():
                total += seg_len * float((ts[1:] - ts[:-1])[keep].sum())
    return total


def line_edges(lines: Lines) -> np.ndarray:
    """All path segments as an (E, 4) array of (x1, y1, x2, y2)."""
    segs = []
    for path in lines:
        p = np.asarray(path, dtype=np.float64)
        if len(p) >= 2:
            segs.append(np.hstack([p[:-1], p[1:]]))
    if not segs:
        return np.zeros((0, 4), dtype=np.float64)
    return np.vstack(segs)
