"""Independent exact oracle for the interiors-intersect predicate.

Written FOR THE TESTS and sharing no code path with the engine
(functions/geometry.py): the engine runs a vectorized float64 slab
scanline with a documented 1e-9 strictness tolerance; this oracle runs
the same PROVABLY sound-and-complete decision rule in EXACT rational
arithmetic (``fractions.Fraction`` on the float values, which are
themselves rationals) with strict-zero interval semantics:

**Slab scanline.** Collect every critical y-level of the combined edge
arrangement — all vertex y's plus all pairwise edge-intersection y's
(self- and cross-intersections; collinear-overlap endpoints are original
vertices, already levels). Between consecutive distinct levels the
arrangement has no vertex, so the even-odd in-intervals of each region
at the slab's exact rational mid-line classify the whole slab.
``int(P) & int(Q)`` is an open polygonal set whose every face has all
its vertices on critical levels, so every face spans at least one full
slab and appears as a STRICT overlap of open in-intervals at that
slab's mid-line; conversely a strict overlap is a positive-length
segment strictly inside both. Sound and complete with no probe-point
degeneracy: a collinear double wall contributes two crossings at the
exact same rational x — a zero-width interval that can never strictly
overlap anything (an earlier boundary-midpoint probe design was
unsound exactly there).
"""

from fractions import Fraction

__all__ = [
    "oracle_interiors_intersect",
    "oracle_intersection_area",
    "oracle_region_area",
]


def _edges(geom):
    """All edges of all rings as Fraction tuples ((x1,y1),(x2,y2))."""
    out = []
    for poly in geom:
        for ring in poly:
            pts = [(Fraction(float(x)), Fraction(float(y))) for x, y in ring]
            n = len(pts)
            for i in range(n):
                a, b = pts[i], pts[(i + 1) % n]
                if a != b:
                    out.append((a, b))
    return out


def _intersection_ys(edges):
    """Exact y's of all pairwise non-parallel segment intersections.
    Parallel/collinear pairs add no levels: a collinear overlap's
    endpoints are original vertices, whose y's are levels already."""
    ys = set()
    n = len(edges)
    for i in range(n):
        (p, q) = edges[i]
        d1 = (q[0] - p[0], q[1] - p[1])
        for j in range(i + 1, n):
            (r, s) = edges[j]
            d2 = (s[0] - r[0], s[1] - r[1])
            den = d1[0] * d2[1] - d1[1] * d2[0]
            if den == 0:
                continue
            w = (r[0] - p[0], r[1] - p[1])
            t = (w[0] * d2[1] - w[1] * d2[0]) / den
            u = (w[0] * d1[1] - w[1] * d1[0]) / den
            if 0 <= t <= 1 and 0 <= u <= 1:
                ys.add(p[1] + t * d1[1])
    return ys


def _in_xs(edges, y):
    """Sorted crossing x's of the even-odd boundary at scanline ``y``
    (exact; ``y`` is never a vertex level, so the count is even and
    consecutive pairs are the open in-intervals)."""
    xs = []
    for (x1, y1), (x2, y2) in edges:
        if y1 == y2:
            continue
        if (y1 <= y < y2) or (y2 <= y < y1):
            xs.append(x1 + (y - y1) * (x2 - x1) / (y2 - y1))
    xs.sort()
    return xs


def oracle_interiors_intersect(g1, g2) -> bool:
    e1, e2 = _edges(g1), _edges(g2)
    if not e1 or not e2:
        return False
    eall = e1 + e2
    levels = {a[1] for a, b in eall} | {b[1] for a, b in eall}
    levels |= _intersection_ys(eall)
    ys = sorted(levels)
    for y0, y1 in zip(ys, ys[1:]):
        ym = (y0 + y1) / 2
        xs1 = _in_xs(e1, ym)
        if not xs1:
            continue
        xs2 = _in_xs(e2, ym)
        if not xs2:
            continue
        i = j = 0
        while i < len(xs1) and j < len(xs2):
            lo = max(xs1[i], xs2[j])
            hi = min(xs1[i + 1], xs2[j + 1])
            if lo < hi:
                return True
            if xs1[i + 1] < xs2[j + 1]:
                i += 2
            else:
                j += 2
    return False

def _overlap_len(xs1, xs2):
    """Exact total length of the intersection of two sorted flat
    interval lists."""
    total = Fraction(0)
    i = j = 0
    while i < len(xs1) and j < len(xs2):
        lo = max(xs1[i], xs2[j])
        hi = min(xs1[i + 1], xs2[j + 1])
        if hi > lo:
            total += hi - lo
        if xs1[i + 1] < xs2[j + 1]:
            i += 2
        else:
            j += 2
    return total


def _slab_area(edge_sets):
    """Exact slab-scanline area: sum over slabs of h x mid-line length
    of the (intersection of the) even-odd region(s). In exact rational
    arithmetic the mid-line of two DISTINCT consecutive levels is never
    itself a level, so every slab classifies cleanly (no skipped-slab
    caveat, unlike the engine's float variant)."""
    eall = [e for es in edge_sets for e in es]
    levels = {a[1] for a, b in eall} | {b[1] for a, b in eall}
    levels |= _intersection_ys(eall)
    ys = sorted(levels)
    area = Fraction(0)
    for y0, y1 in zip(ys, ys[1:]):
        ym = (y0 + y1) / 2
        xs = [_in_xs(es, ym) for es in edge_sets]
        if any(not x for x in xs):
            continue
        if len(edge_sets) == 1:
            length = sum(xs[0][1::2], Fraction(0)) - sum(xs[0][0::2], Fraction(0))
        else:
            length = _overlap_len(xs[0], xs[1])
        area += (y1 - y0) * length
    return area


def oracle_region_area(g) -> Fraction:
    e = _edges(g)
    return _slab_area([e]) if e else Fraction(0)


def oracle_intersection_area(g1, g2) -> Fraction:
    e1, e2 = _edges(g1), _edges(g2)
    if not e1 or not e2:
        return Fraction(0)
    return _slab_area([e1, e2])

def _on_edge(edges, p):
    """Exact: p lies on some closed boundary segment."""
    x, y = p
    for (x1, y1), (x2, y2) in edges:
        if (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) != 0:
            continue
        if min(x1, x2) <= x <= max(x1, x2) and min(y1, y2) <= y <= max(y1, y2):
            return True
    return False


def _in_even_odd(edges, p):
    """Exact even-odd membership by the half-open horizontal-ray rule
    (only ever called on points already known NOT on the boundary, where
    the half-open tie-break cannot matter)."""
    x, y = p
    cnt = 0
    for (x1, y1), (x2, y2) in edges:
        if y1 == y2:
            continue
        if (y1 <= y < y2) or (y2 <= y < y1):
            if x1 + (y - y1) * (x2 - x1) / (y2 - y1) > x:
                cnt += 1
    return cnt % 2 == 1


def oracle_line_length_in(lines, geom) -> float:
    """Exact-parameter line clip: per segment, split at every exact
    rational parameter where it meets a region edge (generic crossings
    and collinear-overlap endpoint projections), classify each piece's
    exact midpoint — ON the boundary or even-odd inside keeps it
    (closed-region semantics) — and sum kept fractions exactly; only
    the final sqrt-based segment length is float."""
    import math

    edges = _edges(geom)
    if not edges or not lines:
        return 0.0
    total = 0.0
    for path in lines:
        pts = [(Fraction(float(x)), Fraction(float(y))) for x, y in path]
        for s in range(len(pts) - 1):
            p, q = pts[s], pts[s + 1]
            d = (q[0] - p[0], q[1] - p[1])
            if d == (0, 0):
                continue
            cuts = {Fraction(0), Fraction(1)}
            ll = d[0] * d[0] + d[1] * d[1]
            for (r, t2) in edges:
                d2 = (t2[0] - r[0], t2[1] - r[1])
                den = d[0] * d2[1] - d[1] * d2[0]
                w = (r[0] - p[0], r[1] - p[1])
                if den != 0:
                    t = (w[0] * d2[1] - w[1] * d2[0]) / den
                    u = (w[0] * d[1] - w[1] * d[0]) / den
                    if 0 <= t <= 1 and 0 <= u <= 1:
                        cuts.add(t)
                elif w[0] * d[1] - w[1] * d[0] == 0:  # collinear
                    for e in (r, t2):
                        tt = ((e[0] - p[0]) * d[0] + (e[1] - p[1]) * d[1]) / ll
                        if 0 <= tt <= 1:
                            cuts.add(tt)
            ts = sorted(cuts)
            kept = Fraction(0)
            for t0, t1 in zip(ts, ts[1:]):
                tm = (t0 + t1) / 2
                m = (p[0] + tm * d[0], p[1] + tm * d[1])
                if _on_edge(edges, m) or _in_even_odd(edges, m):
                    kept += t1 - t0
            if kept:
                total += float(kept) * math.hypot(float(d[0]), float(d[1]))
    return total
