"""Independent exact oracle for the interiors-intersect predicate.

Written FOR THE TESTS and sharing no code path with the engine
(functions/geometry.py): the engine decides via vectorized float64
proper-crossing + single-vertex even-odd probes; this oracle decides via
exact rational arithmetic (``fractions.Fraction`` on the float values,
which are themselves rationals) over a provably complete candidate-point
procedure:

1. **Split-midpoint test** — split every edge of P at every intersection
   with every edge of Q (including collinear-overlap endpoints); between
   consecutive split points the subsegment lies entirely inside, on, or
   outside Q, so its midpoint classifies it. A boundary point of P
   strictly inside Q implies the interiors overlap (every neighbourhood
   of a non-degenerate boundary point meets int(P)). Symmetric in Q.
2. **Slab representative points** — if no boundary of one passes through
   the other's interior, any shared interior component must be a whole
   component of int(P) contained in int(Q) (or vice versa). Every
   component of a polygonal interior spans at least one horizontal slab
   between consecutive distinct vertex y-levels, so scanline midpoints of
   the even-odd in-intervals on every slab mid-line hit every component.

Membership is even-odd over the union of all rings of all polygons
(matching the engine's documented semantics), with exact on-boundary
detection — no half-open tie-break conventions leak into the verdict.
"""

from fractions import Fraction

__all__ = ["oracle_interiors_intersect"]


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


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_segment(p, a, b):
    """Exact: p on closed segment ab (a != b)."""
    if _cross(a, b, p) != 0:
        return False
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def _classify(edges, p):
    """'in' / 'on' / 'out' of the even-odd region, exactly."""
    x, y = p
    cnt = 0
    for a, b in edges:
        if _on_segment(p, a, b):
            return "on"
        (x1, y1), (x2, y2) = a, b
        if y1 == y2:
            continue  # horizontal: never crossed by the half-open rule
        if (y1 <= y < y2) or (y2 <= y < y1):
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            # xi == x would mean p on the edge — already returned 'on'
            if xi > x:
                cnt += 1
    return "in" if cnt % 2 else "out"


def _split_params(e, f):
    """Parameters t in [0,1] along edge e where it meets edge f
    (proper, endpoint, and collinear-overlap intersections)."""
    (p, q), (r, s) = e, f
    d1 = (q[0] - p[0], q[1] - p[1])
    d2 = (s[0] - r[0], s[1] - r[1])
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    w = (r[0] - p[0], r[1] - p[1])
    ts = []
    if denom != 0:
        t = (w[0] * d2[1] - w[1] * d2[0]) / denom
        u = (w[0] * d1[1] - w[1] * d1[0]) / denom
        if 0 <= t <= 1 and 0 <= u <= 1:
            ts.append(t)
    elif w[0] * d1[1] - w[1] * d1[0] == 0:
        # collinear: project f's endpoints onto e's parameterization
        den = d1[0] * d1[0] + d1[1] * d1[1]
        for pt in (r, s):
            t = ((pt[0] - p[0]) * d1[0] + (pt[1] - p[1]) * d1[1]) / den
            if 0 <= t <= 1:
                ts.append(t)
    return ts


def _boundary_probe(edges_a, edges_b):
    """True iff some split-subsegment midpoint of A's boundary is
    strictly inside B's even-odd region."""
    for e in edges_a:
        cuts = {Fraction(0), Fraction(1)}
        for f in edges_b:
            cuts.update(_split_params(e, f))
        order = sorted(cuts)
        (px, py), (qx, qy) = e
        for t0, t1 in zip(order, order[1:]):
            tm = (t0 + t1) / 2
            m = (px + tm * (qx - px), py + tm * (qy - py))
            if _classify(edges_b, m) == "in":
                return True
    return False


def _rep_points(edges):
    """At least one strictly-interior point of every component of the
    even-odd region: scanline the mid-line of every vertex-y slab."""
    ys = sorted({e[0][1] for e in edges} | {e[1][1] for e in edges})
    pts = []
    for y0, y1 in zip(ys, ys[1:]):
        ym = (y0 + y1) / 2
        xs = []
        for (x1, v1), (x2, v2) in edges:
            if v1 == v2:
                continue
            if (v1 <= ym < v2) or (v2 <= ym < v1):
                xs.append(x1 + (ym - v1) * (x2 - x1) / (v2 - v1))
        xs.sort()
        for xa, xb in zip(xs[0::2], xs[1::2]):
            if xa != xb:
                pts.append(((xa + xb) / 2, ym))
    return pts


def oracle_interiors_intersect(g1, g2) -> bool:
    e1, e2 = _edges(g1), _edges(g2)
    if not e1 or not e2:
        return False
    if _boundary_probe(e1, e2) or _boundary_probe(e2, e1):
        return True
    for p in _rep_points(e1):
        if _classify(e2, p) == "in":
            return True
    for p in _rep_points(e2):
        if _classify(e1, p) == "in":
            return True
    return False
