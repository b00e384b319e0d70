"""Seeded randomized fuzz for the hand-rolled vector-overlay predicate
(functions/geometry.py interiors_intersect) against an INDEPENDENT exact
oracle (tests/geom_oracle.py: O(n^2) segment splitting + even-odd
membership in rational arithmetic — no shared code with the engine).

The reference leans on shapely for exactly this predicate (reference
geometry.py:11-40); the engine re-derives it, so this fuzz is the
deepest-coverage gate for the highest-residual-risk code in the repo:
rotated/concave star polygons, holes, multipolygons, near-touching
translates, and a lattice-degenerate family that forces shared vertices,
collinear edge overlap, vertex-on-edge contact, and zero-interior rings.
"""

import numpy as np
import pytest

from geom_oracle import oracle_interiors_intersect as oracle

from gfw_raster_analysis_lambda_spark.functions.geometry import (
    interiors_intersect,
    normalize,
)


def _star(rng, n, cx, cy, rmin, rmax, rot):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n)) + rot
    rad = rng.uniform(rmin, rmax, n)
    return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], 1)


def _gen_pair(rng):
    kind = rng.integers(0, 5)
    n1, n2 = int(rng.integers(3, 12)), int(rng.integers(3, 12))
    a = _star(rng, n1, 0, 0, 0.3, 1.0, rng.uniform(0, 6.3))
    if kind == 0:  # generic rotated/concave overlap-ish
        b = _star(rng, n2, rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                  0.3, 1.0, rng.uniform(0, 6.3))
        return [[a]], [[b]]
    if kind == 1:  # holed shell vs small island (inside hole / straddling)
        hole = _star(rng, 6, 0, 0, 0.1, 0.25, rng.uniform(0, 6.3))
        b = _star(rng, n2, rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2),
                  0.02, 0.2, rng.uniform(0, 6.3))
        return [[a, hole]], [[b]]
    if kind == 2:  # multipolygon vs single
        a2 = _star(rng, 5, 3.0, 0, 0.3, 0.8, rng.uniform(0, 6.3))
        b = _star(rng, n2, rng.uniform(0, 3.5), rng.uniform(-1, 1),
                  0.3, 1.0, rng.uniform(0, 6.3))
        return [[a], [a2]], [[b]]
    if kind == 3:  # near-touching translate (slivers both ways)
        b = _star(rng, n2, 0, 0, 0.3, 1.0, rng.uniform(0, 6.3))
        dx = a[:, 0].max() - b[:, 0].min() + rng.uniform(-0.05, 0.05)
        b = b + [dx, rng.uniform(-0.3, 0.3)]
        return [[a]], [[b]]
    # lattice-degenerate: quarter-grid coords force shared vertices,
    # collinear overlaps, self-intersections, zero-interior rings —
    # dyadic coordinates keep the engine's float arithmetic exact, so
    # the comparison against the rational oracle is deterministic
    def lat_poly():
        return rng.integers(0, 5, (int(rng.integers(3, 8)), 2)).astype(float) * 0.25

    return [[lat_poly()]], [[lat_poly()]]


@pytest.mark.parametrize("seed", [42, 2026])
def test_interiors_intersect_fuzz_vs_exact_oracle(seed):
    rng = np.random.default_rng(seed)
    tested = trues = 0
    for _ in range(300):
        g1, g2 = map(normalize, _gen_pair(rng))
        if not g1 or not g2:
            continue
        tested += 1
        exp = oracle(g1, g2)
        trues += exp
        assert interiors_intersect(g1, g2) == exp, (
            f"seed={seed} pair g1={[r.tolist() for p in g1 for r in p]} "
            f"g2={[r.tolist() for p in g2 for r in p]} expected {exp}"
        )
    # the families must actually exercise both verdicts, heavily
    assert tested >= 280 and 50 < trues < tested - 50


def _box(x0, y0, x1, y1):
    return [[np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)]]


def test_interiors_intersect_degenerate_contact_cases():
    """Deterministic pins for the contact classes the fuzz families hit
    randomly: every answer cross-checked against the exact oracle."""
    A = _box(0, 0, 2, 2)
    hole_geom = [[np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float),
                  np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]], float)]]
    tri_up = [[np.array([[0, 0], [2, 0], [1, 2]], float)]]
    tri_shared_vertex = [[np.array([[0, 0], [2, 1], [1, -2]], float)]]
    cases = [
        ("shared-edge overlap", A, _box(0, 1, 2, 3), True),
        ("identical", A, _box(0, 0, 2, 2), True),
        ("edge-adjacent", A, _box(2, 0, 4, 2), False),
        ("corner-touch", A, _box(2, 2, 4, 4), False),
        ("contained sharing edge", A, _box(0, 0.5, 1, 1.5), True),
        ("island fills hole exactly", hole_geom, _box(0.5, 0.5, 1.5, 1.5), False),
        ("island inside hole", hole_geom, _box(0.6, 0.6, 1.4, 1.4), False),
        ("straddles hole wall", hole_geom, _box(0.6, 0.6, 1.8, 1.4), True),
        ("shared-vertex crossing", tri_up, tri_shared_vertex, True),
        ("vertex-on-edge touch", tri_up, [[np.array([[1, 2], [0, 3], [2, 3]], float)]], False),
    ]
    for name, g1, g2, exp in cases:
        assert oracle(g1, g2) == exp, f"oracle disagrees on {name}"
        assert interiors_intersect(g1, g2) == exp, name
        assert interiors_intersect(g2, g1) == exp, f"{name} (swapped)"


def test_normalize_drops_zero_interior_rings():
    """A fully collinear ring has no even-odd interior (it rasterizes to
    nothing) and must not survive repair — before this, its edges could
    register proper crossings and fake an overlay hit."""
    collinear = [[np.array([[0.25, 0.25], [0.5, 0.25], [1.0, 0.25]], float)]]
    assert normalize(collinear) == []
    # but a self-intersecting bowtie (shoelace area 0, NONZERO even-odd
    # interior) must survive — collinearity, not signed area, is the test
    bowtie = [[np.array([[0, 0], [1, 1], [1, 0], [0, 1]], float)]]
    kept = normalize(bowtie)
    assert kept and len(kept[0]) == 1
    assert interiors_intersect(kept, _box(0.05, 0.4, 0.2, 0.6))

from geom_oracle import (
    oracle_intersection_area,
    oracle_region_area,
)

from gfw_raster_analysis_lambda_spark.functions.geometry import (
    intersection_area,
    region_area,
)


@pytest.mark.parametrize("seed", [7, 1337])
def test_area_fuzz_vs_exact_oracle(seed):
    """The measured overlay (region_area / intersection_area) against the
    exact rational slab areas, over the same five random families as the
    predicate fuzz. Float slab summation vs exact rationals: relative
    1e-9 everywhere, and inter <= min(a1, a2) + eps always."""
    rng = np.random.default_rng(seed)
    tested = nonzero = 0
    for _ in range(250):
        g1, g2 = map(normalize, _gen_pair(rng))
        if not g1 or not g2:
            continue
        tested += 1
        a1, a2 = region_area(g1), region_area(g2)
        for g, a in ((g1, a1), (g2, a2)):
            exact = float(oracle_region_area(g))
            assert abs(a - exact) <= 1e-9 * (1.0 + exact), (
                f"seed={seed} region_area {a} vs exact {exact}"
            )
        inter = intersection_area(g1, g2)
        exact_i = float(oracle_intersection_area(g1, g2))
        assert abs(inter - exact_i) <= 1e-9 * (1.0 + exact_i), (
            f"seed={seed} intersection_area {inter} vs exact {exact_i} "
            f"g1={[r.tolist() for p in g1 for r in p]} "
            f"g2={[r.tolist() for p in g2 for r in p]}"
        )
        assert inter <= min(a1, a2) + 1e-9
        nonzero += exact_i > 0
    assert tested >= 230 and 40 < nonzero < tested - 40


def test_area_deterministic_pins():
    """Closed-form pins: boxes, containment, hole subtraction, bowtie
    even-odd measure, boundary-touch zero."""
    A = _box(0, 0, 2, 2)
    assert region_area(A) == 4.0
    assert intersection_area(A, _box(1, 1, 3, 4)) == 1.0
    assert intersection_area(A, _box(2, 0, 4, 2)) == 0.0  # shared wall
    assert intersection_area(A, _box(0.5, 0.5, 1.5, 1.5)) == 1.0  # contained
    holed = [[np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float),
              np.array([[1, 1], [3, 1], [3, 3], [1, 3]], float)]]
    assert region_area(holed) == 12.0
    assert intersection_area(holed, _box(1, 1, 3, 3)) == 0.0  # box == hole
    assert intersection_area(holed, _box(0, 0, 2, 2)) == 3.0  # quarter minus hole quarter
    bowtie = [[np.array([[0, 0], [2, 2], [2, 0], [0, 2]], float)]]
    assert region_area(bowtie) == 2.0  # even-odd, not shoelace 0
    assert intersection_area(bowtie, _box(0, 0, 2, 2)) == 2.0


from geom_oracle import oracle_line_length_in

from gfw_raster_analysis_lambda_spark.functions.geometry import (
    line_length_in_region,
    lines_length,
)


def _gen_lines(rng):
    """Random polyline families: free-floating walks, lattice polylines
    (shared vertices / edge-riding / collinear overlap against the
    lattice polygon family), and long transects."""
    kind = rng.integers(0, 3)
    if kind == 0:  # random walk
        n = int(rng.integers(2, 8))
        start = rng.uniform(-1.5, 1.5, 2)
        steps = rng.uniform(-0.8, 0.8, (n - 1, 2))
        return [np.vstack([start, start + np.cumsum(steps, axis=0)])]
    if kind == 1:  # quarter-lattice polyline (degenerate contact family)
        n = int(rng.integers(2, 7))
        return [rng.integers(0, 5, (n, 2)).astype(float) * 0.25]
    # long transect through the scene
    ang = rng.uniform(0, 2 * np.pi)
    c = rng.uniform(-0.5, 0.5, 2)
    d = np.array([np.cos(ang), np.sin(ang)])
    return [np.vstack([c - 3 * d, c + 3 * d])]


@pytest.mark.parametrize("seed", [11, 911])
def test_line_length_in_region_fuzz_vs_exact_oracle(seed):
    rng = np.random.default_rng(seed)
    tested = nonzero = 0
    for _ in range(250):
        g1, _ = _gen_pair(rng)
        g1 = normalize(g1)
        if not g1:
            continue
        lines = _gen_lines(rng)
        tested += 1
        got = line_length_in_region(lines, g1)
        exp = oracle_line_length_in(lines, g1)
        tol = 1e-9 * (1.0 + lines_length(lines))
        assert abs(got - exp) <= tol, (
            f"seed={seed} got {got} exp {exp} lines="
            f"{[p.tolist() for p in lines]} "
            f"geom={[r.tolist() for p in g1 for r in p]}"
        )
        assert got <= lines_length(lines) + 1e-9
        nonzero += exp > 0
    assert tested >= 240 and 40 < nonzero < tested - 20


def test_line_length_deterministic_pins():
    A = _box(0, 0, 2, 2)
    diag = [np.array([[-1.0, -1.0], [3.0, 3.0]])]
    assert line_length_in_region(diag, A) == pytest.approx(2 * np.sqrt(2), rel=1e-12)
    # boundary-riding counts (closed region), hole interior does not
    assert line_length_in_region([np.array([[0.0, 0.0], [0.0, 2.0]])], A) == pytest.approx(2.0)
    holed = [[np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float),
              np.array([[1, 1], [3, 1], [3, 3], [1, 3]], float)]]
    assert line_length_in_region([np.array([[0.0, 2.0], [4.0, 2.0]])], holed) == pytest.approx(2.0)
    # riding the HOLE wall: boundary of the region, still counts
    assert line_length_in_region([np.array([[1.0, 1.0], [3.0, 1.0]])], holed) == pytest.approx(2.0)
    assert oracle_line_length_in([np.array([[1.0, 1.0], [3.0, 1.0]])], holed) == pytest.approx(2.0)
    # fully outside
    assert line_length_in_region([np.array([[5.0, 5.0], [6.0, 6.0]])], A) == 0.0
