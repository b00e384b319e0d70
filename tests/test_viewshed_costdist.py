"""Viewshed + cost-distance vs INDEPENDENT single-process oracles.

The oracles here share no code with the engine: the viewshed check is a
fully-vectorized numpy re-derivation of the R3/DDA definition over the
assembled world array, and the cost-distance check is a whole-world
Dijkstra (no tiling, no exchange) — so a bug in the engine's halo / wave
machinery cannot cancel out."""

from __future__ import annotations

import heapq

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_raster_analysis_lambda_spark.functions import grid as G
from gfw_raster_analysis_lambda_spark.operators import costdist, viewshed
from gfw_raster_analysis_lambda_spark.sources import fixtures

X0, Y0, NX, NY, TILE = (
    fixtures.X0, fixtures.Y0, fixtures.NX, fixtures.NY, fixtures.TILE,
)
GX0, GY0 = X0 * TILE, Y0 * TILE  # absolute global-pixel origin of the world


def _world(layer: str) -> np.ndarray:
    rows = []
    for y in range(Y0, Y0 + NY):
        rows.append(np.hstack([
            fixtures.tile_array(layer, x, y) for x in range(X0, X0 + NX)
        ]))
    return np.vstack(rows).astype(np.int64)


def _tiles(spark, layer: str):
    from gfw_raster_analysis_lambda_spark.sources.images import with_derived_keys
    img = with_derived_keys(
        spark.createDataFrame(
            fixtures.generate_images_rows(layers=[layer]), fixtures.IMAGES_SCHEMA
        )
    )
    return img.filter(F.col("layer") == layer)


def _viewshed_oracle(dem: np.ndarray, ox: int, oy: int, tower: int, radius: int):
    """(visible, in_radius) boolean planes, world-relative coords."""
    h, w = dem.shape
    z_o = int(dem[oy, ox]) + tower
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    adx, ady = np.abs(jj - ox), np.abs(ii - oy)
    n = np.maximum(adx, ady)
    in_r = (adx <= radius) & (ady <= radius)
    kmax = int(n[in_r].max()) if in_r.any() else 0
    visible = np.ones((h, w), dtype=bool)
    k = np.arange(1, max(kmax, 2))[None, :]  # (1, K)
    tx, ty = jj[in_r & (n >= 2)], ii[in_r & (n >= 2)]
    nn = n[ty, tx][:, None].astype(np.int64)
    sgx = np.sign(tx - ox)[:, None]
    sgy = np.sign(ty - oy)[:, None]
    sx = ox + sgx * ((2 * k * adx[ty, tx][:, None] + nn) // (2 * nn))
    sy = oy + sgy * ((2 * k * ady[ty, tx][:, None] + nn) // (2 * nn))
    valid = k < nn
    # clamp for the gather; invalid lanes are masked out of the verdict
    zk = dem[np.clip(sy, 0, h - 1), np.clip(sx, 0, w - 1)]
    zt = dem[ty, tx][:, None]
    blocked = ((zk - z_o) * nn > (zt - z_o) * k) & valid
    visible[ty, tx] = ~blocked.any(axis=1)
    return visible, in_r


def test_viewshed_matches_bruteforce(spark):
    # ttc_percent, not photo: the DEM must be LOSSLESSLY stored (png) or
    # the decoded surface diverges from the closed-form twin (photo is
    # the deliberately-lossy jpeg layer)
    dem = _world("ttc_percent")
    ox_rel, oy_rel, tower, radius = 96, 96, 400, 80
    vis, in_r = _viewshed_oracle(dem, ox_rel, oy_rel, tower, radius)

    got = viewshed.viewshed_zonal(
        _tiles(spark, "ttc_percent"), (GX0 + ox_rel, GY0 + oy_rel), tower, radius
    ).collect()
    got_map = {r["cell_id"]: (r["n_px"], r["n_visible"], r["vis_sum"]) for r in got}

    jj, ii = np.meshgrid(np.arange(dem.shape[1]), np.arange(dem.shape[0]))
    exp_map = {}
    for ty in range(Y0, Y0 + NY):
        for tx in range(X0, X0 + NX):
            sl = (slice((ty - Y0) * TILE, (ty - Y0 + 1) * TILE),
                  slice((tx - X0) * TILE, (tx - X0 + 1) * TILE))
            m = in_r[sl]
            if not m.any():
                continue
            v = vis[sl] & m
            exp_map[int(G.cell_from_xy(fixtures.GRID, tx, ty))] = (
                int(m.sum()), int(v.sum()), int(dem[sl][v].sum()),
            )
    assert got_map == exp_map
    # sanity: the surface actually occludes something
    assert any(nv < np_ for np_, nv, _ in exp_map.values())


def test_viewshed_near_field_and_observer_missing(spark):
    tiles = _tiles(spark, "ttc_percent")
    with pytest.raises(ValueError):
        viewshed.viewshed_zonal(tiles, (0, 0), 10, 50)


def _dijkstra_oracle(cost: np.ndarray, seeds, budget: int) -> np.ndarray:
    h, w = cost.shape
    dist = np.full((h, w), -1, dtype=np.int64)
    heap = []
    for sx, sy in seeds:
        dist[sy, sx] = 0
        heap.append((0, sy * w + sx))
    heapq.heapify(heap)
    best = {f: 0 for _, f in heap}
    while heap:
        d, f = heapq.heappop(heap)
        if d > best.get(f, 1 << 62):
            continue
        i, j = divmod(f, w)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                ni, nj = i + dy, j + dx
                if 0 <= ni < h and 0 <= nj < w:
                    nd = d + int(cost[ni, nj])
                    nf = ni * w + nj
                    if nd <= budget and nd < best.get(nf, 1 << 62):
                        best[nf] = nd
                        dist[ni, nj] = nd
                        heapq.heappush(heap, (nd, nf))
    return dist


def test_cost_distance_matches_dijkstra(spark):
    raw = _world("tcd_threshold")
    cost = raw + 1  # engine applies cost_offset=1
    seeds_rel = [(40, 40), (200, 130)]
    budget = 90
    exp_dist = _dijkstra_oracle(cost, seeds_rel, budget)

    got = costdist.cost_distance_zonal(
        _tiles(spark, "tcd_threshold"),
        [(GX0 + sx, GY0 + sy) for sx, sy in seeds_rel],
        budget,
        cost_offset=1,
    ).collect()
    got_map = {r["cell_id"]: (r["n_reached"], r["dist_sum"], r["dist_max"])
               for r in got}

    exp_map = {}
    for ty in range(Y0, Y0 + NY):
        for tx in range(X0, X0 + NX):
            sl = exp_dist[(ty - Y0) * TILE:(ty - Y0 + 1) * TILE,
                          (tx - X0) * TILE:(tx - X0 + 1) * TILE]
            hit = sl[sl >= 0]
            if hit.size == 0:
                continue
            exp_map[int(G.cell_from_xy(fixtures.GRID, tx, ty))] = (
                int(hit.size), int(hit.sum()), int(hit.max()),
            )
    assert got_map == exp_map
    # the wave must actually cross tile boundaries for this to test anything
    assert len(exp_map) >= 4


def test_cost_distance_rejects_zero_cost(spark):
    with pytest.raises(Exception):
        costdist.cost_distance_zonal(
            _tiles(spark, "tcd_threshold"), [(GX0 + 40, GY0 + 40)], 30,
            cost_offset=0,
        ).collect()


def test_cost_corridor_matches_composed_dijkstra(spark):
    cost = _world("tcd_threshold") + 1
    A, B, budget, slack = [(40, 40)], [(90, 65)], 160, 8
    da = _dijkstra_oracle(cost, A, budget)
    db = _dijkstra_oracle(cost, B, budget)
    INF = 1 << 60
    joint = (da >= 0) & (db >= 0)
    plane = np.where(joint, da + db - cost, INF)
    best = int(plane.min())
    assert best < INF
    cut = best + slack

    got = costdist.cost_corridor_zonal(
        _tiles(spark, "tcd_threshold"),
        [(GX0 + x, GY0 + y) for x, y in A],
        [(GX0 + x, GY0 + y) for x, y in B],
        budget, slack=slack, cost_offset=1,
    ).collect()
    got_map = {r["cell_id"]: (r["n_scored"], r["n_corridor"], r["slack_min"])
               for r in got}

    exp_map = {}
    for ty in range(Y0, Y0 + NY):
        for tx in range(X0, X0 + NX):
            sl = plane[(ty - Y0) * TILE:(ty - Y0 + 1) * TILE,
                       (tx - X0) * TILE:(tx - X0 + 1) * TILE]
            sc = sl < INF
            if not sc.any():
                continue
            exp_map[int(G.cell_from_xy(fixtures.GRID, tx, ty))] = (
                int(sc.sum()), int((sl <= cut).sum()), int(sl.min()) - best,
            )
    assert got_map == exp_map
    # an optimal path must actually cross a tile boundary
    assert len(exp_map) >= 2 and any(v[2] == 0 for v in exp_map.values())


def test_cost_corridor_disjoint_discs_empty(spark):
    out = costdist.cost_corridor_zonal(
        _tiles(spark, "tcd_threshold"),
        [(GX0 + 5, GY0 + 5)], [(GX0 + 250, GY0 + 250)],
        budget=40, cost_offset=1,
    ).collect()
    assert out == []


def _drop_tile(tiles, tx, ty):
    cell = int(G.cell_from_xy(fixtures.GRID, tx, ty))
    return tiles.filter(F.col("cell_id") != cell)


def test_viewshed_missing_tile_never_blocks(spark):
    # drop the tile north-east of the observer: its pixels vanish from
    # the targets AND any ray sample landing there must never block
    dem = _world("ttc_percent").astype(np.int64)
    hole = (X0 + 2, Y0 + 1)
    ox_rel, oy_rel, tower, radius = 96, 96, 400, 80
    z_o = int(dem[oy_rel, ox_rel]) + tower

    hole_sl = (slice((hole[1] - Y0) * TILE, (hole[1] - Y0 + 1) * TILE),
               slice((hole[0] - X0) * TILE, (hole[0] - X0 + 1) * TILE))
    dem_h = dem.copy()
    dem_h[hole_sl] = -(1 << 40)  # sentinel: never blocks in the oracle
    vis, in_r = _viewshed_oracle(dem_h, ox_rel, oy_rel, tower, radius)

    got = viewshed.viewshed_zonal(
        _drop_tile(_tiles(spark, "ttc_percent"), *hole),
        (GX0 + ox_rel, GY0 + oy_rel), tower, radius,
    ).collect()
    got_map = {r["cell_id"]: (r["n_px"], r["n_visible"], r["vis_sum"]) for r in got}

    exp_map = {}
    for ty in range(Y0, Y0 + NY):
        for tx in range(X0, X0 + NX):
            if (tx, ty) == hole:
                continue  # no tile -> no targets
            sl = (slice((ty - Y0) * TILE, (ty - Y0 + 1) * TILE),
                  slice((tx - X0) * TILE, (tx - X0 + 1) * TILE))
            m = in_r[sl]
            if not m.any():
                continue
            v = vis[sl] & m
            exp_map[int(G.cell_from_xy(fixtures.GRID, tx, ty))] = (
                int(m.sum()), int(v.sum()), int(dem[sl][v].sum()),
            )
    assert got_map == exp_map
    # removing an occluder must only ever ADD visibility (outside the
    # hole itself, whose sentinel targets are meaningless)
    vis_full, _ = _viewshed_oracle(dem, ox_rel, oy_rel, tower, radius)
    outside = in_r.copy()
    outside[hole_sl] = False
    assert (vis & outside).sum() >= (vis_full & outside).sum()
    assert (vis_full[outside] & ~vis[outside]).sum() == 0


def test_cost_distance_missing_tile_impassable(spark):
    # hole between the seed and the far side: the wave must route AROUND
    cost = _world("tcd_threshold") + 1
    hole = (X0 + 1, Y0 + 0)
    hole_sl = (slice(0, TILE), slice(TILE, 2 * TILE))
    cost_h = cost.astype(np.int64).copy()
    cost_h[hole_sl] = 1 << 50  # impassable in the oracle
    seeds_rel = [(40, 20)]
    budget = 400
    exp_dist = _dijkstra_oracle(cost_h, seeds_rel, budget)
    exp_dist[hole_sl] = -1  # no tile -> no output pixels

    got = costdist.cost_distance_zonal(
        _drop_tile(_tiles(spark, "tcd_threshold"), *hole),
        [(GX0 + sx, GY0 + sy) for sx, sy in seeds_rel],
        budget, cost_offset=1,
    ).collect()
    got_map = {r["cell_id"]: (r["n_reached"], r["dist_sum"], r["dist_max"])
               for r in got}

    exp_map = {}
    for ty in range(Y0, Y0 + NY):
        for tx in range(X0, X0 + NX):
            sl = exp_dist[(ty - Y0) * TILE:(ty - Y0 + 1) * TILE,
                          (tx - X0) * TILE:(tx - X0 + 1) * TILE]
            hit = sl[sl >= 0]
            if hit.size == 0:
                continue
            exp_map[int(G.cell_from_xy(fixtures.GRID, tx, ty))] = (
                int(hit.size), int(hit.sum()), int(hit.max()),
            )
    assert got_map == exp_map
    # blocking a region can never SHORTEN any path, and must genuinely
    # lengthen (or cut off) at least one
    free = _dijkstra_oracle(cost.astype(np.int64), seeds_rel, budget)
    both = (exp_dist >= 0) & (free >= 0)
    assert (exp_dist[both] >= free[both]).all()
    lost = (free >= 0) & (exp_dist < 0)
    lost[hole_sl] = False
    assert (exp_dist[both] > free[both]).any() or lost.any()


def test_openness_matches_bruteforce(spark):
    dem = _world("ttc_percent")
    L, tn, td = 8, 1, 2
    H, W = dem.shape
    open_dirs = np.zeros((H, W), dtype=np.int64)
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                   (1, 1), (1, -1), (-1, 1), (-1, -1)):
        diag = dx and dy
        closed = np.zeros((H, W), dtype=bool)
        for k in range(1, L + 1):
            ys, xs = np.arange(H) + k * dy, np.arange(W) + k * dx
            ok = np.outer((ys >= 0) & (ys < H), (xs >= 0) & (xs < W))
            zs = dem[np.clip(ys, 0, H - 1)[:, None], np.clip(xs, 0, W - 1)[None, :]]
            dz = zs - dem
            if diag:
                hit = ok & (dz > 0) & (dz * dz * td * td > 2 * tn * tn * k * k)
            else:
                hit = ok & (dz * td > tn * k)
            closed |= hit
        open_dirs += ~closed

    got = viewshed.openness_zonal(
        _tiles(spark, "ttc_percent"), radius=L, slope_num=tn, slope_den=td
    ).collect()
    got_map = {r["cell_id"]: (r["n_px"], r["open_sum"], r["n_fully_open"],
                              r["n_closed"]) for r in got}

    exp_map = {}
    for ty in range(Y0, Y0 + NY):
        for tx in range(X0, X0 + NX):
            sl = open_dirs[(ty - Y0) * TILE:(ty - Y0 + 1) * TILE,
                           (tx - X0) * TILE:(tx - X0 + 1) * TILE]
            exp_map[int(G.cell_from_xy(fixtures.GRID, tx, ty))] = (
                TILE * TILE, int(sl.sum()), int((sl == 8).sum()),
                int((sl == 0).sum()),
            )
    assert got_map == exp_map
    # the threshold must produce a non-trivial mix
    total = sum(v[1] for v in exp_map.values())
    assert 0 < total < 8 * TILE * TILE * NX * NY


def test_openness_rejects_bad_params(spark):
    tiles = _tiles(spark, "ttc_percent")
    with pytest.raises(ValueError):
        viewshed.openness_zonal(tiles, radius=0)
    with pytest.raises(ValueError):
        viewshed.openness_zonal(tiles, radius=99)
    with pytest.raises(ValueError):
        viewshed.openness_zonal(tiles, slope_den=0)


def test_cost_distance_rejects_offcorpus_seeds_and_viewshed_radius(spark):
    tiles = _tiles(spark, "tcd_threshold")
    with pytest.raises(ValueError):
        costdist.cost_distance_zonal(tiles, [(0, 0)], 30, cost_offset=1)
    with pytest.raises(ValueError):
        viewshed.viewshed_zonal(
            _tiles(spark, "ttc_percent"), (GX0 + 96, GY0 + 96), 10, 0
        )
    with pytest.raises(ValueError):
        viewshed.viewshed_zonal(
            _tiles(spark, "ttc_percent"), (GX0 + 96, GY0 + 96), 10, 5000
        )


def test_pad_dial_matches_heap_kernel_on_budget_region():
    """The Dial bucket kernel must compute the identical label function
    as the reference heap kernel on every pixel with dist <= budget, and
    leave _INF beyond it — across wall densities, cost ranges, seed
    patterns (interior points, edge strips, pre-existing state), and the
    fixture's own modular cost surface."""
    rng = np.random.default_rng(42)
    INF = costdist._INF

    def modular(ph, pw):
        jj, ii = np.meshgrid(np.arange(pw), np.arange(ph))
        return ((ii * 7 + jj * 11) % 8 + 1).astype(np.int64)

    cases = []
    for trial in range(6):
        ph, pw = int(rng.integers(40, 90)), int(rng.integers(40, 90))
        cost = rng.integers(1, int(rng.choice([3, 10, 60])),
                            size=(ph, pw)).astype(np.int64)
        cost[rng.random((ph, pw)) < rng.choice([0.0, 0.03, 0.1])] = INF
        cases.append((cost, int(rng.integers(30, 400))))
    cases.append((modular(72, 72), 300))

    for cost, budget in cases:
        ph, pw = cost.shape
        dist0 = np.full((ph, pw), INF, dtype=np.int64)
        seeds = []
        for _ in range(4):
            i, j = int(rng.integers(0, ph)), int(rng.integers(0, pw))
            if cost[i, j] < INF:
                dist0[i, j] = int(rng.integers(0, budget // 2 + 1))
                seeds.append(i * pw + j)
        if not seeds:
            continue
        # pre-existing state that blocks but does not propagate
        pi, pj = ph // 3, pw // 3
        dist0[pi:pi + 8, pj:pj + 8] = np.minimum(
            dist0[pi:pi + 8, pj:pj + 8],
            rng.integers(budget // 2, budget + 50, size=(8, 8)),
        )
        d_heap = dist0.copy()
        costdist._pad_dijkstra(cost, d_heap, seeds)
        d_dial = dist0.copy()
        costdist._pad_dial(cost, d_dial, seeds, budget)
        # dial accepts exactly the <= budget labels; everywhere else it
        # leaves the initial state (pre-existing label or _INF) untouched
        capped = np.where(d_heap <= budget, d_heap, dist0)
        assert np.array_equal(d_dial, capped), (
            f"dial != capped heap on {cost.shape} budget={budget}"
        )
