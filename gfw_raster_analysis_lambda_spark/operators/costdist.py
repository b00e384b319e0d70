"""Cost-distance (least-cost accumulation) over the tiled cost surface —
the ``r.cost`` / ArcGIS "Cost Distance" product: the minimum accumulated
cost from any seed pixel to every pixel, capped at a traversal
``budget``. Out of the reference's reach for the same reason as the
focal family (reference raster_analysis/query_executor.py analyzes one
tile at a time; a least-cost path wanders across many).

Semantics (integer-exact): moving onto 8-neighbor pixel ``q`` costs
``cost(q) = dem(q) + cost_offset`` (the offset lets 0-valued rasters be
traversable; effective step cost must be >= 1 or the operator raises).
``dist(seed) = 0``; ``dist(p) = min over paths`` of the summed entering
costs, and only pixels with ``dist <= budget`` are reported. All int64,
so the DuckDB twin — a recursive-CTE Bellman relaxation over the
closed-form fixture surface — hash-matches bit-for-bit.

Scale shape — **halo-widened bulk-synchronous Δ-wave** (Δ-stepping with
Δ = one tile), and the halo width is the whole point:

1. **One-time cost-halo build.** Each tile's cost array is padded with
   the ``halo``-px edge strips of its 8 neighbors via the focal
   family's strip exchange (operators/focal.py `_halo_parts` — encoded
   centers + raw strips, ~1% of naive replication). Built once,
   localCheckpoint-ed; it is the loop's constant left side.
2. **Per-round exact Dijkstra on tile+halo.** A least-cost path that
   weaves up to ``halo`` px into a neighbor and back resolves WITHIN
   the round. A naive 1-px ring exchange needs a round per weave — on
   the fixture corpus that is a ~25-round convergence tail; with an
   8-px halo the same wave settles in a handful of rounds. (The classic
   trade-off: halo width buys rounds with memory — pad overhead is
   (1+2r/T)^2, 13% at r=8 on 64-px tiles, 0.6% on 512-px.)
3. **Halo arrivals, never pixel payloads.** An improved tile emits each
   REACHED halo pixel as ``(owner cell, pixel, dist - cost)`` — the
   entering-arrival form, so the owner re-derives the identical dist —
   O(frontier x halo-perimeter) tiny rows per round, budget-pruned
   before the shuffle. Only tiles that actually improved emit, so the
   wave dies exactly at the fixpoint.
4. **Frontier-only work.** The cogroup joins the pad frame to the
   arrival cells, so settled tiles outside the wavefront ship zero
   bytes in later rounds; state is one ``raw_i64`` distance tile per
   touched cell, lineage-truncated every round (the components-engine
   pattern, operators/components.py:110).

A 100-TB corpus is untouched outside the budget disc: seeds determine
the initial frontier, and the wave only ever expands through tiles it
reaches (partition-pruned by construction, not by filter)."""

from __future__ import annotations

import heapq
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs
from ..functions import grid as G
from . import focal

_PX_PACK = 1 << 31  # packed global pixel id, shared with the focal family
_ARR_SCHEMA = "cell long, node long, d long"
_STATE_SCHEMA = "cell_id long, bytes binary, w int, h int, fmt string"
_OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
_INF = np.iinfo(np.int64).max // 4


def _pad_dijkstra(cost: np.ndarray, dist: np.ndarray, seeds: list[int]) -> None:
    """Exact relaxation over the padded grid from the seed flat indices
    (dist already set there); mutates ``dist`` in place. Cells with
    ``cost >= _INF`` (missing neighbors / corpus edge) are impassable.

    Reference kernel (and fallback for extreme budgets): one Python
    bytecode round-trip per edge. The hot path is ``_pad_dial``."""
    ph, pw = cost.shape
    heap = [(int(dist.flat[f]), f) for f in seeds]
    heapq.heapify(heap)
    flat = dist.ravel()
    cflat = cost.ravel()
    while heap:
        d, f = heapq.heappop(heap)
        if d > flat[f]:
            continue
        i, j = divmod(f, pw)
        for dx, dy in _OFFS:
            ni, nj = i + dy, j + dx
            if 0 <= ni < ph and 0 <= nj < pw:
                nf = ni * pw + nj
                c = cflat[nf]
                if c >= _INF:
                    continue
                nd = d + int(c)
                if nd < flat[nf]:
                    flat[nf] = nd
                    heapq.heappush(heap, (nd, nf))


def _pad_dial(cost: np.ndarray, dist: np.ndarray, seeds: list[int], b: int) -> None:
    """Budget-capped exact label-setting over the padded grid — Dial's
    integer-bucket Dijkstra with the per-level relaxation vectorized
    (one gather + one ``np.minimum.at`` scatter per distance level
    instead of one Python iteration per edge; ~10x the heap kernel on
    bench-shaped pads). Mutates ``dist`` in place, like
    ``_pad_dijkstra``, and computes the identical label function on
    every pixel whose distance is <= ``b``:

    - levels are settled in nondecreasing order, so this IS Dijkstra
      with a different priority queue — same seed set (the accepted
      arrivals), same strict-improvement rule against existing values;
    - the only divergence from the uncapped heap kernel is pixels whose
      distance exceeds ``b``: they keep the ``_INF`` sentinel (the
      documented state contract) instead of an uncapped upper bound.
      No consumer observes those — arrival acceptance, halo emission,
      the zonal rollup and the corridor score all threshold at the
      budget, and step costs >= 1 make every prefix of a <= b path
      itself <= b, so capping cannot lose a <= b label.

    A one-cell ``_INF`` ring keeps the 8-neighbor flat-index gather
    branch-free; a heap of ACTIVE levels (not a dense bucket array)
    keeps memory independent of the budget's magnitude."""
    ph, pw = cost.shape
    P = pw + 2
    cw = np.full((ph + 2, P), _INF, dtype=np.int64)
    cw[1:-1, 1:-1] = cost
    dw = np.full((ph + 2, P), _INF, dtype=np.int64)
    dw[1:-1, 1:-1] = dist
    cflat = cw.ravel()
    dflat = dw.ravel()
    offs = np.array([-P - 1, -P, -P + 1, -1, 1, P - 1, P, P + 1], dtype=np.int64)

    buckets: dict[int, list[np.ndarray]] = {}
    level_heap: list[int] = []

    def push(level: int, nodes: np.ndarray) -> None:
        got = buckets.get(level)
        if got is None:
            buckets[level] = [nodes]
            heapq.heappush(level_heap, level)
        else:
            got.append(nodes)

    sf = np.fromiter(
        ((f // pw + 1) * P + (f % pw + 1) for f in seeds),
        dtype=np.int64, count=len(seeds),
    )
    sl = dflat[sf]
    for level in np.unique(sl):
        push(int(level), sf[sl == level])

    while level_heap:
        lv = heapq.heappop(level_heap)
        nodes = np.concatenate(buckets.pop(lv))
        nodes = np.unique(nodes[dflat[nodes] == lv])  # drop stale labels
        if nodes.size == 0:
            continue
        nbr = (nodes[:, None] + offs[None, :]).ravel()
        nd = lv + cflat[nbr]          # walls: lv + _INF stays > b (guarded)
        ok = (nd <= b) & (nd < dflat[nbr])
        nbr = nbr[ok]
        nd = nd[ok]
        if nbr.size == 0:
            continue
        np.minimum.at(dflat, nbr, nd)
        cur = dflat[nbr] == nd        # still the best label after the scatter
        nbr = nbr[cur]
        nd = nd[cur]
        order = np.argsort(nd, kind="stable")
        nd = nd[order]
        nbr = nbr[order]
        cuts = np.nonzero(np.diff(nd))[0] + 1
        starts = np.concatenate(([0], cuts))
        for seg, at in zip(np.split(nbr, cuts), starts):
            push(int(nd[at]), seg)

    np.copyto(dist, dw[1:-1, 1:-1])


def _pad_relax(cost: np.ndarray, dist: np.ndarray, seeds: list[int], b: int) -> None:
    """Dispatch: Dial bucket kernel when the budget arithmetic is safely
    inside int64 (always, for real budgets), heap kernel otherwise.
    Observable labels (<= b) are identical either way."""
    if 0 <= b < _INF // 2:
        _pad_dial(cost, dist, seeds, b)
    else:
        _pad_dijkstra(cost, dist, seeds)


def _prune_tiles_bbox(
    tiles: DataFrame, seeds: "list[tuple[int, int]]", margin: int,
    tw: int, th: int, grid=None,
) -> DataFrame:
    """Keep only tiles whose cell intersects the seeds' global-pixel
    bbox dilated by ``margin`` px — a pure cell-id bit-arithmetic filter
    (pushable; no decode). Exact, not heuristic: callers pass a margin
    that upper-bounds the wave's reach (see cost_distance_state)."""
    gxs = [int(gx) for gx, _ in seeds]
    gys = [int(gy) for _, gy in seeds]
    if not gxs:
        return tiles
    m = int(margin)
    cx_lo = max((min(gxs) - m) // tw, 0)
    cx_hi = (max(gxs) + m) // tw
    cy_lo = max((min(gys) - m) // th, 0)
    cy_hi = (max(gys) + m) // th
    yb, xym = G._Y_BITS, G._XY_MASK
    cx = F.shiftrightunsigned(F.col("cell_id"), yb).bitwiseAND(F.lit(xym))
    cy = F.col("cell_id").bitwiseAND(F.lit(xym))
    bbox = (
        (cx >= F.lit(cx_lo)) & (cx <= F.lit(cx_hi))
        & (cy >= F.lit(cy_lo)) & (cy <= F.lit(cy_hi))
    )
    # coarse cell_id BETWEEN envelope of the bbox: unlike the exact bit
    # filter it is a plain range predicate on a stored column, so it
    # pushes to the (cell-sorted) parquet scan and prunes row groups;
    # the exact rectangle filter above still applies after the scan
    if grid is not None:
        lo = int(G.cell_from_xy(grid, cx_lo, cy_lo))
        hi = int(G.cell_from_xy(grid, cx_hi, cy_hi))
        bbox = F.col("cell_id").between(F.lit(lo), F.lit(hi)) & bbox
    return tiles.filter(bbox)


def _cost_pads(tiles: DataFrame, halo: int, cost_offset: int) -> DataFrame:
    """One-time padded-cost state: per tile, the (h+2r)x(w+2r) int64
    entering-cost array (neighbor strips filled in, missing cells
    impassable at ``_INF``), encoded raw_i64. Raises (in the kernel) if
    any effective step cost is < 1."""
    r = int(halo)
    off = int(cost_offset)
    parts = focal._halo_parts(tiles, r)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "cell_id": pd.Series(dtype="int64"), "bytes": pd.Series(dtype="object"),
            "w": pd.Series(dtype="int32"), "h": pd.Series(dtype="int32"),
            "fmt": pd.Series(dtype="object"),
        })
        got = focal._build_pad(pdf, r, -1)
        if got is None:
            return empty
        cell, h, w, pad = got
        cost = pad.astype(np.int64)
        missing = cost < 0
        cost += off
        if int(cost[~missing].min(initial=1)) < 1:
            raise ValueError("effective step cost must be >= 1 (raise cost_offset)")
        cost[missing] = _INF
        return pd.DataFrame({
            "cell_id": [int(cell)],
            "bytes": [codecs.encode_tile(cost, "raw_i64")],
            "w": [np.int32(w)], "h": [np.int32(h)], "fmt": ["raw_i64"],
        })

    return (
        parts.groupBy("target_cell")
        .applyInPandas(lambda pdf: assemble(pdf), _STATE_SCHEMA)
        .localCheckpoint(eager=True)
    )


def cost_distance_state(
    tiles: DataFrame,
    seeds: list[tuple[int, int]],
    budget: int,
    cost_offset: int = 0,
    halo: int = 8,
    max_rounds: int = 64,
) -> DataFrame:
    """Run the Δ-wave to fixpoint; returns the distance-state frame
    (``cell_id, bytes, w, h, fmt='raw_i64'``) holding, per touched tile,
    the exact least-cost distance of every pixel (unreached / beyond-
    budget pixels hold the ``_INF`` sentinel). ``seeds`` are absolute
    global pixels (gx, gy)."""
    if int(max_rounds) < 1:
        raise ValueError("max_rounds must be >= 1")
    spark = tiles.sparkSession
    b = int(budget)
    r = int(halo)

    head = tiles.select("w", "h", "cell_id").first()
    if head is None:
        raise ValueError("empty tile frame")
    tw, th = int(head["w"]), int(head["h"])
    grid = G.grid_of_cell(int(head["cell_id"]))

    # Budget-disc tile prune BEFORE the pad build (guide §1.2 step 1 —
    # don't compute things you throw away): every step enters a pixel
    # costing >= 1 (enforced in the pad kernel), so a reached pixel is
    # within Chebyshev distance ``budget`` of a seed, and pad strips
    # reach ``halo`` px further. Tiles outside the seed bbox dilated by
    # budget + halo can never contribute — on the bench corpus this
    # collapses the one-time pad build from 2304 decoded tiles to the
    # ~the budget disc's tiles; on a 100-TB corpus it is the difference
    # between touching the disc and touching the corpus.
    tiles = _prune_tiles_bbox(tiles, seeds, b + r, tw, th, grid)
    pads = _cost_pads(tiles, r, cost_offset)

    arr_rows = []
    for gx, gy in seeds:
        cell = int(G.cell_from_xy(grid, int(gx) // tw, int(gy) // th))
        arr_rows.append((cell, int(gx) * _PX_PACK + int(gy), -1))
    # fail loudly if every seed misses the corpus (a silent empty field
    # is indistinguishable from "nothing within budget" downstream);
    # with a MIXED seed list the missing seeds would silently vanish in
    # the cogroup, so name them in a warning at least
    seed_cells = {c for c, _, _ in arr_rows}
    present = {
        int(row["cell_id"])
        for row in pads.filter(F.col("cell_id").isin(*seed_cells))
        .select("cell_id").collect()
    }
    if not present:
        raise ValueError(
            f"none of the {len(seeds)} seed pixels land on an existing tile"
        )
    if len(present) < len(seed_cells):
        import warnings

        dropped = sorted(seed_cells - present)
        warnings.warn(
            f"{len(dropped)} seed cell(s) have no stored tile and are "
            f"ignored: {dropped[:8]}{'...' if len(dropped) > 8 else ''}",
            RuntimeWarning,
            stacklevel=2,
        )
    # seed arrivals carry d = -1: the kernel's entering rule d + cost(q)
    # would double-charge the seed pixel, so it special-cases d == -1 to
    # dist(seed) = 0. A literal local relation needs no checkpoint job.
    arrivals = spark.createDataFrame(arr_rows, _ARR_SCHEMA)

    state = spark.createDataFrame([], _STATE_SCHEMA)

    def relax(tile_pdf: pd.DataFrame, arr_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "cell_id": pd.Series(dtype="int64"), "bytes": pd.Series(dtype="object"),
            "a_cell": pd.Series(dtype="int64"), "a_node": pd.Series(dtype="int64"),
            "a_d": pd.Series(dtype="int64"),
        })
        if len(tile_pdf) == 0 or len(arr_pdf) == 0:
            return empty
        row = tile_pdf.iloc[0]
        cell = int(row["cell_id"])
        w, h = int(row["w"]), int(row["h"])
        pw, ph = w + 2 * r, h + 2 * r
        cost = codecs.decode_tile(bytes(row["bytes"]), pw, ph, "raw_i64")
        dist = np.full((ph, pw), _INF, dtype=np.int64)
        if row["s_bytes"] is not None:
            dist[r:r + h, r:r + w] = codecs.decode_tile(
                bytes(row["s_bytes"]), w, h, "raw_i64")
        tx, ty = G.cell_to_xy(cell)
        gx0, gy0 = int(tx) * w - r, int(ty) * h - r  # pad-frame origin
        # arrivals are min-agged per (cell, node) upstream, so pixel ids
        # are unique here and the scatter below cannot race
        node = arr_pdf["node"].to_numpy(np.int64)
        dval = arr_pdf["d"].to_numpy(np.int64)
        aj = node // _PX_PACK - gx0
        ai = node % _PX_PACK - gy0
        nd = np.where(dval < 0, 0, dval + cost[ai, aj])
        ok = (nd <= b) & (nd < dist[ai, aj])
        if not ok.any():
            return empty
        ai, aj, nd = ai[ok], aj[ok], nd[ok]
        dist[ai, aj] = nd
        seeds_local = (ai * pw + aj).tolist()
        _pad_relax(cost, dist, seeds_local, b)
        out = {
            "cell_id": [cell],
            "bytes": [codecs.encode_tile(
                np.ascontiguousarray(dist[r:r + h, r:r + w]), "raw_i64")],
            "a_cell": [-1], "a_node": [-1], "a_d": [-1],
        }
        # every REACHED halo pixel -> entering-arrival for its owner
        halo_mask = np.ones((ph, pw), dtype=bool)
        halo_mask[r:r + h, r:r + w] = False
        hit = halo_mask & (dist <= b) & (cost < _INF)
        yb = G._Y_BITS
        ii, jj = np.nonzero(hit)
        ngx = gx0 + jj.astype(np.int64)
        ngy = gy0 + ii.astype(np.int64)
        ncell = cell + ((ngx // w - int(tx)) << yb) + (ngy // h - int(ty))
        frame = pd.DataFrame(out)
        if ii.size:
            frame = pd.concat([frame, pd.DataFrame({
                "cell_id": np.full(ii.size, -1, dtype=np.int64),
                "bytes": np.full(ii.size, None, dtype=object),
                "a_cell": ncell,
                "a_node": ngx * _PX_PACK + ngy,
                "a_d": dist[hit] - cost[hit],
            })], ignore_index=True)
        return frame

    mixed_schema = "cell_id long, bytes binary, a_cell long, a_node long, a_d long"

    # explicit keyed repartition before the cogroup: the frontier is a
    # handful of byte-tiny rows, so AQE would coalesce the cogroup's
    # shuffle to ONE task and run every tile's Dijkstra serially; a
    # user repartition is AQE-exempt and satisfies the cogroup's
    # distribution, keeping one relax kernel per core available
    n_relax = spark.sparkContext.defaultParallelism
    for rnd in range(int(max_rounds)):
        # frontier-only: settled tiles outside the wave ship zero bytes
        frontier = arrivals.select("cell").distinct()
        tiles_state = (
            pads.join(frontier, pads["cell_id"] == frontier["cell"], "inner")
            .drop("cell")
            .join(
                state.select(
                    F.col("cell_id").alias("s_cell"), F.col("bytes").alias("s_bytes")
                ),
                F.col("cell_id") == F.col("s_cell"),
                "left",
            )
            .drop("s_cell")
            .repartition(n_relax, "cell_id")
        )
        mixed = (
            tiles_state.groupBy("cell_id")
            .cogroup(arrivals.repartition(n_relax, "cell").groupBy("cell"))
            .applyInPandas(lambda left, right: relax(left, right), mixed_schema)
            .localCheckpoint(eager=True)
        )
        new_state = mixed.filter(F.col("cell_id") >= 0).select(
            "cell_id", "bytes",
            F.lit(tw).cast("int").alias("w"), F.lit(th).cast("int").alias("h"),
            F.lit("raw_i64").alias("fmt"),
        )
        state = (
            state.join(new_state.select(F.col("cell_id").alias("n_cell")),
                       state["cell_id"] == F.col("n_cell"), "left_anti")
            .unionByName(new_state)
            .localCheckpoint(eager=True)
        )
        # checkpoint FIRST, count the materialized partitions after: the
        # old order (count, then eager checkpoint) executed the arrival
        # aggregation twice per round as two separate jobs
        arrivals = (
            mixed.filter(F.col("a_cell") >= 0)
            .groupBy(F.col("a_cell").alias("cell"), F.col("a_node").alias("node"))
            .agg(F.min("a_d").alias("d"))
            .localCheckpoint(eager=True)
        )
        n_arr = arrivals.count()
        if os.environ.get("COSTDIST_DEBUG"):
            import sys

            print(f"[costdist] round={rnd + 1} arrivals={n_arr}",
                  file=sys.stderr, flush=True)
        if n_arr == 0:
            break
    else:
        # NEVER return a silently-partial field: hitting the round cap
        # with live arrivals means some distances are still upper
        # bounds, and a truncated cost surface looks exactly like a
        # converged one downstream
        raise RuntimeError(
            f"cost-distance wave did not converge in {max_rounds} rounds "
            f"({n_arr} live arrivals); raise max_rounds or halo"
        )
    return state


def cost_distance_zonal(
    tiles: DataFrame,
    seeds: list[tuple[int, int]],
    budget: int,
    cost_offset: int = 0,
    halo: int = 8,
    max_rounds: int = 64,
) -> DataFrame:
    """Per-cell rollup of the cost-distance field: ``(cell_id,
    n_reached, dist_sum, dist_max)`` over pixels with ``dist <= budget``
    — the gate-friendly product (tiles with zero reached pixels are
    absent, matching the twin's GROUP BY)."""
    b = int(budget)
    state = cost_distance_state(tiles, seeds, b, cost_offset, halo, max_rounds)

    def rollup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"cell_id": [], "n_reached": [], "dist_sum": [], "dist_max": []}
            for cell, data, w, h, fmt in zip(
                pdf["cell_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                dist = codecs.decode_tile(bytes(data), int(w), int(h), fmt)
                hit = dist[dist <= b]
                if hit.size == 0:
                    continue
                rows["cell_id"].append(int(cell))
                rows["n_reached"].append(int(hit.size))
                rows["dist_sum"].append(int(hit.sum()))
                rows["dist_max"].append(int(hit.max()))
            yield pd.DataFrame(rows)

    return state.mapInPandas(
        rollup, "cell_id long, n_reached long, dist_sum long, dist_max long"
    )


def cost_corridor_zonal(
    tiles: DataFrame,
    seeds_a: list[tuple[int, int]],
    seeds_b: list[tuple[int, int]],
    budget: int,
    slack: int = 0,
    cost_offset: int = 0,
    halo: int = 8,
    max_rounds: int = 64,
) -> DataFrame:
    """Least-cost CORRIDOR between two seed sets (the ArcGIS "Corridor"
    product / circuitscape's deterministic core): a pixel p lies in the
    corridor iff ``dA(p) + dB(p) - cost(p) <= best + slack``, where
    dA/dB are the budget-capped cost-distance fields from each seed set
    and ``best = min_p (dA + dB - cost)`` (the ``- cost(p)`` removes the
    double-charge of the meeting pixel). ``best`` is the summed entering
    cost of the INTERMEDIATE pixels of the optimal A->B path — it
    excludes the destination endpoint's own entering cost (path A,q,B
    scores cost(q), not cost(q)+cost(B)); the engine, the DuckDB twin
    and the tests all share this identity, and the slack=0 corridor is
    exactly the set of pixels on SOME optimal path under it.

    Composition, not new machinery: TWO halo-widened waves (each
    pruned to its own budget disc), one cell-keyed cogroup of the two
    raw_i64 state frames with the cost pads, a broadcast of the single
    scalar ``best`` (computed by a tiny two-stage min agg), and one
    rollup pass. Returned per cell: ``n_corridor`` (pixels within
    slack), ``slack_min`` = min over the cell's jointly-reached pixels
    of (dA+dB-cost) - best (0 exactly where an optimal path crosses),
    plus ``n_scored`` (pixels where both fields are <= budget — the
    joint-reachable support).
    All int64; the DuckDB twin composes the same two recursive-CTE
    Bellman fields."""
    b = int(budget)
    sa = cost_distance_state(tiles, seeds_a, b, cost_offset, halo, max_rounds)
    sb = cost_distance_state(tiles, seeds_b, b, cost_offset, halo, max_rounds)
    # r=0: just the offset cost tile; joint pixels need dA <= b, so only
    # tiles inside seed-set A's budget bbox can ever score (same exact
    # bound as the wave prune)
    head = tiles.select("w", "h").first()
    scored_tiles = _prune_tiles_bbox(
        tiles, seeds_a, b, int(head["w"]), int(head["h"])
    )
    pads = _cost_pads(scored_tiles, 0, cost_offset)

    def score(tile_pdf: pd.DataFrame, other_pdf: pd.DataFrame) -> pd.DataFrame:
        # stage 1: per-cell (dA + dB - cost) plane, kept as state rows
        empty = pd.DataFrame({
            "cell_id": pd.Series(dtype="int64"), "bytes": pd.Series(dtype="object"),
            "w": pd.Series(dtype="int32"), "h": pd.Series(dtype="int32"),
            "fmt": pd.Series(dtype="object"),
        })
        if len(tile_pdf) == 0 or len(other_pdf) == 0:
            return empty
        ra = tile_pdf.iloc[0]
        rb = other_pdf.iloc[0]
        w, h = int(ra["w"]), int(ra["h"])
        da = codecs.decode_tile(bytes(ra["s_bytes"]), w, h, "raw_i64")
        db = codecs.decode_tile(bytes(rb["bytes"]), w, h, "raw_i64")
        cost = codecs.decode_tile(bytes(ra["bytes"]), w, h, "raw_i64")
        joint = (da <= b) & (db <= b)
        plane = np.full((h, w), _INF, dtype=np.int64)
        plane[joint] = da[joint] + db[joint] - cost[joint]
        if not joint.any():
            return empty
        return pd.DataFrame({
            "cell_id": [int(ra["cell_id"])],
            "bytes": [codecs.encode_tile(plane, "raw_i64")],
            "w": [np.int32(w)], "h": [np.int32(h)], "fmt": ["raw_i64"],
        })

    ab = pads.join(
        sa.select(F.col("cell_id").alias("s_cell"), F.col("bytes").alias("s_bytes")),
        pads["cell_id"] == F.col("s_cell"), "inner",
    ).drop("s_cell")
    planes = (
        ab.groupBy("cell_id")
        .cogroup(sb.groupBy("cell_id"))
        .applyInPandas(lambda left, right: score(left, right), _STATE_SCHEMA)
        .localCheckpoint(eager=True)
    )

    def plane_min(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [
                int(codecs.decode_tile(bytes(d), int(w), int(h), f).min())
                for d, w, h, f in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            ]
            yield pd.DataFrame({"m": vals or [int(_INF)]})

    best_row = (
        planes.mapInPandas(plane_min, "m long").agg(F.min("m").alias("m")).first()
    )
    if best_row is None or best_row["m"] is None or int(best_row["m"]) >= _INF:
        return planes.sparkSession.createDataFrame(
            [], "cell_id long, n_scored long, n_corridor long, slack_min long"
        )
    best = int(best_row["m"])
    cut = best + int(slack)

    def rollup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"cell_id": [], "n_scored": [], "n_corridor": [], "slack_min": []}
            for cell, d, w, h, f in zip(
                pdf["cell_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                plane = codecs.decode_tile(bytes(d), int(w), int(h), f)
                scored = plane < _INF
                corr = plane <= cut
                rows["cell_id"].append(int(cell))
                rows["n_scored"].append(int(scored.sum()))
                rows["n_corridor"].append(int(corr.sum()))
                rows["slack_min"].append(int(plane.min()) - best)
            yield pd.DataFrame(rows)

    return planes.mapInPandas(
        rollup, "cell_id long, n_scored long, n_corridor long, slack_min long"
    )
