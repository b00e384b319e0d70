"""Viewshed (line-of-sight visibility) over the tiled integer DEM — the
classic ``r.viewshed`` / ArcGIS "Viewshed" product the reference cannot
express (reference raster_analysis/query_executor.py windows one tile at
a time; a sight line crosses many).

Semantics (R3, integer-exact): an observer stands at global pixel
``(ox, oy)`` with eye elevation ``z_o = dem(ox, oy) + tower``. A target
pixel ``t`` within Chebyshev radius ``R`` is VISIBLE iff no sampled
point of the sight line rises above the ray from the eye to the
target's surface. The sight line is the uniform DDA with
``N = max(|tx-ox|, |ty-oy|)`` steps; sample ``k`` (``1 <= k < N``) is
the round-half-up lattice point

    x_k = ox + sgn(dx) * ((2*k*|dx| + N) // (2*N))      (y_k alike)

and it BLOCKS the target iff  ``(z_k - z_o) * N > (z_t - z_o) * k`` —
the slope comparison cross-multiplied so everything stays int64 (no
float angles, no epsilon): the DuckDB twin hash-matches bit-for-bit.
Targets at ``N <= 1`` (the observer and its 8 neighbors) are visible by
definition. Grazing rays (equality) do NOT block, matching GRASS's
"target visible when exactly on the horizon" convention.

Scale shape — this is the exact R3 algorithm expressed RELATIONALLY so
Catalyst parallelizes its O(px * R) inherent work instead of a driver
loop hand-walking rays:

1. **Partition-pruned decode.** Only tiles whose pixel bbox intersects
   the radius disc are decoded (a cell-id bit-arithmetic filter BEFORE
   the Arrow decode pass) — on a 100-TB corpus the viewshed of one
   tower touches O(R^2 / tile_px^2) tiles, not the corpus.
2. **One pixel frame, reused.** The decoded (gx, gy, z) frame serves as
   target side AND sample-lookup side; it is localCheckpoint-ed so the
   decode runs once.
3. **Samples stay JVM-side.** The k-explosion (`sequence(1, N-1)`) and
   the DDA lattice arithmetic are Catalyst expressions inside
   whole-stage codegen — no Python in the O(px * R) hot path.
4. **Broadcast-or-shuffle lookup.** The sample -> elevation join
   broadcasts the pixel frame when the radius disc is small enough
   (probed RELATIONALLY with one count, the `_probe_aoi_batch`
   pattern), else hash-joins on the lattice coordinate.
5. **Map-side combined verdicts.** The per-target `max(blocked)` is a
   partial-aggregatable groupBy: O(px * R) sample rows reduce to
   O(px) verdicts before the final O(cells) zonal rollup.

The sector-sweep R2 variant (shared boundary rays + segmented
prefix-max) is the approximation ladder above this exact baseline; R3
with a radius cap is what the oracle can certify bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs
from ..functions import grid as G

_PX_SCHEMA = "gx long, gy long, z long"

# broadcast the sample->elevation lookup side below this many pixels
# (~32 B/row hashed => ~128 MB at the bound, comfortably under a 1-GB
# driver broadcast budget). The disc at radius R is (2R+1)^2 px, so
# this covers R <= ~1000 — a 1024-px-tile reference window — before
# degrading to the shuffle join.
_BROADCAST_PX_BOUND = 4_000_000


def _pixels(
    tiles: DataFrame, x_lo: int, x_hi: int, y_lo: int, y_hi: int,
    tile_wh: "tuple[int, int, int] | None" = None,
) -> DataFrame:
    """Decode tiles to (gx, gy, z) pixel rows, AFTER a cell-id
    bit-arithmetic prune to tiles intersecting the global-pixel bbox
    [x_lo, x_hi] x [y_lo, y_hi]. Global pixel coords are absolute:
    ``gx = cell_x * w + j``, ``gy = cell_y * h + i`` (matches the
    focal family's packing). ``tile_wh`` = (w, h, grid_index) when the
    caller already probed the (single-size) tile shape: it enables a
    cell_id BETWEEN envelope that pushes to the cell-sorted parquet
    scan (row-group pruning) — the exact bit filter alone reads and
    post-filters the whole layer."""
    yb, xb, xym = G._Y_BITS, G._X_BITS, G._XY_MASK
    cx = F.shiftrightunsigned(F.col("cell_id"), yb).bitwiseAND(F.lit(xym))
    cy = F.col("cell_id").bitwiseAND(F.lit(xym))
    cond = (
        ((cx + 1) * F.col("w") > F.lit(x_lo)) & (cx * F.col("w") <= F.lit(x_hi))
        & ((cy + 1) * F.col("h") > F.lit(y_lo)) & (cy * F.col("h") <= F.lit(y_hi))
    )
    if tile_wh is not None:
        tw, th, gidx = (int(v) for v in tile_wh)
        base = gidx << (xb + yb)
        lo = base + (max(x_lo // tw, 0) << yb) + max(y_lo // th, 0)
        hi = base + (max(x_hi // tw, 0) << yb) + max(y_hi // th, 0)
        cond = F.col("cell_id").between(F.lit(lo), F.lit(hi)) & cond
    pruned = tiles.filter(cond).select("cell_id", "bytes", "w", "h", "fmt")

    def decode(batches):
        for pdf in batches:
            frames = []
            for cell, data, w, h, fmt in zip(
                pdf["cell_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                w, h = int(w), int(h)
                arr = codecs.decode_tile(bytes(data), w, h, fmt).astype(np.int64)
                tx, ty = G.cell_to_xy(int(cell))
                jj, ii = np.meshgrid(np.arange(w), np.arange(h))
                frames.append(pd.DataFrame({
                    "gx": (int(tx) * w + jj).ravel().astype(np.int64),
                    "gy": (int(ty) * h + ii).ravel().astype(np.int64),
                    "z": arr.ravel(),
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    # pixel-level prune AFTER the decode: a tile only partially inside
    # the bbox would otherwise inflate the lookup side ~9x at reference
    # weight and push it past the broadcast bound into a sort-merge
    # join of the full sample set — measured 257 s -> 97 s at 1024-px
    # tiles / radius 512 (269M samples)
    return pruned.mapInPandas(decode, _PX_SCHEMA).filter(
        (F.col("gx") >= x_lo) & (F.col("gx") <= x_hi)
        & (F.col("gy") >= y_lo) & (F.col("gy") <= y_hi)
    )


def viewshed_zonal(
    tiles: DataFrame,
    observer: tuple[int, int],
    tower: int = 0,
    radius: int = 128,
) -> DataFrame:
    """Per-cell viewshed rollup: for every tile within ``radius`` of the
    observer, how many of its pixels see the eye — ``(cell_id, n_px,
    n_visible, vis_sum)`` with ``vis_sum`` the summed DEM of the visible
    pixels (all int64, hash-exact vs the DuckDB twin).

    ``observer`` is the absolute global pixel (ox, oy); ``tower`` is
    added to the surface elevation under the eye. Raises if the
    observer pixel is outside the (pruned) corpus. A sample landing on
    a MISSING pixel (corpus edge / missing tile — reference S2
    semantics) never blocks: the lookup is a left join and the null
    comparison falls through to "not blocked"."""
    ox, oy = int(observer[0]), int(observer[1])
    r = int(radius)
    if not (1 <= r <= 4096):
        # O(px * R) samples: beyond a few thousand px of radius you want
        # a pyramid level under the viewshed, not a bigger disc
        raise ValueError("radius must be in [1, 4096]")
    # one tiny probe up front: tile shape + grid index feed the pushable
    # scan envelope in _pixels AND the cell-id back-derivation at the
    # end (this used to be two separate probe jobs)
    head = tiles.select(
        "w", "h",
        F.shiftrightunsigned("cell_id", G._X_BITS + G._Y_BITS).alias("g"),
    ).first()
    if head is None:
        raise ValueError(f"observer pixel ({ox}, {oy}) not in corpus")
    tw, th, gidx = int(head["w"]), int(head["h"]), int(head["g"])
    px = _pixels(
        tiles, ox - r, ox + r, oy - r, oy + r, tile_wh=(tw, th, gidx)
    ).localCheckpoint(eager=True)

    # one aggregate serves the observer-elevation lookup AND the
    # broadcast-bound count probe (two jobs before)
    stats = px.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(
            F.when((F.col("gx") == ox) & (F.col("gy") == oy), F.col("z"))
        ).alias("zo"),
    ).first()
    if stats is None or stats["zo"] is None:
        raise ValueError(f"observer pixel ({ox}, {oy}) not in corpus")
    z_o = int(stats["zo"]) + int(tower)
    n_disc_px = int(stats["n"])

    targets = (
        px.withColumn("adx", F.abs(F.col("gx") - F.lit(ox)))
        .withColumn("ady", F.abs(F.col("gy") - F.lit(oy)))
        .filter((F.col("adx") <= r) & (F.col("ady") <= r))
        .withColumn("n", F.greatest("adx", "ady"))
    )

    # near field (N <= 1): visible by definition — no samples to check
    near = targets.filter(F.col("n") <= 1).select(
        "gx", "gy", "z", F.lit(1).alias("visible")
    )

    # far field: explode DDA steps k in [1, N-1]; ALL lattice arithmetic
    # on non-negative ints so `div` (truncating) == floor on both engines.
    # The target frame inherits the pruned scan's partitioning — a
    # handful of disc tiles, so the O(px * R) explosion would run on 1-9
    # tasks; spread the (tiny, pre-explosion) target rows round-robin
    # first so the explode+join+partial-agg stage uses every core
    # (guide §2.5 input skew: repartition after the pruned read)
    far = targets.filter(F.col("n") >= 2).repartition(
        tiles.sparkSession.sparkContext.defaultParallelism
    )
    samples = (
        far.select(
            "gx", "gy", "z", "n", "adx", "ady",
            F.signum(F.col("gx") - F.lit(ox)).cast("long").alias("sgx"),
            F.signum(F.col("gy") - F.lit(oy)).cast("long").alias("sgy"),
            F.explode(F.sequence(F.lit(1), F.col("n") - 1)).alias("k"),
        )
        .select(
            "gx", "gy", "z", "n", "k",
            (F.lit(ox) + F.col("sgx")
             * F.expr("(2*k*adx + n) div (2*n)")).alias("sx"),
            (F.lit(oy) + F.col("sgy")
             * F.expr("(2*k*ady + n) div (2*n)")).alias("sy"),
        )
    )

    lookup = px.select(
        F.col("gx").alias("sx"), F.col("gy").alias("sy"), F.col("z").alias("zk")
    )
    # relational probe, not a guess: broadcast the disc when it is small
    if n_disc_px <= _BROADCAST_PX_BOUND:
        lookup = F.broadcast(lookup)

    far_verdict = (
        samples.join(lookup, ["sx", "sy"], "left")
        .groupBy("gx", "gy", "z")
        .agg(
            F.max(
                F.when(
                    (F.col("zk") - F.lit(z_o)) * F.col("n")
                    > (F.col("z") - F.lit(z_o)) * F.col("k"),
                    1,
                ).otherwise(0)
            ).alias("blocked")
        )
        .select("gx", "gy", "z", (1 - F.col("blocked")).alias("visible"))
    )

    verdicts = near.unionByName(far_verdict)
    # cell-id back-derivation from the single up-front probe
    cell_expr = (
        F.lit(gidx << (G._X_BITS + G._Y_BITS))
        + F.expr(f"(gx div {tw})") * F.lit(1 << G._Y_BITS)
        + F.expr(f"(gy div {th})")
    ).alias("cell_id")

    return (
        verdicts.select(cell_expr, "z", "visible")
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_px"),
            F.sum("visible").cast("long").alias("n_visible"),
            F.sum(F.col("z") * F.col("visible")).cast("long").alias("vis_sum"),
        )
    )


def openness_zonal(
    tiles: DataFrame,
    radius: int = 8,
    slope_num: int = 1,
    slope_den: int = 2,
) -> DataFrame:
    """Topographic openness (Yokoyama et al. 2002) / sky-view factor —
    the bounded-horizon companion of the viewshed: for every pixel,
    how many of its 8 compass directions are OPEN, i.e. contain no
    sample within ``radius`` steps whose upward slope from the pixel
    exceeds ``slope_num/slope_den`` (the horizon-angle threshold).
    Solar-exposure / frost-pocket / terrain-shading screening at
    corpus scale.

    Integer-exact by construction: cardinal directions test
    ``dz * den > num * k``; diagonal steps cover k*sqrt(2), so the
    comparison is squared — ``dz > 0 AND dz^2 * den^2 > 2 * num^2 *
    k^2`` — and stays in int64 (dz <= 2^16 for uint16 DEMs). Samples
    beyond the corpus edge / on missing tiles never close a direction
    (reference S2 semantics, same convention as the viewshed).

    Scale shape: a pure focal-family operator — the one halo-strip
    Exchange (``radius``-px edges, operators/focal.py `_halo_parts`),
    one Arrow kernel of 8 x radius shifted-slice comparisons (no
    per-pixel Python), O(cells) output. Returned per cell: ``n_px``,
    ``open_sum`` (sum of per-pixel open-direction counts, 0..8 each),
    ``n_fully_open`` (pixels with all 8 open), ``n_closed`` (pixels
    with none). The DuckDB twin evaluates the same comparisons over
    the closed-form surface."""
    from . import focal

    r = int(radius)
    if not (1 <= r <= focal._MAX_RADIUS):
        raise ValueError(f"radius must be in [1, {focal._MAX_RADIUS}]")
    tn, td = int(slope_num), int(slope_den)
    if tn < 0 or td <= 0:
        raise ValueError("slope threshold must be a non-negative rational")
    out_schema = (
        "cell_id long, n_px long, open_sum long, n_fully_open long, "
        "n_closed long"
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        built = focal._build_pad(pdf, r, -1)
        if built is None:
            return pd.DataFrame({
                c: pd.Series(dtype="int64")
                for c in ("cell_id", "n_px", "open_sum", "n_fully_open",
                          "n_closed")
            })
        cell, h, w, pad = built
        z = pad.astype(np.int64)
        valid = pad >= 0
        center = z[r:r + h, r:r + w]
        open_dirs = np.zeros((h, w), dtype=np.int64)
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1),
                       (1, 1), (1, -1), (-1, 1), (-1, -1)):
            diag = dx != 0 and dy != 0
            closed = np.zeros((h, w), dtype=bool)
            for k in range(1, r + 1):
                zs = z[r + k * dy:r + k * dy + h, r + k * dx:r + k * dx + w]
                ok = valid[r + k * dy:r + k * dy + h, r + k * dx:r + k * dx + w]
                dz = zs - center
                if diag:
                    hit = ok & (dz > 0) & (dz * dz * (td * td) > 2 * (tn * tn) * (k * k))
                else:
                    hit = ok & (dz * td > tn * k)
                closed |= hit
            open_dirs += ~closed
        return pd.DataFrame({
            "cell_id": [int(cell)],
            "n_px": [int(h * w)],
            "open_sum": [int(open_dirs.sum())],
            "n_fully_open": [int((open_dirs == 8).sum())],
            "n_closed": [int((open_dirs == 0).sum())],
        })

    return focal._halo_parts(tiles, r).groupBy("target_cell").applyInPandas(
        assemble, out_schema
    )
