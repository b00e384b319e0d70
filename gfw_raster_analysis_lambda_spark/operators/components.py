"""Connected components over cell sets: spatial clustering of raster
phenomena (e.g. grouping alert cells into contiguous events).

The reference reports per-AOI aggregates only; clustering contiguous
alert regions is the standard downstream ask, and it is the one operator
class here that is genuinely ITERATIVE. Spark shape: hash-to-min label
propagation — each round every cell takes the minimum label in its
closed neighborhood, all as relational joins (adjacency from pure
Catalyst bit arithmetic on the packed cell id, NEVER a materialized
all-pairs set), iterated to a fixpoint with an early-stop count.

Rounds needed = graph diameter in the worst case (a long snake), which
is fine for the compact blobs raster clustering produces. For
adversarial diameters swap in pointer-jumping (label -> label joins,
O(log n) rounds) — the per-round plan is identical, so the physical
story does not change.

DuckDB oracle twin: recursive reachability CTE + MIN over reached
(driver contract query ``cc_alert_cells``) — same labels, engine-
independent."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import grid as G


def cell_adjacency(cells: DataFrame, diagonal: bool = True) -> DataFrame:
    """Directed adjacency (a, b) between cells of the input set whose
    packed (x, y) coordinates differ by at most 1 (8- or 4-neighborhood).
    Built by exploding each cell into its neighbor ids (pure Catalyst bit
    arithmetic) and semi-joining back on the set — O(cells x 8) rows, no
    cross join."""
    xb, yb = G._X_BITS, G._Y_BITS
    offsets = [
        (dx, dy)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if (dx, dy) != (0, 0) and (diagonal or dx == 0 or dy == 0)
    ]
    c = cells.select(F.col("cell_id").cast("long")).distinct()
    neigh = c.select(
        "cell_id",
        F.explode(
            F.array(*[
                F.col("cell_id") + F.lit((dx << yb) + dy) for dx, dy in offsets
            ])
        ).alias("nbr"),
    )
    # keep only neighbors that exist in the set (also drops x/y underflow
    # artifacts: a wrapped id is not a member)
    return neigh.join(
        c.withColumnRenamed("cell_id", "nbr"), "nbr", "left_semi"
    ).select(F.col("cell_id").alias("a"), F.col("nbr").alias("b"))


def hash_to_min(
    nodes: DataFrame,  # one column: id (long or string)
    edges: DataFrame,  # columns: a, b (same type, directed — pass both directions)
    max_iter: int = 30,
    shortcut: bool = True,
) -> DataFrame:
    """(id, component): component = min node id reachable through the
    edge set. The generic label-propagation loop shared by cell-level and
    pixel-level clustering: each round propagates labels across edges,
    min-combines, and (``shortcut``) pointer-jumps — every node also
    adopts its current component's own label, which doubles the
    propagation distance per round. Convergence is O(log diameter) with
    shortcutting instead of O(diameter) — the difference between ~15 and
    ~1000 rounds for a continent-spanning contiguous region. Early-stops
    on a changed-label count.

    Node ids may be longs OR strings: the loop is only equi-joins and
    MIN-combines, both defined for either type, so string-keyed callers
    (e.g. image-id cluster reps) run natively — no hash-to-long mapping,
    hence no possibility of a 64-bit hash collision silently merging
    unrelated components. Integral ids are normalized to long; everything
    else is kept verbatim."""
    integral = nodes.schema["id"].dataType.typeName() in (
        "byte", "short", "integer", "long"
    )
    idc = F.col("id").cast("long") if integral else F.col("id")
    edges = edges.persist()
    labels = (
        nodes.select(idc).distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    labels.count()
    changed = 0
    for _ in range(max_iter):
        prop = edges.join(labels, edges.a == labels.id).select(
            F.col("b").alias("id"), "component"
        )
        # carry the previous label through the min-combine (tagged with
        # src so only the labels row supplies it): the changed-count can
        # then be read off the checkpointed frame with a metadata-cheap
        # filter+count instead of the old per-round join-with-old-labels
        # job (one fewer shuffle join per round)
        new = (
            labels.select(
                "id", "component", F.col("component").alias("__old")
            )
            .unionByName(prop.select(
                "id", "component", F.lit(None).cast(
                    dict(labels.dtypes)["component"]
                ).alias("__old"),
            ))
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min("__old").alias("__old"),
            )
        )
        if shortcut:
            # pointer jumping: component <- component's own component
            hop = new.select(
                F.col("id").alias("component"), F.col("component").alias("c2")
            )
            new = new.join(hop, "component", "left").select(
                "id", F.coalesce("c2", "component").alias("component"), "__old"
            )
        # localCheckpoint truncates lineage: without it each round's plan
        # embeds every previous round and Catalyst analysis time grows
        # superlinearly with the iteration count
        new = new.localCheckpoint(eager=True)
        changed = new.filter(F.col("component") != F.col("__old")).count()
        labels.unpersist()
        labels = new.select("id", "component")
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # partially-merged labels are silently WRONG component ids — never
        # hand them back as if converged
        raise RuntimeError(
            f"hash_to_min did not converge within max_iter={max_iter} "
            f"({changed} labels still changing); raise max_iter — with "
            "shortcutting, rounds needed grow as log2(component diameter)"
        )
    return labels.select("id", "component")


def connected_cell_components(
    cells: DataFrame,
    diagonal: bool = True,
    max_iter: int = 30,
) -> DataFrame:
    """(cell_id, component): component = min cell_id reachable through
    the adjacency graph."""
    edges = cell_adjacency(cells, diagonal)
    labels = hash_to_min(
        cells.select(F.col("cell_id").cast("long").alias("id")),
        edges.select(F.col("a"), F.col("b")),
        max_iter,
    )
    return labels.select(F.col("id").alias("cell_id"), "component")


# ---------------------------------------------------------------------------
# Pixel-level connected components across tile boundaries
# ---------------------------------------------------------------------------

def _label_tile(mask, diagonal: bool = False):
    """Two-pass run-based union-find labeling of one boolean tile.
    Vectorized run extraction per row; the Python loop is over RUNS (not
    pixels), so a 1024px tile costs O(runs) find/union ops. Returns an
    int32 label image (0 = background, labels 1..n dense)."""
    import numpy as np

    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list = [0]

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    prev_runs: list = []  # (start, end_exclusive, label)
    for r in range(h):
        row = mask[r]
        if not row.any():
            prev_runs = []
            continue
        d = np.diff(row.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if row[0]:
            starts = np.insert(starts, 0, 0)
        if row[-1]:
            ends = np.append(ends, w)
        runs = []
        slack = 1 if diagonal else 0
        for s, e in zip(starts.tolist(), ends.tolist()):
            lab = 0
            for ps, pe, pl in prev_runs:
                # overlap test (8-conn widens the window by one pixel)
                if ps < e + slack and pe > s - slack:
                    if lab == 0:
                        lab = pl
                    else:
                        union(lab, pl)
            if lab == 0:
                parent.append(len(parent))
                lab = len(parent) - 1
            labels[r, s:e] = lab
            runs.append((s, e, lab))
        # merge runs that got unioned via a shared previous-row run
        prev_runs = [(s, e, find(l)) for s, e, l in runs]
        for s, e, l in prev_runs:
            labels[r, s:e] = l
    # resolve + densify
    if len(parent) > 1:
        import numpy as np
        roots = np.array([find(i) for i in range(len(parent))], dtype=np.int32)
        uniq = np.unique(roots[1:])
        dense = np.zeros(len(parent), dtype=np.int32)
        dense[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
        labels = dense[roots[labels]]
    return labels


def pixel_components(
    images: DataFrame,  # (layer, cell_id, bytes, w, h, fmt)
    layer: str,
    in_values: list,
    grid_name: str,
    diagonal: bool = False,
    max_iter: int = 30,
    aoi_df: DataFrame | None = None,
    geom_stats: bool = False,
    perimeter: bool = False,
    value_layer: str | None = None,
) -> DataFrame:
    """Connected components of the pixels whose value is in
    ``in_values``, ACROSS tile boundaries — the distributed form of
    GDAL-style region labeling (alert blobs, burn scars, contiguous loss
    patches). Returns ``(component, n_px, n_cells)`` per global region,
    or per-AOI patch metrics ``(aoi_id, component, n_px, n_cells)`` when
    ``aoi_df`` (aoi_id, geom_wkb) is given: the landscape-ecology
    patch-analysis ask — each AOI's mask clips the value mask before
    labeling, so patches are contiguous WITHIN the AOI.

    Three-stage plan, the canonical split of a raster graph problem:
    1. per-cell kernel: two-pass union-find labels each tile locally and
       emits (a) per-label pixel counts and (b) the four boundary strips
       (edge position -> local label);
    2. relational stitch: strips of grid-adjacent cells join on position
       (±1 when ``diagonal``) producing an equivalence edge list between
       (cell, label) nodes — O(boundary pixels), never O(pixels);
    3. :func:`hash_to_min` merges the equivalence graph; component ids
       are md5-derived 60-bit node hashes (deterministic, order-free).

    Only strips and label counts leave the kernel: shuffle volume is
    O(tile edge) per cell, pixels never cross the wire.

    ``geom_stats=True`` adds per-component GEOMETRY metrics — the
    object-detection half of region labeling: global-pixel bounding box
    (``gx_min/gy_min/gx_max/gy_max``) and the exact-integer centroid
    numerators (``sum_gx``, ``sum_gy``; centroid = sum/n_px, divided
    AFTER the merge so the kernel stays integer-exact). All six are
    associative min/max/sum aggregates, so they merge through the same
    stitch with zero extra shuffle rows — each per-label kernel row just
    carries six more int64 columns.

    ``perimeter=True`` adds ``perim_px``, the 4-boundary perimeter in
    pixel-edge units (the landscape-metrics edge length behind shape
    index / edge density): per label the kernel counts 4*n_px minus 2
    per INTERNAL 4-adjacency — exact within the tile — and each
    CROSS-TILE 4-adjacency (a strict-position strip meet, one row per
    adjacent pixel pair, already O(boundary pixels)) subtracts 2 more
    at merge time. Both pixels of a 4-adjacency are always in the same
    component, so the correction aggregates per component exactly.

    ``value_layer`` adds ``val_sum`` — zonal statistics BY BLOB ("total
    emissions per contiguous loss patch"): the named layer's tiles join
    the mask tiles on cell_id before the kernel, which sums the value
    (cast int64 — integer-coded layers stay exact end to end) over each
    local label's pixels; the partial merges through the stitch like
    every other column. A missing value tile contributes 0 (the
    missing-tile tolerance); per-patch means divide after the merge."""
    import pandas as pd

    from ..functions import codecs

    xb, yb = G._X_BITS, G._Y_BITS
    vals = set(int(v) for v in in_values)
    per_aoi = aoi_df is not None
    aoi_lookup = idx = None
    if per_aoi:
        from ..plans.planner import prepare_aoi_index

        idx = prepare_aoi_index(images.sparkSession, aoi_df, grid_name)
        if idx is None:
            raise ValueError("AOI batch exceeds the broadcastable index bound")
        aoi_lookup = idx.lookup

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            yield _kernel_one(pdf, np)

    def _kernel_one(pdf: "pd.DataFrame", np):
        from . import zonal as _zonal
        from ..functions import geometry as geo

        out_counts = []
        out_strips = []
        grid = G.get_grid(grid_name)
        for r in pdf.itertuples(index=False):
            arr = codecs.decode_tile(bytes(r.bytes), int(r.w), int(r.h), str(r.fmt))
            base = np.isin(arr, list(vals))
            if not base.any():
                continue
            if value_layer is not None and r.vbytes is not None:
                varr = codecs.decode_tile(
                    bytes(r.vbytes), int(r.w), int(r.h), str(r.vfmt)
                ).astype(np.int64)
            else:
                varr = None
            cell = int(r.cell_id)
            if per_aoi:
                entry = aoi_lookup.value.get(cell)
                if entry is None:
                    continue
                x0, y0, ps = G.cell_affine(grid, cell)
                tp = grid.chunk_px
                passes = []
                for aoi_id, wkb in entry[1]:
                    geom, g_edges, _ = _zonal._geom_edges(bytes(wkb))
                    amask = base & geo.rasterize_mask(
                        geom, x0, y0, ps, tp, tp, edges=g_edges
                    )
                    passes.append((aoi_id, amask))
            else:
                passes = [("", base)]
            cx, cy = (int(v) for v in G.cell_to_xy(cell))
            gx0, gy0 = cx * grid.chunk_px, cy * grid.chunk_px
            for aoi_id, mask in passes:
                if not mask.any():
                    continue
                lab = _label_tile(mask, diagonal)
                ys, xs = np.nonzero(lab)
                ls = lab[ys, xs].astype(np.int64)
                nl = int(ls.max()) + 1
                cnt = np.bincount(ls, minlength=nl)
                # the stats scatter-passes are paid ONLY by the features
                # that need them — the plain blob-count path stays lean.
                # Separate zero buffers per stat (aliasing one shared
                # array would let a future in-place scatter corrupt all)
                sgx, sgy, mnx, mny, mxx, mxy, adj, vsum = (
                    np.zeros(nl, np.int64) for _ in range(8)
                )
                if geom_stats:
                    gxs = (gx0 + xs).astype(np.int64)
                    gys = (gy0 + ys).astype(np.int64)
                    np.add.at(sgx, ls, gxs)
                    np.add.at(sgy, ls, gys)
                    big = np.int64(1) << 62
                    mnx = np.full(nl, big); mny = np.full(nl, big)
                    mxx = np.full(nl, -big); mxy = np.full(nl, -big)
                    np.minimum.at(mnx, ls, gxs)
                    np.minimum.at(mny, ls, gys)
                    np.maximum.at(mxx, ls, gxs)
                    np.maximum.at(mxy, ls, gys)
                if perimeter:
                    # internal 4-adjacencies per label (adjacent foreground
                    # pixels are always the same label, under 4- OR 8-conn
                    # labeling, so either endpoint indexes the bincount)
                    adj = np.zeros(nl, np.int64)
                    hp = mask[:, 1:] & mask[:, :-1]
                    np.add.at(adj, lab[:, :-1][hp].astype(np.int64), 1)
                    vp = mask[1:, :] & mask[:-1, :]
                    np.add.at(adj, lab[:-1, :][vp].astype(np.int64), 1)
                if varr is not None:
                    vsum = np.zeros(nl, np.int64)
                    np.add.at(vsum, ls, varr[ys, xs])
                for i in range(1, nl):
                    if cnt[i]:
                        out_counts.append((
                            aoi_id, cell, i, int(cnt[i]),
                            int(sgx[i]), int(sgy[i]),
                            int(mnx[i]), int(mny[i]),
                            int(mxx[i]), int(mxy[i]),
                            int(4 * cnt[i] - 2 * adj[i]) if perimeter else 0,
                            int(vsum[i]),
                        ))
                h, w = lab.shape
                for side, vec, elen in (("N", lab[0, :], w), ("S", lab[-1, :], w),
                                        ("W", lab[:, 0], h), ("E", lab[:, -1], h)):
                    pos = np.flatnonzero(vec)
                    for p in pos.tolist():
                        out_strips.append((aoi_id, cell, side, p, int(vec[p]), elen))
        gcols = ["sgx", "sgy", "mnx", "mny", "mxx", "mxy", "pm", "vs"]
        counts = pd.DataFrame(
            out_counts, columns=["aoi", "cell_id", "label", "n_px"] + gcols
        )
        strips = pd.DataFrame(
            out_strips, columns=["aoi", "cell_id", "side", "pos", "label", "elen"]
        )
        counts["kind"] = 0
        strips["kind"] = 1
        cols = ["kind", "aoi", "cell_id", "label", "v", "side", "pos", "elen"] + gcols
        both = pd.concat([
            counts.rename(columns={"n_px": "v"}).assign(side="", pos=0, elen=0)[cols],
            strips.assign(v=0, **{c: 0 for c in gcols})[cols],
        ], ignore_index=True)
        return both

    try:
        tiles = images.filter(F.col("layer") == layer).select(
            "cell_id", "bytes", "w", "h", "fmt"
        )
        if value_layer is not None:
            vt = images.filter(F.col("layer") == value_layer).select(
                "cell_id", F.col("bytes").alias("vbytes"),
                F.col("fmt").alias("vfmt"),
            )
            tiles = tiles.join(vt, "cell_id", "left")
        else:
            tiles = tiles.withColumn(
                "vbytes", F.lit(None).cast("binary")
            ).withColumn("vfmt", F.lit(None).cast("string"))
        rows = tiles.mapInPandas(
            kernel,
            "kind int, aoi string, cell_id long, label int, v long, "
            "side string, pos int, elen int, sgx long, sgy long, "
            "mnx long, mny long, mxx long, mxy long, pm long, vs long",
        ).persist()

        node = F.conv(
            F.substring(F.md5(F.concat_ws(":", "aoi", "cell_id", "label")), 1, 15), 16, 10
        ).cast("long")
        # counts is tiny (one row per local label); localCheckpoint it so the
        # returned lazy frame does not re-run the decode+label kernel after
        # `rows` is unpersisted below
        counts = rows.filter(F.col("kind") == 0).select(
            "aoi", "cell_id", "label", F.col("v").alias("n_px"), node.alias("id"),
            "sgx", "sgy", "mnx", "mny", "mxx", "mxy", "pm", "vs",
        ).localCheckpoint(eager=True)
        strips = rows.filter(F.col("kind") == 1).select(
            "aoi", "cell_id", "side", "pos", "elen", "label", node.alias("id")
        )

        # adjacency between strips: my E edge meets the W edge of the cell one
        # x-step east (cell_id + (1 << yb)), my S edge meets the N edge of the
        # cell one y-step south (cell_id + 1); positions equal (or ±1 diagonal)
        def meet(side_a, side_b, delta, strict=False):
            a = strips.filter(F.col("side") == side_a).select(
                "aoi",
                (F.col("cell_id") + F.lit(delta)).alias("cell_id"),
                F.col("pos"), F.col("id").alias("ia"),
            )
            b = strips.filter(F.col("side") == side_b).select(
                F.col("aoi").alias("aoi_b"), "cell_id",
                F.col("pos").alias("pos_b"), F.col("id").alias("ib"),
            )
            cond = (a.cell_id == b.cell_id) & (a.aoi == F.col("aoi_b")) & (
                (F.abs(a.pos - F.col("pos_b")) <= 1) if (diagonal and not strict)
                else (a.pos == F.col("pos_b"))
            )
            return a.join(b, cond).select(F.col("ia").alias("a"), F.col("ib").alias("b"))

        e1 = meet("E", "W", 1 << yb)
        e2 = meet("S", "N", 1)
        edges = e1.unionByName(e2)
        if diagonal:
            # four-cells corner: my S-edge END pixel is diagonally adjacent to
            # the N-edge START pixel of the diagonal neighbor (and mirrored)
            def corner(end_a: bool, delta: int):
                a = strips.filter(
                    (F.col("side") == "S")
                    & (F.col("pos") == (F.col("elen") - 1 if end_a else F.lit(0)))
                ).select(
                    "aoi",
                    (F.col("cell_id") + F.lit(delta)).alias("cell_id"),
                    F.col("id").alias("ia"),
                )
                b = strips.filter(
                    (F.col("side") == "N")
                    & (F.col("pos") == (F.lit(0) if end_a else F.col("elen") - 1))
                ).select("aoi", "cell_id", F.col("id").alias("ib"))
                return a.join(b, ["aoi", "cell_id"]).select(
                    F.col("ia").alias("a"), F.col("ib").alias("b")
                )

            edges = edges.unionByName(corner(True, (1 << yb) + 1))   # SE diagonal
            edges = edges.unionByName(corner(False, -(1 << yb) + 1))  # SW diagonal
        edges = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))

        if perimeter:
            # one row per cross-tile 4-adjacent pixel pair (strict
            # position equality even under diagonal labeling: perimeter
            # is always the 4-boundary); -2 attributed via the west/
            # north endpoint's label node
            cross = meet("E", "W", 1 << yb, strict=True).unionByName(
                meet("S", "N", 1, strict=True)
            )
            crossn = cross.groupBy("a").count().select(
                F.col("a").alias("id"), F.col("count").alias("__xadj")
            )
            counts = (
                counts.join(crossn, "id", "left")
                .withColumn(
                    "pm",
                    F.col("pm") - 2 * F.coalesce(F.col("__xadj"), F.lit(0)),
                )
                .drop("__xadj")
                # re-truncate: the join pulled the strips lineage (and with
                # it the decode+label kernel) back under the returned frame,
                # which must stay valid after rows.unpersist()
                .localCheckpoint(eager=True)
            )
        labels = hash_to_min(counts.select("id"), edges, max_iter)
        keys = (["aoi"] if per_aoi else []) + ["component"]
        aggs = [
            F.sum("n_px").alias("n_px"),
            F.countDistinct("cell_id").alias("n_cells"),
            # engine-independent component key (the hash-derived
            # `component` id is not reproducible outside this engine;
            # the minimum member cell is) — lets a DuckDB recursive-CTE
            # twin verify the labeling cross-engine
            F.min("cell_id").alias("min_cell"),
        ]
        if perimeter:
            aggs += [F.sum("pm").alias("perim_px")]
        if value_layer is not None:
            aggs += [F.sum("vs").alias("val_sum")]
        if geom_stats:
            aggs += [
                F.sum("sgx").alias("sum_gx"), F.sum("sgy").alias("sum_gy"),
                F.min("mnx").alias("gx_min"), F.min("mny").alias("gy_min"),
                F.max("mxx").alias("gx_max"), F.max("mxy").alias("gy_max"),
            ]
        out = counts.join(labels, "id").groupBy(*keys).agg(*aggs)
        if per_aoi:
            out = out.withColumnRenamed("aoi", "aoi_id")
        rows.unpersist()
        return out
    finally:
        if idx is not None:
            # every returned frame is localCheckpoint-derived, so the
            # kernel (the only consumer of the broadcast) has already
            # run — release the executor copies now, not at session end
            idx.unpersist()
