"""Tile-level statistics and predicate-pushdown cell pruning.

Parquet scans skip row groups whose min/max footer stats cannot match a
predicate — but the engine's pixel values live INSIDE encoded tile
payloads, invisible to the parquet reader. This module restores that
pruning level for the tiles themselves: a one-time stats collection pass
(min/max/valid-count per tile, the footer-stats analog — Iceberg keeps
the same per-file column bounds in its manifests) and a conservative
cell-pruning rule, so a zonal query with ``WHERE tcd >= 4`` never
decodes a cell whose tcd tile tops out at 3.

At 10^12 images this is the difference between decoding the corpus and
decoding the matching fraction: the reference reads every tile its AOI
touches (reference window.py:62–94 windows the full raster regardless
of values); here the stats table is O(images) tiny rows, lives next to
the corpus (in production: Iceberg column bounds or a stats table
maintained by the ingest job), and one broadcast semi-join applies it.

Soundness rule: a cell may be pruned only if NO pixel in it can satisfy
the predicate — [vmin, vmax] ∩ [lo, hi] = ∅ for tiles with stats, and
0 ∉ [lo, hi] for cells MISSING the layer's tile (the kernel zero-fills
absent layers, sources/catalog.py, so a missing tile evaluates the
predicate at 0). Pruned cells contribute no result rows by construction,
so grouped zonal aggregates are unchanged — pinned by a parity gate
whose oracle does not model pruning at all.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs


def collect_tile_stats(
    images: DataFrame,
    nodata: "dict[str, float] | None" = None,
) -> DataFrame:
    """One Arrow pass over the corpus → (layer, cell_id, vmin, vmax,
    n_valid, n_px) per tile. ``nodata`` maps layer name → its NoData
    value (values equal to it — or NaN for float layers — are excluded
    from the bounds, mirroring the kernel's masking); layers absent
    from the map treat every pixel as valid. Zero shuffle, O(images)
    output; in production this runs once at ingest and appends to a
    stats SnapshotTable alongside the corpus."""
    nodata = dict(nodata or {})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode_tile(
                    bytes(r.bytes), int(r.w), int(r.h), str(r.fmt)
                )
                v = arr.ravel()
                nd = nodata.get(r.layer)
                valid = np.ones(v.shape, dtype=bool)
                if v.dtype.kind == "f":
                    valid &= ~np.isnan(v)
                if nd is not None and not (isinstance(nd, float) and np.isnan(nd)):
                    valid &= v != nd
                vv = v[valid]
                out.append(
                    (
                        r.layer,
                        int(r.cell_id),
                        float(vv.min()) if len(vv) else None,
                        float(vv.max()) if len(vv) else None,
                        int(len(vv)),
                        int(v.size),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["layer", "cell_id", "vmin", "vmax", "n_valid", "n_px"],
            )

    cols = images
    if "layer" not in images.columns or "cell_id" not in images.columns:
        from ..sources.images import with_derived_keys

        cols = with_derived_keys(images)
    return cols.select("layer", "cell_id", "bytes", "w", "h", "fmt").mapInPandas(
        run,
        "layer string, cell_id long, vmin double, vmax double, "
        "n_valid long, n_px long",
    )


def viable_cells(
    stats: DataFrame,
    layer: str,
    lo: "float | None" = None,
    hi: "float | None" = None,
) -> DataFrame:
    """Cell ids that COULD contain a pixel of ``layer`` in [lo, hi]
    (either bound None = unbounded). Conservative and sound:

    - a cell whose ``layer`` tile has stats survives iff
      [vmin, vmax] ∩ [lo, hi] ≠ ∅;
    - a cell that appears in the corpus but has NO ``layer`` tile
      survives iff 0 ∈ [lo, hi] (the kernel zero-fills absent layers);
    - for an IN-set predicate pass lo=min(set), hi=max(set) — wider,
      never narrower, than the true set.

    Returns a 1-column ``cell_id`` frame sized O(cells) — broadcast it
    into a ``left_semi`` join against the corpus (:func:`prune_images`).
    """
    zero_passes = (lo is None or lo <= 0.0) and (hi is None or hi >= 0.0)
    layer_stats = stats.filter(F.col("layer") == layer)
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col("vmax") >= float(lo))
    if hi is not None:
        cond = cond & (F.col("vmin") <= float(hi))
    hit = layer_stats.filter(F.col("n_valid") > 0).filter(cond).select("cell_id")
    if not zero_passes:
        return hit.distinct()
    # zero passes: every corpus cell WITHOUT this layer's tile also
    # survives (plus tiles that are all-NoData: they zero-fill too)
    all_cells = stats.select("cell_id").distinct()
    with_layer = layer_stats.filter(F.col("n_valid") > 0).select("cell_id").distinct()
    missing = all_cells.join(with_layer, "cell_id", "left_anti")
    return hit.distinct().unionByName(missing).distinct()


def prune_images(images: DataFrame, cells: DataFrame) -> DataFrame:
    """Corpus restricted to the viable cells: one broadcast left-semi
    join on cell_id — the scan-side application of the stats, shaped
    exactly like the planner's AOI cell pruning."""
    from ..sources.images import with_derived_keys

    src = images
    if "cell_id" not in images.columns:
        src = with_derived_keys(images)
    pruned = src.join(F.broadcast(cells.select("cell_id")), "cell_id", "left_semi")
    return pruned.select(images.columns)


_FULL = (None, None)  # unbounded interval


def _hull(a, b):
    lo = None if a[0] is None or b[0] is None else min(a[0], b[0])
    hi = None if a[1] is None or b[1] is None else max(a[1], b[1])
    return (lo, hi)


def _intersect(a, b):
    lo = b[0] if a[0] is None else (a[0] if b[0] is None else max(a[0], b[0]))
    hi = b[1] if a[1] is None else (a[1] if b[1] is None else min(a[1], b[1]))
    return (lo, hi)


def filter_interval(filt, layer: str):
    """Conservative value interval for ``layer`` implied by a query
    filter tree (plans/ir.py): every pixel satisfying the tree has its
    ``layer`` value inside the returned [lo, hi] (None = unbounded).
    AND intersects, OR takes the hull, leaves on other layers (and
    ``!=``) are unbounded — always sound, sometimes wider than tight.
    Literals are already raw-encoded in the IR, matching the stats."""
    from ..plans.ir import FilterAnd, FilterLeaf, FilterOr

    if filt is None:
        return _FULL
    if isinstance(filt, FilterLeaf):
        if filt.layer != layer:
            return _FULL
        vs = [float(v) for v in filt.values]
        if filt.op in (">", ">="):
            return (vs[0], None)
        if filt.op in ("<", "<="):
            return (None, vs[0])
        if filt.op == "==":
            return (vs[0], vs[0])
        if filt.op == "in":
            return (min(vs), max(vs))
        return _FULL  # != constrains nothing interval-wise
    if isinstance(filt, FilterAnd):
        out = _FULL
        for c in filt.children:
            out = _intersect(out, filter_interval(c, layer))
        return out
    if isinstance(filt, FilterOr):
        out = None
        for c in filt.children:
            ci = filter_interval(c, layer)
            out = ci if out is None else _hull(out, ci)
        return out or _FULL
    raise TypeError(f"unknown filter node {type(filt)}")


def prune_images_for_query(
    images: DataFrame,
    stats: DataFrame,
    query,
    env,
) -> DataFrame:
    """Automatic stats pruning for a parsed ZonalQuery: derive each
    STORED filter layer's conservative interval from the WHERE tree and
    intersect the viable-cell sets (a cell must be viable for EVERY
    conjunct-constrained layer — each per-layer rule is sound on its
    own, so their intersection is too). Derived layers are skipped
    (their raw bounds do not translate); a query with no prunable
    constraint returns the corpus unchanged. This is the query-level
    form of the parquet row-group skip, applied to tile payloads."""
    from ..plans.ir import FilterAnd, FilterLeaf, FilterOr
    from ..sources.catalog import SourceLayer

    def leaf_layers(f):
        if f is None:
            return set()
        if isinstance(f, FilterLeaf):
            return {f.layer}
        if isinstance(f, (FilterAnd, FilterOr)):
            out = set()
            for c in f.children:
                out |= leaf_layers(c)
            return out
        return set()

    stored = {
        layer.name
        for layer in getattr(env, "layers", [])
        if isinstance(layer, SourceLayer)
    }
    pruned = images
    for lname in sorted(leaf_layers(query.where) & stored):
        lo, hi = filter_interval(query.where, lname)
        if lo is None and hi is None:
            continue
        cells = viable_cells(stats, lname, lo=lo, hi=hi)
        pruned = prune_images(pruned, cells)
    return pruned


def update_tile_stats(
    spark,
    corpus_table,
    stats_table,
    nodata: "dict[str, float] | None" = None,
) -> "int | None":
    """Incremental stats maintenance: compute tile stats ONLY for the
    corpus rows added since the stats table last caught up, and commit
    them to the stats SnapshotTable in one atomic overwrite keyed by the
    corpus snapshot id. The composition that keeps pruning bounds fresh
    as ingest lands: O(new tiles) decode work per run, never a corpus
    rescan.

    Bookkeeping rides the stats table itself: each commit's partition is
    ``src_snap=<corpus snapshot id>``, so the high-water mark is just
    the max partition value — no side state. Returns the new stats
    snapshot id, or None when the corpus has nothing new."""
    from ..sources.images import with_derived_keys

    head = corpus_table.current_snapshot_id()
    if head == 0:
        return None
    done = 0
    if stats_table.current_snapshot_id():
        done = max(
            (
                int(e["partition"].get("src_snap", 0))
                for e in stats_table._resolve()["manifest"]
            ),
            default=0,
        )
    if done >= head:
        return None
    try:
        added = corpus_table.changes(done, head)
    except ValueError:
        return None  # snapshots advanced but no data files added
    stats = collect_tile_stats(with_derived_keys(added), nodata)
    return stats_table.overwrite_partitions(
        stats.withColumn("src_snap", F.lit(str(head)))
    )
