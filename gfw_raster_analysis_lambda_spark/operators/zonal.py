"""The zonal kernel: per-(aoi, cell) vectorized raster statistics.

This is the engine's one custom compute kernel — everything the reference
does per Lambda invocation (reference lambdas/raster_analysis handler ->
DataCube -> QueryExecutor, query_executor.py:23-134) happens here per
``applyInPandas`` group, entirely in numpy:

  decode tiles -> derive layers -> AOI rasterize (P6) -> filter mask
  (P1-P5) -> base/group NoData masks (P7/P8) -> pack group values ->
  unique/bincount partial aggregates (A1-A5)

The output is a *partial* aggregate per (aoi, cell, group-tuple); Spark's
hash aggregation does the final merge (A6) — the two-phase distributed
aggregation the reference hand-rolls with DynamoDB partials
(tiling.py:125-131) is Catalyst's native partial/final here.

Scale notes:
- Group key is (aoi_id, cell_id): skew-free by construction — a giant AOI
  becomes many independent cell tasks, and a hot cell shared by many AOIs
  becomes many independent AOI tasks.
- The kernel pre-aggregates 64k-25M pixels down to a handful of group rows
  before anything hits the shuffle, so shuffle volume is O(groups), not
  O(pixels).
- Arrow batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (tiles per batch) — the per-task memory bound replacing the reference's
  3 GB lambda cap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import codecs, geodesy
from ..functions import geometry as geo
from ..functions import grid as G
from ..functions.expressions import compile_expression, evaluate_multi_calc
from ..plans.ir import Aggregate, FilterAnd, FilterLeaf, FilterOr, ZonalQuery
from ..sources.catalog import (
    AREA_HA,
    FROM_DATA,
    LATITUDE,
    LONGITUDE,
    DataEnvironment,
    DerivedLayer,
    MultiDerivedLayer,
    ReservedLayer,
    SourceLayer,
)

_NP_DTYPES = {
    "uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32,
    "int16": np.int16, "int32": np.int32, "int64": np.int64,
    "float32": np.float32, "float64": np.float64,
}


def _is_nan_nodata(nd) -> bool:
    return nd is not None and isinstance(nd, float) and np.isnan(nd)


def layer_is_float(env: DataEnvironment, name: str) -> bool:
    layer = env.get_layer(name)
    if isinstance(layer, MultiDerivedLayer):
        # a multi-derived layer declares its RESULT dtype (a ratio of int
        # layers is float, so NaN-aware aggregation must apply)
        return layer.dtype.startswith("float")
    src = env.resolve_source(name)
    return src is not None and src.dtype.startswith("float")


# ---------------------------------------------------------------------------
# Partial-aggregate schema (plan-time; must match kernel output exactly)
# ---------------------------------------------------------------------------

def partial_columns(query: ZonalQuery) -> list[tuple[str, str]]:
    """(name, spark_type) pairs of the kernel's output schema.

    isoweek group layers (F1) are *pushed down* into the kernel: the
    partial is keyed by (isoyear, isoweek) instead of the raw date value,
    collapsing ~hundreds of per-tile date groups to ~tens of week groups
    before the shuffle. Semantics-preserving because decode+isoweek is a
    pure per-value function and the reference re-sums after the isoweek
    regroup anyway (reference tiling.py:100-126)."""
    cols: list[tuple[str, str]] = []
    for g in query.group_layers:
        if g in query.isoweek_layers:
            cols.append((f"{g}__isoyear", "long"))
            cols.append((f"{g}__isoweek", "long"))
        else:
            cols.append((g, "double"))
    for a in query.aggregates:
        if a.func not in ("count", "sum", "avg", "min", "max"):
            # percentile/mode/count_distinct are PLAN REWRITES
            # (planner._run_value_rollup_query);
            # they must never reach the partial/kernel machinery, which would
            # silently treat them as sums
            raise ValueError(f"aggregate {a.func!r} has no partial form")
        if a.func == "count":
            cols.append((a.alias, "long"))
        elif a.func == "avg" and not query.compat_avg:
            cols.append((f"{a.alias}__sum", "double"))
            cols.append((f"{a.alias}__cnt", "long"))
        else:  # sum / min / max / compat-avg partial
            cols.append((a.alias, "double"))
    return cols


def partial_schema_ddl(query: ZonalQuery) -> str:
    return ", ".join(f"`{n}` {t}" for n, t in partial_columns(query))


def pixel_schema_ddl(query: ZonalQuery) -> str:
    return ", ".join(f"`{n}` double" for n in query.select_pixels)


# ---------------------------------------------------------------------------
# Kernel construction
# ---------------------------------------------------------------------------

def make_zonal_kernel(query: ZonalQuery, env_json: str, grid_name: str):
    """Build the applyInPandas function for groupBy(aoi_id, cell_id).

    Everything the closure captures is picklable (the env ships as JSON and
    is deserialized once per executor via a module-level cache).
    """
    pixel_mode = bool(query.select_pixels)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        env = _env_cache(env_json)
        grid = G.get_grid(grid_name)
        cell_id = int(pdf["cell_id"].iloc[0])
        geom, g_edges, _ = _geom_edges(bytes(pdf["geom_wkb"].iloc[0]))

        x0, y0, ps = G.cell_affine(grid, cell_id)
        lat_c = float(G.cell_centroid_lat(grid, np.array([cell_id]))[0])
        mean_area = float(geodesy.pixel_area_ha(lat_c, ps))

        tile_px = grid.chunk_px
        values = _decode_and_derive(pdf, env, query.layer_names(), grid, cell_id, mean_area)

        # -- masks (1-D pixel columns, reference ravel semantics) ------------
        mask = np.ravel(geo.rasterize_mask(geom, x0, y0, ps, tile_px, tile_px, edges=g_edges))
        if query.base_layer != FROM_DATA:
            mask &= _data_mask(values[query.base_layer], env.nodata_of(query.base_layer))
        if query.where is not None:
            mask &= _eval_filter(query.where, values)

        if pixel_mode:
            return _select_pixels(query, values, mask, x0, y0, ps)

        # group-layer NoData drop (P8) + NaN drop (A7)
        for gname in query.group_layers:
            arr = values[gname]
            if np.issubdtype(np.asarray(arr).dtype, np.floating):
                mask &= ~np.isnan(arr)
            nd = env.nodata_of(gname)
            if nd is not None and not env.keeps_nodata_groups(gname) and not _is_nan_nodata(nd):
                mask &= arr != nd

        pdf = _aggregate(query, values, mask, mean_area)
        if query.isoweek_layers and query.group_layers and not pdf.empty:
            pdf = _isoweek_pushdown(pdf, query, env)
        return pdf

    return kernel


def _empty_partials(query: ZonalQuery) -> pd.DataFrame:
    out = {"aoi_id": pd.Series(dtype=object)}
    if query.select_pixels:
        for n in query.select_pixels:
            out[n] = pd.Series(dtype="float64")
    else:
        for n, t in _pd_types(query):
            out[n] = pd.Series(dtype=t)
    return pd.DataFrame(out)


def make_cell_kernel(query: ZonalQuery, env_json: str, grid_name: str, aoi_lookup):
    """Per-CELL kernel (groupBy(cell_id) / colocated-scan variant).

    The per-(aoi, cell) kernel decodes a tile once per overlapping AOI and
    ships its bytes through the shuffle once per AOI — quadratic pain on
    hot cells (the reference never hits this because each Lambda fetches
    from S3 by itself; on Spark the shuffle is ours to shape). This kernel
    instead receives each tile ONCE, decodes once, precomputes the
    AOI-independent masks (base NoData P7, filter P1-P5, group NoData P8)
    once, and loops the cell's AOIs — only rasterize (P6) + the masked
    bincount run per AOI.

    ``aoi_lookup`` is a Broadcast of ``{cell_id: (n_salt, [(aoi_id, wkb),
    ...])}``. When the input carries a ``_salt`` column (planner-side skew
    salting duplicated the tile rows), instance (cell, s) processes the
    deterministic slice ``aois[s::n_salt]``; without ``_salt`` it processes
    every AOI of the cell.
    """
    pixel_mode = bool(query.select_pixels)
    # built once per query (driver side): constructing an empty typed frame
    # costs ~1.4 ms in pandas, and sparse corpora return it for most cells
    empty = _empty_partials(query)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        env = _env_cache(env_json)
        grid = G.get_grid(grid_name)
        cell_id = int(pdf["cell_id"].iloc[0])
        entry = aoi_lookup.value.get(cell_id)
        if entry is None:
            return empty.copy()
        n_salt, aois = entry
        if "_salt" in pdf.columns:
            aois = aois[int(pdf["_salt"].iloc[0])::n_salt]
        if not aois:
            return empty.copy()

        x0, y0, ps = G.cell_affine(grid, cell_id)
        lat_c = float(G.cell_centroid_lat(grid, np.array([cell_id]))[0])
        mean_area = float(geodesy.pixel_area_ha(lat_c, ps))
        tile_px = grid.chunk_px
        values = _decode_and_derive(pdf, env, query.layer_names(), grid, cell_id, mean_area)

        # AOI-independent masks, computed once per cell
        static: np.ndarray | None = None
        if query.base_layer != FROM_DATA:
            static = _data_mask(values[query.base_layer], env.nodata_of(query.base_layer))
        if query.where is not None:
            m = _eval_filter(query.where, values)
            static = m if static is None else static & m
        if not pixel_mode:
            for gname in query.group_layers:
                arr = values[gname]
                if np.issubdtype(np.asarray(arr).dtype, np.floating):
                    m = ~np.isnan(arr)
                    static = m if static is None else static & m
                nd = env.nodata_of(gname)
                if nd is not None and not env.keeps_nodata_groups(gname) and not _is_nan_nodata(nd):
                    m = arr != nd
                    static = m if static is None else static & m

        if pixel_mode:
            blocks = []
            for aoi_id, wkb in aois:
                geom, g_edges, _ = _geom_edges(bytes(wkb))
                mask = np.ravel(geo.rasterize_mask(geom, x0, y0, ps, tile_px, tile_px, edges=g_edges))
                if static is not None:
                    mask &= static
                out = _select_pixels(query, values, mask, x0, y0, ps)
                out.insert(0, "aoi_id", aoi_id)
                blocks.append(out)
            return pd.concat(blocks, ignore_index=True)

        # aggregate mode: accumulate numpy per AOI, build ONE frame per cell
        ctx = _CellAggContext(query, values, mean_area, env)
        ids: list = []
        lens: list = []
        cols: dict[str, list] = {}
        # full-cover memo: an AOI fully containing the cell rect has the
        # all-True zonal mask, so its result is the (static-mask-only)
        # per-cell constant — computed once, reused by every such AOI.
        # This is the dominant case at scale (tiles interior to the AOI).
        cell_rect = (x0, y0 - tile_px * ps, x0 + tile_px * ps, y0)
        full_result = None
        for aoi_id, wkb in aois:
            geom, g_edges, g_meta = _geom_edges(bytes(wkb))
            if geo.covers_rect(geom, *cell_rect, edges=g_edges, meta=g_meta):
                if full_result is None:
                    m = static if static is not None else np.ones(tile_px * tile_px, dtype=bool)
                    full_result = ctx.run(m)
                part = full_result
            else:
                mask = np.ravel(geo.rasterize_mask(geom, x0, y0, ps, tile_px, tile_px, edges=g_edges))
                if static is not None:
                    mask &= static
                part = ctx.run(mask)
            n = len(next(iter(part.values()))) if part else 0
            ids.append(aoi_id)
            lens.append(n)
            for k, v in part.items():
                cols.setdefault(k, []).append(v)
        if not cols or sum(lens) == 0:
            return empty.copy()
        nullable = _nullable_minmax_cols(query)
        data = {"aoi_id": np.repeat(np.asarray(ids, dtype=object), lens)}
        for k, parts in cols.items():
            v = np.concatenate(parts)
            data[k] = pd.array(v, dtype="Float64") if k in nullable else v
        pdf_out = pd.DataFrame(data)
        if query.isoweek_layers and query.group_layers and not ctx.emits_iso:
            pdf_out = _isoweek_pushdown(pdf_out, query, env, id_cols=("aoi_id",))
        return pdf_out

    return kernel


_ENV_CACHE: dict[str, DataEnvironment] = {}
_GEOM_CACHE: dict[bytes, tuple] = {}
_GEOM_CACHE_BYTES = 0
_GEOM_CACHE_MAX_BYTES = 256 << 20  # per-executor bound on cached edge arrays


def _geom_edges(wkb: bytes):
    """(geometry, precomputed edge array, cover meta) memoized by WKB
    bytes. An AOI overlaps MANY cells, and the colocated stream runs one
    task over many cells sequentially — parsing the WKB and rebuilding ring
    edges per (aoi, cell) pair was pure rework; likewise the per-edge bbox
    arrays that :func:`geo.covers_rect` needs (the full-cover memo probes
    covers_rect once per (aoi, cell), so its O(E) setup has to be hoisted
    here). Bounded by accumulated BYTES (clear-on-overflow), not entry
    count: the large-vertex AOIs this cache exists for are exactly the ones
    whose edge arrays would blow an entry-count bound (a 1M-vertex AOI
    holds ~32 MB of edges)."""
    global _GEOM_CACHE_BYTES
    hit = _GEOM_CACHE.get(wkb)
    if hit is None:
        geom = geo.wkb_loads(wkb)
        edges = geo.all_edges(geom)
        meta = geo.cover_meta(geom, edges)
        hit = (geom, edges, meta)
        # meta holds 4 float64 arrays of len(edges) -> ~2x the edge bytes
        nbytes = 3 * edges.nbytes + len(wkb)
        if _GEOM_CACHE_BYTES + nbytes > _GEOM_CACHE_MAX_BYTES:
            _GEOM_CACHE.clear()
            _GEOM_CACHE_BYTES = 0
        _GEOM_CACHE[wkb] = hit
        _GEOM_CACHE_BYTES += nbytes
    return hit


def _env_cache(env_json: str) -> DataEnvironment:
    env = _ENV_CACHE.get(env_json)
    if env is None:
        env = DataEnvironment.from_json(env_json)
        _ENV_CACHE[env_json] = env
    return env


def _decode_and_derive(
    pdf: pd.DataFrame, env: DataEnvironment, names: list, grid, cell_id: int,
    mean_area: float
) -> dict[str, np.ndarray]:
    """Decode present tiles, synthesize zeros for missing ones (S2
    missing-tile tolerance, reference window.py:103-119), co-register
    layers stored on a coarser grid onto the target (finest) grid
    (reference query.py:196-210 / window.py:96-101), evaluate derived
    layers, and ravel everything to 1-D pixel columns."""
    tile_px = grid.chunk_px
    has_src = "src_cell_id" in pdf.columns
    present: dict[str, np.ndarray] = {}
    src_cells = pdf["src_cell_id"].to_numpy() if has_src else np.zeros(len(pdf))
    for lval, b, w, h, fmt, src_cell in zip(
        pdf["layer"].to_numpy(), pdf["bytes"].to_numpy(), pdf["w"].to_numpy(),
        pdf["h"].to_numpy(), pdf["fmt"].to_numpy(), src_cells,
    ):
        if lval is None or (isinstance(lval, float) and pd.isna(lval)):
            continue  # left-join null: AOI cell with no tiles at all
        lname = str(lval)
        try:
            arr = codecs.decode_tile(bytes(b), int(w), int(h), str(fmt))
        except Exception:
            if not getattr(env, "skip_corrupt_tiles", False):
                raise
            # opt-in failure isolation (reference: a corrupt tile fails
            # one Lambda, not the request): treat as a missing tile —
            # the S2 zero-fill below applies
            continue
        lgrid_name = getattr(env.get_layer(lname), "grid", None)
        if has_src and lgrid_name and lgrid_name != grid.name:
            arr = G.upsample_to_cell(
                arr, G.get_grid(lgrid_name), grid, int(src_cell), cell_id
            )
        present[lname] = arr

    values: dict[str, np.ndarray] = {}
    for name in names:
        layer = env.get_layer(name)
        if isinstance(layer, ReservedLayer):
            continue  # handled at use sites (area__ha / lat / lon)
        if isinstance(layer, SourceLayer):
            arr = present.get(name)
            if arr is None:
                arr = np.zeros((tile_px, tile_px), dtype=_NP_DTYPES.get(layer.dtype, np.uint8))
            values[name] = np.ravel(arr)
        elif isinstance(layer, DerivedLayer):
            src = present.get(layer.source_layer)
            if src is None:
                src_layer = env.get_layer(layer.source_layer)
                src = np.zeros((tile_px, tile_px), dtype=_NP_DTYPES.get(getattr(src_layer, "dtype", "uint8"), np.uint8))
            values[name] = np.ravel(compile_expression(layer.calc)(src, mean_area))
        elif isinstance(layer, MultiDerivedLayer):
            # map algebra over several co-registered layers: sources bind
            # positionally to A, B, C, ... (missing tiles are zeros, the
            # same S2 semantics as everywhere else)
            arrs = []
            for sname in layer.source_layers:
                a = present.get(sname)
                if a is None:
                    sl = env.get_layer(sname)
                    a = np.zeros(
                        (tile_px, tile_px),
                        dtype=_NP_DTYPES.get(getattr(sl, "dtype", "uint8"), np.uint8),
                    )
                arrs.append(a)
            values[name] = np.ravel(evaluate_multi_calc(layer.calc, arrs, mean_area))
    return values


def _data_mask(arr: np.ndarray, nodata) -> np.ndarray:
    """Non-NoData mask of a layer (NaN-aware; None = everything is data)."""
    if nodata is None:
        return np.ones(arr.shape, dtype=bool)
    if _is_nan_nodata(nodata):
        return ~np.isnan(arr)
    m = arr != nodata
    if np.issubdtype(np.asarray(arr).dtype, np.floating):
        m &= ~np.isnan(arr)
    return m


_IN_LUT_CACHE: dict[tuple, np.ndarray] = {}


def _in_mask(arr: np.ndarray, vals) -> np.ndarray:
    """Set-membership pixel mask. ``np.isin`` sorts/searches per call —
    ~40% of flagship kernel time once IN-expanded meaning filters (P5) hit
    every tile. For <=16-bit integer rasters (the norm: categorical and
    thresholded layers are uint8) a cached boolean LUT over the dtype's
    domain turns the test into one fancy-index gather."""
    a = np.asarray(arr)
    if a.dtype.kind in "ui" and a.dtype.itemsize <= 2:
        info = np.iinfo(a.dtype)
        key = (a.dtype.str, tuple(vals))
        hit = _IN_LUT_CACHE.get(key)
        if hit is None:
            if len(_IN_LUT_CACHE) >= 256:  # long-lived executor hygiene
                _IN_LUT_CACHE.clear()
            v = np.asarray(vals, dtype=np.float64)
            v = np.unique(v[(v >= info.min) & (v <= info.max) & (v == np.floor(v))])
            iv = v.astype(np.int64)
            if len(iv) and len(iv) == iv[-1] - iv[0] + 1:
                # contiguous raw-code range (the usual shape of a >=/<
                # meaning filter after IN expansion): two compares beat a
                # 64k-gather ~10x
                hit = ("range", int(iv[0]), int(iv[-1]))
            else:
                lut = np.zeros(int(info.max) - int(info.min) + 1, dtype=bool)
                lut[iv - int(info.min)] = True
                hit = ("lut", lut, int(info.min))
            _IN_LUT_CACHE[key] = hit
        if hit[0] == "range":
            return (a >= hit[1]) & (a <= hit[2])
        lut, lo = hit[1], hit[2]
        if lo == 0:
            return lut[a]
        return lut[a.astype(np.int32) - lo]
    return np.isin(a, np.asarray(vals))


def _eval_filter(node, values: dict[str, np.ndarray]) -> np.ndarray:
    """Filter tree -> boolean pixel mask (P1-P5). Literals are already in
    raw pixel space (encoded at plan time)."""
    if isinstance(node, FilterLeaf):
        arr = values[node.layer]
        if node.op == "in":
            return _in_mask(arr, node.values)
        v = node.values[0]
        ops = {
            ">": np.greater, "<": np.less, ">=": np.greater_equal,
            "<=": np.less_equal, "==": np.equal, "!=": np.not_equal,
        }
        return ops[node.op](arr, v)
    if isinstance(node, FilterAnd):
        out = _eval_filter(node.children[0], values)
        for c in node.children[1:]:
            out = out & _eval_filter(c, values)
        return out
    if isinstance(node, FilterOr):
        out = _eval_filter(node.children[0], values)
        for c in node.children[1:]:
            out = out | _eval_filter(c, values)
        return out
    raise TypeError(f"unknown filter node {type(node)}")


def _select_pixels(query: ZonalQuery, values, mask, x0, y0, ps) -> pd.DataFrame:
    """Pixel-row extraction (reference `_select`, query_executor.py:175-198):
    lat/lon from the affine + raw layer values for unmasked pixels."""
    idx = np.flatnonzero(mask)
    tile_px = int(np.sqrt(mask.size))
    rows, cols = np.divmod(idx, tile_px)
    out = {}
    for name in query.select_pixels:
        if name == LATITUDE:
            out[name] = y0 - (rows + 0.5) * ps
        elif name == LONGITUDE:
            out[name] = x0 + (cols + 0.5) * ps
        elif name == AREA_HA:
            out[name] = np.full(len(idx), geodesy.pixel_area_ha(y0 - ps / 2, ps))
        else:
            out[name] = np.asarray(values[name], dtype=np.float64)[idx]
    return pd.DataFrame(out, dtype=np.float64)


def _aggregate(query: ZonalQuery, values, mask, mean_area: float) -> pd.DataFrame:
    """Masked (grouped) partial aggregation — the reference's
    ravel_multi_index/unique/bincount hash aggregate (A1-A5,
    query_executor.py:52-134), emitted as partial rows."""
    masked_idx = np.flatnonzero(mask)
    n_masked = len(masked_idx)
    out: dict[str, np.ndarray] = {}

    if query.group_layers:
        if n_masked == 0:
            return pd.DataFrame({n: pd.Series(dtype=t) for n, t in _pd_types(query)})
        cols = [np.asarray(values[g])[masked_idx] for g in query.group_layers]
        uniq_cols, inverse, ngroups = _group_key_inverse(cols)
        for k, g in enumerate(query.group_layers):
            out[g] = uniq_cols[k]
    else:
        ngroups = 1
        inverse = np.zeros(n_masked, dtype=np.int64)

    for a in query.aggregates:
        _one_aggregate(a, query, values, masked_idx, inverse, ngroups, mean_area, n_masked, out)

    pdf = pd.DataFrame(out)
    # drop all-zero rows only in the ungrouped empty case
    if not query.group_layers and n_masked == 0:
        return pdf  # single zero row is the correct ungrouped result
    return pdf


def _group_key_inverse(cols: list[np.ndarray]):
    """(unique group tuples, inverse index, ngroups) for the masked group
    columns — the reference's dictionary-encoded hash aggregate
    (ravel_multi_index + unique, query_executor.py:52-98), done O(n):
    integer-valued columns are offset-packed into one int64 key and
    histogrammed with ``bincount`` + a lookup table (no sort at all).
    Float-valued or huge-domain keys fall back to lexicographic
    ``np.unique``."""
    ints: list[np.ndarray] | None = []
    for c in cols:
        if c.dtype.kind in "uib":
            ints.append(c.astype(np.int64))
        else:
            f = np.asarray(c, dtype=np.float64)
            if np.all(np.isfinite(f)) and np.array_equal(f, np.floor(f)):
                ints.append(f.astype(np.int64))
            else:
                ints = None
                break
    if ints is not None:
        mins = [int(c.min()) for c in ints]
        dims = [int(c.max()) - m + 1 for c, m in zip(ints, mins)]
        total = 1
        for d in dims:
            total *= d
        if total <= 1 << 24:  # bincount table stays small (16M slots max)
            packed = ints[0] - mins[0]
            for c, m, d in zip(ints[1:], mins[1:], dims[1:]):
                packed = packed * d + (c - m)
            counts = np.bincount(packed, minlength=total)
            uniq_packed = np.flatnonzero(counts)
            lut = np.empty(total, dtype=np.int64)
            lut[uniq_packed] = np.arange(len(uniq_packed))
            inverse = lut[packed]
            uniq_cols: list[np.ndarray] = []
            rem = uniq_packed
            for m, d in zip(reversed(mins), reversed(dims)):
                uniq_cols.append((rem % d + m).astype(np.float64))
                rem = rem // d
            uniq_cols.reverse()
            return uniq_cols, inverse, len(uniq_packed)
    key = np.stack([np.asarray(c, dtype=np.float64) for c in cols], axis=1)
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)
    return [uniq[:, k] for k in range(uniq.shape[1])], inverse, len(uniq)


def _one_aggregate(
    a: Aggregate, query, values, masked_idx, inverse, ngroups, mean_area, n_masked, out
):
    if a.func == "count":
        out[a.alias] = np.bincount(inverse, minlength=ngroups).astype(np.int64)
        return
    if a.layer == AREA_HA:
        counts = np.bincount(inverse, minlength=ngroups)
        if a.func == "sum":
            out[a.alias] = counts * mean_area
        elif a.func == "avg":
            if query.compat_avg:
                out[a.alias] = counts * mean_area / max(n_masked, 1)
            else:
                out[f"{a.alias}__sum"] = counts * mean_area
                out[f"{a.alias}__cnt"] = counts.astype(np.int64)
        return
    src = np.asarray(values[a.layer])
    if src.dtype.kind == "f":
        data = src[masked_idx].astype(np.float64, copy=False)
        finite = ~np.isnan(data)  # NaN exclusion inside aggregation (A7)
        d, inv = data[finite], inverse[finite]
    else:  # integer layers can't hold NaN — skip two full-array passes
        d, inv = src[masked_idx].astype(np.float64, copy=False), inverse
    if a.func == "sum":
        out[a.alias] = np.bincount(inv, weights=d, minlength=ngroups)
    elif a.func == "avg":
        sums = np.bincount(inv, weights=d, minlength=ngroups)
        if query.compat_avg:
            # reference quirk (A3): divide by the tile's total masked count
            out[a.alias] = sums / max(n_masked, 1)
        else:
            out[f"{a.alias}__sum"] = sums
            out[f"{a.alias}__cnt"] = np.bincount(inv, minlength=ngroups).astype(np.int64)
    elif a.func == "min":
        acc = np.full(ngroups, np.inf)
        np.minimum.at(acc, inv, d)
        # emit nulls (not NaN) for empty groups: Spark treats NaN as the
        # greatest double, which would poison the final F.max/F.min merge
        out[a.alias] = pd.array(np.where(np.isfinite(acc), acc, np.nan), dtype="Float64")
    elif a.func == "max":
        acc = np.full(ngroups, -np.inf)
        np.maximum.at(acc, inv, d)
        out[a.alias] = pd.array(np.where(np.isfinite(acc), acc, np.nan), dtype="Float64")
    else:
        raise ValueError(f"unsupported aggregate {a.func}")


def _pd_types(query: ZonalQuery):
    for n, t in partial_columns(query):
        yield n, ("int64" if t == "long" else "float64")


class _CellAggContext:
    """Per-cell precomputation for the cell kernel's AOI loop.

    Group keys are offset-packed into one int64 per pixel ONCE per cell
    (same dictionary-encoding as _group_key_inverse) and aggregate inputs
    are float64-converted once, so the per-AOI work collapses to
    ``flatnonzero(mask)`` + ``bincount``(s) — no per-AOI unique/LUT, no
    per-AOI dtype conversions, no per-AOI pandas objects.

    isoweek group layers (F1) are folded into the PIXEL key here (decode
    the tile's unique raw dates once, broadcast (isoyear, isoweek) back to
    pixels): the bincount then groups by week directly, the group domain
    shrinks from O(distinct dates) to O(distinct weeks), and the per-cell
    ``_isoweek_pushdown`` regroup disappears from the hot path entirely —
    it was ~half the kernel's wall time on alert-date queries."""

    def __init__(self, query: ZonalQuery, values: dict, mean_area: float,
                 env: DataEnvironment | None = None):
        self.query = query
        self.values = values
        self.mean_area = mean_area
        self.fast = False
        self.emits_iso = False
        q = query
        self.data: dict[str, np.ndarray] = {}
        for a in q.aggregates:
            if a.func != "count" and a.layer is not None and a.layer != AREA_HA:
                d = np.asarray(values[a.layer])
                if d.dtype.kind == "f" and np.isnan(d).any():
                    return  # NaN exclusion differs per group -> generic path
                self.data[a.layer] = d.astype(np.float64)
        if not q.group_layers:
            self.fast = True
            return
        ints: list[np.ndarray] = []
        names: list[str] = []
        iso_names: set = set()
        for g in q.group_layers:
            c = np.asarray(values[g])
            as_int = None
            if c.dtype.kind in "uib":
                as_int = c.astype(np.int64)
            else:
                f = c.astype(np.float64)
                if np.all(np.isfinite(f)) and np.array_equal(f, np.floor(f)):
                    as_int = f.astype(np.int64)
                else:
                    return  # non-integer group values -> generic path
            if g in q.isoweek_layers and env is not None:
                iy, iw = _iso_year_week_of_raw(as_int, env.get_layer(g))
                ints.append(iy)
                names.append(f"{g}__isoyear")
                ints.append(iw)
                names.append(f"{g}__isoweek")
                iso_names.update(names[-2:])
            else:
                ints.append(as_int)
                names.append(g)
        self.out_group_names = names
        self.iso_out_names = iso_names
        # emits_iso only flips once the fast path is certain — a later
        # bail-out (domain overflow) must leave the generic+pushdown flow
        mins = [int(c.min()) for c in ints]
        dims = [int(c.max()) - m + 1 for c, m in zip(ints, mins)]
        total = 1
        for d in dims:
            total *= d
        if total > (1 << 20):  # keep the per-AOI bincount table <= 8 MB
            return
        packed = ints[0] - mins[0]
        for c, m, d in zip(ints[1:], mins[1:], dims[1:]):
            packed = packed * d + (c - m)
        # smallest dtype that fits: the per-AOI gather traffic scales with
        # the packed array's width (uint8 vs int64 = 8x less memory moved)
        for dt in (np.uint8, np.uint16, np.uint32):
            if total <= np.iinfo(dt).max + 1:
                packed = packed.astype(dt)
                break
        self.packed, self.mins, self.dims, self.total = packed, mins, dims, total
        self.fast = True
        self.emits_iso = bool(self.iso_out_names)

    def run(self, mask: np.ndarray) -> dict[str, np.ndarray]:
        """Partial aggregate columns (raw group names) for one AOI mask."""
        q = self.query
        if not self.fast:
            if q.group_layers and not mask.any():
                # normalize the empty result to RAW group-layer names: the
                # generic _aggregate would emit plan-schema names (e.g. the
                # g__isoyear/g__isoweek pushdown pair) here, which must not
                # mix with the raw names nonzero AOIs of the same cell emit
                # (the per-cell frame is assembled column-wise; mixed keys
                # crash pd.DataFrame with unequal column lengths)
                out: dict[str, np.ndarray] = {}
                for g in q.group_layers:
                    out[g] = np.empty(0, dtype=np.float64)
                for a in q.aggregates:
                    for n in _agg_partial_names(a, q):
                        is_long = a.func == "count" or n.endswith("__cnt")
                        out[n] = np.empty(0, dtype=np.int64 if is_long else np.float64)
                return out
            pdf = _aggregate(q, self.values, mask, self.mean_area)
            return {
                c: (
                    pdf[c].to_numpy(dtype="float64", na_value=np.nan)
                    if str(pdf[c].dtype) == "Float64"
                    else pdf[c].to_numpy()
                )
                for c in pdf.columns
            }
        idx = np.flatnonzero(mask)
        n_masked = len(idx)
        out: dict[str, np.ndarray] = {}

        if q.group_layers:
            if n_masked == 0:
                for g in self.out_group_names:
                    is_iso = g in self.iso_out_names
                    out[g] = np.empty(0, dtype=np.int64 if is_iso else np.float64)
                for a in q.aggregates:
                    for n in _agg_partial_names(a, q):
                        is_long = a.func == "count" or n.endswith("__cnt")
                        out[n] = np.empty(0, dtype=np.int64 if is_long else np.float64)
                return out
            pk = self.packed[idx]
            counts = np.bincount(pk, minlength=self.total)
            nz = np.flatnonzero(counts)
            counts_nz = counts[nz]
            rem = nz
            ucols: list[np.ndarray] = []
            for m, d in zip(reversed(self.mins), reversed(self.dims)):
                ucols.append(rem % d + m)
                rem = rem // d
            ucols.reverse()
            for k, g in enumerate(self.out_group_names):
                c = ucols[k]
                out[g] = c if g in self.iso_out_names else c.astype(np.float64)
        else:
            pk = None
            nz = np.array([0])
            counts_nz = np.array([n_masked])

        for a in q.aggregates:
            if a.func == "count":
                out[a.alias] = counts_nz.astype(np.int64)
                continue
            if a.layer == AREA_HA:
                if a.func == "sum":
                    out[a.alias] = counts_nz * self.mean_area
                elif a.func == "avg":
                    if q.compat_avg:
                        out[a.alias] = counts_nz * self.mean_area / max(n_masked, 1)
                    else:
                        out[f"{a.alias}__sum"] = counts_nz * self.mean_area
                        out[f"{a.alias}__cnt"] = counts_nz.astype(np.int64)
                continue
            d = self.data[a.layer][idx]
            if q.group_layers:
                if a.func in ("sum", "avg"):
                    sums = np.bincount(pk, weights=d, minlength=self.total)[nz]
                if a.func == "sum":
                    out[a.alias] = sums
                elif a.func == "avg":
                    if q.compat_avg:
                        out[a.alias] = sums / max(n_masked, 1)
                    else:
                        out[f"{a.alias}__sum"] = sums
                        out[f"{a.alias}__cnt"] = counts_nz.astype(np.int64)
                elif a.func == "min":
                    acc = np.full(self.total, np.inf)
                    np.minimum.at(acc, pk, d)
                    out[a.alias] = np.where(np.isfinite(acc[nz]), acc[nz], np.nan)
                elif a.func == "max":
                    acc = np.full(self.total, -np.inf)
                    np.maximum.at(acc, pk, d)
                    out[a.alias] = np.where(np.isfinite(acc[nz]), acc[nz], np.nan)
            else:
                if a.func == "sum":
                    out[a.alias] = np.array([d.sum()])
                elif a.func == "avg":
                    if q.compat_avg:
                        out[a.alias] = np.array([d.sum() / max(n_masked, 1)])
                    else:
                        out[f"{a.alias}__sum"] = np.array([d.sum()])
                        out[f"{a.alias}__cnt"] = np.array([n_masked], dtype=np.int64)
                elif a.func == "min":
                    out[a.alias] = np.array([d.min() if n_masked else np.nan])
                elif a.func == "max":
                    out[a.alias] = np.array([d.max() if n_masked else np.nan])
        return out


def _agg_partial_names(a: Aggregate, q: ZonalQuery) -> list[str]:
    if a.func == "avg" and not q.compat_avg:
        return [f"{a.alias}__sum", f"{a.alias}__cnt"]
    return [a.alias]


def _nullable_minmax_cols(q: ZonalQuery) -> set:
    return {a.alias for a in q.aggregates if a.func in ("min", "max")}


def _iso_of_values(vals: np.ndarray, decode_src) -> tuple[np.ndarray, np.ndarray]:
    """ISO-8601 (year, week) of raw int64 values after date decode. ISO
    math in pure numpy: classify each date by the Thursday of its week
    (1970-01-01 was a Thursday -> Mon=0 weekday is ``(d + 3) % 7``); the
    week number is that Thursday's ordinal within its year."""
    if decode_src:
        decoded = np.asarray(compile_expression(decode_src)(vals))
        days = decoded.astype("datetime64[D]").astype(np.int64)
    else:  # raw values are days since 1970-01-01
        days = vals
    thu = days + 3 - (days + 3) % 7
    years = thu.astype("datetime64[D]").astype("datetime64[Y]")
    iso_year = years.astype(np.int64) + 1970
    iso_week = (thu - years.astype("datetime64[D]").astype(np.int64)) // 7 + 1
    return iso_year, iso_week


_ISO_LUT_CACHE: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _iso_year_week_of_raw(raw: np.ndarray, layer) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ISO-8601 (year, week) of RAW group values. Raster date
    codes live in a small non-negative integer domain (uint16 day-offsets),
    so the per-pixel path is two gathers through a cached decode LUT over
    ``0..max`` — no 65k-element sort per tile (np.unique's argsort was the
    kernel's top cost on alert-date queries). Values outside the LUT-able
    domain fall back to unique+inverse. Shared by the per-pixel fast path
    (_CellAggContext) and the per-group pushdown (_isoweek_pushdown)."""
    raw = np.asarray(raw)
    decode_src = getattr(layer, "decode_expression", None)
    if raw.size and raw.dtype.kind in "ui":
        rmin, rmax = int(raw.min()), int(raw.max())
        if rmin >= 0 and rmax <= (1 << 20):
            key = decode_src or "__days__"
            lut = _ISO_LUT_CACHE.get(key)
            if lut is None or len(lut[0]) <= rmax:
                if len(_ISO_LUT_CACHE) >= 64:  # long-lived executor hygiene
                    _ISO_LUT_CACHE.clear()
                dom = np.arange(max(rmax, 4095) + 1, dtype=np.int64)
                _ISO_LUT_CACHE[key] = lut = _iso_of_values(dom, decode_src)
            a = raw.astype(np.int64) if raw.dtype != np.int64 else raw
            return lut[0][a], lut[1][a]
    uniq, inv = np.unique(raw, return_inverse=True)
    iy, iw = _iso_of_values(uniq.astype(np.int64), decode_src)
    return iy[inv], iw[inv]


def _isoweek_pushdown(pdf: pd.DataFrame, query: ZonalQuery, env, id_cols: tuple = ()) -> pd.DataFrame:
    """isoweek(date_layer) applied to the per-tile partial (F1, pushed
    down): decode the raw group values (a few hundred uniques at most),
    convert to ISO (year, week), and re-aggregate within the tile. The
    reference runs this decode+regroup once at the coordinator over the
    merged result (tiling.py:100-126); doing it per tile is equivalent —
    decode is a pure per-value function and the coordinator re-*sums* —
    and shrinks the shuffle from O(distinct dates) to O(distinct weeks)
    rows per tile."""
    new_groups: list[str] = list(id_cols)
    for g in query.group_layers:
        if g not in query.isoweek_layers:
            new_groups.append(g)
            continue
        raw = pdf[g].to_numpy().astype(np.int64)
        iso_year, iso_week = _iso_year_week_of_raw(raw, env.get_layer(g))
        idx = pdf.columns.get_loc(g)
        pdf = pdf.drop(columns=[g])
        pdf.insert(idx, f"{g}__isoweek", iso_week)
        pdf.insert(idx, f"{g}__isoyear", iso_year)
        new_groups += [f"{g}__isoyear", f"{g}__isoweek"]
    aggmap: dict[str, str] = {}
    for a in query.aggregates:
        if a.func in ("count", "sum") or (a.func == "avg" and query.compat_avg):
            aggmap[a.alias] = "sum"
        elif a.func == "avg":
            aggmap[f"{a.alias}__sum"] = "sum"
            aggmap[f"{a.alias}__cnt"] = "sum"
        else:  # min / max
            aggmap[a.alias] = a.func
    return _regroup(pdf, new_groups, aggmap)


def _regroup(pdf: pd.DataFrame, group_cols: list, aggmap: dict) -> pd.DataFrame:
    """Vectorized replacement for ``pdf.groupby(group_cols).agg(aggmap)``
    in the per-cell hot path: factorize each key column, offset-pack into
    one int64, and bincount/fmin/fmax per aggregate. The pandas groupby
    machinery costs ~10 ms per call regardless of size — half the cell
    kernel's wall time on isoweek queries; this is ~10x cheaper on the
    small frames the kernel emits. Falls back to pandas if the packed key
    domain would overflow int64. NaN semantics match pandas (fmin/fmax
    skip NaN; all-NaN groups stay NaN -> NA for nullable columns)."""
    n = len(pdf)
    if n == 0:
        return pdf.groupby(group_cols, as_index=False).agg(aggmap)
    packed = np.zeros(n, dtype=np.int64)
    for c in group_cols:
        # use_na_sentinel=False: a NaN key becomes its own group code
        # instead of -1 (the sentinel would collide with the previous
        # group's last code under offset packing). The kernel masks NaN
        # group pixels out long before this point, so the branch is
        # defensive, but a collision would silently merge groups.
        codes, uniques = pd.factorize(
            pdf[c].to_numpy(), sort=False, use_na_sentinel=False
        )
        if len(uniques) and packed.max() > (1 << 62) // len(uniques):
            return pdf.groupby(group_cols, as_index=False).agg(aggmap)
        packed = packed * max(len(uniques), 1) + codes
    uniq, first_idx, inv = np.unique(packed, return_index=True, return_inverse=True)
    out: dict[str, np.ndarray] = {}
    for c in group_cols:
        out[c] = pdf[c].to_numpy()[first_idx]
    ngroups = len(uniq)
    for c, how in aggmap.items():
        col = pdf[c]
        nullable = str(col.dtype) == "Float64"
        v = (
            col.to_numpy(dtype="float64", na_value=np.nan)
            if nullable
            else col.to_numpy()
        )
        if how == "sum":
            # skip-NaN like pandas sum (partial sums are NaN-free by
            # construction, but the fallback path would skip, so match it)
            w = v.astype(np.float64)
            if w.dtype.kind == "f" and np.isnan(w).any():
                w = np.nan_to_num(w)
            acc = np.bincount(inv, weights=w, minlength=ngroups)
            if v.dtype.kind in "iu":
                acc = acc.astype(np.int64)  # counts stay integral (< 2^53)
        elif how == "min":
            acc = np.full(ngroups, np.nan)
            np.fmin.at(acc, inv, v.astype(np.float64))
        elif how == "max":
            acc = np.full(ngroups, np.nan)
            np.fmax.at(acc, inv, v.astype(np.float64))
        else:
            return pdf.groupby(group_cols, as_index=False).agg(aggmap)
        out[c] = pd.array(acc, dtype="Float64") if nullable else acc
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Fused multi-query cell kernel (batch request shape: one AOI list, many
# analyses — the reference runs its query set serially per request;
# fusing shares the scan, decode, and per-(aoi, cell) rasterize across
# every query in the set)
# ---------------------------------------------------------------------------

def multi_partial_columns(queries: list) -> list[tuple[str, str]]:
    """NARROW tagged-union schema: ``_q`` selects the query and ``vals``
    packs exactly that query's partial values (``partial_columns(q)``
    order) as one array<double>. A row carries only its own query's
    values — the earlier all-queries-wide flat frame stored width =
    sum(all queries' widths) nulls per row, and caching that width
    measurably cost back part of the fusion win. Long partials are
    integral doubles (< 2^53 per tile by construction) cast back at
    split time; empty-group min/max NULLs survive as array-element
    nulls (never coerced to NaN)."""
    return [("_q", "int"), ("vals", "array<double>")]


def multi_partial_schema_ddl(queries: list) -> str:
    return ", ".join(f"`{n}` {t}" for n, t in multi_partial_columns(queries))


def make_multi_cell_kernel(queries: list, env_json: str, grid_name: str, aoi_lookup):
    """Per-cell kernel evaluating EVERY query of a batch in one pass:
    decode once, rasterize each AOI once, then run each query's
    aggregation context against the shared masks. Aggregate-mode queries
    only (no select_pixels)."""
    if any(q.select_pixels for q in queries):
        raise ValueError("fused execution supports aggregate queries only")
    union_names: list = []
    for q in queries:
        for n in q.layer_names():
            if n not in union_names:
                union_names.append(n)
    def empty_frame() -> pd.DataFrame:
        return pd.DataFrame({
            "aoi_id": pd.Series(dtype=object),
            "_q": pd.Series(dtype="int32"),
            "vals": pd.Series(dtype=object),
        })

    empty = empty_frame()

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        env = _env_cache(env_json)
        grid = G.get_grid(grid_name)
        cell_id = int(pdf["cell_id"].iloc[0])
        entry = aoi_lookup.value.get(cell_id)
        if entry is None:
            return empty.copy()
        n_salt, aois = entry
        if "_salt" in pdf.columns:
            aois = aois[int(pdf["_salt"].iloc[0])::n_salt]
        if not aois:
            return empty.copy()

        x0, y0, ps = G.cell_affine(grid, cell_id)
        lat_c = float(G.cell_centroid_lat(grid, np.array([cell_id]))[0])
        mean_area = float(geodesy.pixel_area_ha(lat_c, ps))
        tile_px = grid.chunk_px
        # the fused scan reads the UNION of all queries' layers, so a cell
        # may hold none of query q's own source layers. Serial execution
        # filters q's scan to q's layers and never visits such a cell —
        # match that exactly: q runs on a cell only when at least one of
        # its source layers is present (FROM_DATA queries always run; the
        # missing-cell union exists for them). Without this, q would see
        # zero-synthesized tiles here and emit rows the serial plan never
        # produces (fake full-count rows for no_data=None base layers).
        present_layers = set(pdf["layer"].dropna().astype(str))
        q_sources = [set(env.source_layer_names(q.layer_names())) for q in queries]
        values = _decode_and_derive(pdf, env, union_names, grid, cell_id, mean_area)

        per_query = []
        for qi, q in enumerate(queries):
            if q.base_layer != FROM_DATA and not (q_sources[qi] & present_layers):
                per_query.append(None)
                continue
            static: np.ndarray | None = None
            if q.base_layer != FROM_DATA:
                static = _data_mask(values[q.base_layer], env.nodata_of(q.base_layer))
            if q.where is not None:
                m = _eval_filter(q.where, values)
                static = m if static is None else static & m
            for gname in q.group_layers:
                arr = values[gname]
                if np.issubdtype(np.asarray(arr).dtype, np.floating):
                    m = ~np.isnan(arr)
                    static = m if static is None else static & m
                nd = env.nodata_of(gname)
                if nd is not None and not env.keeps_nodata_groups(gname) and not _is_nan_nodata(nd):
                    m = arr != nd
                    static = m if static is None else static & m
            per_query.append((static, _CellAggContext(q, values, mean_area, env)))

        nq = len(queries)
        ids: list[list] = [[] for _ in range(nq)]
        lens: list[list] = [[] for _ in range(nq)]
        cols: list[dict] = [{} for _ in range(nq)]
        full_results: list = [None] * nq
        cell_rect = (x0, y0 - tile_px * ps, x0 + tile_px * ps, y0)
        for aoi_id, wkb in aois:
            geom, g_edges, g_meta = _geom_edges(bytes(wkb))
            covered = geo.covers_rect(geom, *cell_rect, edges=g_edges, meta=g_meta)
            amask = None
            if not covered:
                # rasterized ONCE per (aoi, cell), shared by every query
                amask = np.ravel(
                    geo.rasterize_mask(geom, x0, y0, ps, tile_px, tile_px, edges=g_edges)
                )
            for qi in range(nq):
                if per_query[qi] is None:
                    continue
                static, ctx = per_query[qi]
                if covered:
                    if full_results[qi] is None:
                        m = static if static is not None else np.ones(tile_px * tile_px, dtype=bool)
                        full_results[qi] = ctx.run(m)
                    part = full_results[qi]
                else:
                    m = (amask & static) if static is not None else amask
                    part = ctx.run(m)
                n = len(next(iter(part.values()))) if part else 0
                ids[qi].append(aoi_id)
                lens[qi].append(n)
                for k, v in part.items():
                    cols[qi].setdefault(k, []).append(v)

        blocks: list[pd.DataFrame] = []
        for qi, q in enumerate(queries):
            if per_query[qi] is None or not cols[qi] or sum(lens[qi]) == 0:
                continue
            _, ctx = per_query[qi]
            nullable = _nullable_minmax_cols(q)
            data = {"aoi_id": np.repeat(np.asarray(ids[qi], dtype=object), lens[qi])}
            for k, parts in cols[qi].items():
                v = np.concatenate(parts)
                data[k] = pd.array(v, dtype="Float64") if k in nullable else v
            block = pd.DataFrame(data)
            if q.isoweek_layers and q.group_layers and not ctx.emits_iso:
                block = _isoweek_pushdown(block, q, env, id_cols=("aoi_id",))
            # pack this query's partial values (partial_columns order) into
            # ONE array<double> per row — the persisted fused frame carries
            # only the owning query's width, not every query's. None (not
            # NaN) preserves empty-group min/max NULLs across the packing.
            pc = [n for n, _ in partial_columns(q)]
            obj = block[pc].astype(object)
            packed = obj.where(pd.notna(obj), None).to_numpy().tolist()
            blocks.append(pd.DataFrame({
                "aoi_id": block["aoi_id"].to_numpy(),
                "_q": np.int32(qi),
                "vals": packed,
            }))
        if not blocks:
            return empty.copy()
        return pd.concat([empty] + blocks, ignore_index=True)

    return kernel
