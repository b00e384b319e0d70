"""Single-process numpy oracle.

Recomputes any ZonalQuery over the fixture corpus without Spark: enumerate
cells per AOI, regenerate tile pixels straight from the fixture formulas
(bypassing the codecs), mask, group, aggregate, decode — one flat pass in
plain numpy/pandas. This is the independent implementation the e2e tests
diff Spark against (FIXTURES.md section 4; the reference's own tests use
offline-computed golden values the same way).

Shares only the leaf kernels (rasterize_mask, pixel_area_ha, grid math)
with the engine; the dataflow (join, masking order, grouping, partial
merge) is re-derived independently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .functions import geodesy
from .functions import geometry as geo
from .functions import grid as G
from .functions.expressions import compile_expression, evaluate_multi_calc
from .operators.zonal import layer_is_float as zonal_layer_is_float
from .plans.ir import FilterAnd, FilterLeaf, FilterOr, ZonalQuery
from .sources import fixtures
from .sources.catalog import (
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


def _filter_mask(node, values):
    if isinstance(node, FilterLeaf):
        arr = values[node.layer]
        if node.op == "in":
            return np.isin(arr, np.asarray(node.values))
        v = node.values[0]
        return {
            ">": arr > v, "<": arr < v, ">=": arr >= v,
            "<=": arr <= v, "==": arr == v, "!=": arr != v,
        }[node.op]
    if isinstance(node, FilterAnd):
        out = _filter_mask(node.children[0], values)
        for c in node.children[1:]:
            out = out & _filter_mask(c, values)
        return out
    out = _filter_mask(node.children[0], values)
    for c in node.children[1:]:
        out = out | _filter_mask(c, values)
    return out


def run_oracle(
    query: ZonalQuery,
    env: DataEnvironment,
    aois: list[tuple[str, bytes]],
    grid: G.Grid = fixtures.GRID,
    data_extent: tuple[int, int, int, int] = (fixtures.X0, fixtures.Y0, fixtures.NX, fixtures.NY),
) -> pd.DataFrame:
    """Compute the query result for each AOI; returns the concatenated
    result frame with aoi_id first (matching the engine's output shape)."""
    rollup = ("percentile", "mode", "count_distinct")
    if query.aggregates and any(a.func in rollup for a in query.aggregates):
        return _run_rollup_oracle(query, env, aois, grid, data_extent)
    x0e, y0e, nxe, nye = data_extent
    frames = []
    for aoi_id, wkb in aois:
        geom = geo.normalize(geo.wkb_loads(wkb))
        cells = G.polygon_to_cells(grid, geom)
        rows = []
        for cell in cells.tolist():
            x, y = (int(v) for v in G.cell_to_xy(np.int64(cell)))
            has_data = x0e <= x < x0e + nxe and y0e <= y < y0e + nye
            rows.append(_cell_frame(query, env, geom, grid, cell, x, y, has_data))
        rows = [r for r in rows if r is not None]
        if not rows:
            if not query.group_layers and query.aggregates:
                continue  # empty extent -> empty result
            continue
        pdf = pd.concat(rows, ignore_index=True)
        pdf = _merge(query, env, pdf)
        pdf.insert(0, "aoi_id", aoi_id)
        frames.append(pdf)
    if not frames:
        return pd.DataFrame()
    out = pd.concat(frames, ignore_index=True)
    if query.order_by:
        cols = [o.column for o in query.order_by]
        asc = [o.ascending for o in query.order_by]
        out = out.sort_values(["aoi_id", *cols], ascending=[True, *asc], kind="mergesort")
    elif not query.select_pixels:
        out = out.sort_values(list(out.columns[: 1 + len(query.group_layers)]), kind="mergesort")
    if query.limit is not None:
        out = out.groupby("aoi_id", group_keys=False).head(query.limit)
    return out.reset_index(drop=True)


def _cell_frame(query, env, geom, grid, cell, x, y, has_data):
    tile_px = grid.chunk_px
    cx0, cy0, ps = G.cell_affine(grid, cell)
    lat_c = float(G.cell_centroid_lat(grid, np.array([cell]))[0])
    mean_area = float(geodesy.pixel_area_ha(lat_c, ps))

    values = {}
    for name in query.layer_names():
        layer = env.get_layer(name)
        if isinstance(layer, ReservedLayer):
            continue
        if isinstance(layer, SourceLayer):
            values[name] = np.ravel(
                _source_tile(env, name, grid, cell, x, y, tile_px, has_data)
            )
        elif isinstance(layer, MultiDerivedLayer):
            arrs = [
                _source_tile(env, s, grid, cell, x, y, tile_px, has_data)
                for s in layer.source_layers
            ]
            values[name] = np.ravel(evaluate_multi_calc(layer.calc, arrs, mean_area))
        else:
            src = _source_tile(env, layer.source_layer, grid, cell, x, y, tile_px, has_data)
            values[name] = np.ravel(compile_expression(layer.calc)(src, mean_area))

    # engine parity: FROM <layer> scans only cells having stored tiles of a
    # needed layer (inner equi-join); FROM data also covers tile-less cells
    if not has_data and query.base_layer != FROM_DATA:
        return None
    mask = np.ravel(geo.rasterize_mask(geom, cx0, cy0, ps, tile_px, tile_px))
    if query.base_layer != FROM_DATA:
        nd = env.nodata_of(query.base_layer)
        base = values[query.base_layer]
        if nd is None:
            pass
        elif isinstance(nd, float) and np.isnan(nd):
            mask = mask & ~np.isnan(base)
        else:
            mask = mask & (base != nd)
            if np.issubdtype(np.asarray(base).dtype, np.floating):
                mask = mask & ~np.isnan(base)
    if query.where is not None:
        mask = mask & _filter_mask(query.where, values)

    if query.select_pixels:
        idx = np.flatnonzero(mask)
        rows_i, cols_j = np.divmod(idx, tile_px)
        out = {}
        for name in query.select_pixels:
            if name == LATITUDE:
                out[name] = cy0 - (rows_i + 0.5) * ps
            elif name == LONGITUDE:
                out[name] = cx0 + (cols_j + 0.5) * ps
            else:
                out[name] = np.asarray(values[name], dtype=np.float64)[idx]
        return pd.DataFrame(out, dtype=np.float64)

    for g in query.group_layers:
        arr = values[g]
        if np.issubdtype(np.asarray(arr).dtype, np.floating):
            mask = mask & ~np.isnan(arr)
        nd = env.nodata_of(g)
        if nd is not None and not env.keeps_nodata_groups(g) and not (
            isinstance(nd, float) and np.isnan(nd)
        ):
            mask = mask & (arr != nd)

    idx = np.flatnonzero(mask)
    out = {}
    if query.group_layers:
        if len(idx) == 0:
            return None
        key = np.stack(
            [np.asarray(values[g], dtype=np.float64)[idx] for g in query.group_layers], axis=1
        )
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        ng = len(uniq)
        for k, g in enumerate(query.group_layers):
            out[g] = uniq[:, k]
    else:
        ng, inv = 1, np.zeros(len(idx), dtype=np.int64)
    for a in query.aggregates:
        if a.func == "count":
            out[a.alias] = np.bincount(inv, minlength=ng).astype(np.int64)
        elif a.layer == AREA_HA:
            c = np.bincount(inv, minlength=ng)
            out[a.alias if a.func == "sum" else f"{a.alias}__s"] = c * mean_area
            if a.func == "avg":
                out[f"{a.alias}__c"] = c
        else:
            d = np.asarray(values[a.layer], dtype=np.float64)[idx]
            fin = ~np.isnan(d)
            if a.func == "sum":
                out[a.alias] = np.bincount(inv[fin], weights=d[fin], minlength=ng)
            elif a.func == "avg":
                out[f"{a.alias}__s"] = np.bincount(inv[fin], weights=d[fin], minlength=ng)
                out[f"{a.alias}__c"] = np.bincount(inv[fin], minlength=ng)
            elif a.func == "min":
                acc = np.full(ng, np.inf)
                np.minimum.at(acc, inv[fin], d[fin])
                # a group whose pixels were all NaN-excluded has no min:
                # NULL (NaN), never the accumulator sentinel
                out[a.alias] = np.where(np.isfinite(acc), acc, np.nan)
            elif a.func == "max":
                acc = np.full(ng, -np.inf)
                np.maximum.at(acc, inv[fin], d[fin])
                out[a.alias] = np.where(np.isfinite(acc), acc, np.nan)
    return pd.DataFrame(out)


def _source_tile(env, name, grid, cell, x, y, tile_px, has_data) -> np.ndarray:
    """Pixels of one source layer for the (fine) cell — regenerated from
    the fixture formulas; coarser-grid layers are upsampled through the
    same leaf helper the engine uses (finest-grid co-registration)."""
    if not has_data or name not in fixtures.PIXEL_NUMPY:
        return np.zeros((tile_px, tile_px))
    lgrid_name = env.get_layer(name).grid
    if lgrid_name == grid.name:
        return fixtures.tile_array(name, x, y, tile_px)
    src = G.get_grid(lgrid_name)
    r = G.cell_ratio(src, grid)
    xc, yc = x // r, y // r
    coarse = fixtures.tile_array(name, xc, yc, src.chunk_px)
    return G.upsample_to_cell(
        coarse, src, grid, int(G.cell_from_xy(src, xc, yc)), cell
    )


def _merge(query: ZonalQuery, env: DataEnvironment, pdf: pd.DataFrame) -> pd.DataFrame:
    if query.select_pixels:
        return pdf
    gcols = list(query.group_layers)
    if gcols:
        agg_spec = {}
        for a in query.aggregates:
            if a.func in ("count", "sum"):
                agg_spec[a.alias] = "sum"
            elif a.func == "avg":
                agg_spec[f"{a.alias}__s"] = "sum"
                agg_spec[f"{a.alias}__c"] = "sum"
            else:
                agg_spec[a.alias] = a.func
        pdf = pdf.groupby(gcols, as_index=False).agg(agg_spec)
    else:
        agg = {}
        for a in query.aggregates:
            if a.func in ("count", "sum"):
                agg[a.alias] = pdf[a.alias].sum()
            elif a.func == "avg":
                agg[f"{a.alias}__s"] = pdf[f"{a.alias}__s"].sum()
                agg[f"{a.alias}__c"] = pdf[f"{a.alias}__c"].sum()
            else:
                agg[a.alias] = pdf[a.alias].min() if a.func == "min" else pdf[a.alias].max()
        pdf = pd.DataFrame([agg])
    for a in query.aggregates:
        if a.func == "avg":
            pdf[a.alias] = pdf[f"{a.alias}__s"] / pdf[f"{a.alias}__c"]
            pdf = pdf.drop(columns=[f"{a.alias}__s", f"{a.alias}__c"])
        if a.func == "count":
            pdf[a.alias] = pdf[a.alias].astype(np.int64)
    # declaration column order (engine parity)
    pdf = pdf[[*gcols, *[a.alias for a in query.aggregates]]]
    # decode group columns (post-agg, P11)
    for g in gcols:
        layer = env.get_layer(g)
        if isinstance(layer, (SourceLayer, DerivedLayer, MultiDerivedLayer)):
            if layer.raster_table or layer.decode_expression:
                pdf[g] = env.decode_values(g, pdf[g].to_numpy())
            # same float-ness rule as the engine (zonal.layer_is_float):
            # a multi-derived layer's DECLARED dtype decides, not its
            # first source's storage dtype
            elif not zonal_layer_is_float(env, g):
                pdf[g] = pdf[g].astype(np.int64)
    # isoweek regroup (F1)
    if query.isoweek_layers:
        for g in query.isoweek_layers:
            dates = pd.to_datetime(pdf[g])
            iso = dates.dt.isocalendar()
            pdf[f"{g}__isoyear"] = iso["year"].astype(np.int64)
            pdf[f"{g}__isoweek"] = iso["week"].astype(np.int64)
            pdf = pdf.drop(columns=[g])
        new_g = [
            c for g in gcols
            for c in ([f"{g}__isoyear", f"{g}__isoweek"] if g in query.isoweek_layers else [g])
        ]
        spec = {}
        for a in query.aggregates:
            spec[a.alias] = "sum" if a.func in ("count", "sum", "avg") else a.func
        pdf = pdf.groupby(new_g, as_index=False).agg(spec)
    return pdf


def _run_rollup_oracle(query, env, aois, grid, data_extent) -> pd.DataFrame:
    """PERCENTILE/MEDIAN/MODE/COUNT(DISTINCT) oracle: the same
    group-by-value-counts reduction as the engine's plan rewrite, but
    computed INDEPENDENTLY in pandas off this module's own counts
    (run_oracle on the inner count query). Same semantics contract:
    quantile_disc discrete percentile with the engine's relative-epsilon
    guard; mode ties to the smallest value; distinct over decoded
    meanings."""
    import math

    a0 = query.aggregates[0]
    inner = ZonalQuery(
        base_layer=query.base_layer,
        group_layers=tuple(query.group_layers) + (a0.layer,),
        aggregates=(type(a0)("count", None, "__n"),),
        where=query.where,
    )
    counts = run_oracle(inner, env, aois, grid, data_extent)
    keys = ["aoi_id", *query.group_layers]
    vcol = a0.layer
    if counts.empty:
        return pd.DataFrame(columns=[*keys, *[a.alias for a in query.aggregates]])
    counts = counts.groupby([*keys, vcol], as_index=False)["__n"].sum()
    out = None
    for a in query.aggregates:
        if a.func == "count_distinct":
            # counts rows are already unique (keys, value) pairs, so the
            # distinct count is the group SIZE — engine parity for null
            # decoded meanings too (Series.nunique drops NaN by default,
            # the engine's count(1) does not)
            f = counts.groupby(keys).size().reset_index(name=a.alias)
            f[a.alias] = f[a.alias].astype(np.int64)
        elif a.func == "mode":
            srt = counts.sort_values(
                [*keys, "__n", vcol],
                ascending=[*([True] * len(keys)), False, True],
                kind="mergesort",
            )
            # head(1) keeps the first ROW intact (groupby.first skips NA
            # per column independently — wrong row AND wrong null policy)
            f = srt.groupby(keys, as_index=False).head(1)[[*keys, vcol]].rename(
                columns={vcol: a.alias}
            )
        else:  # percentile / median
            p = float(a.param)

            def pick(g, p=p):
                g = g.sort_values(vcol, kind="mergesort")
                tot = int(g["__n"].sum())
                thresh = math.ceil(p * tot - max(1e-9, p * tot * 1e-13))
                cum = g["__n"].cumsum()
                return float(g.loc[cum >= thresh, vcol].iloc[0])

            f = (
                counts.groupby(keys)
                .apply(pick, include_groups=False)
                .reset_index(name=a.alias)
            )
        out = f if out is None else out.merge(f, on=keys)
    out = out.sort_values(keys, kind="mergesort").reset_index(drop=True)
    return out[[*keys, *[a.alias for a in query.aggregates]]]
