"""Deterministic synthetic corpus: images table + AOIs + layer catalog.

Pixel values are **pure integer arithmetic over (x, y, i, j)** — the cell
indices and in-tile row/col — so that exactly the same values can be
reproduced three ways:

1. numpy (this module, used to build the encoded tiles),
2. the single-process zonal oracle (tests),
3. ANSI SQL ``generate_series`` arithmetic in DuckDB (the driver's
   independent correctness gate in ``__spark_entry__.py``).

Layer distributions mirror the reference's test data environment
(reference tests/fixtures/fixtures.py:1-206; see FIXTURES.md): a year
layer with a categorical decode, a binned threshold table, a boolean
layer, a float layer with NaN holes, a packed date+confidence alert
layer, a defaulted categorical, and a NoData=255 layer.

The fixture world is a 4x4 block of 0.25-deg cells covering
lon [10, 11) x lat [20, 21) on the ``4/1024`` grid (64x64-px tiles).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from ..functions import codecs
from ..functions import geometry as geo
from ..functions import grid as G
from .catalog import DataEnvironment, DerivedLayer, MultiDerivedLayer, SourceLayer

GRID = G.GRID_FIXTURE  # 0.25-deg cells, 64x64 px, pixel 0.00390625 deg
TILE = GRID.chunk_px

# fixture world: cells x in [X0, X0+NX), y in [Y0, Y0+NY)
X0 = int((10.0 + 180.0) / GRID.tile_deg)  # 760  (lon 10)
Y0 = int((90.0 - 21.0) / GRID.tile_deg)  # 276  (lat 21 top)
NX = 4
NY = 4

# epoch offset: days from 1970-01-01 to 2015-01-01 (alert date packing)
DAYS_2015 = 16436


# ---------------------------------------------------------------------------
# Pixel formulas — each is (numpy_fn, sql_template). SQL templates use
# placeholders {x} {y} {i} {j} and must be valid in BOTH DuckDB and Spark SQL.
# ---------------------------------------------------------------------------

def _np_tcl_year(x, y, i, j):
    return ((x * 7 + y * 11 + i * 13 + j * 17) % 21).astype(np.uint8)


def _np_tcd_threshold(x, y, i, j):
    return ((x * 3 + y * 5 + i * 7 + j * 11) % 8).astype(np.uint8)


def _np_is_primary(x, y, i, j):
    return ((x + y + i + j) % 2).astype(np.uint8)


def _np_emissions(x, y, i, j):
    raw = ((x * 13 + y * 3 + i * 5 + j * 7) % 1000) / 10.0
    hole = (x + y + i * 31 + j * 17) % 17 == 0
    return np.where(hole, np.nan, raw).astype(np.float32)


def _np_alert(x, y, i, j):
    conf = 2 + (x + i) % 2
    date = 200 + (x * 11 + y * 7 + i * 3 + j * 13) % 1000
    v = conf * 10000 + date
    return np.where((x + y + i + j) % 5 == 0, 0, v).astype(np.uint16)


def _np_drivers(x, y, i, j):
    return ((x * 17 + y * 19 + i * 23 + j * 29) % 6).astype(np.uint8)


def _np_ttc(x, y, i, j):
    v = (x * 5 + y * 13 + i * 11 + j * 3) % 128
    return np.where((x + y + i + j) % 7 == 0, 255, v).astype(np.uint8)


def _np_photo(x, y, i, j):
    return ((x * 29 + y * 23 + i * 19 + j * 31) % 256).astype(np.uint8)


def _np_biomass(x, y, i, j):
    # NATIVE COARSE coordinates (grid 4/512, 0.5-deg cells): exercises the
    # finest-grid co-registration rule (upsample 2x inside the kernel)
    return ((x * 3 + y * 7 + i * 5 + j * 13) % 200).astype(np.uint8)


PIXEL_SQL: dict[str, str] = {
    # identical modular arithmetic in ANSI SQL (DuckDB + Spark compatible)
    "tcl_year": "(({x}*7 + {y}*11 + {i}*13 + {j}*17) % 21)",
    "tcd_threshold": "(({x}*3 + {y}*5 + {i}*7 + {j}*11) % 8)",
    "is_primary": "(({x} + {y} + {i} + {j}) % 2)",
    "emissions": (
        "(CASE WHEN ({x} + {y} + {i}*31 + {j}*17) % 17 = 0 THEN NULL "
        "ELSE (({x}*13 + {y}*3 + {i}*5 + {j}*7) % 1000) / 10.0 END)"
    ),
    "alert_date_conf": (
        "(CASE WHEN ({x} + {y} + {i} + {j}) % 5 = 0 THEN 0 "
        "ELSE (2 + ({x} + {i}) % 2) * 10000 "
        "+ 200 + ({x}*11 + {y}*7 + {i}*3 + {j}*13) % 1000 END)"
    ),
    "drivers": "(({x}*17 + {y}*19 + {i}*23 + {j}*29) % 6)",
    "ttc_percent": (
        "(CASE WHEN ({x} + {y} + {i} + {j}) % 7 = 0 THEN 255 "
        "ELSE ({x}*5 + {y}*13 + {i}*11 + {j}*3) % 128 END)"
    ),
    "photo": "(({x}*29 + {y}*23 + {i}*19 + {j}*31) % 256)",
    # biomass in FINE (4/1024) coordinates: the coarse (4/512) formula at
    # xc=x//2, yc=y//2, ic=(y%2)*32 + i//2, jc=(x%2)*32 + j//2 — exactly the
    # kernel's slice+repeat upsample mapping
    "biomass": (
        "((({x}//2)*3 + ({y}//2)*7 + ((({y})%2)*32 + ({i}//2))*5 "
        "+ ((({x})%2)*32 + ({j}//2))*13) % 200)"
    ),
}

PIXEL_NUMPY = {
    "tcl_year": _np_tcl_year,
    "tcd_threshold": _np_tcd_threshold,
    "is_primary": _np_is_primary,
    "emissions": _np_emissions,
    "alert_date_conf": _np_alert,
    "drivers": _np_drivers,
    "ttc_percent": _np_ttc,
    "photo": _np_photo,
    "biomass": _np_biomass,  # native COARSE (4/512) coordinates
}


def fixture_environment(grid: str = GRID.name) -> DataEnvironment:
    """The fixture layer catalog (data-environment analog). ``grid`` is the
    storage grid of the standard layers (the bench corpora reuse this
    catalog on their own grids); ``biomass`` always sits one 2x step
    coarser than the fixture grid to exercise multi-grid co-registration."""
    g = grid
    return DataEnvironment(
        layers=[
            SourceLayer(
                "tcl_year", grid=g, dtype="uint8", fmt="png", no_data=0,
                raster_table={v: 2000 + v for v in range(1, 21)},
            ),
            SourceLayer(
                "tcd_threshold", grid=g, dtype="uint8", fmt="png", no_data=0,
                raster_table={1: 10, 2: 15, 3: 20, 4: 25, 5: 30, 6: 50, 7: 75},
            ),
            SourceLayer(
                "is_primary", grid=g, dtype="uint8", fmt="png", no_data=0,
                raster_table={0: "false", 1: "true"},
            ),
            SourceLayer("emissions", grid=g, dtype="float32", fmt="raw_f32", no_data=float("nan")),
            DerivedLayer("emissions_Mg", source_layer="emissions", calc="A * area"),
            SourceLayer("alert_date_conf", grid=g, dtype="uint16", fmt="png", no_data=0),
            DerivedLayer(
                "alert_date", source_layer="alert_date_conf", calc="A % 10000",
                decode_expression=f"(A + {DAYS_2015}).astype('datetime64[D]').astype('str')",
                encode_expression=f"days_since_epoch(A) - {DAYS_2015}",
            ),
            DerivedLayer(
                "alert_conf", source_layer="alert_date_conf", calc="floor(A / 10000)",
            ),
            SourceLayer(
                "drivers", grid=g, dtype="uint8", fmt="png", no_data=0,
                raster_table={1: "Agriculture", 2: "Forestry", 3: "Urban", 4: "Fire", 5: "Mining"},
                default_meaning="Unknown",
            ),
            SourceLayer("ttc_percent", grid=g, dtype="uint8", fmt="png", no_data=255),
            SourceLayer("photo", grid=g, dtype="uint8", fmt="jpeg", no_data=None),
            # stored on a 2x-coarser grid: queries mixing it with 4/1024
            # layers exercise the finest-grid co-registration rule
            SourceLayer("biomass", grid="4/512", dtype="uint8", fmt="png", no_data=0),
            # multi-layer map algebra (beyond the reference's one-source
            # DerivedLayer): emissions per biomass unit ACROSS grids
            # (emissions on the fixture grid, biomass 2x coarser), and an
            # integer product mask
            MultiDerivedLayer(
                "em_per_bio", source_layers=("emissions", "biomass"),
                calc="where(B > 0, astype(A, 'float64') / B, nan)",
                dtype="float64", no_data=float("nan"),
            ),
            MultiDerivedLayer(
                "loss_prim", source_layers=("tcl_year", "is_primary"),
                calc="A * B", dtype="int64", no_data=0,
            ),
        ]
    )


def tile_array(layer: str, x: int, y: int, tile_px: int = TILE) -> np.ndarray:
    """Decoded pixel array of one fixture tile (pre-encoding ground truth)."""
    i, j = np.meshgrid(
        np.arange(tile_px, dtype=np.int64), np.arange(tile_px, dtype=np.int64), indexing="ij"
    )
    return PIXEL_NUMPY[layer](np.int64(x), np.int64(y), i, j)


def caption_for(layer: str, cell_id: int) -> str:
    digest = hashlib.md5(f"{layer}/{cell_id}".encode()).hexdigest()[:12]
    return f"tile {layer} cell {cell_id:016x} digest {digest}"


def image_id_for(layer: str, cell_id: int) -> str:
    return f"{layer}/{cell_id:016x}"


def encode_image_row(
    env: DataEnvironment, layer_name: str, x: int, y: int,
    tile_px: int = TILE, grid: G.Grid = GRID,
) -> tuple:
    """One images-table row (input-hint shape) for (layer, cell x, cell y)."""
    layer = env.get_layer(layer_name)
    cell = int(G.cell_from_xy(grid, x, y))
    arr = tile_array(layer_name, x, y, tile_px)
    if layer.dtype == "uint16":
        enc_arr = arr.astype(np.uint16)
    elif layer.dtype == "float32":
        enc_arr = arr.astype(np.float32)
    else:
        enc_arr = arr.astype(np.uint8)
    payload = codecs.encode_tile(enc_arr, layer.fmt)
    ph = codecs.phash64(np.nan_to_num(enc_arr.astype(np.float64)))
    return (
        image_id_for(layer_name, cell),
        payload,
        tile_px,
        tile_px,
        layer.fmt,
        caption_for(layer_name, cell),
        ph,
    )


def generate_images_rows(
    layers: list[str] | None = None,
    x0: int = X0, y0: int = Y0, nx: int = NX, ny: int = NY,
    tile_px: int = TILE,
) -> list[tuple]:
    """Rows of the images table in exact input-hint shape:
    (image_id, bytes, w, h, fmt, caption, phash)."""
    env = fixture_environment()
    layers = layers or [l.name for l in env.layers if isinstance(l, SourceLayer)]
    rows = []
    for layer_name in layers:
        lgrid = G.get_grid(env.get_layer(layer_name).grid)
        if lgrid.name == GRID.name:
            xs, ys, g = range(x0, x0 + nx), range(y0, y0 + ny), GRID
        else:  # coarser layer: same world extent on its native grid
            r = G.cell_ratio(lgrid, GRID)
            xs = range(x0 // r, -(-(x0 + nx) // r))
            ys = range(y0 // r, -(-(y0 + ny) // r))
            g = lgrid
        rows.extend(
            encode_image_row(env, layer_name, x, y, tile_px, grid=g)
            for y in ys
            for x in xs
        )
    return rows


def generate_images_df(
    spark,
    grid: G.Grid,
    layers: list[str],
    x0: int, y0: int, nx: int, ny: int,
    parallelism: int | None = None,
):
    """Distributed corpus generator (bench scale): the driver ships only
    (layer, x, y) keys; tile synthesis + encoding runs on executors in an
    Arrow-batched ``mapInPandas``. At 10^12-image scale this is the shape
    of any backfill job: a key-range DataFrame fanned out to encoders,
    never a driver-side loop."""
    import pandas as pd

    keys = [
        (ln, x, y)
        for ln in layers
        for y in range(y0, y0 + ny)
        for x in range(x0, x0 + nx)
    ]
    kdf = spark.createDataFrame(keys, "layer string, x int, y int")
    kdf = kdf.repartition(parallelism or spark.sparkContext.defaultParallelism)
    tile_px, grid_name = grid.chunk_px, grid.name

    def gen(batches):
        env = fixture_environment()
        g = G.get_grid(grid_name)
        for pdf in batches:
            rows = [
                encode_image_row(env, ln, int(x), int(y), tile_px, g)
                for ln, x, y in zip(pdf["layer"], pdf["x"], pdf["y"])
            ]
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    return kdf.mapInPandas(gen, IMAGES_SCHEMA)


def bench_aois(
    grid: G.Grid, x0: int, y0: int, nx: int, ny: int,
    n_aoi: int, cells_per_aoi: int = 36, hot_fraction: float = 0.25,
) -> list[tuple[str, bytes]]:
    """Deterministic AOI batch for throughput runs: boxes of
    ~``cells_per_aoi`` cells scattered over the corpus extent, with
    ``hot_fraction`` of them stacked onto the same corner — a controlled
    skew hotspot (many AOIs hitting the same cells), the case the salted /
    AQE-skew join strategies exist for."""
    td = grid.tile_deg
    side = max(1, int(round(cells_per_aoi ** 0.5)))
    lon0 = -180.0 + x0 * td
    lat_top = 90.0 - y0 * td
    aois: list[tuple[str, bytes]] = []
    for k in range(n_aoi):
        if k < int(n_aoi * hot_fraction):
            cx, cy = 1, 1  # hotspot corner
        else:
            # deterministic LCG scatter
            cx = 1 + (k * 2654435761 % max(1, nx - side - 2))
            cy = 1 + (k * 40503 % max(1, ny - side - 2))
        x1 = lon0 + cx * td + 0.1 * td
        y2 = lat_top - cy * td - 0.1 * td
        x2 = x1 + side * td
        y1 = y2 - side * td
        aois.append((f"bench_aoi_{k:05d}", geo.wkb_dumps(geo.box(x1, y1, x2, y2))))
    return aois


# ---------------------------------------------------------------------------
# AOIs (FIXTURES.md section 3): grid-aligned, offset, concave-with-hole,
# degenerate (self-touching), and fully-outside.
# ---------------------------------------------------------------------------

def fixture_aois() -> list[tuple[str, bytes]]:
    aois: list[tuple[str, bytes]] = []
    # 2x2-cell grid-snapped box (analytically exact pixel counts)
    aois.append(("aoi_box_aligned", geo.wkb_dumps(geo.box(10.0, 20.25, 10.5, 20.75))))
    # box offset by half a tile (partial coverage on every side)
    aois.append(("aoi_box_offset", geo.wkb_dumps(geo.box(10.125, 20.375, 10.625, 20.875))))
    # concave multipolygon with a hole
    outer = np.array(
        [[10.05, 20.05], [10.70, 20.05], [10.70, 20.45], [10.40, 20.45],
         [10.40, 20.70], [10.05, 20.70]], dtype=np.float64
    )
    hole = np.array(
        [[10.15, 20.15], [10.30, 20.15], [10.30, 20.30], [10.15, 20.30]],
        dtype=np.float64,
    )
    island = np.array(
        [[10.80, 20.80], [10.95, 20.80], [10.95, 20.95], [10.80, 20.95]],
        dtype=np.float64,
    )
    aois.append(("aoi_concave_hole", geo.wkb_dumps([[outer, hole], [island]])))
    # degenerate self-touching bowtie (the .buffer(0) repair case)
    bow = np.array(
        [[10.05, 20.05], [10.20, 20.20], [10.20, 20.05], [10.05, 20.20]],
        dtype=np.float64,
    )
    aois.append(("aoi_degenerate", geo.wkb_dumps([[bow]])))
    # fully outside the data extent (empty-result case)
    aois.append(("aoi_outside", geo.wkb_dumps(geo.box(-60.0, -10.0, -59.5, -9.5))))
    return aois


# ---------------------------------------------------------------------------
# Materialization (parquet corpus on disk; schema = input hint exactly)
# ---------------------------------------------------------------------------

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)
AOI_SCHEMA = "aoi_id string, geom_wkb binary"


def write_fixture_corpus(spark, out_dir: str, nx: int = NX, ny: int = NY) -> dict:
    """Write images.parquet + aoi.parquet + layers.json under ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    images_path = os.path.join(out_dir, "images.parquet")
    aoi_path = os.path.join(out_dir, "aoi.parquet")
    env_path = os.path.join(out_dir, "layers.json")
    rows = generate_images_rows(nx=nx, ny=ny)
    spark.createDataFrame(rows, IMAGES_SCHEMA).coalesce(4).write.mode("overwrite").parquet(images_path)
    spark.createDataFrame(fixture_aois(), AOI_SCHEMA).coalesce(1).write.mode("overwrite").parquet(aoi_path)
    with open(env_path, "w") as f:
        f.write(fixture_environment().to_json())
    return {"images": images_path, "aoi": aoi_path, "layers": env_path}
