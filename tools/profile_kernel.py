"""Profile the colocated cell kernel in-process (no Spark) over the bench
corpus parquet, to find Python-side hotspots.

Usage: python tools/profile_kernel.py [n_cells]
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow.dataset as ds

import bench
from gfw_raster_analysis_lambda_spark.functions import grid as G
from gfw_raster_analysis_lambda_spark.operators import zonal
from gfw_raster_analysis_lambda_spark.plans import sql_frontend
from gfw_raster_analysis_lambda_spark.sources import fixtures


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    sql = (
        "SELECT tcl_year, SUM(area__ha) AS loss_ha, COUNT(*) AS n "
        "FROM tcl_year WHERE tcd_threshold >= 25 AND is_primary = 'true' "
        "GROUP BY tcl_year"
    )
    env = fixtures.fixture_environment(grid=bench.BGRID.name)
    query = sql_frontend.parse_raster_sql(sql, env)
    env_json = env.to_json()

    from gfw_raster_analysis_lambda_spark.functions import geometry as geo
    aois = fixtures.bench_aois(bench.BGRID, bench.BX0, bench.BY0, bench.BNX, bench.BNY,
                               bench.N_AOI, bench.CELLS_PER_AOI)
    lookup = {}
    for aoi_id, wkb in aois:
        g = geo.wkb_loads(wkb)
        for cell in G.polygon_to_cells(bench.BGRID, g):
            lookup.setdefault(int(cell), []).append((aoi_id, wkb))

    corpus = bench.corpus_dir()
    dataset = ds.dataset(corpus, format="parquet")
    tbl = dataset.to_table()
    pdf = tbl.to_pandas()
    print(f"corpus rows: {len(pdf)}; cells in lookup: {len(lookup)}")
    # group to cells like the colocated scan does: sorted by cell_id
    pdf = pdf.sort_values(["cell_id", "layer"], kind="stable").reset_index(drop=True)
    cells = [g for _, g in pdf.groupby("cell_id", sort=True)]
    cells = cells[:n_cells]

    class _BC:
        def __init__(self, v): self.value = v
    lookup = {c: (1, a) for c, a in lookup.items()}
    kernel = zonal.make_cell_kernel(query, env_json, bench.BGRID.name, _BC(lookup))

    def run():
        out = []
        for cdf in cells:
            out.append(kernel(cdf))
        return pd.concat(out)

    t0 = time.time(); r = run(); t1 = time.time()
    print(f"warm run: {t1-t0:.2f}s for {len(cells)} cells -> {len(r)} partial rows")

    pr = cProfile.Profile()
    pr.enable()
    run()
    pr.disable()
    s = io.StringIO()
    st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    st.print_stats(35)
    print(s.getvalue())


if __name__ == "__main__":
    main()
