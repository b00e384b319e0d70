"""gfw_raster_analysis_lambda_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query semantics of WRI's
gfw-raster-analysis-lambda ("Raster SQL" zonal statistics) as idiomatic
PySpark: the relational shell (filters, group-by, partial+final aggregation,
order/limit) rides Catalyst; the spatial layer (cell grid, polygon
rasterization, geodesic pixel area, image tile codecs) is custom vectorized
numpy kernels carried by Arrow-batched pandas UDFs.

Reference semantics studied at /root/reference (see SURVEY.md for the
operator-by-operator mapping with file:line citations). No code is copied
from the reference; this package targets Spark's execution model directly.
"""

__version__ = "0.1.0"

from .api import (  # noqa: E402,F401
    aoi_from_geojson,
    zonal_statistics,
    zonal_statistics_batch,
    zonal_statistics_multi,
)
from .checkpoint import run_zonal_checkpointed  # noqa: E402,F401
from .plans.planner import ZonalResultSet, prepare_aoi_index  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401
from .sources.catalog import (  # noqa: E402,F401
    DataEnvironment,
    DerivedLayer,
    MultiDerivedLayer,
    SourceLayer,
)
