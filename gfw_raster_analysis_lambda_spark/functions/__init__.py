"""Vectorized scalar kernels: geodesy, geometry, grid codec, image codecs,
and the safe calc-expression compiler. Pure numpy + stdlib (the container
ships no shapely/rasterio/PIL) — every function is batch-first so it can sit
inside an Arrow-batched pandas UDF without per-row Python.
"""
