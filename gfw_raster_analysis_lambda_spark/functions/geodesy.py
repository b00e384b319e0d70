"""Geodesic pixel area on the WGS84 ellipsoid.

Semantics parity target: the reference computes each tile's mean pixel area
as the geodesic area of one pixel at the tile's centroid latitude, in
hectares (reference geodesy.py:6-53; documented approximation
README.md:371). We implement the standard public ellipsoidal band-area
formula (see e.g. Snyder, "Map Projections — A Working Manual", authalic
latitude development) rather than porting the reference's code:

The area of the ellipsoid between the equator and geodetic latitude phi,
over a full 360 degrees of longitude, is

    Z(phi) = pi * a^2 * (1 - e^2) * [ sin(phi) / (1 - e^2 sin^2(phi))
             + (1 / (2 e)) * ln( (1 + e sin(phi)) / (1 - e sin(phi)) ) ]

so a latitude band [phi1, phi2] spanning ``dlon`` degrees of longitude has
area |Z(phi2) - Z(phi1)| * dlon / 360.

All functions are numpy-vectorized over latitude arrays. The same formula
is re-expressed in ANSI SQL (sin/ln/pi) inside ``__spark_entry__.py`` oracle
queries so DuckDB can verify the Spark results end-to-end.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid (public constants; same values the reference cites).
WGS84_A = 6378137.0
WGS84_B = 6356752.314245179

_E2 = 1.0 - (WGS84_B / WGS84_A) ** 2
_E = float(np.sqrt(_E2))

M2_PER_HA = 10_000.0


def zone_area_m2(lat_deg):
    """Area (m^2) of the full-longitude zone between the equator and
    ``lat_deg`` (signed). Vectorized over numpy arrays."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(lat)
    es = _E * s
    return (
        np.pi
        * WGS84_A**2
        * (1.0 - _E2)
        * (s / (1.0 - _E2 * s * s) + np.log((1.0 + es) / (1.0 - es)) / (2.0 * _E))
    )


def band_area_m2(lat1_deg, lat2_deg, dlon_deg):
    """Area (m^2) of the band between two latitudes over ``dlon_deg``
    degrees of longitude. Vectorized."""
    return np.abs(zone_area_m2(lat2_deg) - zone_area_m2(lat1_deg)) * (
        np.asarray(dlon_deg, dtype=np.float64) / 360.0
    )


def pixel_area_ha(lat_center_deg, pixel_size_deg):
    """Geodesic area in hectares of a square (in degrees) pixel whose
    *center* latitude is ``lat_center_deg``. Vectorized over centers.

    Matches the reference's approximation strategy: one representative
    latitude per tile (the tile centroid), every pixel in the tile gets
    the same area.
    """
    lat = np.asarray(lat_center_deg, dtype=np.float64)
    ps = np.asarray(pixel_size_deg, dtype=np.float64)
    half = ps / 2.0
    return band_area_m2(lat - half, lat + half, ps) / M2_PER_HA


def earth_area_m2() -> float:
    """Total ellipsoid surface area — used by the unit test as a sanity
    anchor (WGS84 surface area is ~5.1007e14 m^2)."""
    return float(2.0 * zone_area_m2(90.0))
