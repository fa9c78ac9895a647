"""Vectorized geodetic <-> transverse-Mercator projection (UTM).

Implements the standard Karney/Krüger series for the transverse Mercator
projection (public formulas; see Karney, "Transverse Mercator with an
accuracy of a few nanometers", J. Geodesy 2011) so the engine does not
depend on pyproj.  Accuracy is sub-millimetre inside a UTM zone — far below
the 22 m decision threshold of the sidepath join.

EPSG:25833 = ETRS89 / UTM zone 33N (central meridian 15°E, k0=0.9996,
false easting 500 000).  The reference pipeline processes in this CRS
(/root/reference/parameter.py:5).
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid (ETRS89); WGS84 differs by <0.1 mm in flattening
_A = 6378137.0
_F = 1.0 / 298.257222101

_N = _F / (2.0 - _F)
_A1 = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

# forward (geodetic -> TM) series coefficients
_ALPHA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440,
    61 * _N**3 / 240 - 103 * _N**4 / 140,
    49561 * _N**4 / 161280,
])
# inverse (TM -> geodetic) series coefficients
_BETA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - 1 * _N**4 / 360,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440,
    17 * _N**3 / 480 - 37 * _N**4 / 840,
    4397 * _N**4 / 161280,
])
_DELTA = np.array([
    2 * _N - 2 * _N**2 / 3 - 2 * _N**3 + 116 * _N**4 / 45,
    7 * _N**2 / 3 - 8 * _N**3 / 5 - 227 * _N**4 / 45,
    56 * _N**3 / 15 - 136 * _N**4 / 35,
    4279 * _N**4 / 630,
])

_K0 = 0.9996
_FALSE_EASTING = 500_000.0
_E2 = _F * (2 - _F)
_E = np.sqrt(_E2)


def utm_zone_central_meridian(zone: int) -> float:
    return float(zone * 6 - 183)


def utm_zone_for(lon: float) -> int:
    """Standard UTM zone for a longitude (1..60).  At global scale each
    geometry projects in its own zone: partition by zone (it is a coarse
    prefix of the cell key) and project per partition."""
    return int(np.clip((np.floor((lon + 180.0) / 6.0) + 1), 1, 60))


def lonlat_to_utm(lon, lat, zone: int = 33):
    """Vectorized forward projection.  lon/lat in degrees -> (easting, northing)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon0 = np.radians(utm_zone_central_meridian(zone))
    phi = np.radians(lat)
    lam = np.radians(lon) - lon0

    # conformal latitude
    t = np.sinh(
        np.arctanh(np.sin(phi))
        - _E * np.arctanh(_E * np.sin(phi))
    )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.hypot(1.0, t))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(4):
        k = 2 * (j + 1)
        xi += _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)

    easting = _FALSE_EASTING + _K0 * _A1 * eta
    northing = _K0 * _A1 * xi
    return easting, northing


def utm_to_lonlat(easting, northing, zone: int = 33):
    """Vectorized inverse projection.  (easting, northing) -> lon/lat degrees."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    xi = northing / (_K0 * _A1)
    eta = (easting - _FALSE_EASTING) / (_K0 * _A1)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(4):
        k = 2 * (j + 1)
        xi_p -= _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p -= _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)

    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j in range(4):
        k = 2 * (j + 1)
        phi += _DELTA[j] * np.sin(k * chi)

    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon0 = np.radians(utm_zone_central_meridian(zone))
    return np.degrees(lam + lon0), np.degrees(phi)


def project_coords(coords, zone: int = 33):
    """[[lon,lat],...] -> [[x,y],...] (python lists in/out, vectorized inside)."""
    arr = np.asarray(coords, dtype=np.float64)
    x, y = lonlat_to_utm(arr[:, 0], arr[:, 1], zone)
    return np.stack([x, y], axis=1)


def unproject_coords(coords, zone: int = 33):
    arr = np.asarray(coords, dtype=np.float64)
    lon, lat = utm_to_lonlat(arr[:, 0], arr[:, 1], zone)
    return np.stack([lon, lat], axis=1)


def equirect_project_coords(coords, lon0: float = 13.5, lat0: float = 51.05,
                            kx: float = 70000.0, ky: float = 111320.0):
    """Equirectangular planar projection: x = (lon-lon0)*kx, y =
    (lat-lat0)*ky.  Two IEEE ops per axis — bit-for-bit replayable in
    ANSI SQL, which is the whole point: the flagship spatial join run
    through this projection (queries.q_images_assign_planar) gets an
    EXACT DuckDB oracle, whereas the Karney UTM series above uses sinh /
    atan whose libm vs numpy results differ in the last ulp.  Within the
    flagship extent (0.2 x 0.1 deg) the metric distortion vs UTM is
    < 1%, far inside the join's pad slack."""
    arr = np.asarray(coords, dtype=np.float64)
    return np.stack([(arr[:, 0] - lon0) * kx,
                     (arr[:, 1] - lat0) * ky], axis=1)
