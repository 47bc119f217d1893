"""Slippy-map (Web Mercator) tile assignment (SURVEY.md §2.2 N7).

Pure vectorized math — stateless map_batches territory. The SQL mirror
(for the DuckDB oracle) of the point→tile rule is:

    x = floor((lng + 180) / 360 * 2^z)
    y = floor((1 - ln(tan(radians(lat)) + 1/cos(radians(lat))) / pi) / 2 * 2^z)

with lat clamped to ±85.05112878 and x/y clamped to [0, 2^z - 1].
"""

from __future__ import annotations

import numpy as np

MERC_LAT_MAX = 85.05112878


def point_to_tile(lng, lat, z: int):
    """Vectorized lng/lat → (x, y) tile indices at zoom z."""
    n = 1 << z
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERC_LAT_MAX, MERC_LAT_MAX)
    x = np.floor((lng + 180.0) / 360.0 * n).astype(np.int64)
    rad = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n
                 ).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def tile_bounds(z: int, x: int, y: int):
    """(minlng, minlat, maxlng, maxlat) of one tile (inverse Mercator)."""
    n = 1 << z
    minlng = x / n * 360.0 - 180.0
    maxlng = (x + 1) / n * 360.0 - 180.0
    def lat_of(yy):
        t = np.pi * (1.0 - 2.0 * yy / n)
        return np.degrees(np.arctan(np.sinh(t)))
    return minlng, lat_of(y + 1), maxlng, lat_of(y)


def envelope_to_tiles(minx, miny, maxx, maxy, z: int):
    """All (x, y) tiles intersecting an lng/lat envelope at zoom z —
    the raster↔vector assignment for non-point geometries (documented
    approximation: envelope cover, not exact geometry cover)."""
    x0, y0 = point_to_tile(np.float64(minx), np.float64(maxy), z)  # top-left
    x1, y1 = point_to_tile(np.float64(maxx), np.float64(miny), z)  # bottom-right
    xs = np.arange(int(x0), int(x1) + 1)
    ys = np.arange(int(y0), int(y1) + 1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return gx.ravel(), gy.ravel()
