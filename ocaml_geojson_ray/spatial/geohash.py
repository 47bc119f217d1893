"""Geohash encoder — from scratch, vectorized numpy.

Third public cell-index standard behind the cells API (quad cells +
S2-style cube faces in cells.py, hex ij grid in hexcells.py): the
Niemeyer 2008 base-32 geohash. A precision-p hash is 5p bits of
alternating lng/lat bisection (lng first), grouped into 5-bit chars of
the alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.

Encoding here is DIRECT QUANTIZATION, not per-bit bisection: the
first ceil(5p/2) lng-bisections are exactly the binary digits of
floor((lng+180)/360 · 2^nlng) (same for lat), so one floor per axis +
one bit-interleave reproduces the bisection stream bit-for-bit. That
form is deliberately mirrorable in SQL (floor arithmetic + a
generate_series bit spread + substr on the alphabet), so a DuckDB
oracle can verify assignments value-for-value — same design rule as
latlng_to_cell (cells.py:32).
"""

from __future__ import annotations

import numpy as np

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12  # 5·12 = 60 bits fits int64


def geohash_encode(lng, lat, precision: int = 12) -> np.ndarray:
    """Vectorized lng/lat → geohash strings of length ``precision``.

    Edge handling matches latlng_to_cell: lng=180 wraps into the last
    column, lat=90 clamps to the top row (clip to n-1).
    """
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision out of range: {precision}")
    total = 5 * precision
    nlng = (total + 1) // 2  # lng gets the even (leading) positions
    nlat = total // 2
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.clip(np.floor((lng + 180.0) / 360.0 * (1 << nlng)),
                 0, (1 << nlng) - 1).astype(np.int64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * (1 << nlat)),
                 0, (1 << nlat) - 1).astype(np.int64)
    iv = geohash_interleave(ix, iy, precision)
    return interleaved_to_hash(iv, precision)


def interleaved_to_hash(iv, precision: int) -> np.ndarray:
    """5p-bit interleaved ints → base-32 geohash strings (vectorized;
    the int form is the natural SHUFFLE KEY — 8 bytes, bit-exact in
    SQL — strings are for presentation)."""
    iv = np.asarray(iv, dtype=np.int64)
    codes = np.empty((precision, len(iv)), dtype=np.int64)
    for k in range(precision):
        codes[k] = (iv >> np.int64(5 * (precision - 1 - k))) & np.int64(31)
    lut = np.array(list(ALPHABET))
    chars = lut[codes]  # (precision, n)
    acc = chars[0].astype(object)
    for k in range(1, precision):
        acc = acc + chars[k]
    out = np.empty(len(iv), dtype=object)
    out[:] = acc
    return out


def geohash_interleave(ix, iy, precision: int) -> np.ndarray:
    """The 5p-bit interleaved integer: stream position s (0 = most
    significant) holds lng bit (nlng-1-s//2) when s is even, else lat
    bit (nlat-1-(s-1)//2)."""
    total = 5 * precision
    nlng = (total + 1) // 2
    nlat = total // 2
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    iv = np.zeros_like(ix)
    for s in range(total):
        if s % 2 == 0:
            bit = (ix >> np.int64(nlng - 1 - s // 2)) & np.int64(1)
        else:
            bit = (iy >> np.int64(nlat - 1 - (s - 1) // 2)) & np.int64(1)
        iv |= bit << np.int64(total - 1 - s)
    return iv


def geohash_neighbors(h: str) -> list[str]:
    """The up-to-8 adjacent cells at the same precision (grid_ring
    k=1 for the geohash grid): decode → center → shift one cell size →
    re-encode. Longitude wraps across the antimeridian; rows beyond a
    pole drop out — the same edge rules as cells.grid_ring."""
    minlng, minlat, maxlng, maxlat = geohash_decode_bounds(h)
    w = maxlng - minlng
    hh = maxlat - minlat
    cx = (minlng + maxlng) / 2.0
    cy = (minlat + maxlat) / 2.0
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            y = cy + dy * hh
            if not -90.0 <= y <= 90.0:
                continue
            x = cx + dx * w
            x = ((x + 180.0) % 360.0) - 180.0
            out.append(geohash_encode([x], [y], len(h))[0])
    return sorted(set(out))


_DECODE = {c: i for i, c in enumerate(ALPHABET)}


def geohash_decode_bounds(h: str) -> tuple[float, float, float, float]:
    """(minlng, minlat, maxlng, maxlat) of one geohash cell — the
    inverse used by property tests and cell_bounds-style consumers."""
    precision = len(h)
    total = 5 * precision
    nlng = (total + 1) // 2
    nlat = total // 2
    iv = 0
    for c in h:
        iv = (iv << 5) | _DECODE[c]
    ix = iy = 0
    for s in range(total):
        bit = (iv >> (total - 1 - s)) & 1
        if s % 2 == 0:
            ix = (ix << 1) | bit
        else:
            iy = (iy << 1) | bit
    w = 360.0 / (1 << nlng)
    hgt = 180.0 / (1 << nlat)
    minlng = ix * w - 180.0
    minlat = iy * hgt - 90.0
    return minlng, minlat, minlng + w, minlat + hgt
