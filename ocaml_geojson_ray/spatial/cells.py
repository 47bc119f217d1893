"""Hierarchical spatial cell index — from scratch, pure numpy.

Two encoders behind one H3-shaped API (SURVEY.md §7 step 4; no h3 /
s2sphere packages exist in this environment, and the mandate is
from-scratch, NOT a port):

1. **Quad cells** (default): a 2^r × 2^r equirectangular grid over
   lng ∈ [-180, 180), lat ∈ [-90, 90]. Cell ids pack
   ``(r << 58) | (ix << 29) | iy`` into an int64 — deliberately
   reproducible in ANSI SQL (floor arithmetic + bit ops) so the DuckDB
   oracle can verify assignments value-for-value.
2. **S2-style cube-face cells** (fallback encoder): project to the
   unit sphere, pick one of 6 cube faces, quantize the (u, v) face
   coords at level L; pack ``(face << 60) | (i << 30) | j``. Better
   area uniformity near the poles; same API.

All encoders are vectorized over numpy arrays; the ``CellEncoder``
actor-pool stage in join.py amortizes nothing per batch because there
is genuinely no per-batch state — but model-like setup cost is the
pattern the north star pins (N4), so the class shape is kept.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28  # 2^28 cells per axis ≈ 1.5m at the equator


# -- quad cells -------------------------------------------------------------

def latlng_to_cell(lng, lat, res: int):
    """Vectorized lng/lat → int64 quad cell at resolution ``res``.

    Mirrors in SQL as:
        (res::BIGINT << 58)
      | (floor((lng + 180) / 360 * 2^res)::BIGINT << 29)
      |  floor((lat + 90) / 180 * 2^res)::BIGINT
    with the same edge clamping (lng=180 wraps to the last column,
    lat=90 clamps to the top row).
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res out of range: {res}")
    n = 1 << res
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor((lng + 180.0) / 360.0 * n).astype(np.int64)
    iy = np.floor((lat + 90.0) / 180.0 * n).astype(np.int64)
    ix = np.clip(ix, 0, n - 1)
    iy = np.clip(iy, 0, n - 1)
    return (np.int64(res) << np.int64(58)) | (ix << np.int64(29)) | iy


def cell_res(cell):
    return (np.asarray(cell, dtype=np.int64) >> np.int64(58)) & np.int64(0x1F)


def cell_ix(cell):
    return (np.asarray(cell, dtype=np.int64) >> np.int64(29)) & np.int64((1 << 29) - 1)


def cell_iy(cell):
    return np.asarray(cell, dtype=np.int64) & np.int64((1 << 29) - 1)


def pack_cell(res, ix, iy):
    return (
        (np.int64(res) << np.int64(58))
        | (np.asarray(ix, dtype=np.int64) << np.int64(29))
        | np.asarray(iy, dtype=np.int64)
    )


def cell_to_parent(cell, parent_res: int):
    """Coarsen: drop low bits of ix/iy (exact hierarchy: each parent
    contains exactly 4^(r-p) descendants)."""
    r = cell_res(cell)
    shift = (r - parent_res).astype(np.int64)
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell res")
    return pack_cell(parent_res, cell_ix(cell) >> shift, cell_iy(cell) >> shift)


def cell_children(cell: int, child_res: int) -> np.ndarray:
    """All descendants of one cell at ``child_res`` (4^Δ cells)."""
    r = int(cell_res(cell))
    d = child_res - r
    if d < 0:
        raise ValueError("child_res must be >= cell res")
    base_x = int(cell_ix(cell)) << d
    base_y = int(cell_iy(cell)) << d
    k = 1 << d
    xs, ys = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
    return pack_cell(r + d, base_x + xs.ravel(), base_y + ys.ravel())


def cell_bounds(cell):
    """(minlng, minlat, maxlng, maxlat) of cells (vectorized)."""
    r = cell_res(cell)
    n = (np.int64(1) << r).astype(np.float64)
    ix = cell_ix(cell).astype(np.float64)
    iy = cell_iy(cell).astype(np.float64)
    minlng = ix / n * 360.0 - 180.0
    minlat = iy / n * 180.0 - 90.0
    return minlng, minlat, minlng + 360.0 / n, minlat + 180.0 / n


def cell_center(cell):
    minlng, minlat, maxlng, maxlat = cell_bounds(cell)
    return (minlng + maxlng) / 2.0, (minlat + maxlat) / 2.0


def grid_ring(cell: int, k: int) -> np.ndarray:
    """Cells at Chebyshev distance exactly k (the ring), with longitude
    wraparound and latitude clamping (rows beyond the poles drop out).
    k=0 → the cell itself. Used by kNN ring expansion (N6)."""
    r = int(cell_res(cell))
    n = 1 << r
    cx, cy = int(cell_ix(cell)), int(cell_iy(cell))
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    out = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if max(abs(dx), abs(dy)) != k:
                continue
            y = cy + dy
            if y < 0 or y >= n:
                continue  # beyond a pole
            x = (cx + dx) % n  # antimeridian wrap
            out.append((r << 58) | (x << 29) | y)
    return np.asarray(sorted(set(out)), dtype=np.int64)


def grid_disk(cell: int, k: int) -> np.ndarray:
    """Cells at Chebyshev distance <= k."""
    return np.unique(
        np.concatenate([grid_ring(cell, i) for i in range(k + 1)])
    )


def cover_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int
               ) -> np.ndarray:
    """All cells at ``res`` intersecting an lng/lat bbox (polygon
    covering for the join's build side, N5). Handles the antimeridian
    when minx > maxx."""
    n = 1 << res
    def col(lng):
        return min(n - 1, max(0, int(np.floor((lng + 180.0) / 360.0 * n))))
    def row(lat):
        return min(n - 1, max(0, int(np.floor((lat + 90.0) / 180.0 * n))))
    y0, y1 = row(miny), row(maxy)
    ys = np.arange(y0, y1 + 1)
    if minx <= maxx:
        xs = np.arange(col(minx), col(maxx) + 1)
    else:  # crosses the antimeridian
        xs = np.concatenate([np.arange(col(minx), n), np.arange(0, col(maxx) + 1)])
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack_cell(res, gx.ravel(), gy.ravel())


# -- S2-style cube-face cells (fallback encoder) ----------------------------

def s2_latlng_to_cell(lng, lat, level: int):
    """Vectorized lng/lat → cube-face quadtree cell (S2-flavored, from
    scratch: linear u,v projection, no quadratic reparam).

    Packing: (face << 60) | (i << 30) | j, with i,j at ``level`` bits.
    """
    if not 0 <= level <= 29:
        raise ValueError("level out of range")
    lng = np.radians(np.asarray(lng, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    x = np.cos(lat) * np.cos(lng)
    y = np.cos(lat) * np.sin(lng)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # face: 0:+x 1:+y 2:+z 3:-x 4:-y 5:-z
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    # major axis value and (u, v) in [-1, 1]
    major = np.choose(face, [x, y, z, x, y, z])
    u = np.choose(face, [y, -x, x, y, -x, x]) / np.abs(major)
    v = np.choose(face, [z, z, y, z, z, y]) / np.abs(major)
    n = 1 << level
    i = np.clip(np.floor((u + 1.0) / 2.0 * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor((v + 1.0) / 2.0 * n), 0, n - 1).astype(np.int64)
    return (face << np.int64(60)) | (i << np.int64(30)) | j


def s2_latlng_to_cell_parity(lng, lat, level: int):
    """Oracle-parity variant of ``s2_latlng_to_cell`` — same cube-face
    quadtree, but engine-portable to the last bit.

    Why a variant: the plain encoder's face choice and (u, v) divides
    consume raw libm sin/cos outputs, and numpy's vectorized trig may
    differ from DuckDB's by 1 ulp — enough to flip a floor() at a cell
    boundary and break a value-hash oracle (the corpus's 0.01° grid
    really does contain razor angles like lng = ±45°, where
    |x| == |y| to the ulp). The fix quantizes x, y, z ONCE with
    qx = floor(x·10⁷ + 0.5) — floor/multiply/add are IEEE-exact in
    both engines, so after this single step every comparison, the one
    divide (IEEE-identical), and the final floor are bit-equal by
    construction; a 1-ulp libm disagreement now only matters in the
    ~10⁻⁹-wide band where x·10⁷ + 0.5 straddles an integer. Face sign
    tests use qx/qy/qz (not raw x) so both engines decide from the
    same numbers. Same packing as the plain encoder; cells differ from
    it only within ~10⁻⁷ of cell/face boundaries."""
    if not 0 <= level <= 29:
        raise ValueError("level out of range")
    lngr = np.radians(np.asarray(lng, dtype=np.float64))
    latr = np.radians(np.asarray(lat, dtype=np.float64))
    S = 1e7
    qx = np.floor(np.cos(latr) * np.cos(lngr) * S + 0.5)
    qy = np.floor(np.cos(latr) * np.sin(lngr) * S + 0.5)
    qz = np.floor(np.sin(latr) * S + 0.5)
    ax, ay, az = np.abs(qx), np.abs(qy), np.abs(qz)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(qx >= 0, 0, 3),
        np.where(ay >= az, np.where(qy >= 0, 1, 4), np.where(qz >= 0, 2, 5)),
    ).astype(np.int64)
    major = np.choose(face, [ax, ay, az, ax, ay, az])
    u = np.choose(face, [qy, -qx, qx, qy, -qx, qx]) / major
    v = np.choose(face, [qz, qz, qy, qz, qz, qy]) / major
    n = 1 << level
    i = np.clip(np.floor((u + 1.0) / 2.0 * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor((v + 1.0) / 2.0 * n), 0, n - 1).astype(np.int64)
    return (face << np.int64(60)) | (i << np.int64(30)) | j


def s2_cell_to_parent(cell, parent_level: int, level: int):
    """Coarsen an s2-style cell (caller tracks levels; the packing has
    no level field — it trades that for 30-bit axes)."""
    d = np.int64(level - parent_level)
    face = np.asarray(cell, dtype=np.int64) >> np.int64(60)
    i = (np.asarray(cell, dtype=np.int64) >> np.int64(30)) & np.int64((1 << 30) - 1)
    j = np.asarray(cell, dtype=np.int64) & np.int64((1 << 30) - 1)
    return (face << np.int64(60)) | ((i >> d) << np.int64(30)) | (j >> d)
