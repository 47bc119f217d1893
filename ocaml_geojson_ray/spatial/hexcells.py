"""Hexagonal cell index (H3-shaped, from scratch, pure numpy).

The north star names H3; no ``h3`` package exists in this environment
and the mandate is from-scratch, NOT a port. This module provides the
third encoder behind the cells API (quad + S2-style cube face live in
cells.py): a pointy-top hexagonal grid in axial (q, r) ij coordinates
over the equirectangular lng/lat plane.

Design decisions (documented, like the quad grid's):

- **Geometry**: pointy-top hexes of size ``s = 180 / 2^res`` degrees
  (circumradius in projected degrees). Pixel→axial is the standard
  transform q = (√3/3·x − y/3)/s, r = (2y/3)/s with x=lng, y=lat,
  followed by cube rounding to the nearest hex center.
- **Rounding is floor(x + 0.5)** (half-up), NOT round-half-even — so
  the DuckDB oracle can reproduce assignments value-for-value with
  ``floor(x + 0.5)`` (SQL ``round()`` is half-away-from-zero and
  numpy's is half-even; floor(x+0.5) is identical in both).
- **Packing**: ``(res << 58) | ((q + 2^28) << 29) | (r + 2^28)`` into
  int64 — axial coords offset to non-negative; res ≤ 26 keeps |q|,|r|
  < 2^28 with headroom.
- **Hierarchy is approximate** (as in real H3): a hex at res p does
  not exactly tile its res-(p+1) children; ``cell_to_parent`` assigns
  by CENTER containment — the standard hex-hierarchy compromise, and
  the reason the exact quad grid remains the join/oracle default.
- **No antimeridian wrap**: hex width does not divide 360°, so the
  seam column at lng ±180 is split (documented limitation; the quad
  grid wraps and remains the kNN/join default).
"""

from __future__ import annotations

import numpy as np

HEX_MAX_RES = 26
_OFF = np.int64(1 << 28)
_SQRT3 = np.sqrt(3.0)

# axial step directions, pointy-top, counterclockwise from East
HEX_DIRECTIONS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def _hex_size(res: int) -> float:
    return 180.0 / (1 << res)


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Cube-round fractional axial coords to the nearest hex —
    vectorized, with floor(x+0.5) (half-up) rounding so the SQL oracle
    mirrors it exactly."""
    x = qf
    z = rf
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx = np.abs(rx - x)
    dy = np.abs(ry - y)
    dz = np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_z, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def hex_latlng_to_cell(lng, lat, res: int):
    """Vectorized lng/lat → int64 hex cell at ``res``.

    Mirrors in SQL (see queries.SQL_HEX_CELL_COUNTS): the axial
    transform, floor(x+0.5) cube rounding, and the bit packing are all
    plain double arithmetic + CASE, evaluated in the same operation
    order, so assignments match DuckDB bit-for-bit."""
    if not 0 <= res <= HEX_MAX_RES:
        raise ValueError(f"res out of range: {res}")
    s = _hex_size(res)
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    qf = (_SQRT3 / 3.0 * lng - lat / 3.0) / s
    rf = (2.0 * lat / 3.0) / s
    q, r = _axial_round(qf, rf)
    return (
        (np.int64(res) << np.int64(58))
        | ((q + _OFF) << np.int64(29))
        | (r + _OFF)
    )


def hex_cell_res(cell):
    return (np.asarray(cell, dtype=np.int64) >> np.int64(58)) & np.int64(0x1F)


def hex_cell_qr(cell):
    """→ (q, r) axial coordinates (the ij index)."""
    c = np.asarray(cell, dtype=np.int64)
    q = ((c >> np.int64(29)) & np.int64((1 << 29) - 1)) - _OFF
    r = (c & np.int64((1 << 29) - 1)) - _OFF
    return q, r


def hex_pack(res, q, r):
    return (
        (np.int64(res) << np.int64(58))
        | ((np.asarray(q, dtype=np.int64) + _OFF) << np.int64(29))
        | (np.asarray(r, dtype=np.int64) + _OFF)
    )


def hex_cell_center(cell):
    """→ (lng, lat) of cell centers (vectorized; exact inverse of the
    axial transform at the rounded integer coords)."""
    res = hex_cell_res(cell)
    s = 180.0 / (np.int64(1) << res).astype(np.float64)
    q, r = hex_cell_qr(cell)
    qf = q.astype(np.float64)
    rf = r.astype(np.float64)
    lng = s * _SQRT3 * (qf + rf / 2.0)
    lat = s * 1.5 * rf
    return lng, lat


def hex_distance(a, b) -> np.ndarray:
    """Hex grid distance (number of steps) between cells of equal res."""
    qa, ra = hex_cell_qr(a)
    qb, rb = hex_cell_qr(b)
    dq = qa - qb
    dr = ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def hex_ring(cell: int, k: int) -> np.ndarray:
    """Cells at hex distance exactly k — the classic 6k-cell ring walk
    (k=0 → the cell itself)."""
    res = int(hex_cell_res(cell))
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    q, r = hex_cell_qr(cell)
    q, r = int(q), int(r)
    # start k steps in direction 4, then walk the 6 sides
    q += HEX_DIRECTIONS[4][0] * k
    r += HEX_DIRECTIONS[4][1] * k
    out = []
    for side in range(6):
        dq, dr = HEX_DIRECTIONS[side]
        for _ in range(k):
            out.append(hex_pack(res, q, r))
            q += dq
            r += dr
    return np.asarray(sorted(int(c) for c in out), dtype=np.int64)


def hex_disk(cell: int, k: int) -> np.ndarray:
    """Cells at hex distance ≤ k (1 + 3k(k+1) cells)."""
    return np.unique(
        np.concatenate([hex_ring(cell, i) for i in range(k + 1)])
    )


def hex_cell_to_parent(cell, parent_res: int):
    """Coarsen by CENTER containment (approximate hierarchy — hexes do
    not nest exactly; same compromise as real H3 aperture-7)."""
    res = hex_cell_res(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    lng, lat = hex_cell_center(cell)
    return hex_latlng_to_cell(lng, lat, parent_res)


def hex_cell_counts_batch(batch, res: int = 6,
                          lng_col: str = "lng", lat_col: str = "lat"):
    """map_batches step: assign hex cells + per-batch partial counts
    (pre-aggregation before the groupby, as the quad/tile stages do)."""
    import pyarrow as pa

    lng = batch[lng_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    ok = ~(np.isnan(lng) | np.isnan(lat))
    cells = hex_latlng_to_cell(np.where(ok, lng, 0.0), np.where(ok, lat, 0.0), res)
    cells = cells[ok]
    uniq, cnt = np.unique(cells, return_counts=True)
    return pa.table({
        "hex_cell": pa.array(uniq, pa.int64()),
        "partial_count": pa.array(cnt.astype(np.int64), pa.int64()),
    })
