"""Vectorized point-in-polygon (ray casting).

The refinement step of the cell-bucketed spatial join (SURVEY.md §2.2
N5). One fixed, documented tie-break rule (SURVEY.md §7 hard part (c)):

**Half-open edge rule (even-odd / crossing number):** an edge from
(x1,y1) to (x2,y2) is crossed by the rightward ray from (px,py) iff
``(y1 > py) != (y2 > py)`` and the edge's x at py is strictly greater
than px. Consequences, pinned by tests:

- a point exactly on a *horizontal* edge is OUTSIDE unless another
  crossing makes it inside;
- a point on a left/bottom boundary is INSIDE, on a right/top boundary
  OUTSIDE (half-open cells tile the plane with no double counting);
- vertices are never double-counted (the strict/non-strict asymmetry).

Holes need no special casing: parity over ALL rings (exterior +
interior) implements even-odd with holes.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing parity of n points against one ring (m vertices).

    px, py: (n,) float64; ring: (m, 2) float64 (closed or open — the
    wrap edge is always included). Returns (n,) bool of crossing-count
    oddness. O(n*m) fully vectorized.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    # drop degenerate wrap edge if ring is explicitly closed
    keep = ~((x1 == x2) & (y1 == y2))
    x1, y1, x2, y2 = x1[keep], y1[keep], x2[keep], y2[keep]
    if x1.size == 0:
        return np.zeros(px.shape, dtype=bool)
    # (n, m) broadcasting; straddle = edge spans the point's latitude
    straddle = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py[:, None] - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
            x2[None, :] - x1[None, :]
        )
    crossed = straddle & (px[:, None] < xint)
    return (crossed.sum(axis=1) & 1).astype(bool)


def points_in_polygon(px, py, rings) -> np.ndarray:
    """Even-odd PIP with holes: parity over all rings."""
    px = np.asarray(px, dtype=np.float64)
    parity = np.zeros(px.shape, dtype=np.int64)
    for ring in rings:
        parity += points_in_ring(px, py, np.asarray(ring, dtype=np.float64))
    return (parity & 1).astype(bool)


def point_segment_dist2(px, py, x1, y1, x2, y2):
    """Squared planar distance from points (n,) to segments (m,) —
    (n, m) result. Used by kNN distance refinement against polygon
    boundaries."""
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1 = np.asarray(x1, dtype=np.float64)[None, :]
    y1 = np.asarray(y1, dtype=np.float64)[None, :]
    x2 = np.asarray(x2, dtype=np.float64)[None, :]
    y2 = np.asarray(y2, dtype=np.float64)[None, :]
    dx = x2 - x1
    dy = y2 - y1
    seg2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / seg2
    t = np.where(seg2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    cx = x1 + t * dx
    cy = y1 + t * dy
    return (px - cx) ** 2 + (py - cy) ** 2


def polygon_boundary_dist2(px, py, rings) -> np.ndarray:
    """Min squared distance from each point to a polygon's boundary."""
    best = np.full(np.asarray(px).shape, np.inf)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        keep = ~((x1 == x2) & (y1 == y2))
        d2 = point_segment_dist2(px, py, x1[keep], y1[keep], x2[keep], y2[keep])
        best = np.minimum(best, d2.min(axis=1))
    return best


def polygon_dist2(px, py, rings) -> np.ndarray:
    """Squared distance to a polygon: 0 inside, boundary distance out."""
    inside = points_in_polygon(px, py, rings)
    d2 = polygon_boundary_dist2(px, py, rings)
    return np.where(inside, 0.0, d2)
