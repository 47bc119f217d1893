"""Polygon/polyline simplification — Douglas-Peucker, from scratch.

The geometry-reduction operator a tiling/rendering pipeline runs right
before serving (fewer vertices per zoom level): keep the subset of
vertices such that every dropped vertex lies within ``tol`` of the
simplified chain (the classic DP guarantee).

Shapes:
- per-chain work is an ITERATIVE stack of spans (no recursion depth
  limit) with the point-to-segment distance kernel fully vectorized
  over each span — the only Python loop is over spans, O(kept) pops;
- closed rings anchor at vertex 0 and the vertex FARTHEST from it,
  then simplify the two open chains (the standard closed-ring
  adaptation — two anchors make the seed segment non-degenerate);
- batch-level entry loops over rows (bounded per batch; each row's
  inner work is numpy) — same convention as measures.polygon_area.
"""

from __future__ import annotations

import numpy as np


def _seg_dists(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular distances of ``pts`` (n,2) to SEGMENT a→b (clamped
    to the segment, so degenerate a==b falls back to point distance)."""
    ab = b - a
    denom = float(ab @ ab)
    if denom == 0.0:
        d = pts - a
        return np.sqrt((d * d).sum(axis=1))
    t = np.clip(((pts - a) @ ab) / denom, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d = pts - proj
    return np.sqrt((d * d).sum(axis=1))


def simplify_open(pts: np.ndarray, tol: float) -> np.ndarray:
    """DP on an open polyline: returns SORTED indices of kept vertices
    (always includes both endpoints)."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        mid = pts[i + 1:j]
        d = _seg_dists(mid, pts[i], pts[j])
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return np.flatnonzero(keep).astype(np.int64)


def simplify_ring(ring, tol: float) -> np.ndarray:
    """DP on a CLOSED ring (open representation, no repeated closing
    vertex): anchors = vertex 0 and the farthest vertex from it; the
    result keeps ≥ 3 vertices when the input has ≥ 3 (degenerate-ring
    guard: a 2-point 'ring' would vanish as a polygon)."""
    pts = np.asarray(ring, dtype=np.float64)
    n = len(pts)
    if n <= 3:
        return np.arange(n, dtype=np.int64)
    d0 = pts - pts[0]
    far = int(np.argmax((d0 * d0).sum(axis=1)))
    if far == 0:  # all vertices identical
        return np.array([0, 1, 2], dtype=np.int64)
    k1 = simplify_open(pts[: far + 1], tol)
    # second chain closes back to vertex 0 so the wrap segment is a
    # real DP segment (index far+i maps to (far+i) mod n; the closing
    # row IS vertex 0)
    chain2 = np.vstack([pts[far:], pts[0:1]])
    k2 = (simplify_open(chain2, tol) + far) % n
    kept = np.unique(np.concatenate([k1, k2]))
    if len(kept) < 3:
        # guarantee a non-degenerate ring: add the vertex farthest
        # from the kept segment
        rest = np.setdiff1d(np.arange(n), kept)
        d = _seg_dists(pts[rest], pts[kept[0]], pts[kept[-1]])
        kept = np.sort(np.append(kept, rest[int(np.argmax(d))]))
    return kept


def max_deviation(ring: np.ndarray, kept_idx: np.ndarray) -> float:
    """Max distance from any DROPPED vertex to the simplified closed
    chain — the verification kernel for the DP guarantee (brute force
    over kept segments; used by tests and the query self-check)."""
    pts = np.asarray(ring, dtype=np.float64)
    kept = np.asarray(sorted(kept_idx), dtype=np.int64)
    dropped = np.setdiff1d(np.arange(len(pts)), kept)
    if len(dropped) == 0:
        return 0.0
    dp = pts[dropped]
    best = np.full(len(dp), np.inf)
    cyc = np.append(kept, kept[0])
    for a, b in zip(cyc[:-1], cyc[1:]):
        best = np.minimum(best, _seg_dists(dp, pts[a], pts[b]))
    return float(best.max())
