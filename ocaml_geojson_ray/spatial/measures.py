"""Vectorized planar geometry measures (round 3).

Area (shoelace), perimeter, and centroid over ring coordinate arrays —
the measure functions a spatial-engine user reaches for right after
parse/join/tile. All kernels are flat-expansion numpy over a batch of
rings (offsets + reduceat), no per-ring Python in the hot path.

Conventions (documented, as for the PIP rule):
- planar degrees (no geodesic correction — the engine's join/tile
  layers are planar too);
- ring area is the ABSOLUTE shoelace value (winding-insensitive);
  polygon area = exterior − Σ interior rings is the caller's
  composition (``polygon_area``);
- centroid is the area-weighted ring centroid (degenerate zero-area
  rings fall back to the vertex mean).
"""

from __future__ import annotations

import numpy as np


def _ring_arrays(rings):
    """list of (n_i, 2) float arrays → (flat pts, offsets) with each
    ring's closing vertex dropped if present."""
    cleaned = []
    for r in rings:
        a = np.asarray(r, dtype=np.float64)
        if len(a) > 1 and a[0][0] == a[-1][0] and a[0][1] == a[-1][1]:
            a = a[:-1]
        cleaned.append(a)
    sizes = np.fromiter((len(a) for a in cleaned), dtype=np.int64,
                        count=len(cleaned))
    flat = (np.concatenate(cleaned) if cleaned else
            np.zeros((0, 2), dtype=np.float64))
    offs = np.concatenate([[0], np.cumsum(sizes)])
    return flat, offs


def rings_cross_terms(rings):
    """Per-ring shoelace cross terms Σ (x_i·y_{i+1} − x_{i+1}·y_i)
    (signed, cyclic), vectorized over all rings at once."""
    flat, offs = _ring_arrays(rings)
    n = len(offs) - 1
    if len(flat) == 0:
        return np.zeros(n, dtype=np.float64)
    sizes = np.diff(offs)
    # next-vertex index with cyclic wrap inside each ring
    idx = np.arange(len(flat), dtype=np.int64)
    nxt = idx + 1
    ends = offs[1:] - 1
    nxt[ends[sizes > 0]] = offs[:-1][sizes > 0]
    cross = flat[idx, 0] * flat[nxt, 1] - flat[nxt, 0] * flat[idx, 1]
    out = np.zeros(n, dtype=np.float64)
    nz = sizes > 0
    starts = offs[:-1][nz]
    out[nz] = np.add.reduceat(cross, starts) if len(starts) else 0.0
    return out


def ring_areas(rings):
    """Absolute shoelace area per ring."""
    return 0.5 * np.abs(rings_cross_terms(rings))


def ring_perimeters(rings):
    """Closed-ring perimeter per ring (cyclic edge lengths)."""
    flat, offs = _ring_arrays(rings)
    n = len(offs) - 1
    if len(flat) == 0:
        return np.zeros(n, dtype=np.float64)
    sizes = np.diff(offs)
    idx = np.arange(len(flat), dtype=np.int64)
    nxt = idx + 1
    ends = offs[1:] - 1
    nxt[ends[sizes > 0]] = offs[:-1][sizes > 0]
    d = flat[nxt] - flat[idx]
    seg = np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    out = np.zeros(n, dtype=np.float64)
    nz = sizes > 0  # a 1-vertex ring self-links → zero-length edge
    starts = offs[:-1][nz]
    if len(starts):
        out[nz] = np.add.reduceat(seg, starts)
    return out


def ring_centroids(rings):
    """(n, 2) area-weighted centroids; zero-area rings use the vertex
    mean (the standard degenerate fallback)."""
    flat, offs = _ring_arrays(rings)
    n = len(offs) - 1
    out = np.zeros((n, 2), dtype=np.float64)
    if len(flat) == 0:
        return out
    sizes = np.diff(offs)
    idx = np.arange(len(flat), dtype=np.int64)
    nxt = idx + 1
    ends = offs[1:] - 1
    nxt[ends[sizes > 0]] = offs[:-1][sizes > 0]
    cross = flat[idx, 0] * flat[nxt, 1] - flat[nxt, 0] * flat[idx, 1]
    cx = (flat[idx, 0] + flat[nxt, 0]) * cross
    cy = (flat[idx, 1] + flat[nxt, 1]) * cross
    nz = sizes > 0
    starts = offs[:-1][nz]
    a2 = np.zeros(n)
    sx = np.zeros(n)
    sy = np.zeros(n)
    if len(starts):
        a2[nz] = np.add.reduceat(cross, starts)
        sx[nz] = np.add.reduceat(cx, starts)
        sy[nz] = np.add.reduceat(cy, starts)
    good = np.abs(a2) > 0
    out[good, 0] = sx[good] / (3.0 * a2[good])
    out[good, 1] = sy[good] / (3.0 * a2[good])
    # degenerate: vertex mean
    bad = ~good & (sizes > 0)
    if bad.any():
        sums = np.add.reduceat(flat, offs[:-1][sizes > 0], axis=0)
        means = sums / sizes[sizes > 0][:, None]
        # map back: rows of `means` align with the sizes>0 subset
        pos = np.cumsum(sizes > 0) - 1
        out[bad] = means[pos[bad]]
    return out


def polygon_area(rings_per_poly):
    """list (per polygon) of ring lists → exterior − Σ interiors."""
    out = np.empty(len(rings_per_poly), dtype=np.float64)
    for i, rings in enumerate(rings_per_poly):
        a = ring_areas(rings)
        out[i] = a[0] - a[1:].sum() if len(a) else 0.0
    return out
