"""Douglas-Peucker simplification properties (spatial/simplify.py)."""

from __future__ import annotations

import numpy as np

from ocaml_geojson_ray.spatial.simplify import (
    max_deviation,
    simplify_open,
    simplify_ring,
)


def wiggly_ring(seed: int, n: int, wiggle: float) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(n) / n
    r = 1.0 + wiggle * rng.random(n)
    return np.column_stack([r * np.cos(ang), r * np.sin(ang)])


def test_open_endpoints_and_subsequence():
    rng = np.random.default_rng(1)
    pts = rng.random((50, 2))
    kept = simplify_open(pts, 0.05)
    assert kept[0] == 0 and kept[-1] == 49
    assert np.all(np.diff(kept) > 0)


def test_open_collinear_collapses():
    pts = np.column_stack([np.arange(10.0), 2.0 * np.arange(10.0)])
    kept = simplify_open(pts, 0.0)
    assert kept.tolist() == [0, 9]


def test_ring_guarantee_and_idempotence():
    for seed in range(10):
        ring = wiggly_ring(seed, 60, 0.3)
        for tol in (0.01, 0.05, 0.2):
            kept = simplify_ring(ring, tol)
            assert len(kept) >= 3
            assert max_deviation(ring, kept) <= tol + 1e-12
            # idempotence: simplifying the simplified ring is a no-op
            again = simplify_ring(ring[kept], tol)
            assert len(again) == len(kept)


def test_ring_reduces_vertex_count():
    ring = wiggly_ring(3, 120, 0.05)
    kept = simplify_ring(ring, 0.1)
    assert len(kept) < 30  # strong reduction on a low-wiggle ring


def test_degenerate_rings():
    tri = np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
    assert simplify_ring(tri, 10.0).tolist() == [0, 1, 2]
    dup = np.zeros((7, 2))
    assert len(simplify_ring(dup, 0.1)) == 3
