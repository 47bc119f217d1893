"""Deterministic synthetic polygon layer (admin-boundary-like).

The join/kNN/tiling side (FIXTURES.md §1): star-convex polygons around
seeded centers, with a hot-spot cluster (a synthetic "urban mega-cell")
so skew handling (SURVEY.md §2.2 N9) has something real to chew on.

Schema:
    poly_id:int64, name:string, geometry_json:string (canonical GeoJSON
    Polygon), rings:list<list<list<f64>>>, minx/miny/maxx/maxy:f64
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..core.jsontext import dumps_json


def _polygon_ring(rng: np.random.Generator, cx: float, cy: float, r: float):
    """Star-convex closed ring around (cx, cy), 6-14 vertices, 5-decimal
    coords (lossless through %.16g)."""
    n = int(rng.integers(6, 15))
    ang = np.sort(rng.uniform(0, 2 * np.pi, size=n))
    rad = r * rng.uniform(0.5, 1.0, size=n)
    xs = np.round(cx + rad * np.cos(ang), 5)
    ys = np.round(np.clip(cy + rad * np.sin(ang), -89.9, 89.9), 5)
    ring = [[float(x), float(y)] for x, y in zip(xs, ys)]
    ring.append(list(ring[0]))  # closed
    return ring


def make_polygons(n_polys: int, seed: int = 137, hot_frac: float = 0.3):
    """Build the layer driver-side (it's the SMALL side of the join —
    broadcast via ray.put, never shuffled). ``hot_frac`` of polygons
    cluster inside one ~1°×1° hot spot to create key skew."""
    rng = np.random.default_rng(seed)
    rows = []
    hot_cx, hot_cy = 2.3, 48.8  # the "urban" hot spot
    for pid in range(n_polys):
        hot = rng.random() < hot_frac
        if hot:
            cx = float(rng.uniform(hot_cx - 0.5, hot_cx + 0.5))
            cy = float(rng.uniform(hot_cy - 0.5, hot_cy + 0.5))
            r = float(rng.uniform(0.01, 0.08))
        else:
            cx = float(rng.uniform(-179.0, 179.0))
            cy = float(rng.uniform(-70.0, 70.0))
            r = float(rng.uniform(0.05, 2.0))
        ring = _polygon_ring(rng, cx, cy, r)
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        rows.append(
            {
                "poly_id": pid,
                "name": f"admin_{pid}",
                "geometry_json": dumps_json(
                    {"type": "Polygon", "coordinates": [ring]}
                ),
                "rings": [ring],
                "minx": min(xs),
                "miny": min(ys),
                "maxx": max(xs),
                "maxy": max(ys),
            }
        )
    return rows


def polygons_table(n_polys: int, seed: int = 137) -> pa.Table:
    rows = make_polygons(n_polys, seed)
    return pa.table(
        {
            "poly_id": pa.array([r["poly_id"] for r in rows], pa.int64()),
            "name": pa.array([r["name"] for r in rows], pa.string()),
            "geometry_json": pa.array([r["geometry_json"] for r in rows], pa.string()),
            "rings": pa.array(
                [r["rings"] for r in rows],
                pa.list_(pa.list_(pa.list_(pa.float64()))),
            ),
            "minx": pa.array([r["minx"] for r in rows], pa.float64()),
            "miny": pa.array([r["miny"] for r in rows], pa.float64()),
            "maxx": pa.array([r["maxx"] for r in rows], pa.float64()),
            "maxy": pa.array([r["maxy"] for r in rows], pa.float64()),
        }
    )


def generate_polygon_layer(
    sf: float, root: str = "/tmp/ogr_data", seed: int = 137, force: bool = False
) -> str:
    """Write (once) the polygon layer parquet for a scale factor."""
    import pyarrow.parquet as pq

    out = os.path.join(root, f"polygons_sf{sf}")
    path = os.path.join(out, "polygons.parquet")
    if os.path.exists(path) and not force:
        return path
    os.makedirs(out, exist_ok=True)
    n = max(50, int(sf * 20_000))
    pq.write_table(polygons_table(n, seed), path)
    return path
