"""Skeleton-driven random GeoJSON generator.

Re-expression of the reference's ``Random`` module
(reference: src/geojson/geojson.ml:625-678, interface
geojson_intf.ml:370-399): you describe the document shape, supply a
float source, and get a valid GeoJson back. Polygons auto-close their
single ring by overwriting the last point with the first
(geojson.ml:671-674).

Skeletons are plain tuples/lists:
    ("Point",)
    ("MultiPoint", n) | ("LineString", n) | ("Polygon", n)
    ("MultiLineString", i, j) | ("MultiPolygon", i, j)
    ("Collection", [skel, ...])
Feature skeleton: {"properties": <json|None>, "geometry": skel}
Top level: ("FC", [feature_skel...]) | ("F", feature_skel) | ("G", skel)
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .model import Feature, FeatureCollection, GeoJson, Geometry


def random(f: Callable[[], float], skeleton) -> GeoJson:
    """``random ~f r`` (geojson.ml:638-678)."""
    tag = skeleton[0]
    if tag == "FC":
        feats = [_random_feature(f, fs) for fs in skeleton[1]]
        return GeoJson(FeatureCollection(features=feats))
    if tag == "F":
        return GeoJson(_random_feature(f, skeleton[1]))
    if tag == "G":
        return GeoJson(_random_geometry(f, skeleton[1]))
    raise ValueError(f"bad skeleton tag {tag}")


def _random_feature(f, spec) -> Feature:
    props = spec.get("properties")
    geom = _random_geometry(f, spec["geometry"])
    return Feature(
        geometry=geom,
        properties=props,
        properties_present=props is not None,
    )


def _random_point(f):
    # one draw for lat, one for lng (geojson.ml:669-670)
    lat = f()
    lng = f()
    return [lng, lat]


def _random_polygon(f, i):
    pts = [_random_point(f) for _ in range(i)]
    pts[i - 1] = list(pts[0])  # auto-close (geojson.ml:671-674)
    return [pts]


def _random_geometry(f, skel) -> Geometry:
    tag = skel[0]
    if tag == "Point":
        return Geometry("Point", _random_point(f))
    if tag == "MultiPoint":
        return Geometry("MultiPoint", [_random_point(f) for _ in range(skel[1])])
    if tag == "LineString":
        return Geometry("LineString", [_random_point(f) for _ in range(skel[1])])
    if tag == "MultiLineString":
        i, j = skel[1], skel[2]
        return Geometry(
            "MultiLineString",
            [[_random_point(f) for _ in range(j)] for _ in range(i)],
        )
    if tag == "Polygon":
        return Geometry("Polygon", _random_polygon(f, skel[1]))
    if tag == "MultiPolygon":
        i, j = skel[1], skel[2]
        return Geometry("MultiPolygon", [_random_polygon(f, j) for _ in range(i)])
    if tag == "Collection":
        return Geometry(
            "GeometryCollection",
            geometries=[_random_geometry(f, s) for s in skel[1]],
        )
    raise ValueError(f"bad geometry skeleton {tag}")


def seeded_float_source(
    seed: int, lo: float = -180.0, hi: float = 180.0, decimals: Optional[int] = 6
):
    """Deterministic float source for tests/benchmarks (numpy PCG64).

    ``decimals`` quantizes draws (default 6, typical GeoJSON precision)
    so the canonical ``%.16g`` text encoding is lossless and text-level
    round-trips are exact. Pass ``decimals=None`` for raw doubles (the
    reference's value-level round-trip test doesn't go through text,
    test/geojson/test.ml:456, so raw doubles are fine there).
    """
    rng = np.random.default_rng(seed)

    def f() -> float:
        x = float(rng.uniform(lo, hi))
        return round(x, decimals) if decimals is not None else x

    return f
