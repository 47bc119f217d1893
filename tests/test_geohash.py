"""Geohash encoder properties (spatial/geohash.py)."""

from __future__ import annotations

import numpy as np

from ocaml_geojson_ray.spatial.geohash import (
    ALPHABET,
    geohash_decode_bounds,
    geohash_encode,
)


def test_public_vectors():
    # the two canonical published examples (Niemeyer / Wikipedia)
    assert geohash_encode([10.40744], [57.64911], 11)[0] == "u4pruydqqvj"
    assert geohash_encode([-5.60302], [42.60498], 5)[0] == "ezs42"


def test_edges_clamp_and_wrap():
    got = geohash_encode([180.0, -180.0, 0.0], [90.0, -90.0, 0.0], 6)
    assert got[0] == "zzzzzz"   # top-right corner clamps into last cell
    assert got[1] == "000000"
    assert got[2] == "s00000"   # the classic (0,0) prefix


def test_roundtrip_bounds_contain_point():
    rng = np.random.default_rng(3)
    lng = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    for p in (1, 4, 7, 12):
        hashes = geohash_encode(lng, lat, p)
        for x, y, h in zip(lng, lat, hashes):
            assert len(h) == p and all(c in ALPHABET for c in h)
            minlng, minlat, maxlng, maxlat = geohash_decode_bounds(h)
            assert minlng <= x < maxlng + 1e-12
            assert minlat <= y < maxlat + 1e-12


def test_prefix_property():
    # direct quantization reproduces the bisection stream, so the
    # precision-p hash is a prefix of the precision-(p+1) hash
    rng = np.random.default_rng(5)
    lng = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    prev = geohash_encode(lng, lat, 1)
    for p in range(2, 13):
        cur = geohash_encode(lng, lat, p)
        assert all(c.startswith(q) for c, q in zip(cur, prev))
        prev = cur


def test_neighbors_symmetric_and_adjacent():
    from ocaml_geojson_ray.spatial.geohash import geohash_neighbors

    for h in ("u4pru", "ezs42", "s0000", "7zzzz"):
        ns = geohash_neighbors(h)
        assert 3 <= len(ns) <= 8 and h not in ns
        for n in ns:
            assert len(n) == len(h)
            assert h in geohash_neighbors(n)  # symmetry
            # boxes touch: gap between bounds is zero in one axis
            a = geohash_decode_bounds(h)
            b = geohash_decode_bounds(n)
            lng_gap = max(a[0], b[0]) - min(a[2], b[2])
            lat_gap = max(a[1], b[1]) - min(a[3], b[3])
            assert lng_gap <= 1e-9 or abs(lng_gap - (-360 + (a[2]-a[0]) + (b[2]-b[0]))) < 1
            assert lat_gap <= 1e-9


def test_neighbors_pole_and_antimeridian():
    from ocaml_geojson_ray.spatial.geohash import geohash_neighbors

    # north-pole cell: the northern row drops out
    top = geohash_encode([0.0], [89.99], 4)[0]
    ns = geohash_neighbors(top)
    assert len(ns) == 5
    # antimeridian cell: west neighbors wrap to lng≈+180
    west_edge = geohash_encode([-179.99], [0.0], 4)[0]
    ns2 = geohash_neighbors(west_edge)
    assert len(ns2) == 8
    wrapped = geohash_encode([179.99], [0.0], 4)[0]
    assert wrapped in ns2


def test_neighbors_share_prefix_statistically():
    # points inside one high-precision cell encode identically
    h = geohash_encode([12.345678], [45.678901], 8)[0]
    minlng, minlat, maxlng, maxlat = geohash_decode_bounds(h)
    rng = np.random.default_rng(9)
    xs = rng.uniform(minlng, np.nextafter(maxlng, minlng), 50)
    ys = rng.uniform(minlat, np.nextafter(maxlat, minlat), 50)
    assert set(geohash_encode(xs, ys, 8).tolist()) == {h}
