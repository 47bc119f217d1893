"""Spatial-core fixtures with hand-computed answers (FIXTURES.md §6):
cell round-trips, ring symmetry, PIP on-edge tie-break rule, tile zoom
boundaries."""

import numpy as np
import pytest

from ocaml_geojson_ray.spatial import cells, pip, tiles


# -- cells ------------------------------------------------------------------

def test_cell_roundtrip_center():
    """cell → center → cell is identity (SURVEY.md §7 step 4)."""
    rng = np.random.default_rng(7)
    lng = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for res in (0, 1, 5, 10, 15, 20):
        c = cells.latlng_to_cell(lng, lat, res)
        clng, clat = cells.cell_center(c)
        c2 = cells.latlng_to_cell(clng, clat, res)
        assert np.array_equal(c, c2), res


def test_cell_parent_contains():
    rng = np.random.default_rng(8)
    lng = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    fine = cells.latlng_to_cell(lng, lat, 12)
    coarse = cells.latlng_to_cell(lng, lat, 7)
    assert np.array_equal(cells.cell_to_parent(fine, 7), coarse)


def test_cell_children_partition():
    c = cells.latlng_to_cell(2.3, 48.8, 5)
    kids = cells.cell_children(int(c), 8)
    assert len(kids) == 4 ** 3
    assert np.array_equal(np.unique(cells.cell_to_parent(kids, 5)), [c])


def test_cell_edges():
    """lng=180 wraps into the last column; lat=±90 clamps."""
    res = 4
    n = 1 << res
    c = cells.latlng_to_cell(180.0, 90.0, res)
    assert int(cells.cell_ix(c)) == n - 1
    assert int(cells.cell_iy(c)) == n - 1
    c = cells.latlng_to_cell(-180.0, -90.0, res)
    assert int(cells.cell_ix(c)) == 0 and int(cells.cell_iy(c)) == 0


def test_grid_ring():
    c = int(cells.latlng_to_cell(0.0, 0.0, 6))
    assert list(cells.grid_ring(c, 0)) == [c]
    r1 = cells.grid_ring(c, 1)
    assert len(r1) == 8
    # ring symmetry: every ring-1 neighbor has c in ITS ring 1
    for nb in r1:
        assert c in cells.grid_ring(int(nb), 1)
    r2 = cells.grid_ring(c, 2)
    assert len(r2) == 16
    assert len(cells.grid_disk(c, 2)) == 25


def test_grid_ring_antimeridian_wrap():
    res = 4
    c = int(cells.latlng_to_cell(-179.9, 0.0, res))  # column 0
    ring = cells.grid_ring(c, 1)
    assert len(ring) == 8  # wraps, nothing dropped
    cols = set(int(x) for x in cells.cell_ix(ring))
    assert (1 << res) - 1 in cols  # wrapped to the last column


def test_grid_ring_pole_clamp():
    res = 4
    n = 1 << res
    c = int(cells.pack_cell(res, 5, n - 1))  # top row
    ring = cells.grid_ring(c, 1)
    assert len(ring) == 5  # 3 cells above the pole dropped


def test_cover_bbox():
    got = cells.cover_bbox(-1.0, -1.0, 1.0, 1.0, 8)
    # at res 8 each cell is 360/256 = 1.40625° wide: bbox spans 2 cols
    # (floor((179)/360*256)=127, floor(181/360*256)=128) × 2 rows... rows:
    # (89/180*256)=126.6→126, (91/180*256)=129.4→129 → rows 126..129? No:
    # lat cell height is 180/256=0.703°, so -1..1 spans rows 126..129.
    xs = np.unique(cells.cell_ix(got))
    ys = np.unique(cells.cell_iy(got))
    assert list(xs) == [127, 128]
    assert list(ys) == [126, 127, 128, 129]


def test_cover_bbox_antimeridian():
    got = cells.cover_bbox(179.0, 0.0, -179.0, 1.0, 6)
    xs = set(int(x) for x in cells.cell_ix(got))
    assert 0 in xs and 63 in xs


def test_s2_cells_faces():
    lngs = np.array([0.0, 90.0, 179.9, -90.0, 0.0, 0.0])
    lats = np.array([0.0, 0.0, 0.0, 0.0, 89.9, -89.9])
    c = cells.s2_latlng_to_cell(lngs, lats, 10)
    faces = c >> np.int64(60)
    assert list(faces) == [0, 1, 3, 4, 2, 5]


def test_s2_cell_locality():
    """Nearby points share coarse cells; antipodal ones don't."""
    a = cells.s2_latlng_to_cell(2.3000, 48.8000, 12)
    b = cells.s2_latlng_to_cell(2.3001, 48.8001, 12)
    far = cells.s2_latlng_to_cell(-177.7, -48.8, 12)
    assert cells.s2_cell_to_parent(a, 6, 12) == cells.s2_cell_to_parent(b, 6, 12)
    assert a != far


# -- PIP --------------------------------------------------------------------

UNIT_SQUARE = [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]


def test_pip_basic():
    px = np.array([0.5, 1.5, -0.5, 0.999999, 0.000001])
    py = np.array([0.5, 0.5, 0.5, 0.5, 0.5])
    got = pip.points_in_polygon(px, py, UNIT_SQUARE)
    assert list(got) == [True, False, False, True, True]


def test_pip_on_edge_tiebreak():
    """The documented half-open rule: left/bottom boundary IN,
    right/top boundary OUT, corners follow the same parity."""
    cases = [
        ((0.0, 0.5), True),   # left edge: in
        ((1.0, 0.5), False),  # right edge: out
        ((0.5, 0.0), True),   # bottom edge: in
        ((0.5, 1.0), False),  # top edge: out
        ((0.0, 0.0), True),   # bottom-left corner: in
        ((1.0, 1.0), False),  # top-right corner: out
        ((0.0, 1.0), False),  # top-left corner: out (top is open)
        ((1.0, 0.0), False),  # bottom-right corner: out (right is open)
    ]
    px = np.array([c[0][0] for c in cases])
    py = np.array([c[0][1] for c in cases])
    got = pip.points_in_polygon(px, py, UNIT_SQUARE)
    for (pt, want), g in zip(cases, got):
        assert g == want, (pt, want, bool(g))


def test_pip_hole():
    rings = UNIT_SQUARE + [
        [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]]
    ]
    px = np.array([0.5, 0.1, 0.26])
    py = np.array([0.5, 0.1, 0.5])
    got = pip.points_in_polygon(px, py, rings)
    assert list(got) == [False, True, False]  # center is in the hole


def test_pip_half_open_tiles_plane():
    """Two squares sharing an edge: every point on the shared edge
    belongs to exactly one (no double counting, no gaps)."""
    left = [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]]
    right = [[[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 0.0]]]
    py = np.array([0.2, 0.5, 0.8])
    px = np.ones_like(py)  # on the shared edge x=1
    in_l = pip.points_in_polygon(px, py, left)
    in_r = pip.points_in_polygon(px, py, right)
    assert np.all(in_l ^ in_r)


def test_pip_open_ring_same_as_closed():
    open_ring = [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]]
    px = np.array([0.5, 1.5])
    py = np.array([0.5, 0.5])
    assert list(pip.points_in_polygon(px, py, open_ring)) == [True, False]


def test_polygon_dist2():
    px = np.array([0.5, 2.0, 0.5])
    py = np.array([0.5, 0.5, -1.0])
    d2 = pip.polygon_dist2(px, py, UNIT_SQUARE)
    assert d2[0] == 0.0
    assert d2[1] == pytest.approx(1.0)
    assert d2[2] == pytest.approx(1.0)


# -- tiles ------------------------------------------------------------------

def test_point_to_tile_known_values():
    # z=0: everything in tile (0,0)
    x, y = tiles.point_to_tile(np.array([0.0]), np.array([0.0]), 0)
    assert (int(x[0]), int(y[0])) == (0, 0)
    # z=1: Paris (2.35, 48.85) → (1, 0); Buenos Aires (-58.4, -34.6) → (0, 1)
    x, y = tiles.point_to_tile(np.array([2.35, -58.4]), np.array([48.85, -34.6]), 1)
    assert list(x) == [1, 0] and list(y) == [0, 1]
    # z=12 Paris: standard slippy result (2048+26, 1408-5) = (2074, 1409)
    x, y = tiles.point_to_tile(np.array([2.35]), np.array([48.85]), 12)
    assert (int(x[0]), int(y[0])) == (2074, 1409)


def test_tile_zoom_boundaries():
    """Points at tile boundaries: lng exactly on a tile edge goes to
    the right tile (floor rule); lat clamp at the mercator limit."""
    z = 3
    x, _ = tiles.point_to_tile(np.array([0.0]), np.array([0.0]), z)
    assert int(x[0]) == 4  # 0° is the left edge of tile 4 at z=3
    _, y = tiles.point_to_tile(np.array([0.0]), np.array([89.9]), z)
    assert int(y[0]) == 0
    _, y = tiles.point_to_tile(np.array([0.0]), np.array([-89.9]), z)
    assert int(y[0]) == (1 << z) - 1


def test_tile_roundtrip_bounds():
    z = 10
    for lng, lat in [(2.35, 48.85), (-58.4, -34.6), (139.7, 35.7)]:
        x, y = tiles.point_to_tile(np.array([lng]), np.array([lat]), z)
        minlng, minlat, maxlng, maxlat = tiles.tile_bounds(z, int(x[0]), int(y[0]))
        assert minlng <= lng < maxlng
        assert minlat < lat <= maxlat


def test_envelope_to_tiles():
    xs, ys = tiles.envelope_to_tiles(-1.0, -1.0, 1.0, 1.0, 6)
    assert len(xs) == 4  # 2×2 around (0,0) at z=6
    assert set(zip(xs.tolist(), ys.tolist())) == {
        (31, 31), (31, 32), (32, 31), (32, 32)
    }


def test_knn_points_stream_pruned_matches_dense(ray_session):
    """Window pruning + certification must return the EXACT dense
    answer, including when the radius is tiny and every query falls
    back to the dense second pass."""
    import numpy as np
    import ray.data as rd

    from ocaml_geojson_ray.spatial.knn import knn_points_stream

    rng = np.random.default_rng(11)
    n_t, n_q = 3000, 17
    t_ids = np.arange(n_t, dtype=np.int64) + 100
    tx = rng.uniform(-180, 180, n_t)
    ty = rng.uniform(-90, 90, n_t)
    q_ids = np.arange(n_q, dtype=np.int64)
    qx = rng.uniform(-180, 180, n_q)
    qy = rng.uniform(-90, 90, n_q)
    import pyarrow as pa

    targets = rd.from_arrow(pa.table({
        "neighbor_id": t_ids, "lng": tx, "lat": ty,
    })).repartition(6)

    def run(radius):
        df = knn_points_stream(targets, q_ids, qx, qy, k=3,
                               prune_radius=radius).to_pandas()
        return df.sort_values(["query_id", "knn_rank"]).reset_index(drop=True)

    dense = run(None)
    generous = run(30.0)   # certifies nearly everything
    tiny = run(0.05)       # certifies nothing -> full dense fallback
    for got, name in ((generous, "generous"), (tiny, "tiny")):
        assert got[["query_id", "knn_rank", "neighbor_id"]].equals(
            dense[["query_id", "knn_rank", "neighbor_id"]]), name
        assert np.allclose(got["distance_deg"], dense["distance_deg"],
                           rtol=0, atol=0), name


def test_polygon_index_matches_naive_construction():
    """The vectorized PolygonIndex build must equal a naive per-polygon
    reference: identical cell lists and rect flags; centers/radii equal
    up to summation-order rounding with the radius still bounding every
    vertex (the kNN lower-bound invariant)."""
    import numpy as np

    from ocaml_geojson_ray.spatial import cells as C
    from ocaml_geojson_ray.spatial.join import PolygonIndex

    rng = np.random.default_rng(3)
    rows = []
    for i in range(200):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        if i % 3 == 0:  # axis-aligned rectangle
            w, h = rng.uniform(0.1, 2), rng.uniform(0.1, 2)
            ring = [[cx, cy], [cx + w, cy], [cx + w, cy + h], [cx, cy + h], [cx, cy]]
        else:  # irregular polygon
            k = int(rng.integers(4, 9))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            r = rng.uniform(0.2, 1.5, k)
            ring = [[cx + rr * np.cos(a), cy + rr * np.sin(a)] for a, rr in zip(ang, r)]
            ring.append(ring[0])
        xs = [p[0] for p in ring]; ys = [p[1] for p in ring]
        rows.append({"poly_id": i, "name": f"p{i}", "rings": [ring],
                     "minx": min(xs), "miny": min(ys),
                     "maxx": max(xs), "maxy": max(ys)})

    idx = PolygonIndex(rows, 7)
    # naive cell coverage
    from collections import defaultdict
    want = defaultdict(list)
    for i, r in enumerate(rows):
        for cell in C.cover_bbox(r["minx"], r["miny"], r["maxx"], r["maxy"], 7):
            want[int(cell)].append(i)
    assert set(idx.cell_to_polys) == set(want)
    for k, v in want.items():
        assert idx.cell_to_polys[k].tolist() == v
    # rect flags: exactly the i % 3 == 0 rows
    assert idx.is_rect.tolist() == [i % 3 == 0 for i in range(200)]
    # center/radius invariant
    for i in range(200):
        pts = np.concatenate(idx.rings[i])
        d = np.sqrt(((pts - idx.centers[i]) ** 2).sum(axis=1)).max()
        assert d <= idx.radius[i] + 1e-12
        assert np.allclose(idx.centers[i], pts.mean(axis=0), rtol=0, atol=1e-9)


# -- hex cells (H3-shaped third encoder) ------------------------------------

def test_hex_roundtrip_center():
    """cell → center → cell is the identity (the center is by
    construction the nearest hex center to itself)."""
    import numpy as np

    from ocaml_geojson_ray.spatial import hexcells as H

    rng = np.random.default_rng(7)
    lng = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-89, 89, 500)
    for res in (3, 6, 9):
        cells = H.hex_latlng_to_cell(lng, lat, res)
        clng, clat = H.hex_cell_center(cells)
        again = H.hex_latlng_to_cell(clng, clat, res)
        assert np.array_equal(cells, again)
        assert np.all(H.hex_cell_res(cells) == res)


def test_hex_assignment_is_nearest_center():
    """every point is assigned to the hex whose center is nearest in
    the projected plane (the defining property of cube rounding) —
    checked against the centers of the assigned cell's 1-disk."""
    import numpy as np

    from ocaml_geojson_ray.spatial import hexcells as H

    rng = np.random.default_rng(11)
    lng = rng.uniform(-170, 170, 200)
    lat = rng.uniform(-80, 80, 200)
    res = 5
    cells = H.hex_latlng_to_cell(lng, lat, res)
    for i in range(len(lng)):
        own_lng, own_lat = H.hex_cell_center(np.asarray([cells[i]]))
        d_own = (own_lng[0] - lng[i]) ** 2 + (own_lat[0] - lat[i]) ** 2
        for nb in H.hex_ring(int(cells[i]), 1):
            nlng, nlat = H.hex_cell_center(np.asarray([nb]))
            d_nb = (nlng[0] - lng[i]) ** 2 + (nlat[0] - lat[i]) ** 2
            assert d_own <= d_nb + 1e-9


def test_hex_ring_properties():
    """|ring(c,k)| = 6k, ring members at hex distance exactly k, and
    ring symmetry: b in ring(a,k) <=> a in ring(b,k)."""
    import numpy as np

    from ocaml_geojson_ray.spatial import hexcells as H

    c = int(H.hex_latlng_to_cell(np.asarray([12.3]), np.asarray([45.6]), 6)[0])
    assert list(H.hex_ring(c, 0)) == [c]
    for k in (1, 2, 5):
        ring = H.hex_ring(c, k)
        assert len(ring) == 6 * k
        assert np.all(H.hex_distance(ring, np.full(len(ring), c)) == k)
        for b in ring[:6]:
            assert c in H.hex_ring(int(b), k)
    disk = H.hex_disk(c, 3)
    assert len(disk) == 1 + 3 * 3 * (3 + 1)
    assert np.all(H.hex_distance(disk, np.full(len(disk), c)) <= 3)


def test_hex_parent_center_containment():
    """parent(cell) at res-1 contains the cell's center (by
    construction); parent of parent's children's centers is stable."""
    import numpy as np

    from ocaml_geojson_ray.spatial import hexcells as H

    rng = np.random.default_rng(3)
    lng = rng.uniform(-170, 170, 300)
    lat = rng.uniform(-80, 80, 300)
    cells = H.hex_latlng_to_cell(lng, lat, 8)
    parents = H.hex_cell_to_parent(cells, 5)
    assert np.all(H.hex_cell_res(parents) == 5)
    clng, clat = H.hex_cell_center(cells)
    assert np.array_equal(parents, H.hex_latlng_to_cell(clng, clat, 5))
    # idempotent at equal res
    assert np.array_equal(H.hex_cell_to_parent(cells, 8), cells)


def test_hex_qr_pack_roundtrip():
    import numpy as np

    from ocaml_geojson_ray.spatial import hexcells as H

    rng = np.random.default_rng(5)
    q = rng.integers(-100000, 100000, 200)
    r = rng.integers(-100000, 100000, 200)
    cells = H.hex_pack(7, q, r)
    q2, r2 = H.hex_cell_qr(cells)
    assert np.array_equal(q, q2) and np.array_equal(r, r2)


# -- geometry measures ------------------------------------------------------

def test_measures_kernels():
    import numpy as np

    from ocaml_geojson_ray.spatial.measures import (
        polygon_area,
        ring_areas,
        ring_centroids,
        ring_perimeters,
    )

    sq = [[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]       # closed square
    tri = [[0, 0], [4, 0], [0, 3]]                      # open triangle
    hole = [[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]]
    a = ring_areas([sq, tri, hole])
    assert np.allclose(a, [4.0, 6.0, 1.0])
    # winding-insensitive
    assert np.allclose(ring_areas([sq[::-1]]), [4.0])
    p = ring_perimeters([sq, tri])
    assert np.allclose(p, [8.0, 4 + 3 + 5.0])
    c = ring_centroids([sq, tri])
    assert np.allclose(c[0], [1.0, 1.0])
    assert np.allclose(c[1], [4 / 3, 1.0])
    # degenerate: zero-area ring falls back to vertex mean
    line = [[1, 1], [3, 1]]
    assert np.allclose(ring_centroids([line]), [[2.0, 1.0]])
    # polygon with hole
    assert np.allclose(polygon_area([[sq, hole]]), [3.0])
    # ragged batch consistency vs singles
    batch = ring_areas([sq, tri, hole, sq[::-1], line])
    singles = np.concatenate([ring_areas([r]) for r in
                              (sq, tri, hole, sq[::-1], line)])
    assert np.allclose(batch, singles)


def test_polygon_index_rect_fast_path_equals_generic():
    """from_rect_arrays (array-native build) must be INDEX-equivalent
    to the generic dict-rows constructor on the same rectangles —
    including a degenerate zero-height rect (falls to PIP path) and
    the pickle round-trip (lazy ring caches never serialized)."""
    import pickle

    import numpy as np

    from ocaml_geojson_ray.spatial.join import PolygonIndex

    rng = np.random.default_rng(4)
    n = 200
    minx = rng.uniform(-170, 160, n)
    miny = rng.uniform(-80, 70, n)
    maxx = minx + rng.uniform(0.1, 5, n)
    maxy = miny + rng.uniform(0.1, 5, n)
    maxy[7] = miny[7]  # degenerate: not a rect, PIP path
    ids = np.arange(100, 100 + n)
    names = [f"p{i}" for i in ids]

    rows = [{"poly_id": int(ids[i]), "name": names[i],
             "rings": [[[minx[i], miny[i]], [maxx[i], miny[i]],
                        [maxx[i], maxy[i]], [minx[i], maxy[i]],
                        [minx[i], miny[i]]]],
             "minx": minx[i], "miny": miny[i],
             "maxx": maxx[i], "maxy": maxy[i]} for i in range(n)]

    a = PolygonIndex(rows, 7)
    b = PolygonIndex.from_rect_arrays(ids, names, minx, miny, maxx, maxy, 7)
    b = pickle.loads(pickle.dumps(b))  # exercise getstate/setstate

    assert np.array_equal(a.poly_ids, b.poly_ids)
    assert a.names == b.names
    assert np.array_equal(a.is_rect, b.is_rect) and not a.is_rect[7]
    assert np.array_equal(a.rect_bounds, b.rect_bounds)
    assert np.array_equal(a.flat, b.flat)
    assert np.array_equal(a.ring_offs, b.ring_offs)
    assert np.allclose(a.centers, b.centers) and np.allclose(a.radius, b.radius)
    assert a.cell_to_polys.keys() == b.cell_to_polys.keys()
    for k in a.cell_to_polys:
        assert np.array_equal(a.cell_to_polys[k], b.cell_to_polys[k])
    # lazy views reconstruct identically
    assert all(np.array_equal(x[0], y[0])
               for x, y in zip(a.rings, b.rings))
    assert a.bbox == b.bbox


# -- great-circle radius join (spatial/distjoin.py) --------------------------

def _brute_pairs(key, lng, lat):
    from ocaml_geojson_ray.spatial import distjoin as dj

    qx, qy, qz = dj.quantized_sphere(lng, lat)
    P = np.stack([qx, qy, qz], 1)
    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(-1)
    ii, jj = np.nonzero(np.triu(d2 <= dj.CHORD_T * dj.CHORD_T, k=1))
    a = np.minimum(key[ii], key[jj])
    b = np.maximum(key[ii], key[jj])
    return set(zip(a.tolist(), b.tolist(), d2[ii, jj].tolist()))


def _grid_pairs(key, lng, lat):
    import pandas as pd
    import pyarrow as pa

    from ocaml_geojson_ray.spatial import distjoin as dj

    batch = pa.table({
        "key": pa.array(key, pa.int64()),
        "lng": pa.array(lng, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
    })
    dup = dj.grid_duplicate_batch(batch).to_pandas()
    out = set()
    for _, g in dup.groupby("cell"):
        t = dj.cell_pairs(pa.Table.from_pandas(g, preserve_index=False))
        out |= set(zip(t["a_key"].to_pylist(), t["b_key"].to_pylist(),
                       t["chord2"].to_pylist()))
    return out


def test_distjoin_grid_equals_brute_random():
    """The forward-neighbor grid plan finds EXACTLY the brute-force
    pair set — every in-radius pair once (margin arithmetic for the
    15°×7.5° cells vs the 7° radius), no duplicates, no misses —
    on random band points including the ±180 wrap and band edges."""
    rng = np.random.default_rng(42)
    n = 400
    key = np.arange(1, n + 1, dtype=np.int64)
    lng = rng.uniform(-180, 180, n)
    lat = rng.uniform(-60, 60, n)
    # force wraparound + band-edge coverage
    lng[:40] = rng.uniform(176, 180, 40)
    lng[40:80] = rng.uniform(-180, -176, 40)
    lat[:20] = rng.uniform(59.5, 60, 20)
    lat[80:100] = rng.uniform(-60, -59.5, 20)
    assert _grid_pairs(key, lng, lat) == _brute_pairs(key, lng, lat)


def test_distjoin_dense_cluster_no_double_count():
    """A dense one-cell cluster (every pair in radius) yields exactly
    C(n,2) pairs — the home×home key-order dedup path."""
    n = 60
    key = np.arange(1, n + 1, dtype=np.int64)
    rng = np.random.default_rng(3)
    lng = rng.uniform(10.0, 10.5, n)
    lat = rng.uniform(20.0, 20.5, n)
    pairs = _grid_pairs(key, lng, lat)
    assert len(pairs) == n * (n - 1) // 2


def test_distjoin_cross_cell_pair_once():
    """Two points straddling a cell boundary (cross-cell pair) are
    emitted exactly once via the forward-probe path."""
    key = np.array([1, 2], dtype=np.int64)
    # cells x = floor((lng+180)/15): 14.9 → x=12, 15.1 → x=13
    lng = np.array([14.9, 15.1])
    lat = np.array([0.0, 0.0])
    pairs = _grid_pairs(key, lng, lat)
    assert len(pairs) == 1 and next(iter(pairs))[:2] == (1, 2)


def test_chord2_ordering_matches_haversine():
    """geo_knn's exactness claim: integer chord² on the quantized unit
    sphere orders pairs EXACTLY like true great-circle distance
    (chord = 2·sin(θ/2) is strictly monotone in θ on [0, π]), up to
    the 1e-7 quantization — checked on 2,000 random band pairs with a
    float haversine reference, allowing disagreement only when the
    two geodesic distances are within the quantization error."""
    from ocaml_geojson_ray.spatial.distjoin import quantized_sphere

    rng = np.random.default_rng(17)
    n = 2000
    lng = rng.uniform(-180, 180, 2 * n)
    lat = rng.uniform(-60, 60, 2 * n)
    qx, qy, qz = quantized_sphere(lng, lat)
    P = np.stack([qx, qy, qz], 1)
    a, b = P[:n], P[n:]
    chord2 = ((a - b) ** 2).sum(1)

    lngr, latr = np.radians(lng), np.radians(lat)
    s_dlat = np.sin((latr[n:] - latr[:n]) / 2)
    s_dlng = np.sin((lngr[n:] - lngr[:n]) / 2)
    hav = s_dlat**2 + np.cos(latr[:n]) * np.cos(latr[n:]) * s_dlng**2
    theta = 2 * np.arcsin(np.sqrt(np.clip(hav, 0, 1)))  # radians

    order_c = np.argsort(chord2, kind="stable")
    order_h = np.argsort(theta, kind="stable")
    # where the orders disagree, the true distances must be within the
    # quantization tolerance (~2e-7 rad per coordinate step)
    mism = order_c != order_h
    if mism.any():
        tol = 1e-6
        assert np.abs(theta[order_c[mism]] - theta[order_h[mism]]).max() < tol
