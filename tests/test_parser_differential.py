"""Differential property test: the vectorized coordinate fast path must
produce identical verdicts AND values to the exact per-element path for
arbitrary JSON coordinate structures."""

import json

from hypothesis import given, settings, strategies as st

import ocaml_geojson_ray.core.parse as parse_mod
from ocaml_geojson_ray.core.parse import of_json_result


def _without_fast_path(doc):
    orig = parse_mod._positions_fast
    parse_mod._positions_fast = lambda coords: None
    try:
        return of_json_result(doc)
    finally:
        parse_mod._positions_fast = orig


coord_leaf = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.integers(min_value=-10**9, max_value=10**9),
    st.booleans(),
    st.text(max_size=4),
    st.none(),
)
position = st.lists(coord_leaf, min_size=0, max_size=4)
positions = st.lists(st.one_of(position, coord_leaf), min_size=0, max_size=6)
rings = st.lists(positions, min_size=0, max_size=3)


def norm(obj):
    if obj is None:
        return None
    from ocaml_geojson_ray.core.serialize import to_json

    return json.dumps(to_json(obj), sort_keys=True, default=str)


@settings(max_examples=300, deadline=None)
@given(positions)
def test_multipoint_fast_equals_exact(coords):
    doc = {"type": "MultiPoint", "coordinates": coords}
    fast = of_json_result(doc)
    slow = _without_fast_path(doc)
    assert (fast[1], fast[2]) == (slow[1], slow[2]), (coords, fast, slow)
    assert norm(fast[0]) == norm(slow[0]), coords


@settings(max_examples=200, deadline=None)
@given(rings)
def test_polygon_fast_equals_exact(coords):
    doc = {"type": "Polygon", "coordinates": coords}
    fast = of_json_result(doc)
    slow = _without_fast_path(doc)
    assert (fast[1], fast[2]) == (slow[1], slow[2]), (coords, fast, slow)
    assert norm(fast[0]) == norm(slow[0]), coords


@settings(max_examples=200, deadline=None)
@given(positions)
def test_linestring_fast_equals_exact(coords):
    doc = {"type": "LineString", "coordinates": coords}
    fast = of_json_result(doc)
    slow = _without_fast_path(doc)
    assert (fast[1], fast[2]) == (slow[1], slow[2]), (coords, fast, slow)
    assert norm(fast[0]) == norm(slow[0]), coords
