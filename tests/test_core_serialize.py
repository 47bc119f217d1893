"""Canonical serializer conformance: %.16g floats, jsone escapes,
member order, minify — plus the random round-trip property test
(reference: test/geojson/test.ml:440-456)."""

import json

from hypothesis import given, settings, strategies as st

from ocaml_geojson_ray.core import (
    dumps_json,
    loads_json,
    of_json,
    of_json_result,
    to_json,
    to_text,
)
from ocaml_geojson_ray.core.jsontext import format_float, json_equal
from ocaml_geojson_ray.core.random_gen import random as gj_random, seeded_float_source


def test_float_16g():
    """%.16g formatting (jsone.ml:815-819)."""
    assert format_float(40.0) == "40"
    assert format_float(125.6) == "125.6"
    assert format_float(0.1) == "0.1"
    assert format_float(-180.0) == "-180"
    assert format_float(1e300) == "1e+300"
    assert format_float(1.49886) == "1.49886"
    assert format_float(43.09493) == "43.09493"


def test_escapes():
    """Escape set (jsone.ml:769-796): short escapes for " \\ \\n,
    \\u00XX uppercase for other C0, raw UTF-8 otherwise."""
    assert dumps_json('he"llo') == '"he\\"llo"'
    assert dumps_json("back\\slash") == '"back\\\\slash"'
    assert dumps_json("line\nbreak") == '"line\\nbreak"'
    assert dumps_json("tab\there") == '"tab\\u0009here"'
    assert dumps_json("\x01") == '"\\u0001"'
    assert dumps_json("café €") == '"café €"'


def test_minified_no_whitespace():
    v = loads_json('{"a": 1, "b": [1.5, null, true], "c": {"d": "e"}}')
    assert dumps_json(v) == '{"a":1,"b":[1.5,null,true],"c":{"d":"e"}}'


def test_member_order_geometry():
    doc = loads_json(
        '{"custom": 7, "type": "Point", "coordinates": [1.5, 2.5]}'
    )
    obj = of_json(doc)
    # geometry order: type, coordinates, then foreign members
    assert to_text(obj) == '{"type":"Point","coordinates":[1.5,2.5],"custom":7}'


def test_member_order_feature():
    doc = loads_json(
        json.dumps(
            {
                "extra": "fm",
                "id": 9,
                "properties": {"p": 1},
                "geometry": {"type": "Point", "coordinates": [0, 1]},
                "type": "Feature",
                "bbox": [0, 0, 1, 1],
            }
        )
    )
    obj = of_json(doc)
    # feature order: type, geometry?, properties?, id?, bbox?, fm
    assert to_text(obj) == (
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[0,1]},'
        '"properties":{"p":1},"id":9,"bbox":[0,0,1,1],"extra":"fm"}'
    )


def test_member_order_collection():
    doc = loads_json(
        '{"note":"x","type":"FeatureCollection","features":[]}'
    )
    obj = of_json(doc)
    assert to_text(obj) == '{"type":"FeatureCollection","features":[],"note":"x"}'


def test_random_roundtrip_reference_skeleton():
    """The reference's property test skeleton (test.ml:440-456):
    FC [Point; LineString 2; Polygon 2; MultiPolygon (3,3)] with props."""
    skel = (
        "FC",
        [
            {"properties": {"name": "abcd"}, "geometry": ("Point",)},
            {"properties": {"name": "abcd"}, "geometry": ("LineString", 2)},
            {"properties": {"name": "abcd"}, "geometry": ("Polygon", 2)},
            {"properties": {"name": "abcd"}, "geometry": ("MultiPolygon", 3, 3)},
        ],
    )
    for seed in range(20):
        # value-level round-trip with raw doubles (exactly the
        # reference's test: to_json |> of_json, no text)
        obj = gj_random(seeded_float_source(seed, decimals=None), skel)
        back, err, raised = of_json_result(to_json(obj))
        assert err is None, (seed, err)
        assert json_equal(to_json(back), to_json(obj)), seed
        # text-level round-trip with quantized coords (lossless %.16g)
        obj = gj_random(seeded_float_source(seed), skel)
        txt = to_text(obj)
        back, err, raised = of_json_result(loads_json(txt))
        assert err is None, (seed, err)
        assert json_equal(to_json(back), to_json(obj)), seed


@settings(max_examples=50, deadline=None)
@given(
    st.recursive(
        st.one_of(
            st.none(),
            st.booleans(),
            # bounded below DBL_MAX: %.16g of values within half an ULP
            # of the double range edge re-parses as inf — a faithful
            # reproduction of the reference encoder's own edge
            # (jsone.ml:815-819 + float_of_string), excluded here
            st.floats(allow_nan=False, allow_infinity=False, min_value=-1e300, max_value=1e300),
            st.text(max_size=20),
        ),
        lambda inner: st.one_of(
            st.lists(inner, max_size=4),
            st.dictionaries(st.text(max_size=8), inner, max_size=4),
        ),
        max_leaves=12,
    )
)
def test_json_text_roundtrip(value):
    """serialize → reparse is identity for arbitrary JSON values
    (within double precision, which %.16g..%17g guarantees for our
    encoder because %.16g loses at most the 17th digit)."""
    txt = dumps_json(value)
    back = loads_json(txt)

    def approx(a, b):
        num = (int, float)
        if (isinstance(a, num) and isinstance(b, num)
                and not isinstance(a, bool) and not isinstance(b, bool)):
            # %.16g may drop the 17th significant digit; loads_json
            # keeps integer literals as Python ints (documented in
            # jsontext.loads_json — consumers compare numerically), so
            # a float that rounds to an integer text reparses as int
            return a == b or abs(a - b) <= abs(a) * 1e-15
        if isinstance(a, list):
            return len(a) == len(b) and all(approx(x, y) for x, y in zip(a, b))
        if isinstance(a, dict):
            return a.keys() == b.keys() and all(approx(v, b[k]) for k, v in a.items())
        return a == b

    assert approx(value, back)


def test_golden_simple_geojson_roundtrip(fixtures_dir):
    """Parsing + minified re-encode of the 18,699-byte expect-corpus
    document must be byte-identical to the reference's own pass-through
    output (first block of test.expected has nom capitalised; instead we
    check against the identity: parse→serialize equals jsone's minified
    re-encode, which equals the input since simple.geojson is already
    minified)."""
    src_text = (fixtures_dir / "simple.geojson").read_text().strip()
    obj, err, raised = of_json_result(loads_json(src_text))
    assert err is None
    assert to_text(obj) == src_text
