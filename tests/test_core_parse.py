"""Core conformance: fixture corpus round-trips + invalid verdicts.

Mirrors the reference suites (reference: test/geojson/test.ml:458-478)
— parse each valid fixture, check coordinates via accessors, assert
``to_json(of_json(x)) == x`` as JSON values — plus an invalid corpus
pinned to the reference's error branches (SURVEY.md §1.3, FIXTURES.md §3).
"""

import json
import pathlib

import pytest

from ocaml_geojson_ray.core import (
    Feature,
    FeatureCollection,
    Geometry,
    loads_json,
    of_json,
    of_json_result,
    parse_text,
    to_json,
    to_text,
)
from ocaml_geojson_ray.core.jsontext import json_equal
from ocaml_geojson_ray.core.parse import (
    ERR_BAD_ID,
    ERR_GET_FLOAT,
    ERR_GET_LIST,
    ERR_LINESTRING_ARITY,
    ERR_NO_COORDS,
    ERR_NO_FEATURES,
    ERR_NO_GEOMETRIES,
    ERR_NO_TYPE,
)

VALID = pathlib.Path(__file__).parent / "fixtures" / "valid"


def load(name):
    return loads_json((VALID / name).read_text())


ROUNDTRIP_FILES = [
    "point.json",
    "multipoint.json",
    "linestring.json",
    "multilinestring.json",
    "polygon.json",
    "multi_polygon.json",
    "feature.json",
    "featurecollection.json",
    "3d_featurecollection.json",
    "geo_with_bbox.json",
]


@pytest.mark.parametrize("fname", ROUNDTRIP_FILES)
def test_roundtrip(fname):
    """to_json (of_json x) == x (test.ml:92,133,190,245,288,348,365,433)."""
    src = load(fname)
    obj, err, raised = of_json_result(src)
    assert err is None, f"{fname}: {err}"
    assert json_equal(to_json(obj), src), fname


def test_point_accessors():
    obj = of_json(load("point.json"))
    g = obj.value
    assert isinstance(g, Geometry) and g.type == "Point"
    assert g.coordinates == [125.6, 10.1]


def test_multipoint():
    g = of_json(load("multipoint.json")).value
    assert g.type == "MultiPoint"
    assert g.coordinates == [[100.0, 0.0], [101.0, 1.0]]


def test_linestring():
    g = of_json(load("linestring.json")).value
    assert g.type == "LineString"
    assert g.coordinates == [[100.0, 0.0], [101.0, 1.0]]


def test_multilinestring_antimeridian():
    g = of_json(load("multilinestring.json")).value
    assert g.type == "MultiLineString"
    assert g.coordinates[0] == [[170.0, 45.0], [180.0, 45.0]]
    assert g.coordinates[1] == [[-180.0, 45.0], [-170.0, 45.0]]


def test_polygon_rings():
    g = of_json(load("polygon.json")).value
    assert g.type == "Polygon"
    assert g.exterior_ring()[0] == [100.0, 0.0]
    assert g.interior_rings() == []


def test_multipolygon_hole():
    g = of_json(load("multi_polygon.json")).value
    assert g.type == "MultiPolygon"
    assert len(g.coordinates) == 2
    # second polygon has an interior ring (hole)
    assert len(g.coordinates[1]) == 2
    assert g.coordinates[1][1][0] == [100.2, 0.2]


def test_feature_foreign_members_and_properties():
    """Foreign members at test.ml:283-286; properties vs prop1.json."""
    f = of_json(load("feature.json")).value
    assert isinstance(f, Feature)
    assert f.foreign_members == {"title": "Some Islands"}
    assert json_equal(f.properties, load("prop1.json"))
    assert f.geometry.type == "MultiPoint"
    assert f.geometry.coordinates == [[125.1, 40.0], [155.9, 22.5]]


def test_featurecollection_explodes_properties():
    fc = of_json(load("featurecollection.json")).value
    assert isinstance(fc, FeatureCollection)
    assert len(fc.features) == 2
    assert json_equal(fc.features[0].properties, load("prop1.json"))
    assert json_equal(fc.features[1].properties, load("prop2.json"))


def test_3d_altitude():
    """3D positions are first-class (test.ml:420-430)."""
    fc = of_json(load("3d_featurecollection.json")).value
    mp = fc.features[0].geometry
    assert mp.coordinates[0] == [130.1, 40.0, 33.3]
    mls = fc.features[1].geometry
    assert mls.coordinates[0][0] == [170.0, 45.0, 60.2]


def test_bbox_on_bare_geometry():
    """bbox parse (test.ml:361-364)."""
    obj = of_json(load("geo_with_bbox.json"))
    assert obj.bbox == [100.0, 0.0, 101.0, 1.0]
    assert obj.value.type == "Polygon"


# -------------------------------------------------------------------------
# invalid corpus: one case per reference error branch (FIXTURES.md §3)

INVALID_CASES = [
    # (doc, expected error substring, raised?)
    ({"coordinates": [0.0, 0.0]}, ERR_NO_TYPE, False),
    ({"type": "Circle", "coordinates": []}, "Unknown type of geometry Circle", False),
    ({"type": "Point"}, ERR_NO_COORDS, False),
    ({"type": "LineString", "coordinates": [[0.0, 0.0]]}, ERR_LINESTRING_ARITY, False),
    # Feature with "geometry": null → REJECTED (geojson.ml:354-368)
    (
        {"type": "Feature", "geometry": None, "properties": {}},
        ERR_NO_TYPE,
        False,
    ),
    # wrong-case feature type falls to the geometry parser (geojson.ml:496-505)
    (
        {"type": "feature", "geometry": {"type": "Point", "coordinates": [0.0, 0.0]}},
        "Unknown type of geometry feature",
        False,
    ),
    (
        {
            "type": "Feature",
            "id": [1.0],
            "geometry": {"type": "Point", "coordinates": [0.0, 0.0]},
        },
        ERR_BAD_ID,
        False,
    ),
    ({"type": "FeatureCollection"}, ERR_NO_FEATURES, False),
    ({"type": "GeometryCollection"}, ERR_NO_GEOMETRIES, False),
    # Point with non-numeric coordinate: decode_or_err failwith escapes
    # (geojson.ml:91 has no Failure handler) → raised channel
    ({"type": "Point", "coordinates": ["a", 0.0]}, ERR_GET_FLOAT, True),
    # MultiPoint catches the same failure → Error channel (geojson.ml:110-112)
    ({"type": "MultiPoint", "coordinates": [["a", 0.0]]}, ERR_GET_FLOAT, False),
    # coordinates not an array → Error "Ezjsone.get_list"
    ({"type": "Point", "coordinates": "xs"}, ERR_GET_LIST, False),
    # invalid feature inside a FC → raised (decode_or_err, geojson.ml:431)
    (
        {"type": "FeatureCollection", "features": [{"type": "Feature", "geometry": None}]},
        ERR_NO_TYPE,
        True,
    ),
    # invalid child inside a GeometryCollection → raised (geojson.ml:274)
    (
        {"type": "GeometryCollection", "geometries": [{"type": "Nope"}]},
        "Unknown type of geometry Nope",
        True,
    ),
    # feature with non-Feature type inside FC
    (
        {"type": "FeatureCollection", "features": [{"type": "x"}]},
        "A Geojson feature requires the type `Feature`. Found type, but it was x",
        True,
    ),
]


@pytest.mark.parametrize("doc,msg,raised", INVALID_CASES)
def test_invalid_verdicts(doc, msg, raised):
    obj, err, was_raised = of_json_result(doc)
    assert obj is None
    assert err is not None and msg in err, (doc, err)
    assert was_raised == raised, (doc, err, was_raised)


def test_bbox_lenient_non_array():
    """Non-array bbox degrades silently to None (geojson.ml:480-483)."""
    obj, err, raised = of_json_result(
        {"type": "Point", "coordinates": [0.0, 0.0], "bbox": "oops"}
    )
    assert err is None and obj.bbox is None


def test_bbox_array_bad_element_raises():
    """bbox array with a non-float element: failwith escapes catch_err
    (geojson.ml:20-21 + ezjsone.ml:146-147 catches only Parse_error)."""
    obj, err, raised = of_json_result(
        {"type": "Point", "coordinates": [0.0, 0.0], "bbox": ["x"]}
    )
    assert obj is None and err == ERR_GET_FLOAT and raised


def test_feature_without_geometry_key_accepted():
    obj, err, _ = of_json_result({"type": "Feature", "properties": {"a": 1.0}})
    assert err is None
    assert obj.value.geometry is None


def test_properties_null_roundtrip():
    doc = {"type": "Feature", "properties": None}
    obj = of_json(doc)
    assert obj.value.properties_present and obj.value.properties is None
    assert json_equal(to_json(obj), doc)


def test_polygon_no_ring_closure_check():
    """Ring closure is NOT validated (geojson_intf.ml:165-167)."""
    doc = {"type": "Polygon", "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]]}
    obj, err, _ = of_json_result(doc)
    assert err is None


def test_parse_text_json_error():
    obj, err, raised = parse_text("{nope")
    assert obj is None and err.startswith("JSON.of_buffer")


def test_numbers_all_floats():
    """Ints parse as doubles (ezjsone.ml:201-215)."""
    obj = of_json(loads_json('{"type":"Point","coordinates":[40, 10]}'))
    assert obj.value.coordinates == [40.0, 10.0]
    assert to_text(obj) == '{"type":"Point","coordinates":[40,10]}'


def test_pathological_nesting_is_verdict_not_crash():
    """Thousands of nested GeometryCollections → error verdict, not a
    RecursionError escaping into (and killing) a Ray worker."""
    deep = (
        '{"type":"GeometryCollection","geometries":[' * 3000
        + '{"type":"Point","coordinates":[1,2]}'
        + "]}" * 3000
    )
    obj, err, raised = parse_text(deep)
    assert obj is None and "recursion" in err


def test_pathological_nesting_mining_survives():
    from ocaml_geojson_ray.stages.mine import find_candidates

    deep = (
        '{"type":"GeometryCollection","geometries":[' * 3000
        + '{"type":"Point","coordinates":[1,2]}'
        + "]}" * 3000
    )
    text = 'before {"type":"Point","coordinates":[5,6]} ' + deep
    cands = find_candidates(text)
    # the sane doc is still mined; the deep one is skipped, not a crash
    assert any(d == '{"type":"Point","coordinates":[5,6]}' for _, _, d in cands)


# -- lexical error recovery (jsone.ml splice branches) ---------------------

def test_recovery_invalid_escape_splices_fffd():
    """r_escape default branch (jsone.ml:390-397): ``\\q`` → U+FFFD,
    both chars consumed, document parses."""
    from ocaml_geojson_ray.core.parse import parse_text_recovering

    doc = '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"name":"a\\qb"}}'
    obj, err, raised, recovered = parse_text_recovering(doc)
    assert err is None and recovered
    assert obj.value.properties["name"] == "a�b"


def test_recovery_control_char_splices_fffd():
    """Raw C0 control inside a string (jsone.ml:416-420) → U+FFFD."""
    from ocaml_geojson_ray.core.parse import parse_text_recovering

    doc = '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"name":"a\x01b"}}'
    obj, err, raised, recovered = parse_text_recovering(doc)
    assert err is None and recovered
    assert obj.value.properties["name"] == "a�b"


def test_recovery_bad_hex_consumes_offender():
    """\\u with a non-hex digit (jsone.ml:330-342): U+FFFD spliced, the
    offending char consumed, partial value discarded — ``\\u12G4`` →
    ``�4``."""
    from ocaml_geojson_ray.core.parse import parse_text_recovering

    doc = ('{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},'
           '"properties":{"name":"x\\u12G4y","bad":"a\\qz"}}')
    obj, err, raised, recovered = parse_text_recovering(doc)
    assert err is None and recovered
    assert obj.value.properties["name"] == "x�4y"
    assert obj.value.properties["bad"] == "a�z"


def test_recovery_lone_surrogates():
    """Lone high surrogate → U+FFFD without consuming the next char
    (jsone.ml:355); high+invalid-low discards both halves
    (jsone.ml:345-348). Strict-valid docs NEVER take the recovery path
    (``recovered`` False), so Python's accept-lone-surrogate fast path
    is unchanged."""
    from ocaml_geojson_ray.core.parse import parse_text_recovering

    # \q forces the recovery path; the lone \ud800 then splices U+FFFD
    doc = ('{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},'
           '"properties":{"a":"\\q","hi":"\\ud800x","pair":"\\ud83d\\ude00"}}')
    obj, err, raised, recovered = parse_text_recovering(doc)
    assert err is None and recovered
    assert obj.value.properties["hi"] == "�x"
    assert obj.value.properties["pair"] == "\U0001f600"  # valid pair kept


def test_recovery_valid_unicode_escape_kept():
    """Non-surrogate \\uXXXX decodes to its scalar on the recovery path
    (upstream jsonm / the DOM engine; the vendored effects port's
    jsone.ml:352-353 branch is documented as not followed)."""
    from ocaml_geojson_ray.core.parse import parse_text_recovering

    doc = ('{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},'
           '"properties":{"a":"\\q","e":"caf\\u00e9"}}')
    obj, err, raised, recovered = parse_text_recovering(doc)
    assert err is None and recovered
    assert obj.value.properties["e"] == "café"


def test_recovery_structural_error_still_errors():
    """discard_to-style structural junk returns an Error lexeme and the
    DOM consumer aborts (ezjsone.ml:57-59) — recovery must NOT mask
    it; the ORIGINAL strict message is kept."""
    from ocaml_geojson_ray.core.parse import parse_text_recovering

    obj, err, raised, recovered = parse_text_recovering(
        '{"type": nope, "coordinates":[1,2]}'
    )
    assert obj is None and not recovered
    assert err.startswith("JSON.of_buffer")


def test_error_range_spans_to_separator():
    """((l1,c1),(l2,c2)) mirrors discard_to's consumed span
    (jsone.ml:487-493): start at the error, end at the last char
    before the next separator."""
    from ocaml_geojson_ray.stages.parse_stage import error_range

    doc = '{"type": nope!, "x": 1}'
    pos = doc.index("nope")
    l1, c1, l2, c2 = error_range(doc, pos, 1, pos + 1)
    assert (l1, c1) == (1, 10)
    assert (l2, c2) == (1, 14)  # spans "nope!" to the char before ','

    doc2 = '{"a":\n  nope\n  more, "x":1}'
    pos2 = doc2.index("nope")
    l1, c1, l2, c2 = error_range(doc2, pos2, 2, 3)
    assert (l1, c1) == (2, 3)
    assert l2 == 3 and c2 == len("  more") - 1 + 1  # 1-based end col
