"""Golden-output tests for the streaming-equivalent transforms —
byte-exact against the reference's expect corpus
(reference: test/geojsonm/expect/test.ml, test_iters.ml + *.expected)."""

import pathlib

import pytest

from ocaml_geojson_ray.core import Geometry
from ocaml_geojson_ray.core.jsontext import dumps_json
from ocaml_geojson_ray.core.serialize import geometry_to_json, to_text
from ocaml_geojson_ray.functions.streaming import (
    StreamError,
    capitalise_nom,
    fold_geometry_text,
    fold_props_text,
    iter_geometry_text,
    iter_props_text,
    map_geometry_text,
    map_props_text,
    remove_all_coords,
)

FIX = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def simple():
    return (FIX / "simple.geojson").read_text().strip()


@pytest.fixture(scope="module")
def expected_blocks():
    # test.expected: block1 = map_props output, block2 = map_geometry
    # output, block3 = "Places: Foix" (no trailing newline)
    raw = (FIX / "test.expected").read_text()
    parts = raw.split("\n\n")
    return parts


def test_map_props_golden(simple, expected_blocks):
    got = map_props_text(simple, capitalise_nom)
    assert got == expected_blocks[0]


def test_map_geometry_golden(simple, expected_blocks):
    got = map_geometry_text(simple, remove_all_coords)
    assert got == expected_blocks[1]


def test_fold_props_golden(simple, expected_blocks):
    names = fold_props_text(simple, lambda acc, p: acc + [p["nom"]], [])
    # expect/test.ml prints "Places: " then the list
    assert "Places: " + " ".join(reversed(names)) == expected_blocks[2].rstrip("\n")


def test_iter_golden(simple):
    """test_iters.expected: each geometry (via G.to_json), then each
    properties value, one per line."""
    expected = (FIX / "test_iters.expected").read_text()
    lines = []
    iter_geometry_text(simple, lambda obj: lines.append(to_text(obj)))
    iter_props_text(simple, lambda p: lines.append(dumps_json(p)))
    assert "\n".join(lines) + "\n" == expected


def test_fold_geometry_count(simple):
    n = fold_geometry_text(simple, lambda acc, g: acc + 1, 0)
    assert n == 1
    types = fold_geometry_text(simple, lambda acc, g: acc + [g.type], [])
    assert types == ["Polygon"]


def test_map_geometry_preserves_member_bbox():
    doc = (
        '{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2],'
        '"bbox":[1,2,1,2]},"properties":null}'
    )
    got = map_geometry_text(doc, lambda g: g)
    assert got == doc  # bbox of the geometry member survives the rewrite


def test_map_geometry_invalid_subtree_errors():
    doc = '{"type":"Feature","geometry":{"type":"Nope"},"properties":null}'
    with pytest.raises(StreamError, match="Unknown type of geometry Nope"):
        map_geometry_text(doc, lambda g: g)


def test_map_geometry_ignores_bare_geometry_doc():
    """Reference limitation reproduced: a top-level bare geometry doc
    has no "geometry" member → passes through untouched
    (TODO at geojsone.ml:176)."""
    doc = '{"type":"Point","coordinates":[1,2]}'
    got = map_geometry_text(doc, remove_all_coords)
    assert got == doc


def test_map_props_nested_trigger():
    """The lexeme trigger fires on ANY member named properties — even
    nested inside foreign members (geojsone.ml:209)."""
    doc = '{"type":"Feature","meta":{"properties":{"nom":"x"}},"properties":{"nom":"y"}}'
    got = map_props_text(doc, capitalise_nom)
    assert '"nom":"X"' in got and '"nom":"Y"' in got
