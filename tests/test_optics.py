"""Optics accessors — mirroring the reference's Accessor usage in its
tests (reference: geojson.ml:518-623, test/geojson/test.ml optics use)."""

import pathlib

from ocaml_geojson_ray.core import loads_json, of_json
from ocaml_geojson_ray.core.model import Geometry
from ocaml_geojson_ray.core import optics as O

VALID = pathlib.Path(__file__).parent / "fixtures" / "valid"


def test_lens_get_set():
    obj = of_json(loads_json((VALID / "point.json").read_text()))
    assert O.geojson.get(obj) is obj.value
    assert O.bbox.get(obj) is None
    obj2 = O.bbox.set(obj, [1.0, 2.0, 3.0, 4.0])
    assert obj2.bbox == [1.0, 2.0, 3.0, 4.0]
    assert obj.bbox is None  # original untouched


def test_prism_geometry_point():
    obj = of_json(loads_json((VALID / "point.json").read_text()))
    # geojson lens >> geometry prism >> point prism
    focus = (O.geojson @ O.geometry)
    g = focus.get(obj)
    assert isinstance(g, Geometry)
    coords = O.GeometryL.point.get(g)
    assert coords == [125.6, 10.1]
    assert O.GeometryL.multipoint.get(g) is None  # wrong constructor


def test_prism_set_builds():
    g = O.GeometryL.point.set([1.0, 2.0])
    assert g.type == "Point" and g.coordinates == [1.0, 2.0]


def test_feature_lenses():
    obj = of_json(loads_json((VALID / "feature.json").read_text()))
    f = obj.value
    assert O.FeatureL.properties.get(f) == {"name": "Dinagat Islands"}
    assert O.FeatureL.foreign_members.get(f) == {"title": "Some Islands"}
    f2 = O.FeatureL.properties.set(f, {"name": "Renamed"})
    assert f2.properties == {"name": "Renamed"}
    assert f.properties == {"name": "Dinagat Islands"}


def test_composed_optional():
    obj = of_json(loads_json((VALID / "feature.json").read_text()))
    # geojson >> feature prism >> geometry lens
    path = O.geojson @ O.feature
    f = path.get(obj)
    assert f is obj.value
    geom_path = path @ O.FeatureL.geometry
    g = geom_path.get(obj)
    assert g.type == "MultiPoint"
    # set through the composed optional
    obj2 = geom_path.set(obj, Geometry("Point", [0.0, 0.0]))
    assert obj2.value.geometry.type == "Point"
    assert obj.value.geometry.type == "MultiPoint"


def test_nth_lens():
    lens = O.nth(1)
    assert lens.get([1, 2, 3]) == 2
    assert lens.set([1, 2, 3], 9) == [1, 9, 3]
