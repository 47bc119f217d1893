"""The reference README's doc-examples (its mdx docs-as-tests layer,
SURVEY.md §5.4) re-expressed against our API — every printed value in
/root/reference/README.md:22-201 must reproduce."""

import pathlib

from ocaml_geojson_ray.core import (
    Feature,
    Geometry,
    loads_json,
    of_json_result,
    to_text,
)
from ocaml_geojson_ray.core import optics as O
from ocaml_geojson_ray.core.model import GeoJson

FEATURE_EXAMPLE = (pathlib.Path(__file__).parent / "fixtures" / "valid"
                   / "feature.json").read_text()


def test_reading_values():
    """README:30-56: of_json → Ok, kind Feature, properties value."""
    obj, err, raised = of_json_result(loads_json(FEATURE_EXAMPLE))
    assert err is None
    f = obj.value
    assert isinstance(f, Feature)
    assert f.properties == {"name": "Dinagat Islands"}


def test_foreign_members_readme():
    """README:62-65: foreign members of the feature."""
    obj, _, _ = of_json_result(loads_json(FEATURE_EXAMPLE))
    assert obj.value.foreign_members == {"title": "Some Islands"}


def test_optics_deep_access():
    """README:73-84: geojson >& feature &> geometry &> multipoint —
    the composed optic reaches the MultiPoint coordinates."""
    obj, _, _ = of_json_result(loads_json(FEATURE_EXAMPLE))
    optic = (O.geojson @ O.feature) @ O.FeatureL.geometry
    g = optic.get(obj)
    coords = O.GeometryL.multipoint.get(g)
    assert coords == [[125.1, 40.0], [155.9, 22.5]]


def test_building_values():
    """README:90-101: construct a Point with a foreign member; the
    serialized bytes must equal the README's printed output exactly."""
    from ocaml_geojson_ray.core.model import position

    geometry = Geometry(
        "Point", position(lng=2.321, lat=1.123),
        foreign_members={"hello": "World"},
    )
    g = GeoJson(geometry)
    assert to_text(g) == '{"type":"Point","coordinates":[2.321,1.123],"hello":"World"}'
