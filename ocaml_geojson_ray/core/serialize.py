"""GeoJSON → JSON value → canonical text.

Member order is fixed, matching the reference exactly:
- geometry:   type, coordinates, bbox?, foreign members
  (geojson.ml:94-101 and per-type siblings);
- GeometryCollection: type, geometries, bbox?, foreign members
  (geojson.ml:300-307);
- feature:    type, geometry?, properties?, id?, bbox?, foreign members
  (geojson.ml:387-396);
- collection: type, features, bbox?, foreign members (geojson.ml:455-462).

Nested geometries never carry a bbox (only the top level parses/emits
one, geojson.ml:485-516).
"""

from __future__ import annotations

from typing import Any, Optional

from .jsontext import dumps_json
from .model import Feature, FeatureCollection, GeoJson, Geometry


def _num(x) -> float:
    return float(x)


def geometry_to_json(g: Geometry, bbox: Optional[list] = None) -> dict:
    out: dict[str, Any] = {"type": g.type}
    if g.type == "GeometryCollection":
        out["geometries"] = [geometry_to_json(c) for c in (g.geometries or [])]
    else:
        out["coordinates"] = g.coordinates
    if bbox is not None:
        out["bbox"] = [_num(b) for b in bbox]
    for k, v in g.foreign_members.items():
        out[k] = v
    return out


def feature_to_json(f: Feature, bbox: Optional[list] = None) -> dict:
    out: dict[str, Any] = {"type": "Feature"}
    if f.geometry is not None:
        out["geometry"] = geometry_to_json(f.geometry)
    if f.properties_present:
        out["properties"] = f.properties
    if f.id is not None:
        out["id"] = f.id
    if bbox is not None:
        out["bbox"] = [_num(b) for b in bbox]
    for k, v in f.foreign_members.items():
        out[k] = v
    return out


def collection_to_json(fc: FeatureCollection, bbox: Optional[list] = None) -> dict:
    out: dict[str, Any] = {
        "type": "FeatureCollection",
        "features": [feature_to_json(f) for f in fc.features],
    }
    if bbox is not None:
        out["bbox"] = [_num(b) for b in bbox]
    for k, v in fc.foreign_members.items():
        out[k] = v
    return out


def to_json(t: GeoJson) -> dict:
    """to_json (geojson.ml:512-516)."""
    v = t.value
    if isinstance(v, Feature):
        return feature_to_json(v, t.bbox)
    if isinstance(v, FeatureCollection):
        return collection_to_json(v, t.bbox)
    return geometry_to_json(v, t.bbox)


def to_text(t: GeoJson, minify: bool = True) -> str:
    """Full serialize: object → canonical JSON text (jsone byte rules).

    Minified output takes the handcrafted fast path (byte-identical to
    ``dumps_json(to_json(t))`` — pinned by tests); pretty goes generic.
    """
    if not minify:
        return dumps_json(to_json(t), minify=False)
    v = t.value
    if isinstance(v, Feature):
        return feature_to_text(v, t.bbox)
    if isinstance(v, FeatureCollection):
        return collection_to_text(v, t.bbox)
    return geometry_to_text(v, t.bbox)


# -- hot-path geometry text serializer -------------------------------------

def _coords_to_text(c) -> str:
    """Canonical text of a validated coordinates nest: every leaf is a
    float (the parser guarantees it), so no per-element type dispatch."""
    if not c:
        return "[]"
    if type(c[0]) is float:
        return "[" + ",".join(["%.16g" % x for x in c]) + "]"
    return "[" + ",".join([_coords_to_text(x) for x in c]) + "]"


def geometry_to_text(g: Geometry, bbox: Optional[list] = None) -> str:
    """Byte-identical to ``dumps_json(geometry_to_json(g, bbox))`` but
    ~3× faster on coordinate-heavy geometries (the hot path)."""
    if g.type == "GeometryCollection":
        body = (
            '{"type":"GeometryCollection","geometries":['
            + ",".join(geometry_to_text(c) for c in (g.geometries or []))
            + "]"
        )
    else:
        body = (
            '{"type":"' + g.type + '","coordinates":'
            + _coords_to_text(g.coordinates)
        )
    if bbox is not None:
        body += ',"bbox":' + _coords_to_text([float(b) for b in bbox])
    if g.foreign_members:
        for k, v in g.foreign_members.items():
            body += ',"' + _esc(k) + '":' + dumps_json(v)
    return body + "}"


def feature_to_text(f: Feature, bbox: Optional[list] = None) -> str:
    """Byte-identical fast path for Feature (member order
    geojson.ml:387-396)."""
    body = '{"type":"Feature"'
    if f.geometry is not None:
        body += ',"geometry":' + geometry_to_text(f.geometry)
    if f.properties_present:
        body += ',"properties":' + dumps_json(f.properties)
    if f.id is not None:
        body += ',"id":' + (
            '"' + _esc(f.id) + '"' if isinstance(f.id, str) else "%.16g" % f.id
        )
    if bbox is not None:
        body += ',"bbox":' + _coords_to_text([float(b) for b in bbox])
    if f.foreign_members:
        for k, v in f.foreign_members.items():
            body += ',"' + _esc(k) + '":' + dumps_json(v)
    return body + "}"


def collection_to_text(fc: FeatureCollection, bbox: Optional[list] = None) -> str:
    """Byte-identical fast path for FeatureCollection
    (geojson.ml:455-462)."""
    body = (
        '{"type":"FeatureCollection","features":['
        + ",".join(feature_to_text(f) for f in fc.features)
        + "]"
    )
    if bbox is not None:
        body += ',"bbox":' + _coords_to_text([float(b) for b in bbox])
    if fc.foreign_members:
        for k, v in fc.foreign_members.items():
            body += ',"' + _esc(k) + '":' + dumps_json(v)
    return body + "}"


def _esc(s: str) -> str:
    from .jsontext import escape_string

    return escape_string(s)
