"""Streaming-engine-equivalent document transforms.

Re-expresses geojsone's constant-memory lexeme transforms
(reference: src/geojsone/geojsone.ml:165-290) as whole-document
functions applied per batch. The reference's triggers are *lexeme*
level: ``map_props`` fires on every member literally named
"properties" at ANY depth (geojsone.ml:209), ``map_geometry`` on every
member named "geometry" (geojsone.ml:176) — both pass any other
lexeme through verbatim, and neither re-visits the value it just
spliced in. We reproduce exactly that: a recursive walk that rewrites
matching members (without descending into the replacement) and
re-serializes with the canonical encoder, giving byte-identical output
on the golden corpus (test/geojsonm/expect/test.expected).

The memory model differs by design (SURVEY.md §3.4): the reference
holds one subtree; we hold one document per row and stream *batches* —
constant memory per worker either way, with FeatureCollections exploded
downstream for very large docs.
"""

from __future__ import annotations

from typing import Any, Callable

from ..core.jsontext import dumps_json, loads_json
from ..core.model import GeoJson, Geometry
from ..core.parse import ParseError, ParseFailure, of_json
from ..core.serialize import geometry_to_json


class StreamError(Exception):
    """The Abort channel of the streaming engine (geojsone.ml:40)."""


def _walk_members(value: Any, member: str, rewrite: Callable[[Any], Any]):
    """Rewrite every object member named ``member``; do not descend
    into replaced values (the decoder consumed that subtree)."""
    if isinstance(value, dict):
        out = {}
        for k, v in value.items():
            if k == member:
                out[k] = rewrite(v)
            else:
                out[k] = _walk_members(v, member, rewrite)
        return out
    if isinstance(value, list):
        return [_walk_members(v, member, rewrite) for v in value]
    return value


def map_props_text(doc_text: str, fn: Callable[[Any], Any]) -> str:
    """map_props (geojsone.ml:198-221): rewrite every "properties"
    member through ``fn`` (a JSON value → JSON value UDF)."""
    value = loads_json(doc_text)
    return dumps_json(_walk_members(value, "properties", fn))


def map_geometry_text(doc_text: str, fn: Callable[[Geometry], Geometry]) -> str:
    """map_geometry (geojsone.ml:165-196): parse every "geometry"
    member via the full GeoJSON parser (G.of_json), apply ``fn``,
    re-serialize preserving the member's own bbox. A member that parses
    to a Feature/FeatureCollection raises (the reference's
    Invalid_argument, geojsone.ml:188); a parse error raises
    StreamError (the Abort path, geojsone.ml:178-179).

    Known reference limitation reproduced deliberately: a *top-level
    bare geometry document* has no "geometry" member and is passed
    through untouched (TODO at geojsone.ml:176).
    """
    value = loads_json(doc_text)

    def rw(sub):
        try:
            obj = of_json(sub)
        except (ParseError, ParseFailure) as e:
            raise StreamError(str(e)) from None
        if not isinstance(obj.value, Geometry):
            raise StreamError("Expected a geometry object")
        g2 = fn(obj.value)
        return _geometry_with_bbox(g2, obj.bbox)

    return dumps_json(_walk_members(value, "geometry", rw))


def _geometry_with_bbox(g: Geometry, bbox):
    return geometry_to_json(g, bbox)


def fold_props_text(doc_text: str, fn, init):
    """fold_props (geojsone.ml:244-257): fold ``fn(acc, props_value)``
    over every "properties" member in document order."""
    value = loads_json(doc_text)
    acc = init

    def visit(v):
        nonlocal acc
        if isinstance(v, dict):
            for k, sub in v.items():
                if k == "properties":
                    acc = fn(acc, sub)
                else:
                    visit(sub)
        elif isinstance(v, list):
            for sub in v:
                visit(sub)

    visit(value)
    return acc


def fold_geometry_text(doc_text: str, fn, init):
    """fold_geometry (geojsone.ml:223-242): fold over every "geometry"
    member parsed as a Geometry."""
    value = loads_json(doc_text)
    acc = init

    def visit(v):
        nonlocal acc
        if isinstance(v, dict):
            for k, sub in v.items():
                if k == "geometry":
                    try:
                        obj = of_json(sub)
                    except (ParseError, ParseFailure) as e:
                        raise StreamError(str(e)) from None
                    if not isinstance(obj.value, Geometry):
                        raise StreamError("Expected a geometry object")
                    acc = fn(acc, obj.value)
                else:
                    visit(sub)
        elif isinstance(v, list):
            for sub in v:
                visit(sub)

    visit(value)
    return acc


def iter_geometry_text(doc_text: str, fn) -> None:
    """iter_geometry (geojsone.ml:259-275). NOTE the reference quirk:
    the callback receives the whole top-level object G.t (geometry +
    bbox), not the bare geometry — mirrored here by passing a GeoJson."""

    def wrap(acc, sub):
        fn(sub)
        return acc

    value = loads_json(doc_text)

    def visit(v):
        if isinstance(v, dict):
            for k, sub in v.items():
                if k == "geometry":
                    try:
                        obj = of_json(sub)
                    except (ParseError, ParseFailure) as e:
                        raise StreamError(str(e)) from None
                    fn(obj)
                else:
                    visit(sub)
        elif isinstance(v, list):
            for sub in v:
                visit(sub)

    visit(value)


def iter_props_text(doc_text: str, fn) -> None:
    """iter_props (geojsone.ml:277-290)."""
    fold_props_text(doc_text, lambda acc, p: (fn(p), acc)[1], None)


# -- reference golden-test UDFs (expect/test.ml:1-22) ----------------------

def capitalise_nom(props: Any) -> Any:
    """The golden map_props UDF: uppercase the "nom" member."""
    if isinstance(props, dict):
        return {
            k: (v.upper() if k == "nom" and isinstance(v, str) else v)
            for k, v in props.items()
        }
    return props


def remove_all_coords(g: Geometry) -> Geometry:
    """The golden map_geometry UDF: empty Polygon coords, keep fm."""
    if g.type == "Polygon":
        return Geometry("Polygon", [], foreign_members=g.foreign_members)
    return g
