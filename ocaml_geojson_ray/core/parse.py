"""Verdict-exact GeoJSON parser.

Reproduces the reference's ``of_json`` behaviors branch-for-branch
(reference: src/geojson/geojson.ml:485-510 top dispatch; 250-286
geometry; 347-385 feature; 421-453 collection), including its quirks
(SURVEY.md §1.3):

- ``"geometry": null`` on a Feature is REJECTED (null has no "type")
  even though RFC 7946 allows it (geojson.ml:354-368 → 250-286).
- A Feature with no ``geometry`` key at all is accepted (geojson.ml:369-373).
- LineString needs >= 2 positions — the only arity check (geojson.ml:137-139).
- Invalid non-array bbox degrades silently to None (geojson.ml:480-483);
  but a bbox *array* with a non-float element raises (the reference's
  ``decode_or_err`` failwith escapes ``catch_err``, which only catches
  Parse_error — geojson.ml:20-21, ezjsone.ml:146-147).
- Feature id must be a JSON string or number (geojson.ml:335-343).
- Top-level type that isn't Feature/FeatureCollection falls through to
  the geometry parser (geojson.ml:496-505).
- Two error channels exist in the reference: ``Error (`Msg m)`` results
  and raised ``Failure m`` exceptions (via ``decode_or_err``,
  geojson.ml:20-21). We mirror both: ``ParseFailure`` is the raised
  channel; ``of_json_result`` collapses the two into
  ``(value, error_msg, raised)`` for errors-as-data pipelines.

Known divergence: on duplicate JSON object keys, Python's dict keeps
the LAST value while the reference's assoc-list ``find`` keeps the
FIRST (ezjsone.ml:271-280, List.assoc). RFC 8259 leaves this
undefined; no fixture pins it.

Error strings use the streaming backend's accessor names
("Ezjsone.get_float" etc., ezjsone.ml:196-245) — the reference is a
functor over the JSON backend (geojson_intf.ml:402-412) and the
streaming engine instantiates it with Ezjsone (geojsone.ml:42-66).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from .jsontext import loads_json
from .model import (
    COLLECTION_KEYS_IN_USE,
    FEATURE_KEYS_IN_USE,
    GEOMETRY_KEYS_IN_USE,
    Feature,
    FeatureCollection,
    GeoJson,
    Geometry,
)

ERR_NO_TYPE = "A Geojson text should contain one object with a member `type`."
ERR_NO_COORDS = "JSON should have a key-value for `coordinates'"
ERR_LINESTRING_ARITY = "LineStrings should have two or more points"
ERR_BAD_ID = "Identifier is not a string or number"
ERR_NO_GEOMETRIES = "A geometry collection should have a member called geometries"
ERR_NO_FEATURES = "A feature collection should have a member called `features`."
ERR_GET_FLOAT = "Ezjsone.get_float"
ERR_GET_STRING = "Ezjsone.get_string"
ERR_GET_LIST = "Ezjsone.get_list"


class ParseFailure(Exception):
    """The reference's raised-``Failure`` channel (geojson.ml:20-21)."""


class ParseError(Exception):
    """Internal: the reference's ``Error (`Msg m)`` result channel.

    Used as control flow inside this module; the public API returns it
    as a message, never lets it escape.
    """


def _find(json: Any, key: str):
    """``J.find json [key]`` — None when json isn't an object or lacks
    the key (ezjsone.ml:271-280)."""
    if isinstance(json, dict) and key in json:
        return json[key]
    return None


def _has(json: Any, key: str) -> bool:
    return isinstance(json, dict) and key in json


def _to_string(v: Any) -> str:
    if isinstance(v, str):
        return v
    raise ParseError(ERR_GET_STRING)


def _to_float_or_fail(v: Any) -> float:
    """``decode_or_err J.to_float`` — raises the Failure channel
    (geojson.ml:20-21 over ezjsone.ml:220-222). Accepts int and float
    (both are `Float in the reference's model; see loads_json)."""
    t = type(v)
    if t is float:
        return v
    if t is int:
        return float(v)
    raise ParseFailure(ERR_GET_FLOAT)


def _foreign_members(json: Any, keys_in_use) -> dict:
    """Keys not consumed by the spec at this level (geojson.ml:33-39,
    327-333, 412-419); [] when json isn't an object."""
    if not isinstance(json, dict):
        return {}
    return {k: v for k, v in json.items() if k not in keys_in_use}


# --------------------------------------------------------------------------
# coordinate parsers (geojson.ml:85-224)

def _parse_point_coords(coords: Any) -> list:
    """Point.parse_coords (geojson.ml:91): non-list → Error channel
    "Ezjsone.get_list"; non-float element → RAISED "Ezjsone.get_float"."""
    if not isinstance(coords, list):
        raise ParseError(ERR_GET_LIST)
    return [_to_float_or_fail(c) for c in coords]


def _positions_fast(coords):
    """Vectorized parse of a rectangular list-of-positions; None when
    the input needs the exact per-element verdict path (ragged, mixed
    arity, non-numeric, or bool — numpy would silently coerce bools,
    which the reference rejects with Ezjsone.get_float)."""
    import numpy as _np

    try:
        arr = _np.asarray(coords, dtype=_np.float64)
    except (ValueError, TypeError):
        return None
    if arr.ndim != 2:
        return None
    for row in coords:
        for x in row:
            # numpy silently coerces bools, numeric strings ("1") and
            # None (→ NaN) to floats; the reference rejects all of them
            # (Ezjsone.get_float) — only real JSON numbers may pass
            t = type(x)
            if t is not float and t is not int:
                return None
    return arr.tolist()


def _parse_multipoint_coords(coords: Any) -> list:
    """MultiPoint.parse_coords (geojson.ml:110-112): wraps everything in
    a Failure handler, so inner failures come back on the Error channel."""
    try:
        if not isinstance(coords, list):
            raise ParseFailure(ERR_GET_LIST)
        if coords:
            fast = _positions_fast(coords)
            if fast is not None:
                return fast
        out = []
        for c in coords:
            if not isinstance(c, list):
                raise ParseFailure(ERR_GET_LIST)
            out.append([_to_float_or_fail(x) for x in c])
        return out
    except ParseFailure as e:
        raise ParseError(str(e)) from None


def _parse_linestring_coords(coords: Any) -> list:
    """LineString.parse_coords (geojson.ml:133-139): MultiPoint rules
    plus the >= 2 arity check."""
    arr = _parse_multipoint_coords(coords)
    if len(arr) < 2:
        raise ParseError(ERR_LINESTRING_ARITY)
    return arr


def _parse_ring_coords(coords: Any) -> list:
    # one ring: array of positions, no arity check (Polygon bypasses
    # LineString, geojson.ml:192-199)
    if not isinstance(coords, list):
        raise ParseFailure(ERR_GET_LIST)
    if coords:
        fast = _positions_fast(coords)
        if fast is not None:
            return fast
    out = []
    for c in coords:
        if not isinstance(c, list):
            raise ParseFailure(ERR_GET_LIST)
        out.append([_to_float_or_fail(x) for x in c])
    return out


def _parse_polygon_coords(coords: Any) -> list:
    """Polygon.parse_coords (geojson.ml:192-199): ring closure and ring
    arity are NOT validated (geojson_intf.ml:165-167)."""
    try:
        if not isinstance(coords, list):
            raise ParseFailure(ERR_GET_LIST)
        return [_parse_ring_coords(r) for r in coords]
    except ParseFailure as e:
        raise ParseError(str(e)) from None


def _parse_multipolygon_coords(coords: Any) -> list:
    """MultiPolygon.parse_coords (geojson.ml:222-224)."""
    try:
        if not isinstance(coords, list):
            raise ParseFailure(ERR_GET_LIST)
        out = []
        for p in coords:
            if not isinstance(p, list):
                raise ParseFailure(ERR_GET_LIST)
            out.append([_parse_ring_coords(r) for r in p])
        return out
    except ParseFailure as e:
        raise ParseError(str(e)) from None


_COORD_PARSERS = {
    "Point": _parse_point_coords,
    "MultiPoint": _parse_multipoint_coords,
    "LineString": _parse_linestring_coords,
    "Polygon": _parse_polygon_coords,
    "MultiLineString": lambda c: _mls_coords(c),
    "MultiPolygon": _parse_multipolygon_coords,
}


def _mls_coords(coords: Any) -> list:
    """MultiLineString.parse_coords (geojson.ml:162-164): each element
    goes through LineString rules (incl. the >=2 check)."""
    try:
        if not isinstance(coords, list):
            raise ParseFailure(ERR_GET_LIST)
        out = []
        for ls in coords:
            try:
                out.append(_parse_linestring_coords(ls))
            except ParseError as e:  # decode_or_err: Error → failwith
                raise ParseFailure(str(e)) from None
        return out
    except ParseFailure as e:
        raise ParseError(str(e)) from None


def _parse_by_type(json: Any, typ: str) -> Any:
    """parse_by_type (geojson.ml:71-83). The per-type string check is
    vacuous in the reference (the binder shadows, SURVEY.md §1.3.2), so
    only the coordinates-presence check is live here."""
    if not _has(json, "coordinates"):
        raise ParseError(ERR_NO_COORDS)
    return _COORD_PARSERS[typ](json["coordinates"])


def parse_geometry(json: Any) -> Geometry:
    """Geometry.base_of_json (geojson.ml:250-286).

    Raises ParseError (Error channel) or ParseFailure (raised channel —
    nested GeometryCollection children, geojson.ml:274).
    """
    fm = _foreign_members(json, GEOMETRY_KEYS_IN_USE)
    if not _has(json, "type"):
        raise ParseError(ERR_NO_TYPE)
    typ = _to_string(json["type"])
    if typ in _COORD_PARSERS:
        coords = _parse_by_type(json, typ)
        return Geometry(type=typ, coordinates=coords, foreign_members=fm)
    if typ == "GeometryCollection":
        if not _has(json, "geometries"):
            raise ParseError(ERR_NO_GEOMETRIES)
        lst = json["geometries"]
        if not isinstance(lst, list):
            raise ParseError(ERR_GET_LIST)
        # children parse via decode_or_err: any child Error becomes a
        # raised Failure (geojson.ml:274, 20-21)
        children = []
        for g in lst:
            try:
                children.append(parse_geometry(g))
            except ParseError as e:
                raise ParseFailure(str(e)) from None
        # NOTE: the reference's blacklist misses "geometries", so fm
        # includes it and to_json would re-emit it twice
        # (geojson.ml:250-251, 300-307). We reproduce the parse verdict
        # but drop the duplicate from fm (SURVEY.md §1.3.6 decision).
        fm.pop("geometries", None)
        return Geometry(
            type="GeometryCollection", geometries=children, foreign_members=fm
        )
    raise ParseError("Unknown type of geometry " + typ)


def _parse_id(json: Any, present: bool):
    """id_of_json (geojson.ml:335-343)."""
    if not present:
        return None
    if isinstance(json, str):
        return json
    t = type(json)
    if t is float or t is int:
        return float(json)
    raise ParseError(ERR_BAD_ID)


def parse_feature(json: Any) -> Feature:
    """Feature.base_of_json (geojson.ml:347-385)."""
    if not _has(json, "type"):
        raise ParseError(
            "A Geojson feature requires the type `Feature`. No type was found."
        )
    typ = _to_string(json["type"])
    if typ != "Feature":
        raise ParseError(
            "A Geojson feature requires the type `Feature`. Found type, but it was "
            + typ
        )
    fm = _foreign_members(json, FEATURE_KEYS_IN_USE)
    props_present = _has(json, "properties")
    props = json.get("properties") if props_present else None
    fid = _parse_id(json.get("id"), _has(json, "id"))
    if _has(json, "geometry"):
        # present (even when null!) → must parse as a geometry
        geom = parse_geometry(json["geometry"])
        return Feature(
            geometry=geom,
            properties=props,
            properties_present=props_present,
            id=fid,
            foreign_members=fm,
        )
    return Feature(
        geometry=None,
        properties=props,
        properties_present=props_present,
        id=fid,
        foreign_members=fm,
    )


def parse_feature_collection(json: Any) -> FeatureCollection:
    """Feature.Collection.base_of_json (geojson.ml:421-453)."""
    if not _has(json, "type"):
        raise ParseError(
            "A Geojson feature collection requires the type `FeatureCollection`. "
            "No type was found."
        )
    typ = _to_string(json["type"])
    if typ != "FeatureCollection":
        raise ParseError(
            "A Geojson feature collection requires the type `FeatureCollection`. "
            "Found type, but it was " + typ
        )
    fm = _foreign_members(json, COLLECTION_KEYS_IN_USE)
    if not _has(json, "features"):
        raise ParseError(ERR_NO_FEATURES)
    feats_json = json["features"]
    if not isinstance(feats_json, list):
        raise ParseError(ERR_GET_LIST)
    feats = []
    for f in feats_json:
        try:
            feats.append(parse_feature(f))
        except ParseError as e:  # decode_or_err (geojson.ml:431) → raised
            raise ParseFailure(str(e)) from None
    return FeatureCollection(features=feats, foreign_members=fm)


def _json_to_bbox(json: Any) -> Optional[list]:
    """json_to_bbox (geojson.ml:480-483): non-array → silently None;
    array with non-float element → raised Failure (see module doc)."""
    if not isinstance(json, list):
        return None
    return [_to_float_or_fail(x) for x in json]


def of_json(json: Any) -> GeoJson:
    """of_json (geojson.ml:485-510). Raises ParseError / ParseFailure."""
    if not _has(json, "type"):
        raise ParseError(ERR_NO_TYPE)
    typ = _to_string(json["type"])
    # the body parses before the bbox (geojson.ml:490-505: json_to_bbox
    # runs inside the Ok branch), so body errors win over bbox failures
    if typ == "Feature":
        body = parse_feature(json)
    elif typ == "FeatureCollection":
        body = parse_feature_collection(json)
    else:
        body = parse_geometry(json)
    bbox = _json_to_bbox(json["bbox"]) if _has(json, "bbox") else None
    return GeoJson(body, bbox=bbox)


def of_json_result(json: Any) -> Tuple[Optional[GeoJson], Optional[str], bool]:
    """Collapse both error channels: → (value, error, raised).

    ``raised`` is True when the reference would have thrown Failure out
    of ``of_json`` rather than returning ``Error (`Msg m)``.
    Pathologically deep documents (thousands of nested
    GeometryCollections) exhaust Python's recursion limit; that becomes
    an error verdict, never a worker crash (the reference's OCaml
    recursion would blow the stack on such inputs too —
    geojsone.ml:176's own TODO flags nested collections).
    """
    try:
        return of_json(json), None, False
    except ParseError as e:
        return None, str(e), False
    except ParseFailure as e:
        return None, str(e), True
    except RecursionError:
        return None, "document nesting exceeds the recursion limit", False


def parse_text(text: str | bytes) -> Tuple[Optional[GeoJson], Optional[str], bool]:
    """JSON-decode + GeoJSON-parse with errors as data."""
    try:
        v = loads_json(text)
    except ValueError as e:
        return None, f"JSON.of_buffer {e}", False
    except RecursionError:
        return None, "JSON.of_buffer document nesting exceeds the recursion limit", False
    return of_json_result(v)


def parse_text_recovering(
    text: str | bytes,
) -> Tuple[Optional[GeoJson], Optional[str], bool, bool]:
    """Like parse_text, but with the streaming lexer's error RECOVERY
    (jsontext.recover_json_text — U+FFFD splices for bad escapes /
    control chars, per jsone.ml:327-420) applied when strict decode
    fails. → (obj, error, raised, recovered); ``recovered`` marks a
    document that only parsed after lexical repair."""
    from .jsontext import loads_json_recovering

    try:
        v, recovered = loads_json_recovering(text)
    except ValueError as e:
        return None, f"JSON.of_buffer {e}", False, False
    except RecursionError:
        return (None, "JSON.of_buffer document nesting exceeds the recursion limit",
                False, False)
    obj, err, raised = of_json_result(v)
    return obj, err, raised, recovered
