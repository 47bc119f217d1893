"""GeoJSON data model.

Mirrors the reference's types (reference: src/geojson/geojson.ml:239-248,
315-320, 404-407, 468-473) in idiomatic Python:

- Position       — list[float] of length 2 or 3, [lng, lat, alt?]
                   (geojson.ml:41-52; lng,lat order per RFC 7946)
- Geometry       — tagged union of the 7 kinds + foreign members
                   (geojson.ml:239-248)
- Feature        — optional geometry, free-form properties JSON,
                   foreign members, optional string-or-number id
                   (geojson.ml:315-320)
- FeatureCollection — features + foreign members (geojson.ml:404-407)
- GeoJson        — top-level sum + optional bbox (geojson.ml:468-473)

JSON payloads (properties, foreign members) are plain Python values with
all numbers as float (see jsontext.loads_json).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union

GEOMETRY_TYPES = (
    "Point",
    "MultiPoint",
    "LineString",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
    "GeometryCollection",
)

# Blacklists used for foreign-member extraction (geojson.ml:33-39,
# 327-333, 412-419).
GEOMETRY_KEYS_IN_USE = ("type", "coordinates", "bbox")
FEATURE_KEYS_IN_USE = ("type", "geometry", "properties", "id", "bbox")
COLLECTION_KEYS_IN_USE = ("type", "geometry", "properties", "id", "bbox", "features")


def position(lng: float, lat: float, altitude: Optional[float] = None) -> list:
    """Position constructor (geojson.ml:49-52)."""
    if altitude is not None:
        return [float(lng), float(lat), float(altitude)]
    return [float(lng), float(lat)]


def pos_lng(p) -> float:
    return p[0]


def pos_lat(p) -> float:
    return p[1]


def pos_altitude(p) -> Optional[float]:
    return p[2] if len(p) > 2 else None


@dataclass
class Geometry:
    """One geometry: ``type`` tags which shape ``coordinates`` holds.

    coordinates nesting depth by type (geojson.ml:85-224):
      Point           [x, y(, z)]
      MultiPoint      [[x, y], ...]
      LineString      [[x, y], ...]          (>= 2 enforced at parse)
      MultiLineString [[[x, y], ...], ...]
      Polygon         [[[x, y], ...], ...]   (ring 0 = exterior)
      MultiPolygon    [[[[x, y], ...], ...], ...]
    GeometryCollection stores child geometries in ``geometries`` and
    leaves ``coordinates`` None (geojson.ml:271-280).
    """

    type: str
    coordinates: Any = None
    geometries: Optional[list["Geometry"]] = None
    foreign_members: dict = field(default_factory=dict)

    # -- accessors mirroring the reference API ------------------------------
    def exterior_ring(self):
        """Polygon exterior ring (geojson.ml:181-183)."""
        return self.coordinates[0]

    def interior_rings(self):
        """Polygon interior rings (geojson.ml:184-188)."""
        return self.coordinates[1:]

    def __post_init__(self):
        if self.type not in GEOMETRY_TYPES:
            raise ValueError(f"not a geometry type: {self.type}")


FeatureId = Union[str, float, None]


@dataclass
class Feature:
    """A GeoJSON Feature (geojson.ml:315-320).

    ``properties`` is ``None`` when the key was absent; note the key may
    be present with JSON null, which is stored as the sentinel
    ``JSON_NULL_PRESENT`` distinction via ``has_properties``.
    The reference stores `J.find json ["properties"]` verbatim
    (an ``option``), so ``properties=None`` ⇔ key absent and
    ``properties=<value>`` (possibly JSON null ⇒ we keep
    ``properties_present=True`` with value None).
    """

    geometry: Optional[Geometry] = None
    properties: Any = None
    properties_present: bool = False
    id: FeatureId = None  # str | float | None (geojson.ml:335-343)
    foreign_members: dict = field(default_factory=dict)


@dataclass
class FeatureCollection:
    features: list = field(default_factory=list)
    foreign_members: dict = field(default_factory=dict)


@dataclass
class GeoJson:
    """Top-level object: exactly one of feature / collection / geometry,
    plus optional bbox (geojson.ml:468-477)."""

    value: Union[Feature, FeatureCollection, Geometry]
    bbox: Optional[list] = None

    @property
    def kind(self) -> str:
        if isinstance(self.value, Feature):
            return "Feature"
        if isinstance(self.value, FeatureCollection):
            return "FeatureCollection"
        return "Geometry"
