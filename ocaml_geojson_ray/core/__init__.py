"""Pure-Python GeoJSON core: model, parser, serializer, optics, generator.

This layer has no Ray dependency; the Ray stages compose it per batch.
"""

from .jsontext import dumps_json, loads_json
from .model import (
    Feature,
    FeatureCollection,
    GeoJson,
    Geometry,
    position,
)
from .parse import ParseFailure, of_json, of_json_result, parse_text
from .serialize import to_json, to_text

__all__ = [
    "dumps_json",
    "loads_json",
    "Feature",
    "FeatureCollection",
    "GeoJson",
    "Geometry",
    "position",
    "ParseFailure",
    "of_json",
    "of_json_result",
    "parse_text",
    "to_json",
    "to_text",
]
