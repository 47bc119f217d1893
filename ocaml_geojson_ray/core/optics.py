"""Composable optics: Lens / Prism / Optional.

Functional re-expression of the reference's optics library
(reference: src/geojson/optics.ml:12-51 Lens, 53-86 Prism, 88-160
Optional/infix) and the Accessor wiring (geojson.ml:518-623). Python
has no infix ``>>``; composition is the ``>>`` method on each optic
(``a >> b`` spelled ``a.then_(b)`` or ``a @ b``).

Because our model objects are mutable dataclasses, setters return
updated *copies* (reference lenses are pure too).
"""

from __future__ import annotations

import copy
from dataclasses import replace
from typing import Callable, Generic, Optional as Opt, TypeVar

from .model import Feature, FeatureCollection, Geometry

S = TypeVar("S")
A = TypeVar("A")


class Lens(Generic[S, A]):
    """Total get/set pair (optics.ml:12-51)."""

    def __init__(self, get: Callable[[S], A], set: Callable[[S, A], S]):
        self._get = get
        self._set = set

    def get(self, s: S) -> A:
        return self._get(s)

    def set(self, s: S, a: A) -> S:
        return self._set(s, a)

    def __matmul__(self, other):  # lens >> lens / lens >> prism
        if isinstance(other, Lens):
            return Lens(
                lambda s: other.get(self.get(s)),
                lambda s, a: self.set(s, other.set(self.get(s), a)),
            )
        if isinstance(other, Prism):
            return Optional_(
                lambda s: other.get(self.get(s)),
                lambda s, a: self.set(s, other.set(a)),
            )
        raise TypeError(type(other))

    then_ = __matmul__


class Prism(Generic[S, A]):
    """Partial match/build pair (optics.ml:53-86)."""

    def __init__(self, get: Callable[[S], Opt[A]], set: Callable[[A], S]):
        self._get = get
        self._set = set

    def get(self, s: S) -> Opt[A]:
        return self._get(s)

    def set(self, a: A) -> S:
        return self._set(a)

    def __matmul__(self, other):
        if isinstance(other, Prism):
            return Prism(
                lambda s: (lambda m: None if m is None else other.get(m))(self.get(s)),
                lambda a: self.set(other.set(a)),
            )
        if isinstance(other, Lens):
            return Optional_(
                lambda s: (lambda m: None if m is None else other.get(m))(self.get(s)),
                lambda s, a: (
                    s if self.get(s) is None else self.set(other.set(self.get(s), a))
                ),
            )
        raise TypeError(type(other))

    then_ = __matmul__


class Optional_(Generic[S, A]):
    """Lens whose focus may be missing (optics.ml:88-160)."""

    def __init__(self, get: Callable[[S], Opt[A]], set: Callable[[S, A], S]):
        self._get = get
        self._set = set

    def get(self, s: S) -> Opt[A]:
        return self._get(s)

    def set(self, s: S, a: A) -> S:
        return self._set(s, a)

    def __matmul__(self, other):
        if isinstance(other, (Lens, Optional_, Prism)):
            def g(s):
                m = self.get(s)
                return None if m is None else other.get(m)

            def st(s, a):
                m = self.get(s)
                if m is None:
                    return s
                if isinstance(other, Prism):
                    return self.set(s, other.set(a))
                return self.set(s, other.set(m, a))

            return Optional_(g, st)
        raise TypeError(type(other))

    then_ = __matmul__


def _copy_set(obj, **kw):
    return replace(copy.copy(obj), **kw)


# -- Accessor surface (geojson.ml:518-623) ---------------------------------

geojson: Lens = Lens(lambda t: t.value, lambda t, v: _copy_set(t, value=v))
bbox: Lens = Lens(lambda t: t.bbox, lambda t, v: _copy_set(t, bbox=v))

feature: Prism = Prism(
    lambda v: v if isinstance(v, Feature) else None, lambda f: f
)
feature_collection: Prism = Prism(
    lambda v: v if isinstance(v, FeatureCollection) else None, lambda f: f
)
geometry: Prism = Prism(
    lambda v: v if isinstance(v, Geometry) else None, lambda g: g
)


class FeatureL:
    properties = Lens(
        lambda f: f.properties,
        lambda f, p: _copy_set(f, properties=p, properties_present=p is not None),
    )
    foreign_members = Lens(
        lambda f: f.foreign_members, lambda f, m: _copy_set(f, foreign_members=m)
    )
    geometry = Lens(lambda f: f.geometry, lambda f, g: _copy_set(f, geometry=g))


class GeometryL:
    foreign_members = Lens(
        lambda g: g.foreign_members, lambda g, m: _copy_set(g, foreign_members=m)
    )

    @staticmethod
    def _typed(kind: str) -> Prism:
        return Prism(
            lambda g: g.coordinates if g.type == kind else None,
            lambda coords: Geometry(type=kind, coordinates=coords),
        )


GeometryL.point = GeometryL._typed("Point")
GeometryL.multipoint = GeometryL._typed("MultiPoint")
GeometryL.linestring = GeometryL._typed("LineString")
GeometryL.multilinestring = GeometryL._typed("MultiLineString")
GeometryL.polygon = GeometryL._typed("Polygon")
GeometryL.multipolygon = GeometryL._typed("MultiPolygon")

# list optics (optics.ml:26-41)
def nth(n: int) -> Lens:
    return Lens(
        lambda lst: lst[n],
        lambda lst, v: lst[:n] + [v] + lst[n + 1:],
    )


head: Lens = nth(0)
some: Prism = Prism(lambda o: o, lambda v: v)  # Option prism (optics.ml:63-66)


def get(optic, s):
    return optic.get(s)
