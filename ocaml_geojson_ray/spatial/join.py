"""Cell-bucketed spatial join (SURVEY.md §2.2 N5).

Two physical plans, chosen by build-side size:

1. **Broadcast map-side join** (default; the polygon layer is the small
   side): the polygon index — cell → candidate polygon ids at JOIN_RES,
   plus ring coordinate arrays — is built once on the driver and
   ``ray.put`` ONCE; every join actor reads it in ``__init__`` (never
   re-shipped per batch). Probe side streams through
   ``map_batches(SpatialJoiner, concurrency=N)`` with vectorized PIP
   refinement. No shuffle at all.
2. **Partitioned hash join** (both sides large): add the cell key to
   both sides, explode the polygon side over its covering cells, and
   hash-join on ``cell`` (Dataset.join when available, else bucketed
   groupby) — see ``cell_partitioned_join``. Skew: mega-cells are split
   to child cells first (skew.py).

The PIP tie-break rule is pinned in spatial/pip.py (half-open edges).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import cells as C
from . import pip as P

DEFAULT_JOIN_RES = 9  # ~0.7° cells; polygon layer radii are 0.01°-2°


class PolygonIndex:
    """Driver-built, broadcast-once index of the polygon layer.

    Ring storage is FLAT — one (total_pts, 2) float64 array plus ring/
    polygon offset arrays — so the ray.put/worker-get path serializes
    three big numpy buffers instead of ~n_polys small ones (measured:
    20k-rect layer pickle 0.35 s → ~0.03 s, and the per-worker
    deserialize shrinks the same way; at a 10⁶-polygon layer this is
    the difference between seconds and minutes of driver/actor time).
    ``rings`` / ``bbox`` are lazily-built cached views for the PIP and
    kNN consumers; the caches never travel through the object store
    (__getstate__ drops them)."""

    __slots__ = ("res", "cell_to_polys", "poly_ids", "names",
                 "centers", "radius", "is_rect", "rect_bounds",
                 "flat", "ring_offs", "poly_offs", "bbox_arr",
                 "_rings_cache", "_bbox_cache")

    def __init__(self, rows, res: int = DEFAULT_JOIN_RES):
        """rows: iterable of dicts with poly_id, name, rings, minx..maxy
        (the polygons parquet schema, sources/polygons.py).

        Construction is VECTORIZED across polygons (cell coverage, cell
        grouping, centers/radii, rect detection) — per-polygon
        cover_bbox calls cost ~115 µs each, i.e. ~2 min of driver time
        for a 10^6-polygon layer. For pure-rectangle layers prefer the
        fully-array ``from_rect_arrays`` fast path."""
        rows = list(rows)
        n = len(rows)
        self.res = res
        self.poly_ids = np.fromiter(
            (r["poly_id"] for r in rows), dtype=np.int64, count=n)
        self.names = [r["name"] for r in rows]
        ring_list = [np.asarray(ring, dtype=np.float64)
                     for r in rows for ring in r["rings"]]
        ring_sizes = np.fromiter((len(rg) for rg in ring_list),
                                 dtype=np.int64, count=len(ring_list))
        self.flat = (np.concatenate(ring_list, axis=0) if ring_list
                     else np.zeros((0, 2)))
        self.ring_offs = np.concatenate([[0], np.cumsum(ring_sizes)])
        nrings = np.fromiter((len(r["rings"]) for r in rows),
                             dtype=np.int64, count=n)
        self.poly_offs = np.concatenate([[0], np.cumsum(nrings)])
        self.bbox_arr = (np.asarray(
            [(r["minx"], r["miny"], r["maxx"], r["maxy"]) for r in rows],
            dtype=np.float64) if n else np.zeros((0, 4)))
        self._rings_cache = None
        self._bbox_cache = None
        self._finish_from_bbox()

    def _finish_from_bbox(self):
        """Shared tail of construction: cell coverage, centers/radii,
        rect detection — all from the flat arrays + bbox_arr."""
        n = len(self.poly_ids)
        res = self.res
        bb = self.bbox_arr

        # -- covering cells, flat-expanded over ALL polygons -----------
        nres = 1 << res
        if n:
            wrap = bb[:, 0] > bb[:, 2]  # antimeridian: rare, loop below
            x0 = np.clip(np.floor((bb[:, 0] + 180.0) / 360.0 * nres),
                         0, nres - 1).astype(np.int64)
            x1 = np.clip(np.floor((bb[:, 2] + 180.0) / 360.0 * nres),
                         0, nres - 1).astype(np.int64)
            y0 = np.clip(np.floor((bb[:, 1] + 90.0) / 180.0 * nres),
                         0, nres - 1).astype(np.int64)
            y1 = np.clip(np.floor((bb[:, 3] + 90.0) / 180.0 * nres),
                         0, nres - 1).astype(np.int64)
            counts = np.where(wrap, 0, (x1 - x0 + 1) * (y1 - y0 + 1))
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            rep = np.repeat(np.arange(n, dtype=np.int64), counts)
            local = np.arange(int(counts.sum()), dtype=np.int64) - starts[rep]
            ny = y1[rep] - y0[rep] + 1
            cells = C.pack_cell(res, x0[rep] + local // ny, y0[rep] + local % ny)
            if wrap.any():
                extra_p, extra_c = [], []
                for i in np.flatnonzero(wrap):
                    cc = C.cover_bbox(bb[i, 0], bb[i, 1], bb[i, 2], bb[i, 3], res)
                    extra_p.append(np.full(len(cc), i, dtype=np.int64))
                    extra_c.append(cc)
                rep = np.concatenate([rep] + extra_p)
                cells = np.concatenate([cells] + extra_c)
            order = np.argsort(cells, kind="stable")
            sc, sp = cells[order], rep[order]
            uniq, ustarts = np.unique(sc, return_index=True)
            uends = np.append(ustarts[1:], len(sc))
            self.cell_to_polys = {
                int(u): np.ascontiguousarray(sp[s:e])
                for u, s, e in zip(uniq, ustarts, uends)
            }
        else:
            self.cell_to_polys = {}

        # -- per-polygon center + enclosing radius (kNN lower bounds),
        #    reduceat straight over the flat point array ------------------
        if n:
            offs = self.ring_offs[self.poly_offs[:-1]]
            sizes = (self.ring_offs[self.poly_offs[1:]]
                     - self.ring_offs[self.poly_offs[:-1]])
            sums = np.add.reduceat(self.flat, offs, axis=0)
            self.centers = sums / sizes[:, None]
            d2 = ((self.flat - np.repeat(self.centers, sizes, axis=0)) ** 2
                  ).sum(axis=1)
            self.radius = np.sqrt(np.maximum.reduceat(d2, offs))
        else:
            self.centers = np.zeros((0, 2))
            self.radius = np.zeros(0)

        # -- axis-aligned rectangle detection: for such polygons the
        # half-open ray-cast verdict is EXACTLY the bbox comparison
        # (see spatial/pip.py), so the join evaluates all their
        # candidates in one vectorized expression instead of a
        # per-polygon PIP loop. Candidates (single 5-point closed ring)
        # are gathered from the flat array and tested in one pass.
        self.is_rect = np.zeros(n, dtype=bool)
        self.rect_bounds = np.zeros((n, 4), dtype=np.float64)
        one_ring = (self.poly_offs[1:] - self.poly_offs[:-1]) == 1
        if n:
            sizes_p = (self.ring_offs[self.poly_offs[1:]]
                       - self.ring_offs[self.poly_offs[:-1]])
            cand_mask = one_ring & (sizes_p == 5)
        else:
            cand_mask = np.zeros(0, dtype=bool)
        if cand_mask.any():
            ci = np.flatnonzero(cand_mask)
            starts = self.ring_offs[self.poly_offs[ci]]
            stack = self.flat[(starts[:, None]
                               + np.arange(5)[None, :]).ravel()]
            stack = stack.reshape(len(ci), 5, 2)
            closed = (stack[:, 0] == stack[:, 4]).all(axis=1)
            xs_min = stack[:, :4, 0].min(axis=1)
            xs_max = stack[:, :4, 0].max(axis=1)
            ys_min = stack[:, :4, 1].min(axis=1)
            ys_max = stack[:, :4, 1].max(axis=1)
            # exactly the 4 distinct bbox corners, each appearing once:
            # every x/y is one of the two extremes, extremes differ, and
            # each (min/max × min/max) corner appears exactly once
            x_ok = ((stack[:, :4, 0] == xs_min[:, None])
                    | (stack[:, :4, 0] == xs_max[:, None])).all(axis=1)
            y_ok = ((stack[:, :4, 1] == ys_min[:, None])
                    | (stack[:, :4, 1] == ys_max[:, None])).all(axis=1)
            nondeg = (xs_min != xs_max) & (ys_min != ys_max)
            distinct = np.ones(len(ci), dtype=bool)
            for xe, ye in ((xs_min, ys_min), (xs_min, ys_max),
                           (xs_max, ys_min), (xs_max, ys_max)):
                hits = ((stack[:, :4, 0] == xe[:, None])
                        & (stack[:, :4, 1] == ye[:, None])).sum(axis=1)
                distinct &= hits == 1
            ok = closed & x_ok & y_ok & nondeg & distinct
            sel = ci[ok]
            self.is_rect[sel] = True
            self.rect_bounds[sel, 0] = xs_min[ok]
            self.rect_bounds[sel, 1] = ys_min[ok]
            self.rect_bounds[sel, 2] = xs_max[ok]
            self.rect_bounds[sel, 3] = ys_max[ok]

    # -- lazy per-polygon ring views (rebuilt per process, never
    #    serialized) --------------------------------------------------------
    @property
    def rings(self):
        if self._rings_cache is None:
            ro, po = self.ring_offs, self.poly_offs
            self._rings_cache = [
                [self.flat[ro[j]:ro[j + 1]] for j in range(po[i], po[i + 1])]
                for i in range(len(po) - 1)
            ]
        return self._rings_cache

    @property
    def bbox(self):
        if self._bbox_cache is None:
            self._bbox_cache = [tuple(row) for row in self.bbox_arr]
        return self._bbox_cache

    def __getstate__(self):
        return {s: getattr(self, s) for s in self.__slots__
                if s not in ("_rings_cache", "_bbox_cache")}

    def __setstate__(self, state):
        for k, v in state.items():
            setattr(self, k, v)
        self._rings_cache = None
        self._bbox_cache = None

    @classmethod
    def from_rect_arrays(cls, poly_ids, names, minx, miny, maxx, maxy,
                         res: int = DEFAULT_JOIN_RES):
        """Array-native fast path for an axis-aligned-rectangle layer:
        no per-row dicts, no per-ring Python — the 5-point closed rings
        are synthesized directly into the flat buffer. Semantics are
        IDENTICAL to the generic constructor on the equivalent rows
        (pinned by tests); degenerate rects (zero width/height) simply
        fail rect detection and fall to the PIP path like any other
        polygon."""
        self = cls.__new__(cls)
        n = len(poly_ids)
        minx = np.asarray(minx, dtype=np.float64)
        miny = np.asarray(miny, dtype=np.float64)
        maxx = np.asarray(maxx, dtype=np.float64)
        maxy = np.asarray(maxy, dtype=np.float64)
        flat = np.empty((n * 5, 2), dtype=np.float64)
        flat[0::5, 0] = minx; flat[0::5, 1] = miny
        flat[1::5, 0] = maxx; flat[1::5, 1] = miny
        flat[2::5, 0] = maxx; flat[2::5, 1] = maxy
        flat[3::5, 0] = minx; flat[3::5, 1] = maxy
        flat[4::5, 0] = minx; flat[4::5, 1] = miny
        self.res = res
        self.poly_ids = np.asarray(poly_ids, dtype=np.int64)
        self.names = list(names)
        self.flat = flat
        self.ring_offs = np.arange(n + 1, dtype=np.int64) * 5
        self.poly_offs = np.arange(n + 1, dtype=np.int64)
        self.bbox_arr = np.stack([minx, miny, maxx, maxy], axis=1) \
            if n else np.zeros((0, 4))
        self._rings_cache = None
        self._bbox_cache = None
        self._finish_from_bbox()
        return self

    @classmethod
    def from_parquet(cls, path: str, res: int = DEFAULT_JOIN_RES):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        return cls(t.to_pylist(), res)

    def candidates_for_points(self, lng: np.ndarray, lat: np.ndarray):
        """→ (point_idx, local_poly_idx) candidate pair arrays.

        Vectorized by UNIQUE cell (one dict lookup per distinct cell in
        the batch, not per point — a 600k-point batch touches only a
        few thousand distinct cells)."""
        cell = C.latlng_to_cell(lng, lat, self.res)
        order = np.argsort(cell, kind="stable")
        sorted_cells = cell[order]
        uniq, starts = np.unique(sorted_cells, return_index=True)
        ends = np.append(starts[1:], len(sorted_cells))
        pts, polys = [], []
        for u, s, e in zip(uniq, starts, ends):
            hit = self.cell_to_polys.get(int(u))
            if hit is not None:
                grp = order[s:e]
                pts.append(np.repeat(grp, len(hit)))
                polys.append(np.tile(hit, e - s))
        if not pts:
            return (np.empty(0, dtype=np.int64),) * 2
        return np.concatenate(pts), np.concatenate(polys)


class SpatialJoiner:
    """Actor-pool probe stage: point features × broadcast polygon index.

    __init__ runs once per actor (ray.get of the broadcast index);
    __call__ per batch: cell lookup → group candidate pairs by polygon
    → one vectorized PIP per polygon over its candidate points.
    """

    def __init__(self, index_ref, how: str = "inner"):
        import ray

        self.index: PolygonIndex = ray.get(index_ref)
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lng) | np.isnan(lat))
        pt_idx, poly_idx = self.index.candidates_for_points(
            np.where(valid, lng, 1e9), np.where(valid, lat, 1e9)
        )
        match_pt, match_poly = [], []
        if len(pt_idx):
            # rectangle candidates: one vectorized bbox test for ALL
            rect_mask = self.index.is_rect[poly_idx]
            if rect_mask.any():
                rp = pt_idx[rect_mask]
                rl = poly_idx[rect_mask]
                b = self.index.rect_bounds[rl]
                inside = (
                    (lng[rp] >= b[:, 0]) & (lng[rp] < b[:, 2])
                    & (lat[rp] >= b[:, 1]) & (lat[rp] < b[:, 3])
                )
                if inside.any():
                    match_pt.append(rp[inside])
                    match_poly.append(rl[inside])
            # general polygons: grouped per-polygon vectorized PIP
            gen_pt = pt_idx[~rect_mask]
            gen_poly = poly_idx[~rect_mask]
            order = np.argsort(gen_poly, kind="stable")
            gen_pt, gen_poly = gen_pt[order], gen_poly[order]
            bounds = np.flatnonzero(np.diff(gen_poly)) + 1
            for grp_pts, grp_poly in zip(
                np.split(gen_pt, bounds), np.split(gen_poly, bounds)
            ):
                if not len(grp_pts):
                    continue
                pl = int(grp_poly[0])
                inside = P.points_in_polygon(lng[grp_pts], lat[grp_pts],
                                             self.index.rings[pl])
                hit = grp_pts[inside]
                if len(hit):
                    match_pt.append(hit)
                    match_poly.append(np.full(len(hit), pl, dtype=np.int64))
        if match_pt:
            mp = np.concatenate(match_pt)
            mpoly = np.concatenate(match_poly)
        else:
            mp = np.empty(0, dtype=np.int64)
            mpoly = np.empty(0, dtype=np.int64)
        taken = batch.take(pa.array(mp))
        out = taken.append_column(
            "poly_id", pa.array(self.index.poly_ids[mpoly], pa.int64())
        )
        out = out.append_column(
            "poly_name", pa.array([self.index.names[i] for i in mpoly], pa.string())
        )
        return out


# per-worker-process cache of broadcast indexes: a stateless task UDF
# resolves the ObjectRef once per process (equivalent amortization to
# an actor pool, but elastic and fusion-friendly)
_INDEX_CACHE: dict = {}


def _get_index(index_ref) -> "PolygonIndex":
    import ray

    key = index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref)
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        idx = ray.get(index_ref)
        _INDEX_CACHE.clear()  # hold at most one index per worker
        _INDEX_CACHE[key] = idx
    return idx


def join_batch_fn(batch: pa.Table, index_ref=None) -> pa.Table:
    """Stateless-task form of SpatialJoiner (same output), using the
    per-process index cache — scales elastically with no pool startup."""
    joiner = SpatialJoiner.__new__(SpatialJoiner)
    joiner.index = _get_index(index_ref)
    joiner.how = "inner"
    return joiner(batch)


# driver-side memo of built+put indexes: repeated pipelines over the
# same layer skip the ~0.35 s build+serialize (path-keyed; list inputs
# are not memoized)
_BROADCAST_MEMO: dict = {}


def broadcast_polygon_index(polygons, res: int = DEFAULT_JOIN_RES):
    """Build + ray.put the index once; returns the object ref.

    ``polygons``: parquet path, list of row dicts, PolygonIndex, or an
    already-broadcast ObjectRef (returned as-is).
    """
    import ray

    if isinstance(polygons, ray.ObjectRef):
        return polygons
    if isinstance(polygons, str):
        from ..util import ray_session_token

        key = (polygons, res, ray_session_token())
        ref = _BROADCAST_MEMO.get(key)
        if ref is not None:
            return ref
        ref = ray.put(PolygonIndex.from_parquet(polygons, res))
        _BROADCAST_MEMO.clear()  # refs from older sessions are dead
        _BROADCAST_MEMO[key] = ref
        return ref
    if isinstance(polygons, PolygonIndex):
        idx = polygons
    else:
        idx = PolygonIndex(polygons, res)
    return ray.put(idx)


def spatial_join_points(points_ds, polygons_path,
                        res: int = DEFAULT_JOIN_RES, concurrency=None,
                        batch_size: int | None = None):
    """points Dataset (needs lng/lat cols) ⋈ polygon layer → matches.

    Default physical plan: STATELESS tasks + per-worker-process index
    cache (elastic, fusion-friendly). Pass an explicit ``concurrency``
    to use the actor-pool form instead — but know the failure modes we
    measured: an autoscaling pool lagging at few actors strangles the
    fused upstream chain (0.27 scaling efficiency), and a fixed pool
    spanning every CPU starves the unfused read/write stages (fixed
    concurrency=4 on a 4-CPU session deadlocks).
    """
    ref = broadcast_polygon_index(polygons_path, res)
    # Stateless tasks + per-process index cache by default: an actor
    # pool here pins the fused upstream chain to the pool's width and
    # pays pool startup per pipeline (observed: 0.27-0.41 scaling
    # efficiency); tasks scale elastically. batch_size=None keeps
    # per-block batches so fusion can't coarsen upstream parallelism
    # (observed: batch_size=8192 → 6 tasks for a 50k-page table).
    if concurrency is not None:
        return points_ds.map_batches(
            SpatialJoiner,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return points_ds.map_batches(
        join_batch_fn,
        fn_kwargs={"index_ref": ref},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


# -- envelope (range) join --------------------------------------------------

class EnvelopeJoiner:
    """Broadcast envelope-overlap join: probe envelopes × indexed
    polygon-layer envelopes.

    Candidates come from the probe envelope's covering cells, deduped
    per probe before the overlap test. (In the partitioned/shuffled
    variant of this join, the equivalent dedup is the REFERENCE-POINT
    rule: emit a pair only from the cell containing the intersection's
    lower-left corner — exactly one cell per pair, no post-shuffle
    distinct.)

    Overlap rule (strict, mirroring the SQL oracle): a.minx < b.maxx
    AND a.maxx > b.minx AND a.miny < b.maxy AND a.maxy > b.miny —
    touching edges do NOT join.
    """

    def __init__(self, index_ref):
        import ray

        self.index: PolygonIndex = ray.get(index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        res = idx.res
        n = 1 << res
        minx = batch["minx"].to_numpy(zero_copy_only=False)
        miny = batch["miny"].to_numpy(zero_copy_only=False)
        maxx = batch["maxx"].to_numpy(zero_copy_only=False)
        maxy = batch["maxy"].to_numpy(zero_copy_only=False)
        # every build polygon's exact envelope (rect or not)
        use = np.asarray(idx.bbox, dtype=np.float64)

        # 1. per-probe covering-cell RANGES, fully vectorized (the rare
        #    antimeridian-crossing probe, minx > maxx, falls back to
        #    cover_bbox below)
        bad = np.isnan(minx) | np.isnan(miny) | np.isnan(maxx) | np.isnan(maxy)
        wrap = ~bad & (minx > maxx)
        # NaN rows are masked out via counts=0 below, but floor(NaN)
        # .astype(int64) is an undefined cast + a RuntimeWarning per
        # batch — zero the bad bounds before the cast
        sx0 = np.where(bad, 0.0, minx)
        sx1 = np.where(bad, 0.0, maxx)
        sy0 = np.where(bad, 0.0, miny)
        sy1 = np.where(bad, 0.0, maxy)
        x0 = np.clip(np.floor((sx0 + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
        x1 = np.clip(np.floor((sx1 + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
        y0 = np.clip(np.floor((sy0 + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
        y1 = np.clip(np.floor((sy1 + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
        counts = np.where(bad | wrap, 0, (x1 - x0 + 1) * (y1 - y0 + 1))

        # 2. flat (probe, cell) expansion: one arange over the total
        total = int(counts.sum())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        probe = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        local = np.arange(total, dtype=np.int64) - starts[probe]
        ny = y1[probe] - y0[probe] + 1
        cell = C.pack_cell(res, x0[probe] + local // ny, y0[probe] + local % ny)
        if wrap.any():
            extra_p, extra_c = [], []
            for i in np.flatnonzero(wrap):
                cc = C.cover_bbox(minx[i], miny[i], maxx[i], maxy[i], res)
                extra_p.append(np.full(len(cc), i, dtype=np.int64))
                extra_c.append(cc)
            probe = np.concatenate([probe] + extra_p)
            cell = np.concatenate([cell] + extra_c)

        # 3. candidate pairs grouped by UNIQUE cell (one dict lookup per
        #    distinct cell, as in candidates_for_points)
        order = np.argsort(cell, kind="stable")
        sc, sp = cell[order], probe[order]
        uniq, ustarts = np.unique(sc, return_index=True)
        uends = np.append(ustarts[1:], len(sc))
        pr, pl = [], []
        for u, s, e in zip(uniq, ustarts, uends):
            hit = idx.cell_to_polys.get(int(u))
            if hit is not None:
                grp = sp[s:e]
                pr.append(np.repeat(grp, len(hit)))
                pl.append(np.tile(hit, e - s))
        if pr:
            pr = np.concatenate(pr)
            pl = np.concatenate(pl)
            # 4. dedup (probe, poly) pairs — a probe's bbox can cover
            #    many cells holding the same polygon
            key = pr * np.int64(len(use)) + pl
            _, first = np.unique(key, return_index=True)
            pr, pl = pr[first], pl[first]
            # 5. one vectorized strict-overlap test over ALL pairs
            b = use[pl]
            overlap = (
                (minx[pr] < b[:, 2]) & (maxx[pr] > b[:, 0])
                & (miny[pr] < b[:, 3]) & (maxy[pr] > b[:, 1])
            )
            rows, polys = pr[overlap], pl[overlap]
        else:
            rows = np.empty(0, dtype=np.int64)
            polys = np.empty(0, dtype=np.int64)
        out = batch.take(pa.array(rows))
        return out.append_column(
            "poly_id", pa.array(self.index.poly_ids[polys], pa.int64())
        )


def envelope_batch_fn(batch: pa.Table, index_ref=None) -> pa.Table:
    """Stateless-task form of EnvelopeJoiner (same output), using the
    per-process index cache — elastic, no pool startup."""
    joiner = EnvelopeJoiner.__new__(EnvelopeJoiner)
    joiner.index = _get_index(index_ref)
    return joiner(batch)


def envelope_join(probe_ds, polygons, res: int = DEFAULT_JOIN_RES,
                  concurrency=None):
    """Envelope-overlap join: probe Dataset (minx..maxy columns) ×
    broadcast polygon layer. Stateless tasks + per-process index cache
    by default (pool form behind ``concurrency``)."""
    ref = broadcast_polygon_index(polygons, res)
    if concurrency is not None:
        return probe_ds.map_batches(
            EnvelopeJoiner,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return probe_ds.map_batches(
        envelope_batch_fn,
        fn_kwargs={"index_ref": ref},
        batch_format="pyarrow",
    )


def spatial_join_features(features_ds, polygons, res: int = DEFAULT_JOIN_RES):
    """Mixed-geometry join of parsed features against a polygon layer:
    Point rows go through the exact PIP join; every other geometry
    joins by envelope overlap (documented approximation for non-point
    shapes — exact refinement would intersect geometries). Returns the
    union with a ``join_kind`` column ('pip' | 'envelope')."""
    import pyarrow.compute as pc

    ref = broadcast_polygon_index(polygons, res)

    def pts_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(pc.equal(b["geom_type"], "Point"), b["ok"]))

    def nonpts_only(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.and_(
                pc.and_(b["ok"], pc.invert(pc.equal(b["geom_type"], "Point"))),
                pc.is_valid(b["minx"]),
            )
        )

    pip = features_ds.map_batches(pts_only, batch_format="pyarrow").map_batches(
        join_batch_fn, fn_kwargs={"index_ref": ref}, batch_format="pyarrow"
    )
    pip = pip.map_batches(
        lambda b: b.append_column(
            "join_kind", pa.array(["pip"] * len(b), pa.string())
        ),
        batch_format="pyarrow",
    ).drop_columns(["poly_name"])
    env = features_ds.map_batches(nonpts_only, batch_format="pyarrow").map_batches(
        envelope_batch_fn, fn_kwargs={"index_ref": ref},
        batch_format="pyarrow",
    )
    env = env.map_batches(
        lambda b: b.append_column(
            "join_kind", pa.array(["envelope"] * len(b), pa.string())
        ),
        batch_format="pyarrow",
    )
    return pip.union(env)


# -- large-large fallback ---------------------------------------------------

def add_cell_column(batch: pa.Table, res: int = DEFAULT_JOIN_RES,
                    lng_col: str = "lng", lat_col: str = "lat") -> pa.Table:
    """Stateless map_batches step: attach the join cell key (N4 when run
    in an actor pool via CellEncoder below)."""
    lng = batch[lng_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    ok = ~(np.isnan(lng) | np.isnan(lat))
    cell = C.latlng_to_cell(np.where(ok, lng, 0.0), np.where(ok, lat, 0.0), res)
    return batch.append_column(
        "cell", pa.array(np.where(ok, cell, -1), pa.int64())
    )


class CellEncoder:
    """Stateful cell-encoder actor pool (N4): precomputes per-resolution
    scale tables once per actor, encodes quad + s2 cells per batch."""

    def __init__(self, res: int = DEFAULT_JOIN_RES, s2_level: int = 11,
                 lng_col: str = "lng", lat_col: str = "lat",
                 s2_parity: bool = False):
        self.res = res
        self.s2_level = s2_level
        self.lng_col = lng_col
        self.lat_col = lat_col
        # oracle-parity s2 variant (bit-portable across engines; see
        # cells.s2_latlng_to_cell_parity) — used by SQL-checked queries
        self.s2_fn = (C.s2_latlng_to_cell_parity if s2_parity
                      else C.s2_latlng_to_cell)
        # "model load" analog: fixed tables derived once
        self.nq = 1 << res
        self.ns = 1 << s2_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch[self.lng_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        ok = ~(np.isnan(lng) | np.isnan(lat))
        safe_lng = np.where(ok, lng, 0.0)
        safe_lat = np.where(ok, lat, 0.0)
        quad = C.latlng_to_cell(safe_lng, safe_lat, self.res)
        s2 = self.s2_fn(safe_lng, safe_lat, self.s2_level)
        batch = batch.append_column(
            "cell", pa.array(np.where(ok, quad, -1), pa.int64())
        )
        return batch.append_column(
            "s2_cell", pa.array(np.where(ok, s2, -1), pa.int64())
        )


def explode_poly_cells(batch: pa.Table, res: int = DEFAULT_JOIN_RES) -> pa.Table:
    """Polygon layer → flat (cell, poly_id) coverage rows, VECTORIZED
    across the batch (same flat-range expansion as PolygonIndex) — the
    ring geometry stays OUT of this table, so the cell shuffle moves
    two int64 columns instead of per-(polygon × cell) ring copies.
    Antimeridian-wrapping bboxes (minx > maxx, rare) fall back to
    cover_bbox per row."""
    n = len(batch)
    if n == 0:
        return pa.table({
            "cell": pa.array([], pa.int64()),
            "poly_id": pa.array([], pa.int64()),
        })
    nres = 1 << res
    pid = batch["poly_id"].to_numpy(zero_copy_only=False)
    minx = batch["minx"].to_numpy(zero_copy_only=False)
    miny = batch["miny"].to_numpy(zero_copy_only=False)
    maxx = batch["maxx"].to_numpy(zero_copy_only=False)
    maxy = batch["maxy"].to_numpy(zero_copy_only=False)
    wrap = minx > maxx
    x0 = np.clip(np.floor((minx + 180.0) / 360.0 * nres), 0, nres - 1).astype(np.int64)
    x1 = np.clip(np.floor((maxx + 180.0) / 360.0 * nres), 0, nres - 1).astype(np.int64)
    y0 = np.clip(np.floor((miny + 90.0) / 180.0 * nres), 0, nres - 1).astype(np.int64)
    y1 = np.clip(np.floor((maxy + 90.0) / 180.0 * nres), 0, nres - 1).astype(np.int64)
    counts = np.where(wrap, 0, (x1 - x0 + 1) * (y1 - y0 + 1))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rep = np.repeat(np.arange(n, dtype=np.int64), counts)
    local = np.arange(int(counts.sum()), dtype=np.int64) - starts[rep]
    ny = y1[rep] - y0[rep] + 1
    cells = C.pack_cell(res, x0[rep] + local // ny, y0[rep] + local % ny)
    out_pid = pid[rep]
    if wrap.any():
        extra_p, extra_c = [], []
        for i in np.flatnonzero(wrap):
            cc = C.cover_bbox(minx[i], miny[i], maxx[i], maxy[i], res)
            extra_p.append(np.full(len(cc), pid[i], dtype=np.int64))
            extra_c.append(cc)
        out_pid = np.concatenate([out_pid] + extra_p)
        cells = np.concatenate([cells] + extra_c)
    return pa.table({
        "cell": pa.array(cells, pa.int64()),
        "poly_id": pa.array(out_pid, pa.int64()),
    })


def cell_partitioned_join(points_ds, polys_ds, res: int = DEFAULT_JOIN_RES):
    """Both-sides-large plan (N5 fallback), rings-out-of-shuffle:

    1. points get their (single) cell key; polygons explode to
       (cell, poly_id) coverage pairs ONLY — vectorized, no geometry.
    2. hash-join on ``cell`` → candidate (point × poly_id) rows. A
       point lives in exactly one cell at res, so a candidate pair can
       arise from only one cell — the partitioned analog of the
       reference-point dedup rule, no post-shuffle distinct needed.
    3. the ring table (ONE serialized ring set per polygon, not per
       covering cell) joins back by ``poly_id``; the PIP refinement
       groups each batch by polygon and tests vectorized.

    Shuffle volume: points once + 2 int64 coverage columns + one ring
    copy per polygon — the round-2 plan shipped rings duplicated per
    covering cell AND re-serialized them per row in Python.
    """
    import ray
    import ray.data  # noqa: F401

    def rings_table(batch: pa.Table) -> pa.Table:
        import json as _json

        # one JSON serialization per POLYGON (a join-safe scalar column;
        # nested list<list<list<f64>>> through the hash join would also
        # work but costs more to shuffle than the compact text)
        rows = batch.to_pylist()
        return pa.table({
            "poly_id": pa.array([r["poly_id"] for r in rows], pa.int64()),
            "rings_json": pa.array([_json.dumps(r["rings"]) for r in rows],
                                   pa.string()),
        })

    pts = points_ds.map_batches(add_cell_column, batch_format="pyarrow",
                                fn_kwargs={"res": res})
    pl = polys_ds.map_batches(explode_poly_cells, batch_format="pyarrow",
                              fn_kwargs={"res": res})
    # partitions sized to the cluster: the hash-join aggregators reserve
    # CPU per partition, and a count larger than the session's CPUs
    # stalls the operator forever (observed: num_partitions=64 on a
    # 4-CPU session → Join backpressured at 8 reserved CPUs, 0 tasks)
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    np_ = max(2, ncpu // 2)
    cands = pts.join(pl, join_type="inner", on=("cell",),
                     num_partitions=np_)
    rings = polys_ds.map_batches(rings_table, batch_format="pyarrow")
    joined = cands.join(rings, join_type="inner", on=("poly_id",),
                        num_partitions=np_)

    def refine(batch: pa.Table) -> pa.Table:
        import json as _json

        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        pids = batch["poly_id"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(batch), dtype=bool)
        # group candidate rows by polygon (vectorized argsort, not a
        # per-row dict loop) so each ring set parses ONCE per batch and
        # each PIP call is one vectorized pass over that polygon's rows
        order = np.argsort(pids, kind="stable")
        bounds = np.flatnonzero(np.diff(pids[order])) + 1
        rings_col = batch["rings_json"]
        for grp in np.split(order, bounds):
            if not len(grp):
                continue
            rings = _json.loads(rings_col[grp[0]].as_py())
            keep[grp] = P.points_in_polygon(lng[grp], lat[grp], rings)
        return batch.filter(pa.array(keep)).drop_columns(["rings_json"])

    return joined.map_batches(refine, batch_format="pyarrow")
