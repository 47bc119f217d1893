"""kNN via cell-ring expansion with a certified bound fallback
(SURVEY.md §2.2 N6).

k nearest polygons per point, against the broadcast PolygonIndex:

1. **Ring expansion** (dense regions — the common case): expand grid
   rings from the point's cell, collecting candidate polygons, until
   the kth-best exact distance is certified against the ring's
   lower bound ((r-1) lat-cell-extents).
2. **Centroid-bound fallback** (sparse regions): a point whose rings
   stay empty past ``max_ring`` switches to a fully vectorized bound
   search — lower bound = max(0, dist(point, poly_center) −
   poly_radius); take the best-m by bound, compute exact distances
   grouped per polygon, certify kth-exact ≤ smallest excluded bound,
   doubling m until certified. Exact for every point, no grid walk.

Distances are planar degrees to the polygon (0 inside) — the
deterministic, SQL-mirrorable metric; ties break ascending poly_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import cells as C
from . import pip as P
from .join import PolygonIndex


class KnnJoiner:
    """Actor-pool stage: per-point k nearest polygons."""

    def __init__(self, index_ref, k: int = 3, max_ring: int = 8):
        import ray

        self.index: PolygonIndex = ray.get(index_ref)
        self.k = k
        self.max_ring = max_ring
        # conservative ring bound uses the smaller (lat) cell extent
        self.cell_size = 180.0 / (1 << self.index.res)

    # -- phase 1: per-point ring expansion ---------------------------------
    def _ring_knn(self, x: float, y: float):
        """→ list[(dist2, local_idx)] of len k, or None if uncertified
        within max_ring."""
        idx = self.index
        cell = int(C.latlng_to_cell(x, y, idx.res))
        seen: set[int] = set()
        px = np.asarray([x])
        py = np.asarray([y])
        best: list[tuple[float, int]] = []
        for r in range(self.max_ring + 1):
            for c in C.grid_ring(cell, r):
                hit = idx.cell_to_polys.get(int(c))
                if hit is None:
                    continue
                for pl in hit:
                    pl = int(pl)
                    if pl in seen:
                        continue
                    seen.add(pl)
                    d2 = float(P.polygon_dist2(px, py, idx.rings[pl])[0])
                    best.append((d2, pl))
            if len(best) >= self.k and r >= 1:
                best.sort()
                if best[self.k - 1][0] <= ((r - 1) * self.cell_size) ** 2:
                    return best[: self.k]
        return None

    # -- phase 2: vectorized certified bound search ------------------------
    def _bound_knn(self, xs: np.ndarray, ys: np.ndarray):
        """→ list per point of [(dist2, local_idx)] * k. Vectorized over
        the whole unresolved set."""
        idx = self.index
        n_poly = len(idx.rings)
        k = min(self.k, n_poly)
        dcx = xs[:, None] - idx.centers[None, :, 0]
        dcy = ys[:, None] - idx.centers[None, :, 1]
        lb = np.maximum(np.sqrt(dcx * dcx + dcy * dcy) - idx.radius[None, :], 0.0)
        m = min(n_poly, max(4 * k, 16))
        results: list = [None] * len(xs)
        todo = np.arange(len(xs))
        while len(todo):
            sub = lb[todo]
            if m >= n_poly:
                cand = np.tile(np.arange(n_poly), (len(todo), 1))
                excl = np.full(len(todo), np.inf)
            else:
                part = np.argpartition(sub, m - 1, axis=1)
                cand = part[:, :m]
                rowsel = np.arange(len(todo))[:, None]
                excl = sub[rowsel, part[:, m:]].min(axis=1)
            # exact distances per (point, polygon): rectangles in one
            # vectorized expression, general polygons grouped per poly
            flat_pt = np.repeat(np.arange(len(todo)), cand.shape[1])
            flat_pl = cand.ravel()
            d2 = np.empty(len(flat_pt))
            rect = idx.is_rect[flat_pl]
            if rect.any():
                rb = idx.rect_bounds[flat_pl[rect]]
                px = xs[todo[flat_pt[rect]]]
                py = ys[todo[flat_pt[rect]]]
                dx = np.maximum(np.maximum(rb[:, 0] - px, 0.0), px - rb[:, 2])
                dy = np.maximum(np.maximum(rb[:, 1] - py, 0.0), py - rb[:, 3])
                d2[rect] = dx * dx + dy * dy
            gen = ~rect
            if gen.any():
                g_pt = flat_pt[gen]
                g_pl = flat_pl[gen]
                g_ix = np.flatnonzero(gen)
                order = np.argsort(g_pl, kind="stable")
                g_pt, g_pl, g_ix = g_pt[order], g_pl[order], g_ix[order]
                bounds = np.flatnonzero(np.diff(g_pl)) + 1
                for grp_pt, grp_pl, grp_ix in zip(
                    np.split(g_pt, bounds),
                    np.split(g_pl, bounds),
                    np.split(g_ix, bounds),
                ):
                    pl = int(grp_pl[0])
                    d2[grp_ix] = P.polygon_dist2(
                        xs[todo[grp_pt]], ys[todo[grp_pt]], idx.rings[pl]
                    )
            still = []
            for li, ti in enumerate(todo):
                mask = flat_pt == li
                dd = d2[mask]
                pp = flat_pl[mask]
                srt = np.lexsort((pp, dd))[:k]
                kth = np.sqrt(dd[srt[-1]])
                if kth <= excl[li] or m >= n_poly:
                    results[ti] = [(float(dd[s]), int(pp[s])) for s in srt]
                else:
                    still.append(ti)
            todo = np.asarray(still, dtype=np.int64)
            m = min(n_poly, m * 4)
        return results

    # below this polygon count the fully vectorized bound search beats
    # per-point ring expansion; above it the lower-bound matrix gets
    # large, so chunk the points to bound memory (64M doubles ≈ 512 MB)
    BOUND_DIRECT_MAX_POLYS = 200_000
    BOUND_CHUNK_DOUBLES = 64_000_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        n = len(batch)
        per_point: list = [None] * n
        valid = np.flatnonzero(~(np.isnan(lng) | np.isnan(lat)))
        for i in np.flatnonzero(np.isnan(lng) | np.isnan(lat)):
            per_point[i] = []
        n_poly = len(self.index.rings)
        if n_poly and n_poly <= self.BOUND_DIRECT_MAX_POLYS:
            chunk = max(1, self.BOUND_CHUNK_DOUBLES // max(1, n_poly))
            for s in range(0, len(valid), chunk):
                sel = valid[s : s + chunk]
                for ti, res in zip(sel, self._bound_knn(lng[sel], lat[sel])):
                    per_point[ti] = res
            unresolved = []
        else:
            unresolved = []
            for i in valid:
                got = self._ring_knn(lng[i], lat[i])
                if got is None:
                    unresolved.append(i)
                else:
                    per_point[i] = got
        if unresolved:
            un = np.asarray(unresolved, dtype=np.int64)
            for ti, res in zip(un, self._bound_knn(lng[un], lat[un])):
                per_point[ti] = res
        rows, ranks, polys, dists = [], [], [], []
        for i in range(n):
            for rank, (d2, pl) in enumerate(per_point[i] or []):
                rows.append(i)
                ranks.append(rank)
                polys.append(int(self.index.poly_ids[pl]))
                dists.append(float(np.sqrt(d2)))
        out = batch.take(pa.array(rows, pa.int64()))
        out = out.append_column("knn_rank", pa.array(ranks, pa.int32()))
        out = out.append_column("poly_id", pa.array(polys, pa.int64()))
        out = out.append_column("distance_deg", pa.array(dists, pa.float64()))
        return out


class PointKnn:
    """k nearest POINTS per query point (the other half of N6).

    The target point set (ids, lng, lat arrays) is broadcast once;
    each batch of query points does a chunked vectorized distance
    matrix + argpartition — exact. For target sets beyond broadcast
    size, bucket targets by cell and reuse the ring/bound machinery
    (the polygon path above); this class is the dense exact kernel.

    Distance parity with SQL: d2 = (qx-px)^2 + (qy-py)^2 — the same
    two IEEE multiplies and one add in both engines, bitwise equal.
    """

    CHUNK_DOUBLES = 48_000_000

    def __init__(self, targets_ref, k: int = 3):
        import ray

        self.ids, self.px, self.py = ray.get(targets_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qx = batch["lng"].to_numpy(zero_copy_only=False)
        qy = batch["lat"].to_numpy(zero_copy_only=False)
        n_t = len(self.px)
        k = min(self.k, n_t)
        chunk = max(1, self.CHUNK_DOUBLES // max(1, n_t))
        rows, ranks, nbr, dist = [], [], [], []
        for s in range(0, len(batch), chunk):
            e = min(len(batch), s + chunk)
            dx = qx[s:e, None] - self.px[None, :]
            dy = qy[s:e, None] - self.py[None, :]
            d2 = dx * dx + dy * dy
            part = np.argpartition(d2, k - 1, axis=1)[:, :k]
            for li in range(e - s):
                cand = part[li]
                dd = d2[li, cand]
                order = np.lexsort((self.ids[cand], dd))
                for rank, ci in enumerate(order):
                    rows.append(s + li)
                    ranks.append(rank)
                    nbr.append(int(self.ids[cand[ci]]))
                    dist.append(float(np.sqrt(dd[ci])))
        out = batch.take(pa.array(rows, pa.int64()))
        out = out.append_column("knn_rank", pa.array(ranks, pa.int32()))
        out = out.append_column("neighbor_id", pa.array(nbr, pa.int64()))
        return out.append_column("distance_deg", pa.array(dist, pa.float64()))


def knn_point_to_point(query_ds, target_ids, target_lng, target_lat,
                       k: int = 3, concurrency=None):
    import ray

    ref = ray.put((
        np.asarray(target_ids, dtype=np.int64),
        np.asarray(target_lng, dtype=np.float64),
        np.asarray(target_lat, dtype=np.float64),
    ))
    if concurrency is None:
        from ..util import elastic_concurrency

        concurrency = elastic_concurrency()
    return query_ds.map_batches(
        PointKnn,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class PointKnnPartial:
    """Per-target-batch partial top-k against a broadcast QUERY set.

    The scale-safe orientation for the common probe-small/target-huge
    shape: the huge target side streams through map_batches (never read
    on the driver, never broadcast), each batch emits, per query, its
    local top-k candidates *including boundary ties on d2* so the
    downstream merge's (d2, id) tie-break stays exact. Output volume is
    ~n_queries × k per batch — tiny — and the global merge is a groupby
    on the query id over those partials.

    d2 parity with SQL: dx*dx + dy*dy, identical per pair regardless of
    which batch the target lands in, so the merged result is bitwise
    equal to the dense single-matrix kernel.
    """

    CHUNK_DOUBLES = 48_000_000

    def __init__(self, queries_ref, k: int = 3, query_col: str = "query_id",
                 prune_radius: float | None = None, only_ids=None):
        # instance-based stateless stage: ship only the ref; resolve
        # lazily once per worker process (an actor pool here paid ~1 s
        # startup x pool width per query — measured at 32 slots)
        self.ref = queries_ref
        self.qids = None
        self.k = k
        self.query_col = query_col
        # prune_radius R: only pairs with |dlng|<=R are examined (sorted
        # window per query). Any pair with d2 <= R^2 is inside the
        # window, so results are EXACT whenever the kth distance
        # certifies <= R (checked in the merge; uncertified queries take
        # a dense second pass). Cuts the dense Q x N distance matrix —
        # the memory-bandwidth wall at 600M pairs — to ~Q x (2R/360) N.
        self.prune_radius = prune_radius
        self.only_ids = only_ids  # optional query-id subset (pass 2)

    def _empty(self) -> pa.Table:
        return pa.table({
            self.query_col: pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "d2": pa.array([], pa.float64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.qids is None:
            import ray

            self.qids, self.qx, self.qy = ray.get(self.ref)
            if self.only_ids is not None:
                keep = np.isin(self.qids, np.asarray(self.only_ids))
                self.qids = self.qids[keep]
                self.qx = self.qx[keep]
                self.qy = self.qy[keep]
        ids = batch["neighbor_id"].to_numpy(zero_copy_only=False)
        px = batch["lng"].to_numpy(zero_copy_only=False)
        py = batch["lat"].to_numpy(zero_copy_only=False)
        ok = ~(np.isnan(px) | np.isnan(py))
        if not ok.all():
            ids, px, py = ids[ok], px[ok], py[ok]
        nq = len(self.qx)
        if nq == 0 or len(px) == 0:
            return self._empty()
        if self.prune_radius is not None:
            return self._windowed(ids, px, py)
        out_q, out_id, out_d2 = [], [], []
        chunk = max(1, self.CHUNK_DOUBLES // max(1, nq))
        for s in range(0, len(px), chunk):
            e = min(len(px), s + chunk)
            dx = self.qx[:, None] - px[None, s:e]
            dy = self.qy[:, None] - py[None, s:e]
            d2 = dx * dx + dy * dy
            kk = min(self.k, e - s)
            sel = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
            thr = d2[np.arange(nq)[:, None], sel].max(axis=1)
            qi, ti = np.nonzero(d2 <= thr[:, None])
            out_q.append(self.qids[qi])
            out_id.append(ids[s:e][ti])
            out_d2.append(d2[qi, ti])
        if not out_q:
            return self._empty()
        return pa.table({
            self.query_col: pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_id), pa.int64()),
            "d2": pa.array(np.concatenate(out_d2), pa.float64()),
        })

    def _windowed(self, ids, px, py) -> pa.Table:
        """Sorted-window kernel: sort the batch by lng once, binary-
        search each query's [qx-R, qx+R] window, exact (diff)^2 math on
        the window only — identical IEEE ops per surviving pair."""
        R = self.prune_radius
        order = np.argsort(px, kind="stable")
        pxs, pys, idss = px[order], py[order], ids[order]
        lo = np.searchsorted(pxs, self.qx - R, side="left")
        hi = np.searchsorted(pxs, self.qx + R, side="right")
        out_q, out_id, out_d2 = [], [], []
        for qi in range(len(self.qx)):
            s, e = int(lo[qi]), int(hi[qi])
            if s >= e:
                continue
            dy = self.qy[qi] - pys[s:e]
            near = np.abs(dy) <= R
            if not near.any():
                continue
            dx = self.qx[qi] - pxs[s:e][near]
            dyn = dy[near]
            d2 = dx * dx + dyn * dyn
            kk = min(self.k, len(d2))
            sel = np.argpartition(d2, kk - 1)[:kk]
            thr = d2[sel].max()
            keep = d2 <= thr
            out_q.append(np.full(int(keep.sum()), self.qids[qi]))
            out_id.append(idss[s:e][near][keep])
            out_d2.append(d2[keep])
        if not out_q:
            return self._empty()
        return pa.table({
            self.query_col: pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_id), pa.int64()),
            "d2": pa.array(np.concatenate(out_d2), pa.float64()),
        })


def knn_points_stream(target_ds, query_ids, query_lng, query_lat,
                      k: int = 3, query_col: str = "query_id",
                      prune_radius: float | None = None):
    """Exact point-to-point kNN with the huge side streaming.

    ``target_ds`` must carry columns (neighbor_id, lng, lat); the small
    query side (ids + coords arrays) is broadcast once via ray.put.
    Returns (query_col, knn_rank, neighbor_id, distance_deg).

    ``prune_radius`` R enables the sorted-window kernel (see
    PointKnnPartial): pass 1 examines only |dlng|<=R pairs; the merge
    CERTIFIES each query (>= k results, kth distance <= R — any pair at
    d2 <= R^2 is inside the window, so a certified result equals the
    dense answer bitwise); uncertified queries re-run dense in a second
    streaming pass. Pick R ≈ sqrt(E·area/(π·N)) for E≈40 expected
    in-radius targets."""
    import ray

    ref = ray.put((
        np.asarray(query_ids, dtype=np.int64),
        np.asarray(query_lng, dtype=np.float64),
        np.asarray(query_lat, dtype=np.float64),
    ))

    def merge(group: pa.Table) -> pa.Table:
        d2 = group["d2"].to_numpy(zero_copy_only=False)
        nid = group["neighbor_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nid, d2))[:k]
        return pa.table({
            query_col: group[query_col].take(pa.array(order)),
            "knn_rank": pa.array(np.arange(len(order), dtype=np.int32),
                                 pa.int32()),
            "neighbor_id": pa.array(nid[order]),
            "distance_deg": pa.array(np.sqrt(d2[order]), pa.float64()),
        })

    def run(prune, only=None):
        partial = target_ds.map_batches(
            PointKnnPartial(ref, k, query_col, prune, only),
            batch_format="pyarrow",
        )
        return partial.groupby(query_col).map_groups(merge, batch_format="pyarrow")

    if prune_radius is None:
        return run(None)
    import ray.data as rd

    # pass 1 (pruned) fully merges to a tiny Q×k table; certify on it
    mt = run(prune_radius).to_pandas()
    if mt.empty:
        # nothing in-window anywhere: every query takes the dense pass
        return run(None)
    per_q = mt.groupby(query_col)["distance_deg"].agg(["count", "max"])
    certified = per_q[(per_q["count"] >= min(k, 1))
                      & (per_q["count"] >= k)
                      & (per_q["max"] <= prune_radius * 0.999)].index
    bad = np.setdiff1d(np.asarray(query_ids, dtype=np.int64),
                       certified.to_numpy())
    good = mt[mt[query_col].isin(set(certified))]
    if len(bad) == 0:
        return rd.from_pandas(good.reset_index(drop=True))
    dense_bad = run(None, only=bad)
    if len(good) == 0:
        return dense_bad
    return rd.from_pandas(good.reset_index(drop=True)).union(dense_bad)


def knn_batch_fn(batch: pa.Table, index_ref=None, k: int = 3,
                 max_ring: int = 8) -> pa.Table:
    """Stateless-task form of KnnJoiner (same output), resolving the
    broadcast index through the per-process cache — elastic, no pool
    startup (a fixed ncpu-wide pool paid ~1 s × width per query)."""
    from .join import _get_index

    joiner = KnnJoiner.__new__(KnnJoiner)
    joiner.index = _get_index(index_ref)
    joiner.k = k
    joiner.max_ring = max_ring
    joiner.cell_size = 180.0 / (1 << joiner.index.res)
    return joiner(batch)


def knn_points(points_ds, polygons_path: str, k: int = 3,
               res: int = 9, concurrency=None, batch_size: int | None = None):
    from .join import broadcast_polygon_index

    ref = broadcast_polygon_index(polygons_path, res)
    if concurrency is not None:
        return points_ds.map_batches(
            KnnJoiner,
            fn_constructor_args=(ref, k),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return points_ds.map_batches(
        knn_batch_fn,
        fn_kwargs={"index_ref": ref, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
