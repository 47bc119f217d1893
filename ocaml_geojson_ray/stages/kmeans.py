"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The clustering step of a training-data pipeline (and the proper
version of the IVF coarse quantizer in ann.py, which uses a one-shot
driver sample): centroids are o(input) and broadcast ONCE per
iteration (`ray.put`); each batch computes assignments with one
matmul-based distance kernel and reduces to per-centroid partial
(vector-sum, count, inertia) — k·dim floats per block — which funnel
to a tiny combine; the driver only averages k vectors. Nothing
corpus-sized leaves the workers; iterations are O(iters) passes over
a streaming Dataset.

Determinism: init is the first k rows in vec_id order (a fixed,
documented seed set); argmin ties break to the lowest centroid index.
Lloyd's guarantee — inertia is non-increasing per iteration — is the
self-check hook (asserted by the query and pinned in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import vec_mat


def _dists_sq(v: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n,k) squared euclidean distances via the expansion trick —
    one matmul instead of an (n,k,d) broadcast."""
    # ||v-c||² = ||v||² - 2 v·c + ||c||²
    vv = (v * v).sum(axis=1, keepdims=True)
    cc = (c * c).sum(axis=1)
    d = vv - 2.0 * (v @ c.T) + cc[None, :]
    np.maximum(d, 0.0, out=d)  # numerical floor
    return d


def _blk_min_ids(k: int, id_col: str, vec_col: str):
    """Per-block partial min-k seed scan (shared by the float and
    integer fitters): each block surfaces its own k id-smallest rows;
    the driver merges <= n_blocks*k candidates. Seed semantics assume
    UNIQUE ids (true of vec_id in every fixture): a duplicated id
    among the k smallest would seed two identical centroids here but
    one fanned-out centroid in the SQL oracle's DISTINCT-based seed."""
    def blk_topk(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        keep = np.sort(np.argsort(ids, kind="stable")[:k])
        return b.select([id_col, vec_col]).take(pa.array(keep))

    return blk_topk


def _quant(v: np.ndarray, scale: float, offset: int) -> np.ndarray:
    """THE integer-grid quantization device: floor(x*scale + 0.5) +
    offset, shared by kmeans_int_fit and kmeans_int_assign and
    mirrored verbatim in SQL_KMEANS_INT_CLUSTERS — a parity device
    like util.md5_le64, never inline a copy (fit and assign on
    different grids would produce a wrong-but-plausible clustering)."""
    return (np.floor(v * scale + 0.5) + float(offset)).astype(np.int64)


def _idists_int(q: np.ndarray, c: np.ndarray):
    """Exact int64 expansion-trick distances + first-min assignment
    (argmin's first-occurrence rule IS the tie-to-lowest-cid rule the
    SQL oracle mirrors with ORDER BY dist, cid)."""
    qq = (q * q).sum(axis=1, keepdims=True)
    cc = (c * c).sum(axis=1)
    d = qq - 2 * (q @ c.T) + cc[None, :]
    a = d.argmin(axis=1)
    return a, d[np.arange(len(q)), a]


def kmeans_fit(ds, vec_col: str = "embedding", k: int = 16,
               iters: int = 5, id_col: str = "vec_id"):
    """→ (centroids (k,d), inertia_per_iter list). ``ds`` must have a
    fixed-length list<float> column; it is scanned ``iters`` times.

    Init is the k rows with the SMALLEST ``id_col`` values — enforced
    by a distributed partial min-k scan (each block surfaces its own
    k id-smallest rows; the driver merges ≤ n_blocks·k rows), so the
    seed is deterministic regardless of block/file order. Pass
    ``id_col=None`` to fall back to the first k rows in dataset order
    (cheaper, order-dependent)."""
    import ray

    if id_col is None:
        first = ds.take(k)
        seed = [r[vec_col] for r in first]
    else:
        cand = ds.map_batches(_blk_min_ids(k, id_col, vec_col),
                              batch_format="pyarrow").take_all()
        cand.sort(key=lambda r: r[id_col])
        seed = [r[vec_col] for r in cand[:k]]
    centroids = np.asarray(seed, dtype=np.float64)
    inertias = []

    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                # empty blocks reach map fns (filters/repartitions
                # produce them) and vec_mat's (0,0) would break the
                # matmul shapes
                return pa.table({
                    "cid": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "cnt": pa.array([], pa.int64()),
                    "inertia": pa.array([], pa.float64()),
                })
            c = ray.get(ref)
            v = vec_mat(b[vec_col])
            d = _dists_sq(v, c)
            a = d.argmin(axis=1)
            kk, dim = c.shape
            sums = np.zeros((kk, dim), np.float64)
            np.add.at(sums, a, v)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            inert = float(d[np.arange(len(v)), a].sum())
            return pa.table({
                "cid": pa.array(np.arange(kk), pa.int64()),
                "vsum": pa.array(sums.tolist(),
                                 pa.list_(pa.float64())),
                "cnt": pa.array(cnt, pa.int64()),
                "inertia": pa.array(np.full(kk, inert / kk), pa.float64()),
            })

        def combine(b: pa.Table) -> pa.Table:
            cid = b["cid"].to_numpy()
            cnt = b["cnt"].to_numpy()
            vs = vec_mat(b["vsum"])
            inert = b["inertia"].to_numpy()
            kk = int(cid.max()) + 1 if len(cid) else 0
            sums = np.zeros((kk, vs.shape[1]), np.float64)
            np.add.at(sums, cid, vs)
            counts = np.zeros(kk, np.int64)
            np.add.at(counts, cid, cnt)
            return pa.table({
                "cid": pa.array(np.arange(kk), pa.int64()),
                "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "cnt": pa.array(counts, pa.int64()),
                "inertia": pa.array(
                    np.full(kk, float(inert.sum()) / max(kk, 1)),
                    pa.float64()),
            })

        rows = (
            ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(combine, batch_format="pyarrow")
            .take_all()
        )
        counts = np.array([r["cnt"] for r in rows], dtype=np.float64)
        sums = np.asarray([r["vsum"] for r in rows], dtype=np.float64)
        inertias.append(float(sum(r["inertia"] for r in rows)))
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    return centroids, inertias


def kmeans_assign_sizes(ds, centroids: np.ndarray,
                        vec_col: str = "embedding"):
    """Final per-cluster sizes: broadcast centroids, per-batch partial
    counts, tiny combine → Dataset(cluster_id, size)."""
    import ray

    from ..util import grouped_sum_combine

    ref = ray.put(centroids)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "cluster_id": pa.array([], pa.int64()),
                "partial": pa.array([], pa.int64()),
            })
        c = ray.get(ref)
        v = vec_mat(b[vec_col])
        a = _dists_sq(v, c).argmin(axis=1)
        cnt = np.bincount(a, minlength=len(c))
        nz = cnt > 0
        return pa.table({
            "cluster_id": pa.array(np.flatnonzero(nz), pa.int64()),
            "partial": pa.array(cnt[nz].astype(np.int64), pa.int64()),
        })

    return grouped_sum_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cluster_id"], "partial", "size")


def kmeans_int_fit(ds, vec_col: str = "embedding", k: int = 8,
                   iters: int = 3, id_col: str = "vec_id",
                   scale: float = 1e6, offset: int = 1 << 20):
    """Integer-grid Lloyd's: the ORACLE-CHECKABLE k-means twin (the
    pagerank_parts device applied to clustering — see
    pipelines/queries.py:SQL_KMEANS_INT_CLUSTERS).

    Coordinates are quantized once with the repo's standard half-up
    device q = floor(x * scale + 0.5) + offset (offset makes every
    value positive, so Python/numpy floor division and DuckDB ``//``
    agree — both truncate on non-negatives) and EVERYTHING downstream
    is exact int64: distances via the integer expansion trick
    (||q||^2 - 2 q.c + ||c||^2, an int64 matmul — exact, no float
    rounding), argmin ties to the lowest centroid index, and the
    centroid update is the FLOOR of the cluster mean (empty clusters
    keep their previous centroid). Unlike float Lloyd's, the result is
    a pure function of the input multiset — per-batch integer partial
    sums are order-independent — which is what makes a bit-exact SQL
    oracle possible. The ~1/scale quantization error is semantically
    negligible for unit-scale embeddings.

    Bounds (documented, asserted nowhere hot): with |x| <= 1 and
    scale = 1e6, q < 2^21, per-coordinate cluster sums fit int64 up to
    ~4e12 assigned rows. Per-batch inertia partials: the ADVERSARIAL
    per-row distance bound is 64*(2^21)^2 ~ 2.8e14, so int64 holds to
    ~3e4 rows/batch worst-case (real nearest-centroid distances are
    orders smaller; default Ray batches stay well inside). A 100-TB
    deployment keeps the int64 per-batch partials and widens only the
    tiny driver-side combine to Python ints (arbitrary precision), as
    the gated funnels elsewhere do.

    -> (centroids int64 (k,d), per-iteration quantized inertia list).
    """
    import ray

    def quant(v: np.ndarray) -> np.ndarray:
        return _quant(v, scale, offset)

    cand = ds.map_batches(_blk_min_ids(k, id_col, vec_col),
                          batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: r[id_col])
    centroids = quant(np.asarray([r[vec_col] for r in cand[:k]],
                                 dtype=np.float64))
    inertias = []

    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({
                    "cid": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.int64())),
                    "cnt": pa.array([], pa.int64()),
                    "inertia": pa.array([], pa.int64()),
                })
            c = ray.get(ref)
            q = quant(vec_mat(b[vec_col]))  # vec_mat is already float64
            a, dmin = _idists_int(q, c)
            kk, dim = c.shape
            sums = np.zeros((kk, dim), np.int64)
            np.add.at(sums, a, q)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            inert = np.zeros(kk, np.int64)
            np.add.at(inert, a, dmin)
            return pa.table({
                "cid": pa.array(np.arange(kk), pa.int64()),
                "vsum": pa.array(sums.tolist(), pa.list_(pa.int64())),
                "cnt": pa.array(cnt, pa.int64()),
                "inertia": pa.array(inert, pa.int64()),
            })

        # combine the bounded partials (k rows x (d-list, cnt, inertia)
        # per block) on the driver — exact int sums are order-free, and
        # skipping a per-iteration groupby shuffle on a tiny table cuts
        # the latency-dominated cost ~4x (a hash shuffle round per
        # Lloyd pass dwarfed the integer math at bench scale)
        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        kk, dim = centroids.shape
        counts = np.zeros(kk, np.int64)
        sums = np.zeros((kk, dim), np.int64)
        inert_total = 0
        for r in rows:
            counts[r["cid"]] += r["cnt"]
            sums[r["cid"]] += np.asarray(r["vsum"], dtype=np.int64)
            inert_total += int(r["inertia"])
        inertias.append(inert_total)
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] // counts[nonempty, None]

    return centroids, inertias


def kmeans_int_assign(ds, centroids: np.ndarray,
                      vec_col: str = "embedding",
                      scale: float = 1e6, offset: int = 1 << 20):
    """Final integer assignment -> Dataset(cid, n_vecs, inertia_q),
    nonempty clusters only; exact int64 throughout (same quantization
    device as kmeans_int_fit)."""
    import ray

    ref = ray.put(centroids)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "cid": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
                "inertia_q": pa.array([], pa.int64()),
            })
        c = ray.get(ref)
        q = _quant(vec_mat(b[vec_col]), scale, offset)
        a, dmin = _idists_int(q, c)
        kk = len(c)
        cnt = np.bincount(a, minlength=kk).astype(np.int64)
        inert = np.zeros(kk, np.int64)
        np.add.at(inert, a, dmin)
        nz = cnt > 0
        return pa.table({
            "cid": pa.array(np.flatnonzero(nz), pa.int64()),
            "n_vecs": pa.array(cnt[nz], pa.int64()),
            "inertia_q": pa.array(inert[nz], pa.int64()),
        })

    # driver-side combine of the bounded partials (<= k rows per
    # block): exact int sums are order-free, and a sort-based groupby
    # shuffle on a k-row table costs more than the whole assignment
    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    kk = len(centroids)
    cnt = np.zeros(kk, np.int64)
    inert = np.zeros(kk, np.int64)
    for r in rows:
        cnt[r["cid"]] += r["n_vecs"]
        inert[r["cid"]] += r["inertia_q"]
    nz = np.flatnonzero(cnt > 0)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "cid": pa.array(nz, pa.int64()),
        "n_vecs": pa.array(cnt[nz], pa.int64()),
        "inertia_q": pa.array(inert[nz], pa.int64()),
    }))
