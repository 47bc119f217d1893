"""Similarity search over an embedding column (list<float>).

- ``BruteForceTopK``: exact cosine top-k per query — the broadcast
  query matrix is ``ray.put`` ONCE; each actor does one numpy matmul
  per batch and keeps a per-actor running top-k heap, emitting ONE
  partial top-k table per batch; a final tiny groupby folds partials.
- ``ivf_topk``: the scale path — k-means-ish coarse quantizer (trained
  on a driver-side sample), vectors bucketed by nearest centroid (one
  shuffle), queries probe only the nearest ``nprobe`` buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import vec_mat


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """Instance-based STATELESS-TASK stage: ships only the ObjectRef;
    each worker process resolves the broadcast query matrix once
    (lazy, plasma-shared). A fixed actor pool here paid ~1 s startup
    per actor per query — measured regression at 32 slots."""

    def __init__(self, queries_ref, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.ref = queries_ref
        self.qids = None
        self.qmat = None
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def _ensure(self):
        if self.qids is None:
            import ray

            q = ray.get(self.ref)  # dict: query_id -> vector
            self.qids = np.asarray(list(q.keys()))
            self.qmat = _normalize(np.asarray(list(q.values()), dtype=np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        vecs = _normalize(vec_mat(batch[self.vec_col]))
        sim = self.qmat @ vecs.T  # (Q, n)
        k = min(self.k, sim.shape[1])
        # local top-k per query
        part = np.argpartition(-sim, k - 1, axis=1)[:, :k]
        out_q, out_id, out_s = [], [], []
        for qi in range(sim.shape[0]):
            for c in part[qi]:
                out_q.append(self.qids[qi])
                out_id.append(ids[c])
                out_s.append(sim[qi, c])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(np.round(out_s, 6), pa.float64()),
            }
        )


def _topk_merge(score_col: str, k: int, id_col: str, ascending: bool):
    """Shared per-query partial-top-k merge (brute / IVF / PQ all use
    it): deterministic (score, id) order, top-k cut, 0-based rank."""
    def merge(g: pa.Table) -> pa.Table:
        s = g[score_col].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, s if ascending else -s))[:k]
        g = g.take(pa.array(order))
        return g.append_column(
            "rank", pa.array(np.arange(len(order)), pa.int64()))

    return merge


def brute_force_topk(ds, queries: dict, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency=None):
    """→ exact global top-k rows per query: partial top-k per batch,
    then one tiny per-query merge (groupby over ~Q×k×nblocks rows;
    pyarrow groups — bounded here, but per-group pandas is the pattern
    an unbounded-key stage must never copy)."""
    import ray

    ref = ray.put(queries)
    partials = ds.map_batches(
        BruteForceTopK(ref, k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
    )

    return partials.groupby("query_id").map_groups(
        _topk_merge("cosine", k, id_col, ascending=False),
        batch_format="pyarrow")


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10,
                    seed: int = 5) -> np.ndarray:
    """Tiny k-means on a driver-side sample (Lloyd, fixed iters)."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        sim = sample @ cent.T
        assign = sim.argmax(axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(ds, queries: dict, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", sample_rows: int = 2048):
    """IVF ANN: bucket by nearest centroid (ONE shuffle on the bucket
    key), probe only ``nprobe`` buckets per query. Approximate — recall
    measured against brute force in tests."""
    import ray

    sample = np.asarray(
        [r[vec_col] for r in ds.limit(sample_rows).take_all()], dtype=np.float64
    )
    cent = train_centroids(sample, n_centroids)
    cent_ref = ray.put(cent)

    qids = np.asarray(list(queries.keys()))
    qmat = _normalize(np.asarray(list(queries.values()), dtype=np.float64))
    qsim = qmat @ cent.T
    probe = np.argsort(-qsim, axis=1)[:, :nprobe]  # (Q, nprobe)
    # bucket -> queries probing it
    bucket_queries = {}
    for qi, buckets in enumerate(probe):
        for b in buckets:
            bucket_queries.setdefault(int(b), []).append(qi)
    bq_ref = ray.put((qids, qmat, bucket_queries))

    def assign_bucket(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        vecs = _normalize(vec_mat(batch[vec_col]))
        b = (vecs @ c.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    probe_schema = pa.schema([("query_id", pa.int64()),
                              (id_col, pa.int64()),
                              ("cosine", pa.float64())])

    def probe_bucket(g: pa.Table) -> pa.Table:
        qids_, qmat_, bq = ray.get(bq_ref)
        b = int(g["bucket"][0].as_py())
        probing = bq.get(b, [])
        if not probing:
            return probe_schema.empty_table()
        ids = g[id_col].to_numpy(zero_copy_only=False)
        vecs = _normalize(vec_mat(g[vec_col]))
        sim = qmat_[probing] @ vecs.T  # (n_probing, b)
        kk = min(k, sim.shape[1])
        # vectorized per-bucket top-k across ALL probing queries at once
        top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]  # (n_probing, kk)
        rows = np.repeat(np.asarray(probing), kk)
        cols = top.ravel()
        return pa.table({
            "query_id": pa.array(qids_[rows].astype(np.int64), pa.int64()),
            id_col: pa.array(ids[cols], pa.int64()),
            "cosine": pa.array(
                np.round(sim[np.repeat(np.arange(len(probing)), kk), cols], 6),
                pa.float64()),
        })

    partials = (
        ds.map_batches(assign_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(probe_bucket, batch_format="pyarrow")
    )

    return partials.groupby("query_id").map_groups(
        _topk_merge("cosine", k, id_col, ascending=False),
        batch_format="pyarrow")


# -- Product quantization (PQ) ----------------------------------------------

def pq_fit(sample: np.ndarray, m: int = 8, ksub: int = 16,
           iters: int = 10, seed: int = 9) -> np.ndarray:
    """Per-subspace L2 codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the d dims into
    m contiguous subspaces and run a tiny Lloyd's per subspace on the
    driver sample (the IVF coarse-quantizer precedent — bounded
    sample, k·d-size result). → (m, ksub, d//m) float64."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for mi in range(m):
        sub = sample[:, mi * dsub:(mi + 1) * dsub]
        idx = rng.choice(n, size=min(ksub, n), replace=False)
        cent = sub[idx].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                mm = sub[assign == c]
                if len(mm):
                    cent[c] = mm.mean(axis=0)
        books[mi, :len(cent)] = cent
        if len(cent) < ksub:  # tiny sample: pad with repeats
            books[mi, len(cent):] = cent[0]
    return books


def pq_topk(ds, queries: dict, k: int = 10, m: int = 8, ksub: int = 16,
            id_col: str = "vec_id", vec_col: str = "embedding",
            sample_rows: int = 2048):
    """PQ ANN via ADC (asymmetric distance computation) — the
    memory-bound scale path of the similarity-search family
    (brute = compute-bound exact, IVF = partition-and-probe, PQ =
    8 bits/subspace codes so a 10⁹-vector corpus's codes fit in RAM):
    each batch encodes vectors to per-subspace nearest-centroid codes
    and accumulates Σ_m LUT[q, m, code] distances — one (Q, ksub)
    lookup table per subspace per query, built ONCE per task from the
    broadcast codebooks; per-batch top-k partials funnel through the
    same per-query merge as IVF. Approximate — recall self-checked on
    planted near-identical pairs (identical codes ⇒ identical ADC)."""
    import ray

    sample = np.asarray(
        [r[vec_col] for r in ds.limit(sample_rows).take_all()],
        dtype=np.float64)
    books = pq_fit(sample, m=m, ksub=ksub)
    qids = np.asarray(list(queries.keys()), dtype=np.int64)
    qmat = np.asarray(list(queries.values()), dtype=np.float64)
    dsub = qmat.shape[1] // m
    # (Q, m, ksub) ADC lookup tables — squared L2 of each query
    # subvector to every centroid of that subspace
    lut = np.empty((len(qids), m, ksub), dtype=np.float64)
    for mi in range(m):
        qs = qmat[:, mi * dsub:(mi + 1) * dsub]
        lut[:, mi, :] = ((qs[:, None, :] - books[mi][None, :, :]) ** 2).sum(-1)
    state_ref = ray.put((books, qids, lut))

    def adc_partial(batch: pa.Table) -> pa.Table:
        from ..util import cached_get

        books_, qids_, lut_ = cached_get(state_ref)
        ids = batch[id_col].to_numpy()
        vecs = vec_mat(batch[vec_col])
        if not len(ids):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        dist = np.zeros((len(qids_), len(ids)), dtype=np.float64)
        for mi in range(books_.shape[0]):
            sub = vecs[:, mi * dsub:(mi + 1) * dsub]
            code = ((sub[:, None, :] - books_[mi][None, :, :]) ** 2) \
                .sum(-1).argmin(axis=1)
            dist += lut_[:, mi, :][:, code]
        kk = min(k, dist.shape[1])
        # tie-aware cut: equal ADC is REAL (identical codes ⇒ equal
        # distance, pinned in tests), so the batch-local boundary must
        # already be (adc, id)-ordered or the survivor is plan-dependent
        top = np.stack([np.lexsort((ids, dist[q]))[:kk]
                        for q in range(dist.shape[0])])
        rows = np.repeat(np.arange(len(qids_)), kk)
        cols = top.ravel()
        return pa.table({
            "query_id": pa.array(qids_[rows], pa.int64()),
            id_col: pa.array(ids[cols], pa.int64()),
            "adc": pa.array(dist[rows, cols], pa.float64()),
        })

    partials = ds.map_batches(adc_partial, batch_format="pyarrow")

    return partials.groupby("query_id").map_groups(
        _topk_merge("adc", k, id_col, ascending=True),
        batch_format="pyarrow")
