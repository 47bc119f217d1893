"""Deduplication operators (exact + near-dup family).

All shapes follow the scale pattern: vectorized per-batch signature
computation (map_batches), then ONE small shuffle on the signature key
(hash-partition groupby), never an all-pairs comparison:

- exact          — md5(text) → groupby(hash) first-wins (min doc_id)
- MinHash + LSH  — word shingles → 128 minhashes → b bands × r rows →
                   groupby(band, band_hash) emits candidate pairs →
                   verified Jaccard
- SimHash        — 64-bit simhash over word hashes; duplicates =
                   identical simhash buckets (groupby)
- n-gram Jaccard — exact verification kernel used by the LSH pipeline
- embedding cosine near-dup — normalized vectors → LSH-ish sign
                   buckets → within-bucket cosine ≥ τ
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import md5_le64, vec_mat


# splitmix64-style avalanche (public-domain constants); uint64
# wraparound is the intended arithmetic — suppress numpy's scalar
# overflow warning
def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


_POLY_P = np.uint64(0x100000001B3)  # FNV-1a odd multiplier


def _hash_string_array(sa: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """→ (uint64 hash, byte length) per element of a StringArray.

    Fully vectorized over the array's raw UTF-8 value buffer: a
    positional polynomial Σ (byte_i + 1)·P^i per segment (add.reduceat)
    xor'd with the length, then a splitmix64 finalizer. Any
    well-distributed 64-bit hash is a valid MinHash basis (candidate
    recall is set by the band/row parameters and every pair is
    Jaccard-verified downstream) — this replaces the round-2 per-word
    Python md5 loop that was the compute wall of the slowest query."""
    n = len(sa)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    off_dt = np.int64 if pa.types.is_large_string(sa.type) else np.int32
    bufs = sa.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt)[
        sa.offset : sa.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    seg = data[offs[0] : offs[-1]].astype(np.uint64)
    offs0 = offs - offs[0]
    lengths = np.diff(offs0)
    maxlen = int(lengths.max())
    with np.errstate(over="ignore"):
        if maxlen:
            pows = np.empty(maxlen, dtype=np.uint64)
            pows[0] = 1
            if maxlen > 1:
                np.multiply.accumulate(
                    np.full(maxlen - 1, _POLY_P, dtype=np.uint64), out=pows[1:]
                )
            pos = np.arange(len(seg), dtype=np.int64) - np.repeat(
                offs0[:-1], lengths
            )
            terms = (seg + np.uint64(1)) * pows[pos]
            # reduceat quirks: a start equal to len(terms) (trailing
            # empty word) raises, and start==next start (interior empty
            # word) returns terms[start]. Pad ONE zero term (identity
            # for the last real segment) so every start is in range,
            # then zero the empty rows.
            terms = np.concatenate([terms, np.zeros(1, dtype=np.uint64)])
            sums = np.add.reduceat(terms, offs0[:-1])
            sums = np.where(lengths == 0, np.uint64(0), sums)
        else:
            sums = np.zeros(n, dtype=np.uint64)
        h = _mix64(
            sums ^ (lengths.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        )
    return h, lengths


def _shingles_batch(texts, k: int,
                    tokenizer: str = "unicode") -> tuple[np.ndarray, np.ndarray]:
    """→ (flat shingle hashes uint64 across all docs, per-doc shingle
    counts int64). Whole pipeline is Arrow/numpy kernels: whitespace
    split (C), dictionary-encode-free direct hash of the flat word
    array, then ONE rolling-window mix over the concatenated word
    hashes with doc-boundary masking — no per-word or per-doc Python.

    Per-doc semantics match the scalar definition: docs with ≥ k words
    emit one shingle per window; docs with 1..k-1 words emit one
    combined shingle; empty/whitespace-only docs emit none.

    ``tokenizer``: "unicode" (utf8_split_whitespace — the minhash/ngram
    dedup family) or "ascii" (the definitional [ \\t\\n\\r\\f\\v]+ class
    used wherever a DuckDB string_split_regex oracle must match
    bit-for-bit, e.g. repetition_stats)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if tokenizer == "ascii":
        words = pc.split_pattern_regex(
            pc.utf8_trim(texts, " \t\n\r\f\v"), pattern="[ \t\n\r\f\v]+")
    else:
        words = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    woffs = np.asarray(words.offsets).astype(np.int64)
    flat = words.values
    wh, wlen = _hash_string_array(flat)
    cnt = np.diff(woffs)
    # a whitespace-only/empty text trims+splits to one '' token — that
    # doc has NO words (mirrors str.split())
    if len(flat):
        empty_tok = wlen == 0
        first_tok = np.minimum(woffs[:-1], len(flat) - 1)
        cnt = np.where((cnt == 1) & empty_tok[first_tok], 0, cnt)
    sizes = np.where(cnt == 0, 0, np.where(cnt >= k, cnt - k + 1, 1))
    total = int(sizes.sum())
    out = np.zeros(total, dtype=np.uint64)
    out_offs = np.concatenate([[0], np.cumsum(sizes)])
    N = len(wh)

    # long docs: one rolling pass over the ENTIRE flat hash array, then
    # gather only the windows that do not cross a doc boundary
    if N >= k:
        acc = wh[: N - k + 1].copy()
        with np.errstate(over="ignore"):
            for j in range(1, k):
                acc = _mix64(acc ^ np.uint64(j)) ^ wh[j : j + len(acc)]
        acc = _mix64(acc)
        long_docs = np.flatnonzero(cnt >= k)
        if len(long_docs):
            nwin = sizes[long_docs]
            rep = np.repeat(long_docs, nwin)
            local = np.arange(int(nwin.sum()), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(nwin)[:-1]]), nwin
            )
            src = woffs[rep] + local
            dst = out_offs[rep] + local
            out[dst] = acc[src]

    # short docs (1..k-1 words): one combined shingle each, vectorized
    # per length class
    for L in range(1, k):
        sel = np.flatnonzero(cnt == L)
        if not len(sel):
            continue
        v = wh[woffs[sel]]
        with np.errstate(over="ignore"):
            for j in range(1, L):
                v = _mix64(v ^ np.uint64(j)) ^ wh[woffs[sel] + j]
        out[out_offs[sel]] = _mix64(v)
    return out, sizes.astype(np.int64)


def md5_column(batch: pa.Table, text_col: str = "text",
               out_col: str = "content_md5") -> pa.Table:
    texts = batch[text_col].to_pylist()
    md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out_col, pa.array(md5s, pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Hash-partition + per-group first (N8): one row per distinct
    content hash with keeper = min(id) and the duplicate count."""
    from ray.data.aggregate import Count, Min

    with_hash = ds.map_batches(
        md5_column, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )
    return with_hash.groupby("content_md5").aggregate(
        Min(id_col, alias_name="keeper_id"), Count(alias_name="n_dups")
    )


# -- MinHash --------------------------------------------------------------

_MERSENNE = (1 << 31) - 1  # products of two 31-bit values fit int64


class MinHasher:
    """Actor-pool stage: per-doc minhash signature over word shingles.

    __init__ draws the permutation coefficients once per actor from a
    fixed seed (identical across actors — required for comparability).
    """

    def __init__(self, num_hashes: int = 128, shingle: int = 3,
                 text_col: str = "text", seed: int = 4242):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
        self.num_hashes = num_hashes
        self.shingle = shingle
        self.text_col = text_col

    _mix64 = staticmethod(_mix64)

    def shingle_hashes(self, text: str) -> np.ndarray:
        """Single-doc view of the batched kernel (kept for tests and
        ``signature``) — see ``_shingles_batch``."""
        flat, _sizes = _shingles_batch(pa.array([text]), self.shingle)
        return flat

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        if len(sh) == 0:
            return np.zeros(self.num_hashes, dtype=np.int64)
        x = (sh % np.uint64(_MERSENNE)).astype(np.int64)
        # (H, S) permutations; 31-bit operands keep products in int64
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    # bound the (num_hashes, total_shingles) chunk to ~50M doubles-worth
    _CHUNK_SHINGLES = 400_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Signatures computed BATCHED across documents: shingle hashes
        for the whole batch from ONE vectorized pass (_shingles_batch),
        then one permuted (H, ΣS) product per chunk with per-doc
        minimum.reduceat — no per-doc Python anywhere."""
        flat_sh, sizes = _shingles_batch(batch[self.text_col], self.shingle)
        ndocs = len(sizes)
        sigs = np.zeros((ndocs, self.num_hashes), dtype=np.int64)
        x_all = (flat_sh % np.uint64(_MERSENNE)).astype(np.int64)
        doc_offs = np.concatenate([[0], np.cumsum(sizes)])
        nz = np.flatnonzero(sizes > 0)
        i = 0
        while i < len(nz):
            # take docs until the chunk shingle budget is filled
            j = i
            tot = 0
            while j < len(nz) and (tot == 0 or
                                   tot + sizes[nz[j]] <= self._CHUNK_SHINGLES):
                tot += int(sizes[nz[j]])
                j += 1
            sel = nz[i:j]
            # zero-size docs between sel entries contribute no elements,
            # so the flat range covering sel is contiguous
            x = x_all[doc_offs[sel[0]] : doc_offs[sel[-1] + 1]]
            vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
            offs = doc_offs[sel] - doc_offs[sel[0]]
            sigs[sel] = np.minimum.reduceat(vals, offs, axis=1).T
            i = j
        return batch.append_column(
            "minhash", pa.array(sigs.tolist(), pa.list_(pa.int64())),
        )


_BAND_COEF_SEED = 777


def minhash_bands_batch(batch: pa.Table, bands: int = 16, rows: int = 8,
                        id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band_id, band_hash, id) rows — the LSH
    bucketing key for the ONE shuffle.

    Band hash = fixed-coefficient polynomial over the band's minhash
    values (one (n, bands, rows) einsum, no per-band Python/md5 loop).
    Equal bands ALWAYS hash equal, so no true candidate is ever lost;
    the ~2^-60 false-collision rate only adds candidates the Jaccard
    verification filters out."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    if n == 0:
        return pa.table({
            "band_id": pa.array([], pa.int64()),
            "band_hash": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
        })
    sigs = vec_mat(batch["minhash"], dtype=np.int64)
    use = sigs[:, : bands * rows].reshape(n, bands, rows)
    rng = np.random.default_rng(_BAND_COEF_SEED)
    # coef < 2^29 and minhash values < 2^31 keep every product < 2^60
    # and the row-sum < 2^63 (no int64 overflow)
    coef = rng.integers(1, 1 << 29, size=rows, dtype=np.int64)
    mix = rng.integers(1, 1 << 61, size=bands, dtype=np.int64)
    h = (np.einsum("nbr,r->nb", use, coef) + mix[None, :]) & ((1 << 62) - 1)
    band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
    return pa.table(
        {
            # int64: must match the groupby-aggregate output's key type
            # (the left-semi join below compares these columns)
            "band_id": pa.array(band_ids, pa.int64()),
            "band_hash": pa.array(h.ravel(), pa.int64()),
            id_col: pa.array(np.repeat(ids, bands), pa.int64()),
        }
    )


def _empty_pairs():
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "n_shared_bands": pa.array([], pa.int64()),
        }
    ))


def _pairs_from_bands_batch(b: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """One funneled bands table → distinct (a_id, b_id, n_shared_bands).

    Vectorized bucket grouping (lexsort + reduceat); only buckets with
    ≥2 members (rare — LSH buckets are overwhelmingly singletons) loop
    in Python, each emitting its within-bucket pairs as array ops."""
    bid = b["band_id"].to_numpy()
    bh = b["band_hash"].to_numpy()
    ids = b[id_col].to_numpy()
    order = np.lexsort((ids, bh, bid))
    bid, bh, ids = bid[order], bh[order], ids[order]
    out_a, out_b = [], []
    if len(bid):
        neq = np.concatenate([[True], (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])])
        starts = np.flatnonzero(neq)
        sizes = np.diff(np.concatenate([starts, [len(bid)]]))
        for s, sz in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            grp = ids[s : s + sz]
            ii, jj = np.triu_indices(sz, k=1)
            out_a.append(grp[ii])
            out_b.append(grp[jj])
    if not out_a:
        return pa.table({
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "n_shared_bands": pa.array([], pa.int64()),
        })
    a = np.concatenate(out_a)
    bb = np.concatenate(out_b)
    a, bb = np.minimum(a, bb), np.maximum(a, bb)
    # distinct + shared-band count, both key columns kept (no packed key)
    order = np.lexsort((bb, a))
    a, bb = a[order], bb[order]
    neq = np.concatenate([[True], (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])])
    starts = np.flatnonzero(neq)
    cnt = np.diff(np.concatenate([starts, [len(a)]]))
    return pa.table({
        "a_id": pa.array(a[starts], pa.int64()),
        "b_id": pa.array(bb[starts], pa.int64()),
        "n_shared_bands": pa.array(cnt.astype(np.int64), pa.int64()),
    })


# bands-table funnel threshold for the single-task pairing plan: 3 int64
# columns → 2M rows ≈ 48 MB on one worker. Above it, the distributed
# self-join plan runs (same output).
SMALL_BANDS_ROWS = 2_000_000


def minhash_lsh_candidates(ds, bands: int = 16, rows: int = 8,
                           num_hashes: int = 128, id_col: str = "doc_id",
                           text_col: str = "text",
                           small_bands_rows: int = SMALL_BANDS_ROWS):
    """documents → candidate near-dup pairs (a_id < b_id, deduped).

    shingle→minhash (vectorized batch kernel) → band explode → bucket
    pairing. Two physical plans for the pairing, chosen by the band
    table's measured size (mirroring the spatial join's broadcast vs
    partitioned dispatch):

    - small (≤ ``small_bands_rows``): funnel the 3-int-column band
      table to ONE task and emit pairs vectorized — no join actors,
      no extra exchange beyond the funnel.
    - large: distributed self-join on (band_id, band_hash) + distinct
      groupby — the 100-TB shape (never all-pairs, no driver state).
    """
    # instance-based hasher → stateless elastic tasks (the coefficient
    # draw is cheap; an actor pool here pinned the fused chain width)
    sigs = ds.map_batches(
        MinHasher(num_hashes=num_hashes, text_col=text_col),
        batch_format="pyarrow",
    )
    # bands table is consumed twice (count + pairing) and is small
    # (3 int columns) → materialize once instead of recomputing the
    # signatures per consumer
    bands_ds = sigs.select_columns([id_col, "minhash"]).map_batches(
        minhash_bands_batch,
        batch_format="pyarrow",
        fn_kwargs={"bands": bands, "rows": rows, "id_col": id_col},
    ).materialize()

    if bands_ds.count() <= small_bands_rows:
        return bands_ds.repartition(1).map_batches(
            _pairs_from_bands_batch, batch_format="pyarrow",
            fn_kwargs={"id_col": id_col},
        )

    # Distributed plan: co-occurring pairs via ONE self-join on the
    # bucket key (a < b drops the singleton self-pairs): round 1's
    # four-exchange plan (count → hot filter → semi-join → per-bucket
    # map_groups) paid ~2 s of all-to-all fixed cost per exchange.
    # Join aggregators are ACTORS (~1 CPU + startup each): K beyond
    # ncpu/2 stalls (memory ray-data-pitfalls-observed) — partitions
    # scale with the CLUSTER at ncpu/4 (no constant cap: a 100-node
    # cluster gets a proportionally wider join).
    import ray
    from ray.data.aggregate import Count

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    np_ = max(2, ncpu // 4)
    bands_a = bands_ds.map_batches(
        lambda b: b.rename_columns(["band_id", "band_hash", "a_id"]),
        batch_format="pyarrow",
    )
    bands_b = bands_ds.map_batches(
        lambda b: b.rename_columns(["band_id", "band_hash", "b_id"]),
        batch_format="pyarrow",
    )
    pairs = bands_a.join(
        bands_b, join_type="inner", on=("band_id", "band_hash"),
        num_partitions=np_,
    ).filter(expr="a_id < b_id").materialize()
    if pairs.count() == 0:
        return _empty_pairs()
    # candidate pairs can repeat across bands → distinct
    return pairs.groupby(["a_id", "b_id"]).aggregate(
        Count(alias_name="n_shared_bands")
    )


# the n-gram family's tokenizer: an EXPLICIT ASCII whitespace class so
# the Python kernel and the DuckDB oracle (string_split_regex, RE2)
# split definitionally identically — str.split() would diverge on \v
# and Unicode whitespace (ADVICE r2). Empty tokens are dropped on both
# sides; an empty/whitespace-only doc has NO grams (so it never pairs,
# matching the inverted-index pipeline and the SQL).
import re as _re

_NGRAM_WS_RE = _re.compile(r"[ \t\n\r\f\v]+")


def ngram_tokens(t: str) -> list:
    return [w for w in _NGRAM_WS_RE.split(t) if w]


def jaccard_ngrams(a: str, b: str, n: int = 3) -> float:
    """Word n-gram Jaccard (the verification kernel). Two gram-less
    docs score 0.0 — "no evidence of similarity", consistent with the
    inverted-index pipeline where gram-less docs can never co-occur."""
    def grams(t):
        w = ngram_tokens(t)
        if len(w) < n:
            return {" ".join(w)} if w else set()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 0.0
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter)


# pair-table threshold for the broadcast verify plan: below it the
# candidate doc ids (≤ 2 × pairs) are broadcast as a filter and the
# matching texts are shipped once via ray.put — the standard semi-join
# pushdown. Above it, the join-back plan runs (same output).
SMALL_VERIFY_PAIRS = 200_000


def verify_pairs_distributed(pairs, docs, id_col: str = "doc_id",
                             text_col: str = "text", n: int = 3,
                             threshold: float = 0.8,
                             small_pairs: int = SMALL_VERIFY_PAIRS):
    """Exact n-gram Jaccard verification with NO whole-corpus broadcast.

    Plan dispatch on the measured candidate-pair count:

    - small (≤ ``small_pairs``): semi-join pushdown — the candidate
      doc-id array is broadcast (ray.put once), docs filter map-side
      by np.isin (no exchange), and only the MATCHED texts (bounded by
      2 × pairs) ship to the pair verifier. Zero join operators.
    - large: candidate pairs hash-join back to the documents table
      twice (on a_id, then b_id) to pick up the two texts. Both joins
      shuffle only the candidate pairs + matched doc rows — at 100 TB
      the pair set is orders of magnitude smaller than the corpus.
    """
    import ray

    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        schema = pairs.schema()
        cols = {name: pa.array([], typ)
                for name, typ in zip(schema.names, schema.types)}
        cols["jaccard"] = pa.array([], pa.float64())
        import ray.data as rd

        return rd.from_arrow(pa.table(cols))

    if n_pairs <= small_pairs:
        # pairs is materialized — read its blocks directly (no extra
        # executor run for a column select)
        idtabs = [ray.get(r) for r in pairs.to_arrow_refs()]
        allids = np.unique(np.concatenate(
            [np.concatenate([t["a_id"].to_numpy(zero_copy_only=False),
                             t["b_id"].to_numpy(zero_copy_only=False)])
             for t in idtabs if len(t)]
        ))
        ids_ref = ray.put(allids)

        def keep_candidates(b: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)  # numpy: plasma-shared, zero-copy
            keys = b[id_col].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(np.isin(keys, want)))

        cand_docs = docs.map_batches(
            keep_candidates, batch_format="pyarrow"
        ).select_columns([id_col, text_col]).take_all()
        texts_ref = ray.put({r[id_col]: r[text_col] for r in cand_docs})
        return pairs.map_batches(
            _verify_with_broadcast_texts,
            fn_kwargs={"texts_ref": texts_ref, "n": n,
                       "threshold": threshold},
            batch_format="pyarrow",
        )

    # cluster-scaled join width under the ncpu/2 aggregator stall guard
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    np_ = max(2, ncpu // 4)

    def rename_for(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.select([id_col, text_col]).rename_columns(
                [f"{side}_id", f"{side}_text"]
            )
        return fn

    docs_a = docs.map_batches(rename_for("a"), batch_format="pyarrow")
    docs_b = docs.map_batches(rename_for("b"), batch_format="pyarrow")
    j = pairs.join(docs_a, join_type="inner", on=("a_id",),
                   num_partitions=np_)
    j = j.join(docs_b, join_type="inner", on=("b_id",),
               num_partitions=np_)

    def verify(batch: pa.Table) -> pa.Table:
        a_txt = batch["a_text"].to_pylist()
        b_txt = batch["b_text"].to_pylist()
        jac = [jaccard_ngrams(a or "", b or "", n)
               for a, b in zip(a_txt, b_txt)]
        out = batch.drop_columns(["a_text", "b_text"])
        out = out.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pa.array([x >= threshold for x in jac]))

    return j.map_batches(verify, batch_format="pyarrow")


# per-worker-process cache of the broadcast id→text lookup (one entry,
# keyed by ref — same amortization pattern as spatial/join._INDEX_CACHE)
_TEXTS_CACHE: dict = {}


def _verify_with_broadcast_texts(batch: pa.Table, texts_ref=None,
                                 n: int = 3,
                                 threshold: float = 0.8) -> pa.Table:
    """Stateless-task form of PairVerifier: resolves the broadcast
    lookup once per worker process (elastic, no pool startup, and the
    dict is NOT pickled into every task like an instance field)."""
    import ray

    key = texts_ref.hex() if hasattr(texts_ref, "hex") else id(texts_ref)
    texts = _TEXTS_CACHE.get(key)
    if texts is None:
        texts = ray.get(texts_ref)
        _TEXTS_CACHE.clear()
        _TEXTS_CACHE[key] = texts
    v = PairVerifier.__new__(PairVerifier)
    v.texts = texts
    v.n = n
    v.threshold = threshold
    return v(batch)


class PairVerifier:
    """Actor-pool stage: exact n-gram Jaccard on candidate pairs.

    Texts for pair members are fetched from a BROADCAST id→text lookup
    (ray.put once). This is the SMALL-lookup kernel (e.g. a sampled
    subset); the corpus-scale path is ``verify_pairs_distributed``,
    which joins pairs back to the documents table instead of shipping
    an id→text dict from the driver."""

    def __init__(self, texts_ref, n: int = 3, threshold: float = 0.8):
        import ray

        self.texts: dict = ray.get(texts_ref)
        self.n = n
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["a_id"].to_pylist()
        b_ids = batch["b_id"].to_pylist()
        jac = [
            jaccard_ngrams(self.texts.get(a, ""), self.texts.get(b, ""), self.n)
            for a, b in zip(a_ids, b_ids)
        ]
        out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
        return out.filter(pa.array([j >= self.threshold for j in jac]))


# -- SimHash ---------------------------------------------------------------

# word -> 64-bit md5 hash memo (bounded): corpora repeat words heavily,
# and md5-per-word was the simhash hotspot
_WORD_HASH_MEMO: dict = {}
_WORD_HASH_MEMO_MAX = 1 << 20


def _word_hash64(w: str) -> int:
    h = _WORD_HASH_MEMO.get(w)
    if h is None:
        h = md5_le64(w.encode("utf-8"))
        if len(_WORD_HASH_MEMO) < _WORD_HASH_MEMO_MAX:
            _WORD_HASH_MEMO[w] = h
    return h


def simhash64(text: str) -> int:
    """64-bit SimHash over word hashes (weighted by occurrence count;
    identical to the per-occurrence formulation). The bit spread is one
    vectorized (U, 64) expression over UNIQUE words, not a per-word
    Python loop."""
    words = text.split()
    if not words:
        return 0
    uniq, counts = np.unique(words, return_counts=True)
    hs = np.asarray([_word_hash64(w) for w in uniq], dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)  # (U, 64)
    signed = np.where(bits == 1, 1, -1) * counts[:, None]
    acc = signed.sum(axis=0)
    return int(np.bitwise_or.reduce(
        (acc > 0).astype(np.uint64) << shifts
    ))


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    hs = np.asarray([simhash64(t) for t in texts], dtype=np.uint64).view(np.int64)
    return batch.append_column("simhash", pa.array(hs, pa.int64()))


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact-simhash buckets (Hamming-0 duplicates): groupby simhash."""
    from ray.data.aggregate import Count, Min

    with_h = ds.map_batches(
        simhash_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )
    return with_h.groupby("simhash").aggregate(
        Min(id_col, alias_name="keeper_id"), Count(alias_name="n_dups")
    )


# -- embedding cosine near-dup --------------------------------------------

def _neardup_leaf_pairs(ids: np.ndarray, vn: np.ndarray,
                        threshold: float, chunk: int = 1024):
    """Exact all-pairs cosine over ONE leaf, matmul CHUNKED to
    O(chunk·b) memory (a leaf of identical vectors has inherently
    O(b²) OUTPUT, but the sim matrix never materializes whole).
    → (a_idx, b_idx, cos) index arrays into ids."""
    outs_a, outs_b, outs_c = [], [], []
    n = len(ids)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        sim = vn[s:e] @ vn.T  # (chunk, n)
        # upper triangle only: global col index > global row index
        ai, bi = np.where(sim >= threshold)
        keep = bi > (ai + s)
        ai, bi = ai[keep] + s, bi[keep]
        outs_a.append(ai)
        outs_b.append(bi)
        outs_c.append(sim[ai - s, bi])
    return (np.concatenate(outs_a) if outs_a else np.empty(0, np.int64),
            np.concatenate(outs_b) if outs_b else np.empty(0, np.int64),
            np.concatenate(outs_c) if outs_c else np.empty(0, np.float64))


def split_oversized_bucket(vn: np.ndarray, cap: int, seed: int,
                           max_depth: int = 40):
    """Recursively split a hot LSH bucket until every leaf is ≤ cap
    rows (the spatial/skew.py split-hot-cells move done locally — the
    group already sits on one worker, so no extra shuffle). Each level
    projects onto a fresh random direction and splits at the MEDIAN
    projection (`> med` vs `<= med`), so the strict side is always
    ≤ n/2 — a sign-at-zero split can be arbitrarily lopsided and
    stalls at a depth cap (measured: 125-row leaves at cap 64).
    Equal projections stay together, so an exact-duplicate clique is
    NEVER torn apart; a leaf that is all ties (identical vectors)
    cannot split and is returned oversized — the caller handles it
    with the chunked-matmul kernel. → list of index arrays into vn."""
    leaves, work = [], [(np.arange(len(vn)), 0)]
    while work:
        idx, depth = work.pop()
        if len(idx) <= cap or depth >= max_depth:
            leaves.append(idx)
            continue
        r = np.random.default_rng((seed, depth, len(idx)))
        plane = r.standard_normal(vn.shape[1])
        proj = vn[idx] @ plane
        med = np.median(proj)
        side = proj > med
        left, right = idx[~side], idx[side]
        if not len(left) or not len(right):  # all-ties mass
            leaves.append(idx)
            continue
        work.append((left, depth + 1))
        work.append((right, depth + 1))
    return leaves


def embedding_neardup_pairs(ds, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95, planes: int = 12,
                            seed: int = 99, bucket_cap: int = 512):
    """Near-dup pairs by cosine ≥ threshold: random-hyperplane sign
    bucket (LSH) → within-bucket exact cosine. One shuffle on the
    bucket key.

    Hot buckets (near-duplicate-heavy corpora produce exactly these)
    are NOT processed O(b²): a group wider than ``bucket_cap`` is
    recursively re-split on fresh random directions at the median
    projection down to ≤ cap leaves (split_oversized_bucket), pairs
    are emitted per leaf, and one VERIFIED pair set over the leaf
    representatives (first row of each leaf, all-pairs over ≤ b/cap
    reps) stitches leaves back together — so a TIGHT (clique-like)
    near-dup mega-cluster diced across leaves still comes out
    connected for downstream clustering, every emitted pair genuinely
    has cos ≥ threshold, and per-bucket work is O(b·cap + (b/cap)²)
    instead of O(b²). Two recall trades: only a subset of a
    mega-clique's pairs is emitted (connectivity-preserving for
    clique-like clusters, not pair-complete), and a CHAIN-shaped
    cluster whose leaf representatives are mutually below threshold
    can come out disconnected — reps are compared only pairwise at the
    same threshold, so stitching certifies clique-like connectivity
    only (the approximate rows-only contract). Leaves that
    cannot split (identical vectors) use the chunked matmul kernel so
    memory stays O(cap·b) even when the OUTPUT is inherently O(b²)."""
    planes_mat = None  # built lazily once dims are known

    def bucketize(batch: pa.Table) -> pa.Table:
        nonlocal planes_mat
        vecs = vec_mat(batch[vec_col])
        if planes_mat is None:
            r = np.random.default_rng(seed)
            planes_mat = r.standard_normal((vecs.shape[1], planes))
        signs = (vecs @ planes_mat) > 0
        bucket = signs @ (1 << np.arange(planes))
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: batch[vec_col],
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    empty = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                       ("cosine", pa.float64())])

    def within_bucket(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        vecs = vec_mat(g[vec_col])
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        vn = vecs / norm
        if len(ids) <= bucket_cap:
            leaves = [np.arange(len(ids))]
        else:
            leaves = split_oversized_bucket(vn, bucket_cap, seed)
        cols_a, cols_b, cols_c = [], [], []
        for leaf in leaves:
            ai, bi, cs = _neardup_leaf_pairs(ids[leaf], vn[leaf], threshold)
            cols_a.append(ids[leaf][ai])
            cols_b.append(ids[leaf][bi])
            cols_c.append(cs)
        if len(leaves) > 1:
            # stitch: verified all-pairs over one representative per
            # leaf (pairs span leaves, so they can't duplicate a
            # within-leaf pair)
            reps = np.array([leaf[0] for leaf in leaves])
            ai, bi, cs = _neardup_leaf_pairs(ids[reps], vn[reps], threshold)
            cols_a.append(ids[reps][ai])
            cols_b.append(ids[reps][bi])
            cols_c.append(cs)
        if not cols_a:
            return empty.empty_table()
        return pa.table({
            "a_id": pa.array(np.concatenate(cols_a), pa.int64()),
            "b_id": pa.array(np.concatenate(cols_b), pa.int64()),
            "cosine": pa.array(
                np.round(np.concatenate(cols_c), 6), pa.float64()),
        })

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(within_bucket, batch_format="pyarrow")
    )


# -- span-level exact dedup (6th family member) ---------------------------
#
# C4-style span dedup adapted to this corpus's structure: the synthetic
# documents carry no sentence/paragraph boundaries, so the dedup unit
# is a fixed-width window of W consecutive words (non-overlapping;
# the trailing partial window is its own span). Keep-first semantics:
# the global winner of a span content is the occurrence with the
# smallest (doc_id, span_idx); every other occurrence (including
# repeats WITHIN the winning doc) is a duplicate.

_SPAN_W_DEFAULT = 15
_SPAN_IDX_BITS = 20  # packed = doc_id << 20 | span_idx; max ~1M spans/doc

# per-position salts so span identity is order-sensitive (a span is a
# SEQUENCE, not a bag); sized for any W <= 256
_SPAN_POS_SALT = _mix64(
    (np.arange(1, 257, dtype=np.uint64))
    * np.uint64(0x9E3779B97F4A7C15)
)


def _span_rows_batch(batch: pa.Table, span_w: int = _SPAN_W_DEFAULT,
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     distinct: bool = True) -> pa.Table:
    """→ one row per (doc, distinct span content): span_hash (int64
    view of a 64-bit content hash), packed = doc_id*2^20 + first
    span_idx, cnt = occurrences within the doc, doc_id.
    With ``distinct=False``, one row per span OCCURRENCE instead
    (cnt ≡ 1; packed = the occurrence's own index) — the span_scrub
    reconstruction needs every occurrence's keep/drop verdict.

    Fully vectorized: definitional ASCII-class tokenizer (trim + RE2
    split — identical to the SQL's string_split_regex), flat word-hash
    array, position-salted mix + add.reduceat per span window, one
    lexsort for the per-doc distinct combine. Empty/whitespace-only
    docs emit no spans (mirrors the SQL's len(ws) >= 1 guard)."""
    texts = pc.cast(batch[text_col], pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    texts = pc.utf8_trim(texts, " \t\n\r\f\v")
    words = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    woffs = np.asarray(words.offsets).astype(np.int64)
    flat = words.values
    wh, wlen = _hash_string_array(flat)
    cnt = np.diff(woffs)
    # a trimmed-empty text splits to one '' token -> zero words
    if len(flat):
        empty_tok = wlen == 0
        first_tok = np.minimum(woffs[:-1], len(flat) - 1)
        cnt = np.where((cnt == 1) & empty_tok[first_tok], 0, cnt)

    empty = pa.table({
        "span_hash": pa.array([], pa.int64()),
        "packed": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
    })
    docs = np.flatnonzero(cnt > 0)
    if not len(docs):
        return empty
    dense_cnt = cnt[docs]
    nsp_d = (dense_cnt + span_w - 1) // span_w
    nw = int(dense_cnt.sum())

    di = np.repeat(np.arange(len(docs)), dense_cnt)
    wstarts = np.concatenate([[0], np.cumsum(dense_cnt)[:-1]])
    pos = np.arange(nw, dtype=np.int64) - np.repeat(wstarts, dense_cnt)
    src = woffs[docs][di] + pos
    span_pos = pos % span_w
    span_local = pos // span_w
    soff = np.concatenate([[0], np.cumsum(nsp_d)[:-1]])
    gspan = soff[di] + span_local

    with np.errstate(over="ignore"):
        contrib = _mix64(wh[src] ^ _SPAN_POS_SALT[span_pos])
        sstart = np.flatnonzero(
            np.concatenate([[True], gspan[1:] != gspan[:-1]]))
        ssum = np.add.reduceat(contrib, sstart)
        slen = np.diff(np.concatenate([sstart, [nw]]))
        span_hash = _mix64(ssum + slen.astype(np.uint64))

    total_spans = int(nsp_d.sum())
    span_doc = np.repeat(np.arange(len(docs)), nsp_d)
    span_idx = np.arange(total_spans, dtype=np.int64) - np.repeat(
        soff, nsp_d)
    ids = pc.cast(batch[id_col], pa.int64()).to_numpy()
    doc_ids = ids[docs][span_doc]
    packed = (doc_ids << _SPAN_IDX_BITS) + span_idx

    if not distinct:
        return pa.table({
            "span_hash": pa.array(span_hash.view(np.int64), pa.int64()),
            "packed": pa.array(packed, pa.int64()),
            "cnt": pa.array(np.ones(len(packed), np.int64), pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        })

    # per-(doc, span content) combine: sorted by (doc, hash, idx) so
    # the first row of each run carries the doc's earliest occurrence
    h = span_hash.view(np.int64)
    order = np.lexsort((span_idx, h, span_doc))
    d_, h_, p_ = span_doc[order], h[order], packed[order]
    first = np.concatenate(
        [[True], (d_[1:] != d_[:-1]) | (h_[1:] != h_[:-1])])
    fidx = np.flatnonzero(first)
    runcnt = np.diff(np.concatenate([fidx, [len(d_)]]))
    return pa.table({
        "span_hash": pa.array(h_[fidx], pa.int64()),
        "packed": pa.array(p_[fidx], pa.int64()),
        "cnt": pa.array(runcnt, pa.int64()),
        "doc_id": pa.array(doc_ids[order][fidx], pa.int64()),
    })


def _span_stats_table(hashes, packed, cnt, doc_ids) -> pa.Table:
    """Resolve winners + fold to per-doc stats, all in numpy (the
    funnel combine AND the per-partition kernel of the large plan)."""
    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_spans", pa.int64()),
        ("dup_spans", pa.int64()), ("kept_spans", pa.int64()),
    ])
    if not len(hashes):
        return out_schema.empty_table()
    order = np.lexsort((packed, hashes))
    hs, ps = hashes[order], packed[order]
    runfirst = np.concatenate([[True], hs[1:] != hs[:-1]])
    wp = ps[np.flatnonzero(runfirst)][
        np.cumsum(runfirst) - 1]  # winner packed broadcast per row
    kept = (ps == wp).astype(np.int64)
    cs = cnt[order]
    ds_ = doc_ids[order]
    dup = cs - kept
    dorder = np.argsort(ds_, kind="stable")
    dd, dn, ddup = ds_[dorder], cs[dorder], dup[dorder]
    dfirst = np.flatnonzero(
        np.concatenate([[True], dd[1:] != dd[:-1]]))
    n_spans = np.add.reduceat(dn, dfirst)
    dup_spans = np.add.reduceat(ddup, dfirst)
    keep = dup_spans > 0
    return pa.table({
        "doc_id": pa.array(dd[dfirst][keep], pa.int64()),
        "n_spans": pa.array(n_spans[keep], pa.int64()),
        "dup_spans": pa.array(dup_spans[keep], pa.int64()),
        "kept_spans": pa.array((n_spans - dup_spans)[keep], pa.int64()),
    })


def span_dedup_stats(ds, span_w: int = _SPAN_W_DEFAULT,
                     id_col: str = "doc_id", text_col: str = "text",
                     small_rows: int = 2_000_000):
    """Per-doc span-dedup accounting: (doc_id, n_spans, dup_spans,
    kept_spans) for every doc that loses at least one span to global
    keep-first dedup. Two physical plans (the LSH dispatch pattern):

    - small (span table <= ``small_rows``): funnel the 4-int-column
      span table to ONE task and resolve winners with a lexsort —
      one exchange total.
    - large: groupby(span_hash).Min(packed) (hash-partition winner
      resolution) -> hash-join winners back to the span rows ->
      per-doc partial sums -> groupby(doc_id) Sum. Three
      key-partitioned exchanges, no broadcast, no driver state —
      the 100-TB shape. (A map_groups fusion of steps 1-2 measures
      SLOWER on Ray 2.49: sort-backed map_groups pays per input
      block; the aggregate+join plan is the faster physical plan.)

    Both plans are pinned equal in tests (threshold override)."""
    import ray
    from ray.data.aggregate import Min, Sum

    from ..util import drop_empty_blocks

    spans = ds.map_batches(
        _span_rows_batch, batch_format="pyarrow",
        fn_kwargs={"span_w": span_w, "id_col": id_col,
                   "text_col": text_col},
    ).materialize()

    if spans.count() <= small_rows:
        def combine(b: pa.Table) -> pa.Table:
            return _span_stats_table(
                b["span_hash"].to_numpy(), b["packed"].to_numpy(),
                b["cnt"].to_numpy(), b["doc_id"].to_numpy())

        return spans.repartition(1).map_batches(
            combine, batch_format="pyarrow")

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    np_ = max(2, ncpu // 4)
    winners = spans.groupby("span_hash").aggregate(
        Min("packed", alias_name="wp"))
    j = drop_empty_blocks(spans.join(
        winners, join_type="inner", on=("span_hash",),
        num_partitions=np_))

    def partial(b: pa.Table) -> pa.Table:
        kept = (b["packed"].to_numpy() == b["wp"].to_numpy()).astype(
            np.int64)
        cs = b["cnt"].to_numpy()
        d = b["doc_id"].to_numpy()
        order = np.argsort(d, kind="stable")
        dd = d[order]
        dfirst = np.flatnonzero(
            np.concatenate([[True], dd[1:] != dd[:-1]]))
        return pa.table({
            "doc_id": pa.array(dd[dfirst], pa.int64()),
            "ns": pa.array(
                np.add.reduceat(cs[order], dfirst), pa.int64()),
            "dup": pa.array(
                np.add.reduceat((cs - kept)[order], dfirst), pa.int64()),
        })

    per_doc = j.map_batches(partial, batch_format="pyarrow").groupby(
        "doc_id").aggregate(Sum("ns", alias_name="n_spans"),
                            Sum("dup", alias_name="dup_spans"))

    def final(b: pa.Table) -> pa.Table:
        ns = b["n_spans"].to_numpy()
        dup = b["dup_spans"].to_numpy()
        keep = dup > 0
        return pa.table({
            "doc_id": pa.array(b["doc_id"].to_numpy()[keep], pa.int64()),
            "n_spans": pa.array(ns[keep].astype(np.int64), pa.int64()),
            "dup_spans": pa.array(dup[keep].astype(np.int64), pa.int64()),
            "kept_spans": pa.array(
                (ns - dup)[keep].astype(np.int64), pa.int64()),
        })

    return per_doc.map_batches(final, batch_format="pyarrow")


def span_scrub(ds, span_w: int = _SPAN_W_DEFAULT,
               id_col: str = "doc_id", text_col: str = "text",
               small_rows: int = 2_000_000):
    """C4-style span-dedup TRANSFORM (not just the accounting of
    span_dedup_stats): rebuild every document keeping only the span
    occurrences that WIN global keep-first dedup (winner = smallest
    (doc_id, span_idx) per span content; repeats within one doc keep
    only their first occurrence). → (doc_id, clean_text), words joined
    by single spaces — the definitional ASCII tokenizer normalizes
    whitespace, mirrored exactly by the SQL oracle's
    array_to_string/string_agg chain. A doc whose every span loses
    emits NOTHING (inner-join semantics, like the oracle's GROUP BY
    over kept rows).

    Two physical plans (the span_dedup_stats dispatch):

    - small (occurrence table ≤ ``small_rows``): pull ONLY the
      (span_hash, packed) columns to the driver — bounded by
      construction at ≤ 2M×16 B = 32 MB (the dedup.py small-pairs
      precedent) — resolve winners with one lexsort, ``ray.put`` the
      sorted surviving packed ids ONCE, and let the documents stream
      past a searchsorted membership probe. One broadcast, zero
      shuffles, no join.
    - large: Min-groupby winner resolution + hash join (exactly the
      stats plan), survivors collected per doc via pyarrow map_groups,
      one doc_id join back to the text — three key exchanges, no
      driver state, no broadcast.
    """
    import ray
    from ray.data.aggregate import Min

    from ..util import drop_empty_blocks

    spans = ds.map_batches(
        _span_rows_batch, batch_format="pyarrow",
        fn_kwargs={"span_w": span_w, "id_col": id_col,
                   "text_col": text_col, "distinct": False},
    ).materialize()

    def rebuild_with(batch: pa.Table, kept_packed_sorted) -> pa.Table:
        """Rebuild rows of ``batch`` against a SORTED array of
        surviving packed ids (string assembly is inherently per-doc;
        everything before the join is vectorized)."""
        texts = pc.cast(batch[text_col], pa.string())
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        texts = pc.utf8_trim(texts, " \t\n\r\f\v")
        words = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
        wl = words.to_pylist()
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy()
        out_ids, out_texts = [], []
        for i, ws in enumerate(wl):
            if not ws or ws == [""]:
                continue
            nspans = (len(ws) + span_w - 1) // span_w
            packed = (int(ids[i]) << _SPAN_IDX_BITS) + np.arange(
                nspans, dtype=np.int64)
            pos = np.searchsorted(kept_packed_sorted, packed)
            pos = np.minimum(pos, len(kept_packed_sorted) - 1)
            kept = (kept_packed_sorted[pos] == packed) \
                if len(kept_packed_sorted) else np.zeros(nspans, bool)
            if not kept.any():
                continue
            parts = [
                " ".join(ws[s * span_w:(s + 1) * span_w])
                for s in np.flatnonzero(kept)
            ]
            out_ids.append(int(ids[i]))
            out_texts.append(" ".join(parts))
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            "clean_text": pa.array(out_texts, pa.string()),
        })

    n_spans = spans.count()
    if n_spans <= small_rows:
        if n_spans == 0:
            # empty / all-whitespace corpus (ADVICE r4): zero spans →
            # zero survivors. Guarded BEFORE select_columns — a
            # zero-row map_batches output has no (span_hash, packed)
            # schema to select, and the lexsort winner device below
            # hardcodes runfirst=[True] so ps[...] would IndexError.
            # rebuild_with handles the empty winner set and emits the
            # empty (doc_id, clean_text) table.
            surv_ref = ray.put(np.empty(0, np.int64))
        else:
            cols = pa.concat_tables([
                ray.get(r) for r in spans.select_columns(
                    ["span_hash", "packed"]).to_arrow_refs()
            ])
            h = cols["span_hash"].to_numpy(zero_copy_only=False)
            p = cols["packed"].to_numpy(zero_copy_only=False)
            order = np.lexsort((p, h))
            hs, ps = h[order], p[order]
            runfirst = np.concatenate([[True], hs[1:] != hs[:-1]])
            wp = ps[np.flatnonzero(runfirst)][np.cumsum(runfirst) - 1]
            surv_ref = ray.put(np.sort(ps[ps == wp]))

        def rebuild_bcast(batch: pa.Table) -> pa.Table:
            return rebuild_with(batch, ray.get(surv_ref))

        return ds.map_batches(rebuild_bcast, batch_format="pyarrow")

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    winners = spans.groupby("span_hash").aggregate(
        Min("packed", alias_name="wp"))
    j = drop_empty_blocks(spans.join(
        winners, join_type="inner", on=("span_hash",),
        num_partitions=max(2, ncpu // 4)))

    def survivors(b: pa.Table) -> pa.Table:
        keep = b["packed"].to_numpy() == b["wp"].to_numpy()
        return pa.table({
            id_col: b[id_col].filter(pa.array(keep)),
            "packed": b["packed"].filter(pa.array(keep)),
        })

    def collect(g: pa.Table) -> pa.Table:
        # Ray's hash join rejects list<> non-key columns — carry the
        # sorted kept ids as a binary blob instead
        p = np.sort(g["packed"].to_numpy(zero_copy_only=False))
        return pa.table({
            id_col: g[id_col][:1],
            "kept_packed": pa.array([p.tobytes()], pa.binary()),
        })

    kept_lists = j.map_batches(survivors, batch_format="pyarrow") \
        .groupby(id_col).map_groups(collect, batch_format="pyarrow")
    docs = ds.map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow")
    joined = drop_empty_blocks(kept_lists.join(
        docs, join_type="inner", on=(id_col,),
        num_partitions=max(2, ncpu // 4)))

    def rebuild_joined(batch: pa.Table) -> pa.Table:
        out = []
        for row in range(len(batch)):
            sub = batch.slice(row, 1)
            kp = np.frombuffer(sub["kept_packed"][0].as_py(),
                               dtype=np.int64)
            out.append(rebuild_with(sub, kp))
        return pa.concat_tables(out) if out else pa.table({
            id_col: pa.array([], pa.int64()),
            "clean_text": pa.array([], pa.string()),
        })

    return joined.map_batches(rebuild_joined, batch_format="pyarrow")


# -- SemDeDup (semantic dedup over embeddings) ------------------------------

def semdedup(ds, k: int = 16, tau: float = 0.9,
             vec_col: str = "embedding", id_col: str = "vec_id",
             kmeans_iters: int = 3, seed_mode: str = "scan"):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means-cluster the
    embedding space, then within each cluster GREEDILY drop every
    point whose cosine to an already-kept point is ≥ tau, scanning in
    ascending id order (deterministic keep-first — the paper's
    keep-one-per-duplicate-set with a fixed tie-break).

    The semantic member of the dedup family: exact (byte hash) →
    MinHash/ngram (lexical overlap) → SimHash (lexical signature) →
    embedding-LSH (vector proximity, CC semantics) → SemDeDup (vector
    proximity, learned-partition bucketing + greedy semantics).

    Physical plan: kmeans_fit streams the corpus (centroids broadcast
    per iteration, k·d partials); assignment is one matmul pass; the
    greedy scan is ONE key shuffle on the cluster id, per-cluster
    O(b²) sim matrix in float64. ``seed_mode="head"`` (VERDICT r4 #4)
    drops the dedicated global-min-id seed SCAN — a full pass +
    barrier — in favor of kmeans_fit's first-k-rows path (a single
    head-block read): valid when the caller's input is MATERIALIZED
    (stable block order ⇒ deterministic seed) and the caller carries
    its own quality check, which q_semdedup does (planted-drop
    recall ≥ 0.8). Default stays the order-independent "scan". Cluster width is the skew knob: a
    pathological mega-cluster would recurse via
    ``split_oversized_bucket`` exactly like the LSH path — not wired
    here because kmeans with adequate k IS the width bound by design
    (the paper's setting).

    → Dataset(vec_id, cluster, kept, max_sim_kept): max_sim_kept is
    the max cosine to any earlier KEPT point in the cluster —
    definitionally < tau for kept rows, ≥ tau for dropped (the
    invariant the query re-asserts per batch)."""
    import ray

    from .kmeans import _dists_sq, kmeans_fit

    centroids, _ = kmeans_fit(
        ds, vec_col=vec_col, k=k, iters=kmeans_iters,
        id_col=None if seed_mode == "head" else id_col)
    cref = ray.put(centroids)

    def assign(b: pa.Table, _c=cref) -> pa.Table:
        from ..util import cached_get

        c = cached_get(_c)
        v = vec_mat(b[vec_col])
        cl = (np.argmin(_dists_sq(v, c), axis=1) if len(v)
              else np.empty(0, np.int64))
        return pa.table({
            "vec_id": pc.cast(b[id_col], pa.int64()),
            "cluster": pa.array(cl.astype(np.int64), pa.int64()),
            vec_col: b[vec_col],
        })

    def greedy(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        v = vec_mat(g[vec_col])[order]
        n = np.linalg.norm(v, axis=1)
        vn = v / np.maximum(n, 1e-12)[:, None]
        sim = vn @ vn.T
        b = len(ids)
        kept = np.zeros(b, dtype=bool)
        max_sim = np.zeros(b, dtype=np.float64)
        for i in range(b):
            prior = sim[i, :i][kept[:i]]
            m = prior.max() if len(prior) else 0.0
            max_sim[i] = m
            kept[i] = m < tau
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(
                np.full(b, g["cluster"][0].as_py(), np.int64), pa.int64()),
            "kept": pa.array(kept),
            "max_sim_kept": pa.array(max_sim, pa.float64()),
        })

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return assigned.groupby("cluster").map_groups(
        greedy, batch_format="pyarrow")
