"""Corpus-curation stages for training-data pipelines: benchmark
decontamination (Lee et al.-style n-gram overlap against an eval set),
PII redaction (vectorized RE2 kernels — the same regex engine DuckDB
uses, so oracle parity is definitional), and Gopher-style repetition
statistics (duplicate-word / top-2-gram fractions).

Scale notes (100 TB framing):
- Decontamination broadcasts the EVAL gram set, not the corpus: a
  benchmark suite is MBs by construction (the thing you decontaminate
  against is a fixed eval set, not another corpus slice), so
  ``ray.put`` once + ``np.isin`` per batch is the standard plan. If
  the eval side ever grows corpus-sized, flip to the inverted-index
  join plan (queries.q_ngram_jaccard_pairs shape) — same gram kernel.
- PII redaction is a stateless vectorized map (Arrow RE2 kernels run
  in C++ over the whole column); no actor state needed, no shuffle.
- Repetition stats are one pass, no shuffle: per-doc token/2-gram
  multiplicities from lexsort + reduceat over flat hash arrays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _hash_string_array, _shingles_batch

# PII patterns shared by the engine (Arrow/RE2) and the DuckDB oracle
# (also RE2). ASCII classes only — \b is RE2's ASCII word boundary in
# both. Keep these in sync with queries.SQL_PII_REDACTION.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"


def distinct_doc_grams(batch: pa.Table, k: int,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> tuple[np.ndarray, np.ndarray]:
    """→ (doc row index int64, distinct gram hash int64) for a batch:
    the MinHash shingle kernel (one vectorized pass) followed by one
    lexsort-unique for per-doc distinctness. Same per-doc semantics as
    the SQL gl CTE: >=k words → windows, 1..k-1 words → one combined
    gram, empty → none."""
    texts = pc.cast(batch[text_col], pa.string())
    flat, sizes = _shingles_batch(texts, k)
    didx = np.repeat(np.arange(len(batch)), sizes)
    g = flat.view(np.int64)
    if len(didx):
        order = np.lexsort((g, didx))
        d, h = didx[order], g[order]
        keep = np.concatenate([[True], (d[1:] != d[:-1]) | (h[1:] != h[:-1])])
        return d[keep], h[keep]
    return np.empty(0, np.int64), np.empty(0, np.int64)


def eval_gram_batches(ds, k: int, modulus: int,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Distinct gram hashes of the eval slice (doc_id % modulus == 0)
    as a Dataset of one-column batches (per-batch np.unique bounds the
    driver transfer when the caller collects)."""
    def fn(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        sub = b.filter(pa.array(ids % modulus == 0))
        _, h = distinct_doc_grams(sub, k, id_col, text_col)
        return pa.table({"gram": pa.array(np.unique(h), pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def contamination_counts(ds, eval_grams_ref, k: int, modulus: int,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Per TRAIN doc (doc_id % modulus != 0): count of distinct k-grams
    shared with the broadcast eval gram set; only contaminated docs
    (count > 0) are emitted. One streaming pass, no shuffle."""
    import ray

    def fn(b: pa.Table) -> pa.Table:
        ev = ray.get(eval_grams_ref)  # per-process cache via Ray's
        # in-process object store (ray.get of a put ref is zero-copy
        # for numpy); nothing re-ships per batch
        ids = b[id_col].to_numpy()
        sub = b.filter(pa.array(ids % modulus != 0))
        d, h = distinct_doc_grams(sub, k, id_col, text_col)
        hit = np.isin(h, ev)
        if len(d):
            starts = np.flatnonzero(
                np.concatenate([[True], d[1:] != d[:-1]]))
            cnt = np.add.reduceat(
                np.concatenate([hit.astype(np.int64), [0]]), starts)[
                : len(starts)]
            docs = d[starts]
        else:
            cnt = np.empty(0, np.int64)
            docs = np.empty(0, np.int64)
        keep = cnt > 0
        sub_ids = sub[id_col].to_numpy()
        return pa.table({
            "doc_id": pa.array(sub_ids[docs[keep]], pa.int64()),
            "n_shared": pa.array(cnt[keep], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def plant_pii(batch: pa.Table, id_col: str = "doc_id",
              text_col: str = "text") -> pa.ChunkedArray:
    """Deterministic PII augmentation (the synthetic corpus carries no
    real PII): doc_id % 7 == 0 gets an email appended, % 11 == 0 a
    phone; % 77 == 0 gets both. Mirrored verbatim by the oracle's aug
    CTE — the derivation is part of the query definition on BOTH
    sides, so redaction correctness is what's actually compared."""
    ids = batch[id_col]
    text = pc.cast(batch[text_col], pa.string())
    ids_str = pc.cast(ids, pa.string())
    n = len(batch)
    # " contact user<id>@example.com now" / " call 555-<dddd> soon"
    email_sfx = pc.binary_join_element_wise(
        pa.array([" contact user"] * n), ids_str,
        pa.array(["@example.com now"] * n), "")
    pd4 = pc.ascii_lpad(
        pa.array((ids.to_numpy() % 10000).astype(str)), 4, "0")
    phone_sfx = pc.binary_join_element_wise(
        pa.array([" call 555-"] * n), pd4,
        pa.array([" soon"] * n), "")
    ids_np = ids.to_numpy()
    em = pa.array(ids_np % 7 == 0)
    ph = pa.array(ids_np % 11 == 0)
    return pc.binary_join_element_wise(
        text,
        pc.if_else(em, email_sfx, ""),
        pc.if_else(ph, phone_sfx, ""),
        "")


def redact_pii(batch: pa.Table, id_col: str = "doc_id",
               text_col: str = "text", lang_col: str = "lang") -> pa.Table:
    """Vectorized PII redaction over the planted column: RE2 count +
    replace kernels (C++, whole-column), output only docs that had PII.
    Columns: doc_id, lang, n_email, n_phone, red_len (length of the
    fully redacted text)."""
    aug = plant_pii(batch, id_col, text_col)
    n_email = pc.count_substring_regex(aug, EMAIL_RE)
    red = pc.replace_substring_regex(aug, EMAIL_RE, "<EMAIL>")
    n_phone = pc.count_substring_regex(red, PHONE_RE)
    red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
    total = pc.add(n_email, n_phone)
    keep = pc.greater(total, 0)
    t = pa.table({
        "doc_id": pc.cast(batch[id_col], pa.int64()),
        "lang": pc.cast(batch[lang_col], pa.string()),
        "n_email": pc.cast(n_email, pa.int64()),
        "n_phone": pc.cast(n_phone, pa.int64()),
        "red_len": pc.cast(pc.utf8_length(red), pa.int64()),
    })
    return t.filter(keep)


def repetition_stats(batch: pa.Table, id_col: str = "doc_id",
                     text_col: str = "text",
                     dup_threshold: float = 0.3,
                     top2_threshold: float = 0.2) -> pa.Table:
    """Gopher-style per-doc repetition metrics, one vectorized pass:
    n_tokens, n_distinct (distinct words), dup_word_frac =
    round(1 - n_distinct/n_tokens, 6), max_2gram (highest 2-gram
    multiplicity), top2_frac = round(2*max_2gram/n_tokens, 6), and
    flagged = dup_word_frac >= dup_threshold OR top2_frac >=
    top2_threshold (thresholds compared on the ROUNDED values so the
    oracle's comparison is bit-identical). Docs with zero tokens are
    dropped (no meaningful fractions). Word/2-gram identity is by
    64-bit hash — same w.h.p. collision budget as the dedup family."""
    texts = pc.cast(batch[text_col], pa.string()).combine_chunks()
    texts = pc.fill_null(texts, "")
    # definitional ASCII-class tokenizer (identical to the oracle's
    # string_split_regex class and to ascii_token_counts/_span_rows_batch)
    # — NOT utf8_split_whitespace, whose Unicode class would diverge on
    # non-ASCII whitespace
    texts = pc.utf8_trim(texts, " \t\n\r\f\v")
    words = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    woffs = np.asarray(words.offsets).astype(np.int64)
    flat = words.values
    wh, wlen = _hash_string_array(flat)
    cnt = np.diff(woffs)
    if len(flat):
        empty_tok = wlen == 0
        first_tok = np.minimum(woffs[:-1], len(flat) - 1)
        cnt = np.where((cnt == 1) & empty_tok[first_tok], 0, cnt)

    n = len(batch)
    didx = np.repeat(np.arange(n), cnt)
    h = _gather_words(wh, woffs, cnt).view(np.int64)

    # distinct words per doc
    n_distinct = np.zeros(n, dtype=np.int64)
    if len(didx):
        order = np.lexsort((h, didx))
        d, hh = didx[order], h[order]
        uniq = np.concatenate([[True], (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])])
        np.add.at(n_distinct, d[uniq], 1)

    # 2-gram max multiplicity per doc (shingle kernel, k=2, NOT
    # distinct; ASCII tokenizer for definitional oracle parity)
    g2, sizes2 = _shingles_batch(texts, 2, tokenizer="ascii")
    d2 = np.repeat(np.arange(n), sizes2)
    max2 = np.zeros(n, dtype=np.int64)
    if len(d2):
        g2v = g2.view(np.int64)
        order = np.lexsort((g2v, d2))
        dd, gg = d2[order], g2v[order]
        run_start = np.concatenate(
            [[True], (dd[1:] != dd[:-1]) | (gg[1:] != gg[:-1])])
        starts = np.flatnonzero(run_start)
        runlen = np.diff(np.concatenate([starts, [len(dd)]]))
        rd = dd[starts]
        np.maximum.at(max2, rd, runlen)

    tokens = cnt.astype(np.int64)
    keep = tokens > 0
    tk = tokens[keep].astype(np.float64)
    dup = np.round(1.0 - n_distinct[keep] / tk, 6)
    top2 = np.round(2.0 * max2[keep] / tk, 6)
    flagged = (dup >= dup_threshold) | (top2 >= top2_threshold)
    ids = pc.cast(batch[id_col], pa.int64()).to_numpy()
    return pa.table({
        "doc_id": pa.array(ids[keep], pa.int64()),
        "n_tokens": pa.array(tokens[keep], pa.int64()),
        "n_distinct": pa.array(n_distinct[keep], pa.int64()),
        "dup_word_frac": pa.array(dup, pa.float64()),
        "max_2gram": pa.array(max2[keep], pa.int64()),
        "top2_frac": pa.array(top2, pa.float64()),
        "flagged": pa.array(flagged),
    })


def _gather_words(wh: np.ndarray, woffs: np.ndarray,
                  cnt: np.ndarray) -> np.ndarray:
    """Flat word hashes restricted to the first cnt[i] slots of each
    doc's word range (cnt may be zeroed for empty-token docs)."""
    total = int(cnt.sum())
    if not total:
        return np.empty(0, np.uint64)
    rep = np.repeat(np.arange(len(cnt)), cnt)
    local = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
    return wh[woffs[rep] + local]


# URL planting + domain extraction (webtext URL/domain ops). The
# synthetic corpus carries no URLs, so — like the PII stage — URLs are
# deterministically planted from doc_id and the planting derivation is
# mirrored verbatim in the oracle's aug CTE; what is actually compared
# is the extraction + per-domain aggregation. One URL per scheme per
# doc by construction, which is what lets the extraction stay on the
# vectorized single-match RE2 kernel (pc.extract_regex); a general
# multi-URL corpus would switch to count_substring_regex +
# split-based explode with the same downstream aggregation.
HTTPS_DOMAIN_RE = r"https://(?P<h>[a-z0-9.-]+)"
HTTP_DOMAIN_RE = r"http://(?P<h>[a-z0-9.-]+)"


def plant_urls(batch: pa.Table, id_col: str = "doc_id",
               text_col: str = "text") -> pa.ChunkedArray:
    """doc_id % 3 == 0 gets an https URL appended, % 9 == 0
    additionally an http mirror URL (so some docs carry two)."""
    ids = batch[id_col]
    text = pc.cast(batch[text_col], pa.string())
    ids_str = pc.cast(ids, pa.string())
    ids_np = ids.to_numpy()
    n = len(batch)
    site = pc.cast(pa.array(ids_np % 20), pa.string())
    mirror = pc.cast(pa.array(ids_np % 5), pa.string())
    https_sfx = pc.binary_join_element_wise(
        pa.array([" see https://site"] * n), site,
        pa.array([".example.com/p/"] * n), ids_str,
        pa.array([" ok"] * n), "")
    http_sfx = pc.binary_join_element_wise(
        pa.array([" via http://mirror"] * n), mirror,
        pa.array([".example.org/q/"] * n), ids_str,
        pa.array([" end"] * n), "")
    em = pa.array(ids_np % 3 == 0)
    ph = pa.array(ids_np % 9 == 0)
    return pc.binary_join_element_wise(
        text,
        pc.if_else(em, https_sfx, ""),
        pc.if_else(ph, http_sfx, ""),
        "")


def domain_partials(batch: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """→ per-batch partial (domain, tld, n_urls) counts from the two
    scheme-anchored RE2 extraction kernels. Bounded key space (the
    planting yields ≤25 domains) → the final combine is the funnel."""
    aug = plant_urls(batch, id_col, text_col)
    if isinstance(aug, pa.ChunkedArray):
        aug = aug.combine_chunks()
    doms = []
    for pat in (HTTPS_DOMAIN_RE, HTTP_DOMAIN_RE):
        ex = pc.extract_regex(aug, pat)
        h = pc.struct_field(ex, "h").drop_null()
        if len(h):
            doms.append(h)
    if not doms:
        return pa.table({"domain": pa.array([], pa.string()),
                         "tld": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    flat = pa.concat_arrays([d.combine_chunks() if
                             isinstance(d, pa.ChunkedArray) else d
                             for d in doms])
    enc = flat.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    counts = np.bincount(idx, minlength=len(enc.dictionary))
    dom = enc.dictionary
    tld = pc.struct_field(
        pc.extract_regex(dom, r"\.(?P<t>[a-z]+)$"), "t")
    return pa.table({
        "domain": dom,
        "tld": tld,
        "n": pa.array(counts.astype(np.int64), pa.int64()),
    })


def ascii_token_counts(texts) -> np.ndarray:
    """Definitional token count per doc: ASCII-class split
    (string_split_regex parity) with empty tokens dropped. int64."""
    texts = pc.fill_null(pc.cast(texts, pa.string()), "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.utf8_trim(texts, " \t\n\r\f\v")
    words = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    cnt = np.diff(np.asarray(words.offsets).astype(np.int64))
    # after the ASCII trim, only a fully-empty doc yields the single
    # '' token
    empty = pc.equal(texts, "").to_numpy(zero_copy_only=False)
    return np.where(empty, 0, cnt).astype(np.int64)


def shard_packing(ds, shard_tokens: int = 4096, range_w: int = 4096,
                  id_col: str = "doc_id", text_col: str = "text",
                  small_rows: int = 2_000_000):
    """Token-budget shard packing: assign docs (in doc_id order) to
    consecutive training shards of ``shard_tokens`` tokens via the
    GLOBAL exclusive prefix sum shard_id = cum_excl // shard_tokens,
    and return per-shard (shard_id, n_docs, shard_tokens) stats.

    This is the engine's global ordered-scan operator (sum() OVER
    (ORDER BY key) with no partition key). Distributed plan — the
    textbook two-phase scan, but over the KEY RANGE rather than block
    order so it is deterministic under any partitioning:

      1. per-batch (range = doc_id // range_w, Σ n) partials →
         bounded-key funnel → driver computes the tiny exclusive
         per-range offset table (n_docs / range_w entries; a k-way
         tree combine is the growth path, as grouped_sum_combine
         documents);
      2. groupby(range) — each range wholly in one task — in-group
         sort by doc_id, cumsum + range offset, shard assignment,
         in-group shard partials;
      3. bounded-key funnel sums the per-range shard partials (a
         shard can straddle a range boundary).

    Small plan (token table ≤ ``small_rows`` rows): funnel the
    2-int-column token table to one task and scan vectorized.
    Plans pinned equal in tests."""
    import ray

    def tok(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b[id_col], pa.int64()),
            "n": pa.array(ascii_token_counts(b[text_col]), pa.int64()),
        })

    toks = ds.map_batches(tok, batch_format="pyarrow").materialize()

    def shard_agg(doc_ids, n, cum_excl) -> pa.Table:
        shard = cum_excl // shard_tokens
        first = np.flatnonzero(
            np.concatenate([[True], shard[1:] != shard[:-1]]))
        return pa.table({
            "shard_id": pa.array(shard[first], pa.int64()),
            "n_docs": pa.array(
                np.diff(np.concatenate([first, [len(shard)]])), pa.int64()),
            "shard_tokens": pa.array(
                np.add.reduceat(n, first) if len(n) else
                np.empty(0, np.int64), pa.int64()),
        })

    if toks.count() <= small_rows:
        def full_scan(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy()
            n = b["n"].to_numpy()
            order = np.argsort(d, kind="stable")
            d, n = d[order], n[order]
            cum_excl = np.cumsum(n) - n
            return shard_agg(d, n, cum_excl)

        return toks.repartition(1).map_batches(
            full_scan, batch_format="pyarrow")

    from ..util import grouped_sum_combine

    def range_partial(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy()
        n = b["n"].to_numpy()
        rng = d // range_w
        order = np.argsort(rng, kind="stable")
        rs = rng[order]
        first = np.flatnonzero(
            np.concatenate([[True], rs[1:] != rs[:-1]]))
        return pa.table({
            "rng": pa.array(rs[first], pa.int64()),
            "n": pa.array(np.add.reduceat(n[order], first), pa.int64()),
        })

    totals = grouped_sum_combine(
        toks.map_batches(range_partial, batch_format="pyarrow"),
        ["rng"], "n", "rsum").take_all()
    rngs = np.array([t["rng"] for t in totals], dtype=np.int64)
    sums = np.array([t["rsum"] for t in totals], dtype=np.int64)
    order = np.argsort(rngs)
    rngs, sums = rngs[order], sums[order]
    offsets = np.cumsum(sums) - sums
    off_ref = ray.put((rngs, offsets))

    def add_rng(b: pa.Table) -> pa.Table:
        return b.append_column(
            "rng", pa.array(b["doc_id"].to_numpy() // range_w, pa.int64()))

    def scan_range(g: pa.Table) -> pa.Table:
        rngs_, offsets_ = ray.get(off_ref)
        d = g["doc_id"].to_numpy()
        n = g["n"].to_numpy()
        order_ = np.argsort(d, kind="stable")
        d, n = d[order_], n[order_]
        base = offsets_[np.searchsorted(rngs_, d[0] // range_w)]
        cum_excl = base + np.cumsum(n) - n
        return shard_agg(d, n, cum_excl)

    per = toks.map_batches(add_rng, batch_format="pyarrow") \
        .groupby("rng").map_groups(scan_range, batch_format="pyarrow")

    def shard_combine(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.schema([
                ("shard_id", pa.int64()), ("n_docs", pa.int64()),
                ("shard_tokens", pa.int64())]).empty_table()
        s = b["shard_id"].to_numpy()
        order_ = np.argsort(s, kind="stable")
        ss = s[order_]
        first = np.flatnonzero(
            np.concatenate([[True], ss[1:] != ss[:-1]]))
        return pa.table({
            "shard_id": pa.array(ss[first], pa.int64()),
            "n_docs": pa.array(np.add.reduceat(
                b["n_docs"].to_numpy()[order_], first), pa.int64()),
            "shard_tokens": pa.array(np.add.reduceat(
                b["shard_tokens"].to_numpy()[order_], first), pa.int64()),
        })

    return per.repartition(1).map_batches(
        shard_combine, batch_format="pyarrow")


# DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): hash tokens into a
# small feature space, estimate a target distribution (here the
# lang='en' slice stands in for the high-quality target corpus) and a
# raw distribution over the SAME buckets, and score every document by
# how target-like its tokens are. DSIR's score is the log-likelihood
# ratio Σ log(p_t/p_r) — a float sum, order-dependent, un-hashable.
# The parity formulation keeps the comparison EXACT: with bucket
# counts ct/cr and totals T = Σct, R = Σcr, the per-token weight
#     w(b) = ct[b]·R − cr[b]·T        (int64)
# is T·R·(p_t(b) − p_r(b)) — the same sign and ordering semantics as
# the probability gap, in pure integer arithmetic (single-divide rule
# taken to its limit: zero divides). score(doc) = Σ_tokens w(bucket).
#
# Bucket hash = md5 little-endian 64-bit & (NBUCKETS-1) — the simhash
# oracle's exact hex-parse device, so DuckDB reproduces it bit-for-bit.
# Tokenizer = the definitional ASCII class with empty-token filter.
#
# Scale shape: pass 1 streams the corpus into NBUCKETS-row partials
# (bounded-key funnel — the feature space is fixed at NBUCKETS by
# design, that is the POINT of hashed features); the weight vector is
# NBUCKETS ints shipped in the task closure; pass 2 streams again and
# scores each batch vectorized. No shuffle at all, corpus never
# leaves the workers.

IMPORTANCE_NBUCKETS = 64


def _token_buckets(batch: pa.Table, text_col: str = "text"):
    """→ (didx, buckets): one entry per non-empty ASCII-class token,
    didx = owning row index, bucket = md5-LE-64 & 63."""
    from .dedup import _word_hash64

    texts = pc.cast(batch[text_col], pa.string()).combine_chunks()
    texts = pc.fill_null(texts, "")
    words = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    woffs = np.asarray(words.offsets).astype(np.int64)
    flat = words.values
    cnt = np.diff(woffs)
    didx = np.repeat(np.arange(len(batch)), cnt)
    keep = pc.greater(pc.binary_length(flat), 0).to_numpy(zero_copy_only=False)
    didx = didx[keep]
    kept = flat.filter(pa.array(keep))
    if not len(kept):
        return didx, np.empty(0, dtype=np.int64)
    # dictionary_encode = vectorized C unique+inverse; Python (md5,
    # memoized) touches only the small dictionary, never the stream
    d = kept.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    inv = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    b_uniq = np.asarray([_word_hash64(w) for w in uniq], dtype=np.uint64) \
        & np.uint64(IMPORTANCE_NBUCKETS - 1)
    return didx, b_uniq.astype(np.int64)[inv]


def importance_count_partials(batch: pa.Table, target_lang: str = "en",
                              text_col: str = "text") -> pa.Table:
    """Pass 1 map side: per-batch (bkt, ct, cr) bucket-count partials
    (ct over the target slice, cr over everything)."""
    didx, bkt = _token_buckets(batch, text_col)
    en = pc.equal(batch["lang"], target_lang).to_numpy(zero_copy_only=False)
    ct = np.zeros(IMPORTANCE_NBUCKETS, dtype=np.int64)
    cr = np.zeros(IMPORTANCE_NBUCKETS, dtype=np.int64)
    if len(bkt):
        np.add.at(cr, bkt, 1)
        tb = bkt[en[didx]]
        np.add.at(ct, tb, 1)
    nz = np.flatnonzero(cr)
    return pa.table({
        "bkt": pa.array(nz, pa.int64()),
        "ct": pa.array(ct[nz], pa.int64()),
        "cr": pa.array(cr[nz], pa.int64()),
    })


def importance_weights(docs_ds, target_lang: str = "en",
                       text_col: str = "text") -> np.ndarray:
    """Pass 1: bucket counts via bounded-key funnel → int64 weight
    vector w[b] = ct[b]·R − cr[b]·T (NBUCKETS entries)."""
    from ..util import grouped_sums_combine

    partial = docs_ds.map_batches(
        importance_count_partials, batch_format="pyarrow",
        fn_kwargs={"target_lang": target_lang, "text_col": text_col})
    t = grouped_sums_combine(partial, ["bkt"], ["ct", "cr"],
                             ["ct", "cr"]).to_pandas()
    ct = np.zeros(IMPORTANCE_NBUCKETS, dtype=np.int64)
    cr = np.zeros(IMPORTANCE_NBUCKETS, dtype=np.int64)
    ct[t["bkt"].to_numpy()] = t["ct"].to_numpy()
    cr[t["bkt"].to_numpy()] = t["cr"].to_numpy()
    T, R = int(ct.sum()), int(cr.sum())
    return ct * R - cr * T


def importance_scores(docs_ds, weights: np.ndarray,
                      id_col: str = "doc_id", text_col: str = "text"):
    """Pass 2: per-doc integer score Σ_tokens w(bucket); zero-token
    docs score 0 (mirrors the oracle's LEFT JOIN + COALESCE)."""
    w = weights

    def score(batch: pa.Table) -> pa.Table:
        didx, bkt = _token_buckets(batch, text_col)
        s = np.zeros(len(batch), dtype=np.int64)
        if len(bkt):
            np.add.at(s, didx, w[bkt])
        return pa.table({
            "doc_id": pc.cast(batch[id_col], pa.int64()),
            "score": pa.array(s, pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


def curriculum_shards(scored_ds, shard_tokens: int = 4096,
                      n_ranges: int = 64, small_rows: int = 2_000_000):
    """Curriculum data ordering: pack docs into fixed token-budget
    training shards in QUALITY order (score DESC, doc_id ASC tie) —
    shard 0 is the most target-like slice, the classic
    curriculum/annealing layout. shard = cum_excl_tokens // budget
    over the global (score DESC, doc_id) order.

    The ordered-scan machinery is shard_packing's two-phase plan with
    the range key generalized from id blocks to VALUE ranges of the
    ordering key: ranges are uniform score bins (descending), so each
    bin is wholly one task, the bin offset table is tiny, and the
    in-bin sort + cumsum is vectorized. Skewed score distributions
    skew bin sizes, not correctness (a production variant samples
    split points like a distributed sort). Small plan funnels the
    3-int-column table; plans pinned equal in tests.

    ``scored_ds``: (doc_id, score, n) — n = token count.
    → Dataset(doc_id, shard_id)."""
    import ray

    from ..util import grouped_sum_combine

    def assign(d, s, n, cum_excl) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "shard_id": pa.array(cum_excl // shard_tokens, pa.int64()),
        })

    scored = scored_ds.materialize()
    if scored.count() <= small_rows:
        def full_scan(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy()
            s = b["score"].to_numpy()
            n = b["n"].to_numpy()
            order = np.lexsort((d, -s))
            d, s, n = d[order], s[order], n[order]
            return assign(d, s, n, np.cumsum(n) - n)

        return scored.repartition(1).map_batches(
            full_scan, batch_format="pyarrow", batch_size=None)

    # value-range plan: uniform score bins, DESCENDING (bin 0 = best)
    lo_hi = scored.map_batches(lambda b: pa.table({
        "lo": pa.array([int(b["score"].to_numpy().min())], pa.int64()),
        "hi": pa.array([int(b["score"].to_numpy().max())], pa.int64()),
    }), batch_format="pyarrow").to_pandas()
    smin, smax = int(lo_hi["lo"].min()), int(lo_hi["hi"].max())
    width = max(1, (smax - smin) // n_ranges + 1)

    def add_rng(b: pa.Table) -> pa.Table:
        s = b["score"].to_numpy()
        return b.append_column(
            "rng", pa.array((smax - s) // width, pa.int64()))

    ranged = scored.map_batches(add_rng, batch_format="pyarrow")

    def range_partial(b: pa.Table) -> pa.Table:
        r = b["rng"].to_numpy()
        n = b["n"].to_numpy()
        order = np.argsort(r, kind="stable")
        rs = r[order]
        first = np.flatnonzero(np.concatenate([[True], rs[1:] != rs[:-1]]))
        return pa.table({
            "rng": pa.array(rs[first], pa.int64()),
            "n": pa.array(np.add.reduceat(n[order], first), pa.int64()),
        })

    totals = grouped_sum_combine(
        ranged.map_batches(range_partial, batch_format="pyarrow"),
        ["rng"], "n", "rsum").take_all()
    rngs = np.array([t["rng"] for t in totals], dtype=np.int64)
    sums = np.array([t["rsum"] for t in totals], dtype=np.int64)
    order = np.argsort(rngs)
    rngs, sums = rngs[order], sums[order]
    offsets = np.cumsum(sums) - sums
    off_ref = ray.put((rngs, offsets))

    def scan_range(g: pa.Table) -> pa.Table:
        rngs_, offsets_ = ray.get(off_ref)
        d = g["doc_id"].to_numpy()
        s = g["score"].to_numpy()
        n = g["n"].to_numpy()
        order_ = np.lexsort((d, -s))
        d, s, n = d[order_], s[order_], n[order_]
        base = offsets_[np.searchsorted(rngs_, int(g["rng"][0].as_py()))]
        return assign(d, s, n, base + np.cumsum(n) - n)

    return ranged.groupby("rng").map_groups(
        scan_range, batch_format="pyarrow")


# -- winnowing fingerprints (MOSS) -------------------------------------------

WINNOW_K = 3   # words per k-gram
WINNOW_W = 4   # grams per winnowing window


def winnow_fingerprints(ds, k: int = WINNOW_K, w: int = WINNOW_W,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm) — the fingerprint-family member between full
    shingle sets (minhash) and one-value signatures (simhash): per doc,
    hash every k-gram, then keep the MINIMUM hash of every w-gram
    window. Guarantees: any shared run of k+w-1 words between two docs
    shares ≥1 fingerprint, while storage drops to ~2/(w+1) of the
    gram count. Output = DISTINCT (doc_id, fp) rows, so the window
    position rule (rightmost vs leftmost minimum) is immaterial — all
    positions achieving a window minimum carry the same VALUE.

    Gram semantics mirror the corpus convention (decontaminate):
    ASCII-class split, empty tokens dropped, docs with 1..k-1 words
    emit ONE combined gram, empty docs none. Windows: starts
    1..n_grams-w+1; a doc with n_grams < w has a single window over
    all its grams. Gram hash = md5-LE-64 & (2^63-1) of the
    space-joined gram string — the importance/simhash oracle parity
    device, so the whole operator is SQL-hash-checkable.

    Physical shape: stateless vectorized map, NO shuffle (each doc is
    one row, so per-batch distinct is global distinct). Gram strings
    are built by ONE binary_join_element_wise over k shifted slices of
    the flat token array (zero-copy gathers); md5 touches only the
    batch's gram DICTIONARY; window minima are a (n, w) stride view +
    min(axis=1) and per-doc reduceat for the short-doc tail."""

    def winnow_batch(b: pa.Table) -> pa.Table:
        from ..util import md5_le64

        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "fp": pa.array([], pa.int64()),
        })
        texts = pc.cast(b[text_col], pa.string()).combine_chunks()
        texts = pc.fill_null(texts, "")
        words = pc.split_pattern_regex(texts, pattern="[ \t\n\r\f\v]+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        woffs = np.asarray(words.offsets).astype(np.int64)
        flat = words.values
        keep = pc.greater(pc.binary_length(flat), 0) \
            .to_numpy(zero_copy_only=False)
        cnt0 = np.diff(woffs)
        didx_tok = np.repeat(np.arange(len(b)), cnt0)[keep]
        kept = flat.filter(pa.array(keep))
        cnt = np.bincount(didx_tok, minlength=len(b))
        toffs = np.concatenate([[0], np.cumsum(cnt)])
        N = len(kept)
        doc_ids = b[id_col].to_numpy(zero_copy_only=False)

        gram_hash_chunks: list[np.ndarray] = []
        gram_doc_chunks: list[np.ndarray] = []

        def hash_grams(garr: pa.Array) -> np.ndarray:
            # direct md5, NOT the memoized _word_hash64: grams are
            # high-cardinality multi-word strings that would flood the
            # bounded per-WORD memo and evict nothing while blocking
            # future word inserts (it stops accepting once full)
            d = garr.dictionary_encode()
            uniq = d.dictionary.to_pylist()
            inv = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            hu = np.asarray(
                [md5_le64(g.encode("utf-8")) for g in uniq],
                dtype=np.uint64)
            return (hu[inv] & np.uint64((1 << 63) - 1)).astype(np.int64)

        # long docs (cnt >= k): one join over k shifted slices for ALL
        # starts, then select each doc's valid range
        if N >= k:
            parts = [kept.slice(j, N - k + 1) for j in range(k)]
            grams = pc.binary_join_element_wise(*parts, " ")
            h_all = hash_grams(grams)
            long_sel = np.flatnonzero(cnt >= k)
            if len(long_sel):
                ng = cnt[long_sel] - k + 1
                rep = np.repeat(long_sel, ng)
                local = np.arange(int(ng.sum()), dtype=np.int64) - \
                    np.repeat(np.cumsum(ng) - ng, ng)
                gram_hash_chunks.append(h_all[toffs[rep] + local])
                gram_doc_chunks.append(rep)

        # short docs (1 <= cnt < k): one combined gram per doc,
        # vectorized per length class
        for L in range(1, k):
            sel = np.flatnonzero(cnt == L)
            if not len(sel):
                continue
            parts = [kept.take(pa.array(toffs[sel] + j)) for j in range(L)]
            grams = (pc.binary_join_element_wise(*parts, " ")
                     if L > 1 else parts[0])
            gram_hash_chunks.append(hash_grams(grams))
            gram_doc_chunks.append(sel)

        if not gram_hash_chunks:
            return empty
        gh = np.concatenate(gram_hash_chunks)
        gd = np.concatenate(gram_doc_chunks)
        order = np.argsort(gd, kind="stable")
        gh, gd = gh[order], gd[order]
        ng_per_doc = np.bincount(gd, minlength=len(b))
        goffs = np.concatenate([[0], np.cumsum(ng_per_doc)])

        out_doc: list[np.ndarray] = []
        out_fp: list[np.ndarray] = []
        # wide docs: one stride view + min over ALL starts, gather the
        # in-doc valid ranges
        if len(gh) >= w:
            wmin = np.lib.stride_tricks.sliding_window_view(gh, w) \
                .min(axis=1)
            wide = np.flatnonzero(ng_per_doc >= w)
            if len(wide):
                nw = ng_per_doc[wide] - w + 1
                rep = np.repeat(wide, nw)
                local = np.arange(int(nw.sum()), dtype=np.int64) - \
                    np.repeat(np.cumsum(nw) - nw, nw)
                out_doc.append(rep)
                out_fp.append(wmin[goffs[rep] + local])
        # narrow docs (1 <= n_grams < w): single window = per-doc min
        narrow = np.flatnonzero((ng_per_doc > 0) & (ng_per_doc < w))
        if len(narrow):
            seg_min = np.minimum.reduceat(gh, goffs[:-1][ng_per_doc > 0])
            pos = np.searchsorted(np.flatnonzero(ng_per_doc > 0), narrow)
            out_doc.append(narrow)
            out_fp.append(seg_min[pos])

        if not out_doc:
            return empty
        od = np.concatenate(out_doc)
        of = np.concatenate(out_fp)
        # distinct (doc, fp): each doc is one input row, so per-batch
        # distinct IS global distinct — no shuffle needed
        pair = np.unique(np.stack([doc_ids[od], of], axis=1), axis=0)
        return pa.table({
            id_col: pa.array(pair[:, 0], pa.int64()),
            "fp": pa.array(pair[:, 1], pa.int64()),
        })

    return ds.map_batches(winnow_batch, batch_format="pyarrow")
