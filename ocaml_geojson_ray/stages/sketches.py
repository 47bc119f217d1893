"""Mergeable sketches (the guide's 'Aggregation at scale' pattern:
emit one serialized sketch per batch, merge in a tiny second stage).

- ``HyperLogLog``   — approximate distinct counting, 2^p registers,
  numpy-vectorized add; standard bias-corrected estimator.
- ``BloomFilter``   — membership with configured false-positive rate,
  vectorized k-hash add/contains; used for broadcast semi/anti joins
  where the key set is large (the exact-set variant in queries.py is
  the small-side case).
"""

from __future__ import annotations

import math

import numpy as np

from ..util import md5_le64


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants); uint64
    wraparound is the intended arithmetic."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _hash64(values) -> np.ndarray:
    """Stable 64-bit hashes (not PYTHONHASHSEED-dependent). Integer
    inputs — list OR numpy array, so adds and probes hash identically —
    take the VECTORIZED splitmix64 path; anything else falls back to a
    per-value md5 (strings/bytes are rare sketch keys here)."""
    if not isinstance(values, np.ndarray):
        try:
            arr = np.asarray(values)
        except Exception:
            arr = None
    else:
        arr = values
    if arr is not None and arr.dtype.kind in "iu":
        return _mix64(arr.astype(np.int64).view(np.uint64))
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = repr(v).encode("utf-8") if not isinstance(v, bytes) else v
        out[i] = md5_le64(b)
    return out


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_many(self, values) -> "HyperLogLog":
        return self.add_hashes(_hash64(values))

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        width = 64 - self.p
        w = (h << np.uint64(self.p)) >> np.uint64(self.p)  # low `width` bits
        # exact bit_length: split so every float conversion is < 2^53
        hi = (w >> np.uint64(11)).astype(np.float64)
        lo = (w & np.uint64((1 << 11) - 1)).astype(np.float64)
        bl = np.where(
            hi > 0,
            np.floor(np.log2(np.where(hi > 0, hi, 1.0))) + 1.0 + 11.0,
            np.where(lo > 0, np.floor(np.log2(np.where(lo > 0, lo, 1.0))) + 1.0, 0.0),
        )
        rank = (width - bl + 1.0).astype(np.uint8)  # w == 0 → width + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        """Bias-corrected estimate, derived ORDER-INDEPENDENTLY so the
        value is a pure function of the register multiset (and hence
        SQL-oracle-checkable): the harmonic-mean denominator
        Z = sum(2^-M_j) is accumulated as the exact integer
        z = sum(2^(S - M_j)) with S = 65 - p (the max register value),
        then spent in ONE float divide — a float sum over 4096
        power-of-two terms spans >53 bits of dynamic range and rounds
        differently per summation order, which np.sum's pairwise
        algorithm would bake in. The linear-counting branch uses
        math.log, NOT np.log: numpy's SIMD log diverges from libm on
        ~30% of inputs while DuckDB's ln IS libm (measured; both pinned
        in tests/test_stages.py)."""
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s_max = 65 - self.p
        counts = np.bincount(self.registers, minlength=s_max + 1)
        z = sum(int(c) << (s_max - r) for r, c in enumerate(counts.tolist()) if c)
        est = alpha * m * m * float(1 << s_max) / float(z)
        if est <= 2.5 * m:
            zeros = int(counts[0])
            if zeros:
                est = m * math.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


class BloomFilter:
    def __init__(self, n_items: int, fpr: float = 0.01):
        m = int(-n_items * np.log(fpr) / (np.log(2) ** 2)) + 8
        self.m = m
        self.k = max(1, int(round(m / max(1, n_items) * np.log(2))))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)

    def _positions(self, values) -> np.ndarray:
        h = _hash64(values)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = h >> np.uint64(32)
        ks = np.arange(self.k, dtype=np.uint64)
        return ((h1[:, None] + ks[None, :] * h2[:, None])
                % np.uint64(self.m)).astype(np.int64)

    def add_many(self, values) -> "BloomFilter":
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return self

    def contains_many(self, values) -> np.ndarray:
        pos = self._positions(values)
        got = (self.bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        return got.all(axis=1).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


class MisraGries:
    """Heavy-hitters summary with k counters (mergeable).

    Deterministic guarantee (the self-check the query asserts): every
    item with true count > N/k SURVIVES in the summary, and each
    stored count underestimates the true count by at most the total
    decrement. Updates are WEIGHTED — a batch feeds its exact per-item
    partial counts (np.unique), not one call per occurrence — so the
    per-batch cost is O(distinct items in batch · log k), not O(rows).
    """

    def __init__(self, k: int = 64):
        self.k = k
        self.counts: dict = {}
        self.total = 0

    def add_weighted(self, items, weights) -> "MisraGries":
        c = self.counts
        for item, w in zip(items, weights):
            w = int(w)
            self.total += w
            if item in c:
                c[item] += w
            elif len(c) < self.k:
                c[item] = w
            else:
                # decrement all by the min needed to evict at least one
                dec = min(w, min(c.values()))
                for key in list(c):
                    c[key] -= dec
                    if c[key] <= 0:
                        del c[key]
                if w > dec:
                    c[item] = w - dec
        return self

    def add_many(self, values) -> "MisraGries":
        uniq, cnt = np.unique(np.asarray(values), return_counts=True)
        return self.add_weighted(uniq.tolist(), cnt.tolist())

    def merge(self, other: "MisraGries") -> "MisraGries":
        self.add_weighted(list(other.counts.keys()),
                          list(other.counts.values()))
        self.total += other.total - sum(other.counts.values())
        return self

    def survivors(self) -> dict:
        return dict(self.counts)


class KLL:
    """Mergeable quantile sketch (Karnin-Lang-Liberty 2016, the
    practical geometric-capacity variant): level-h buffer items carry
    weight 2^h; an over-capacity level sorts and keeps every other
    item (random even/odd offset) one level up. Rank error is
    O(1/k) w.h.p.; k=200 lands well under 1% observed on 10^4-10^6
    values. The RNG is SEEDED per sketch, so a pipeline's output is
    reproducible run-to-run (the randomness is only the compaction
    offset — determinism does not void the guarantee, it fixes one
    draw of it).

    This is the missing member of the mergeable family (HLL
    cardinality, Bloom membership, Misra-Gries heavy hitters): batch
    sketches funnel as ~k·log(n/k) doubles regardless of input size —
    the 100-TB quantile pattern; the exact two-phase histogram plan
    (segment_price_quantiles) is the bounded-grid alternative."""

    def __init__(self, k: int = 200, seed: int = 0x5EED):
        self.k = int(k)
        self.n = 0
        self.levels = [np.empty(0, np.float64)]
        self.rng = np.random.default_rng(seed)

    def _capacity(self, level: int, depth: int) -> int:
        c = 2.0 / 3.0
        return max(2, int(np.ceil(self.k * c ** (depth - 1 - level))))

    def add_batch(self, values) -> "KLL":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        while True:
            depth = len(self.levels)
            caps = [self._capacity(h, depth) for h in range(depth)]
            if sum(len(b) for b in self.levels) <= sum(caps):
                return
            for h in range(depth):
                if len(self.levels[h]) > caps[h]:
                    buf = np.sort(self.levels[h])
                    off = int(self.rng.integers(0, 2))
                    if h + 1 == depth:
                        self.levels.append(np.empty(0, np.float64))
                    self.levels[h + 1] = np.concatenate(
                        [self.levels[h + 1], buf[off::2]])
                    self.levels[h] = np.empty(0, np.float64)
                    break
            else:
                return

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for h, buf in enumerate(other.levels):
            self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._compress()
        return self

    def quantiles(self, qs) -> np.ndarray:
        """Smallest sketch value whose cumulative weight reaches q·W."""
        vals = np.concatenate(self.levels)
        ws = np.concatenate([
            np.full(len(b), 1 << h, np.int64)
            for h, b in enumerate(self.levels)
        ])
        order = np.argsort(vals, kind="stable")
        vals, ws = vals[order], ws[order]
        cum = np.cumsum(ws)
        qs = np.asarray(qs, np.float64)
        idx = np.searchsorted(cum, qs * cum[-1], side="left")
        return vals[np.minimum(idx, len(vals) - 1)]

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])


def hll_distinct(ds, key_cols, value_col: str, p: int = 12):
    """Approximate distinct values of ``value_col`` per key group:
    one HLL per (key, batch) serialized to bytes, merged per key in a
    tiny map_groups — the shuffle carries sketches, never raw values."""
    import pyarrow as pa
    import pyarrow.compute as pc

    key_cols = list(key_cols)

    def sketch_batch(batch: pa.Table) -> pa.Table:
        # Arrow-native grouping: sort_by + run slicing, and the batch's
        # values are hashed ONCE (vectorized) with each group sketching
        # its hash slice — no pandas conversion, no per-group rehash.
        t = batch.select(key_cols + [value_col])
        # null-KEY rows are dropped (the former pandas-groupby
        # semantics; they would also NaN-coerce an int key column and
        # split into per-row groups under the != run test)
        valid = None
        for k in key_cols:
            v = pc.is_valid(t[k])
            valid = v if valid is None else pc.and_(valid, v)
        if t.num_rows and not pc.all(valid).as_py():
            t = t.filter(valid)
        t = t.sort_by([(k, "ascending") for k in key_cols])
        n = len(t)
        if n == 0:
            return pa.table({
                **{k: t[k] for k in key_cols},
                "sketch": pa.array([], pa.binary()),
            })
        keys_np = [t[k].to_numpy(zero_copy_only=False) for k in key_cols]
        neq = np.zeros(n, dtype=bool)
        neq[0] = True
        for k in keys_np:
            neq[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(neq)
        ends = np.append(starts[1:], n)
        vals = t[value_col].combine_chunks()
        # VALUE hashing must not depend on whether this batch happens
        # to contain a null: a null-conditional to_pylist/to_numpy
        # split hashed the same value two ways (numpy float32 reprs as
        # '0.1', the Python scalar as '0.10000000149011612'; numpy 2.x
        # reprs ints as 'np.int64(5)'), double-counting it across
        # merged sketches. Canonical rule: integer dtypes always take
        # the vectorized splitmix path (nulls scattered around it),
        # everything else always hashes PYTHON scalars via to_pylist;
        # a null value keeps its former repr(None) identity as one
        # distinct value.
        import pyarrow.types as pat

        if pat.is_integer(vals.type):
            if vals.null_count:
                valid_m = pc.is_valid(vals).to_numpy(zero_copy_only=False)
                h = np.full(n, md5_le64(repr(None).encode("utf-8")),
                            dtype=np.uint64)
                h[valid_m] = _mix64(
                    vals.drop_null().to_numpy(zero_copy_only=False)
                    .astype(np.int64).view(np.uint64))
            else:
                h = _mix64(vals.to_numpy(zero_copy_only=False)
                           .astype(np.int64).view(np.uint64))
        else:
            h = _hash64(vals.to_pylist())
        sketches = [
            HyperLogLog(p).add_hashes(h[s_:e_]).to_bytes()
            for s_, e_ in zip(starts, ends)
        ]
        return pa.table({
            **{kc: pa.array(kv[starts]) for kc, kv in zip(key_cols, keys_np)},
            "sketch": pa.array(sketches, pa.binary()),
        })

    def merge_sketches(g: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        for b in g["sketch"].to_pylist():
            h.merge(HyperLogLog.from_bytes(b, p))
        out = {k: g[k][:1] for k in key_cols}
        # floor(x + 0.5) half-up, NOT round(): Python round() is
        # banker's, DuckDB round() is half-away — the repo's standard
        # half-up device is reproducible on both sides.
        import math as _math

        out["approx_distinct"] = pa.array(
            [int(_math.floor(h.estimate() + 0.5))], pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(sketch_batch, batch_format="pyarrow")
        .groupby(key_cols)
        .map_groups(merge_sketches, batch_format="pyarrow")
    )
