"""Streaming exact dedup against a SHARED MUTABLE INDEX — the one
operator class in this repo that genuinely needs raw Ray actors.

Every other dedup here is a batch operator: hash → key shuffle →
min-agg winners (stages/dedup.py). That plan needs the whole corpus
keyed before any winner is known. The STREAMING variant answers a
different question — "have we seen this content before, right now?" —
the shape of an ingest-time filter in front of a training-data lake,
where each arriving batch must be admitted/dropped immediately and
the membership state must be consulted and UPDATED mid-stream.

A Dataset pipeline cannot express that: map_batches UDFs are pure
(re-executable, order-free), groupby is a barrier. The fit is the
Ray-native shared-state pattern: membership lives in a pool of
``DedupShard`` actors, sharded by hash so admission of DIFFERENT
hashes never serializes; each map task routes its batch's hashes to
the owning shards (one RPC per shard per batch, vectorized inside)
and filters on the replies.

Semantics: exactly ONE survivor per distinct content hash — which
duplicate survives is ARRIVAL ORDER (nondeterministic under parallel
execution), so queries check the survivor-set properties (count and
hash-set equality with the batch dedup), not row identity. That is
the honest contract of any streaming dedup.

Retry safety (exactly-once admission): every admit call carries an
IDEMPOTENCE TOKEN derived from the batch's unique row ids (disjoint
batches → distinct tokens; a RETRIED task re-presents the same rows →
the same token). A shard records, per hash, the token of the call
that admitted it; a re-asked hash answers True iff the asker IS the
original admitter (first occurrence within the call — within-call
duplicates replay False exactly as they answered the first time). A
retried batch therefore receives bit-identical admissions instead of
dropping all its rows; the former at-most-once hazard is pinned away
by tests/test_stages.py::test_streaming_dedup_retry_idempotent.

Bounded state: the hot (hash → token) dict is capped per shard
(``flush_at``); overflow freezes into immutable sorted numpy runs —
in-heap by default (~16 B/entry vs ~100 B/dict-slot), memory-mapped
files under ``spill_dir`` when given, so a shard's Python heap stays
O(flush_at) no matter how many distinct hashes it owns. Lookups are
dict-then-searchsorted over the runs (an LSM memtable/SST shape; a
production shard would also compact runs and front them with a Bloom
filter — both orthogonal to the admission contract pinned here).
Fault tolerance: an actor loss loses its shard's memory — production
would checkpoint shard sets (state/checkpoint.py pattern);
re-admitting a duplicate after a crash is the standard at-least-once
tradeoff of an unreplicated index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _hash_string_array


def _shard_actor_cls():
    import ray

    @ray.remote(num_cpus=0.25)
    class DedupShard:
        """Owns one hash shard's membership index: a bounded hot dict
        (hash → admitting token) plus frozen sorted runs."""

        def __init__(self, flush_at: int = 2_000_000,
                     spill_dir: str | None = None):
            import uuid

            self.hot: dict[int, int] = {}
            self.flush_at = int(flush_at)
            self.spill_dir = spill_dir
            # each run: (sorted int64 hash array, aligned token array)
            self.runs: list[tuple[np.ndarray, np.ndarray]] = []
            self._frozen = 0
            self._spill_seq = 0
            # uuid, NOT id(self)/pid: shard actors are separate
            # processes sharing spill_dir, and a recycled address/pid
            # (or a later pool reusing the directory) must never
            # clobber a file another shard still has mmap'd
            self._spill_tag = uuid.uuid4().hex

        def _freeze_hot(self) -> None:
            h = np.fromiter(self.hot.keys(), np.int64, len(self.hot))
            t = np.fromiter(self.hot.values(), np.int64, len(self.hot))
            order = np.argsort(h)
            h, t = h[order], t[order]
            if self.spill_dir is not None:
                import os
                os.makedirs(self.spill_dir, exist_ok=True)
                base = os.path.join(
                    self.spill_dir,
                    f"shard_{self._spill_tag}_{self._spill_seq}")
                self._spill_seq += 1
                np.save(base + "_h.npy", h)
                np.save(base + "_t.npy", t)
                h = np.load(base + "_h.npy", mmap_mode="r")
                t = np.load(base + "_t.npy", mmap_mode="r")
            self.runs.append((h, t))
            self._frozen += len(h)
            self.hot = {}

        def admit(self, token: int, hashes) -> list[bool]:
            """For each hash IN ORDER: True iff this call is (or, on
            retry, WAS) its first-ever admission. Within-call
            duplicates: only the first occurrence answers True —
            including on replay.

            Vectorized: dict work is per UNIQUE hash only, frozen-run
            probes are one ``searchsorted`` of the whole miss set per
            run (no per-hash Python in the actor's hot loop). The -1
            unseen sentinel cannot collide with a real token: CPython
            ``hash()`` never returns -1 (it is the error sentinel and
            is mapped to -2)."""
            h = np.asarray(hashes, dtype=np.int64)
            nh = len(h)
            if nh == 0:
                return []
            uniq, first_idx = np.unique(h, return_index=True)
            winner = np.full(len(uniq), -1, dtype=np.int64)
            hot = self.hot
            unresolved = []
            for j, hv in enumerate(uniq.tolist()):
                w = hot.get(hv)
                if w is not None:
                    winner[j] = w
                else:
                    unresolved.append(j)
            if unresolved and self.runs:
                un = np.asarray(unresolved, dtype=np.int64)
                target = uniq[un]
                still = np.ones(len(un), dtype=bool)
                for rh, rt in self.runs:
                    if not len(rh) or not still.any():
                        continue
                    pos = np.searchsorted(rh, target)
                    inb = still & (pos < len(rh))
                    safe = np.minimum(pos, len(rh) - 1)
                    hit = inb & (np.asarray(rh)[safe] == target)
                    winner[un[hit]] = np.asarray(rt)[safe[hit]]
                    still &= ~hit
            new_mask = winner == -1
            for hv in uniq[new_mask].tolist():
                hot[hv] = token
            winner[new_mask] = token
            out = np.zeros(nh, dtype=bool)
            out[first_idx[winner == token]] = True
            if len(hot) >= self.flush_at:
                self._freeze_hot()
            return out.tolist()

        def size(self) -> int:
            return len(self.hot) + self._frozen

        def n_runs(self) -> int:
            return len(self.runs)

        def hot_len(self) -> int:
            return len(self.hot)

    return DedupShard


def start_dedup_pool(nshards: int = 8, flush_at: int = 2_000_000,
                     spill_dir: str | None = None):
    """→ list of shard actor handles (driver-owned; the pool dies with
    the query when the handles drop)."""
    cls = _shard_actor_cls()
    return [cls.remote(flush_at, spill_dir) for _ in range(nshards)]


def make_admit_fn(pool, text_col: str = "text", id_col: str = "doc_id"):
    """The per-batch admission UDF, exposed so tests can re-run a batch
    through it and pin retry idempotence. The token is built from the
    batch's unique row ids (CPython int/tuple hashing is
    deterministic across processes), so a retried task — same rows —
    presents the same token, while disjoint batches never collide."""
    import ray

    n = len(pool)

    def admit_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks()
        h = _hash_string_array(texts)[0].view(np.int64)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        token = hash((len(ids),) + tuple(int(x) for x in ids))
        shard = (h % n + n) % n
        keep = np.zeros(len(h), dtype=bool)
        calls, idxs = [], []
        for s in range(n):
            ix = np.flatnonzero(shard == s)
            if len(ix):
                # ship the numpy slice itself (zero-copy-ish plasma
                # serialization) — not a per-element Python list
                calls.append(pool[s].admit.remote(token, h[ix]))
                idxs.append(ix)
        for ix, res in zip(idxs, ray.get(calls)):
            keep[ix] = res
        return batch.filter(pa.array(keep))

    return admit_batch


def streaming_exact_dedup(ds, pool, text_col: str = "text",
                          id_col: str = "doc_id"):
    """Admit each row iff its content hash is globally first-seen.
    One RPC per touched shard per batch; rows keep input order within
    the batch. → filtered Dataset (same schema as input), returned
    MATERIALIZED: the admission UDF mutates shard state, so
    re-executing a lazy plan (any second consumption — count then
    take, schema probe, …) would re-present every batch; the
    idempotence tokens make that a harmless replay for an IDENTICAL
    batching, but Ray does not promise identical batch boundaries
    across executions — materializing pins the one and only pass."""
    return ds.map_batches(make_admit_fn(pool, text_col, id_col),
                          batch_format="pyarrow").materialize()
