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

Scale notes: state is O(distinct hashes) × 8 B, sharded — 10¹⁰
distinct docs ≈ 80 GB across the pool, the actor count is the knob
(and a disk-backed shard — RocksDB-style — is the overflow path).
Each shard call is one in-flight RPC per task; with B-row batches the
admission overhead is 2 messages per batch per shard touched, not per
row. Fault tolerance: an actor loss loses its shard's memory —
production would checkpoint shard sets (state/checkpoint.py pattern);
re-admitting a duplicate after a crash is the standard
at-least-once tradeoff. The inverse hazard is TASK retry: a re-run
batch finds its own hashes already admitted and drops ALL its rows
(at-most-once delivery). Production pairs admission with an
idempotence token — the shard records (batch_id → admitted set) and
replays the same answer on retry; omitted here because the sandbox
pipeline never retries mid-query, but it is the first thing to add
in front of a real ingest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _hash_string_array


def _shard_actor_cls():
    import ray

    @ray.remote(num_cpus=0.25)
    class DedupShard:
        """Owns one hash shard's membership set."""

        def __init__(self):
            self.seen: set[int] = set()

        def admit(self, hashes: list[int]) -> list[bool]:
            """For each hash IN ORDER: True if first-ever (and record
            it), False if already seen — duplicates WITHIN the call
            are handled by the same rule."""
            seen = self.seen
            out = []
            for h in hashes:
                if h in seen:
                    out.append(False)
                else:
                    seen.add(h)
                    out.append(True)
            return out

        def size(self) -> int:
            return len(self.seen)

    return DedupShard


def start_dedup_pool(nshards: int = 8):
    """→ list of shard actor handles (driver-owned; the pool dies with
    the query when the handles drop)."""
    cls = _shard_actor_cls()
    return [cls.remote() for _ in range(nshards)]


def streaming_exact_dedup(ds, pool, text_col: str = "text"):
    """Admit each row iff its content hash is globally first-seen.
    One RPC per touched shard per batch; rows keep input order within
    the batch. → filtered Dataset (same schema as input), returned
    MATERIALIZED: the admission UDF mutates shard state, so
    re-executing a lazy plan (any second consumption — count then
    take, schema probe, …) would find every hash already admitted and
    silently return zero rows. Materializing pins the one and only
    pass."""
    import ray

    n = len(pool)

    def admit_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks()
        h = _hash_string_array(texts)[0].view(np.int64)
        shard = (h % n + n) % n
        keep = np.zeros(len(h), dtype=bool)
        calls, idxs = [], []
        for s in range(n):
            ix = np.flatnonzero(shard == s)
            if len(ix):
                calls.append(pool[s].admit.remote([int(x) for x in h[ix]]))
                idxs.append(ix)
        for ix, res in zip(idxs, ray.get(calls)):
            keep[ix] = res
        return batch.filter(pa.array(keep))

    return ds.map_batches(admit_batch, batch_format="pyarrow").materialize()
