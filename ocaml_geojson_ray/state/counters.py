"""Per-partition counters & lineage (SURVEY.md §2.2 N10).

Two complementary mechanisms, both Ray-idiomatic:

1. **Metric side-channel actor** — a named detached-scope counter actor
   that batch fns increment (cheap: one ``incr.remote`` per batch, not
   per row). Good for live progress on a long job.
2. **Lineage columns + metric rows** — every parsed row carries its
   provenance (url, cand_idx, feat_idx); ``partition_metrics_batch``
   reduces a batch to one metrics row (processed/valid/invalid/
   matched), written to a side parquet — the durable, queryable record.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def get_counter(name: str = "ogr_counters"):
    """Get-or-create the shared counter actor."""
    import ray

    @ray.remote(num_cpus=0)
    class _Counter:
        def __init__(self):
            self.counts: dict = {}

        def incr(self, key: str, n: int = 1):
            self.counts[key] = self.counts.get(key, 0) + n

        def incr_many(self, updates: dict):
            for k, n in updates.items():
                self.counts[k] = self.counts.get(k, 0) + n

        def snapshot(self) -> dict:
            return dict(self.counts)

    try:
        return ray.get_actor(name)
    except ValueError:
        try:
            return _Counter.options(name=name, lifetime="detached").remote()
        except ValueError:
            return ray.get_actor(name)


class CountingStage:
    """Wrap any batch fn with counter side effects (one RPC per batch)."""

    def __init__(self, fn, counter_name: str = "ogr_counters",
                 key_prefix: str = "stage"):
        self.fn = fn
        self.counter = get_counter(counter_name)
        self.prefix = key_prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.fn(batch)
        self.counter.incr_many.remote(
            {f"{self.prefix}.rows_in": len(batch),
             f"{self.prefix}.rows_out": len(out)}
        )
        return out


def partition_metrics_batch(batch: pa.Table) -> pa.Table:
    """Reduce a parsed-features batch to one metrics row (the durable
    lineage record; written to a side parquet)."""
    n = len(batch)
    ok = batch["ok"] if "ok" in batch.column_names else None
    valid = pc.sum(pc.cast(ok, pa.int64())).as_py() if ok is not None and n else 0
    urls = batch["url"] if "url" in batch.column_names else None
    n_pages = len(pc.unique(urls)) if urls is not None else 0
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "n_valid": pa.array([valid or 0], pa.int64()),
            "n_invalid": pa.array([n - (valid or 0)], pa.int64()),
            "n_pages": pa.array([n_pages], pa.int64()),
        }
    )
