"""Distributed as-of join (SURVEY.md §2.2 relational breadth).

For every left row, the latest right row with right_ts <= left_ts and
the same key. Physical plan for the BOTH-SIDES-LARGE case (the 100 TB
shape): tag each side, union, ONE hash shuffle on the key, then a
vectorized merge-asof inside each group (sorted right timestamps +
searchsorted). Nothing is read on the driver and nothing is broadcast.

The broadcast small-side kernel (per-key sorted date arrays shipped via
ray.put, no shuffle at all) remains the right plan when the right side
is lookup-sized; this module is the shuffle path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join_latest(left_ds, right_ds, left_key: str, left_ts: str,
                     right_key: str, right_ts: str, left_id: str):
    """→ Dataset(left_id, last_right_us, has_right): per left row, the
    latest right timestamp <= the left timestamp for the same key.

    Both inputs shuffle once on the key; per-key volumes bound each
    group (the same partitioning contract as session windows)."""

    def tag_left(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b[left_key].cast(pa.int64()),
            "ts_us": b[left_ts].cast(pa.int64()),
            "row_id": b[left_id].cast(pa.int64()),
            "is_left": pa.array(np.ones(len(b), dtype=np.int8)),
        })

    def tag_right(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": b[right_key].cast(pa.int64()),
            "ts_us": b[right_ts].cast(pa.int64()),
            "row_id": pa.array(np.full(len(b), -1, dtype=np.int64)),
            "is_left": pa.array(np.zeros(len(b), dtype=np.int8)),
        })

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    # Coalesce before the sort-backed groupby: Ray's sort PUSH phase
    # costs per input block (measured at sf0.1/32: 128 blocks → 3.0 s,
    # 16 blocks → 0.65 s for the identical 250k-row sort). The tagged
    # rows are 26 bytes each, so a handful of blocks is plenty; a real
    # 100-TB input arrives in row-group-sized blocks already far below
    # this per-block overhead regime.
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    both = both.repartition(max(4, ncpu // 4), shuffle=False)

    # Arrow-native group merge: map_groups(batch_format="pyarrow")
    # hands each group as an Arrow table — numpy views, no per-group
    # pandas DataFrame construction (measured ~0.3-0.5 ms/group saved)
    def merge(g: pa.Table) -> pa.Table:
        is_left = g["is_left"].to_numpy(zero_copy_only=False) == 1
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        lts = ts[is_left]
        rid = g["row_id"].to_numpy(zero_copy_only=False)[is_left]
        rts = np.sort(ts[~is_left])
        if len(rts):
            pos = np.searchsorted(rts, lts, side="right") - 1
            hit = pos >= 0
            last = np.where(hit, rts[np.clip(pos, 0, None)], 0)
        else:
            hit = np.zeros(len(lts), dtype=bool)
            last = np.zeros(len(lts), dtype=np.int64)
        return pa.table({
            left_id: pa.array(rid, pa.int64()),
            "last_right_us": pa.array(last.astype(np.int64), pa.int64()),
            "has_right": pa.array(hit, pa.bool_()),
        })

    return both.groupby("k").map_groups(merge, batch_format="pyarrow")
