"""Event-time windows over the ordered, partitioned events log
(ray_guide 'Streaming-shaped workloads'): tumbling, sliding, session.

Ray Data has no watermarks; the contract here is batch event-time
windowing: partition by key, order by ts WITHIN each group
(``groupby(key).map_groups`` gives us the whole group; sorting inside
is cheap), window with numpy over zero-copy Arrow groups. Documented
ordering assumption: results depend only on (key, ts) pairs, never on
block order.
"""

from __future__ import annotations

import numpy as np


def tumbling(ds, key: str, ts_col: str, width_s: int, agg_col: str):
    """Tumbling windows via bucket groupby (no map_groups needed)."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy()
        win = ts // (width_s * 1_000_000)
        return batch.append_column("window", pa.array(win, pa.int64()))

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby([key, "window"])
        .aggregate(Count(alias_name="n"), Sum(agg_col, alias_name=f"sum_{agg_col}"))
    )


def session_windows(ds, key: str, ts_col: str, gap_s: int):
    """Session windows: a gap > ``gap_s`` starts a new session.

    → one row per (key, session_id) with n_events, start/end ts (µs).
    SQL-mirrorable: cumulative sum of gap-break markers over
    lag(ts) per key.

    Physical shape (same contract as running_totals / event_gaps):
    ONE key shuffle, then each group is a zero-copy Arrow table —
    np.sort + diff finds the breaks, and per-session count/min/max
    fall out of the break indices directly (ts is sorted, so a
    session's start/end ARE its boundary elements; no inner groupby,
    no pandas). Session stats are invariant to tie order among equal
    timestamps, so a plain sort is deterministic enough.
    """
    import pyarrow as pa

    gap_us = gap_s * 1_000_000

    def pre(b: pa.Table) -> pa.Table:
        return pa.table({key: b[key], "ts_us": b[ts_col].cast(pa.int64())})

    def sessions(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts_us"].to_numpy(zero_copy_only=False))
        brk = np.empty(len(ts), dtype=bool)
        brk[0] = True
        brk[1:] = np.diff(ts) > gap_us
        starts = np.flatnonzero(brk)
        bounds = np.append(starts, len(ts))
        n = len(starts)
        return pa.table({
            key: pa.array(np.full(n, g[key][0].as_py()), g.schema.field(key).type),
            "session_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "n_events": pa.array(np.diff(bounds), pa.int64()),
            "start_us": pa.array(ts[starts], pa.int64()),
            "end_us": pa.array(ts[bounds[1:] - 1], pa.int64()),
        })

    return ds.map_batches(pre, batch_format="pyarrow") \
        .groupby(key).map_groups(sessions, batch_format="pyarrow")


def sliding(ds, key: str, ts_col: str, width_s: int, slide_s: int, agg_col: str):
    """Sliding windows by explode-to-overlapping-buckets (each event
    lands in width/slide buckets) then groupby — shuffle volume scales
    with the overlap factor, stated explicitly."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    k = width_s // slide_s
    slide_us = slide_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy()
        vals = batch[agg_col].to_numpy().astype(np.float64)
        n = len(ts)
        base = ts // slide_us
        # (k, n) window grid, flattened — no per-row Python loop
        w = (base[None, :] - np.arange(k, dtype=np.int64)[:, None]).ravel()
        idx = np.tile(np.arange(n, dtype=np.int64), k)
        out = batch.select([key]).take(pa.array(idx))
        out = out.append_column(
            "window_start", pa.array(w * slide_us, pa.int64())
        )
        return out.append_column(
            agg_col, pa.array(np.tile(vals, k), pa.float64())
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n"), Sum(agg_col, alias_name=f"sum_{agg_col}"))
    )
