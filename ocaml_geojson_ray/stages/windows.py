"""Event-time windows over the ordered, partitioned events log
(ray_guide 'Streaming-shaped workloads'): tumbling, sliding, session.

Ray Data has no watermarks; the contract here is batch event-time
windowing: partition by key, order by ts WITHIN each group
(``groupby(key).map_groups`` gives us the whole group; sorting inside
is cheap), window with pandas. Documented ordering assumption: results
depend only on (key, ts) pairs, never on block order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


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
    """
    gap_us = gap_s * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].astype("int64").to_numpy()
        brk = np.zeros(len(ts), dtype=np.int64)
        if len(ts) > 1:
            brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = brk.cumsum()
        out = pd.DataFrame({key: g[key].to_numpy(), "session_id": sid, "ts": ts})
        res = out.groupby("session_id").agg(
            n_events=("ts", "size"), start_us=("ts", "min"), end_us=("ts", "max")
        ).reset_index()
        res[key] = g[key].iloc[0]
        return res[[key, "session_id", "n_events", "start_us", "end_us"]]

    return ds.groupby(key).map_groups(sessions, batch_format="pandas")


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
