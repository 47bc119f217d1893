"""ANALYZE-style catalog statistics with a size-gated exact-NDV plan.

Per column: row count, null count, min/max (canonical VARCHAR so the
output schema is uniform across column types) and EXACT distinct
count. Two plans, chosen by MEASURING the per-batch unique-value
partial volume first (the pagerank/dedup house rule: gate on a counted
size, never assume):

- **funnel** (small Σ batch-uniques): every (col, val) unique partial
  plus the per-batch count/min/max rows flow through ``repartition(1)``
  into ONE combine task. o(input) only when NDV is low — which the
  gate has just verified.
- **grouped** (wide NDV): the (col, val) pairs are deduplicated by a
  DISTRIBUTED ``groupby(["col", "val"]).count()`` shuffle instead;
  only per-block NDV tallies (≤ n_cols rows per block) and the
  per-batch count/min/max rows reach the single-task funnel. The
  funnel input is o(n_cols · n_blocks) regardless of NDV — enforced,
  not just documented: the grouped-plan combine raises if any raw
  value row reaches it.

The gate pass re-executes the (column-pruned) input for the chosen
plan rather than pinning the partials with ``materialize()`` — the
semdedup/pagerank rule: at cluster scale re-reading pruned parquet is
cheaper than holding an o(input·uniqueness) block set in the object
store for the pipeline's whole lifetime.
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Above this many partial rows (Σ per-batch uniques across columns),
# the funnel's single combine task would receive a with-NDV-unbounded
# table — flip to the distributed grouped plan. ~2M short strings is
# tens of MBs in one task: comfortably inside a worker heap, far below
# anything that should transit one task at 100 TB.
FUNNEL_ROWS_DEFAULT = 2_000_000

SeriesFn = Callable[[pa.Table], dict[str, tuple[np.ndarray, int]]]


def _partial_factory(series_fn: SeriesFn, numeric_cols: frozenset[str]):
    """Per-batch partial: for each column one stats row
    (n, n_null, batch min/max, ndv=0, val=NULL) plus one row per
    DISTINCT value in the batch (val set, everything else 0/NULL)."""

    def partial(b: pa.Table) -> pa.Table:
        cols: list[str] = []
        vals: list[str | None] = []
        ns: list[int] = []
        nnulls: list[int] = []
        mins: list[str | None] = []
        maxs: list[str | None] = []
        for name, (v, n_null) in series_fn(b).items():
            v = v.astype(str) if len(v) else np.empty(0, dtype=str)
            u = np.unique(v)
            if len(u) and name in numeric_cols:
                key = u.astype(np.int64)
                mn, mx = str(key.min()), str(key.max())
            elif len(u):
                mn, mx = str(u[0]), str(u[-1])  # np.unique is sorted
            else:
                mn = mx = None  # all-NULL in this batch
            cols.append(name)
            vals.append(None)
            ns.append(len(v) + n_null)
            nnulls.append(n_null)
            mins.append(mn)
            maxs.append(mx)
            cols.extend([name] * len(u))
            vals.extend(u.tolist())
            ns.extend([0] * len(u))
            nnulls.extend([0] * len(u))
            mins.extend([None] * len(u))
            maxs.extend([None] * len(u))
        return pa.table({
            "col": pa.array(cols, pa.string()),
            "val": pa.array(vals, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nnulls, pa.int64()),
            "min_v": pa.array(mins, pa.string()),
            "max_v": pa.array(maxs, pa.string()),
            "ndv": pa.array([0] * len(cols), pa.int64()),
        })

    return partial


def _stats_only_factory(series_fn: SeriesFn, numeric_cols: frozenset[str]):
    """Per-batch STATS rows only (n, n_null, min/max; no unique-value
    rows) — the grouped plan's stats branch needs exactly these, and
    computing them without the per-batch ``np.unique`` makes the
    branch O(n) instead of O(n log n). min/max semantics are identical
    to the full partial's: numeric columns compare as int64, the rest
    lexically on the canonical strings (np.unique's sortedness gave
    u[0]/u[-1] — the same values as direct min/max)."""

    def stats_only(b: pa.Table) -> pa.Table:
        cols: list[str] = []
        ns: list[int] = []
        nnulls: list[int] = []
        mins: list[str | None] = []
        maxs: list[str | None] = []
        for name, (v, n_null) in series_fn(b).items():
            if len(v) and name in numeric_cols:
                key = v.astype(np.int64)
                mn, mx = str(key.min()), str(key.max())
            elif len(v):
                # np.min has no unicode ufunc loop; Arrow's min_max is
                # the vectorized lexicographic reduction
                mm = pc.min_max(pa.array(v.astype(str)))
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            else:
                mn = mx = None  # all-NULL in this batch
            cols.append(name)
            ns.append(len(v) + n_null)
            nnulls.append(n_null)
            mins.append(mn)
            maxs.append(mx)
        k = len(cols)
        return pa.table({
            "col": pa.array(cols, pa.string()),
            "val": pa.array([None] * k, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nnulls, pa.int64()),
            "min_v": pa.array(mins, pa.string()),
            "max_v": pa.array(maxs, pa.string()),
            "ndv": pa.array([0] * k, pa.int64()),
        })

    return stats_only


def _reduce_stats(b: pa.Table, numeric_cols: frozenset[str],
                  count_vals: bool) -> pa.Table:
    """Single-task final combine over the funneled partial rows.

    count_vals=True (funnel plan): NDV = count of unique non-null
    ``val`` rows per column. count_vals=False (grouped plan): NDV =
    Σ ``ndv`` tallies, and any surviving raw value row is a plan
    violation — raise, don't silently absorb it."""
    col = np.asarray(b["col"].to_pylist(), dtype=object)
    val = b["val"]
    val_isnull = np.asarray(pc.is_null(val).to_pylist(), dtype=bool)
    if not count_vals and not val_isnull.all():
        raise RuntimeError(
            "grouped table-stats plan: raw value rows reached the "
            "single-task funnel — the NDV bound contract is broken")
    val_obj = np.asarray(val.to_pylist(), dtype=object)
    n = b["n"].to_numpy()
    nn = b["n_null"].to_numpy()
    ndv_in = b["ndv"].to_numpy()
    min_obj = np.asarray(b["min_v"].to_pylist(), dtype=object)
    max_obj = np.asarray(b["max_v"].to_pylist(), dtype=object)
    out = []
    for c in sorted(set(col.tolist())):
        m = col == c
        stats_m = m & val_isnull
        if count_vals:
            pair_vals = val_obj[m & ~val_isnull]
            u = np.unique(pair_vals.astype(str)) if len(pair_vals) \
                else np.empty(0, dtype=str)
            ndv = len(u)
        else:
            ndv = int(ndv_in[m].sum())
        # reduce per-batch min/max partials (NULL = all-NULL batch)
        cand_mn = [x for x in min_obj[stats_m] if x is not None]
        cand_mx = [x for x in max_obj[stats_m] if x is not None]
        if not cand_mn:
            mn = mx = None  # all-NULL column: ANSI min/max are NULL
        elif c in numeric_cols:
            mn = str(min(int(x) for x in cand_mn))
            mx = str(max(int(x) for x in cand_mx))
        else:
            mn, mx = min(cand_mn), max(cand_mx)
        out.append((c, int(n[stats_m].sum()), int(nn[stats_m].sum()),
                    mn, mx, ndv))
    return pa.table({
        "col": pa.array([r[0] for r in out], pa.string()),
        "n": pa.array([r[1] for r in out], pa.int64()),
        "n_null": pa.array([r[2] for r in out], pa.int64()),
        "min_v": pa.array([r[3] for r in out], pa.string()),
        "max_v": pa.array([r[4] for r in out], pa.string()),
        "ndv": pa.array([r[5] for r in out], pa.int64()),
    })


def analyze_table(ds_fn, series_fn: SeriesFn, numeric_cols,
                  n_cols: int | None = None,
                  funnel_rows: int = FUNNEL_ROWS_DEFAULT):
    """ANALYZE over ``ds_fn()`` (a zero-arg callable returning the
    pruned input Dataset — called once for the gate pass and once for
    the chosen plan, per the reread-over-materialize rule).

    series_fn: batch -> {col_name: (canonical-string numpy array of
    NON-NULL values, null_count)}. numeric_cols order min/max
    numerically (int64); the rest lexically. Pass ``n_cols`` (the
    number of series the fn emits) to enable the free gate tier:
    partial rows = Σ batch-uniques (≤ rows × n_cols) + n_batches ×
    n_cols stats rows (≤ rows × n_cols, since every non-empty batch
    has ≥ 1 row), so 2 × rows × n_cols is a PROVEN upper bound — and
    ``Dataset.count()`` on a fresh parquet read is metadata-only. A
    small table therefore picks the funnel plan with ZERO extra
    passes; only a table that could actually breach the bound pays
    the counting pass.
    """
    numeric = frozenset(numeric_cols)
    partial = _partial_factory(series_fn, numeric)

    if n_cols is not None and 2 * ds_fn().count() * n_cols <= funnel_rows:
        n_partial = 0  # provably under the bound — skip the gate pass
    else:
        n_partial = ds_fn().map_batches(
            partial, batch_format="pyarrow").count()
    parts = ds_fn().map_batches(partial, batch_format="pyarrow")
    if n_partial <= funnel_rows:
        return parts.repartition(1).map_batches(
            lambda b: _reduce_stats(b, numeric, count_vals=True),
            batch_format="pyarrow", batch_size=None)

    # grouped (wide-NDV) plan
    def take_pairs(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b["val"])).select(["col", "val"])

    def ndv_tally(b: pa.Table) -> pa.Table:
        # input: one row per surviving DISTINCT (col, val) pair in this
        # block of the groupby output → per-col tallies, ≤ n_cols rows
        col = np.asarray(b["col"].to_pylist(), dtype=object)
        uniq, counts = np.unique(col.astype(str), return_counts=True)
        k = len(uniq)
        return pa.table({
            "col": pa.array(uniq.tolist(), pa.string()),
            "val": pa.array([None] * k, pa.string()),
            "n": pa.array([0] * k, pa.int64()),
            "n_null": pa.array([0] * k, pa.int64()),
            "min_v": pa.array([None] * k, pa.string()),
            "max_v": pa.array([None] * k, pa.string()),
            "ndv": pa.array(counts.astype(np.int64)),
        })

    # min/max/null stats rows are NOT derivable from the grouped pairs
    # (they carry per-batch extremes/counts), so they ride the funnel —
    # n_cols rows per batch, bounded by construction. The branch runs
    # its own SLIM partial (no per-batch np.unique) rather than
    # filtering the full partial: in the wide-NDV regime the unique
    # pass is the dominant per-batch cost and would otherwise execute
    # a third time here (gate count + pairs branch + this).
    stats = ds_fn().map_batches(
        _stats_only_factory(series_fn, numeric), batch_format="pyarrow")
    ndv_parts = (
        parts.map_batches(take_pairs, batch_format="pyarrow")
        .groupby(["col", "val"]).count()
        .map_batches(ndv_tally, batch_format="pyarrow")
    )
    return stats.union(ndv_parts).repartition(1).map_batches(
        lambda b: _reduce_stats(b, numeric, count_vals=False),
        batch_format="pyarrow", batch_size=None)
