"""Skew handling (SURVEY.md §2.2 N9): hot-cell detection, mega-cell
splitting, salted group keys.

At 100 TB the cell-key distribution is zipfian (dense urban polygons →
mega-cells). Three explicit tools:

1. ``detect_hot_cells`` — a cheap pre-pass: per-batch partial counts →
   tiny groupby → cells above threshold.
2. ``split_hot_cells_batch`` — rows in hot cells are re-keyed to child
   cells at ``res + split_levels`` (the spatial analog of key
   splitting; downstream consumers treat parent and child cells
   uniformly since ids carry their resolution).
3. ``add_salt_column`` — ``salt = hash(row) % k`` for salted
   groupby-aggregate: aggregate on (key, salt) first (k-way fan-out of
   the hot key), then re-aggregate on key. Correct for any
   commutative-associative aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import cells as C


def partial_cell_counts(batch: pa.Table, cell_col: str = "cell") -> pa.Table:
    t = batch.group_by([cell_col]).aggregate([(cell_col, "count")])
    return t.rename_columns([cell_col, "partial_count"])


def detect_hot_cells(ds, threshold: int, cell_col: str = "cell") -> dict:
    """→ {cell: count} for cells above threshold. Pre-aggregated per
    batch so the shuffle moves one row per (cell, block)."""
    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial_cell_counts, batch_format="pyarrow",
                       fn_kwargs={"cell_col": cell_col})
        .groupby(cell_col)
        .aggregate(Sum("partial_count", alias_name="n"))
        # threshold applied IN the dataset: only the hot set (small by
        # definition) reaches the driver, not every distinct cell
        .filter(expr=f"n >= {int(threshold)}")
    )
    hot = {}
    for row in counts.iter_rows():
        hot[row[cell_col]] = row["n"]
    return hot


def split_hot_cells_batch(batch: pa.Table, hot_cells: frozenset,
                          split_levels: int = 2, cell_col: str = "cell",
                          lng_col: str = "lng", lat_col: str = "lat") -> pa.Table:
    """Re-key rows in hot cells to child cells (res + split_levels)."""
    cell = batch[cell_col].to_numpy(zero_copy_only=False).copy()
    lng = batch[lng_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    is_hot = np.isin(cell, np.fromiter(hot_cells, dtype=np.int64, count=len(hot_cells))) \
        if hot_cells else np.zeros(len(cell), dtype=bool)
    if is_hot.any():
        res = int(C.cell_res(cell[is_hot][0]))
        cell[is_hot] = C.latlng_to_cell(lng[is_hot], lat[is_hot],
                                        min(C.MAX_RES, res + split_levels))
    i = batch.schema.get_field_index(cell_col)
    return batch.set_column(i, cell_col, pa.array(cell, pa.int64()))


def add_salt_column(batch: pa.Table, k: int = 16,
                    salt_col: str = "salt") -> pa.Table:
    """Deterministic per-row salt (row-content hash mod k) appended for
    salted shuffles."""
    # cheap deterministic row hash: combine the first int64-able column
    # with the row index within batch via splitmix64
    n = len(batch)
    base = np.arange(n, dtype=np.uint64)
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_integer(col.type):
            base = base + col.to_numpy(zero_copy_only=False).astype(np.uint64)
            break
    z = (base + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return batch.append_column(
        salt_col, pa.array((z % np.uint64(k)).astype(np.int64), pa.int64())
    )


def salted_grouped_sum(ds, key_cols, value_col: str, k: int = 16,
                       alias: str | None = None):
    """Two-phase salted aggregate: sum on (key, salt) then on key —
    bounds any single reducer's input at 1/k of the hot key."""
    from ray.data.aggregate import Sum

    alias = alias or f"sum_{value_col}"
    key_cols = list(key_cols)
    salted = ds.map_batches(add_salt_column, batch_format="pyarrow",
                            fn_kwargs={"k": k})
    phase1 = salted.groupby(key_cols + ["salt"]).aggregate(
        Sum(value_col, alias_name="partial")
    )
    return phase1.groupby(key_cols).aggregate(Sum("partial", alias_name=alias))
