"""Small shared runtime helpers."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa


def md5_le64(b: bytes) -> int:
    """THE md5 little-endian 64-bit device: first 8 digest bytes read
    as a little-endian uint64. Load-bearing for oracle parity — the
    SQL mirror is the '0x'||substr(hx,15,2)||...||substr(hx,1,2)
    UBIGINT cast (see SQL_WINNOW_FINGERPRINTS / SQL_HASH_SAMPLE_LANGS)
    — so every engine-side use MUST go through this one definition.
    Encoding of the input stays at the call site (utf-8 words/grams,
    ascii decimal ids, repr fallbacks) because each oracle mirrors its
    own site's string form."""
    return struct.unpack("<Q", hashlib.md5(b).digest()[:8])[0]


def grouped_sum_combine(partial_ds, key_cols, val_col: str, alias: str):
    """Final combine for an already-PARTIALLY-aggregated (key, sum)
    stream: funnel the partials to one task and reduce with
    lexsort + add.reduceat (vectorized C).

    Why: Ray's generic groupby-aggregate pays ~15 µs of Python per
    GROUP (measured: 1.1M groups → 19 s; 235k cell groups → ~3.5 s),
    while the partial tables here are megabytes. Use ONLY when the
    distinct-key table fits one worker — cell/tile/count tables do by
    construction (bounded key space); a corpus-sized key set needs the
    plain groupby (or a k-way tree of this combine).
    """
    key_cols = list(key_cols)

    def combine(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            cols = {c: b[c] for c in key_cols}
            cols[alias] = pa.array([], pa.int64())
            return pa.table(cols)
        keys = [b[c].to_numpy(zero_copy_only=False) for c in key_cols]
        v = b[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort(keys[::-1])
        ks = [k[order] for k in keys]
        v = v[order]
        neq = np.zeros(len(v), dtype=bool)
        neq[0] = True
        for k in ks:
            neq[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(neq)
        sums = np.add.reduceat(v, starts)
        cols = {c: pa.array(k[starts]) for c, k in zip(key_cols, ks)}
        cols[alias] = pa.array(sums.astype(np.int64), pa.int64())
        return pa.table(cols)

    return partial_ds.repartition(1).map_batches(
        combine, batch_format="pyarrow")


def grouped_sums_combine(partial_ds, key_cols, val_cols, aliases):
    """Multi-value-column variant of ``grouped_sum_combine``: one
    funnel task reduces several int64 partial-sum columns with a
    single lexsort + one reduceat per column. Same bounded-key-only
    contract (the distinct-key table must fit one worker)."""
    key_cols = list(key_cols)
    val_cols = list(val_cols)
    aliases = list(aliases)

    def combine(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            cols = {c: b[c] for c in key_cols}
            for a in aliases:
                cols[a] = pa.array([], pa.int64())
            return pa.table(cols)
        keys = [b[c].to_numpy(zero_copy_only=False) for c in key_cols]
        order = np.lexsort(keys[::-1])
        ks = [k[order] for k in keys]
        neq = np.zeros(len(order), dtype=bool)
        neq[0] = True
        for k in ks:
            neq[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(neq)
        cols = {c: pa.array(k[starts]) for c, k in zip(key_cols, ks)}
        for vc, a in zip(val_cols, aliases):
            v = b[vc].to_numpy(zero_copy_only=False)[order]
            cols[a] = pa.array(
                np.add.reduceat(v, starts).astype(np.int64), pa.int64())
        return pa.table(cols)

    return partial_ds.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None)


def split_read(path, columns, nblocks: int):
    """``read_parquet(override_num_blocks=nblocks)`` plus a streaming-
    generator buffer wide enough to actually DELIVER the split.

    Why: the sf test tables are ONE file with ONE row group, so the
    split read is a SINGLE task whose streaming generator emits
    ``nblocks`` blocks — but the generator's default buffer is 2
    blocks (DataContext._max_num_blocks_in_streaming_gen_buffer), so
    input blocks reach the executor ~2 per scheduler wakeup and every
    downstream fused stage collapses to ~4 concurrent tasks regardless
    of cluster width (measured at sf0.1/32: broadcast spatial join
    2.1 s at buffer 2 vs 0.55 s at buffer = split width; the r2→r3
    spatial_join_rect / knn_points 2–2.5× drift was exactly this).
    Raising the buffer restores what `.repartition(n, shuffle=False)`
    gave (every split available at once) without its extra all-to-all
    pass. The buffer is only ever RAISED, capped at 64 blocks — a
    multi-file production read emits ~1 block per task and never
    fills even the default buffer, so this is purely the single-file
    test-input compensation.

    Scoping: a Dataset captures ``DataContext.get_current().copy()`` at
    creation (ray.data.read_api: ``ExecutionPlan(stats, ...copy())``)
    and its operators read ``self.data_context`` at execution — so the
    override is raised only around the ``read_parquet`` call and then
    RESTORED; this read's plan keeps the raised buffer while later
    unrelated datasets in the session see the default again. The
    private attribute is accessed via getattr so a Ray rename degrades
    to a plain (slower, still correct) read instead of crashing."""
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    prev = getattr(ctx, "_max_num_blocks_in_streaming_gen_buffer", None)
    if isinstance(prev, int):
        ctx._max_num_blocks_in_streaming_gen_buffer = max(
            prev, min(int(nblocks), 64))
    try:
        return rd.read_parquet(path, columns=list(columns),
                               override_num_blocks=nblocks)
    finally:
        if isinstance(prev, int):
            ctx._max_num_blocks_in_streaming_gen_buffer = prev


def drop_empty_blocks(ds):
    """Materialize ``ds`` and drop zero-row blocks — METADATA-only, no
    block is fetched to the driver.

    Why: Ray's hash-join finalize emits an empty block with an EMPTY
    SCHEMA for a key-skewed partition that received no rows. Those
    degenerate blocks BYPASS map_batches UDFs (empty blocks skip the
    fn) and poison any later pyarrow hash join with "No match or
    multiple matches for key field ..." once they reach a join
    aggregator. Any dataset that flows out of a join and INTO another
    join must pass through here (measured on a single-key join with
    num_partitions=2: one partition real, one schemaless)."""
    import ray.data as rd

    mat = ds.materialize()
    refs, dropped = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
            else:
                dropped += 1
    if not dropped or not refs:
        return mat
    return rd.from_arrow_refs(refs)


def elastic_concurrency(reserve: int = 2, lo: int = 2) -> int:
    """Fixed actor-pool width derived from the cluster, not a hard cap.

    Round-1 lessons (BASELINE.md tuning notes): an AUTOSCALING pool
    ((1, N)) lagging at few actors strangles the fused upstream chain
    (0.27 scaling efficiency observed), and a fixed pool spanning every
    CPU starves the unfused read/write stages (concurrency=4 on a 4-CPU
    session deadlocks). So: fixed width = cluster CPUs minus a reserve
    for the unfused stages, floored at ``lo``.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return max(lo, ncpu - reserve)


def ray_session_token():
    """Opaque token identifying the CURRENT Ray session — memo keys for
    ObjectRefs must include it, or a shutdown/re-init in the same
    process serves dangling refs from the dead session. Node id alone
    is NOT enough (a driver reconnecting to the same external cluster
    keeps the node id but owns none of the old refs) — include the
    job id, which changes per driver connection."""
    import ray

    try:
        ctx = ray.get_runtime_context()
        return (ctx.get_job_id(), ctx.get_node_id())
    except Exception:
        return None


# per-process ObjectRef resolution cache for STATELESS-TASK stages
# that ship a broadcast ref in their closure (the BruteForceTopK
# pattern, shared): ray.get is plasma-zero-copy but still pays a
# round-trip per call; memoizing per worker process makes repeated
# batches free. Bounded: cleared wholesale past 64 refs (refs from
# finished queries die with them).
_GET_CACHE: dict = {}


def cached_get(ref):
    import ray

    v = _GET_CACHE.get(ref)
    if v is None:
        if len(_GET_CACHE) > 64:
            _GET_CACHE.clear()
        v = ray.get(ref)
        _GET_CACHE[ref] = v
    return v


def vec_mat(col, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from a list<T> / fixed_size_list<T> column via
    Arrow buffer flatten + reshape — NEVER to_pylist (which builds n·d
    Python floats; measured ~20× slower on the embedding tables and
    the dominant cost of the r4 semdedup/kmeans/ANN block fns). The
    only copy is the dtype widen (float32 storage → float64 kernels),
    and that one is a single vectorized astype."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if arr.null_count:
        # the replaced to_pylist path raised loudly on a null vector;
        # a buffer reshape would silently include the null rows'
        # uninitialized slots as fake vectors — keep the loud failure
        raise ValueError("vec_mat: null entries in vector column")
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        vals = arr.values.slice(arr.offset * d, n * d)
        if vals.null_count:
            # ELEMENT-level nulls too: to_numpy would NaN-coerce them,
            # and an int target dtype then turns NaN into INT64_MIN
            # silently — the to_pylist path this replaced raised
            raise ValueError("vec_mat: null elements in vector column")
        flat = vals.to_numpy(zero_copy_only=False)
        return flat.astype(dtype, copy=False).reshape(n, d)
    flat_arr = arr.flatten()
    if flat_arr.null_count:
        raise ValueError("vec_mat: null elements in vector column")
    flat = flat_arr.to_numpy(zero_copy_only=False)
    if n == 0:
        return np.empty((0, 0), dtype)
    widths = np.diff(arr.offsets.to_numpy())
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged list column cannot form a matrix")
    return flat.astype(dtype, copy=False).reshape(n, d)


def sorted_membership(sorted_keys, keys):
    """Vectorized `keys ∈ sorted_keys` via searchsorted — np.isin
    would re-sort the (already sorted) broadcast set on every call."""
    idx = np.searchsorted(sorted_keys, keys)
    idx = np.minimum(idx, len(sorted_keys) - 1) if len(sorted_keys) \
        else np.zeros(len(keys), np.int64)
    if not len(sorted_keys):
        return np.zeros(len(keys), dtype=bool)
    return sorted_keys[idx] == keys


def fib_bucket(keys, n_buckets: int):
    """THE Fibonacci-hash bucket device for the bucketed-shuffle
    pattern (user_paths and the round-5 wave queries): spread
    sequential int64 ids evenly over ``n_buckets`` groups via the
    golden-ratio multiplier. A parity/physical device like md5_le64 —
    never inline a copy (queries that must co-locate the SAME key,
    e.g. the totals_audit two-table reconcile, depend on every call
    site bucketing identically)."""
    import numpy as np

    return ((np.asarray(keys).astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(n_buckets)).astype(np.int64)


def block_rank_offsets(mat_ds, key_cols, val_col=None):
    """THE distributed row_number / prefix-sum device: global
    0-based offsets for the blocks of a SORTED, MATERIALIZED
    dataset — row offsets by default, or exclusive PREFIX-SUM
    offsets of ``val_col`` when given (the PPS-sampling form).

    Contract: ``mat_ds`` is the materialized output of
    ``.sort(key_cols)`` with a UNIQUE composite key (no key can span
    a block boundary, so a block's first key identifies it). Ray's
    sort range-partitions, so block key ranges are disjoint and the
    per-block row counts fold into exact global offsets with one
    O(#blocks) driver pass — rows never leave the workers.

    Returns ``(offsets, total)`` where ``offsets`` maps each
    non-empty block's first-key tuple → its global starting offset.
    Broadcast it (``ray.put``) and look it up inside a
    ``batch_size=None`` ``map_batches`` over the SAME materialized
    dataset (one batch == one block in Ray 2.49); a batch's global
    rank vector is then ``offset + arange(len(batch))``.
    """
    import ray

    key_cols = list(key_cols)

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            # empty blocks can arrive SCHEMALESS (zero columns — a
            # map_groups/Ray behavior); emit a zero-row marker that
            # the driver filters before concat
            return pa.table({"__n": pa.array([], pa.int64())})
        cols = {c: b[c].slice(0, 1) for c in key_cols}
        n = (int(b[val_col].to_numpy(zero_copy_only=False).sum())
             if val_col else b.num_rows)
        cols["__n"] = pa.array([n], pa.int64())
        return pa.table(cols)

    tabs = [t for t in ray.get(
        mat_ds.map_batches(summary, batch_format="pyarrow",
                           batch_size=None).to_arrow_refs())
        if t.num_rows]
    recs = []
    if tabs:
        rows = pa.concat_tables(tabs)
        recs = sorted(
            (tuple(rows[c][i].as_py() for c in key_cols),
             int(rows["__n"][i].as_py()))
            for i in range(rows.num_rows))
    offsets, acc = {}, 0
    for key, n in recs:
        offsets[key] = acc
        acc += n
    return offsets, acc
