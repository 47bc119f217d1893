"""Connected components over near-duplicate pairs → dedup clusters.

The capstone of the dedup family: every pair generator in this repo
(MinHash-LSH, n-gram Jaccard, SimHash, embedding-LSH) yields EDGES
between near-duplicate documents, but deduplicating a corpus needs the
transitive closure — duplicate CLUSTERS, each labeled by its minimum
doc_id, so one canonical survivor per cluster can be kept. This module
computes components with the standard "hash-to-min" label-propagation
shape from the MapReduce CC literature (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds", ICDE 2013;
Kiveris et al., SoCC 2014): labels only ever DECREASE, each round
propagates the current minimum one hop and then pointer-jumps
(lab ← lab[lab]), so convergence is O(log n) rounds even on chains.

Physical plans (adaptive dispatch on MEASURED edge count — the
SCALE.md round-3 rule, same as the MinHash pairing/verify plans):

- FUNNEL (edges ≤ ``funnel_rows``): the whole edge set goes to one
  vectorized numpy task (`components_local`). This is also what a
  production 100-TB run uses in practice: the near-dup edge set after
  LSH is o(corpus) — a few int64 pairs per duplicate doc — and a
  worker comfortably reduces 100M+ edges.
- DISTRIBUTED (above threshold): labels live in a Dataset, each round
  is hash-join(edges ⋈ labels on v) → map-side partial min per u →
  groupby(u).min → pointer-jump join. Each round shuffles only
  (node, label) int64 pairs, never adjacency lists. Convergence is
  detected by the label SUM: labels are monotone non-increasing ints,
  so an unchanged sum IS a fixed point (no hash needed). Join fixed
  costs (~1 s/round in this sandbox, SCALE.md) make the funnel plan
  strictly better below tens of millions of edges.

Both plans produce identical output; equality is pinned by tests on
random graphs (tests/test_cc.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Above this many edges the distributed rounds engage. Near-dup edge
# sets are tiny relative to the corpus, so the funnel is the common
# case; the constant is a per-worker memory bound (~32 MB of int64
# pairs per 2M edges), not a cluster-width cap.
FUNNEL_EDGE_ROWS = 2_000_000


def components_local(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact connected components of the undirected graph {(u_i, v_i)}.

    Returns (nodes, labels): ``nodes`` sorted ascending, ``labels[i]``
    = the minimum node id in nodes[i]'s component. Pure numpy:
    min-propagation over the edge arrays (np.minimum.at) alternating
    with full pointer-jumping, O((E+V) log V) total work.
    """
    both = np.concatenate([np.asarray(u, np.int64), np.asarray(v, np.int64)])
    nodes, inv = np.unique(both, return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        prev = lab
        nxt = lab.copy()
        # one hop of min-propagation in both directions
        np.minimum.at(nxt, ui, lab[vi])
        np.minimum.at(nxt, vi, lab[ui])
        lab = nxt
        while True:  # pointer jumping: lab ← lab[lab] to a fixed point
            j = lab[lab]
            if np.array_equal(j, lab):
                break
            lab = j
        if np.array_equal(lab, prev):
            break
    # label indices are positions in the SORTED nodes array, so the
    # min index is the min node id
    return nodes, nodes[lab]


def _funnel_components(edges_ds, with_sizes: bool):
    """One-task plan: funnel edges, run the numpy kernel, emit
    (doc_id, cluster_id[, cluster_size]) for every node in an edge."""

    def run(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            cols = {"doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64())}
            if with_sizes:
                cols["cluster_size"] = pa.array([], pa.int64())
            return pa.table(cols)
        nodes, labels = components_local(
            b["u"].to_numpy(), b["v"].to_numpy())
        cols = {"doc_id": pa.array(nodes, pa.int64()),
                "cluster_id": pa.array(labels, pa.int64())}
        if with_sizes:
            uniq, inv2, cnt = np.unique(
                labels, return_inverse=True, return_counts=True)
            cols["cluster_size"] = pa.array(cnt[inv2].astype(np.int64),
                                            pa.int64())
        return pa.table(cols)

    return edges_ds.repartition(1).map_batches(run, batch_format="pyarrow")


def _partial_min(key: str, val: str):
    """Map-side combiner: per-batch min of ``val`` per ``key`` —
    shrinks the post-join stream before the groupby (the repo's
    standard partial-aggregate move; Ray's aggregate costs ~15 µs of
    Python per GROUP, so feed it one row per (block, key))."""

    def fn(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             val: pa.array([], pa.int64())})
        k = b[key].to_numpy()
        x = b[val].to_numpy()
        order = np.argsort(k, kind="stable")
        k, x = k[order], x[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        mins = np.minimum.reduceat(x, starts)
        return pa.table({key: pa.array(k[starts], pa.int64()),
                         val: pa.array(mins, pa.int64())})

    return fn


def _distributed_components(edges_ds, num_partitions: int, max_rounds: int = 64):
    """Hash-to-min rounds on Datasets. Shuffles only (int64, int64)
    tables; the edge set is materialized once and reused every round."""
    import ray.data.aggregate as agg

    def symmetrize(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy()
        v = b["v"].to_numpy()
        return pa.table({
            "u": pa.array(np.concatenate([u, v]), pa.int64()),
            "v": pa.array(np.concatenate([v, u]), pa.int64()),
        })

    sym = edges_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        u = np.unique(b["u"].to_numpy())
        return pa.table({"u": pa.array(u, pa.int64()),
                         "lab": pa.array(u, pa.int64())})

    from ..util import drop_empty_blocks

    labels = drop_empty_blocks(
        sym.map_batches(init_labels, batch_format="pyarrow")
        .groupby("u").aggregate(agg.Min("lab", alias_name="lab"))
    )
    prev_sum = labels.sum("lab")

    for _ in range(max_rounds):
        # hop: lab'(u) = min(lab(u), min_{(u,v)∈E} lab(v)).
        # Rename-before-join keeps key names identical on both sides
        # (no suffix machinery, no collisions).
        lab_of_v = labels.map_batches(
            lambda b: b.rename_columns(["v", "lab_v"]),
            batch_format="pyarrow")
        hop = sym.join(lab_of_v, join_type="inner", on=("v",),
                       num_partitions=num_partitions)
        cand = hop.map_batches(
            lambda b: pa.table({"u": b["u"], "lab": b["lab_v"]}),
            batch_format="pyarrow").union(labels)
        labels = drop_empty_blocks(
            cand.map_batches(_partial_min("u", "lab"), batch_format="pyarrow")
            .groupby("u").aggregate(agg.Min("lab", alias_name="lab"))
        )
        # pointer jump: lab''(u) = lab(lab(u)). Every label value IS a
        # node (labels start as node ids and only take mins of node
        # ids), so an inner join is total.
        lab_of_lab = labels.map_batches(
            lambda b: b.rename_columns(["lab", "lab_j"]),
            batch_format="pyarrow")
        jump = labels.join(lab_of_lab, join_type="inner", on=("lab",),
                           num_partitions=num_partitions)
        # jump output feeds next round's hop join — sanitize (metadata
        # scan on an already-needed materialize, see util)
        labels = drop_empty_blocks(jump.map_batches(
            lambda b: pa.table({"u": b["u"], "lab": b["lab_j"]}),
            batch_format="pyarrow"))
        s = labels.sum("lab")
        if s == prev_sum:  # monotone ⇒ stationary sum = fixed point
            break
        prev_sum = s
    else:
        raise RuntimeError("connected components did not converge")

    return labels.map_batches(
        lambda b: b.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow")


def dedup_clusters(pairs_ds, a_col: str = "a_id", b_col: str = "b_id",
                   with_sizes: bool = True,
                   funnel_rows: int = FUNNEL_EDGE_ROWS):
    """(doc_id, cluster_id[, cluster_size]) for every doc in a pair;
    cluster_id = min doc_id of the component. Adaptive plan dispatch
    on the measured edge count (see module docstring)."""
    import ray

    import ray.data as rd

    edges = pairs_ds.map_batches(
        lambda b, a=a_col, bb=b_col: pa.table(
            {"u": b[a].cast(pa.int64()), "v": b[bb].cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    n_edges = edges.count()
    if n_edges == 0:
        # typed empty: Ray strips schemas from empty blocks (they
        # bypass map UDFs), so build the empty result directly
        cols = {"doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64())}
        if with_sizes:
            cols["cluster_size"] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(cols))
    if n_edges <= funnel_rows:
        return _funnel_components(edges, with_sizes=with_sizes)

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    comp = _distributed_components(edges, num_partitions=max(2, ncpu // 4))
    if not with_sizes:
        return comp
    import ray.data.aggregate as agg

    from ..util import drop_empty_blocks

    comp = drop_empty_blocks(comp)
    sizes = drop_empty_blocks(
        comp.groupby("cluster_id").aggregate(
            agg.Count(alias_name="cluster_size")))
    return comp.join(sizes, join_type="inner", on=("cluster_id",),
                     num_partitions=max(2, ncpu // 4))
