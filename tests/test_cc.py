"""Connected components (stages/cc.py): numpy kernel vs a BFS
reference on structured + random graphs, and the distributed
hash-to-min plan pinned equal to the funnel plan."""

from __future__ import annotations

import numpy as np
import pytest

from ocaml_geojson_ray.stages.cc import (
    components_local,
    dedup_clusters,
)


def bfs_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: min node id per component, by plain BFS."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label: dict[int, int] = {}
    for start in adj:
        if start in label:
            continue
        seen = {start}
        frontier = [start]
        while frontier:
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        nxt.append(y)
            frontier = nxt
        m = min(seen)
        for x in seen:
            label[x] = m
    return label


def run_local(edges):
    u = np.array([e[0] for e in edges], dtype=np.int64)
    v = np.array([e[1] for e in edges], dtype=np.int64)
    nodes, labels = components_local(u, v)
    return dict(zip(nodes.tolist(), labels.tolist()))


@pytest.mark.parametrize("edges", [
    [(1, 2)],
    [(1, 2), (2, 3), (3, 4)],                      # chain
    [(5, 1), (5, 2), (5, 3)],                      # star, center not min
    [(1, 2), (2, 3), (1, 3), (10, 11)],            # clique + pair
    [(7, 7)],                                      # self-loop
    [(3, 1), (1, 3), (3, 1)],                      # duplicates, both dirs
    [(100, 2), (99, 3), (2, 3)],                   # merge via low ids
])
def test_local_structured(edges):
    assert run_local(edges) == bfs_components(edges)


def test_local_long_chain():
    # pathological diameter: pointer jumping keeps rounds logarithmic
    n = 4096
    edges = [(i, i + 1) for i in range(n)]
    got = run_local(edges)
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_local_random_graphs():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n_nodes = int(rng.integers(2, 60))
        n_edges = int(rng.integers(1, 120))
        u = rng.integers(0, n_nodes, n_edges)
        v = rng.integers(0, n_nodes, n_edges)
        edges = list(zip(u.tolist(), v.tolist()))
        assert run_local(edges) == bfs_components(edges)


def _pairs_ds(edges):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "a_id": pa.array([e[0] for e in edges], pa.int64()),
        "b_id": pa.array([e[1] for e in edges], pa.int64()),
    }))


def test_funnel_plan_with_sizes(ray_session):
    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
    out = dedup_clusters(_pairs_ds(edges)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3, 10, 11, 20]
    assert out["cluster_id"].tolist() == [1, 1, 1, 10, 10, 20]
    assert out["cluster_size"].tolist() == [3, 3, 3, 2, 2, 1]


def test_distributed_equals_funnel(ray_session):
    rng = np.random.default_rng(11)
    u = rng.integers(0, 400, 600)
    v = rng.integers(0, 400, 600)
    edges = list(zip(u.tolist(), v.tolist()))
    ds = _pairs_ds(edges)
    funnel = dedup_clusters(ds, with_sizes=False).to_pandas()
    dist = dedup_clusters(ds, with_sizes=False, funnel_rows=0).to_pandas()
    f = funnel.sort_values("doc_id").reset_index(drop=True)
    d = dist.sort_values("doc_id").reset_index(drop=True)
    assert f.equals(d)
    # and both match the BFS reference
    ref = bfs_components(edges)
    assert dict(zip(f["doc_id"], f["cluster_id"])) == ref


def test_distributed_chain_converges(ray_session):
    # distributed rounds are logarithmic too (hop + jump): a 64-node
    # chain must converge well inside the round guard
    edges = [(i, i + 1) for i in range(64)]
    out = dedup_clusters(_pairs_ds(edges), with_sizes=True,
                         funnel_rows=0).to_pandas()
    assert set(out["cluster_id"]) == {0}
    assert set(out["cluster_size"]) == {65}


def test_empty_pairs_typed_output(ray_session):
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "a_id": pa.array([], pa.int64()),
        "b_id": pa.array([], pa.int64()),
    }))
    out = dedup_clusters(empty)
    # Dataset.to_pandas() drops columns on an empty dataset (Ray
    # quirk), so downstream-visible schema is the contract here
    assert out.schema().names == ["doc_id", "cluster_id", "cluster_size"]
    assert out.count() == 0


def test_plans_agree_on_real_neardup_pairs(ray_session):
    """Funnel vs distributed closure over the REAL LSH pair pipeline
    (sf0.001 documents) — the synthetic-graph equality, re-pinned on
    production-shaped input."""
    import ray.data as rd

    from ocaml_geojson_ray.stages.dedup import (
        minhash_lsh_candidates,
        verify_pairs_distributed,
    )

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = verify_pairs_distributed(
        minhash_lsh_candidates(ds, bands=32, rows=4), ds,
        threshold=0.5).materialize()
    assert pairs.count() > 0
    funnel = dedup_clusters(pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    dist = dedup_clusters(pairs, funnel_rows=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert funnel[["doc_id", "cluster_id"]].equals(
        dist[["doc_id", "cluster_id"]])
    assert funnel["cluster_size"].tolist() == dist["cluster_size"].tolist()
