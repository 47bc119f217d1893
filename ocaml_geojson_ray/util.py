"""Small shared runtime helpers."""

from __future__ import annotations


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
