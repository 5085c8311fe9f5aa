"""Small shared utilities."""

from __future__ import annotations


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size so it can never starve upstream stages.

    An actor pool that reserves every cluster CPU leaves nothing for the
    read/write tasks feeding it and the pipeline stalls (observed with a
    2-actor pool on a 2-CPU cluster). Leave at least 2 CPUs for other
    stages whenever the cluster has more than 2.
    """
    import ray

    try:
        avail = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        avail = 4
    return max(1, min(requested, max(1, avail - 2)))
