"""Small execution helpers."""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def clamp_partitions(requested: int, reserve: int = 2) -> int:
    """Clamp a join/shuffle partition count so its aggregator actors plus
    ``reserve`` CPUs for neighbouring stages fit the cluster — an
    oversubscribed local cluster deadlocks (join backpressured while idle
    actor pools hold the CPUs)."""
    cpus = cluster_cpus()
    return max(2, min(requested, cpus - reserve if cpus > reserve else cpus))


def clamp_concurrency(requested: int) -> int:
    cpus = cluster_cpus()
    return max(1, min(requested, max(1, cpus // 2)))
