"""Small runtime helpers shared by pipelines."""

from __future__ import annotations

import ray


def join_partitions(default: int = 8) -> int:
    """Partition count for native Dataset.join: hash-shuffle aggregator
    actors reserve ~1 CPU each, so more partitions than cluster CPUs
    deadlocks a small cluster (actors pend forever). Cap the default by
    the cluster's CPU count; at real scale pass the default through."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", default))
    except Exception:
        cpus = default
    return max(2, min(default, cpus))
