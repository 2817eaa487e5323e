"""Small runtime helpers shared by pipelines.

Repo-wide collect convention: every ``ds.to_arrow_refs()`` call goes
through ``ds.materialize().to_arrow_refs()``. On a non-materialized plan,
``to_arrow_refs`` executes the plan for the blocks and then AGAIN
(limit=1, which still pays any upstream sort/shuffle in full) for its
schema probe — a measured ~2x on collect-style queries. ``materialize()``
caches blocks + schema so the plan runs exactly once; the collected
results here are small (aggregates, top-k, signature tables), so pinning
them is free."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _worker_unique_i64(refs: list, column: str) -> np.ndarray:
    blocks = [b for b in ray.get(list(refs)) if b.num_rows]
    if not blocks:
        return np.empty(0, np.int64)
    return np.unique(
        np.concatenate([b[column].to_numpy() for b in blocks]).astype(np.int64))


def unique_keys_ref(ds, column: str) -> "ray.ObjectRef":
    """Distinct int64 values of a Dataset column, reduced ON A WORKER task.
    ``to_arrow_refs`` hands over block refs only, so no row ever passes
    through the driver — it holds one ObjectRef to the sorted unique array
    (the broadcast side of a map-side semi/anti join)."""
    return _worker_unique_i64.remote(ds.materialize().to_arrow_refs(), column)


@ray.remote
def _worker_sorted_lookup(refs: list, key_col: str, val_col: str):
    blocks = [b for b in ray.get(list(refs)) if b.num_rows]
    if not blocks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pa.concat_tables(blocks)
    k = t[key_col].to_numpy().astype(np.int64)
    v = t[val_col].to_numpy()
    order = np.argsort(k, kind="stable")
    return k[order], v[order]


def sorted_lookup_ref(ds, key_col: str, val_col: str) -> "ray.ObjectRef":
    """(sorted unique keys, aligned values) lookup arrays built ON A WORKER
    from a Dataset's block refs — the vectorized broadcast-join side:
    readers ``ray.get`` the ref once per actor and probe with
    ``np.searchsorted``. Keys are assumed unique (a primary key)."""
    return _worker_sorted_lookup.remote(ds.materialize().to_arrow_refs(), key_col, val_col)


def join_partitions(default: int = 8) -> int:
    """Partition count for native Dataset.join: hash-shuffle aggregator
    actors reserve ~1 CPU each, so more partitions than cluster CPUs
    deadlocks a small cluster (actors pend forever). Cap the default by
    the cluster's CPU count; at real scale pass the default through."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", default))
    except Exception:
        cpus = default
    return min(default, max(1, cpus))


def actor_pool(lo: int = 2) -> tuple[int, int]:
    """Autoscaling (min, max) concurrency for a stateful fact-table scan
    stage: scale up to the cluster's CPUs (each map_batches actor holds
    one by default) instead of a fixed tiny pool that caps a 100-TB scan
    at two cores. Ray's streaming executor only spawns actors while the
    stage has queued blocks, so the max is a ceiling, not a reservation."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", lo))
    except Exception:
        cpus = lo
    return (lo, max(lo, cpus))
