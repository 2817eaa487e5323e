"""Deterministic (hash-based) sampling — the reproducible-split primitive
a 100-TB training-data pipeline needs: membership depends only on the row
KEY, never on partitioning, ordering, executor count, or a driver RNG, so
the same row lands in the same split on every run, at every scale, and the
sample composes with incremental recrawls (new rows join splits without
reshuffling old ones).

Implemented as a stateless vectorized map_batches filter over the
splitmix64 finalizer of the key column (state/cuckoo._mix — the engine's
pinned 64-bit mixer, SQL-mirrorable for the oracle). ``rate_pct`` keeps
rows whose mixed key falls in [0, rate_pct) mod 100.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from aspseek_ray.state.cuckoo import _mix

__all__ = ["deterministic_sample"]


def deterministic_sample(sf_dir: str, table: str = "documents",
                         key: str = "doc_id", rate_pct: int = 10,
                         columns: tuple[str, ...] | None = None) -> rd.Dataset:
    """Keep rows where splitmix64(key) % 100 < rate_pct. Returns the
    sampled Dataset (pruned to ``columns`` + key at the read)."""
    cols = sorted({key, *(columns or ())})
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=cols)

    def keep(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        sel = (_mix(k) % np.uint64(100)) < np.uint64(rate_pct)
        return batch.filter(pa.array(sel))

    return ds.map_batches(keep, batch_format="pyarrow")
