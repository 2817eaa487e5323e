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

__all__ = ["deterministic_sample", "stratified_sample"]


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


def stratified_sample(sf_dir: str, table: str = "documents",
                      key: str = "doc_id", stratum: str = "lang",
                      rates: dict[str, int] | None = None,
                      default_rate: int = 100,
                      columns: tuple[str, ...] | None = None) -> rd.Dataset:
    """Per-stratum deterministic sampling: keep a row iff
    splitmix64(key) % 100 < rates.get(row[stratum], default_rate).

    The webtext rebalancing primitive (downsample the dominant language,
    keep the rare ones whole): membership stays a pure function of
    (key, stratum), so splits remain stable across runs and recrawls,
    and per-stratum subsets nest (a stratum's 5% sample is a subset of
    its 20% sample because both cut the same mixed-key axis). The rates
    dict rides into each task as a plain broadcast closure constant —
    no shuffle; strata never need co-locating."""
    rates = {"en": 20} if rates is None else rates
    cols = sorted({key, stratum, *(columns or ())})
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=cols)

    def keep(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        strat = batch[stratum].to_pandas()
        cut = strat.map(rates).fillna(default_rate).to_numpy(np.uint64)
        sel = (_mix(k) % np.uint64(100)) < cut
        return batch.filter(pa.array(sel))

    return ds.map_batches(keep, batch_format="pyarrow")
