"""Mergeable sketches over Dataset streams (the 'novel sketch' slot of
the round brief's custom-operator list).

HyperLogLog distinct-count (Flajolet et al., "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm", AofA 2007): each
batch folds its values into a 2^p-register sketch, registers ship as
(reg_idx, rank) rows pre-aggregated per batch, and one groupby(reg).max
merges them — the merge is elementwise max, so the estimate is
independent of batching/ordering and the shuffle moves at most
2^p rows per batch. Standard bias + linear-counting corrections.

Deterministic: the value hash is splitmix64 (public mixing constants),
vectorized in numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max

__all__ = ["hll_distinct", "hll_estimate"]

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 values."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def _registers(values: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(reg_idx, rank) pairs — already maxed per register — for one batch."""
    h = _splitmix64(values.astype(np.uint64))
    m = 1 << p
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rank = position of the first 1-bit in the remaining 64-p bits (1-based)
    width = 64 - p
    rank = np.full(len(h), width + 1, dtype=np.int64)
    nz = rest != 0
    # count trailing zeros via float64 trick is lossy; use bit_length of
    # isolated lowest bit: rest & -rest is a power of two, log2 exact
    low = (rest[nz] & (np.uint64(0) - rest[nz])).astype(np.float64)
    rank[nz] = (np.log2(low).astype(np.int64) + 1)
    order = np.lexsort((-rank, idx))
    idx_s, rank_s = idx[order], rank[order]
    first = np.ones(len(idx_s), dtype=bool)
    first[1:] = idx_s[1:] != idx_s[:-1]
    return idx_s[first], rank_s[first]


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator over a dense register array (0 = empty)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)     # linear counting, small range
    return float(e)


def hll_distinct(sf_dir: str, table: str = "events",
                 column: str = "user_id", p: int = 12) -> pa.Table:
    """Approximate COUNT(DISTINCT column) via a distributed HLL:
    per-batch register partials -> groupby(reg).max -> estimate.
    Returns one row (estimate, p)."""
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[column])

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if pa.types.is_integer(col.type):
            vals = col.to_numpy().astype(np.uint64)
        else:
            from aspseek_ray.functions.hashing import fnv1a64_arrow

            vals = fnv1a64_arrow(col).astype(np.uint64)
        idx, rank = _registers(vals, p)
        return pa.table({"reg": pa.array(idx), "rank": pa.array(rank)})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("reg").aggregate(Max("rank", alias_name="rank"))
                .to_pandas())
    regs = np.zeros(1 << p, dtype=np.int64)
    if len(merged):
        regs[merged["reg"].to_numpy()] = merged["rank"].to_numpy()
    return pa.table({"estimate": pa.array([hll_estimate(regs)]),
                     "p": pa.array([p], pa.int64())})
