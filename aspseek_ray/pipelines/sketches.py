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

__all__ = ["hll_distinct", "hll_estimate", "cms_heavy_hitters"]

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 values: the golden-ratio
    increment followed by the engine's pinned finalizer (the single
    source of the mixing constants, shared with sampling and the
    cuckoo filter — and mirrored in SQL by __ray_entry__._mix_ctes)."""
    from aspseek_ray.state.cuckoo import _mix

    with np.errstate(over="ignore"):
        return _mix(x + _GOLDEN)


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


# Per-row seeds for the count-min hash family (public wyhash secret
# constants; any fixed odd values work — they only need to be distinct).
_CMS_SEEDS = (0xA0761D6478BD642F, 0xE7037ED1A0B428DB,
              0x8EBC6AF09C88C6E3, 0x589965CC75374CC3)


def _cms_cols(vals: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) column indexes: h_j(x) = splitmix64(x + seed_j) % w."""
    if depth > len(_CMS_SEEDS):
        raise ValueError(
            f"depth {depth} exceeds the {len(_CMS_SEEDS)} pinned seeds "
            "(each seed is inlined in the SQL oracle; extend _CMS_SEEDS "
            "and the oracle together)")
    out = np.empty((depth, len(vals)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(depth):
            h = _splitmix64(vals + np.uint64(_CMS_SEEDS[j]))
            out[j] = (h % np.uint64(width)).astype(np.int64)
    return out


def cms_heavy_hitters(sf_dir: str, table: str = "events",
                      column: str = "user_id", width: int = 2048,
                      depth: int = 4, threshold: int = 75) -> pa.Table:
    """Heavy hitters via a count-min sketch (Cormode & Muthukrishnan,
    "An improved data stream summary: the count-min sketch and its
    applications", J. Algorithms 2005).

    Pass 1 folds each batch into (cell, cnt) partials — at most
    depth*width rows per batch regardless of batch size — and one
    groupby(cell).sum merges them, so the shuffle is bounded by the
    sketch size, never by the key cardinality (the point of a sketch at
    100 TB: an exact groupby(key) would move every distinct key).
    Pass 2 broadcasts the dense depth x width grid once (ray.put) and
    probes keys inside map_batches: estimate = min_j grid[j, h_j(key)],
    a pure function of the key, so cross-batch duplicates collapse with
    a tiny groupby. CMS only OVERcounts (collisions add), so the
    result is a superset of the true >= threshold set; with
    width >> distinct keys it is exact. Deterministic given the
    splitmix64 hash family, hence bitwise-oracle-able in SQL despite
    being an approximate sketch.

    Returns (value, est_count) sorted by est_count desc, value asc.
    """
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[column])

    def _keys(col) -> np.ndarray:
        # Null-safe: drop nulls BEFORE the numpy conversion (a
        # null-bearing int column converts to float64+NaN and then to
        # an undefined uint64 cast); same domain in grid and probe.
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = col.drop_null()
        if pa.types.is_integer(col.type):
            return col.to_numpy(zero_copy_only=False).astype(np.uint64)
        from aspseek_ray.functions.hashing import fnv1a64_arrow

        return fnv1a64_arrow(col).astype(np.uint64)

    def grid_partial(batch: pa.Table) -> pa.Table:
        cols = _cms_cols(_keys(batch[column]), width, depth)
        cells, cnts = [], []
        for j in range(depth):
            bc = np.bincount(cols[j], minlength=width)
            nz = np.flatnonzero(bc)
            cells.append(nz + j * width)
            cnts.append(bc[nz])
        return pa.table({"cell": pa.array(np.concatenate(cells)),
                         "cnt": pa.array(np.concatenate(cnts))})

    merged = (ds.map_batches(grid_partial, batch_format="pyarrow")
                .groupby("cell").aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas())
    grid = np.zeros(depth * width, dtype=np.int64)
    if len(merged):
        grid[merged["cell"].to_numpy()] = merged["cnt"].to_numpy()

    import ray

    grid_ref = ray.put(grid.reshape(depth, width))

    def probe(batch: pa.Table) -> pa.Table:
        g = ray.get(grid_ref)
        uniq = pa.compute.unique(batch[column]).drop_null()
        keys = _keys(uniq)
        cols = _cms_cols(keys, width, depth)
        est = g[np.arange(depth)[:, None], cols].min(axis=0)
        keep = est >= threshold
        return pa.table({"value": uniq.filter(pa.array(keep)),
                         "est_count": pa.array(est[keep])})

    from ray.data.aggregate import Max

    out = (ds.map_batches(probe, batch_format="pyarrow")
             .groupby("value").aggregate(Max("est_count",
                                             alias_name="est_count"))
             .to_pandas())
    out = out.sort_values(["est_count", "value"],
                          ascending=[False, True], ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


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
