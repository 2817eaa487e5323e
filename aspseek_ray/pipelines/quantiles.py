"""Distributed EXACT quantiles without a global sort — the order-statistic
operator a 100-TB pipeline needs where ``ds.sort`` would be an all-to-all
shuffle of every block.

Algorithm (classic iterative histogram refinement / distributed selection):
  pass 0   Min/Max/Count aggregate (one streaming scan, 3 scalars out).
  level L  ONE map_batches scan computes, for every still-active quantile
           simultaneously, a ``bins``-bucket histogram of the rows matching
           that quantile's current bin-predicate chain; only (q_idx, bin,
           count) partials — pre-aggregated per batch — leave the workers.
           The driver walks cumulative counts, turns each quantile's global
           rank into (bin, residual rank), and narrows.
  final    ONE scan pulls the few rows still matching each chain
           (<= max_pull per quantile by construction), driver sorts them.

Bin membership is defined by the bin FUNCTION (floor((v-lo)/width) with
the level's own lo/width), never by value-range comparisons, and every
level's filter is the conjunction of all previous levels' (lo, width, bin)
triples — so float boundary rounding can never mis-place a row between the
histogram pass and the pull pass.

Scale: log_bins(n / max_pull) + 2 streaming scans, no shuffle at all (the
histogram partials are a driver-side sum of <= bins x qs rows per batch).
Heavy-tailed columns keep refining while the value interval narrows even
if the bin's ROW COUNT does not shrink (an outlier can park the mass in
one bin for several levels; the interval still contracts bins-fold per
level, so separation follows); refinement stops only when the interval
is float64-degenerate (width underflow), and the final pull ships
(value, count) pairs pre-aggregated per batch, so duplicate-heavy or
constant columns cost the driver distinct-values, not rows.

Quantile definition: rank ceil(q * n) (1-based) over the FINITE values
(nulls / NaN / infinities are ignored, the standard aggregate
convention), the inverse-CDF / ``quantile_disc`` convention; ties and
duplicates need no special casing because selection is purely
rank-based.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["exact_quantiles"]


def _chain_mask(v: np.ndarray, chain: list[tuple[float, float, int, int]],
                ) -> np.ndarray:
    """Rows matching every (lo, width, bin, nbins) predicate of a chain.
    Uses the SAME clipped-floor bin function as the histogram pass, so a
    row can never change bins between the two scans."""
    mask = np.isfinite(v)
    for lo, width, b, nbins in chain:
        idx = np.clip(np.floor((v - lo) / width), 0, nbins - 1)
        mask &= idx == b
    return mask


def exact_quantiles(sf_dir: str, table: str = "orders",
                    column: str = "o_totalprice",
                    qs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
                    bins: int = 2048, max_pull: int = 65536) -> pa.Table:
    """EXACT order statistics of ``column`` at quantiles ``qs``.
    Output (q, value), one row per quantile, rank = ceil(q * n) over
    the finite values (nulls/NaN/inf ignored)."""
    path = f"{sf_dir}/{table}.parquet"
    ds = rd.read_parquet(path, columns=[column])

    # pass 0 over the SAME domain every later pass filters to (finite
    # values): Count() would include nulls and Min/Max can propagate
    # NaN, shifting ranks against the selection
    def stats_batch(batch: pa.Table) -> pa.Table:
        v = batch.column(0).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v)]
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "mn": pa.array([float(v.min()) if len(v) else math.inf]),
            "mx": pa.array([float(v.max()) if len(v) else -math.inf])})

    stats = (ds.map_batches(stats_batch, batch_format="pyarrow")
               .to_pandas())
    n = int(stats["n"].sum())
    gmin = float(stats["mn"].min())
    gmax = float(stats["mx"].max())
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})

    # per-quantile state: residual rank within its chain + the chain itself
    ranks = [min(n, max(1, math.ceil(q * n))) for q in qs]
    chains: list[list[tuple[float, float, int, int]]] = [[] for _ in qs]
    counts = [n] * len(qs)        # rows matching each chain
    los = [gmin] * len(qs)
    his = [gmax] * len(qs)

    while True:
        active = [i for i in range(len(qs))
                  if counts[i] > max_pull and his[i] > los[i]
                  and (his[i] - los[i]) / bins > 0.0]   # width underflow
                  # -> interval is a handful of ulps: pull directly
        if not active:
            break
        # one scan: a histogram per active quantile, partials per batch
        specs = [(i, los[i], (his[i] - los[i]) / bins, list(chains[i]))
                 for i in active]

        def hist_batch(batch: pa.Table, specs=specs, bins=bins) -> pa.Table:
            v = batch.column(0).to_numpy(zero_copy_only=False).astype(np.float64)
            out_q, out_b, out_n = [], [], []
            for qi, lo, width, chain in specs:
                sel = v[_chain_mask(v, chain)]
                if len(sel) == 0:
                    continue
                idx = np.clip(np.floor((sel - lo) / width), 0,
                              bins - 1).astype(np.int64)
                bc = np.bincount(idx, minlength=bins)
                nz = np.nonzero(bc)[0]
                out_q.extend([qi] * len(nz))
                out_b.extend(nz.tolist())
                out_n.extend(bc[nz].tolist())
            return pa.table({"qi": pa.array(out_q, pa.int64()),
                             "bin": pa.array(out_b, pa.int64()),
                             "n": pa.array(out_n, pa.int64())})

        parts = (rd.read_parquet(path, columns=[column])
                 .map_batches(hist_batch, batch_format="pyarrow")
                 .to_pandas())
        progressed = False
        for qi, lo, width, _chain in specs:
            hist = np.zeros(bins, dtype=np.int64)
            mine = parts[parts["qi"] == qi]
            np.add.at(hist, mine["bin"].to_numpy(), mine["n"].to_numpy())
            cum = np.cumsum(hist)
            b = int(np.searchsorted(cum, ranks[qi], side="left"))
            before = int(cum[b - 1]) if b > 0 else 0
            new_count = int(hist[b])
            new_lo = lo + b * width
            new_hi = lo + (b + 1) * width
            # Stop only when the interval is float64-degenerate (width
            # underflow) or failed to contract — remaining rows are
            # numerically (near-)equal; the (value, count) pull bounds
            # the driver by distinct values. A bin whose COUNT did not
            # shrink (heavy tail parking the mass in one bin) keeps
            # refining: the interval still contracts bins-fold a level.
            if new_hi <= new_lo or (new_lo <= los[qi] and new_hi >= his[qi]):
                his[qi] = los[qi]            # stop refining; pull directly
                continue
            ranks[qi] -= before
            chains[qi].append((lo, width, b, bins))
            counts[qi] = new_count
            los[qi] = new_lo
            his[qi] = new_hi
            progressed = True
        if not progressed:
            break

    # final scan: pull the few surviving rows per quantile, tag by qi
    final_chains = [list(c) for c in chains]

    def pull_batch(batch: pa.Table, chains=final_chains) -> pa.Table:
        v = batch.column(0).to_numpy(zero_copy_only=False).astype(np.float64)
        out_q, out_v, out_c = [], [], []
        for qi, chain in enumerate(chains):
            u, c = np.unique(v[_chain_mask(v, chain)], return_counts=True)
            out_q.extend([qi] * len(u))
            out_v.extend(u.tolist())
            out_c.extend(c.tolist())
        return pa.table({"qi": pa.array(out_q, pa.int64()),
                         "v": pa.array(out_v, pa.float64()),
                         "c": pa.array(out_c, pa.int64())})

    pulled = (rd.read_parquet(path, columns=[column])
              .map_batches(pull_batch, batch_format="pyarrow")
              .to_pandas())
    values = []
    for qi in range(len(qs)):
        sub = (pulled[pulled["qi"] == qi].groupby("v")["c"].sum()
               .sort_index())
        cum = sub.to_numpy().cumsum()
        pos = int(np.searchsorted(cum, ranks[qi], side="left"))
        values.append(float(sub.index[pos]))
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array(values, pa.float64())})
