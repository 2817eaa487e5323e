"""Revisit / incremental-recrawl ops (SURVEY.md O11; reference:
src/lastmod.cpp + the Period / next_index_time machinery — a 304 or an
unchanged checksum bumps next_index_time without reindexing; changed
content reindexes; vanished urls head toward DeleteBad).

Offline rebuild: the recrawl pass diffs the previous crawl's stored copies
against the current pages table per url:

  * ``unchanged``  — content hash equal (the 304 / checksum-skip path)
  * ``modified``   — url present with different bytes (reindex path)
  * ``gone``       — url no longer fetchable (404 -> error bookkeeping)

Plus ``due_for_recrawl``: the Period-based due set with deterministic
synthetic fetch times (fetch_time = base_ts + fetch_seq seconds — wall
clock is banned for reproducibility; pinned in FIXTURES.md spirit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from aspseek_ray.functions.hashing import content_hash64


def due_for_recrawl(trace: pa.Table, period_s: int, now_offset_s: int,
                    base_ts: int = 1767225600) -> pa.Table:
    """urls due for refetch at time base_ts + now_offset_s, given
    fetch_time = base_ts + fetch_seq and next_fetch = fetch_time +
    period_s (reference Period). Returns (url, fetch_seq, next_fetch_ts)."""
    fetch_ts = pc.add(batch_i64(trace["fetch_seq"]), pa.scalar(base_ts, pa.int64()))
    next_ts = pc.add(fetch_ts, pa.scalar(period_s, pa.int64()))
    now = base_ts + now_offset_s
    t = trace.append_column("next_fetch_ts", next_ts)
    due = t.filter(pc.less_equal(t["next_fetch_ts"], pa.scalar(now, pa.int64())))
    return due.select(["url", "fetch_seq", "next_fetch_ts"])


def batch_i64(col) -> pa.ChunkedArray | pa.Array:
    return col.cast(pa.int64()) if col.type != pa.int64() else col


def recrawl_diff(store_dir: str, pages_path: str,
                 num_buckets: int | None = None) -> pa.Table:
    """Diff the previous crawl's store (url, text extracted at fetch time)
    against the CURRENT pages table. Fully distributed: both sides reduce
    to (url, hash) rows inside map_batches, then ONE hash-partitioned
    full-outer join on url classifies every stored url — no driver-side
    map of the store (the store is O(crawl), not a dim table). Returns
    (url, change) with change in {unchanged, modified, gone}; urls never
    crawled before (right-only rows) are not part of the revisit diff.

    The comparison key is the extracted-text hash — the reference compares
    body checksums (O10); text-level comparison additionally ignores
    markup-only churn, which is what an index cares about."""
    from aspseek_ray.runtime import join_partitions

    if num_buckets is None:
        num_buckets = join_partitions(16)
    old = rd.read_parquet(store_dir, columns=["url", "text"])
    new = rd.read_parquet(pages_path, columns=["url", "text"])

    def hash_side(col_out: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({"url": batch["url"],
                             col_out: pa.array(content_hash64(batch["text"]))})
        return f

    joined = (old.map_batches(hash_side("old_hash"), batch_format="pyarrow")
                 .join(new.map_batches(hash_side("new_hash"),
                                       batch_format="pyarrow"),
                       join_type="full_outer", num_partitions=num_buckets,
                       on=("url",)))

    def classify(batch: pa.Table) -> pa.Table:
        oh = batch["old_hash"]
        nh = batch["new_hash"]
        known = pc.is_valid(oh)          # right-only rows: never crawled
        batch = batch.filter(known)
        oh, nh = batch["old_hash"], batch["new_hash"]
        gone = pc.is_null(nh).to_numpy(zero_copy_only=False)
        same = pc.equal(oh, nh).fill_null(False).to_numpy(zero_copy_only=False)
        change = np.where(gone, "gone", np.where(same, "unchanged", "modified"))
        return pa.table({"url": batch["url"],
                         "change": pa.array(change.tolist(), pa.string())})

    out = joined.map_batches(classify, batch_format="pyarrow")
    parts = [t for t in ray.get(out.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({"url": pa.array([], pa.string()),
                         "change": pa.array([], pa.string())})
    return pa.concat_tables(parts)
