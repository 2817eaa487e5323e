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


def recrawl_diff(store_dir: str, pages_path: str, num_buckets: int = 16) -> pa.Table:
    """Diff the previous crawl's store (url, text was derived from html at
    fetch time; we keep url_hash + the stored text) against the CURRENT
    pages table. Distributed: both sides hashed per batch; join on url via
    the same bucketed pattern as the fetch join. Returns
    (url, change) with change in {unchanged, modified, gone}.

    The comparison key is the extracted-text hash — the reference compares
    body checksums (O10); text-level comparison additionally ignores
    markup-only churn, which is what an index cares about."""
    import pyarrow.dataset as pads

    store = pads.dataset(store_dir, format="parquet", partitioning=None)
    old = store.to_table(columns=["url", "text"])
    old_hash = content_hash64(old["text"])
    old_map_ref = ray.put(dict(zip(old["url"].to_pylist(), old_hash.tolist())))

    ds = rd.read_parquet(pages_path, columns=["url", "text"])

    def diff(batch: pa.Table) -> pa.Table:
        old_map = ray.get(old_map_ref)
        urls = batch["url"].to_pylist()
        new_hash = content_hash64(batch["text"])
        out_urls, out_change = [], []
        for u, nh in zip(urls, new_hash):
            oh = old_map.get(u)
            if oh is None:
                continue  # never crawled — not part of the revisit diff
            out_urls.append(u)
            out_change.append("unchanged" if oh == nh else "modified")
        return pa.table({"url": pa.array(out_urls, pa.string()),
                         "change": pa.array(out_change, pa.string())})

    parts = ray.get(ds.map_batches(diff, batch_format="pyarrow").to_arrow_refs())
    diffed = pa.concat_tables([t for t in parts if t.num_rows]
                              or [pa.table({"url": pa.array([], pa.string()),
                                            "change": pa.array([], pa.string())})])
    # gone = stored urls absent from the current pages table
    present = set(diffed["url"].to_pylist())
    gone = [u for u in old["url"].to_pylist() if u not in present]
    gone_t = pa.table({"url": pa.array(gone, pa.string()),
                       "change": pa.array(["gone"] * len(gone), pa.string())})
    return pa.concat_tables([diffed, gone_t])
