"""Pages corpus ingest + pre-bucketing (SURVEY.md O19 prep; reference:
the network GET of src/http.cpp — offline, "fetch" is a partitioned hash
lookup into the Common-Crawl-style pages table).

``bucket_pages`` shuffles the pages table ONCE by ``url_hash % B`` into a
hive-partitioned Parquet layout ``<out>/bucket=K/``. Every crawl round then
joins its (small) scheduled frontier against only the buckets it needs —
broadcast-small-side in reverse (SURVEY §2.4 O19): the 100-TB pages side
never moves again.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from aspseek_ray.functions.hashing import fnv1a64_arrow


def add_url_hash(batch: pa.Table, col: str = "url", out: str = "url_hash") -> pa.Table:
    return batch.append_column(out, pa.array(fnv1a64_arrow(batch[col])))


def bucket_pages(pages_path: str, out_dir: str, num_buckets: int = 16,
                 columns: list[str] | None = None,
                 url_col: str = "url",
                 driver_max_rows: int = 0) -> str:
    """One-time shuffle of a url-keyed table by fnv1a64(url_col) %
    num_buckets into ``out_dir/bucket=K/``. Used for the pages corpus and
    (with url_col='src_url') the redirects table, so a scheduled url and
    its redirect alias land in the same bucket id. Idempotent: skips when
    a matching manifest exists.

    ``driver_max_rows``: tables at or below this row count (parquet
    metadata, no data read) are partitioned directly on the driver — the
    Dataset job's fixed overhead dominates for small dimension tables
    (redirects); 0 disables the direct path. Identical layout either
    way."""
    import pyarrow.parquet as pq

    out = Path(out_dir)
    pages_path = str(Path(pages_path).resolve())  # symlinked corpora match
    manifest = out / "_bucket_manifest.json"
    if manifest.exists():
        m = json.loads(manifest.read_text())
        if m.get("num_buckets") == num_buckets and m.get("source") == pages_path:
            return str(out)
    if out.exists():  # stale layout from another source/bucket-count
        import shutil

        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)

    cols = columns or ["url", "html"]
    small = (driver_max_rows > 0 and Path(pages_path).is_file()
             and pq.ParquetFile(pages_path).metadata.num_rows
             <= driver_max_rows)
    if small:
        t = add_url_hash(pq.read_table(pages_path, columns=cols),
                         col=url_col)
        bucket = np.abs(np.asarray(t["url_hash"], dtype=np.int64)) % num_buckets
        for k in np.unique(bucket):
            d = out / f"bucket={int(k)}"
            d.mkdir()
            pq.write_table(t.filter(pa.array(bucket == k)),
                           d / "part-0.parquet")
    else:
        ds = rd.read_parquet(pages_path, columns=cols)

        def stamp(batch: pa.Table) -> pa.Table:
            b = add_url_hash(batch, col=url_col)
            bkt = np.abs(np.asarray(b["url_hash"], dtype=np.int64)) % num_buckets
            return b.append_column("bucket", pa.array(bkt.astype(np.int32)))

        (ds.map_batches(stamp, batch_format="pyarrow")
           .write_parquet(str(out), partition_cols=["bucket"]))
    manifest.write_text(json.dumps({"num_buckets": num_buckets,
                                    "source": pages_path}))
    return str(out)


# per-WORKER-PROCESS cache of redirect bucket partitions: the tables are
# tiny (redirects/B rows) and reread on every missing-url batch otherwise;
# worker processes outlive tasks, so this amortizes to one read per
# (worker, bucket). Keyed on the newest file mtime for invalidation.
_REDIRECT_CACHE: dict = {}


def _redirect_bucket(redirect_dir: str, bucket: int):
    import pyarrow.dataset as pads

    path = Path(redirect_dir) / f"bucket={bucket}"
    if not path.exists():
        return None
    files = sorted(path.glob("*.parquet"))
    stamp = tuple((f.name, f.stat().st_mtime_ns) for f in files)
    cached = _REDIRECT_CACHE.get(str(path))
    if cached is not None and cached[0] == stamp:
        return cached[1]
    hit = pads.dataset(str(path), format="parquet").to_table(
        columns=["src_url", "dst_url"]).combine_chunks()
    _REDIRECT_CACHE[str(path)] = (stamp, hit)
    return hit


class BucketLookup:
    """Per-task lookup into one pages bucket: given a batch of scheduled
    urls ALL IN THE SAME BUCKET, return the batch joined with (html,), a
    status column (200 hit / 301 redirect alias / 404 miss) and a
    ``redirect`` column (target url for 301 rows, else null). Reads only
    that bucket's files with an ``isin`` pushdown filter.

    Redirects live in a table bucketed by the SAME url-hash layout as
    pages (bucket_pages url_col='src_url'), so a miss checks only this
    bucket's redirect partition (cached per worker process) — no
    whole-table driver dict anywhere."""

    def __init__(self, bucket_dir: str, redirect_dir: str | None = None):
        self.bucket_dir = bucket_dir
        self.redirect_dir = redirect_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        batch = batch.combine_chunks()  # multi-chunk cols hit slow isin/index_in paths
        bucket = int(batch["bucket"][0].as_py())
        path = Path(self.bucket_dir) / f"bucket={bucket}"
        urls = batch["url"]
        if path.exists():
            dset = pads.dataset(str(path), format="parquet")
            hit = dset.to_table(columns=["url", "html"],
                                filter=pc.field("url").isin(urls)).combine_chunks()
        else:
            hit = pa.table({"url": pa.array([], type=pa.string()),
                            "html": pa.array([], type=pa.binary())})
        # left join scheduled -> pages (vectorized index_in)
        idx = pc.index_in(urls, value_set=hit["url"])
        found = pc.is_valid(idx)
        status_np = np.where(np.asarray(found), 200, 404).astype(np.int32)
        redirect = [None] * batch.num_rows
        miss = np.nonzero(status_np == 404)[0]
        if self.redirect_dir is not None and miss.size:
            rt = _redirect_bucket(self.redirect_dir, bucket)
            if rt is not None and rt.num_rows:
                miss_urls = pc.take(urls, pa.array(miss))
                ridx = pc.index_in(miss_urls, value_set=rt["src_url"])
                hits = np.asarray(pc.is_valid(ridx))
                if hits.any():
                    dsts = pc.take(rt["dst_url"], ridx).to_pylist()
                    for j in np.nonzero(hits)[0]:
                        i = int(miss[j])
                        status_np[i] = 301
                        redirect[i] = dsts[j]
        html = pc.take(hit["html"], idx)  # null where missing
        out = batch.append_column("status", pa.array(status_np))
        out = out.append_column("html", html)
        return out.append_column("redirect", pa.array(redirect, pa.string()))
