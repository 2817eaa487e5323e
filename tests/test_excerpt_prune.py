"""Round-5: excerpts() must read O(k-bucket) store files for a k-url
slice, not the whole store (round-4 verdict What's-wrong #3). The store
is url-hash-bucketed (part-{abs(fnv1a64(url)) % B}.parquet per round,
B in store/_meta.json); _store_paths_for prunes to the urls' buckets."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa


def _crawl_store(tmp_path):
    from fixtures.gen import generate_corpus

    from aspseek_ray.config import CrawlConfig
    from aspseek_ray.pipelines.crawl import run_crawl

    corpus = tmp_path / "corpus"
    generate_corpus(str(corpus), n_pages=300, n_hosts=12, seed=11)
    out = tmp_path / "out"
    cfg = CrawlConfig(max_rounds=4, num_shards=2, num_page_buckets=8,
                      write_store=True)
    res = run_crawl(str(corpus), str(out), cfg)
    return res, out / "store"


def test_store_paths_pruned_to_url_buckets(ray_session, tmp_path):
    from aspseek_ray.functions.hashing import fnv1a64
    from aspseek_ray.pipelines.search import _store_paths_for, excerpts

    res, store = _crawl_store(tmp_path)
    meta = json.loads((store / "_meta.json").read_text())
    B = meta["num_buckets"]
    assert B == 8

    all_files = _store_paths_for(str(store), None)
    assert len(all_files) > 4, "store too small for the pruning claim"

    # pick 3 stored urls; their slice must touch only their buckets
    import pyarrow.parquet as pq

    some = pq.read_table(all_files[0], columns=["url"])["url"].to_pylist()[:3]
    want_buckets = {abs(fnv1a64(u)) % B for u in some}
    pruned = _store_paths_for(str(store), tuple(some))
    assert pruned, "pruning dropped every file"
    got_buckets = {int(Path(p).stem.rsplit("-", 1)[1]) for p in pruned}
    assert got_buckets <= want_buckets
    # pruned reads strictly fewer files than the full sweep (the store
    # has more distinct buckets than the k urls touch)
    assert len(pruned) < len(all_files)

    # and the pruned read returns the same excerpts as a full-store
    # scan filtered to the same urls (manifest removed -> no pruning)
    terms = ("the", "a", "of")
    ex = excerpts(str(store), terms, urls=tuple(some))
    (store / "_meta.json").rename(store / "_meta.json.bak")
    try:
        ex_full = excerpts(str(store), terms, urls=tuple(some))
    finally:
        (store / "_meta.json.bak").rename(store / "_meta.json")
    assert ex.equals(ex_full)


def test_excerpts_flat_store_still_works(ray_session, tmp_path):
    """Hand-built flat stores (no round dirs, no manifest) keep the
    old full-scan semantics."""
    import pyarrow.parquet as pq

    from aspseek_ray.pipelines.search import excerpts

    store = tmp_path / "flat"
    store.mkdir()
    pq.write_table(pa.table({"url": ["http://x/1", "http://x/2"],
                             "text": ["alpha beta gamma", "beta delta"]}),
                   store / "part-0.parquet")
    ex = excerpts(str(store), ("beta",), urls=("http://x/2",))
    assert ex["url"].to_pylist() == ["http://x/2"]
    assert "beta" in ex["excerpt"].to_pylist()[0]
