"""Index-product correctness tests (SURVEY O21/O23/O28/O29/S7): postings
vs a direct recompute, clone groups vs injected clones, pagerank vs a
pure-python reference loop."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from aspseek_ray.functions.hashing import fnv1a64
from aspseek_ray.functions.text import STOPWORDS_EN, tokenize
from aspseek_ray.pipelines import index_products as ip


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from fixtures.gen import generate_corpus

    d = tmp_path_factory.mktemp("ip_corpus")
    generate_corpus(str(d), n_pages=200, n_hosts=8, seed=11)
    return str(d)


def test_postings_match_direct_recompute(ray_session, corpus):
    postings = ip.build_postings(f"{corpus}/pages.parquet")
    got = postings.to_pandas()

    pages = pq.read_table(f"{corpus}/pages.parquet", columns=["url", "text"])
    want: dict[tuple[int, str], list[int]] = {}
    for url, text in zip(pages["url"].to_pylist(), pages["text"].to_pylist()):
        doc = fnv1a64(url)
        for pos, w in enumerate(tokenize(text)):
            if w in STOPWORDS_EN:
                continue
            want.setdefault((doc, w), []).append(pos)

    got_map = {(d, w): list(p) for d, w, p in
               zip(got["doc_seq"], got["word"], got["positions"])}
    assert got_map == want
    # bucket assignment consistent with the pinned hash
    for w, b in zip(got["word"], got["word_bucket"]):
        assert b == abs(fnv1a64(w)) % ip.NUM_WORD_BUCKETS


def test_merge_postings_df(ray_session, corpus):
    postings = ip.build_postings(f"{corpus}/pages.parquet")
    merged = ip.merge_postings(postings).to_pandas()
    pages = pq.read_table(f"{corpus}/pages.parquet", columns=["text"])
    df_want: dict[str, int] = {}
    for text in pages["text"].to_pylist():
        for w in set(tokenize(text)) - STOPWORDS_EN:
            df_want[w] = df_want.get(w, 0) + 1
    got = dict(zip(merged["word"], merged["df"]))
    assert got == df_want
    # doc lists sorted
    for seqs in merged["doc_seqs"]:
        assert list(seqs) == sorted(seqs)


def test_clone_groups_find_injected_clones(ray_session, corpus):
    groups = ip.clone_groups(f"{corpus}/pages.parquet").to_pandas()
    pages = pq.read_table(f"{corpus}/pages.parquet", columns=["html"])
    from collections import Counter

    direct = Counter(pages["html"].to_pylist())
    n_dup_groups = sum(1 for c in direct.values() if c >= 2)
    assert len(groups) == n_dup_groups
    assert n_dup_groups >= 1  # generator injects clones
    assert (groups["n_clones"] >= 2).all()


def test_pagerank_matches_reference_loop(ray_session, corpus):
    got = ip.pagerank(f"{corpus}/pages.parquet", iterations=5).to_pandas()
    assert abs(got["rank"].sum() - 1.0) < 1e-3

    # pure-python reference with identical semantics
    edges_t = ip.extract_link_edges(f"{corpus}/pages.parquet").to_pandas()
    urls = sorted(pq.read_table(f"{corpus}/pages.parquet", columns=["url"])["url"].to_pylist())
    idx = {u: i for i, u in enumerate(urls)}
    n = len(urls)
    edges = [(idx[s], idx[d]) for s, d in zip(edges_t["src"], edges_t["dst"])
             if s in idx and d in idx]
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    ranks = np.full(n, 1.0 / n)
    for _ in range(5):
        incoming = np.zeros(n)
        for s, d in edges:
            incoming[d] += ranks[s] / deg[s]
        dangling = ranks[deg == 0].sum()
        ranks = 0.15 / n + 0.85 * (incoming + dangling / n)
    want = dict(zip(urls, np.round(ranks, 6)))
    got_map = dict(zip(got["url"], got["rank"]))
    assert got_map.keys() == want.keys()
    for u in want:
        assert abs(got_map[u] - want[u]) < 2e-6, u


def test_host_stats_and_status_stats(ray_session, corpus, tmp_path):
    from aspseek_ray.config import CrawlConfig
    from aspseek_ray.pipelines.crawl import run_crawl

    res = run_crawl(corpus, str(tmp_path / "out"),
                    CrawlConfig(max_rounds=6, num_shards=2, num_page_buckets=4))
    trace = res.trace_table()
    st = ip.crawl_status_stats(trace).to_pandas()
    assert st["n"].sum() == trace.num_rows
    hs = ip.host_stats(trace).to_pandas()
    assert hs["n_fetched"].sum() == trace.num_rows
    assert (hs["n_ok"] <= hs["n_fetched"]).all()
