"""Structural invariants of the crawl trace — independent of the
simulator (guards against sim+engine co-evolving a shared bug):
politeness budget per host per round, per-host priority order, seen-set
uniqueness, depth bounds, fetch_seq density."""

from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from aspseek_ray.config import CrawlConfig
from aspseek_ray.pipelines.crawl import run_crawl
from fixtures.gen import generate_corpus
from ref_sim import load_corpus


CFG = CrawlConfig(max_rounds=8, num_shards=4, num_page_buckets=8,
                  per_host_per_round=3)


@pytest.fixture(scope="module")
def crawl(tmp_path_factory):
    d = tmp_path_factory.mktemp("inv")
    corpus = str(d / "c")
    generate_corpus(corpus, n_pages=300, n_hosts=10, seed=21)
    res = run_crawl(corpus, str(d / "out"), CFG)
    _, _, robots, _ = load_corpus(corpus)
    return res, robots


def test_budget_never_exceeded(ray_session, crawl):
    res, robots = crawl
    per = defaultdict(int)
    for r in res.trace_table().to_pylist():
        per[(r["round"], r["host"])] += 1
    for (rnd, host), n in per.items():
        _, delay = robots.get(host, ([], 0))
        assert n <= CFG.effective_budget(delay), (rnd, host, n)


def test_per_host_priority_order(ray_session, crawl):
    res, _ = crawl
    last = {}
    for r in res.trace_table().to_pylist():
        key = (r["round"], r["host"])
        cur = (r["depth"], r["discovery_seq"])
        if key in last:
            assert last[key] <= cur, key  # heap order within (round, host)
        last[key] = cur


def test_no_url_fetched_twice_and_depth_bounds(ray_session, crawl):
    res, _ = crawl
    rows = res.trace_table().to_pylist()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls))
    assert all(0 <= r["depth"] <= CFG.max_hops for r in rows)


def test_fetch_seq_dense_and_round_monotone(ray_session, crawl):
    res, _ = crawl
    rows = res.trace_table().to_pylist()
    assert [r["fetch_seq"] for r in rows] == list(range(len(rows)))
    assert all(a["round"] <= b["round"] for a, b in zip(rows, rows[1:]))
    # host-lexicographic order within each round
    for a, b in zip(rows, rows[1:]):
        if a["round"] == b["round"]:
            assert a["host"] <= b["host"]
