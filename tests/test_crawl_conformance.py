"""Trace-conformance + resume tests (SURVEY.md §5.2/§5.6): the Ray pipeline
must reproduce the normative simulator's crawl trace and URL-seen set
EXACTLY, and a run resumed from a mid-crawl checkpoint must converge to the
identical final state."""

import pyarrow.parquet as pq
import pytest

from aspseek_ray.config import CrawlConfig
from aspseek_ray.pipelines.crawl import Crawler, run_crawl
from fixtures.gen import generate_corpus
from ref_sim import load_corpus, simulate

CFG = CrawlConfig(max_rounds=10, num_shards=4, num_page_buckets=8)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("conf_corpus")
    generate_corpus(str(d), n_pages=500, n_hosts=16, seed=42)
    return str(d)


@pytest.fixture(scope="module")
def golden(corpus):
    pages, seeds, robots, redirects = load_corpus(corpus)
    return simulate(pages, seeds, robots, CFG, redirects)


def test_trace_and_seen_conformance(ray_session, corpus, golden, tmp_path):
    # the corpus must actually exercise every status path
    statuses = {r["status"] for r in golden.trace}
    assert statuses == {200, 301, 404}, statuses
    res = run_crawl(corpus, str(tmp_path / "out"), CFG)
    trace = res.trace_table().to_pylist()
    assert len(trace) == len(golden.trace)
    for got, want in zip(trace, golden.trace):
        assert got == want
    seen = set(pq.read_table(res.seen_path())["url"].to_pylist())
    assert seen == golden.seen


def test_distributed_seed_path_conformance(ray_session, corpus, golden,
                                           tmp_path, monkeypatch):
    """Forcing the worker-task seed-offer path (and the Dataset redirect
    bucketing) below its size switch must reproduce the exact same trace
    as the direct driver path — identical offer semantics either way."""
    import aspseek_ray.pipelines.crawl as crawl_mod

    monkeypatch.setattr(crawl_mod, "_SEEDS_DRIVER_MAX", 0)
    res = run_crawl(corpus, str(tmp_path / "out"), CFG)
    trace = res.trace_table().to_pylist()
    assert len(trace) == len(golden.trace)
    for got, want in zip(trace, golden.trace):
        assert got == want


def test_text_invariant_against_corpus(ray_session, sf_small_dir):
    """Byte-identical extracted text per url (input_hint invariant) as a
    distributed map over the pages table."""
    import pyarrow as pa
    import ray.data as rd

    from aspseek_ray.functions.html import extract_text

    def check(batch: pa.Table) -> pa.Table:
        n_ok = sum(extract_text(h) == t
                   for h, t in zip(batch["html"].to_pylist(), batch["text"].to_pylist()))
        return pa.table({"n": pa.array([batch.num_rows], pa.int64()),
                         "n_ok": pa.array([n_ok], pa.int64())})

    ds = rd.read_parquet(f"{sf_small_dir}/pages.parquet", columns=["html", "text"])
    out = ds.map_batches(check, batch_format="pyarrow").take_all()
    assert sum(r["n"] for r in out) == 2000
    assert sum(r["n_ok"] for r in out) == 2000


def test_resume_from_checkpoint(ray_session, corpus, golden, tmp_path):
    """Run 4 rounds, tear the crawler down (simulated crash after the round-3
    checkpoint), resume from LATEST and finish: final trace + seen must be
    identical to the golden uninterrupted run."""
    out = str(tmp_path / "out")
    c1 = Crawler(corpus, out, CFG)
    for _ in range(4):
        c1.run_round()
    c1.shutdown()  # crash: actor state lost; checkpoints + trace files remain

    c2 = Crawler(corpus, out, CFG, resume=True)
    assert c2.round == 4
    res = c2.run()
    c2.shutdown()

    trace = res.trace_table().to_pylist()
    assert [dict(r) for r in trace] == golden.trace
    seen = set(pq.read_table(res.seen_path())["url"].to_pylist())
    assert seen == golden.seen


def test_max_docs_cap(ray_session, corpus, tmp_path):
    cfg = CrawlConfig(max_rounds=10, num_shards=4, num_page_buckets=8, max_docs=17)
    pages, seeds, robots, redirects = load_corpus(corpus)
    want = simulate(pages, seeds, robots, cfg, redirects)
    res = run_crawl(corpus, str(tmp_path / "out"), cfg)
    assert res.total_fetched == 17
    assert res.trace_table().to_pylist() == want.trace
