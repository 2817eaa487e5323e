"""Revisit / incremental recrawl tests (O11): unchanged/modified/gone
classification and the Period-based due set."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aspseek_ray.config import CrawlConfig
from aspseek_ray.pipelines.crawl import run_crawl
from aspseek_ray.pipelines.revisit import due_for_recrawl, recrawl_diff
from fixtures.gen import generate_corpus


@pytest.fixture(scope="module")
def crawled(tmp_path_factory):
    d = tmp_path_factory.mktemp("rv")
    corpus = str(d / "corpus")
    generate_corpus(corpus, n_pages=200, n_hosts=8, seed=3)
    out = str(d / "out")
    import ray

    res = run_crawl(corpus, out,
                    CrawlConfig(max_rounds=8, num_shards=2, num_page_buckets=4))
    return corpus, out, res


def test_diff_identical_corpus_all_unchanged(ray_session, crawled):
    corpus, out, res = crawled
    diff = recrawl_diff(f"{out}/store", f"{corpus}/pages.parquet")
    changes = set(diff["change"].to_pylist())
    assert changes == {"unchanged"}
    # every 200-fetch is covered
    n200 = sum(1 for r in res.trace_table().to_pylist() if r["status"] == 200)
    assert diff.num_rows == n200


def test_diff_detects_modified_and_gone(ray_session, crawled, tmp_path):
    corpus, out, _ = crawled
    pages = pq.read_table(f"{corpus}/pages.parquet")
    store_urls = set()
    import pyarrow.dataset as pads

    st = pads.dataset(f"{out}/store", format="parquet", partitioning=None)
    store_urls = st.to_table(columns=["url"])["url"].to_pylist()
    modify = set(store_urls[:5])
    drop = set(store_urls[5:8])

    texts = pages["text"].to_pylist()
    urls = pages["url"].to_pylist()
    keep_mask, new_texts = [], []
    for u, t in zip(urls, texts):
        keep_mask.append(u not in drop)
        new_texts.append(t + " EDITED" if u in modify else t)
    pages2 = (pages.set_column(pages.schema.get_field_index("text"), "text",
                               pa.array(new_texts, pa.string()))
              .filter(pa.array(keep_mask)))
    p2 = tmp_path / "pages.parquet"
    pq.write_table(pages2, p2)

    diff = recrawl_diff(f"{out}/store", str(p2))
    by_change = {}
    for u, c in zip(diff["url"].to_pylist(), diff["change"].to_pylist()):
        by_change.setdefault(c, set()).add(u)
    assert by_change.get("modified", set()) == modify
    assert by_change.get("gone", set()) == drop
    assert len(by_change["unchanged"]) == diff.num_rows - 8


def test_due_for_recrawl(ray_session, crawled):
    _, _, res = crawled
    trace = res.trace_table()
    period = 100
    # at now = fetch of seq 50 + period, exactly seqs 0..50 are due
    due = due_for_recrawl(trace, period_s=period, now_offset_s=50 + period)
    seqs = sorted(due["fetch_seq"].to_pylist())
    assert seqs == list(range(0, min(51, trace.num_rows)))
