"""Anchor-text ("link word") index: extract_anchors parsing rules and the
anchor_postings pipeline against the generator's independent intended
(src, dst, anchor) ground truth on a fresh corpus."""

from __future__ import annotations

import duckdb
import pandas as pd


def test_extract_anchors_parsing():
    from aspseek_ray.functions.html import extract_anchors

    html = (b'<html><head><base href="http://b.example/d/">'
            b'<script>var x="<a href=\'/no\'>skip</a>";</script></head>'
            b'<body><p><a href="/one.html">hello <b>world</b></a>'
            b'<a name="noref">plain</a>'
            b'<a href="two.html">x &amp; y\n z</a></p>'
            b'<!-- <a href="/c">comment</a> --></body></html>')
    base, pairs = extract_anchors(html)
    assert base == "http://b.example/d/"
    assert pairs == [("/one.html", "hello world"),
                     ("two.html", "x & y z")]


def test_anchor_postings_matches_intended_graph(tmp_path, ray_session):
    from fixtures.gen import generate_corpus

    from aspseek_ray.pipelines.index_products import anchor_postings

    d = tmp_path / "c"
    generate_corpus(str(d), n_pages=250, n_hosts=10, seed=5)
    got = anchor_postings(str(d / "pages.parquet")).to_pandas()
    con = duckdb.connect()
    want = con.execute(f"""
        WITH a AS (SELECT dst_url AS url,
                          unnest(list_distinct(list_filter(
                              regexp_split_to_array(lower(anchor),
                                                    '[^a-z0-9]+'),
                              x -> x <> ''))) AS word
                   FROM read_parquet('{d}/links.parquet'))
        SELECT word, url, COUNT(*) AS n_refs FROM a
        GROUP BY word, url ORDER BY word, url
    """).df()
    got = got.sort_values(["word", "url"]).reset_index(drop=True)
    want = want.sort_values(["word", "url"]).reset_index(drop=True)
    want["n_refs"] = want["n_refs"].astype(got["n_refs"].dtype)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 100


def test_anchor_boosted_search_plans_equal(tmp_path, ray_session):
    """Driver and forced-distributed anchor-boost plans are bitwise equal,
    and the boost actually reorders vs pure body tf-idf on the fixture."""
    from fixtures.gen import generate_corpus

    from aspseek_ray.pipelines import search
    from aspseek_ray.pipelines.crawl import CrawlConfig, run_crawl

    d = tmp_path / "c"
    generate_corpus(str(d), n_pages=200, n_hosts=8, seed=9)
    out = tmp_path / "run"
    run_crawl(str(d), str(out), CrawlConfig(per_host_per_round=50,
                                            max_rounds=3, num_shards=4,
                                            num_page_buckets=8))
    from fixtures.gen import _vocab

    store, pages = f"{out}/store", f"{d}/pages.parquet"
    terms = tuple(_vocab()[:3])
    a = search.anchor_boosted_search(store, pages, terms)
    b = search.anchor_boosted_search(store, pages, terms,
                                     driver_max_docs=0)
    assert a.equals(b), (a.to_pandas(), b.to_pandas())
    assert a.num_rows > 0
    # alpha=0 degrades to pure body ranking; boost must change some score
    base = search.anchor_boosted_search(store, pages, terms, alpha=0.0)
    sa = dict(zip(a["url"].to_pylist(), a["score"].to_pylist()))
    sb = dict(zip(base["url"].to_pylist(), base["score"].to_pylist()))
    shared = set(sa) & set(sb)
    assert any(sa[u] != sb[u] for u in shared)
