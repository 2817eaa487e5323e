"""Round-3 additions: site-grouped results in the crawl search lifecycle
(O31 over crawl products), embedding near-dup size switch, offer
vectorization invariants."""

import math

import pyarrow as pa
import pyarrow.parquet as pq


def _mini_crawl_products(tmp_path):
    """Tiny store + pages pair: 4 urls on 3 hosts in a link cycle (uniform
    pagerank by symmetry -> popularity factor is a constant 2.0)."""
    urls = ["http://a.example/", "http://a.example/p.html",
            "http://b.example/", "http://c.example/"]
    texts = ["foo foo foo", "foo foo", "foo bar", "bar"]
    nxt = urls[1:] + urls[:1]
    htmls = [f'<p><a href="{n}">x</a></p>'.encode() for n in nxt]
    store = tmp_path / "store"
    store.mkdir()
    pq.write_table(pa.table({"url": urls, "text": texts}),
                   store / "part-0.parquet")
    pages = tmp_path / "pages.parquet"
    pq.write_table(pa.table({"url": urls, "html": pa.array(htmls, pa.binary())}),
                   pages)
    return str(store), str(pages)


def test_site_grouped_search_hand_oracle(ray_session, tmp_path):
    from aspseek_ray.pipelines.search import ranked_crawl_search

    store, pages = _mini_crawl_products(tmp_path)
    idf = math.log(4 / 3)          # N=4 docs, df(foo)=3
    s = {u: tf * idf * 2.0 for u, tf in
         [("http://a.example/", 3), ("http://a.example/p.html", 2),
          ("http://b.example/", 1)]}

    out = ranked_crawl_search(store, pages, ("foo",), per_site=1)
    assert out.schema.names == ["host", "url", "score", "excerpt"]
    assert out["host"].to_pylist() == ["a.example", "b.example"]
    assert out["url"].to_pylist() == ["http://a.example/", "http://b.example/"]
    got = out["score"].to_pylist()
    assert got[0] == round(s["http://a.example/"], 4)
    assert got[1] == round(s["http://b.example/"], 4)
    assert all("foo" in e for e in out["excerpt"].to_pylist())

    out2 = ranked_crawl_search(store, pages, ("foo",), per_site=2)
    assert out2["url"].to_pylist() == [
        "http://a.example/", "http://a.example/p.html", "http://b.example/"]

    # k cuts in host-major order
    out3 = ranked_crawl_search(store, pages, ("foo",), k=2, per_site=2)
    assert out3["url"].to_pylist() == ["http://a.example/",
                                       "http://a.example/p.html"]

    # per_site=None keeps the ungrouped contract (no host column)
    out4 = ranked_crawl_search(store, pages, ("foo",))
    assert out4.schema.names == ["url", "score", "excerpt"]
    assert out4["url"].to_pylist() == [
        "http://a.example/", "http://a.example/p.html", "http://b.example/"]


def test_parsed_query_crawl_lifecycle(ray_session, tmp_path):
    """qparser -> boolean admissibility -> rank -> excerpt over the crawl
    store (the full s.cgi lifecycle): negation excludes, AND restricts,
    phrases need contiguity, and scoring uses only positive terms."""
    from aspseek_ray.pipelines.search import ranked_crawl_search

    store, pages = _mini_crawl_products(tmp_path)

    # plain term via query string == terms tuple
    out = ranked_crawl_search(store, pages, query="foo")
    assert out["url"].to_pylist() == [
        "http://a.example/", "http://a.example/p.html", "http://b.example/"]

    # NOT excludes the doc containing bar
    out = ranked_crawl_search(store, pages, query="foo NOT bar")
    assert out["url"].to_pylist() == [
        "http://a.example/", "http://a.example/p.html"]

    # AND restricts to the co-occurrence doc
    out = ranked_crawl_search(store, pages, query="foo bar")
    assert out["url"].to_pylist() == ["http://b.example/"]

    # phrase requires contiguity: only the multi-foo docs
    out = ranked_crawl_search(store, pages, query='"foo foo"')
    assert out["url"].to_pylist() == [
        "http://a.example/", "http://a.example/p.html"]

    # OR admits all docs; bar's rarity (df=2 vs 3) reorders nothing here
    out = ranked_crawl_search(store, pages, query="foo OR bar")
    assert set(out["url"].to_pylist()) == {
        "http://a.example/", "http://a.example/p.html",
        "http://b.example/", "http://c.example/"}

    # site grouping composes with the parsed query
    out = ranked_crawl_search(store, pages, query="foo", per_site=1)
    assert out.schema.names == ["host", "url", "score", "excerpt"]
    assert out["url"].to_pylist() == ["http://a.example/",
                                      "http://b.example/"]


def test_ranked_search_plans_agree(ray_session, tmp_path):
    """The distributed ranked-search plan (driver_max_docs=0 forces it)
    must equal the driver plan exactly — including qparser admissibility,
    per-site capping, tiebreaks and excerpts — on a multi-block store."""
    import random

    from aspseek_ray.pipelines.search import ranked_crawl_search

    rng = random.Random(5)
    words = ["foo", "bar", "baz", "qux", "slow"]
    store = tmp_path / "store"
    store.mkdir()
    urls, texts, htmls = [], [], []
    for h in range(8):
        for p in range(8):
            u = f"http://h{h}.example/p{p}.html"
            urls.append(u)
            texts.append(" ".join(rng.choice(words)
                                  for _ in range(rng.randint(3, 12))))
    nxt = urls[1:] + urls[:1]
    for n in nxt:
        htmls.append(f'<p><a href="{n}">x</a></p>'.encode())
    # 4 separate files -> multiple blocks through the distributed path
    for i in range(4):
        sl = slice(i * 16, (i + 1) * 16)
        pq.write_table(pa.table({"url": urls[sl], "text": texts[sl]}),
                       store / f"part-{i}.parquet")
    pages = tmp_path / "pages.parquet"
    pq.write_table(pa.table({"url": urls,
                             "html": pa.array(htmls, pa.binary())}), pages)

    cases = [dict(terms=("foo",)), dict(terms=("foo", "bar"), k=7),
             dict(terms=("foo",), per_site=2),
             dict(query="foo OR bar", per_site=1, k=5),
             dict(query="foo NOT slow"),
             dict(query='"foo bar" OR qux', per_site=3)]
    for kwargs in cases:
        a = ranked_crawl_search(str(store), str(pages), **kwargs)
        b = ranked_crawl_search(str(store), str(pages),
                                driver_max_docs=0, **kwargs)
        assert a.equals(b), (kwargs, a.to_pydict(), b.to_pydict())


def test_embedding_near_dup_size_switch(ray_session):
    """The bucketed (IVF) plan of embedding_near_dup_pairs: with one
    cluster it must EQUAL the exact broadcast plan (same pairs, same
    cosines); with several clusters it must emit only exact pairs
    (no false positives, each exactly once)."""
    from aspseek_ray.pipelines import dedup

    sf = "/root/testdata/sf0.001"
    exact = dedup.embedding_near_dup_pairs(sf, threshold=0.4)
    e = {(a, b): c for a, b, c in zip(exact["vec_a"].to_pylist(),
                                      exact["vec_b"].to_pylist(),
                                      exact["cosine"].to_pylist())}
    assert e, "fixture has no near-dup pairs at 0.4 — test is vacuous"

    one = dedup.embedding_near_dup_pairs(sf, threshold=0.4,
                                         broadcast_max_rows=0,
                                         n_clusters=1, n_assign=1)
    g = {(a, b): c for a, b, c in zip(one["vec_a"].to_pylist(),
                                     one["vec_b"].to_pylist(),
                                     one["cosine"].to_pylist())}
    assert g == e

    multi = dedup.embedding_near_dup_pairs(sf, threshold=0.4,
                                           broadcast_max_rows=0,
                                           n_clusters=8, n_assign=2)
    pairs = list(zip(multi["vec_a"].to_pylist(), multi["vec_b"].to_pylist()))
    assert len(pairs) == len(set(pairs))          # exactly-once emission
    assert set(pairs) <= set(e)                   # no false pairs
    for (a, b), c in zip(pairs, multi["cosine"].to_pylist()):
        assert c == e[(a, b)]
