"""Corpus generator self-checks (FIXTURES.md §1–2): determinism, the
byte-identical text invariant, and href-resolution correctness."""

import pyarrow.parquet as pq

from aspseek_ray.functions.html import extract_text, extract_links
from aspseek_ray.functions.url import canonicalize, host_of
from fixtures.gen import generate_corpus


def test_corpus_properties(tmp_path):
    d1 = tmp_path / "c1"
    paths = generate_corpus(str(d1), n_pages=300, n_hosts=12, seed=42)
    pages = pq.read_table(paths["pages"])
    assert pages.num_rows == 300
    assert pages.schema.names == ["url", "warc_ts", "html", "text", "lang"]

    urls = pages["url"].to_pylist()
    assert len(set(urls)) == 300  # unique, canonical
    for u in urls:
        assert canonicalize(u) == u, f"not canonical: {u}"

    # byte-identical text invariant
    for html, text in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert extract_text(html) == text

    # every rendered href resolves to an http(s) url on some host, or None (mailto)
    url_set = set(urls)
    n_links = n_dangling = 0
    for url, html in zip(urls, pages["html"].to_pylist()):
        base, hrefs = extract_links(html)
        eff = base or url
        if base:
            assert host_of(base) == host_of(url)  # generator keeps base same-host
        for h in hrefs:
            c = canonicalize(h, eff)
            if h.startswith("mailto:"):
                assert c is None
                continue
            assert c is not None, (url, h)
            n_links += 1
            if c not in url_set:
                n_dangling += 1
                assert "/missing/" in c or "#" not in h
    assert n_links > 300
    assert 0 < n_dangling < n_links * 0.25

    # determinism: same seed -> byte-identical tables
    d2 = tmp_path / "c2"
    paths2 = generate_corpus(str(d2), n_pages=300, n_hosts=12, seed=42)
    assert pq.read_table(paths2["pages"]).equals(pages)

    # seeds & robots shape
    seeds = pq.read_table(paths["seeds"])
    assert seeds.num_rows == 8
    assert all(u.endswith("/") for u in seeds["url"].to_pylist())
    robots = pq.read_table(paths["robots"])
    assert robots.num_rows == 12
    assert any(r == ["/"] for r in robots["rules"].to_pylist())


def test_links_parquet_matches_engine_edges(tmp_path):
    """links.parquet (the generator's INTENDED link graph, resolved by the
    independent stdlib resolver) must equal the engine's
    extract_links+canonicalize edge set — including cloned pages, whose
    relative hrefs re-resolve against the clone's own url."""
    d = tmp_path / "c"
    paths = generate_corpus(str(d), n_pages=300, n_hosts=12, seed=42)
    pages = pq.read_table(paths["pages"])
    want = set()
    for url, html in zip(pages["url"].to_pylist(), pages["html"].to_pylist()):
        base, hrefs = extract_links(html)
        eff = base or url
        for h in hrefs:
            c = canonicalize(h, eff)
            if c is not None and c != url:
                want.add((url, c))
    links = pq.read_table(paths["links"])
    got = set(zip(links["src_url"].to_pylist(), links["dst_url"].to_pylist()))
    assert got == want
    assert len(got) == links.num_rows  # per-page dedup leaves no dup rows


def test_host_skew(tmp_path):
    generate_corpus(str(tmp_path / "c"), n_pages=500, n_hosts=20, seed=1)
    pages = pq.read_table(str(tmp_path / "c" / "pages.parquet"))
    from collections import Counter

    sizes = Counter(host_of(u) for u in pages["url"].to_pylist())
    top = max(sizes.values())
    assert top > 500 / 20 * 3  # Zipf head is much larger than uniform share
