"""Deterministic synthetic Common-Crawl-style corpus generator
(FIXTURES.md §1–§3: pages / seeds / robots tables). Self-contained, seeded,
no external data (BASELINE.json:north_rule).

The ``text`` column is derived with the engine's own normative
``extract_text`` at build time, which is what makes the "byte-identical
extracted text per url" invariant testable (FIXTURES.md §1).

Every generated href is constructed so that
``canonicalize(href, effective_base)`` equals its intended target URL —
asserted by tests/test_fixtures.py.

Usage:
    from fixtures.gen import generate_corpus
    generate_corpus("/tmp/corpus", n_pages=2000, n_hosts=40, seed=42)
"""

from __future__ import annotations

import posixpath
from pathlib import Path
from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aspseek_ray.functions.html import extract_text

_VOCAB = None


def _vocab() -> list[str]:
    global _VOCAB
    if _VOCAB is None:
        rng = np.random.Generator(np.random.PCG64(7))
        cons = "bcdfghjklmnprstvwz"
        vow = "aeiou"
        words = []
        for _ in range(1000):
            n = rng.integers(2, 5)
            w = "".join(
                cons[rng.integers(len(cons))] + vow[rng.integers(len(vow))]
                for _ in range(n)
            )
            words.append(w)
        _VOCAB = words
    return _VOCAB


_ENTITIES = ["&amp;", "&lt;", "&gt;", "&quot;", "&nbsp;", "&#65;", "&#x42;"]


def _sentence(rng: np.random.Generator, nmin=4, nmax=14, entity_p=0.1) -> str:
    v = _vocab()
    n = int(rng.integers(nmin, nmax))
    words = [v[int(rng.integers(len(v)))] for _ in range(n)]
    if rng.random() < entity_p:
        words.insert(int(rng.integers(len(words))), _ENTITIES[int(rng.integers(len(_ENTITIES)))])
    return " ".join(words)


def _host_page_counts(n_pages: int, n_hosts: int, rng: np.random.Generator) -> np.ndarray:
    """Zipf(a=1.3)-shaped host sizes (hot-host skew on purpose), summing to
    n_pages, every host >= 1 page."""
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    w = ranks ** -1.3
    w /= w.sum()
    counts = np.maximum(1, np.floor(w * n_pages).astype(np.int64))
    # distribute remainder to the largest hosts deterministically
    i = 0
    while counts.sum() < n_pages:
        counts[i % n_hosts] += 1
        i += 1
    while counts.sum() > n_pages:
        j = int(np.argmax(counts))
        counts[j] -= 1
    return counts


def _gen_paths(m: int, rng: np.random.Generator) -> list[str]:
    """m unique paths for one host: '/', dir index pages, leaf pages,
    depth <= 5 (FIXTURES §1)."""
    paths = ["/"]
    seen = {"/"}
    dirs = ["/"]
    while len(paths) < m:
        r = rng.random()
        if r < 0.15 and len(dirs) < max(2, m // 4):
            parent = dirs[int(rng.integers(len(dirs)))]
            if parent.count("/") <= 4:  # depth cap
                d = f"{parent}d{int(rng.integers(0, 9))}/"
                if d not in seen:
                    seen.add(d)
                    dirs.append(d)
                    paths.append(d)
                continue
        parent = dirs[int(rng.integers(len(dirs)))]
        p = f"{parent}p{int(rng.integers(0, max(10, m)))}.html"
        if rng.random() < 0.05:
            p += f"?a={int(rng.integers(0, 5))}&b={int(rng.integers(0, 5))}"
        if p not in seen:
            seen.add(p)
            paths.append(p)
    return paths[:m]


def _split_query(path: str) -> tuple[str, str]:
    if "?" in path:
        p, q = path.split("?", 1)
        return p, q
    return path, ""


def _render_href(target_url: str, target_path: str, base_url: str, base_path: str,
                 same_host: bool, rng: np.random.Generator) -> str:
    """Render target as relative / absolute-path / absolute such that
    canonicalize(href, base_url) == target_url."""
    tpath, tquery = _split_query(target_path)
    if not same_host or tquery:
        # cross-host or query-bearing: absolute only (keeps resolution trivial)
        return target_url
    style = rng.random()
    if style < 0.4:
        return target_url
    if style < 0.7:
        return target_path  # absolute-path
    # relative to base dir
    bpath, _ = _split_query(base_path)
    bdir = bpath if bpath.endswith("/") else posixpath.dirname(bpath) or "/"
    rel = posixpath.relpath(tpath, bdir)
    if tpath.endswith("/") and not rel.endswith("/"):
        rel += "/"
    if rel in (".", "./"):
        return target_path
    return rel


def _resolve_link(href: str, base_url: str) -> str | None:
    """INDEPENDENT ground-truth resolution of a generated href (stdlib
    urljoin + fragment strip), used to emit links.parquet — the intended
    link graph the engine's extract_links+canonicalize must reproduce.
    Valid for generator output only: generated URLs are already canonical
    (lowercase hosts, no ports, sorted queries), so no further
    normalization is needed here; urljoin collapses the ``../`` segments
    relative hrefs contain."""
    href = href.strip()
    u = urljoin(base_url, href)
    u = u.partition("#")[0]
    if not u.startswith("http://"):
        return None      # mailto: etc.
    return u


def _gen_html(rng: np.random.Generator, title: str, hrefs: list[str],
              base_href: str | None, block_scale: int = 1,
              ) -> tuple[bytes, list[tuple[str, str]]]:
    """Returns (html_bytes, anchors) where anchors = [(href, anchor_text)]
    in RENDERED document order — the intended ground truth for the anchor
    column of links.parquet (sentence capture consumes no extra RNG
    draws; the meta-robots roll below does — corpus v6)."""
    anchors: list[tuple[str, str]] = []
    parts = ["<html><head><title>", title, "</title>"]
    if rng.random() < 0.5:
        parts.append(f'<meta name="description" content="{_sentence(rng, 3, 8, 0)}">')
    if rng.random() < 0.3:
        parts.append(f'<meta name="keywords" content="{_sentence(rng, 2, 5, 0)}">')
    # meta-robots pages (O6 policy vectors): ~2% nofollow, ~2% noindex,
    # ~1% both. nofollow pages keep their INTENDED links in links.parquet
    # (the citation-graph ground truth) — only crawl discovery skips them.
    mr = rng.random()
    if mr < 0.02:
        parts.append('<meta name="robots" content="nofollow">')
    elif mr < 0.04:
        parts.append('<meta name="robots" content="noindex">')
    elif mr < 0.05:
        parts.append('<meta name="robots" content="noindex,nofollow">')
    if base_href:
        parts.append(f'<base href="{base_href}">')
    parts.append("</head><body>")
    n_blocks = int(rng.integers(2, 8)) + 3 * (block_scale - 1)
    href_slots = list(hrefs)
    rng.shuffle(href_slots)  # anchor order within page is seeded
    for b in range(n_blocks):
        kind = rng.random()
        if kind < 0.15:
            parts.append(f"<h{int(rng.integers(1, 4))}>{_sentence(rng, 2, 6)}</h{int(rng.integers(1, 4))}>")
        elif kind < 0.55:
            body = " ".join(_sentence(rng) for _ in range(block_scale))
            if href_slots and rng.random() < 0.8:
                a = href_slots.pop()
                atext = _sentence(rng, 1, 3, 0)
                anchors.append((a, atext))
                body += f' <a href="{a}">{atext}</a> {_sentence(rng, 2, 6)}'
            parts.append(f"<p>{body}</p>")
        elif kind < 0.7:
            parts.append(f"<div>{' '.join(_sentence(rng) for _ in range(block_scale))}</div>")
        elif kind < 0.8:
            items = "".join(f"<li>{_sentence(rng, 2, 5)}</li>" for _ in range(int(rng.integers(2, 5))))
            parts.append(f"<ul>{items}</ul>")
        elif kind < 0.9:
            parts.append(f"<script>var x_{b} = '{_sentence(rng, 2, 4, 0)}';</script>")
        elif kind < 0.96:
            parts.append(f"<style>.c{b} {{ margin: {int(rng.integers(0, 9))}px }}</style>")
        else:
            parts.append(f"<!-- {_sentence(rng, 2, 5, 0)} -->")
    # remaining anchors get their own paragraphs
    for a in href_slots:
        atext = _sentence(rng, 1, 3, 0)
        anchors.append((a, atext))
        parts.append(f'<p><a href="{a}">{atext}</a></p>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8"), anchors


def generate_corpus(out_dir: str, n_pages: int = 2000, n_hosts: int = 40,
                    seed: int = 42, n_seeds: int = 8,
                    clone_fraction: float = 0.03,
                    block_scale: int = 1) -> dict[str, str]:
    """block_scale multiplies per-page content blocks: 1 ≈ 3 KB pages
    (fast unit/conformance tests); 8–10 ≈ 20–30 KB (Common-Crawl-realistic
    pages for throughput benchmarking)."""
    """Write pages.parquet / seeds.parquet / robots.parquet to ``out_dir``.
    Returns {"pages": path, "seeds": path, "robots": path}."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(seed))

    hosts = [f"host{h:03d}.example" for h in range(n_hosts)]
    counts = _host_page_counts(n_pages, n_hosts, rng)

    host_paths: dict[str, list[str]] = {}
    url_list: list[tuple[str, str, str]] = []  # (url, host, path)
    for host, m in zip(hosts, counts):
        paths = _gen_paths(int(m), rng)
        host_paths[host] = paths
        for p in paths:
            url_list.append((f"http://{host}{p}", host, p))

    url_set = {u for u, _, _ in url_list}
    urls_by_host = {h: [(f"http://{h}{p}", p) for p in ps] for h, ps in host_paths.items()}

    # redirect aliases (reference 301/302 handling, SURVEY O11/O25): short
    # alias urls (not in pages) that 301 to a real page; some links route
    # through them. alias -> target, same host as target.
    redirect_of: dict[str, str] = {}

    def alias_for(target_url: str, target_host: str) -> str:
        a = f"http://{target_host}/r/{len(redirect_of):04d}"
        redirect_of[a] = target_url
        return a

    # --- generate html per page -------------------------------------------
    htmls: list[bytes] = []
    page_hrefs: list[list[str]] = []   # raw hrefs per page (doc-order-free)
    page_base: list[str | None] = []   # the page's <base href>, if any
    page_anchors: list[list[tuple[str, str]]] = []  # (href, text), doc order
    for url, host, path in url_list:
        k = int(rng.integers(0, 13))  # k in [0,12] real links
        own = urls_by_host[host]
        hrefs: list[str] = []
        base_href = None
        base_url = url
        if rng.random() < 0.05:
            # same-host <base href> pointing at host root or own dir
            ppath, _ = _split_query(path)
            bdir = ppath if ppath.endswith("/") else (posixpath.dirname(ppath) or "/")
            base_path = "/" if rng.random() < 0.5 else bdir
            if not base_path.endswith("/"):
                base_path += "/"
            base_href = f"http://{host}{base_path}"
            base_url = base_href
        base_path_eff = urlsplit(base_url).path or "/"
        for _ in range(k):
            if rng.random() < 0.9:
                # existing target: 80% same host, 20% other host
                if rng.random() < 0.8 or len(hosts) == 1:
                    tu, tp = own[int(rng.integers(len(own)))]
                    th = host
                    same = True
                else:
                    oh = hosts[int(rng.integers(len(hosts)))]
                    cand = urls_by_host[oh]
                    tu, tp = cand[int(rng.integers(len(cand)))]
                    th = oh
                    same = oh == host
                if rng.random() < 0.05:
                    # route via a 301 alias (absolute only)
                    hrefs.append(alias_for(tu, th))
                    continue
            else:
                # dangling same-host target (-> 404 path)
                tp = f"/missing/m{int(rng.integers(0, 10_000))}.html"
                tu = f"http://{host}{tp}"
                same = True
                if tu in url_set:
                    continue
            hrefs.append(_render_href(tu, tp, base_url, base_path_eff, same, rng))
        # per-page specials (FIXTURES §1): fragment link, '#'-only, mailto
        tu, tp = own[int(rng.integers(len(own)))]
        hrefs.append(tu + "#sec1")
        hrefs.append("#")
        hrefs.append("mailto:owner@" + host)
        title = _sentence(rng, 2, 6, 0.05)
        html_bytes, anchors = _gen_html(rng, title, hrefs, base_href,
                                        block_scale)
        htmls.append(html_bytes)
        page_hrefs.append(hrefs)
        page_base.append(base_href)
        page_anchors.append(anchors)

    # exact-clone injection (mirrors / boilerplate dupes — O23 clone
    # detection needs real duplicate bodies): ~clone_fraction of non-root
    # pages copy an earlier page's html byte-for-byte.
    if clone_fraction > 0 and len(htmls) > 10:
        n_clones = int(len(htmls) * clone_fraction)
        for _ in range(n_clones):
            dst = int(rng.integers(1, len(htmls)))
            src = int(rng.integers(0, dst))
            if url_list[dst][2] == "/":      # keep host roots unique
                continue
            htmls[dst] = htmls[src]
            # the clone carries the source's anchors and <base href>; its
            # RELATIVE hrefs re-resolve against the clone's own url when
            # no <base> is present — track that for links.parquet
            page_hrefs[dst] = page_hrefs[src]
            page_base[dst] = page_base[src]
            page_anchors[dst] = page_anchors[src]

    texts = [extract_text(h) for h in htmls]
    n = len(url_list)
    base_ts = np.int64(1767225600)  # 2026-01-01T00:00:00Z
    warc_ts = pa.array(base_ts + np.arange(n, dtype=np.int64), type=pa.timestamp("s"))
    lang_choice = rng.random(n)
    langs = np.where(lang_choice < 0.95, "en", np.where(lang_choice < 0.98, "de", "fr"))

    pages = pa.table(
        {
            "url": pa.array([u for u, _, _ in url_list]),
            "warc_ts": warc_ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
        }
    )
    pq.write_table(pages, out / "pages.parquet")

    # --- seeds: one per largest hosts + one small host (FIXTURES §2.1) ----
    order = np.argsort(-counts, kind="stable")
    seed_hosts = [hosts[i] for i in order[: n_seeds - 1]] + [hosts[int(order[-1])]]
    seeds = pa.table(
        {
            "url": pa.array([f"http://{h}/" for h in seed_hosts]),
            "depth": pa.array([0] * len(seed_hosts), type=pa.int32()),
            "discovery_seq": pa.array(list(range(len(seed_hosts))), type=pa.int64()),
        }
    )
    pq.write_table(seeds, out / "seeds.parquet")

    # --- robots (FIXTURES §2.2) -------------------------------------------
    rules, delays = [], []
    deny_all_host = hosts[int(order[min(2, n_hosts - 1)])]  # a mid-size host denies everything
    for h in hosts:
        r: list[str] = []
        if h == deny_all_host:
            r = ["/"]
        elif rng.random() < 0.2:
            r = ["/d0/"]
        rules.append(r)
        dr = rng.random()
        delays.append(0 if dr < 0.8 else (500 if dr < 0.9 else 1000))
    robots = pa.table(
        {
            "host": pa.array(hosts),
            "rules": pa.array(rules, type=pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(delays, type=pa.int64()),
        }
    )
    pq.write_table(robots, out / "robots.parquet")

    redirects = pa.table({
        "src_url": pa.array(list(redirect_of.keys()), pa.string()),
        "dst_url": pa.array(list(redirect_of.values()), pa.string()),
    })
    pq.write_table(redirects, out / "redirects.parquet")

    # --- intended link graph (ground truth for O26/O28 oracles) -----------
    # One row per distinct (src, dst) anchor target, resolved by the
    # INDEPENDENT stdlib resolver above — same per-page dedup semantics as
    # the engine's extract_link_edges (skip self-links, first occurrence
    # wins; the set is order-free). dst may be an alias / 404 url not in
    # pages — consumers filter to their node universe.
    l_src: list[str] = []
    l_dst: list[str] = []
    l_anchor: list[str] = []
    for (url, _h, _p), anchors, bh in zip(url_list, page_anchors, page_base):
        base = bh or url
        seen_l: set[str] = set()
        # iterate in RENDERED document order so the anchor text attributed
        # to a deduped (src, dst) edge is the first occurrence's — the same
        # rule the engine's extract_anchors pass applies. The (src, dst)
        # set is unchanged from the pre-anchor builder (every href renders
        # exactly once).
        for h, atext in anchors:
            c = _resolve_link(h, base)
            if c is None or c == url or c in seen_l:
                continue
            seen_l.add(c)
            l_src.append(url)
            l_dst.append(c)
            l_anchor.append(atext)
    links = pa.table({"src_url": pa.array(l_src, pa.string()),
                      "dst_url": pa.array(l_dst, pa.string()),
                      "anchor": pa.array(l_anchor, pa.string())})
    pq.write_table(links, out / "links.parquet")

    return {
        "pages": str(out / "pages.parquet"),
        "seeds": str(out / "seeds.parquet"),
        "robots": str(out / "robots.parquet"),
        "redirects": str(out / "redirects.parquet"),
        "links": str(out / "links.parquet"),
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--pages", type=int, default=2000)
    ap.add_argument("--hosts", type=int, default=40)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(generate_corpus(args.out_dir, args.pages, args.hosts, args.seed))
