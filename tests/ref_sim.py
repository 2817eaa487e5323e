"""Normative single-threaded crawl simulator (SURVEY.md §5.1) — the
obviously-correct heaps-and-dicts implementation of the crawl semantics
(FIXTURES.md §4). The Ray pipeline must reproduce its trace and seen-set
EXACTLY. This file is the executable spec; keep it simple.

Pinned semantics (FIXTURES.md §4.1 + addendum):
  * per round, each host pops up to its effective budget
    (CrawlConfig.effective_budget — honors crawl_delay_ms) from a min-heap
    ordered by (depth, discovery_seq);
  * fetch_seq orders rows by (round, host lexicographic, heap-pop order) —
    a dense global counter;
  * status 200 if url in pages else 404;
  * discovery processes fetched 200-pages in fetch_seq order, links in
    document order; discovery_seq of a first-seen url =
    (parent_fetch_seq + 1) * 2**20 + link_idx  — sparse but
    order-isomorphic to a dense first-discovery counter (seeds keep their
    file-order seq 0..n-1 < 2**20);
  * never enqueued: non-http(s), depth > max_hops, robots-disallowed
    (path-prefix match), disallow_patterns regex match, already seen;
  * max_docs > 0 truncates scheduling mid-round after the (host, pop-order)
    sort (reference `index -n`, O32).
"""

from __future__ import annotations

import heapq
import re
from dataclasses import dataclass, field

from aspseek_ray.config import CrawlConfig
from aspseek_ray.functions.html import extract_links, extract_meta_robots
from aspseek_ray.functions.url import canonicalize, host_of
from urllib.parse import urlsplit

DISC_SHIFT = 1 << 20  # max links per page assumed < 2**20


@dataclass
class SimResult:
    trace: list[dict] = field(default_factory=list)   # TRACE schema rows
    seen: set[str] = field(default_factory=set)        # final url-seen set


def robots_denied(path: str, rules: list[str]) -> bool:
    return any(path.startswith(r) for r in rules)


def simulate(pages: dict[str, bytes], seeds: list[str],
             robots: dict[str, tuple[list[str], int]],
             cfg: CrawlConfig,
             redirects: dict[str, str] | None = None) -> SimResult:
    """pages: url -> html; seeds: canonical urls in file order;
    robots: host -> (rules, crawl_delay_ms); redirects: alias url ->
    target url (fetching an alias yields status 301 and offers the target
    hop-preserving with seq (pfseq+1)*2**20 — SURVEY O11/O25)."""
    redirects = redirects or {}
    res = SimResult()
    heaps: dict[str, list] = {}
    filters = [re.compile(p) for p in cfg.disallow_patterns]
    # follow-mode restriction sets (O3: Server mode site/path/world)
    seed_hosts = {host_of(s) for s in seeds}
    seed_prefixes = tuple({s[: s.rfind("/") + 1] for s in seeds})

    def offer(url: str, depth: int, seq: int) -> None:
        if url in res.seen:
            return
        if depth > cfg.max_hops:
            return
        host = host_of(url)
        if cfg.follow_mode == "site" and host not in seed_hosts:
            return
        if cfg.follow_mode == "path" and not url.startswith(seed_prefixes):
            return
        rules, _ = robots.get(host, ([], 0))
        if robots_denied(urlsplit(url).path or "/", rules):
            return
        if any(f.search(url) for f in filters):
            return
        res.seen.add(url)
        heapq.heappush(heaps.setdefault(host, []), (depth, seq, url))

    for i, s in enumerate(seeds):
        offer(s, 0, i)

    fetch_seq = 0
    for rnd in range(cfg.max_rounds):
        scheduled: list[tuple[str, int, int, str]] = []  # (host, pop_idx, ...) in host-lex order
        for host in sorted(h for h, hp in heaps.items() if hp):
            _, delay = robots.get(host, ([], 0))
            budget = cfg.effective_budget(delay)
            hp = heaps[host]
            for pop_idx in range(budget):
                if not hp:
                    break
                depth, seq, url = heapq.heappop(hp)
                scheduled.append((host, depth, seq, url))
        if cfg.max_docs:
            remaining = cfg.max_docs - fetch_seq
            if remaining <= 0:
                break
            dropped = scheduled[remaining:]
            scheduled = scheduled[:remaining]
            # urls cut by the cap go back to their heaps (still pending)
            for host, depth, seq, url in dropped:
                heapq.heappush(heaps[host], (depth, seq, url))
        if not scheduled:
            break

        fetched = []
        for host, depth, seq, url in scheduled:
            if url in pages:
                status = 200
            elif url in redirects:
                status = 301
            else:
                status = 404
            res.trace.append(
                dict(fetch_seq=fetch_seq, round=rnd, url=url, host=host,
                     depth=depth, discovery_seq=seq, status=status)
            )
            fetched.append((fetch_seq, url, depth, status))
            fetch_seq += 1

        for pfseq, url, depth, status in fetched:
            if status == 301:
                # hop-preserving redirect target (O11)
                offer(redirects[url], depth, (pfseq + 1) * DISC_SHIFT)
                continue
            if status != 200:
                continue
            if "nofollow" in extract_meta_robots(pages[url]):
                continue             # meta-robots nofollow (O6): no outlinks
            base, hrefs = extract_links(pages[url])
            eff = base or url
            for link_idx, h in enumerate(hrefs):
                c = canonicalize(h, eff)
                if c is None:
                    continue
                offer(c, depth + 1, (pfseq + 1) * DISC_SHIFT + link_idx)
    return res


def load_corpus(corpus_dir: str):
    """(pages, seeds, robots) dicts from a generated corpus directory."""
    import pyarrow.parquet as pq

    pt = pq.read_table(f"{corpus_dir}/pages.parquet", columns=["url", "html"])
    pages = dict(zip(pt["url"].to_pylist(), pt["html"].to_pylist()))
    st = pq.read_table(f"{corpus_dir}/seeds.parquet")
    seeds = st["url"].to_pylist()
    rt = pq.read_table(f"{corpus_dir}/robots.parquet")
    robots = {
        h: (r or [], d)
        for h, r, d in zip(rt["host"].to_pylist(), rt["rules"].to_pylist(),
                           rt["crawl_delay_ms"].to_pylist())
    }
    import os

    redirects: dict[str, str] = {}
    rp = f"{corpus_dir}/redirects.parquet"
    if os.path.exists(rp):
        rtab = pq.read_table(rp)
        redirects = dict(zip(rtab["src_url"].to_pylist(),
                             rtab["dst_url"].to_pylist()))
    return pages, seeds, robots, redirects
