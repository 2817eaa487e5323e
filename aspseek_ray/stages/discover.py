"""Parse + discovery stage (SURVEY.md O6 parse, O1 canonicalize, O3 depth
filter, O22 within-batch partial dedup; reference: src/html.cpp href
extraction + src/hrefs.cpp insertion).

Input batch: fetched rows (url, host, depth, discovery_seq, fetch_seq,
status, html). Output: candidate rows (url, url_hash, host, host_hash,
depth, discovery_seq) — one per first-in-batch occurrence of a canonical
outlink. discovery_seq of a candidate is the pinned sparse stamp
(parent_fetch_seq + 1) * 2**20 + link_idx (see tests/ref_sim.py docstring);
order-isomorphic to a dense first-discovery counter, so heap ordering
matches the normative simulator without any global ranking shuffle.

Robots / seen / cross-batch dedup are NOT applied here — those live in the
CrawlShard actors (arrival-order-independent staging min-rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aspseek_ray.functions.hashing import fnv1a64_arrow
from aspseek_ray.functions.html import extract_links
from aspseek_ray.functions.url import canonicalize, host_of_arrow

DISC_SHIFT = 1 << 20


def parse_discover(batch: pa.Table, max_hops: int,
                   parsed: dict[int, tuple[str | None, list[str]]] | None = None,
                   ) -> pa.Table:
    """``parsed`` (optional): {row index -> (base_href, hrefs)} already
    extracted by a fused upstream pass (crawl.FetchTraceDiscover stores
    text + links from ONE noise-strip per body); rows absent from the dict
    fall back to extract_links here."""
    urls = batch["url"].to_pylist()
    depths = batch["depth"].to_pylist()
    fseqs = batch["fetch_seq"].to_pylist()
    statuses = batch["status"].to_pylist()
    htmls = batch["html"].to_pylist()
    redirects = (batch["redirect"].to_pylist() if "redirect" in batch.schema.names
                 else [None] * batch.num_rows)

    c_urls: list[str] = []
    c_depths: list[int] = []
    c_seqs: list[int] = []
    best: dict[str, int] = {}  # url -> index into lists (partial dedup, min seq)

    def add(c: str, nd: int, seq: int) -> None:
        j = best.get(c)
        if j is None:
            best[c] = len(c_urls)
            c_urls.append(c)
            c_depths.append(nd)
            c_seqs.append(seq)
        elif seq < c_seqs[j]:
            c_depths[j] = nd
            c_seqs[j] = seq

    for i, (url, depth, fseq, status, html, redir) in enumerate(zip(
            urls, depths, fseqs, statuses, htmls, redirects)):
        if status == 301 and redir:
            # hop-preserving redirect target (O11/O25): depth unchanged
            add(redir, depth, (fseq + 1) * DISC_SHIFT)
            continue
        if status != 200 or html is None:
            continue
        nd = depth + 1
        if nd > max_hops:
            continue  # no outlink can survive the depth filter (O3)
        pre = parsed.get(i) if parsed is not None else None
        if pre is not None:
            base, hrefs = pre        # fused pass already applied nofollow
        else:
            from aspseek_ray.functions.html import extract_meta_robots

            base, hrefs = extract_links(html)
            if "nofollow" in extract_meta_robots(html):
                hrefs = []           # meta-robots nofollow (O6)
        eff = base or url
        for link_idx, h in enumerate(hrefs):
            c = canonicalize(h, eff)
            if c is None:
                continue
            add(c, nd, (fseq + 1) * DISC_SHIFT + link_idx)

    url_arr = pa.array(c_urls, type=pa.string())
    host_arr = host_of_arrow(url_arr)   # one RE2 sweep, no per-row urlsplit
    return pa.table(
        {
            "url": url_arr,
            "url_hash": pa.array(fnv1a64_arrow(url_arr)),
            "host": host_arr,
            "host_hash": pa.array(fnv1a64_arrow(host_arr)),
            "depth": pa.array(np.asarray(c_depths, dtype=np.int32)),
            "discovery_seq": pa.array(np.asarray(c_seqs, dtype=np.int64)),
        }
    )


