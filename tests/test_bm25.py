"""BM25 ranked search (SURVEY O24's ranking family, the Okapi/Lucene
variant): plan equality between the driver and the forced-distributed
physical plan, score sanity against a from-scratch reference computed
straight off the text, and the length-normalization invariants that
distinguish BM25 from plain tf·idf."""

from __future__ import annotations

import math

import numpy as np

SF = "/root/testdata/sf0.001"


def _ref_bm25(sf, terms, k=10, k1=1.2, b=0.75):
    """Independent reference: tokenize the raw documents table directly
    (no index involvement) and score with the same formula."""
    import pyarrow.parquet as pq

    from aspseek_ray.functions.text import tokenize

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = {int(d): tokenize(x or "")
            for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    n = len(docs)
    total = sum(len(v) for v in docs.values())
    avgdl = total / n
    df = {w: sum(1 for v in docs.values() if w in set(v)) for w in terms}
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        for w in set(terms):
            tf = sum(1 for x in toks if x == w)
            if not tf or not df[w]:
                continue
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[d] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [d for d, _ in top], [round(s, 4) for _, s in top]


def test_bm25_matches_from_scratch_reference(ray_session):
    from aspseek_ray.pipelines import search

    got = search.bm25_search(SF)
    ids, scores = _ref_bm25(SF, search.DEFAULT_TERMS)
    assert got["doc_id"].to_pylist() == ids
    np.testing.assert_allclose(got["score"].to_pylist(), scores, atol=1e-4)


def test_bm25_plans_bitwise_equal(ray_session):
    from aspseek_ray.pipelines import search

    a = search.bm25_search(SF)
    d = search.bm25_search(SF, driver_max_posting_rows=0)
    assert a.equals(d), (a.to_pandas(), d.to_pandas())


def test_bm25_length_normalization_bites(ray_session):
    """With b=0 (no length normalization) the ranking must be allowed to
    differ from b=0.75 in score, and tf saturates: score < idf*(k1+1)."""
    from aspseek_ray.pipelines import search

    full = search.bm25_search(SF, k=50)
    flat = search.bm25_search(SF, k=50, b=0.0)
    assert full.num_rows and flat.num_rows
    # saturation bound: per-term contribution < idf*(k1+1); with 3 query
    # terms and n_docs >> df the score stays comfortably bounded
    assert max(full["score"].to_pylist()) < 3 * (1.2 + 1) * math.log(1e6)
    # b=0 removes dl from the formula entirely -> any doc-length skew in
    # the fixtures shows up as a score delta for at least one shared doc
    sa = dict(zip(full["doc_id"].to_pylist(), full["score"].to_pylist()))
    sb = dict(zip(flat["doc_id"].to_pylist(), flat["score"].to_pylist()))
    shared = set(sa) & set(sb)
    assert shared and any(abs(sa[d] - sb[d]) > 1e-6 for d in shared)
