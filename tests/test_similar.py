"""similar_docs ("more like this") — cosine over full tf-idf vectors:
self-similarity sanity, score bounds, and agreement with a from-scratch
dense numpy reference."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _ref_similar(sf, seed, k=10):
    from aspseek_ray.functions.text import tokenize

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = {int(d): tokenize(x or "")
            for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    n = len(docs)
    vocab = sorted({w for v in docs.values() for w in v})
    widx = {w: i for i, w in enumerate(vocab)}
    df = np.zeros(len(vocab))
    tf = {}
    for d, toks in docs.items():
        counts = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        tf[d] = counts
        for w in counts:
            df[widx[w]] += 1
    idf = np.log(n / np.maximum(df, 1))
    V = np.zeros((n, len(vocab)))
    ids = sorted(docs)
    for r, d in enumerate(ids):
        for w, c in tf[d].items():
            V[r, widx[w]] = c * idf[widx[w]]
    norms = np.linalg.norm(V, axis=1)
    qr = ids.index(seed)
    dots = V @ V[qr]
    out = []
    for r, d in enumerate(ids):
        if d == seed or dots[r] <= 0 or norms[r] == 0:
            continue
        out.append((d, dots[r] / (norms[qr] * norms[r])))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_similar_docs_matches_dense_reference(ray_session):
    from aspseek_ray.pipelines import search

    got = search.similar_docs(SF, 7)
    ref = _ref_similar(SF, 7)
    assert got["doc_id"].to_pylist() == [d for d, _ in ref]
    np.testing.assert_allclose(got["score"].to_pylist(),
                               [round(s, 4) for _, s in ref], atol=1e-4)
    # cosine bounds
    assert all(0 < s <= 1 + 1e-9 for s in got["score"].to_pylist())


def test_similar_docs_unknown_seed_empty(ray_session):
    from aspseek_ray.pipelines import search

    assert search.similar_docs(SF, 10**12).num_rows == 0
