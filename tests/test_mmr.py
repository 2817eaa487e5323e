"""MMR diversified retrieval: dense from-scratch reference agreement,
the lambda=1 degeneracy to plain cosine top-k, and the diversity
guarantee that MMR's picks are never MORE redundant than top-k's."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _vectors(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    M = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def _ref_mmr(sf, qid, k, lam, pool):
    ids, M = _vectors(sf)
    qpos = int(np.nonzero(ids == qid)[0][0])
    rel_all = M @ M[qpos]
    order = np.lexsort((ids, -rel_all))
    order = [i for i in order if ids[i] != qid][:pool]
    cand = {int(ids[i]): i for i in order}
    rel = {c: float(rel_all[i]) for c, i in cand.items()}
    chosen = []
    remaining = sorted(cand)
    while remaining and len(chosen) < k:
        best, best_v = None, -np.inf
        for c in remaining:
            red = max((float(M[cand[c]] @ M[cand[s]]) for s in chosen),
                      default=0.0)
            v = lam * rel[c] - (1 - lam) * red
            if v > best_v or (v == best_v and (best is None or c < best)):
                best, best_v = c, v
        chosen.append(best)
        remaining.remove(best)
    return chosen


def test_mmr_matches_dense_reference(ray_session):
    from aspseek_ray.pipelines.similarity import mmr_topk

    got = mmr_topk(SF, 0, k=5, lam=0.7, pool=20)
    ref = _ref_mmr(SF, 0, k=5, lam=0.7, pool=20)
    assert got["vec_id"].to_pylist() == ref


def test_mmr_lambda1_is_plain_topk(ray_session):
    from aspseek_ray.pipelines.similarity import brute_topk, mmr_topk

    got = mmr_topk(SF, 0, k=5, lam=1.0, pool=20)
    plain = brute_topk(SF, n_queries=1, k=5)
    assert got["vec_id"].to_pylist() == plain["vec_id"].to_pylist()


def test_mmr_reduces_redundancy(ray_session):
    from aspseek_ray.pipelines.similarity import brute_topk, mmr_topk

    ids, M = _vectors(SF)
    pos = {int(v): i for i, v in enumerate(ids)}

    def max_pairwise(vids):
        idx = [pos[v] for v in vids]
        S = M[idx] @ M[idx].T
        np.fill_diagonal(S, -1)
        return S.max()

    div = mmr_topk(SF, 0, k=5, lam=0.5, pool=20)["vec_id"].to_pylist()
    plain = brute_topk(SF, n_queries=1, k=5)["vec_id"].to_pylist()
    assert max_pairwise(div) <= max_pairwise(plain) + 1e-9
