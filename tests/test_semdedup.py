"""SemDeDup (Abbas et al. 2023) — cluster-then-prune semantic dedup.
Pins: (1) the paper's structural guarantee that the kept set is pairwise
<= eps within every cluster, (2) bitwise agreement with a from-scratch
numpy greedy reference when n_clusters=1 (no clustering noise), and
(3) determinism across runs."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
EPS = 0.4


def _vectors(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    M = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def test_semdedup_kept_set_pairwise_below_eps(ray_session):
    from aspseek_ray.pipelines import dedup

    out = dedup.semdedup_keep(SF, eps=EPS, n_clusters=8).to_pandas()
    ids, M = _vectors(SF)
    by_id = {int(v): i for i, v in enumerate(ids)}
    assert len(out) == len(ids)            # every vector classified once
    removed = (~out["keep"]).sum()
    assert removed > 0, "eps=0.4 should prune something in the fixture"
    for _, g in out[out["keep"]].groupby("cluster"):
        idx = [by_id[int(v)] for v in g["vec_id"]]
        S = M[idx] @ M[idx].T
        np.fill_diagonal(S, -1.0)
        assert S.max() <= EPS + 1e-9, "kept pair above eps within a cluster"


def test_semdedup_single_cluster_matches_numpy_greedy(ray_session):
    from aspseek_ray.pipelines import dedup

    out = dedup.semdedup_keep(SF, eps=EPS, n_clusters=1).to_pandas()
    ids, M = _vectors(SF)
    centroid = M.mean(axis=0)
    centroid /= max(np.linalg.norm(centroid), 1e-12)
    csim = M @ centroid
    order = np.lexsort((ids, -csim))       # centroid-sim desc, vec_id asc
    S = M[order] @ M[order].T
    n = len(order)
    iu = np.triu_indices(n, k=1)
    upper = np.full((n, n), -np.inf)
    upper[iu] = S[iu]
    mx = upper.max(axis=1)
    mx[n - 1] = 0.0
    ref_keep = dict(zip(ids[order], mx <= EPS))
    got_keep = dict(zip(out["vec_id"], out["keep"]))
    assert got_keep == ref_keep


def test_semdedup_deterministic(ray_session):
    from aspseek_ray.pipelines import dedup

    a = dedup.semdedup_keep(SF, eps=EPS, n_clusters=8)
    b = dedup.semdedup_keep(SF, eps=EPS, n_clusters=8)
    assert a.equals(b)
