"""Round-5 quantitative recall harness for the approximate family
(round-4 verdict task 8): measured recall@k vs brute force for
lsh_topk / ivf_topk, and pair recall for the IVF plan of
embedding_near_dup_pairs, on sf0.01 — printed and pinned above floors
so a regression in bucketing/quantizer quality fails loudly instead of
silently returning fewer right answers."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_topk(ray_session):
    from aspseek_ray.pipelines.similarity import brute_topk

    return brute_topk(SF, n_queries=16, k=10)


def test_ivf_recall_at_k(ray_session, exact_topk):
    from aspseek_ray.pipelines.similarity import ivf_topk, recall_at_k

    r = {}
    for n_probe in (2, 4):
        approx = ivf_topk(SF, n_queries=16, k=10,
                          n_clusters=16, n_probe=n_probe)
        r[n_probe] = recall_at_k(approx, exact_topk)
    print(f"\n[recall] ivf_topk sf0.01 k=10 n_clusters=16: "
          f"n_probe=2 -> {r[2]:.3f}, n_probe=4 -> {r[4]:.3f}")
    assert r[2] >= 0.30           # coarse probe floor
    assert r[4] >= 0.55           # more probes must help substantially
    assert r[4] >= r[2]


def test_lsh_recall_at_k(ray_session, exact_topk):
    from aspseek_ray.pipelines.similarity import lsh_topk, recall_at_k

    r = {}
    for radius in (1, 2, 3):
        approx = lsh_topk(SF, n_queries=16, k=10, n_bits=6,
                          probe_hamming=radius)
        r[radius] = recall_at_k(approx, exact_topk)
    print(f"\n[recall] lsh_topk sf0.01 k=10 n_bits=6: "
          + ", ".join(f"hamming<={h} -> {v:.3f}" for h, v in r.items()))
    # wider probing must not lose recall, and must reach a useful level
    assert r[1] <= r[2] <= r[3]
    assert r[1] >= 0.15           # sign-LSH on near-random embeddings
    assert r[3] >= 0.55           # multi-probe recovers the majority


def test_embedding_near_dup_ivf_pair_recall(ray_session):
    from aspseek_ray.pipelines.dedup import embedding_near_dup_pairs
    from aspseek_ray.pipelines.similarity import pair_recall

    exact = embedding_near_dup_pairs(SF, threshold=0.4)
    assert exact.num_rows > 0, "no exact pairs at 0.4 — vacuous"
    approx = embedding_near_dup_pairs(SF, threshold=0.4,
                                      broadcast_max_rows=0,
                                      n_clusters=16, n_assign=4)
    rec = pair_recall(approx, exact)
    print(f"\n[recall] embedding_near_dup IVF sf0.01 thr=0.4 "
          f"n_clusters=16 n_assign=4: {rec:.3f} "
          f"({approx.num_rows}/{exact.num_rows} pairs)")
    assert rec >= 0.60
