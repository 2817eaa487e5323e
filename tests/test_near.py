"""NEAR/k proximity over the positional index: dual-plan equality, the
phrase ⊂ ordered-NEAR/1 identity, and ordered ⊆ unordered containment."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_near_plans_bitwise_equal(ray_session):
    from aspseek_ray.pipelines import search

    a = search.near_search(SF, "scan", "slow", k=3)
    d = search.near_search(SF, "scan", "slow", k=3,
                           driver_max_posting_rows=0)
    assert a.equals(d)
    assert a.num_rows > 0


def test_ordered_near1_equals_phrase(ray_session):
    from aspseek_ray.pipelines import search

    near1 = search.near_search(SF, "scan", "slow", k=1, ordered=True)
    phrase = search.phrase_search(SF, ("scan", "slow"))
    assert near1.equals(phrase)


def test_ordered_subset_of_unordered_and_k_monotone(ray_session):
    from aspseek_ray.pipelines import search

    uno3 = set(search.near_search(SF, "scan", "slow", k=3)
               ["doc_id"].to_pylist())
    ord3 = set(search.near_search(SF, "scan", "slow", k=3, ordered=True)
               ["doc_id"].to_pylist())
    uno5 = set(search.near_search(SF, "scan", "slow", k=5)
               ["doc_id"].to_pylist())
    assert ord3 <= uno3 <= uno5
