"""Connected-components tests: label propagation vs driver union-find."""

import numpy as np
import pyarrow as pa
import pytest

from aspseek_ray.pipelines.dedup import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_table(pairs):
    return pa.table({"doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                     "doc_b": pa.array([b for _, b in pairs], pa.int64())})


def test_cc_matches_union_find(ray_session):
    rng = np.random.Generator(np.random.PCG64(5))
    pairs = [(int(a), int(b)) for a, b in
             rng.integers(0, 60, size=(80, 2)) if a != b]
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]
    got = connected_components(_pairs_table(pairs))
    want = _union_find(pairs)
    got_map = dict(zip(got["doc_id"].to_pylist(), got["group_id"].to_pylist()))
    assert got_map == want


def test_cc_chain_and_empty(ray_session):
    # long chain needs several propagation rounds
    chain = [(i, i + 1) for i in range(0, 30)]
    got = connected_components(_pairs_table(chain))
    assert set(got["group_id"].to_pylist()) == {0}
    empty = connected_components(_pairs_table([]))
    assert empty.num_rows == 0
