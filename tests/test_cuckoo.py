"""Cuckoo filter unit tests: no false negatives, bounded false positives,
snapshot round-trip."""

import numpy as np

from aspseek_ray.state.cuckoo import CuckooFilter


def test_no_false_negatives():
    f = CuckooFilter(capacity=10_000, seed=1)
    rng = np.random.Generator(np.random.PCG64(3))
    items = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    f.insert_many(items)
    assert f.contains_many(items).all()


def test_false_positive_rate_bounded():
    f = CuckooFilter(capacity=10_000, seed=1)
    rng = np.random.Generator(np.random.PCG64(3))
    items = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    f.insert_many(items)
    probe = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    probe = np.setdiff1d(probe, items)
    fp = f.contains_many(probe).mean()
    assert fp < 0.01, fp  # 16-bit fingerprints, 2 buckets of 4 -> ~2^-13


def test_contains_scalar_and_empty():
    f = CuckooFilter(capacity=100, seed=0)
    f.insert(42)
    assert 42 in f
    assert f.contains_many(np.array([], dtype=np.int64)).shape == (0,)


def test_state_roundtrip():
    f = CuckooFilter(capacity=1000, seed=5)
    items = np.arange(500, dtype=np.int64) * 7919
    f.insert_many(items)
    g = CuckooFilter.from_state(f.state(), seed=5)
    assert g.contains_many(items).all()
    assert g.count == f.count
