"""Tests for the pinned engine hash (FNV-1a64) — scalar vs vectorized
equivalence, known vectors, content hash."""

import numpy as np
import pyarrow as pa

from aspseek_ray.functions.hashing import fnv1a64, fnv1a64_arrow, content_hash64


def test_known_vectors():
    # standard FNV-1a64 test vectors (public)
    mask = (1 << 64) - 1
    assert fnv1a64(b"") & mask == 0xCBF29CE484222325
    assert fnv1a64(b"a") & mask == 0xAF63DC4C8601EC8C
    assert fnv1a64(b"foobar") & mask == 0x85944171F73967E8


def test_vectorized_matches_scalar():
    strings = ["", "a", "foobar", "http://host001.example/d1/p2.html?a=1&b=2",
               "héllo wörld", "x" * 300]
    arr = pa.array(strings, type=pa.string())
    vec = fnv1a64_arrow(arr)
    for s, h in zip(strings, vec):
        assert fnv1a64(s) == int(h), s


def test_vectorized_nulls_and_chunks():
    arr = pa.chunked_array([pa.array(["a", None]), pa.array(["b"])])
    vec = fnv1a64_arrow(arr)
    assert vec[0] == fnv1a64("a")
    assert vec[1] == fnv1a64("")  # null hashes as empty
    assert vec[2] == fnv1a64("b")


def test_vectorized_sliced_array():
    arr = pa.array(["pre", "a", "foobar"]).slice(1, 2)
    vec = fnv1a64_arrow(arr)
    assert list(vec) == [fnv1a64("a"), fnv1a64("foobar")]


def test_content_hash_deterministic_and_distinct():
    arr = pa.array([b"aaa", b"aaa", b"bbb", None], type=pa.binary())
    h = content_hash64(arr)
    assert h[0] == h[1]
    assert h[0] != h[2]
    assert h.dtype == np.int64
