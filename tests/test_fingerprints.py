"""Document fingerprinting (textstats.fingerprints — rows-only in the
driver gate): hand-oracle properties of the rolling hash and a full-scan
equivalence of the distributed pipeline."""

import numpy as np
import pyarrow.parquet as pq

from aspseek_ray.functions.text import fingerprint64, tokenize


def test_fingerprint_properties():
    # deterministic; order-sensitive; tokenization-equivalent inputs match
    assert fingerprint64("alpha beta gamma") == fingerprint64("alpha beta gamma")
    assert fingerprint64("alpha beta") != fingerprint64("beta alpha")
    assert fingerprint64("Alpha, BETA!") == fingerprint64("alpha beta")
    assert fingerprint64("") == fingerprint64("   .,;")   # no tokens
    # int64 bit-pattern range
    v = fingerprint64("some document body with words")
    assert -(1 << 63) <= v < (1 << 63)


def test_fingerprint_reference_recurrence():
    """The pipeline value must equal an independently-written recurrence
    (h = h*P ^ th; th = fnv1a over token bytes), not just be self-equal."""
    P = 1099511628211
    M = (1 << 64) - 1

    def ref(text):
        h = 0xCBF29CE484222325
        for t in tokenize(text):
            th = 0x9E3779B97F4A7C15
            for b in t.encode("utf-8"):
                th = ((th ^ b) * P) & M
            h = ((h * P) & M) ^ th
        return h - (1 << 64) if h >= (1 << 63) else h

    for s in ["spark window scan", "a", "", "mixed CASE text 123",
              "unicode tÃ©st ðŸ™‚ body"]:
        assert fingerprint64(s) == ref(s), s


def test_fingerprints_pipeline_full_scan(ray_session):
    from aspseek_ray.pipelines.textstats import fingerprints

    sf = "/root/testdata/sf0.001"
    got = fingerprints(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    want = {d: fingerprint64(t) for d, t in zip(docs["doc_id"].to_pylist(),
                                                docs["text"].to_pylist())}
    assert got.num_rows == len(want)
    for d, f in zip(got["doc_id"].to_pylist(), got["fp64"].to_pylist()):
        assert want[d] == f
