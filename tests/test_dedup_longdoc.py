"""Round-5: the long-document jaccard_pairs plan (doc_id-only candidate
pass + blob-table join, plan='blob-join') must produce the identical
(doc_a, doc_b, jaccard) set as the prefix-blob plan — the switch
dedup.py's docstring promised since round 3, now real."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _norm(t: pa.Table):
    return sorted(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist(),
                      t["jaccard"].to_pylist()))


def test_blob_join_plan_equals_prefix_plan(ray_session):
    from aspseek_ray.pipelines.dedup import jaccard_pairs

    a = jaccard_pairs(SF, plan="prefix-blob")
    b = jaccard_pairs(SF, plan="blob-join")
    assert a.num_rows > 0, "fixture yields no pairs — test is vacuous"
    assert _norm(a) == _norm(b)


def test_blob_join_plan_equals_prefix_plan_ngram(ray_session):
    from aspseek_ray.pipelines.dedup import jaccard_pairs

    a = jaccard_pairs(SF, threshold=0.3, ngram=2, plan="prefix-blob")
    b = jaccard_pairs(SF, threshold=0.3, ngram=2, plan="blob-join")
    assert _norm(a) == _norm(b)


def test_auto_plan_switch_uses_footer_stats(ray_session, tmp_path):
    """plan='auto' picks blob-join exactly when mean stored text bytes
    exceed the switch; decision reads only parquet footers."""
    import pyarrow.parquet as pq

    from aspseek_ray.pipelines.dedup import (_mean_text_bytes,
                                             jaccard_pairs)

    short = _mean_text_bytes(f"{SF}/documents.parquet")
    assert 0 < short < 16384          # fixture docs are web-page sized

    # a long-doc corpus: few docs, ~64 KiB of text each
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = []
    base = [words[int(i)] for i in rng.integers(0, len(words), 12000)]
    for d in range(6):
        body = list(base)
        for j in range(d * 300):     # progressively perturb
            body[int(rng.integers(0, len(body)))] = f"w{d}_{j}"
        docs.append(" ".join(body))
    p = tmp_path / "documents.parquet"
    pq.write_table(pa.table({"doc_id": list(range(6)), "text": docs}), p)
    assert _mean_text_bytes(str(p)) > 16384

    auto = jaccard_pairs(str(tmp_path), threshold=0.5, plan="auto")
    forced = jaccard_pairs(str(tmp_path), threshold=0.5, plan="blob-join")
    assert _norm(auto) == _norm(forced)
    assert auto.num_rows > 0          # the perturbed family overlaps
