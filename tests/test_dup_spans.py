"""duplicate_spans — cross-document duplicate n-gram detection (the
exact-substring dedup signal of Lee et al. 2022 in distributed n-gram
form): a doc's k-token gram is a duplicate span iff >= 2 distinct docs
contain it; per-doc output is the duplicated-span fraction."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("dupspans")
    shared = "alpha beta gamma delta epsilon"          # one 5-gram, shared
    docs = [
        f"{shared} zeta",          # grams: shared+1 more; 2 distinct grams
        f"eta {shared}",           # grams: 1 new + shared; 2 distinct grams
        "one two three four five six seven",           # 3 grams, all unique
        "alpha beta gamma delta",                      # < 5 tokens: dropped
        "alpha alpha alpha alpha alpha alpha",         # self-repeat: 1 gram,
                                                       # unique corpus-wide
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }), d / "documents.parquet")
    return str(d)


def test_duplicate_spans_semantics(corpus):
    from aspseek_ray.pipelines.dedup import duplicate_spans

    t = duplicate_spans(corpus, k=5).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    # doc 3 has only 4 tokens -> excluded entirely
    assert set(rows) == {0, 1, 2, 4}
    # docs 0/1 share exactly the one 5-gram "alpha...epsilon"
    assert rows[0] == {"doc_id": 0, "n_grams": 2, "n_dup_grams": 1,
                       "dup_ratio": 0.5}
    assert rows[1] == {"doc_id": 1, "n_grams": 2, "n_dup_grams": 1,
                       "dup_ratio": 0.5}
    # doc 2: 3 grams, none shared
    assert rows[2] == {"doc_id": 2, "n_grams": 3, "n_dup_grams": 0,
                       "dup_ratio": 0.0}
    # doc 4: within-doc repetition is NOT a cross-doc duplicate; its six
    # positions collapse to one distinct gram, present in one doc only
    assert rows[4] == {"doc_id": 4, "n_grams": 1, "n_dup_grams": 0,
                       "dup_ratio": 0.0}


def test_duplicate_spans_dup_count_is_symmetric(corpus):
    """Every duplicate gram contributes to ALL docs holding it — the
    total over docs of n_dup_grams counts each shared gram once per
    holder (here: 1 gram x 2 holders)."""
    from aspseek_ray.pipelines.dedup import duplicate_spans

    t = duplicate_spans(corpus, k=5)
    assert int(np.sum(t["n_dup_grams"].to_numpy())) == 2


def test_duplicate_spans_empty_corpus(ray_session, tmp_path):
    from aspseek_ray.pipelines.dedup import duplicate_spans

    pq.write_table(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["too short"], pa.string()),
    }), tmp_path / "documents.parquet")
    t = duplicate_spans(str(tmp_path), k=5)
    assert t.num_rows == 0
    assert t.schema.names == ["doc_id", "n_grams", "n_dup_grams",
                              "dup_ratio"]
