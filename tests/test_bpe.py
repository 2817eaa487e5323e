"""BPE tokenizer training (pipelines/bpe.py, Sennrich et al. 2016
semantics as pinned in the module docstring): engine merges equal an
independent dict-based reference implementation, the forced-distributed
plan equals the local plan merge-for-merge, encode replays training."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aspseek_ray.functions.text import tokenize


# ---------------------------------------------------------------- reference
def _ref_pair_counts(seqs, counts):
    out = {}
    for seq, c in zip(seqs, counts):
        i = 0
        while i + 1 < len(seq):
            out[(seq[i], seq[i + 1])] = out.get((seq[i], seq[i + 1]), 0) + c
            # non-overlapping inside same-symbol runs, as pinned
            if (i + 2 < len(seq) and seq[i + 1] == seq[i]
                    and seq[i + 2] == seq[i + 1]):
                i += 2
            else:
                i += 1
    return out


def _ref_apply(seq, left, right):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def ref_bpe(texts, n_merges, min_count=2):
    vocab = {}
    for t in texts:
        for w in tokenize(t):
            vocab[w] = vocab.get(w, 0) + 1
    seqs = [tuple(w) + ("</w>",) for w in vocab]
    counts = list(vocab.values())
    merges = []
    for _ in range(n_merges):
        pc = _ref_pair_counts(seqs, counts)
        if not pc:
            break
        (left, right), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((left, right, n))
        seqs = [_ref_apply(s, left, right) for s in seqs]
    return merges


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe")
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the theory of the thing",
        "low lower lowest slow slower slowest",
        "banana bandana ananas",
        "aaaa aaaa aa",                      # same-symbol runs
    ] * 3
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), d / "documents.parquet")
    return str(d), texts


def test_bpe_matches_reference(corpus):
    from aspseek_ray.pipelines.bpe import bpe_train

    sf, texts = corpus
    got = bpe_train(sf, n_merges=20).to_pylist()
    want = ref_bpe(texts, 20)
    assert [(r["left"], r["right"], r["pair_count"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(len(want)))


def test_bpe_distributed_plan_equals_local(corpus):
    from aspseek_ray.pipelines.bpe import bpe_train

    sf, _ = corpus
    local = bpe_train(sf, n_merges=16, plan="local")
    dist = bpe_train(sf, n_merges=16, plan="distributed")
    assert local.equals(dist)


def test_bpe_min_count_stops_early(ray_session, tmp_path):
    from aspseek_ray.pipelines.bpe import bpe_train

    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["ab cd"], pa.string()),   # every pair count 1
    }), tmp_path / "documents.parquet")
    t = bpe_train(str(tmp_path), n_merges=10, min_count=2)
    assert t.num_rows == 0
    # with min_count=1 it merges until sequences are single tokens
    t1 = bpe_train(str(tmp_path), n_merges=10, min_count=1)
    assert t1.num_rows == 4                        # ab+</w>, cd+</w> chains


def test_bpe_segment_replays_training(corpus):
    from aspseek_ray.pipelines.bpe import END, bpe_segment, bpe_train

    sf, texts = corpus
    merges = bpe_train(sf, n_merges=30)
    joined = set(merges["joined"].to_pylist())
    segs = bpe_segment(["lowest", "theory", "zzz"], merges)
    for w, seg in zip(["lowest", "theory", "zzz"], segs):
        assert "".join(seg) == w + END             # lossless segmentation
        for s in seg:                              # every multi-char token
            if len(s.replace(END, "x")) > 1:       # came from a merge
                assert s in joined or s == END


def test_bpe_tiebreak_is_lexicographic(ray_session, tmp_path):
    """Two pairs with equal counts: the lexicographically smaller
    (left, right) merges first."""
    from aspseek_ray.pipelines.bpe import bpe_train

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["zy zy", "ab ab"], pa.string()),
    }), tmp_path / "documents.parquet")
    t = bpe_train(str(tmp_path), n_merges=1)
    assert (t["left"][0].as_py(), t["right"][0].as_py()) == ("a", "b")
