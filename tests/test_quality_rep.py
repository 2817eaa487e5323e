"""Hand cases for the Gopher-style repetition metrics and the
benchmark-contamination broadcast semi-join (both also oracle-checked
end-to-end in test_oracle)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(path, rows):
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["t"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), path)


def test_repetition_scores_hand_case(ray_session, tmp_path):
    from aspseek_ray.pipelines.textstats import repetition_scores

    rows = [
        (1, "spam spam spam spam"),          # one word 4x
        (2, "a b c d"),                      # all distinct
        (3, "x y x y x y"),                  # repeated bigrams
        (4, ""),                             # empty
        (5, "word"),                         # single token
    ]
    _write_docs(tmp_path / "documents.parquet", rows)
    out = {r["doc_id"]: r for r in
           repetition_scores(str(tmp_path)).to_pylist()}
    # 3 bigrams, 1 distinct -> (3-1)/3
    assert out[1] == {"doc_id": 1, "n_tokens": 4, "n_distinct": 1,
                      "top_word_frac": 1.0, "dup_bigram_frac": 0.6667}
    assert out[2] == {"doc_id": 2, "n_tokens": 4, "n_distinct": 4,
                      "top_word_frac": 0.25, "dup_bigram_frac": 0.0}
    # "x y x y x y": bigrams [xy, yx, xy, yx, xy] -> 2 distinct of 5
    assert out[3]["dup_bigram_frac"] == 0.6
    assert out[3]["top_word_frac"] == 0.5
    assert out[4] == {"doc_id": 4, "n_tokens": 0, "n_distinct": 0,
                      "top_word_frac": 0.0, "dup_bigram_frac": 0.0}
    assert out[5]["dup_bigram_frac"] == 0.0


def test_contamination_flags_hand_case(ray_session, tmp_path):
    from aspseek_ray.pipelines.textstats import contamination_flags

    rows = [
        (0,   "the quick brown fox jumps"),      # benchmark (0 % 7 == 0)
        (1,   "lazy quick brown fox sleeps"),    # shares 'quick brown fox'
        (2,   "entirely different words here"),  # clean
        (3,   "so sh"),                          # < 3 tokens: 0 grams
        (14,  "another benchmark doc entry"),    # benchmark (14 % 7 == 0)
        (5,   "one another benchmark doc now"),  # shares with doc 14
    ]
    _write_docs(tmp_path / "documents.parquet", rows)
    out = {r["doc_id"]: r for r in
           contamination_flags(str(tmp_path), benchmark_mod=7).to_pylist()}
    assert set(out) == {1, 2, 3, 5}          # benchmark docs excluded
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3] == {"doc_id": 3, "n_grams": 0, "n_hits": 0,
                      "contaminated": False}
    assert out[5]["contaminated"] and out[5]["n_hits"] == 1


def test_normalize_text_hand_case(ray_session, tmp_path):
    from aspseek_ray.pipelines.textstats import normalize_text

    rows = [
        (1, "Contact me at Bob.Smith+x@corp.example.org now"),
        (2, "see https://a.example/path?q=1 and http://b.example too"),
        (3, "batch batch batch stream stream done"),
        (4, ""),
    ]
    _write_docs(tmp_path / "documents.parquet", rows)
    out = {r["doc_id"]: r for r in
           normalize_text(str(tmp_path)).to_pylist()}
    assert out[1] == {"doc_id": 1, "clean_text": "contact me at now",
                      "n_redacted": 1, "n_collapsed": 0}
    assert out[2] == {"doc_id": 2, "clean_text": "see and too",
                      "n_redacted": 2, "n_collapsed": 0}
    assert out[3] == {"doc_id": 3, "clean_text": "batch stream done",
                      "n_redacted": 0, "n_collapsed": 3}
    assert out[4] == {"doc_id": 4, "clean_text": "",
                      "n_redacted": 0, "n_collapsed": 0}


def test_bpe_token_counts_hand_case(ray_session, tmp_path):
    """The sf corpus is pure lowercase-word-space text where the BPE-ish
    and whitespace counts coincide, so the oracle alone doesn't prove the
    pre-tokenizer branch — these hand strings do (punct runs, digit runs,
    glued case changes, unicode, empty), cross-checked against the SAME
    RE2 pattern in DuckDB."""
    import duckdb

    from aspseek_ray.pipelines.textstats import bpe_token_counts

    rows = [
        (0, "Hello, world!  It's 2026-08-18."),   # punct+digit runs split
        (1, ""),                                   # empty: 0 / 0
        (2, "  leading  spaces"),                  # ws runs count in bpe
        (3, "CamelCaseGlued x86_64"),              # case glue stays one run
        (4, "unicode héllo ü 漢字 test"),           # non-ASCII -> punct branch
        (5, "...!!!"),
    ]
    _write_docs(tmp_path / "documents.parquet", rows)
    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
           for r in bpe_token_counts(str(tmp_path)).to_pylist()}

    con = duckdb.connect()
    want = {i: tuple(con.execute(
        "SELECT len(regexp_extract_all(?, '\\S+')),"
        " len(regexp_extract_all(?,"
        " ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+'))",
        [t, t]).fetchone()) for i, t in rows}
    assert got == want
    # and the branch is load-bearing: bpe > ws wherever punctuation splits
    assert got[0] == (4, 14)
    assert got[1] == (0, 0)
    assert got[4] == (5, 7)
