"""Search-side relational core (SURVEY.md §3.2 searchd: src/qparser.cpp /
src/search.cpp / src/results.cpp — boolean & phrase matching over postings,
tf·idf-flavored ranking, top-k). The daemon/socket surface is out of the
flagship scope; the QUERY SEMANTICS are rebuilt as Dataset pipelines over
the documents table with exact DuckDB oracles.

Pinned semantics (tokenizer = functions/text.py::tokenize):
  * boolean AND: doc contains every term;
  * phrase "w1 w2": exists position p with token[p]==w1, token[p+1]==w2
    (reference phrase-position check, O27);
  * ranked: score(d) = sum_t tf(t,d) * ln(N / df(t)) over the query terms,
    top-k by (score desc, doc_id) — the df-weighted scoring role of
    src/search.cpp (O24/O30).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from aspseek_ray.functions.text import tokenize

DEFAULT_PHRASE = ("scan", "slow")
DEFAULT_TERMS = ("spark", "window", "scan")


def phrase_search(sf_dir: str, phrase: tuple[str, str] = DEFAULT_PHRASE) -> pa.Table:
    """doc_ids whose token stream contains the two-word phrase adjacently
    (positions check — the reference's phrase operator)."""
    w1, w2 = phrase
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def match(batch: pa.Table) -> pa.Table:
        keep = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = tokenize(t)
            if any(a == w1 and b == w2 for a, b in zip(toks, toks[1:])):
                keep.append(d)
        return pa.table({"doc_id": pa.array(keep, pa.int64())})

    out = ds.map_batches(match, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def boolean_and_search(sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS) -> pa.Table:
    """doc_ids containing EVERY query term as a token (posting-list AND,
    O27 — token-exact, unlike the substring variant in relational.py)."""
    term_set = frozenset(terms)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def match(batch: pa.Table) -> pa.Table:
        keep = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if term_set <= set(tokenize(t)):
                keep.append(d)
        return pa.table({"doc_id": pa.array(keep, pa.int64())})

    out = ds.map_batches(match, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def tfidf_search(sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS,
                 k: int = 10) -> pa.Table:
    """Top-k docs by sum_t tf(t,d)*ln(N/df(t)) over the query terms
    (deterministic tiebreak doc_id). Distributed: per-batch partial
    (doc, term, tf) + (term, partial_df) rows, grouped sums, then a tiny
    driver-side scoring of only the matching docs."""
    term_set = frozenset(terms)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = ds.count()

    def partials(batch: pa.Table) -> pa.Table:
        doc_col, term_col, tf_col = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            counts: dict[str, int] = {}
            for w in tokenize(t):
                if w in term_set:
                    counts[w] = counts.get(w, 0) + 1
            for w, c in counts.items():
                doc_col.append(d)
                term_col.append(w)
                tf_col.append(c)
        return pa.table({"doc_id": pa.array(doc_col, pa.int64()),
                         "term": pa.array(term_col, pa.string()),
                         "tf": pa.array(tf_col, pa.int64())})

    tf = ds.map_batches(partials, batch_format="pyarrow").materialize()
    if tf.count() == 0:  # no term matches anywhere (empty groupbys lose schema)
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    df_pdf = (tf.map_batches(
                  lambda b: pa.table({"term": b["term"],
                                      "one": pa.array(np.ones(b.num_rows, np.int64))}),
                  batch_format="pyarrow")
              .groupby("term").aggregate(Sum("one", alias_name="df"))).to_pandas()
    idf = {t: math.log(n_docs / d) for t, d in zip(df_pdf["term"], df_pdf["df"])}

    tf_pdf = tf.to_pandas()  # rows = matching (doc, term) pairs only — small
    tf_pdf["w"] = tf_pdf["tf"] * tf_pdf["term"].map(idf)
    scores = tf_pdf.groupby("doc_id", as_index=False)["w"].sum()
    scores = scores.sort_values(["w", "doc_id"], ascending=[False, True]).head(k)
    return pa.table({"doc_id": pa.array(scores["doc_id"].to_numpy(), pa.int64()),
                     "score": pa.array(np.round(scores["w"].to_numpy(), 4))})
