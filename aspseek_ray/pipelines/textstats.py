"""Text-analysis pipelines over the documents table — the training-data
side of the engine (token counting, quality scoring, language ID, document
fingerprinting, word/document frequency — SURVEY.md O8/O12/O30 plus the
large-scale-pipeline text ops).

Tokenization is the pinned SQL-reproducible rule of functions/text.py, so
token counts / word-df / quality have exact DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from aspseek_ray.functions.text import (
    STOPWORDS_EN,
    fingerprint64,
    langid_scores,
    quality_features,
    tokenize,
)


def _round4(x):
    """Round-half-away-from-zero to 4 decimals (SQL ROUND semantics —
    numpy/python round are banker's and diverge on exact midpoints like
    1/32 = 0.03125)."""
    return np.floor(np.asarray(x, np.float64) * 1e4 + 0.5) / 1e4


def token_stats(sf_dir: str) -> pa.Table:
    """(doc_id, n_chars, n_tokens, n_token_chars) per document — all exact
    integers (no float rounding-mode skew vs the SQL oracle; the mean is
    n_token_chars / n_tokens)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_chars = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        toks = [tokenize(t) for t in texts]
        n_tokens = np.fromiter((len(ts) for ts in toks), np.int64, len(toks))
        tok_chars = np.fromiter((sum(map(len, ts)) for ts in toks), np.int64, len(toks))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "n_token_chars": pa.array(tok_chars),
        })

    out = ds.map_batches(stats, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def word_document_frequency(sf_dir: str, min_df: int = 2) -> pa.Table:
    """(word, df) — document frequency per word (SURVEY O30 df stats) with
    per-batch partial aggregation: each batch emits (word, partial_df) once
    per word, so the global shuffle moves O(vocab x batches) rows."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for w in set(tokenize(t)):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({"word": pa.array(list(counts.keys()), pa.string()),
                         "df": pa.array(list(counts.values()), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("df", alias_name="df")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    import pyarrow.compute as pc

    return t.filter(pc.greater_equal(t["df"], min_df))


def quality_scores(sf_dir: str) -> pa.Table:
    """Full quality features incl. stopword ratio — heuristic filters for a
    training-data pipeline. (doc_id, n_chars, n_tokens, mean_token_len,
    stop_ratio, alnum_ratio); ratios rounded to 4 decimals."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        rows = [quality_features(t) for t in batch["text"].to_pylist()]
        arr = np.array(rows, dtype=np.float64).reshape(len(rows), 5)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(arr[:, 0].astype(np.int64)),
            "n_tokens": pa.array(arr[:, 1].astype(np.int64)),
            "mean_token_len": pa.array(_round4(arr[:, 2])),
            "stop_ratio": pa.array(_round4(arr[:, 3])),
            "alnum_ratio": pa.array(_round4(arr[:, 4])),
        })

    out = ds.map_batches(score, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


class LangId:
    """Actor-pool language-ID stage (stopword tables built once per actor —
    the reference loads langmap .lm files the same way, SURVEY O7)."""

    def __init__(self):
        self.score = langid_scores  # tables are module-level frozensets

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for t in batch["text"].to_pylist():
            lang, conf = self.score(t)
            preds.append(lang)
            confs.append(float(_round4(conf)))
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(preds, pa.string()),
            "confidence": pa.array(confs, pa.float64()),
        })


def language_id(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from aspseek_ray.runtime import actor_pool

    out = ds.map_batches(LangId, batch_format="pyarrow",
                         concurrency=actor_pool())
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def fingerprints(sf_dir: str) -> pa.Table:
    """(doc_id, fp64) rolling-hash document fingerprints (order-sensitive)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        vals = np.fromiter((fingerprint64(t) for t in batch["text"].to_pylist()),
                           np.int64, batch.num_rows)
        return pa.table({"doc_id": batch["doc_id"], "fp64": pa.array(vals)})

    out = ds.map_batches(fp, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def stopword_ratio_filter(sf_dir: str, max_stop_ratio: float = 0.5,
                          min_tokens: int = 5) -> pa.Table:
    """Quality GATE (keep-list): doc_ids passing the heuristic filters —
    how a 100-TB pipeline would drop boilerplate/low-quality docs."""
    t = quality_scores(sf_dir)
    import pyarrow.compute as pc

    keep = pc.and_(pc.less_equal(t["stop_ratio"], max_stop_ratio),
                   pc.greater_equal(t["n_tokens"], min_tokens))
    return t.filter(keep).select(["doc_id"])
