"""Text-analysis pipelines over the documents table — the training-data
side of the engine (token counting, quality scoring, language ID, document
fingerprinting, word/document frequency — SURVEY.md O8/O12/O30 plus the
large-scale-pipeline text ops).

Tokenization is the pinned SQL-reproducible rule of functions/text.py, so
token counts / word-df / quality have exact DuckDB oracles.
"""

from __future__ import annotations

import math

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
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


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
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


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
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def fingerprints(sf_dir: str) -> pa.Table:
    """(doc_id, fp64) rolling-hash document fingerprints (order-sensitive)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        vals = np.fromiter((fingerprint64(t) for t in batch["text"].to_pylist()),
                           np.int64, batch.num_rows)
        return pa.table({"doc_id": batch["doc_id"], "fp64": pa.array(vals)})

    out = ds.map_batches(fp, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def stopword_ratio_filter(sf_dir: str, max_stop_ratio: float = 0.5,
                          min_tokens: int = 5) -> pa.Table:
    """Quality GATE (keep-list): doc_ids passing the heuristic filters —
    how a 100-TB pipeline would drop boilerplate/low-quality docs."""
    t = quality_scores(sf_dir)
    import pyarrow.compute as pc

    keep = pc.and_(pc.less_equal(t["stop_ratio"], max_stop_ratio),
                   pc.greater_equal(t["n_tokens"], min_tokens))
    return t.filter(keep).select(["doc_id"])


def repetition_scores(sf_dir: str) -> pa.Table:
    """Repetition-based quality metrics (the Gopher-rules family — Rae
    et al., "Scaling Language Models: ... Gopher", 2021 — adapted to
    the pinned tokenizer): per document over the SQL-reproducible
    token stream,
      n_tokens / n_distinct   exact integers,
      top_word_frac           most-frequent-word count / n_tokens,
      dup_bigram_frac         (bigrams - distinct bigrams) / bigrams.
    Boilerplate and spam pages score high on all three; a 100-TB
    pipeline gates on these before any expensive near-dup pass.
    Ratios rounded to 4 decimals (SQL ROUND semantics)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        n_tok, n_dis, topf, dupb = [], [], [], []
        for t in batch["text"].to_pylist():
            toks = tokenize(t)
            n = len(toks)
            n_tok.append(n)
            if n == 0:
                n_dis.append(0); topf.append(0.0); dupb.append(0.0)
                continue
            _, cnts = np.unique(toks, return_counts=True)
            n_dis.append(len(cnts))
            topf.append(int(cnts.max()) / n)
            if n < 2:
                dupb.append(0.0)
                continue
            grams = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)]
            dupb.append((len(grams) - len(set(grams))) / len(grams))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(np.asarray(n_tok, np.int64)),
            "n_distinct": pa.array(np.asarray(n_dis, np.int64)),
            "top_word_frac": pa.array(_round4(topf)),
            "dup_bigram_frac": pa.array(_round4(dupb)),
        })

    out = ds.map_batches(rep, batch_format="pyarrow")
    # drop Ray's schema-less empty blocks (tiny inputs) before concat
    parts = [t for t in ray.get(out.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return rep(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}))
    return pa.concat_tables(parts)


def contamination_flags(sf_dir: str, shingle: int = 3,
                        benchmark_mod: int = 97) -> pa.Table:
    """Benchmark-contamination check — the eval-leakage gate a
    training-data pipeline runs before a model ever sees the corpus:
    flag documents sharing any ``shingle``-token n-gram with a
    benchmark set. The benchmark here is the deterministic subset
    doc_id % benchmark_mod == 0 (a stand-in for a real eval suite;
    the mechanism is what matters).

    Scale shape: the canonical BROADCAST semi-join. The benchmark
    shingle set is built by one filtered column-pruned pass (benchmarks
    are small by definition), shipped once via ray.put as a sorted
    uint64 hash array, and every corpus batch probes it with np.isin —
    no shuffle, no driver-side corpus work. Hashes are FNV-1a64 of the
    space-joined gram (mirrored bitwise by the SQL oracle), so the
    comparison is exact on both sides.

    Output (doc_id, n_grams, n_hits, contaminated): distinct grams per
    doc, grams also present in the benchmark, and the >= 1-hit flag.
    Benchmark members themselves are excluded from the output."""
    from aspseek_ray.functions.hashing import fnv1a64_arrow

    path = f"{sf_dir}/documents.parquet"

    def gram_hashes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Distinct shingle hashes per text + per-text gram counts."""
        grams: list[str] = []
        counts = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks = tokenize(t)
            g = sorted({" ".join(toks[j:j + shingle])
                        for j in range(len(toks) - shingle + 1)})
            counts[i] = len(g)
            grams.extend(g)
        if not grams:
            return np.empty(0, np.uint64), counts
        h = fnv1a64_arrow(pa.array(grams, pa.string())).astype(np.uint64)
        return h, counts

    def needle_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sel = ids % benchmark_mod == 0
        h, _ = gram_hashes(
            batch.filter(pa.array(sel))["text"].to_pylist())
        return pa.table({"h": pa.array(np.unique(h))})

    needles = (rd.read_parquet(path, columns=["doc_id", "text"])
                 .map_batches(needle_batch, batch_format="pyarrow")
                 .to_pandas())
    needle_ref = ray.put(np.unique(needles["h"].to_numpy().astype(np.uint64)))

    def probe(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = ids % benchmark_mod != 0
        b = batch.filter(pa.array(keep))
        h, counts = gram_hashes(b["text"].to_pylist())
        hit = np.isin(h, ray.get(needle_ref))
        # per-doc hit sums via the gram-count offsets
        ends = np.cumsum(counts)
        starts = ends - counts
        n_hits = np.array([int(hit[s:e].sum())
                           for s, e in zip(starts, ends)], np.int64)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_grams": pa.array(counts),
            "n_hits": pa.array(n_hits),
            "contaminated": pa.array(n_hits > 0),
        })

    out = (rd.read_parquet(path, columns=["doc_id", "text"])
             .map_batches(probe, batch_format="pyarrow"))
    parts = [t for t in ray.get(out.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return probe(pa.table({"doc_id": pa.array([], pa.int64()),
                               "text": pa.array([], pa.string())}))
    return pa.concat_tables(parts)


# RE2 patterns (Arrow and DuckDB both run RE2, so one string serves the
# engine and the SQL mirror); applied to lowercased text on both sides.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"


def normalize_text(sf_dir: str) -> pa.Table:
    """Webtext normalization: redact URLs then emails (PII scrub) with
    vectorized Arrow RE2 kernels — no Python in the regex path — then
    canonicalize to the pinned token stream with consecutive duplicate
    tokens collapsed (the boilerplate-run cleanup: nav menus and spam
    repeat the same token back-to-back).

    Output (doc_id, clean_text, n_redacted, n_collapsed): the
    space-joined collapsed tokens, how many URL/email matches were
    removed, and how many run-duplicate tokens were dropped. Counting
    and replacement order (URLs first, emails on the URL-redacted
    text) is pinned so the SQL oracle reproduces it exactly."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t0 = pc.utf8_lower(batch["text"])
        n_url = pc.count_substring_regex(t0, URL_RE)
        t1 = pc.replace_substring_regex(t0, URL_RE, " ")
        n_mail = pc.count_substring_regex(t1, EMAIL_RE)
        t2 = pc.replace_substring_regex(t1, EMAIL_RE, " ")
        n_red = pc.add(n_url, n_mail).cast(pa.int64())
        clean, n_col = [], np.zeros(batch.num_rows, np.int64)
        for i, s in enumerate(t2.to_pylist()):
            toks = tokenize(s)
            kept = [t for j, t in enumerate(toks)
                    if j == 0 or toks[j - 1] != t]
            clean.append(" ".join(kept))
            n_col[i] = len(toks) - len(kept)
        return pa.table({
            "doc_id": batch["doc_id"],
            "clean_text": pa.array(clean, pa.string()),
            "n_redacted": n_red,
            "n_collapsed": pa.array(n_col),
        })

    out = ds.map_batches(norm, batch_format="pyarrow")
    parts = [t for t in ray.get(out.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return norm(pa.table({"doc_id": pa.array([], pa.int64()),
                              "text": pa.array([], pa.string())}))
    return pa.concat_tables(parts)


# GPT-2-style pre-tokenizer, RE2-compatible (lookahead-free): an optional
# leading space glued to a letter run / digit run / punctuation run, with
# residual whitespace runs as their own tokens. Non-ASCII letters fall in
# the punctuation branch — pinned, and identical in Arrow and DuckDB
# (both RE2, leftmost-first alternation — verified on unicode fixtures).
BPE_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"
WS_RE = r"\S+"


def bpe_token_counts(sf_dir: str) -> pa.Table:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — token counting both ways the
    brief names: whitespace words and a BPE-ish pre-tokenizer segment count
    (the LLM-cost estimate: a GPT-2-family tokenizer's token count is the
    number of pre-tokenizer segments, give or take merges). Entirely
    vectorized: one RE2 scan per pattern via pc.count_substring_regex,
    zero Python in the loop; exact integers, so the DuckDB oracle
    (len(regexp_extract_all(...))) matches bitwise."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pc.count_substring_regex(t, WS_RE).cast(pa.int64()),
            "n_bpe_tokens": pc.count_substring_regex(t, BPE_RE).cast(pa.int64()),
        })

    out = ds.map_batches(counts, batch_format="pyarrow")
    parts = [t for t in ray.get(out.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return counts(pa.table({"doc_id": pa.array([], pa.int64()),
                                "text": pa.array([], pa.string())}))
    return pa.concat_tables(parts)


def unigram_logprob_scores(sf_dir: str) -> pa.Table:
    """Per-document mean token log-probability under the CORPUS unigram
    model — the KenLM-proxy quality gate (a doc of globally-rare tokens
    scores low; MLE, no smoothing needed since every doc's tokens are in
    the model by construction):

        lp(doc) = (1/|doc|) * sum_t ln(count(t) / total_tokens)

    Two passes, both distributed: (1) unigram counts as per-batch partials
    -> one groupby(word).sum (only (word, n) rows shuffle); (2) the count
    table broadcast once via ray.put and probed per batch with a pandas
    map — no shuffle. Empty docs score 0.0. Output (doc_id, n_tokens,
    logprob) rounded to 4."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for w in tokenize(t):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({"word": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    uni = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    total = int(uni["n"].sum()) or 1
    logp = {w: math.log(c / total) for w, c in zip(uni["word"], uni["n"])}
    logp_ref = ray.put(logp)

    def score(batch: pa.Table) -> pa.Table:
        lp = ray.get(logp_ref)
        all_toks: list[str] = []
        lens = np.empty(batch.num_rows, np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = tokenize(t)
            lens[i] = len(toks)
            all_toks.extend(toks)
        # one vectorized hash-map pass over the batch's token stream
        # instead of a Python dict lookup per token
        vals = pd.Series(all_toks, dtype=object).map(lp).to_numpy(np.float64)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        sums = np.add.reduceat(np.concatenate([vals, [0.0]]), bounds[:-1])
        sums[lens == 0] = 0.0
        lps = np.divide(sums, lens, out=np.zeros_like(sums),
                        where=lens > 0)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pa.array(lens),
                         "logprob": pa.array(_round4(lps))})

    out = (ds.map_batches(score, batch_format="pyarrow")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)
