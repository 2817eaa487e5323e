"""Deduplication pipelines over the documents table — the training-data
dedup suite (exact, word-set Jaccard, MinHash+LSH, SimHash, embedding
cosine near-dup). The crawl engine's clone detection (SURVEY.md O23,
reference checksum compare in src/index.cpp) is the exact case; the rest
are the standard large-scale near-dup family.

Scale pattern shared by all: per-batch signature computation in
map_batches (vectorized numpy), explode to (bucket_key, doc) rows, shuffle
ONLY the small signature rows (never the text), verify candidates, output
pairs/groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Min

from aspseek_ray.functions.hashing import content_hash64, fnv1a64, fnv1a64_arrow
from aspseek_ray.functions.text import tokenize

_MERSENNE = (1 << 61) - 1


# ------------------------------------------------------------------ exact O23
def exact_dedup(sf_dir: str) -> pa.Table:
    """Exact content dedup (clone detection O23): hash text per batch,
    group by hash, keep min doc_id as canonical. Output
    (canonical_id, n_docs) per distinct text.

    Hash is per-row blake2b-64 (content_hash64) — built for KB+ bodies and
    collision-safe at 10^9+-doc scale, unlike the short-string FNV kernel
    (whose column-sweep also allocates O(rows x max_len) temporaries on
    document-length input)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def hash_stage(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "content_hash": pa.array(content_hash64(batch["text"]))})

    from ray.data.aggregate import Count

    out = (ds.map_batches(hash_stage, batch_format="pyarrow")
             .groupby("content_hash")
             .aggregate(Min("doc_id", alias_name="canonical_id"),
                        Count(alias_name="n_docs")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.select(["canonical_id", "n_docs"]).set_column(
        1, "n_docs", t["n_docs"].cast(pa.int64()))


# ---------------------------------------------------------- word-set jaccard
def _doc_token_hashes(text: str, ngram: int = 1) -> np.ndarray:
    """Sorted distinct fnv1a64 hashes of a document's set elements:
    tokens (ngram=1) or space-joined token n-gram shingles (ngram>1 — the
    brief's n-gram Jaccard variant; a doc shorter than n tokens has an
    empty set)."""
    toks = tokenize(text)
    if ngram > 1:
        elems = {" ".join(toks[i:i + ngram])
                 for i in range(len(toks) - ngram + 1)}
    else:
        elems = set(toks)
    if not elems:
        return np.empty(0, np.int64)
    return np.unique(np.fromiter((fnv1a64(w) for w in elems),
                                 np.int64, len(elems)))


# Mean stored text bytes per doc above which jaccard_pairs switches from
# the ship-blobs-with-prefixes plan to the doc_id-only candidate pass +
# blob-table join: long docs make the O(prefix_len x |d|) per-doc payload
# of the prefix plan quadratic in doc length, while the join plan ships
# each blob once per candidate pair. Decided from parquet footer
# statistics — zero data read.
LONG_DOC_MEAN_BYTES = 16384


def _mean_text_bytes(path: str, column: str = "text") -> float:
    """Mean uncompressed bytes of ``column`` per row, from parquet footer
    metadata only (no scan)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = md.schema.names.index(column)
    total = sum(md.row_group(i).column(idx).total_uncompressed_size
                for i in range(md.num_row_groups))
    return total / max(1, md.num_rows)


def jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                  hot_k: int = 65536, cand_salt: int = 1024,
                  ngram: int = 1, plan: str = "auto",
                  long_doc_mean_bytes: int = LONG_DOC_MEAN_BYTES) -> pa.Table:
    """EXACT all-pairs word-set Jaccard >= threshold via PREFIX FILTERING
    (PPJoin/All-Pairs family — Bayardo et al. 2007, Xiao et al. 2008,
    public algorithms). Output (doc_a, doc_b, jaccard), doc_a < doc_b,
    jaccard rounded to 4 — identical pair set to the naive inverted-index
    all-pairs join (prefix filtering is lossless for J >= t). ``ngram``:
    set elements are token n-gram shingles instead of single tokens (the
    n-gram Jaccard variant; the whole PPJoin machinery is
    element-agnostic).

    Stages (ONE data shuffle; no joins, no pair-dedup pass):
      1. df sweep: explode distinct (word_hash, doc_id), groupby -> global
         document frequency; only the ``hot_k`` most frequent tokens are
         broadcast as the rare-first ORDER table (any consistent global
         order is correct; pushing hot tokens out of prefixes is what
         bounds candidate groups — the broadcast is O(hot_k), never
         O(vocab) or O(corpus)).
      2. prefix index: per doc, order tokens by (df_rank, hash) rare-first;
         the PREFIX is the first |d| - ceil(t*|d|) + 1 tokens
         (prefix-filtering principle: a qualifying pair shares a prefix
         token). One index row per prefix token, carrying the doc's full
         ordered hash blob + size + prefix length.
      3. grouped verify: groups are salted (word_hash % cand_salt coarse
         key, inner per-word scan) so no task sees an unbounded group.
         Within a word's bucket: size filter (J >= t implies min size >=
         t * max size), then each pair is verified and EMITTED EXACTLY
         ONCE globally — only in the group of the pair's MINIMAL common
         prefix token (so no distributed dedup is needed).

    Payload note — TWO physical plans behind a doc-length switch
    (``plan``: 'auto' decides by mean stored text bytes from parquet
    footer stats, 'prefix-blob' / 'blob-join' force):
      * prefix-blob (short docs, the web-page default): each prefix row
        ships the doc's token-hash blob, O(prefix_len x |d|) bytes per
        doc through the one shuffle; pairs are emitted exactly once via
        the minimal-common-prefix-token rule — no dedup pass.
      * blob-join (long docs): prefix rows carry doc_id/size ONLY
        (16 B/row); candidate pairs are deduped by one
        groupby(doc_a, doc_b), then verified by a hash-join against a
        (doc_id, blob) table — each blob ships once per candidate pair
        it appears in instead of once per prefix token. Identical output
        proven in tests/test_dedup_longdoc.py.
    For corpus-scale near-dup use minhash_lsh_pairs (the designed scale
    path)."""
    doc_path = f"{sf_dir}/documents.parquet"
    if plan == "auto":
        plan = ("blob-join"
                if _mean_text_bytes(doc_path) > long_doc_mean_bytes
                else "prefix-blob")
    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"])
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, words = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for wh in _doc_token_hashes(t, ngram):
                doc_ids.append(d)
                words.append(int(wh))
        return pa.table({"word_hash": pa.array(words, pa.int64()),
                         "doc_id": pa.array(doc_ids, pa.int64())})

    df_hot = (ds.map_batches(explode, batch_format="pyarrow")
                .groupby("word_hash").aggregate(Count(alias_name="df"))
                .sort("df", descending=True).limit(hot_k).to_pandas())
    hot_ref = ray.put(dict(zip(df_hot["word_hash"].astype(np.int64),
                               df_hot["df"].astype(np.int64))))

    if plan == "blob-join":
        return _jaccard_blob_join(ds, hot_ref, threshold, cand_salt, ngram)
    assert plan == "prefix-blob", plan

    def prefix_rows(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        grp_c, word_c, doc_c, size_c, plen_c, blob_c = [], [], [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            hs = _doc_token_hashes(t, ngram)
            n = len(hs)
            if n == 0:
                continue
            dfs = np.fromiter((hot.get(int(h), 1) for h in hs), np.int64, n)
            order = np.lexsort((hs, dfs))          # rare-first, hash tiebreak
            ordered = hs[order]
            blob = ordered.tobytes()
            p = n - int(np.ceil(threshold * n - 1e-9)) + 1
            for h in ordered[:p]:
                w = int(h)
                grp_c.append(w % cand_salt)
                word_c.append(w)
                doc_c.append(d)
                size_c.append(n)
                plen_c.append(p)
                blob_c.append(blob)
        return pa.table({"grp": pa.array(grp_c, pa.int64()),
                         "word_hash": pa.array(word_c, pa.int64()),
                         "doc_id": pa.array(doc_c, pa.int64()),
                         "size": pa.array(size_c, pa.int64()),
                         "plen": pa.array(plen_c, pa.int64()),
                         "blob": pa.array(blob_c, pa.binary())})

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for wh, grp in g.groupby("word_hash", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.drop_duplicates("doc_id").sort_values("doc_id")
            if len(grp) < 2:
                continue
            docs = grp["doc_id"].to_numpy()
            sz = grp["size"].to_numpy()
            pl = grp["plen"].to_numpy()
            arrs = [np.frombuffer(b, np.int64) for b in grp["blob"]]
            prefs = [a[:p] for a, p in zip(arrs, pl)]
            i_idx, j_idx = np.triu_indices(len(docs), k=1)
            keep = (np.minimum(sz[i_idx], sz[j_idx])
                    >= threshold * np.maximum(sz[i_idx], sz[j_idx]))
            for i, j in zip(i_idx[keep], j_idx[keep]):
                # emit a pair only in its minimal common PREFIX token's
                # group -> globally exactly-once, no dedup shuffle. Blobs
                # are stored in the global rare-first order, so the min
                # common prefix token is the FIRST element of i's prefix
                # that also occurs in j's (one vectorized isin).
                m = np.isin(prefs[i], prefs[j], assume_unique=True)
                if not m.any() or int(prefs[i][int(np.argmax(m))]) != wh:
                    continue
                inter = np.intersect1d(arrs[i], arrs[j],
                                       assume_unique=True).size
                jac = inter / float(sz[i] + sz[j] - inter)
                if jac >= threshold:
                    out_a.append(docs[i])
                    out_b.append(docs[j])
                    # SQL ROUND semantics (half away, divide) — small-int
                    # ratios DO hit exact .00005 boundaries where python
                    # round (half-even) diverges bitwise from the oracle
                    out_j.append(np.floor(jac * 1e4 + 0.5) / 1e4)
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype=np.int64),
                             "doc_b": pd.Series(out_b, dtype=np.int64),
                             "jaccard": pd.Series(out_j, dtype=np.float64)})

    out = (ds.map_batches(prefix_rows, batch_format="pyarrow")
             .groupby("grp").map_groups(verify_group, batch_format="pandas"))
    pdf = out.to_pandas()
    return pa.table({"doc_a": pa.array(pdf["doc_a"].to_numpy(), pa.int64()),
                     "doc_b": pa.array(pdf["doc_b"].to_numpy(), pa.int64()),
                     "jaccard": pa.array(pdf["jaccard"].to_numpy(), pa.float64())})


def _jaccard_blob_join(ds: "rd.Dataset", hot_ref, threshold: float,
                       cand_salt: int, ngram: int) -> pa.Table:
    """The long-document jaccard_pairs plan: doc_id-only candidate pass +
    blob-table hash-join verification (the switch jaccard_pairs's
    docstring documents). Prefix rows carry (word_hash, doc_id, size) —
    no blobs — so the candidate shuffle is O(prefix_len) x 16 B per doc
    regardless of doc length; each doc's ordered-hash blob then ships
    once per deduped candidate pair through two keyed groupbys, never
    once per prefix token. Identical (doc_a, doc_b, jaccard) output to
    the prefix-blob plan."""

    def cand_rows(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        grp_c, word_c, doc_c, size_c = [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            hs = _doc_token_hashes(t, ngram)
            n = len(hs)
            if n == 0:
                continue
            dfs = np.fromiter((hot.get(int(h), 1) for h in hs), np.int64, n)
            ordered = hs[np.lexsort((hs, dfs))]
            p = n - int(np.ceil(threshold * n - 1e-9)) + 1
            for h in ordered[:p]:
                w = int(h)
                grp_c.append(w % cand_salt)
                word_c.append(w)
                doc_c.append(d)
                size_c.append(n)
        return pa.table({"grp": pa.array(grp_c, pa.int64()),
                         "word_hash": pa.array(word_c, pa.int64()),
                         "doc_id": pa.array(doc_c, pa.int64()),
                         "size": pa.array(size_c, pa.int64())})

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("word_hash", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.drop_duplicates("doc_id").sort_values("doc_id")
            if len(grp) < 2:
                continue
            docs = grp["doc_id"].to_numpy()
            sz = grp["size"].to_numpy()
            i_idx, j_idx = np.triu_indices(len(docs), k=1)
            keep = (np.minimum(sz[i_idx], sz[j_idx])
                    >= threshold * np.maximum(sz[i_idx], sz[j_idx]))
            out_a.extend(docs[i_idx[keep]])
            out_b.extend(docs[j_idx[keep]])
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype=np.int64),
                             "doc_b": pd.Series(out_b, dtype=np.int64)})

    # candidate pairs, deduped exactly-once by one (doc_a, doc_b) groupby
    # (a pair surfaces once per shared prefix token — rows are 16 bytes,
    # the dedup shuffle is cheap; the prefix-blob plan avoids it with the
    # minimal-common-prefix-token rule instead because there the payload
    # is the blob)
    cands = (ds.map_batches(cand_rows, batch_format="pyarrow")
               .groupby("grp").map_groups(pairs_in_group,
                                          batch_format="pandas")
               .groupby(["doc_a", "doc_b"])
               .map_groups(lambda g: g.head(1), batch_format="pandas"))

    # hash-join candidates against the (doc_id, blob) table: explode each
    # pair to its two doc_ids, union with the blob rows, one groupby(key)
    # attaches the blob to every pair row of that doc
    def blob_rows(batch: pa.Table) -> pa.Table:
        key_c, blob_c = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            hs = _doc_token_hashes(t, ngram)
            if len(hs) == 0:
                continue
            key_c.append(d)
            blob_c.append(np.sort(hs).tobytes())
        n = len(key_c)
        return pa.table({"key": pa.array(key_c, pa.int64()),
                         "doc_a": pa.array([-1] * n, pa.int64()),
                         "doc_b": pa.array([-1] * n, pa.int64()),
                         "blob": pa.array(blob_c, pa.binary())})

    def pair_sides(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        n = len(a)
        return pa.table({"key": pa.array(np.r_[a, b], pa.int64()),
                         "doc_a": pa.array(np.r_[a, a], pa.int64()),
                         "doc_b": pa.array(np.r_[b, b], pa.int64()),
                         "blob": pa.array([None] * (2 * n), pa.binary())})

    def attach_blob(g: pd.DataFrame) -> pd.DataFrame:
        is_blob = g["doc_a"].to_numpy() == -1
        pairs = g[~is_blob]
        if not len(pairs) or not is_blob.any():
            return pairs.iloc[0:0].reset_index(drop=True)
        blob = g[is_blob]["blob"].iloc[0]
        out = pairs.copy()
        out["blob"] = [blob] * len(pairs)
        return out.reset_index(drop=True)

    sides = (ds.map_batches(blob_rows, batch_format="pyarrow")
               .union(cands.map_batches(pair_sides, batch_format="pyarrow"))
               .groupby("key").map_groups(attach_blob, batch_format="pandas"))

    def verify_pair(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                              "doc_b": pd.Series([], dtype=np.int64),
                              "jaccard": pd.Series([], dtype=np.float64)})
        if len(g) != 2:          # a side lost its blob (empty doc) — can't
            return empty         # happen for real candidates; be safe
        arrs = [np.frombuffer(b, np.int64) for b in g["blob"]]
        inter = np.intersect1d(arrs[0], arrs[1], assume_unique=True).size
        union = arrs[0].size + arrs[1].size - inter
        jac = inter / float(union)
        if jac < threshold:
            return empty
        return pd.DataFrame({
            "doc_a": pd.Series([g["doc_a"].iloc[0]], dtype=np.int64),
            "doc_b": pd.Series([g["doc_b"].iloc[0]], dtype=np.int64),
            # SQL ROUND (half away from zero) — match the prefix-blob
            # plan and the DuckDB oracle bitwise
            "jaccard": pd.Series([np.floor(jac * 1e4 + 0.5) / 1e4],
                                 dtype=np.float64)})

    out = sides.groupby(["doc_a", "doc_b"]).map_groups(
        verify_pair, batch_format="pandas")
    pdf = out.to_pandas()
    return pa.table({"doc_a": pa.array(pdf["doc_a"].to_numpy(), pa.int64()),
                     "doc_b": pa.array(pdf["doc_b"].to_numpy(), pa.int64()),
                     "jaccard": pa.array(pdf["jaccard"].to_numpy(),
                                         pa.float64())})


# --------------------------------------------------------------- minhash-lsh
def _minhash_params(num_perm: int, seed: int = 123) -> np.ndarray:
    """num_perm fixed 64-bit xor-seeds; h_i(x) = splitmix64(x ^ seed_i) —
    a full-width uint64 hash family, fully vectorizable (no bigint mod)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 2**63, size=num_perm, dtype=np.int64).view(np.uint64)


def minhash_signatures(batch: pa.Table, seeds: np.ndarray,
                       shingle_words: int = 3) -> tuple[list[int], np.ndarray]:
    """(doc_ids, signatures[n_docs, num_perm]) for a batch — one
    fnv1a64_arrow sweep over ALL shingles of the batch (C-speed), then a
    vectorized min over splitmix64(shingle_hash ^ seed_i) per doc."""
    from aspseek_ray.state.cuckoo import _mix

    num_perm = len(seeds)
    doc_ids = batch["doc_id"].to_pylist()
    all_shingles: list[str] = []
    offsets = [0]
    for t in batch["text"].to_pylist():
        toks = tokenize(t)
        if len(toks) < shingle_words:
            shingles = {" ".join(toks)} if toks else {""}
        else:
            shingles = {" ".join(toks[j:j + shingle_words])
                        for j in range(len(toks) - shingle_words + 1)}
        all_shingles.extend(shingles)
        offsets.append(len(all_shingles))
    hashes = fnv1a64_arrow(pa.array(all_shingles, pa.string())).view(np.uint64)
    sigs = np.empty((len(doc_ids), num_perm), dtype=np.int64)
    for i in range(len(doc_ids)):
        x = hashes[offsets[i]:offsets[i + 1]]
        vals = _mix(x[None, :] ^ seeds[:, None])      # (num_perm, n_shingles)
        sigs[i] = vals.min(axis=1).view(np.int64)
    return doc_ids, sigs


def minhash_lsh_pairs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5, salt: int = 64) -> pa.Table:
    """Approximate near-dup pairs via MinHash + LSH banding: signatures per
    batch -> explode (band_id, band_hash, doc_id) -> groupby salted band
    bucket -> candidate pairs -> estimate jaccard as signature agreement,
    filter. Output (doc_a, doc_b, est_jaccard).

    Candidate groups are keyed (band_id, band_hash % salt): all rows of one
    LSH bucket land in one group (identical pairs for any salt), but no
    group exceeds ~corpus/salt signature rows — the per-task memory dial.
    salt=64 suits the sandbox; at 10^9+ docs raise it so bands*salt groups
    of ~fixed row count (the map_groups per-call overhead is amortized by
    the vectorized inner bucket scan)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    seeds = _minhash_params(num_perm)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids, sigs = minhash_signatures(batch, seeds)
        n = len(doc_ids)
        band_ids, band_hashes, docs, sig_blobs = [], [], [], []
        for i in range(n):
            sig = sigs[i]
            for bi in range(bands):
                chunk = sig[bi * rows_per_band:(bi + 1) * rows_per_band]
                band_ids.append(bi)
                band_hashes.append(fnv1a64(chunk.tobytes()))
                docs.append(doc_ids[i])
                sig_blobs.append(sig.tobytes())
        bh = np.asarray(band_hashes, np.int64)
        grp = np.asarray(band_ids, np.int64) * salt + (bh % salt)
        return pa.table({
            "grp": pa.array(grp),
            "band_hash": pa.array(bh),
            "doc_id": pa.array(docs, pa.int64()),
            "sig": pa.array(sig_blobs, pa.binary()),
        })

    exploded = ds.map_batches(band_rows, batch_format="pyarrow")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        """One call per salted group (bands x salt groups, not one per
        bucket): vectorized inner grouping by band_hash; only colliding
        buckets (>=2 docs) cost python."""
        out_a, out_b, out_e = [], [], []
        for _, bucket in g.groupby("band_hash", sort=False):
            if len(bucket) < 2:
                continue
            bucket = bucket.drop_duplicates("doc_id").sort_values("doc_id")
            if len(bucket) < 2:
                continue
            docs = bucket["doc_id"].to_numpy()
            sigs = np.stack([np.frombuffer(s, dtype=np.int64)
                             for s in bucket["sig"]])
            i, j = np.triu_indices(len(docs), k=1)
            est = (sigs[i] == sigs[j]).mean(axis=1)
            out_a.append(docs[i]); out_b.append(docs[j]); out_e.append(est)
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "est_jaccard": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b),
                             "est_jaccard": np.round(np.concatenate(out_e), 4)})

    pairs = (exploded.groupby("grp")
             .map_groups(candidates, batch_format="pandas"))
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "est_jaccard": pa.array([], pa.float64())})
    pdf = (pdf[pdf["est_jaccard"] >= threshold]
           .drop_duplicates(["doc_a", "doc_b"])
           .reset_index(drop=True))
    return pa.Table.from_pandas(pdf, preserve_index=False)


# -------------------------------------------------------------------- simhash
def simhash64_ds(sf_dir: str) -> "rd.Dataset":
    """(doc_id, simhash) as a lazy Dataset — 64-bit SimHash over token
    hashes weighted by term frequency (Charikar 2002, public algorithm).
    Stays a Dataset end-to-end: at 10^10 docs the signature table is
    ~160 GB and must never concat on the driver; downstream stages
    (simhash_near_pairs) consume this directly."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sim(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tok_lists = [tokenize(t) for t in texts]
        uniqs, cnts, offsets = [], [], [0]
        for toks in tok_lists:
            if toks:
                u, c = np.unique(toks, return_counts=True)
                uniqs.append(u)
                cnts.append(c)
            offsets.append(offsets[-1] + (len(uniqs[-1]) if toks else 0))
        if uniqs:
            all_words = np.concatenate(uniqs)
            hs_all = fnv1a64_arrow(pa.array(all_words.tolist(), pa.string())).view(np.uint64)
            cnt_all = np.concatenate(cnts)
        else:
            hs_all = np.empty(0, np.uint64)
            cnt_all = np.empty(0, np.int64)
        bit_idx = np.arange(64, dtype=np.uint64)
        # one (n_words, 64) bit expansion for the whole batch
        bits = ((hs_all[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        weighted = (bits * 2 - 1) * cnt_all[:, None]
        out = np.empty(batch.num_rows, dtype=np.int64)
        powers = (np.uint64(1) << bit_idx)
        for i in range(batch.num_rows):
            lo, hi = offsets[i], offsets[i + 1]
            if lo == hi:
                out[i] = 0
                continue
            v = weighted[lo:hi].sum(axis=0)
            out[i] = powers[v > 0].sum().astype(np.uint64).view(np.int64) if (v > 0).any() else 0
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out)})

    return ds.map_batches(sim, batch_format="pyarrow")


def simhash64(sf_dir: str) -> pa.Table:
    """Public small-result Table wrapper over simhash64_ds (tests/REPL
    only — pipelines consume the Dataset form)."""
    return pa.concat_tables(ray.get(simhash64_ds(sf_dir).materialize().to_arrow_refs()))


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3,
                       salt: int = 64) -> pa.Table:
    """Near-dup pairs at hamming distance <= max_hamming via 4-block LSH
    (pigeonhole: any pair within distance 3 agrees on >= 1 of 4 16-bit
    blocks). Output (doc_a, doc_b, hamming).

    Groups are keyed (block_id, block_key % salt) — identical pairs for any
    salt, per-group rows bounded by ~corpus/salt (see minhash_lsh_pairs)."""
    ds = simhash64_ds(sf_dir)

    def blocks(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy().view(np.uint64)
        doc = batch["doc_id"].to_numpy()
        rows_doc, rows_grp, rows_key, rows_sh = [], [], [], []
        for bi in range(4):
            key = ((sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            rows_doc.append(doc)
            rows_grp.append(bi * salt + (key % salt))
            rows_key.append(key)
            rows_sh.append(sh.view(np.int64))
        return pa.table({
            "grp": pa.array(np.concatenate(rows_grp)),
            "block_key": pa.array(np.concatenate(rows_key)),
            "doc_id": pa.array(np.concatenate(rows_doc)),
            "simhash": pa.array(np.concatenate(rows_sh)),
        })

    def near(g: pd.DataFrame) -> pd.DataFrame:
        """One call per salted group; inner grouping by block_key
        vectorized, python only in colliding buckets."""
        out_a, out_b, out_h = [], [], []
        for _, bucket in g.groupby("block_key", sort=False):
            if len(bucket) < 2:
                continue
            bucket = bucket.drop_duplicates("doc_id").sort_values("doc_id")
            if len(bucket) < 2:
                continue
            docs = bucket["doc_id"].to_numpy()
            sh = bucket["simhash"].to_numpy().view(np.uint64)
            i, j = np.triu_indices(len(docs), k=1)
            x = sh[i] ^ sh[j]
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x = x >> np.uint64(1)
            keep = ham <= max_hamming
            out_a.append(docs[i][keep]); out_b.append(docs[j][keep])
            out_h.append(ham[keep])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    pairs = (ds.map_batches(blocks, batch_format="pyarrow")
               .groupby("grp")
               .map_groups(near, batch_format="pandas")).to_pandas()
    if len(pairs) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    pairs = pairs.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(pairs, preserve_index=False)


# -------------------------------------------------- duplicate-group closure
def _forest_batch(batch: pa.Table) -> pa.Table:
    """Per-block union-find -> spanning-forest edges (node, min-root of its
    block-local component). Preserves every node and the block's
    connectivity in <= #distinct-nodes rows — the contraction step."""
    u = batch["u"].to_numpy()
    v = batch["v"].to_numpy()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(u, v):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {n: find(n) for n in parent}
    out_u = np.fromiter(roots.values(), np.int64, len(roots))
    out_v = np.fromiter(roots.keys(), np.int64, len(roots))
    keep = out_u != out_v          # drop self-loops (component roots)
    return pa.table({"u": pa.array(out_u[keep]), "v": pa.array(out_v[keep])})


def connected_components(pairs: pa.Table, max_iters: int = 20) -> pa.Table:
    """Cluster near-dup PAIRS (doc_a, doc_b) into duplicate groups.
    Returns (doc_id, group_id = min doc_id of the component) for every doc
    appearing in a pair.

    Scalable hierarchical contraction (hash-bucketed union-find per
    partition + merge — no O(nodes) driver structure, no per-iteration
    broadcast): each level runs a union-find per BLOCK emitting that
    block's spanning forest (connectivity-preserving, <= #block-nodes
    rows), then repartitions into 4x fewer blocks so forests merge; levels
    repeat until one block remains and a final in-task union-find labels
    every node. Total work O(E log B); the only requirement is that the
    contracted forest (one row per node appearing in pairs, minus merged
    components) fits a single task at the last level — for dedup-pair
    graphs (dup nodes << corpus) this holds by orders of magnitude; beyond
    that, switch the last level to label-propagation joins."""
    if pairs.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "group_id": pa.array([], pa.int64())})
    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    edges = rd.from_arrow(pa.table({"u": pa.array(a), "v": pa.array(b)}))
    nb = max(1, min(16, pairs.num_rows // 65536))
    edges = edges.repartition(nb)
    levels = 0
    while nb > 1:
        edges = edges.map_batches(_forest_batch, batch_format="pyarrow",
                                  batch_size=None)
        nb = max(1, nb // 4)
        edges = edges.repartition(nb).materialize()
        levels += 1
        if levels > max_iters:  # unreachable: nb strictly shrinks
            raise RuntimeError("contraction did not converge")

    def label_all(batch: pa.Table) -> pa.Table:
        f = _forest_batch(batch)          # exact roots of the final forest
        doc = np.concatenate([f["v"].to_numpy(), f["u"].to_numpy()])
        grp = np.concatenate([f["u"].to_numpy(), f["u"].to_numpy()])
        # roots label themselves; dedupe (a root appears once per child)
        order = np.argsort(doc, kind="stable")
        doc, grp = doc[order], grp[order]
        keep = np.ones(len(doc), dtype=bool)
        keep[1:] = doc[1:] != doc[:-1]
        return pa.table({"doc_id": pa.array(doc[keep]),
                         "group_id": pa.array(grp[keep])})

    out = edges.map_batches(label_all, batch_format="pyarrow",
                            batch_size=None)
    t = pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))
    return t.sort_by("doc_id")


def near_dup_groups(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """End-to-end near-dup grouping: exact word-set-Jaccard pairs >=
    threshold -> connected components -> (doc_id, group_id)."""
    return connected_components(jaccard_pairs(sf_dir, threshold))


# ------------------------------------------------------- embedding near-dup
@ray.remote
def _normalized_matrix(path: str) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, L2-normalized matrix) built ON A WORKER — the driver only
    holds the ObjectRef, never the O(n x d) array."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    M = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    return ids, M


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.95,
                             broadcast_max_rows: int = 500_000,
                             n_clusters: int = 32, n_assign: int = 2,
                             train_iters: int = 4) -> pa.Table:
    """Cosine near-dup over the embeddings table. Two physical plans
    behind a size switch (the pagerank pattern):

    * <= ``broadcast_max_rows``: EXACT blocked matmul of L2-normalized
      vectors against a broadcast matrix (built on a worker, shared
      zero-copy via the object store) — the oracle baseline, O(n^2)
      scoring batch x full, right up to the largest matrix a worker heap
      holds.
    * beyond: IVF-bucketed pair search — no whole-table matrix and no
      O(n^2) anywhere: a k-means coarse quantizer
      (similarity.train_centroids) assigns each vector to its
      ``n_assign`` nearest clusters (multi-assignment so boundary pairs
      still co-bucket), vectors shuffle ONCE into cluster groups, and
      all-pairs scoring runs within each group only. A pair sharing
      several clusters is emitted exactly once — by its MINIMAL common
      cluster (the PPJoin minimal-common-token trick used by
      jaccard_pairs). Approximate: pairs whose members share no cluster
      are missed (recall rises with n_assign / n_clusters tuning).

    Output (vec_a, vec_b, cosine), vec_a < vec_b."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    if emb.count() > broadcast_max_rows:
        return _embedding_near_dup_bucketed(emb, threshold, n_clusters,
                                            n_assign, train_iters)
    mat_ref = _normalized_matrix.remote(f"{sf_dir}/embeddings.parquet")

    def block(batch: pa.Table) -> pa.Table:
        bids = batch["vec_id"].to_numpy()
        B = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        all_ids, allM = ray.get(mat_ref)
        S = B @ allM.T
        bi, aj = np.nonzero(S >= threshold)
        va, vb = bids[bi], all_ids[aj]
        keep = va < vb
        return pa.table({"vec_a": pa.array(va[keep].astype(np.int64)),
                         "vec_b": pa.array(vb[keep].astype(np.int64)),
                         "cosine": pa.array(np.round(S[bi, aj][keep], 4))})

    out = emb.map_batches(block, batch_format="pyarrow", batch_size=1024)
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def _embedding_near_dup_bucketed(emb: rd.Dataset, threshold: float,
                                 n_clusters: int, n_assign: int,
                                 train_iters: int) -> pa.Table:
    """IVF-bucketed near-dup pair scan (the scale path of
    embedding_near_dup_pairs). One shuffle into cluster groups; per-group
    all-pairs is bounded by the cluster size, never the table size."""
    from aspseek_ray.pipelines.similarity import train_centroids

    C = train_centroids(emb, n_clusters, train_iters)
    c_ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        C_ = ray.get(c_ref)
        M = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        na = min(n_assign, C_.shape[0])
        top = np.argsort(-(M @ C_.T), axis=1)[:, :na]       # (n, na)
        codes = np.sort(top, axis=1).astype(np.int64)       # sorted per vec
        n = len(M)
        return pa.table({
            "vec_id": pa.array(np.repeat(batch["vec_id"].to_numpy(), na)),
            "embedding": pa.array(np.repeat(M, na, axis=0).tolist(),
                                  pa.list_(pa.float64())),
            "code": pa.array(codes.reshape(-1)),
            "codes": pa.array(np.tile(codes, (1, 1)).tolist(),
                              pa.list_(pa.int64())).take(
                pa.array(np.repeat(np.arange(n), na))),
        })

    def score_group(g: pd.DataFrame) -> pd.DataFrame:
        code = int(g["code"].iloc[0])
        M = np.stack(g["embedding"].to_list())              # pre-normalized
        vids = g["vec_id"].to_numpy()
        codes_of = [set(c) for c in g["codes"]]
        S = M @ M.T
        ii, jj = np.nonzero(np.triu(S >= threshold, k=1))
        out_a, out_b, out_c = [], [], []
        for i, j in zip(ii, jj):
            if vids[i] == vids[j]:
                continue                                    # same vec, 2 codes
            common = codes_of[i] & codes_of[j]
            if min(common) != code:                         # emit ONCE
                continue
            a, b = int(vids[i]), int(vids[j])
            if a > b:
                a, b = b, a
            out_a.append(a)
            out_b.append(b)
            out_c.append(round(float(S[i, j]), 4))
        return pd.DataFrame({"vec_a": np.asarray(out_a, np.int64),
                             "vec_b": np.asarray(out_b, np.int64),
                             "cosine": np.asarray(out_c, np.float64)})

    out = (emb.map_batches(assign, batch_format="pyarrow", batch_size=4096)
              .groupby("code")
              .map_groups(score_group, batch_format="pandas"))
    parts = [t for t in ray.get(out.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    return pa.concat_tables(parts).combine_chunks()


# -------------------------------------------------- duplicate n-gram spans
def duplicate_spans(sf_dir: str, k: int = 5) -> pa.Table:
    """Cross-document duplicate-span detection — the exact-substring
    dedup signal of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ACL 2022), in its distributed n-gram form:
    a doc's ``k``-token gram is a DUPLICATE SPAN iff the same gram occurs
    in at least one other document. Output per doc (docs with >= k
    tokens): (doc_id, n_grams [distinct], n_dup_grams, dup_ratio) — the
    per-document duplicated-span fraction a filter stage thresholds on.

    Scale shape (suffix arrays don't distribute; hashed grams do):
      1. map_batches: tokenize, then VECTORIZED gram hashing — one
         fnv1a64_arrow sweep over the batch's flat token column, a
         sliding-window polynomial combine (mod-2^64 uint64 wraparound,
         FNV-prime powers) for the k-gram hash, one lexsort for the
         per-doc distinct — no per-gram string building; only
         (h, doc_id) uint64 pairs leave the stage, never text.
      2. groupby(h): group size IS the gram's distinct-doc count (a doc
         never spans batches and grams are per-doc distinct); emit
         (doc_id, dup) memberships.
      3. groupby(doc_id): per-doc counts. Two all-to-all exchanges of
         16-byte rows — the standard count-then-redistribute shape, no
         broadcast of an unbounded dup set, no driver materialization.

    The gram hash is g(i) = sum_j fnv1a64(tok_{i+j}) * PRIME^(k-1-j)
    mod 2^64 — mirrored term-for-term by the SQL oracle via the split
    64x64 multiply (__ray_entry__._mul64c).
    """
    path = f"{sf_dir}/documents.parquet"
    prime = np.uint64(1099511628211)                 # FNV prime, reused
    powers = np.empty(k, np.uint64)
    powers[k - 1] = 1
    with np.errstate(over="ignore"):
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * prime

    def grams(batch: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.int64())})
        toks_per_doc = [tokenize(t or "")
                        for t in batch["text"].to_pylist()]
        lens = np.array([len(t) for t in toks_per_doc], np.int64)
        keep = lens >= k
        if not keep.any():
            return empty
        doc_ids = batch["doc_id"].to_numpy()[keep]
        toks_per_doc = [t for t, kp in zip(toks_per_doc, keep) if kp]
        lens = lens[keep]
        flat = [w for toks in toks_per_doc for w in toks]
        hv = fnv1a64_arrow(pa.array(flat, pa.string())).astype(np.uint64)
        # all windows over the flat array; windows crossing a doc
        # boundary are masked out via each doc's [start, end-k] range
        win = np.lib.stride_tricks.sliding_window_view(hv, k)
        with np.errstate(over="ignore"):
            g = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        n_win = lens - k + 1
        doc_of = np.repeat(np.arange(len(lens)), n_win)
        pos = np.concatenate([np.arange(s, s + m)
                              for s, m in zip(starts, n_win)])
        g = g[pos]
        # per-(doc, gram) distinct via one lexsort over the batch
        order = np.lexsort((g, doc_of))
        doc_of, g = doc_of[order], g[order]
        first = np.r_[True, (doc_of[1:] != doc_of[:-1]) | (g[1:] != g[:-1])]
        return pa.table({"h": pa.array(g[first]),
                         "doc_id": pa.array(doc_ids[doc_of[first]])})

    def mark(group: pa.Table) -> pa.Table:
        dup = group.num_rows >= 2
        return pa.table({
            "doc_id": group["doc_id"],
            "dup": pa.array(np.full(group.num_rows, np.int64(dup))),
        })

    def per_doc(group: pa.Table) -> pa.Table:
        n = group.num_rows
        nd = int(pc.sum(group["dup"]).as_py() or 0)
        return pa.table({
            "doc_id": group["doc_id"][:1],
            "n_grams": pa.array([n], pa.int64()),
            "n_dup_grams": pa.array([nd], pa.int64()),
            "dup_ratio": pa.array([nd / n], pa.float64()),
        })

    out = (rd.read_parquet(path, columns=["doc_id", "text"])
             .map_batches(grams, batch_format="pyarrow")
             .groupby("h").map_groups(mark, batch_format="pyarrow")
             .groupby("doc_id").map_groups(per_doc, batch_format="pyarrow"))
    parts = [t for t in ray.get(out.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64()),
                         "n_dup_grams": pa.array([], pa.int64()),
                         "dup_ratio": pa.array([], pa.float64())})
    return pa.concat_tables(parts)


# ------------------------------------------------------------- SemDeDup
def semdedup_keep(sf_dir: str, eps: float = 0.93, n_clusters: int = 16,
                  train_iters: int = 4) -> pa.Table:
    """Semantic deduplication (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): k-means the
    embedding space into ``n_clusters``, then WITHIN each cluster drop
    every vector that has cosine similarity > ``eps`` to any vector
    FARTHER from the centroid than itself — the paper's keep-the-atypical
    rule. Guarantee: within a cluster the kept set is pairwise <= eps
    (a kept vector, by construction, has no > eps neighbor among the
    vectors after it in centroid-similarity order, which includes every
    other kept vector).

    Scale shape: the k-means E-step is per-batch partial sums
    (similarity.train_centroids); vectors shuffle ONCE into their single
    nearest-cluster group; the O(c^2) pairwise matmul is bounded by the
    cluster size, never the table size (the paper runs 100k clusters over
    LAION-scale corpora for exactly this reason). Deterministic: centroid
    init from the first n_clusters rows, ties broken by vec_id.

    Output: (vec_id, cluster, keep, max_dup_sim) for EVERY input vector,
    where max_dup_sim is the max cosine to a later-in-order clustermate
    (0.0 for singletons / last-in-order)."""
    from aspseek_ray.pipelines.similarity import train_centroids

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    C = train_centroids(emb, n_clusters, train_iters)
    c_ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        C_ = ray.get(c_ref)
        M = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sim = M @ C_.T
        a = np.argmax(sim, axis=1)
        return pa.table({
            "vec_id": batch["vec_id"],
            "embedding": pa.array(M.tolist(), pa.list_(pa.float64())),
            "cluster": pa.array(a.astype(np.int64)),
            "centroid_sim": pa.array(sim[np.arange(len(a)), a]),
        })

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        # paper order: closest-to-centroid first, so the kept survivor of
        # each duplicate set is the one FARTHEST from the centroid
        g = g.sort_values(["centroid_sim", "vec_id"],
                          ascending=[False, True])
        M = np.stack(g["embedding"].to_list())      # pre-normalized
        n = len(M)
        if n == 1:
            return pd.DataFrame({"vec_id": g["vec_id"].to_numpy(),
                                 "cluster": g["cluster"].to_numpy(),
                                 "keep": np.array([True]),
                                 "max_dup_sim": np.array([0.0])})
        S = M @ M.T
        iu = np.triu_indices(n, k=1)
        upper = np.full((n, n), -np.inf)
        upper[iu] = S[iu]                            # sims to LATER rows only
        mx = upper.max(axis=1)                       # row-wise: max sim ahead
        mx[n - 1] = 0.0                              # last row has no 'ahead'
        return pd.DataFrame({"vec_id": g["vec_id"].to_numpy(),
                             "cluster": g["cluster"].to_numpy(),
                             "keep": mx <= eps,
                             "max_dup_sim": np.round(mx, 4)})

    out = (emb.map_batches(assign, batch_format="pyarrow")
              .groupby("cluster")
              .map_groups(dedup_cluster, batch_format="pandas")
              .to_pandas())
    out = out.sort_values("vec_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
