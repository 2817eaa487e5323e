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
from ray.data.aggregate import Min, Sum

from aspseek_ray.functions.hashing import fnv1a64, fnv1a64_arrow
from aspseek_ray.functions.text import tokenize

_MERSENNE = (1 << 61) - 1


# ------------------------------------------------------------------ exact O23
def exact_dedup(sf_dir: str) -> pa.Table:
    """Exact content dedup (clone detection O23): hash text per batch,
    group by hash, keep min doc_id as canonical. Output
    (canonical_id, n_docs) per distinct text."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def hash_stage(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "content_hash": pa.array(fnv1a64_arrow(batch["text"]))})

    from ray.data.aggregate import Count

    out = (ds.map_batches(hash_stage, batch_format="pyarrow")
             .groupby("content_hash")
             .aggregate(Min("doc_id", alias_name="canonical_id"),
                        Count(alias_name="n_docs")))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.select(["canonical_id", "n_docs"]).set_column(
        1, "n_docs", t["n_docs"].cast(pa.int64()))


# ---------------------------------------------------------- word-set jaccard
def jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """EXACT all-pairs word-set Jaccard >= threshold via an inverted index:
    explode (word_hash, doc_id), self-join per word (groupby), count
    co-occurrences, then jaccard = inter / (|A| + |B| - inter). Only
    signature rows shuffle. Output (doc_a, doc_b, jaccard) with
    doc_a < doc_b, jaccard rounded to 4.

    Scale note: high-df words make the per-word pair fan-out quadratic —
    the standard exact fix is PREFIX FILTERING (PPJoin family): order each
    doc's tokens rare-first and index only the first
    floor((1 - threshold) * |d|) + 1 of them; no pair above threshold is
    missed and hot-word groups shrink by orders of magnitude. Kept simple
    here (oracle parity); apply the prefix index before running this at
    100-TB document counts."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, words = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for w in set(tokenize(t)):
                doc_ids.append(d)
                words.append(fnv1a64(w))
        return pa.table({"word_hash": pa.array(words, pa.int64()),
                         "doc_id": pa.array(doc_ids, pa.int64())})

    tok = ds.map_batches(explode, batch_format="pyarrow").materialize()

    # per-doc set sizes (broadcast — one int per doc, small)
    counts = (tok.map_batches(
                 lambda b: pa.table({"doc_id": b["doc_id"],
                                     "one": pa.array(np.ones(b.num_rows, np.int64))}),
                 batch_format="pyarrow")
              .groupby("doc_id").aggregate(Sum("one", alias_name="set_size"))
              .to_pandas())
    size_of = dict(zip(counts["doc_id"], counts["set_size"]))
    size_ref = ray.put(size_of)

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(g["doc_id"].to_numpy())
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        i, j = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"doc_a": docs[i], "doc_b": docs[j]})

    co = (tok.groupby("word_hash")
             .map_groups(pairs_in_group, batch_format="pandas")
             .map_batches(lambda b: pa.table({
                 "doc_a": b["doc_a"].cast(pa.int64()),
                 "doc_b": b["doc_b"].cast(pa.int64()),
                 "inter": pa.array(np.ones(b.num_rows, np.int64))}),
                 batch_format="pyarrow")
             .groupby(["doc_a", "doc_b"])
             .aggregate(Sum("inter", alias_name="inter")))

    def score(batch: pa.Table) -> pa.Table:
        size_map = ray.get(size_ref)
        a = batch["doc_a"].to_numpy()
        b = batch["doc_b"].to_numpy()
        inter = batch["inter"].to_numpy().astype(np.float64)
        sa = np.fromiter((size_map[x] for x in a), np.float64, len(a))
        sb = np.fromiter((size_map[x] for x in b), np.float64, len(b))
        jac = inter / (sa + sb - inter)
        keep = jac >= threshold
        return pa.table({"doc_a": pa.array(a[keep]),
                         "doc_b": pa.array(b[keep]),
                         "jaccard": pa.array(np.round(jac[keep], 4))})

    out = co.map_batches(score, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


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
                      threshold: float = 0.5) -> pa.Table:
    """Approximate near-dup pairs via MinHash + LSH banding: signatures per
    batch -> explode (band_id, band_hash, doc_id) -> groupby band bucket ->
    candidate pairs -> estimate jaccard as signature agreement, filter.
    Output (doc_a, doc_b, est_jaccard)."""
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
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "sig": pa.array(sig_blobs, pa.binary()),
        })

    exploded = ds.map_batches(band_rows, batch_format="pyarrow")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        """One call per band_id (16 coarse groups, not one per bucket):
        vectorized inner grouping by band_hash; only colliding buckets
        (>=2 docs) cost python."""
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

    pairs = (exploded.groupby("band_id")
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
def simhash64(sf_dir: str) -> pa.Table:
    """(doc_id, simhash) — 64-bit SimHash over token hashes weighted by
    term frequency (Charikar 2002, public algorithm)."""
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

    out = ds.map_batches(sim, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.to_arrow_refs()))


def simhash_near_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs at hamming distance <= max_hamming via 4-block LSH
    (pigeonhole: any pair within distance 3 agrees on >= 1 of 4 16-bit
    blocks). Output (doc_a, doc_b, hamming)."""
    t = simhash64(sf_dir)
    ds = rd.from_arrow(t)

    def blocks(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy().view(np.uint64)
        doc = batch["doc_id"].to_numpy()
        rows_doc, rows_block, rows_key, rows_sh = [], [], [], []
        for bi in range(4):
            key = ((sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            rows_doc.append(doc)
            rows_block.append(np.full(len(doc), bi, np.int32))
            rows_key.append(key)
            rows_sh.append(sh.view(np.int64))
        return pa.table({
            "block_id": pa.array(np.concatenate(rows_block)),
            "block_key": pa.array(np.concatenate(rows_key)),
            "doc_id": pa.array(np.concatenate(rows_doc)),
            "simhash": pa.array(np.concatenate(rows_sh)),
        })

    def near(g: pd.DataFrame) -> pd.DataFrame:
        """One call per block_id (4 coarse groups); inner grouping by
        block_key vectorized, python only in colliding buckets."""
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
               .groupby("block_id")
               .map_groups(near, batch_format="pandas")).to_pandas()
    if len(pairs) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    pairs = pairs.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(pairs, preserve_index=False)


# -------------------------------------------------- duplicate-group closure
def connected_components(pairs: pa.Table, max_iters: int = 20) -> pa.Table:
    """Cluster near-dup PAIRS (doc_a, doc_b) into duplicate groups via
    iterative min-label propagation (the scalable all-groupby formulation:
    each round every node adopts the smallest label among itself and its
    neighbors; converges in O(diameter) rounds). Returns
    (doc_id, group_id = min doc_id of the component) for every doc that
    appears in a pair. Iteration count is checked — raises if not
    converged (pathological chains need more rounds).

    Scale note: each iteration is one groupby over the edge list — the
    standard label-propagation CC. The label map covers only nodes that
    appear in near-dup pairs (<< corpus size); at extreme pair counts,
    replace the broadcast map with a labels Dataset joined per round."""
    if pairs.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "group_id": pa.array([], pa.int64())})
    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    # undirected edge list, both directions
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)})).materialize()

    # label(node) starts as node id
    nodes = np.unique(src)
    labels = {int(n): int(n) for n in nodes}
    for _ in range(max_iters):
        lab_ref = ray.put(labels)

        def propose(batch: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            s = batch["src"].to_numpy()
            d = batch["dst"].to_numpy()
            prop = np.fromiter((lab[int(x)] for x in s), np.int64, len(s))
            return pa.table({"node": pa.array(d), "label": pa.array(prop)})

        agg = (edges.map_batches(propose, batch_format="pyarrow")
               .groupby("node").aggregate(Min("label", alias_name="label"))
               ).to_pandas()
        changed = False
        for n, l in zip(agg["node"], agg["label"]):
            n, l = int(n), int(l)
            if l < labels[n]:
                labels[n] = l
                changed = True
        # pointer doubling (label-of-label) => O(log diameter) rounds
        for n in labels:
            ln = labels[n]
            if labels.get(ln, ln) < ln:
                labels[n] = labels[ln]
                changed = True
        if not changed:
            break
    else:
        raise RuntimeError(f"label propagation did not converge in {max_iters} iters")
    out_nodes = sorted(labels)
    return pa.table({"doc_id": pa.array(out_nodes, pa.int64()),
                     "group_id": pa.array([labels[n] for n in out_nodes], pa.int64())})


def near_dup_groups(sf_dir: str, threshold: float = 0.5) -> pa.Table:
    """End-to-end near-dup grouping: exact word-set-Jaccard pairs >=
    threshold -> connected components -> (doc_id, group_id)."""
    return connected_components(jaccard_pairs(sf_dir, threshold))


# ------------------------------------------------------- embedding near-dup
def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.95) -> pa.Table:
    """Cosine near-dup over the embeddings table: blocked matmul of
    L2-normalized vectors against a broadcast matrix. O(n^2) scoring done
    batch x full — the brute baseline; the LSH path is
    similarity.lsh_topk. Output (vec_a, vec_b, cosine) with vec_a < vec_b."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    full = pa.concat_tables(ray.get(emb.to_arrow_refs()))
    ids = full["vec_id"].to_numpy()
    M = np.stack(full["embedding"].to_pylist()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((ids, M))

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
    return pa.concat_tables(ray.get(out.to_arrow_refs()))
