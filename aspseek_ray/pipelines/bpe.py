"""BPE tokenizer TRAINING over the documents table — the vocabulary-
learning half of the token-counting lane (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016):
iteratively merge the most frequent adjacent symbol pair over a
word-frequency table, starting from characters + a word-final marker.

Pinned semantics (what the pytest reference implementation mirrors):

* words = the repo's pinned tokenizer (lowercase, [a-z0-9] runs);
  initial symbols = characters of the word plus a final ``</w>`` marker.
* a pair's count = sum over words of (count of ADJACENT occurrences of
  the pair in the word's current symbol sequence) x word frequency;
  occurrences within a word are counted left-to-right NON-overlapping
  ("aaaa" holds two ("a","a") occurrences, not three).
* each round merges the single best pair; ties on count break by
  lexicographic (left, right) ascending. Training stops after
  ``n_merges`` rounds or when the best count drops below ``min_count``.
* applying a merge rewrites occurrences left-to-right non-overlapping.

Scale shape: the corpus-size pass happens ONCE (distributed word count —
only (word, n) rows shuffle); every merge round then runs over the
word-frequency table, which is orders of magnitude smaller than the
corpus (distinct words, Zipf-bounded). Under ``local_max_words`` the
table is collected once and the loop runs driver-local (the correct
plan whenever the vocab fits — and it fits far beyond web-corpus vocab
sizes). Above it, each round is two small Dataset jobs over the symbol
table: map_batches pair-count partials (pre-aggregated per batch) ->
groupby(pair).sum -> top-1 collect, then map_batches(apply merge) and
re-materialize. Both plans are proven merge-for-merge identical in
tests/test_bpe.py.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from aspseek_ray.functions.text import tokenize

END = "</w>"


# ----------------------------------------------------------- shared kernels
def _pair_counts_of(seqs: list[tuple[str, ...]],
                    counts: list[int]) -> dict[tuple[str, str], int]:
    """Non-overlapping adjacent-pair counts over symbol sequences."""
    out: dict[tuple[str, str], int] = {}
    for seq, c in zip(seqs, counts):
        i, n = 0, len(seq)
        while i + 1 < n:
            p = (seq[i], seq[i + 1])
            out[p] = out.get(p, 0) + c
            i += 2 if (i + 2 < n and seq[i + 1] == seq[i]
                       and seq[i + 2] == seq[i + 1]) else 1
    return out


def _apply_merge(seq: tuple[str, ...], left: str, right: str,
                 joined: str) -> tuple[str, ...]:
    """Rewrite (left, right) -> joined, left-to-right non-overlapping."""
    out: list[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def _best_pair(pc: dict[tuple[str, str], int],
               min_count: int) -> tuple[str, str] | None:
    if not pc:
        return None
    best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    return best[0] if best[1] >= min_count else None


# ----------------------------------------------------- distributed word pass
def word_freq_table(sf_dir: str) -> pa.Table:
    """One corpus pass: (word, n) frequency table. Per-batch partial
    counts (only distinct-word rows leave each task), one groupby(word)
    merge — the word_df shape."""
    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for w in tokenize(t or ""):
                acc[w] = acc.get(w, 0) + 1
        return pa.table({"word": pa.array(list(acc), pa.string()),
                         "n": pa.array(list(acc.values()), pa.int64())})

    def fold(group: pa.Table) -> pa.Table:
        return pa.table({
            "word": group["word"][:1],
            "n": pa.array([int(pa.compute.sum(group["n"]).as_py())],
                          pa.int64()),
        })

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("word").map_groups(fold, batch_format="pyarrow"))
    parts = [t for t in ray.get(ds.materialize().to_arrow_refs())
             if t.num_rows]
    if not parts:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return pa.concat_tables(parts).sort_by("word")


# ------------------------------------------------------------- driver-local
def _train_local(words: list[str], counts: list[int], n_merges: int,
                 min_count: int) -> list[tuple[str, str, int]]:
    seqs = [tuple(w) + (END,) for w in words]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc = _pair_counts_of(seqs, counts)
        pair = _best_pair(pc, min_count)
        if pair is None:
            break
        left, right = pair
        joined = left + right
        merges.append((left, right, pc[pair]))
        seqs = [_apply_merge(s, left, right, joined)
                if left in s else s for s in seqs]
    return merges


# -------------------------------------------------------------- distributed
def _train_distributed(wf: pa.Table, n_merges: int,
                       min_count: int) -> list[tuple[str, str, int]]:
    """Each round: pair-count partials per batch -> groupby(pair).sum ->
    argmax collect (ONLY pre-aggregated (left,right,n) rows shuffle,
    bounded by distinct pairs per batch), then apply-merge map and
    re-materialize the symbol table. O(n_merges) small jobs AFTER the
    one corpus pass; the symbol table never touches the driver."""
    sym = rd.from_arrow(pa.table({
        "syms": pa.array([list(w) + [END] for w in wf["word"].to_pylist()],
                         pa.list_(pa.string())),
        "n": wf["n"],
    })).materialize()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        def partial(batch: pa.Table) -> pa.Table:
            seqs = [tuple(s) for s in batch["syms"].to_pylist()]
            pc = _pair_counts_of(seqs, batch["n"].to_pylist())
            if not pc:
                return pa.table({"left": pa.array([], pa.string()),
                                 "right": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            l, r = zip(*pc)
            return pa.table({"left": pa.array(l, pa.string()),
                             "right": pa.array(r, pa.string()),
                             "n": pa.array(list(pc.values()), pa.int64())})

        def fold(group: pa.Table) -> pa.Table:
            return pa.table({
                "left": group["left"][:1], "right": group["right"][:1],
                "n": pa.array([int(pa.compute.sum(group["n"]).as_py())],
                              pa.int64()),
            })

        agg = (sym.map_batches(partial, batch_format="pyarrow")
                  .groupby(["left", "right"])
                  .map_groups(fold, batch_format="pyarrow"))
        parts = [t for t in ray.get(agg.materialize().to_arrow_refs())
                 if t.num_rows]
        if not parts:
            break
        pairs = pa.concat_tables(parts).to_pandas()
        pairs = pairs.sort_values(["n", "left", "right"],
                                  ascending=[False, True, True])
        top = pairs.iloc[0]
        if int(top["n"]) < min_count:
            break
        left, right, joined = str(top["left"]), str(top["right"]), \
            str(top["left"]) + str(top["right"])
        merges.append((left, right, int(top["n"])))

        def apply(batch: pa.Table, left=left, right=right,
                  joined=joined) -> pa.Table:
            seqs = [list(_apply_merge(tuple(s), left, right, joined))
                    if left in s else s
                    for s in batch["syms"].to_pylist()]
            return pa.table({"syms": pa.array(seqs, pa.list_(pa.string())),
                             "n": batch["n"]})

        sym = sym.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


# -------------------------------------------------------------- public API
def bpe_train(sf_dir: str, n_merges: int = 48, min_count: int = 2,
              local_max_words: int = 5_000_000,
              plan: str = "auto") -> pa.Table:
    """Learn ``n_merges`` BPE merges over the documents table. Returns
    (rank, left, right, joined, pair_count) — the merge list a tokenizer
    would replay. ``plan``: 'auto' (size switch), 'local', 'distributed'
    (forced, for plan-equality tests)."""
    wf = word_freq_table(sf_dir)
    if plan == "auto":
        plan = "local" if wf.num_rows <= local_max_words else "distributed"
    if plan == "local":
        merges = _train_local(wf["word"].to_pylist(),
                              wf["n"].to_pylist(), n_merges, min_count)
    elif plan == "distributed":
        merges = _train_distributed(wf, n_merges, min_count)
    else:
        raise ValueError(f"unknown plan {plan!r}")
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "joined": pa.array([m[0] + m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64()),
    })


def bpe_segment(words: list[str], merges: pa.Table) -> list[list[str]]:
    """Replay learned merges over new words (the tokenizer's encode
    path): apply each merge in rank order, left-to-right non-overlapping
    — same kernel as training, so train->encode round-trips."""
    ms = [(l, r, l + r) for l, r in zip(merges["left"].to_pylist(),
                                        merges["right"].to_pylist())]
    out = []
    for w in words:
        seq = tuple(w) + (END,)
        for left, right, joined in ms:
            if left in seq:
                seq = _apply_merge(seq, left, right, joined)
        out.append(list(seq))
    return out
