"""Index products of the crawl (SURVEY.md §2.5, reference: ASPseek's
inverted-index / citation / rank machinery rebuilt as Dataset jobs):

* ``build_postings`` — tokenize + stopword-filter pages into postings
  (word, word_bucket, doc_seq, positions), Parquet-partitioned by
  word_bucket (S7/T5: the delta files + buddy pages become bucketed
  parquet; Ray streaming replaces the RAM word-cache).
* ``merge_postings`` — delta→main compaction (O21): per word, concat +
  position-sort the per-doc lists (groupby within bucket partitions).
* ``clone_groups`` — content-checksum clone detection (O10/O23).
* ``pagerank`` — iterative popularity rank over the link graph (O28,
  reference src/ranks.cpp `index -R`): per-iteration broadcast of the rank
  vector + per-batch contribution partials + one small groupby per
  iteration.
* ``crawl_status_stats`` / ``host_stats`` — `index -S` counters (O29).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from aspseek_ray.functions.hashing import content_hash64, fnv1a64, fnv1a64_arrow
from aspseek_ray.functions.html import extract_links
from aspseek_ray.functions.text import STOPWORDS_EN, tokenize
from aspseek_ray.functions.url import canonicalize, host_of

NUM_WORD_BUCKETS = 64


def build_postings(pages_path: str, out_dir: str | None = None,
                   drop_stopwords: bool = True,
                   per_lang_stopwords: bool = False,
                   honor_noindex: bool = False) -> rd.Dataset:
    """pages -> postings (word, word_bucket, doc_seq, positions). doc_seq
    is the DOC ID: fnv1a64(url) — a content-independent, globally
    consistent 64-bit id assignable with no coordination (NOT crawl/warc
    row order); posting lists are sorted by this id, which is all the
    merge/intersection operators need. Streams straight to partitioned
    parquet when out_dir is given.

    ``per_lang_stopwords``: the reference's per-language stopword files
    (O12) — each doc's stoplist follows its ``lang`` column
    (text.stopwords_for; unknown langs fall back to English).

    ``honor_noindex``: drop pages whose html carries a meta-robots
    noindex directive before tokenizing (O6 policy: the page is crawled
    and stored, but its words never enter the index)."""
    cols = ["url", "text"] + (["lang"] if per_lang_stopwords else [])
    if honor_noindex:
        from aspseek_ray.functions.html import extract_meta_robots

        ds = rd.read_parquet(pages_path, columns=cols + ["html"])

        def drop_noindex(b: pa.Table) -> pa.Table:
            keep = [i for i, h in enumerate(b["html"].to_pylist())
                    if "noindex" not in extract_meta_robots(h)]
            return b.take(pa.array(keep, pa.int64())).drop_columns(["html"])

        ds = ds.map_batches(drop_noindex, batch_format="pyarrow")
    else:
        ds = rd.read_parquet(pages_path, columns=cols)
    return _postings_from_pages(ds, out_dir, drop_stopwords,
                                per_lang_stopwords)


def build_postings_latest(round_dirs: "list[str]", out_dir: str | None = None,
                          drop_stopwords: bool = True,
                          per_lang_stopwords: bool = False) -> rd.Dataset:
    """Full rebuild over a MULTI-ROUND store (round dirs in crawl order):
    a url refetched in a later round contributes only its latest text —
    one groupby(url_hash) picks the max-round row per url, then the
    normal build_postings explode runs over the deduped pages. This is
    the rebuild-per-round cost model that update_postings_index /
    delta staging exist to beat; also the compaction story for long
    append-only runs."""
    cols = ["url_hash", "url", "text"] + (["lang"] if per_lang_stopwords
                                          else [])
    parts = []
    for i, d in enumerate(round_dirs):
        ds_i = rd.read_parquet(d, columns=cols)

        def tag(b: pa.Table, rnd=i) -> pa.Table:
            return b.append_column(
                "rnd", pa.array(np.full(b.num_rows, rnd, np.int32)))

        parts.append(ds_i.map_batches(tag, batch_format="pyarrow"))
    pages = parts[0]
    for p in parts[1:]:
        pages = pages.union(p)

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values("rnd").tail(1)
                 .drop(columns=["rnd"]).reset_index(drop=True))

    deduped = pages.groupby("url_hash").map_groups(latest,
                                                   batch_format="pandas")

    def drop_hash(b: pa.Table) -> pa.Table:
        return b.drop_columns(["url_hash"])

    tmp_ds = deduped.map_batches(drop_hash, batch_format="pyarrow")
    # reuse build_postings' explode by round-tripping through its reader
    # contract: it reads (url, text[, lang]) — feed it the deduped Dataset
    return _postings_from_pages(tmp_ds, out_dir, drop_stopwords,
                                per_lang_stopwords)


def _postings_from_pages(ds: rd.Dataset, out_dir: str | None,
                         drop_stopwords: bool,
                         per_lang_stopwords: bool) -> rd.Dataset:
    """build_postings' explode over an in-flight pages Dataset."""

    def explode(batch: pa.Table) -> pa.Table:
        from aspseek_ray.functions.text import stopwords_for

        words, docs, positions = [], [], []
        doc_hashes = fnv1a64_arrow(batch["url"])
        langs = (batch["lang"].to_pylist() if per_lang_stopwords
                 else [None] * batch.num_rows)
        for i, text in enumerate(batch["text"].to_pylist()):
            stops = (stopwords_for(langs[i]) if per_lang_stopwords
                     else STOPWORDS_EN)
            pos_of: dict[str, list[int]] = {}
            for p, w in enumerate(tokenize(text)):
                if drop_stopwords and w in stops:
                    continue
                pos_of.setdefault(w, []).append(p)
            for w, ps in pos_of.items():
                words.append(w)
                docs.append(int(doc_hashes[i]))
                positions.append(ps)
        warr = pa.array(words, pa.string())
        bucket = np.abs(fnv1a64_arrow(warr)) % NUM_WORD_BUCKETS
        return pa.table({
            "word": warr,
            "word_bucket": pa.array(bucket.astype(np.int32)),
            "doc_seq": pa.array(docs, pa.int64()),
            "positions": pa.array(positions, pa.list_(pa.int32())),
        })

    postings = ds.map_batches(explode, batch_format="pyarrow")
    if out_dir:
        postings.write_parquet(out_dir, partition_cols=["word_bucket"])
        return rd.read_parquet(out_dir)
    return postings


def merge_postings(postings: rd.Dataset) -> rd.Dataset:
    """Delta→main merge (O21): one row per word with doc-sorted postings.
    Grouped by word_bucket — one map_groups call per BUCKET (64 calls,
    not one per vocabulary word); the per-word merge inside is a single
    sort + numpy boundary split, no per-word pandas calls."""

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["word", "doc_seq"], kind="mergesort")
        w = g["word"].to_numpy()
        if len(w) == 0:
            return pd.DataFrame({"word": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64),
                                 "doc_seqs": pd.Series([], dtype=object),
                                 "positions": pd.Series([], dtype=object)})
        bounds = np.nonzero(w[1:] != w[:-1])[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(w)]])
        seqs = np.split(g["doc_seq"].to_numpy(), bounds)
        poss = np.split(g["positions"].to_numpy(), bounds)
        return pd.DataFrame({
            "word": w[starts],
            "df": (ends - starts).astype(np.int64),
            "doc_seqs": [s.tolist() for s in seqs],
            "positions": [p.tolist() for p in poss],
        })

    return postings.groupby("word_bucket").map_groups(
        merge_bucket, batch_format="pandas")


def _read_bucketed_postings(index_dir: str) -> rd.Dataset:
    """Read a word_bucket-partitioned postings index back with the
    partition column normalized to int32 (hive read-back yields string)."""
    ds = rd.read_parquet(index_dir)

    def norm(b: pa.Table) -> pa.Table:
        wb = b["word_bucket"]
        if not pa.types.is_integer(wb.type):
            b = b.set_column(b.schema.get_field_index("word_bucket"),
                             "word_bucket", wb.cast(pa.string()).cast(pa.int32()))
        return b.select(["word", "word_bucket", "doc_seq", "positions"])

    return ds.map_batches(norm, batch_format="pyarrow")


def update_postings_index(index_dir: str, store_path: str,
                          purge_doc_seqs: "list[int] | tuple[int, ...]" = (),
                          broadcast_max_docs: int = 2_000_000,
                          per_lang_stopwords: bool = False) -> list[int]:
    """Incremental delta→main index refresh (S7/O21 — the reference's
    signature real-time update, src/deltas.cpp + CachePut/Merge role):
    build delta postings from ONE crawl round's stored pages and merge
    them into an EXISTING ``build_postings(out_dir=...)`` index without
    rebuilding it.

    Semantics: every doc in ``store_path`` (plus ``purge_doc_seqs``) has
    its OLD postings removed from every bucket, then the delta rows are
    added — so changed docs are replaced (including words their new text
    no longer contains), new docs are inserted, and purged docs vanish.
    ``store_path`` must hold at most one fetch per url (one crawl round
    does; for multi-round inputs dedupe latest-wins upstream).

    Physical plan: the remove-set (round doc ids) is collected from the
    delta — bounded by the politeness round budget — and broadcast via
    ray.put for a vectorized np.isin filter; above ``broadcast_max_docs``
    a keyed ``join(left_anti)`` on doc_seq replaces the broadcast (one
    shuffle of the index, no driver set). A column-pruned pre-pass reads
    only (word_bucket, doc_seq) to find buckets that actually LOSE rows;
    only those are rewritten (read + filter + swap via dir renames),
    while buckets that purely GAIN rows take their delta as appended
    partition files — one atomic rename per file, O(delta) instead of
    O(index) for the insert-dominated crawl case. Crash between renames
    leaves at most one rewritten bucket stashed (restored by the
    prologue) or a partial append (whose doc_seqs then land in the
    remove-set on re-run, turning those buckets into rewrites) — the
    update is idempotent either way.

    File growth: appends add files per round; dirty-bucket rewrites
    consolidate their bucket as a side effect, and a periodic
    ``build_postings`` rebuild (or raising NUM_WORD_BUCKETS) is the
    compaction story for long pure-insert runs.

    Returns the sorted list of bucket ids whose contents changed
    (rewritten + appended)."""
    _recover_index(index_dir)

    # per_lang_stopwords must match the existing index's build setting —
    # the delta is built under the same stopword policy
    delta = build_postings(
        store_path, per_lang_stopwords=per_lang_stopwords).materialize()

    # remove-set: docs being refreshed this round (+ explicit purges)
    doc_rows = delta.select_columns(["doc_seq"]).unique("doc_seq")
    remove = np.unique(np.concatenate(
        [np.asarray(doc_rows, dtype=np.int64),
         np.asarray(list(purge_doc_seqs), dtype=np.int64)]))
    return _apply_delta(index_dir, delta, remove, broadcast_max_docs)


def _recover_index(index_dir: str) -> None:
    """Crash recovery prologue: a previous update that died mid-swap
    leaves .old_bucket=K stashes (and possibly a missing word_bucket=K
    dir — the swap is stash -> rename-new -> rm-stash). Restore any
    stash whose bucket dir is gone, drop the rest, and clear stale tmp
    dirs BEFORE reading the index."""
    import shutil
    from pathlib import Path

    for stash in Path(index_dir).glob(".old_bucket=*"):
        part = Path(index_dir) / stash.name.lstrip(".").replace("old_", "word_")
        if not part.exists():
            stash.rename(part)
        else:
            shutil.rmtree(stash)
    shutil.rmtree(Path(index_dir) / ".update_tmp", ignore_errors=True)


def _apply_delta(index_dir: str, delta: rd.Dataset, remove: np.ndarray,
                 broadcast_max_docs: int = 2_000_000) -> list[int]:
    """Core delta->main merge of update_postings_index: remove ``remove``
    docs' old postings from every bucket, fold ``delta`` rows in (dirty
    buckets rewritten via atomic swaps, pure-insert buckets appended).
    ``delta`` must be a MATERIALIZED (word, word_bucket, doc_seq,
    positions) Dataset; caller runs _recover_index first."""
    import shutil
    from pathlib import Path

    use_broadcast = remove.size <= broadcast_max_docs
    remove_ref = ray.put(remove) if use_broadcast else None

    old = _read_bucketed_postings(index_dir)

    # pre-pass (column-pruned): buckets whose old rows lose a doc
    def removed_per_bucket(b: pa.Table) -> pa.Table:
        hit = np.isin(b["doc_seq"].to_numpy(), ray.get(remove_ref))
        wb = b["word_bucket"].to_numpy()[hit]
        vals, cnts = np.unique(wb, return_counts=True)
        return pa.table({"word_bucket": pa.array(vals.astype(np.int32)),
                         "n": pa.array(cnts.astype(np.int64))})

    if use_broadcast:
        hits = (old.select_columns(["word_bucket", "doc_seq"])
                   .map_batches(removed_per_bucket, batch_format="pyarrow")
                   .groupby("word_bucket").aggregate(Sum("n", alias_name="n")))
        dirty = {int(r["word_bucket"]) for r in hits.iter_rows()}
    else:
        rem_ds = rd.from_arrow(pa.table({"doc_seq": pa.array(remove)}))
        # materialize: count() and unique() below would otherwise each
        # re-execute the full column-pruned scan + semi-join from scratch
        hits = (old.select_columns(["word_bucket", "doc_seq"])
                   .join(rem_ds, join_type="left_semi",
                         num_partitions=max(8, NUM_WORD_BUCKETS // 8),
                         on=("doc_seq",))
                   .materialize())
        dirty = ({int(x) for x in hits.unique("word_bucket")}
                 if hits.count() else set())
    delta_buckets = {int(b) for b in delta.unique("word_bucket")}
    touched = sorted(dirty | delta_buckets)
    if not touched:
        return []

    # Split the delta: a bucket that loses NO old rows (``dirty`` miss)
    # takes its delta as APPENDED partition files — the partition dir is
    # the unit of read, so extra files are semantically identical to a
    # rewrite, and the per-round cost drops from O(touched index bytes)
    # to O(delta) for the (dominant at crawl time) pure-insert buckets.
    # Crash safety: appends run AFTER the rewrite swaps, one atomic file
    # rename each; a re-run after a partial append sees the appended
    # doc_seqs in the remove-set, marks those buckets dirty, and rewrites
    # them — idempotent either way.
    rewrite = sorted(dirty)
    append_only = sorted(delta_buckets - dirty)
    if append_only:
        ap_arr = np.asarray(append_only, dtype=np.int32)

        def keep_append(b: pa.Table) -> pa.Table:
            sel = np.isin(b["word_bucket"].to_numpy(), ap_arr)
            return b.filter(pa.array(sel))

        def keep_rewrite(b: pa.Table) -> pa.Table:
            sel = ~np.isin(b["word_bucket"].to_numpy(), ap_arr)
            return b.filter(pa.array(sel))

        delta_append = delta.map_batches(keep_append, batch_format="pyarrow")
        delta = delta.map_batches(keep_rewrite, batch_format="pyarrow")
    else:
        delta_append = None

    # rewrite pass reads ONLY the dirty partition dirs (the pre-pass
    # above is the one full — column-pruned — scan); re-stamp the
    # word_bucket column lost by reading partition dirs directly
    touched_files: list[str] = []
    for k in rewrite:
        d = Path(index_dir) / f"word_bucket={k}"
        if d.exists():
            touched_files.extend(sorted(str(f) for f in d.glob("*.parquet")))
    if touched_files:
        def restamp(b: pa.Table) -> pa.Table:
            wb = np.abs(fnv1a64_arrow(b["word"])) % NUM_WORD_BUCKETS
            t = pa.table({"word": b["word"],
                          "word_bucket": pa.array(wb.astype(np.int32)),
                          "doc_seq": b["doc_seq"],
                          "positions": b["positions"]})
            return t

        old_touched = (rd.read_parquet(
                           touched_files,
                           columns=["word", "doc_seq", "positions"])
                         .map_batches(restamp, batch_format="pyarrow"))
    else:
        old_touched = rd.from_arrow(pa.table({
            "word": pa.array([], pa.string()),
            "word_bucket": pa.array([], pa.int32()),
            "doc_seq": pa.array([], pa.int64()),
            "positions": pa.array([], pa.list_(pa.int32()))}))
    if use_broadcast:
        def keep_fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            keep = ~np.isin(b["doc_seq"].to_numpy(), ray.get(remove_ref))
            return b.filter(pa.array(keep))

        kept_old = old_touched.map_batches(keep_fn, batch_format="pyarrow")
    else:
        # Arrow hash joins reject list<> payload columns: carry positions
        # as little-endian int32 bytes across the anti-join.
        def enc(b: pa.Table) -> pa.Table:
            col = b["positions"].combine_chunks()
            off = col.offsets.to_numpy()
            raw = col.values.to_numpy().astype("<i4").tobytes()
            bins = [raw[4 * s:4 * e] for s, e in zip(off[:-1], off[1:])]
            i = b.schema.get_field_index("positions")
            return b.set_column(i, "positions", pa.array(bins, pa.binary()))

        def dec(b: pa.Table) -> pa.Table:
            lists = [np.frombuffer(x, dtype="<i4").tolist()
                     for x in b["positions"].to_pylist()]
            i = b.schema.get_field_index("positions")
            return b.set_column(
                i, "positions", pa.array(lists, pa.list_(pa.int32())))

        kept_old = (old_touched
                    .map_batches(enc, batch_format="pyarrow")
                    .join(rem_ds, join_type="left_anti",
                          num_partitions=max(8, NUM_WORD_BUCKETS // 8),
                          on=("doc_seq",))
                    .map_batches(dec, batch_format="pyarrow"))
    updated = kept_old.union(delta)

    tmp = Path(index_dir) / ".update_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    if rewrite:
        updated.write_parquet(str(tmp), partition_cols=["word_bucket"])
        for k in rewrite:
            new_part = tmp / f"word_bucket={k}"
            old_part = Path(index_dir) / f"word_bucket={k}"
            if not new_part.exists():
                new_part.mkdir()      # bucket emptied entirely this round
            stash = Path(index_dir) / f".old_bucket={k}"
            shutil.rmtree(stash, ignore_errors=True)
            if old_part.exists():
                old_part.rename(stash)
            new_part.rename(old_part)
            shutil.rmtree(stash, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)

    # append pass: pure-insert buckets take the delta as extra partition
    # files (unique names, one atomic rename per file; dirs created for
    # brand-new buckets)
    if delta_append is not None:
        import uuid

        ap_tmp = Path(index_dir) / ".update_tmp"
        shutil.rmtree(ap_tmp, ignore_errors=True)
        delta_append.write_parquet(str(ap_tmp),
                                   partition_cols=["word_bucket"])
        tag = uuid.uuid4().hex[:8]
        for part in sorted(ap_tmp.glob("word_bucket=*")):
            dest = Path(index_dir) / part.name
            dest.mkdir(exist_ok=True)
            for f in sorted(part.glob("*.parquet")):
                f.rename(dest / f"delta-{tag}-{f.name}")
        shutil.rmtree(ap_tmp, ignore_errors=True)
    return touched


# ------------------------------------------------------- delta staging (S7)
# The reference's real delta-file model (SURVEY S7, src/deltas.cpp role):
# small crawl rounds accumulate as STAGED delta segments next to the main
# index and are folded into it only when the staged volume justifies the
# bucket rewrites; queries read main + staged segments with latest-wins
# masking. At real index:round ratios this turns the per-round update cost
# from O(dirty index buckets) into O(delta) — the fold amortizes.


def _staged_round_dirs(index_dir: str) -> "list[Path]":
    from pathlib import Path

    d = Path(index_dir) / ".deltas"
    return sorted(d.glob("round-*")) if d.exists() else []


def _parquet_rows(files) -> int:
    """Total row count from parquet footers only (no data read)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(str(f)).metadata.num_rows for f in files)


def stage_delta(index_dir: str, store_path: str,
                purge_doc_seqs: "list[int] | tuple[int, ...]" = (),
                per_lang_stopwords: bool = False) -> int:
    """Stage one round's delta postings WITHOUT touching the main index:
    build the round's (word, word_bucket, doc_seq, positions) postings
    into ``index_dir/.deltas/round-NNNNNN/postings`` (same bucketed
    layout as main) plus its remove-set ``_docs.parquet`` (refreshed +
    purged doc_seqs). The round dir appears atomically (tmp + rename);
    a crash mid-stage leaves only an ignored tmp dir. O(round), no main
    index reads. Returns the staged round number."""
    import shutil
    from pathlib import Path

    import pyarrow.parquet as pq

    ddir = Path(index_dir) / ".deltas"
    ddir.mkdir(exist_ok=True)
    for stale in ddir.glob(".tmp-round-*"):
        shutil.rmtree(stale, ignore_errors=True)
    existing = _staged_round_dirs(index_dir)
    n = int(existing[-1].name.split("-")[1]) + 1 if existing else 0
    tmp = ddir / f".tmp-round-{n:06d}"
    build_postings(store_path, per_lang_stopwords=per_lang_stopwords
                   ).write_parquet(str(tmp / "postings"),
                                   partition_cols=["word_bucket"])
    docs = rd.read_parquet(str(tmp / "postings"),
                           columns=["doc_seq"]).unique("doc_seq")
    arr = np.unique(np.concatenate(
        [np.asarray(docs, dtype=np.int64),
         np.asarray(list(purge_doc_seqs), dtype=np.int64)]))
    pq.write_table(pa.table({"doc_seq": pa.array(arr, pa.int64())}),
                   tmp / "_docs.parquet")
    tmp.rename(ddir / f"round-{n:06d}")
    return n


def _mask_docs(ds: rd.Dataset, docs: np.ndarray) -> rd.Dataset:
    """Drop posting rows whose doc_seq is in ``docs`` (broadcast once
    via ray.put, vectorized np.isin per batch)."""
    if docs.size == 0:
        return ds
    ref = ray.put(docs)

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        sel = ~np.isin(b["doc_seq"].to_numpy(), ray.get(ref))
        return b.filter(pa.array(sel))

    return ds.map_batches(keep, batch_format="pyarrow")


def read_postings_with_deltas(index_dir: str) -> rd.Dataset:
    """Query-side view of main + staged delta segments with latest-wins
    semantics: main rows of any staged doc are masked, and each staged
    round is masked by the rounds after it — bitwise the same postings a
    fold (or full rebuild) would produce. Remove-sets are bounded by
    (politeness round budget x staged rounds, capped by the fold
    threshold), so the masks broadcast via ray.put; the index itself
    streams."""
    import pyarrow.parquet as pq

    rounds = _staged_round_dirs(index_dir)
    if not rounds:
        return _read_bucketed_postings(index_dir)
    docs_per_round = [
        pq.read_table(str(r / "_docs.parquet"))["doc_seq"].to_numpy()
        for r in rounds]
    out = _mask_docs(_read_bucketed_postings(index_dir),
                     np.unique(np.concatenate(docs_per_round)))
    for i, r in enumerate(rounds):
        ds_i = _read_bucketed_postings(str(r / "postings"))
        later = docs_per_round[i + 1:]
        if later:
            ds_i = _mask_docs(ds_i, np.unique(np.concatenate(later)))
        out = out.union(ds_i)
    return out


def fold_deltas(index_dir: str,
                broadcast_max_docs: int = 2_000_000) -> list[int]:
    """Fold ALL staged delta segments into the main index in one
    _apply_delta pass (one dirty-bucket scan + rewrite for the whole
    batch of rounds, instead of one per round): the combined delta keeps,
    per doc, only its LATEST staged round's rows; the remove-set is every
    staged doc (incl. purges). Staging dirs are cleared afterwards —
    a crash in between re-applies the same final state on re-run
    (remove-then-add is idempotent). Returns touched bucket ids."""
    import shutil

    import pyarrow.parquet as pq

    rounds = _staged_round_dirs(index_dir)
    if not rounds:
        return []
    _recover_index(index_dir)
    docs_per_round = [
        pq.read_table(str(r / "_docs.parquet"))["doc_seq"].to_numpy()
        for r in rounds]
    remove = np.unique(np.concatenate(docs_per_round))

    parts: "list[rd.Dataset]" = []
    for i, r in enumerate(rounds):
        ds_i = _read_bucketed_postings(str(r / "postings"))
        later = docs_per_round[i + 1:]
        if later:
            ds_i = _mask_docs(ds_i, np.unique(np.concatenate(later)))
        parts.append(ds_i)
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.union(p)
    touched = _apply_delta(index_dir, delta.materialize(), remove,
                           broadcast_max_docs)
    for r in rounds:
        shutil.rmtree(r, ignore_errors=True)
    return touched


def update_postings_index_staged(
        index_dir: str, store_path: str,
        purge_doc_seqs: "list[int] | tuple[int, ...]" = (),
        fold_threshold: float = 0.1,
        broadcast_max_docs: int = 2_000_000,
        per_lang_stopwords: bool = False) -> dict:
    """The staged flavor of update_postings_index: stage this round's
    delta (O(round), no index reads), then fold the accumulated segments
    into main only when staged rows >= ``fold_threshold`` x main rows
    (both counted from parquet footers — no scan). fold_threshold=0
    folds every round (equivalent to update_postings_index);
    fold_threshold=inf never folds (queries go through
    read_postings_with_deltas). Returns {staged_round, folded, touched,
    staged_rows, main_rows}."""
    from pathlib import Path

    rnd = stage_delta(index_dir, store_path, purge_doc_seqs,
                      per_lang_stopwords)
    staged_files = [f for r in _staged_round_dirs(index_dir)
                    for f in sorted((r / "postings").rglob("*.parquet"))]
    main_files = sorted(Path(index_dir).glob("word_bucket=*/*.parquet"))
    staged_rows = _parquet_rows(staged_files)
    main_rows = _parquet_rows(main_files)
    touched: list[int] = []
    if staged_rows >= fold_threshold * max(main_rows, 1):
        touched = fold_deltas(index_dir, broadcast_max_docs)
    return {"staged_round": rnd, "folded": bool(touched),
            "touched": touched, "staged_rows": staged_rows,
            "main_rows": main_rows}


def clone_groups(pages_path: str) -> pa.Table:
    """Content-clone detection (O10/O23): group by body checksum; output
    one row per clone group with >= 2 members:
    (content_hash, canonical_url, n_clones)."""
    ds = rd.read_parquet(pages_path, columns=["url", "html"])

    def hash_stage(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch["url"],
                         "content_hash": pa.array(content_hash64(batch["html"]))})

    def group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("url")
        return pd.DataFrame({"content_hash": [g["content_hash"].iloc[0]],
                             "canonical_url": [g["url"].iloc[0]],
                             "n_clones": np.array([len(g)], np.int64)})

    out = (ds.map_batches(hash_stage, batch_format="pyarrow")
             .groupby("content_hash").map_groups(group, batch_format="pandas"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.filter(pc.greater_equal(t["n_clones"], 2))


def extract_link_edges(pages_path: str) -> rd.Dataset:
    """(src, dst) canonical-url link edges from the corpus html (O26
    citation collection)."""
    ds = rd.read_parquet(pages_path, columns=["url", "html"])

    def edges(batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for url, html in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            base, hrefs = extract_links(html)
            eff = base or url
            seen = set()
            for h in hrefs:
                c = canonicalize(h, eff)
                if c is None or c == url or c in seen:
                    continue
                seen.add(c)
                srcs.append(url)
                dsts.append(c)
        return pa.table({"src": pa.array(srcs, pa.string()),
                         "dst": pa.array(dsts, pa.string())})

    return ds.map_batches(edges, batch_format="pyarrow")


def pagerank(pages_path: str, iterations: int = 10, damping: float = 0.85,
             ndigits: int = 6, broadcast_max_nodes: int = 5_000_000) -> pa.Table:
    """Iterative PageRank over the corpus link graph (O28; reference
    src/ranks.cpp). Two physical plans behind one semantic (identical
    ranks, validated by test_pagerank_paths_agree):

    * <= broadcast_max_nodes: the rank vector is broadcast per iteration
      (ray.put) and contributions are per-batch numpy bincount partials —
      the edge set never reshuffles. Right for graphs whose rank vector
      fits comfortably in every worker (a float per node).
    * beyond: fully keyed path — no driver node list, no O(n) broadcast:
      per iteration edges ⋈ ranks (hash join on src) -> per-batch partial
      (dst, mass) -> groupby(dst) sum -> join back to the node table.
      Everything is a Dataset keyed on url; only the scalar dangling mass
      reaches the driver.

    Dangling mass is redistributed uniformly. Output (url, rank) rounded
    to ``ndigits``."""
    n = rd.read_parquet(pages_path, columns=["url"]).count()
    if n <= broadcast_max_nodes:
        return _pagerank_broadcast(pages_path, n, iterations, damping, ndigits)
    return _pagerank_joined(pages_path, n, iterations, damping, ndigits)


def _pagerank_broadcast(pages_path: str, n: int, iterations: int,
                        damping: float, ndigits: int) -> pa.Table:
    edges = extract_link_edges(pages_path).materialize()

    # node universe: all urls in pages (rank is defined over crawled docs)
    # — sorted list + url->id map built ON A WORKER (the _normalized_matrix
    # pattern): both live in the object store; the driver holds only refs
    # plus the O(n) float vectors the broadcast plan iterates on.
    @ray.remote(num_returns=2)
    def _node_index(path: str):
        ns = sorted(pq.read_table(path, columns=["url"])["url"].to_pylist())
        return pa.array(ns, pa.string()), {u: i for i, u in enumerate(ns)}

    nodes_ref, idx_ref = _node_index.remote(pages_path)

    def to_ids(batch: pa.Table) -> pa.Table:
        idx = ray.get(idx_ref)
        src = [idx.get(u, -1) for u in batch["src"].to_pylist()]
        dst = [idx.get(u, -1) for u in batch["dst"].to_pylist()]
        t = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        return t.filter(pc.and_(pc.greater_equal(t["src"], 0),
                                pc.greater_equal(t["dst"], 0)))

    id_edges = edges.map_batches(to_ids, batch_format="pyarrow").materialize()

    # out-degree per node: distributed count, O(n) result
    deg = np.zeros(n, dtype=np.int64)
    degp = (id_edges.groupby("src").aggregate(Count(alias_name="c"))).to_pandas()
    if len(degp):
        deg[degp["src"].to_numpy()] = degp["c"].to_numpy()

    ranks = np.full(n, 1.0 / n)
    deg_safe = np.maximum(deg, 1)
    for _ in range(iterations):
        state_ref = ray.put(ranks / deg_safe)

        def contrib(batch: pa.Table) -> pa.Table:
            w = ray.get(state_ref)
            dst = batch["dst"].to_numpy()
            src = batch["src"].to_numpy()
            acc = np.bincount(dst, weights=w[src], minlength=0)
            nz = np.nonzero(acc)[0]
            return pa.table({"node": pa.array(nz.astype(np.int64)),
                             "mass": pa.array(acc[nz])})

        parts = id_edges.map_batches(contrib, batch_format="pyarrow")
        agg = parts.groupby("node").aggregate(Sum("mass", alias_name="mass")).to_pandas()
        incoming = np.zeros(n)
        incoming[agg["node"].to_numpy()] = agg["mass"].to_numpy()
        dangling = ranks[deg == 0].sum()
        ranks = (1 - damping) / n + damping * (incoming + dangling / n)

    return pa.table({"url": ray.get(nodes_ref),
                     "rank": pa.array(np.round(ranks, ndigits))})


def _pagerank_joined(pages_path: str, n: int, iterations: int,
                     damping: float, ndigits: int,
                     num_partitions: int | None = None) -> pa.Table:
    """Keyed-join PageRank — no driver node list, no O(n) broadcast."""
    out = _pagerank_joined_ds(pages_path, n, iterations, damping, ndigits,
                              num_partitions)
    t = pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))
    return t.sort_by("url")


def _pagerank_joined_ds(pages_path: str, n: int, iterations: int,
                        damping: float, ndigits: int,
                        num_partitions: int | None = None) -> rd.Dataset:
    """Keyed-join PageRank body returning the (url, rank) Dataset — the
    collected variant above is a thin wrapper; distributed consumers
    (pagerank_ds) take the Dataset straight into their joins."""
    from aspseek_ray.runtime import join_partitions

    if num_partitions is None:
        num_partitions = join_partitions(16)
    nodes = rd.read_parquet(pages_path, columns=["url"])

    # edges restricted to crawled nodes on both endpoints (semi joins)
    raw = extract_link_edges(pages_path)
    src_nodes = nodes.map_batches(
        lambda b: pa.table({"src": b["url"]}), batch_format="pyarrow")
    dst_nodes = nodes.map_batches(
        lambda b: pa.table({"dst": b["url"]}), batch_format="pyarrow")
    edges = (raw.join(src_nodes, join_type="left_semi",
                      num_partitions=num_partitions, on=("src",))
                .join(dst_nodes, join_type="left_semi",
                      num_partitions=num_partitions, on=("dst",))
                .materialize())

    deg = edges.groupby("src").aggregate(Count(alias_name="out_deg"))
    base = (nodes.map_batches(lambda b: pa.table({"src": b["url"]}),
                              batch_format="pyarrow")
                 .join(deg, join_type="left_outer",
                       num_partitions=num_partitions, on=("src",))
                 .map_batches(lambda b: pa.table({
                     "url": b["src"],
                     "out_deg": pc.fill_null(b["out_deg"].cast(pa.int64()), 0)}),
                     batch_format="pyarrow")
                 .materialize())  # (url, out_deg) — the per-iteration spine

    rank0 = 1.0 / n
    ranks = base.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, rank0))),
        batch_format="pyarrow").materialize()

    for _ in range(iterations):
        dangling = (ranks.map_batches(
            lambda b: pa.table({"d": pa.array([float(
                pc.sum(pc.if_else(pc.equal(b["out_deg"], 0), b["rank"],
                                  pa.scalar(0.0))).as_py() or 0.0)])}),
            batch_format="pyarrow").sum("d"))

        weights = ranks.map_batches(
            lambda b: pa.table({
                "src": b["url"],
                "w": pc.divide(b["rank"],
                               pc.max_element_wise(
                                   b["out_deg"].cast(pa.float64()), 1.0))}),
            batch_format="pyarrow")
        mass = (edges.join(weights, join_type="inner",
                           num_partitions=num_partitions, on=("src",))
                     .map_batches(lambda b: pa.table({"url": b["dst"],
                                                      "mass": b["w"]}),
                                  batch_format="pyarrow")
                     .groupby("url").aggregate(Sum("mass", alias_name="mass")))
        add = (1 - damping) / n + damping * dangling / n

        def apply_rank(b: pa.Table, add=add) -> pa.Table:
            m = pc.fill_null(b["mass"].cast(pa.float64()), 0.0)
            rank = pc.add(pc.multiply(m, pa.scalar(damping)), pa.scalar(add))
            return pa.table({"url": b["url_r"] if "url_r" in b.schema.names
                             else b["url"],
                             "out_deg": b["out_deg"], "rank": rank})

        ranks = (base.map_batches(lambda b: pa.table({"url": b["url"],
                                                      "out_deg": b["out_deg"]}),
                                  batch_format="pyarrow")
                     .join(mass, join_type="left_outer",
                           num_partitions=num_partitions, on=("url",))
                     .map_batches(apply_rank, batch_format="pyarrow")
                     .materialize())

    return ranks.map_batches(
        lambda b: pa.table({"url": b["url"],
                            "rank": pc.round(b["rank"], ndigits=ndigits)}),
        batch_format="pyarrow")


def pagerank_ds(pages_path: str, iterations: int = 10, damping: float = 0.85,
                ndigits: int = 6,
                broadcast_max_nodes: int = 5_000_000) -> rd.Dataset:
    """Dataset-returning pagerank for downstream DISTRIBUTED consumers
    (e.g. the ranked-search rank join): same two plans and identical
    values as ``pagerank``, but the keyed plan hands back its (url, rank)
    Dataset without collecting O(nodes) rows anywhere."""
    n = rd.read_parquet(pages_path, columns=["url"]).count()
    if n <= broadcast_max_nodes:
        return rd.from_arrow(
            _pagerank_broadcast(pages_path, n, iterations, damping, ndigits))
    return _pagerank_joined_ds(pages_path, n, iterations, damping, ndigits)


def crawl_status_stats(trace: pa.Table) -> pa.Table:
    """`index -S` status counters (O29) over a crawl trace table."""
    ds = rd.from_arrow(trace.select(["status"]))
    out = ds.groupby("status").aggregate(Count(alias_name="n")).to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)


def host_stats(trace: pa.Table) -> pa.Table:
    """Per-host fetch counters (O29): (host, n_fetched, n_ok)."""
    ds = rd.from_arrow(trace.select(["host", "status"]))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("host", as_index=False).agg(
            n_fetched=("status", "size"),
            n_ok=("status", lambda s: int((s == 200).sum())))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("host")
             .aggregate(Sum("n_fetched", alias_name="n_fetched"),
                        Sum("n_ok", alias_name="n_ok"))).to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)


def _anchor_rows_ds(pages_path: str) -> rd.Dataset:
    """Lazy (word, url) anchor-occurrence rows — the shared extraction
    stage of anchor_postings (collected Table) and ensure_anchor_index
    (partitioned on-disk index)."""
    from aspseek_ray.functions.html import extract_anchors
    from aspseek_ray.functions.text import tokenize
    from aspseek_ray.functions.url import canonicalize

    ds = rd.read_parquet(pages_path, columns=["url", "html"])

    def rows(batch: pa.Table) -> pa.Table:
        words, urls = [], []
        for url, html in zip(batch["url"].to_pylist(),
                             batch["html"].to_pylist()):
            base, pairs = extract_anchors(html)
            eff = base or url
            seen: set[str] = set()
            for href, atext in pairs:
                c = canonicalize(href, eff)
                if c is None or c == url or c in seen:
                    continue
                seen.add(c)
                for w in set(tokenize(atext)):
                    words.append(w)
                    urls.append(c)
        return pa.table({"word": pa.array(words, pa.string()),
                         "url": pa.array(urls, pa.string())})

    return ds.map_batches(rows, batch_format="pyarrow")


def anchor_postings(pages_path: str) -> pa.Table:
    """Anchor-text ("link word") index — the reference indexes the words of
    each link's visible text against the TARGET url (SURVEY O26 citation
    collection, src/hrefs.cpp): rows (word, url, n_refs) where n_refs
    counts source pages whose deduped link to ``url`` carries ``word`` in
    its anchor. Anchor edges follow extract_link_edges semantics exactly
    (canonicalize against <base>-or-self, skip self-links, first
    DOCUMENT-ORDER occurrence wins per (src, dst)); tokens are the standard
    tokenizer's. One map_batches over html + one (word, url) groupby —
    anchor text is tiny relative to pages, so the shuffle moves words, not
    documents."""
    agg = (_anchor_rows_ds(pages_path)
             .groupby(["word", "url"]).aggregate(Count(alias_name="n_refs")))
    out = agg.to_pandas().sort_values(["word", "url"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def ensure_anchor_index(pages_path: str) -> str:
    """Build (once, disk-cached by source identity) the word_bucket-
    partitioned ANCHOR index for a pages table: the anchor_postings rows
    (word, word_bucket, url, n_refs) written as parquet partitioned by
    word_bucket — so an anchor-boosted query reads only its terms'
    partitions, exactly like the body postings index. Same atomic
    rename-into-place protocol as the search-side index builds."""
    import hashlib
    import json
    import os
    from pathlib import Path

    st = os.stat(pages_path)
    key = hashlib.blake2s(
        f"{Path(pages_path).resolve()}:{st.st_size}:{st.st_mtime_ns}:anchor1"
        .encode(), digest_size=8).hexdigest()
    out = Path("/tmp/aspseek_ray_anchor_idx") / key
    if (out / "_done").exists():
        return str(out)
    # fully distributed: anchor rows -> one (word, url) groupby -> bucket
    # stamp -> partitioned write; the aggregated index never touches the
    # driver (anchor_postings' collected-Table form is the oracle surface,
    # not the build path)
    agg = _anchor_rows_ds(pages_path).groupby(["word", "url"]).aggregate(
        Count(alias_name="n_refs"))

    def stamp(batch: pa.Table) -> pa.Table:
        bucket = (np.abs(fnv1a64_arrow(batch["word"].combine_chunks()))
                  % NUM_WORD_BUCKETS)
        return batch.append_column("word_bucket",
                                   pa.array(bucket.astype(np.int32)))

    build = Path(f"{out}.tmp{os.getpid()}")
    build.mkdir(parents=True, exist_ok=True)
    (agg.map_batches(stamp, batch_format="pyarrow")
        .write_parquet(str(build), partition_cols=["word_bucket"]))
    (build / "_done").write_text(json.dumps({"ok": True}))
    try:
        build.rename(out)
    except OSError:
        import shutil

        shutil.rmtree(build, ignore_errors=True)  # another builder won
    return str(out)
