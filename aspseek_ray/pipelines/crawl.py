"""The flagship crawl pipeline (SURVEY.md §3.1 rebuild): a driver round
loop where each frontier generation is one bounded Ray Data pipeline

    pop (CrawlShard actors, politeness heaps)            — O16/T1/T2/T3
      -> stamp dense fetch_seq (host-lex, pop order)     — trace contract
      -> bucketed fetch join vs pre-bucketed pages       — O19 ("fetch" S3)
      -> parse html, extract + canonicalize outlinks     — O6/O1
      -> offer candidates back to shards                 — O20/O22 dedup
      -> trace + metrics + per-shard checkpoint          — S6/S9, §4.3

Durable state between rounds is ONLY the shard actors (checkpointed to
Parquet per round); the Ray object store is never relied on across runs.

Scale notes (SURVEY §4): the per-round driver work is O(S + B) — shards
are LEX-RANGE partitioned by host (state/shard.py::shard_of_hosts), so the
global (host-lex, pop-order) trace order equals (shard_id, shard-local
order) and the dense fetch_seq is stamped shard-locally from S
prefix-summed counts; shards emit bucket-tagged blocks straight into the
object store and tiny remote concat tasks assemble one block per pages
bucket. No scheduled row ever passes through the driver. The pages table
(the 100-TB side) is shuffled exactly once at ingest (bucket_pages) and
never moves again.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from aspseek_ray.config import CrawlConfig
from aspseek_ray.functions.hashing import fnv1a64_arrow
from aspseek_ray.functions.url import host_of, host_of_arrow
from aspseek_ray.sources.pages import BucketLookup, bucket_pages
from aspseek_ray.stages.discover import parse_discover
from aspseek_ray.state.shard import CrawlShard, host_shard_bounds, shard_of_hosts

TRACE_COLS = ["fetch_seq", "round", "url", "host", "depth", "discovery_seq", "status"]
_BOUNDS_SAMPLE = 200_000  # max seed urls sampled for shard-boundary weighting


# seed tables at or below this row count take the direct driver path
# (one column read; the Dataset jobs' fixed overhead dominates there);
# larger frontiers stream through worker tasks. Same semantics either way.
_SEEDS_DRIVER_MAX = 1_000_000


def _seed_count(seeds_path: str) -> int:
    """Row count from parquet metadata (no data read)."""
    return pq.ParquetFile(seeds_path).metadata.num_rows


def _sample_seed_hosts(seeds_path: str) -> list[str]:
    """Bounded host sample of the seeds table for shard-boundary
    weighting. Small tables are stride-sampled directly; above
    _SEEDS_DRIVER_MAX worker tasks each contribute a batch-local stride
    sample, so the driver receives ~_BOUNDS_SAMPLE hosts no matter how
    many seeds exist. (The resulting bounds are persisted by the caller;
    exactness on resume does not depend on batch layout.)"""
    n = _seed_count(seeds_path)
    stride = max(1, n // _BOUNDS_SAMPLE)
    if n <= _SEEDS_DRIVER_MAX:
        urls = pq.read_table(seeds_path, columns=["url"])["url"].to_pylist()
        return [host_of(u) for u in urls[::stride]]

    def sample(batch: pa.Table) -> pa.Table:
        picked = batch["url"].to_pylist()[::stride]
        return pa.table({"host": pa.array([host_of(u) for u in picked],
                                          pa.string())})

    return [r["host"] for r in
            rd.read_parquet(seeds_path, columns=["url"])
              .map_batches(sample, batch_format="pyarrow").take_all()]


@ray.remote
def _concat_block(*tables: pa.Table) -> pa.Table:
    """Assemble one pages-bucket block from the per-shard pieces (runs on a
    worker; the driver only handles refs)."""
    return pa.concat_tables(tables).combine_chunks()


@dataclass
class CrawlResult:
    out_dir: str
    rounds: int
    total_fetched: int
    metrics: list[dict] = field(default_factory=list)

    def trace_table(self) -> pa.Table:
        return read_trace(self.out_dir)

    def seen_path(self) -> str:
        return str(Path(self.out_dir) / "seen")



def read_trace(out_dir: str) -> pa.Table:
    """Read trace/round=K/part-*.parquet (no hive parsing — the round
    column lives IN the files) sorted by fetch_seq."""
    import pyarrow.dataset as pads

    d = pads.dataset(str(Path(out_dir) / "trace"), format="parquet",
                     partitioning=None)
    return d.to_table().select(TRACE_COLS).sort_by("fetch_seq")


class FetchTraceDiscover:
    """Fused per-bucket round stage (one Dataset execution per round):
    fetch-join the scheduled batch against its pages bucket (O19), write
    this bucket's trace part atomically (S9), extract + store the parsed
    text of fetched pages (O6 + S8 stored copies, zstd parquet), parse +
    canonicalize outlinks (O1/O3/O22-partial). Input: scheduled rows of
    ONE bucket; output: candidate rows."""

    def __init__(self, bucket_dir: str, trace_round_dir: str, rnd: int,
                 max_hops: int, store_round_dir: str | None = None,
                 redirect_dir: str | None = None):
        self.lookup = BucketLookup(bucket_dir, redirect_dir)
        self.trace_dir = Path(trace_round_dir)
        self.store_dir = Path(store_round_dir) if store_round_dir else None
        self.rnd = rnd
        self.max_hops = max_hops

    last_status_counts: dict[int, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        fetched = self.lookup(batch)
        vals, cnts = np.unique(np.asarray(fetched["status"]), return_counts=True)
        self.last_status_counts = {int(v): int(c) for v, c in zip(vals, cnts)}
        bucket = int(batch["bucket"][0].as_py())
        trace = fetched.select(
            ["fetch_seq", "url", "host", "depth", "discovery_seq", "status"])
        trace = trace.append_column(
            "round", pa.array(np.full(trace.num_rows, self.rnd, np.int32)))
        tmp = self.trace_dir / f".part-{bucket}.parquet.tmp"
        pq.write_table(trace.select(TRACE_COLS), tmp)
        tmp.rename(self.trace_dir / f"part-{bucket}.parquet")

        parsed = None
        if self.store_dir is not None:
            # Fused single HTML pass (VERDICT r2 #4): decode + noise-strip
            # each 200 body ONCE, producing the stored text AND the links
            # that parse_discover would otherwise re-extract.
            from aspseek_ray.functions.html import extract_text_links_robots

            ok_idx = np.flatnonzero(np.asarray(fetched["status"]) == 200)
            htmls = fetched["html"].to_pylist()
            texts: list[str] = []
            parsed = {}
            for i in ok_idx:
                text, base, hrefs, robots = extract_text_links_robots(
                    htmls[i])
                texts.append(text)
                # meta-robots nofollow (O6): the page is fetched and
                # stored, but its outlinks never enter discovery
                parsed[int(i)] = (base,
                                  [] if "nofollow" in robots else hrefs)
            ok = fetched.take(pa.array(ok_idx, pa.int64()))
            store = pa.table({
                "url_hash": ok["url_hash"],
                "url": ok["url"],
                "text": pa.array(texts, pa.string()),
            })
            tmp = self.store_dir / f".part-{bucket}.parquet.tmp"
            pq.write_table(store, tmp, compression="zstd")
            tmp.rename(self.store_dir / f"part-{bucket}.parquet")

        cand = parse_discover(fetched, self.max_hops, parsed=parsed)
        # Fold this bucket's status counts into the data stream as ONE
        # all-null sentinel row carrying (n_200, n_404), so the driver
        # never re-reads the round's trace parquet just to count statuses
        # (candidate rows carry zeros; the sums survive any re-batching).
        zeros = pa.array(np.zeros(cand.num_rows, np.int64))
        cand = (cand.append_column("n_200", zeros)
                    .append_column("n_404", zeros))
        sc = self.last_status_counts
        stats = pa.table({
            f.name: (pa.array([sc.get(200, 0)], pa.int64())
                     if f.name == "n_200"
                     else pa.array([sc.get(404, 0)], pa.int64())
                     if f.name == "n_404" else pa.nulls(1, f.type))
            for f in cand.schema})
        return pa.concat_tables([cand, stats])


class Crawler:
    """Owns the shard actor pool and the round loop. Construct fresh
    (``seed=True``) or from the latest checkpoint (``resume=True``)."""

    def __init__(self, corpus_dir: str, out_dir: str, cfg: CrawlConfig | None = None,
                 *, resume: bool = False, scratch_dir: str | None = None):
        self.cfg = cfg or CrawlConfig()
        self.corpus_dir = corpus_dir
        self.out = Path(out_dir)
        self.out.mkdir(parents=True, exist_ok=True)
        (self.out / "trace").mkdir(exist_ok=True)
        (self.out / "checkpoints").mkdir(exist_ok=True)

        scratch = Path(scratch_dir or (self.out / "pages_bucketed"))
        self.bucket_dir = bucket_pages(f"{corpus_dir}/pages.parquet", str(scratch),
                                       num_buckets=self.cfg.num_page_buckets)

        # redirect alias table (O11/O25) — bucketed by the SAME url-hash
        # layout as pages (one-time Dataset shuffle, reused via manifest);
        # no whole-table dict ever touches the driver.
        rpath = Path(corpus_dir) / "redirects.parquet"
        self.redirect_dir = None
        if rpath.exists():
            self.redirect_dir = bucket_pages(
                str(rpath), str(self.out / "redirects_bucketed"),
                num_buckets=self.cfg.num_page_buckets,
                columns=["src_url", "dst_url"], url_col="src_url",
                driver_max_rows=1_000_000)

        robots = pq.read_table(f"{corpus_dir}/robots.parquet")
        # lex-range host partitioning: global host order == shard-major
        # order. Cut points are weighted by URL MASS (a bounded host
        # sample of seeds, drawn by WORKER tasks — the driver receives
        # only <= ~_BOUNDS_SAMPLE hosts) so zipf host sizes balance;
        # robots hosts (weight 1) cover unseeded hosts. The computed
        # bounds are persisted to host_bounds.json at first init and
        # reloaded verbatim on resume, so resume-exactness never depends
        # on the sampling's batch layout.
        bounds_file = self.out / "checkpoints" / "host_bounds.json"
        if resume and bounds_file.exists():
            self.host_bounds = tuple(json.loads(bounds_file.read_text()))
        else:
            weighted = _sample_seed_hosts(f"{corpus_dir}/seeds.parquet")
            weighted += robots["host"].to_pylist()
            self.host_bounds = host_shard_bounds(weighted, self.cfg.num_shards)
            bounds_file.write_text(json.dumps(list(self.host_bounds)))
        shard_ids = shard_of_hosts(self.host_bounds, robots["host"].to_pylist())
        cfg_json = json.dumps({
            "per_host_per_round": self.cfg.per_host_per_round,
            "max_hops": self.cfg.max_hops,
            "max_rounds": self.cfg.max_rounds,
            "round_time_budget_ms": self.cfg.round_time_budget_ms,
            "max_docs": self.cfg.max_docs,
            "num_shards": self.cfg.num_shards,
            "num_page_buckets": self.cfg.num_page_buckets,
            "disallow_patterns": list(self.cfg.disallow_patterns),
            "checkpoint_every": self.cfg.checkpoint_every,
            "follow_mode": self.cfg.follow_mode,
            "host_heap_cap": self.cfg.host_heap_cap,
        })
        # follow-mode (O3) seed slices, partitioned like everything else
        follow_hosts: list[list[str]] = [[] for _ in range(self.cfg.num_shards)]
        follow_prefixes: list[list[str]] = [[] for _ in range(self.cfg.num_shards)]
        if self.cfg.follow_mode != "world":
            # distinct (host, prefix) pairs — direct read for small seed
            # tables; Dataset groupby above the size switch, where the
            # driver receives O(distinct seed sites), never O(seeds)
            spath = f"{corpus_dir}/seeds.parquet"
            if _seed_count(spath) <= _SEEDS_DRIVER_MAX:
                us = pq.read_table(spath, columns=["url"])["url"].to_pylist()
                pairs = sorted({(host_of(u), u[: u.rfind("/") + 1])
                                for u in us})
            else:
                from ray.data.aggregate import Count

                def hp(batch: pa.Table) -> pa.Table:
                    ps = {(host_of(u), u[: u.rfind("/") + 1])
                          for u in batch["url"].to_pylist()}
                    return pa.table({
                        "host": pa.array([h for h, _ in ps], pa.string()),
                        "prefix": pa.array([p for _, p in ps], pa.string())})

                rows = (rd.read_parquet(spath, columns=["url"])
                          .map_batches(hp, batch_format="pyarrow")
                          .groupby(["host", "prefix"])
                          .aggregate(Count(alias_name="_c")).take_all())
                pairs = [(r["host"], r["prefix"]) for r in rows]
            for h, p in pairs:
                s = int(shard_of_hosts(self.host_bounds, [h])[0])
                follow_hosts[s].append(h)
                follow_prefixes[s].append(p)
            follow_hosts = [sorted(set(x)) for x in follow_hosts]
            follow_prefixes = [sorted(set(x)) for x in follow_prefixes]
        ShardActor = ray.remote(CrawlShard)
        spill_dir = str(self.out / "spill")
        self.shards = [
            ShardActor.remote(s, cfg_json,
                              robots.filter(pa.array(shard_ids == s)),
                              follow_hosts=follow_hosts[s],
                              follow_prefixes=follow_prefixes[s],
                              spill_dir=spill_dir)
            for s in range(self.cfg.num_shards)
        ]
        self.round = 0
        self.fetch_base = 0
        self.metrics: list[dict] = []

        if resume:
            self._restore_latest()
        else:
            self._offer_seeds()

    # ------------------------------------------------------------------ setup
    def _offer_seeds(self) -> None:
        """Seed the shard frontiers. Small seed tables (<=
        _SEEDS_DRIVER_MAX) take a direct driver path — one column read,
        synchronous offers; the Dataset jobs' fixed overhead dominates at
        that size. Larger frontiers stream seeds.parquet through WORKER
        tasks that shard-and-offer (the round loop's offer_fn pattern):
        no seed row passes through the driver — it sees only per-batch
        counter rows and the counted offer barrier. Identical offer
        semantics either way."""
        seeds_path = f"{self.corpus_dir}/seeds.parquet"
        if _seed_count(seeds_path) <= _SEEDS_DRIVER_MAX:
            seeds = pq.read_table(seeds_path)
            urls = seeds["url"]
            hosts = host_of_arrow(urls)
            cand = pa.table({
                "url": urls,
                "url_hash": pa.array(fnv1a64_arrow(urls)),
                "host": hosts,
                "host_hash": pa.array(fnv1a64_arrow(hosts)),
                "depth": seeds["depth"],
                "discovery_seq": seeds["discovery_seq"],
            })
            sh = shard_of_hosts(self.host_bounds, hosts.to_pylist())
            ray.get([self.shards[int(s)].offer.remote(
                         cand.filter(pa.array(sh == s)))
                     for s in np.unique(sh)])
            return
        shards = self.shards
        bounds = self.host_bounds
        S = self.cfg.num_shards
        base_prog = ray.get([s.offer_progress.remote() for s in shards])

        def seed_offer(batch: pa.Table) -> pa.Table:
            submitted = np.zeros(S, dtype=np.int64)
            if batch.num_rows:
                urls = batch["url"]
                hosts = host_of_arrow(urls)
                cand = pa.table({
                    "url": urls,
                    "url_hash": pa.array(fnv1a64_arrow(urls)),
                    "host": hosts,
                    "host_hash": pa.array(fnv1a64_arrow(hosts)),
                    "depth": batch["depth"],
                    "discovery_seq": batch["discovery_seq"],
                })
                sh = shard_of_hosts(bounds, hosts.to_pylist())
                for s in np.unique(sh):
                    shards[int(s)].offer.remote(cand.filter(pa.array(sh == s)))
                    submitted[int(s)] += 1
            return pa.table({"submitted": pa.array([submitted.tolist()],
                                                   pa.list_(pa.int64()))})

        counts = (rd.read_parquet(f"{self.corpus_dir}/seeds.parquet",
                                  columns=["url", "depth", "discovery_seq"])
                    .map_batches(seed_offer, batch_format="pyarrow")
                    .take_all())
        expected = np.array([p[0] for p in base_prog], dtype=np.int64)
        for r in counts:
            expected += np.asarray(r["submitted"], dtype=np.int64)
        deadline = time.monotonic() + 600
        while True:   # same counted barrier as the round loop
            prog = ray.get([s.offer_progress.remote() for s in shards])
            if all(prog[i][0] >= expected[i] for i in range(S)):
                break
            if time.monotonic() > deadline:
                raise RuntimeError("seed offer barrier timeout")
            time.sleep(0.005)

    def _restore_latest(self) -> None:
        manifest = self.out / "checkpoints" / "LATEST.json"
        if not manifest.exists():
            raise FileNotFoundError(f"no checkpoint manifest under {manifest}")
        m = json.loads(manifest.read_text())
        ckpt = str(self.out / "checkpoints" / f"round={m['round']}")
        ray.get([s.restore.remote(ckpt) for s in self.shards])
        self.round = m["round"] + 1
        self.fetch_base = m["fetch_base"]
        self.metrics = m.get("metrics", [])

    # ------------------------------------------------------------------ round
    def _pop_blocks(self) -> tuple[list | None, int]:
        """Distributed pop -> stamp -> bucket-block assembly. The driver
        sees only S counts and O(S x B) ObjectRefs; fetch_seq is stamped
        shard-locally (lex-range sharding makes shard-major order the
        global host-lex order). Returns (per-bucket block refs, n_sched)."""
        B = self.cfg.num_page_buckets
        t0 = time.monotonic()
        counts = ray.get([s.pop_round_count.remote() for s in self.shards])
        self._t_counts = time.monotonic() - t0
        total = int(sum(counts))
        if total == 0:
            return None, 0
        limits = list(counts)
        if self.cfg.max_docs:
            remaining = self.cfg.max_docs - self.fetch_base
            if remaining <= 0:  # cap already reached: return all pops to heaps
                ray.get([s.stamp_emit.remote(0, 0, B) for s in self.shards])
                return None, 0
            run = 0
            for i, c in enumerate(counts):
                limits[i] = max(0, min(c, remaining - run))
                run += c
        starts = self.fetch_base + np.concatenate(
            [[0], np.cumsum(counts[:-1], dtype=np.int64)])
        t1 = time.monotonic()
        emits = ray.get([
            s.stamp_emit.remote(int(starts[i]), int(limits[i]), B)
            for i, s in enumerate(self.shards)])
        self._t_emit = time.monotonic() - t1
        by_bucket: dict[int, list] = {}
        for pieces in emits:
            for b, ref in pieces:
                by_bucket.setdefault(b, []).append(ref)
        blocks = [refs[0] if len(refs) == 1 else _concat_block.remote(*refs)
                  for _, refs in sorted(by_bucket.items())]
        return blocks, int(sum(limits))

    def run_round(self) -> dict | None:
        t0 = time.monotonic()
        blocks, n_sched = self._pop_blocks()
        t_pop = time.monotonic() - t0
        if blocks is None:
            return None
        rnd = self.round

        # one block per pages-bucket -> the fetch join never shuffles; the
        # whole round body (fetch -> trace part write -> discover -> offer)
        # is ONE streamed Dataset execution.
        trace_round_dir = self.out / "trace" / f"round={rnd}"
        if trace_round_dir.exists():  # partial round from a crashed run
            import shutil

            shutil.rmtree(trace_round_dir)
        trace_round_dir.mkdir(parents=True)

        store_round_dir = None
        if self.cfg.write_store:
            srd = self.out / "store" / f"round={rnd}"
            if srd.exists():
                import shutil

                shutil.rmtree(srd)
            srd.mkdir(parents=True)
            store_round_dir = str(srd)
            # store bucket modulus — lets the excerpt path prune a k-url
            # slice to its hash buckets instead of sweeping the store
            meta = self.out / "store" / "_meta.json"
            if not meta.exists():
                meta.write_text(json.dumps(
                    {"num_buckets": self.cfg.num_page_buckets,
                     "key": "abs(fnv1a64(url)) % num_buckets"}))
        stage = FetchTraceDiscover(self.bucket_dir, str(trace_round_dir), rnd,
                                   self.cfg.max_hops, store_round_dir,
                                   self.redirect_dir)

        # Round body: ONE streamed Dataset execution — fetch-join + trace/
        # store part writes + discover, then the offer stage, pipelined by
        # the streaming executor. Offers are FIRE-AND-FORGET (a fetch task
        # never blocks a worker slot on a busy shard actor — zipf link
        # targets make one shard hot); the round barrier below polls the
        # shards' processed-batch counters until every submitted offer has
        # been applied, so pops stay strictly after all offers (loud
        # timeout rather than silent divergence if anything is lost).
        shards = self.shards
        bounds = self.host_bounds
        S = self.cfg.num_shards
        base_prog = ray.get([s.offer_progress.remote() for s in shards])

        def offer_fn(batch: pa.Table) -> pa.Table:
            submitted = np.zeros(S, dtype=np.int64)
            n_200 = int(pc.sum(batch["n_200"]).as_py() or 0)
            n_404 = int(pc.sum(batch["n_404"]).as_py() or 0)
            cand = batch.filter(pc.is_valid(batch["url"])).drop_columns(
                ["n_200", "n_404"])     # strip the status-count sentinels
            if cand.num_rows:
                sh = shard_of_hosts(bounds, cand["host"].to_pylist())
                for s in np.unique(sh):
                    shards[int(s)].offer.remote(cand.filter(pa.array(sh == s)))
                    submitted[int(s)] += 1
            return pa.table({
                "n_candidates": pa.array([cand.num_rows], pa.int64()),
                "n_200": pa.array([n_200], pa.int64()),
                "n_404": pa.array([n_404], pa.int64()),
                "submitted": pa.array([submitted.tolist()],
                                      pa.list_(pa.int64()))})

        t1 = time.monotonic()
        ds = rd.from_arrow_refs(blocks)
        counts = (ds
                  .map_batches(stage, batch_format="pyarrow", batch_size=None,
                               zero_copy_batch=True)
                  .map_batches(offer_fn, batch_format="pyarrow")
                  .take_all())
        t_ds = time.monotonic() - t1
        n_cand = int(sum(r["n_candidates"] for r in counts))
        expected = np.array([p[0] for p in base_prog], dtype=np.int64)
        for r in counts:
            expected += np.asarray(r["submitted"], dtype=np.int64)
        deadline = time.monotonic() + 600
        while True:   # offer barrier (usually already drained)
            prog = ray.get([s.offer_progress.remote() for s in shards])
            if all(prog[i][0] >= expected[i] for i in range(S)):
                break
            if time.monotonic() > deadline:
                raise RuntimeError("offer barrier timeout — offers lost?")
            time.sleep(0.005)
        t_pipe = time.monotonic() - t1
        t_barrier = t_pipe - t_ds
        n_new = int(sum(p[1] for p in prog))
        n_200 = int(sum(r["n_200"] for r in counts))
        n_404 = int(sum(r["n_404"] for r in counts))
        m = {
            "round": rnd,
            "scheduled": n_sched,
            "fetched_200": n_200,
            "fetched_404": n_404,
            "candidates": n_cand,
            "newly_discovered": n_new,
            "fetch_base": self.fetch_base,
            "wall_sec": round(time.monotonic() - t0, 4),
            "pop_sec": round(t_pop, 4),
            "counts_sec": round(getattr(self, "_t_counts", 0.0), 4),
            "emit_sec": round(getattr(self, "_t_emit", 0.0), 4),
            "pipeline_sec": round(t_pipe, 4),
            "barrier_sec": round(t_barrier, 4),
        }
        self.fetch_base += n_sched
        self.metrics.append(m)

        if self.cfg.checkpoint_every and (rnd + 1) % self.cfg.checkpoint_every == 0:
            t3 = time.monotonic()
            self.checkpoint_async(rnd)
            m["checkpoint_sec"] = round(time.monotonic() - t3, 4)
        self.round = rnd + 1
        return m

    # ------------------------------------------------------------ checkpoint
    def checkpoint(self, rnd: int) -> None:
        """Per-partition (shard) snapshot + lineage manifest (north_rule:
        'checkpointed per-partition (frontier snapshot + cuckoo-filter state
        + lineage metrics)'). Atomic: shard files then LATEST.json rename."""
        self.checkpoint_async(rnd)
        self._drain_checkpoint()

    def checkpoint_async(self, rnd: int) -> None:
        """Launch the per-shard snapshot WITHOUT waiting (the VERDICT-r2
        'async checkpoints' item): snapshot tasks overlap the next round's
        compute. Exactness: the driver enqueues snapshot.remote on each
        shard actor BEFORE the next round's pop — per-caller actor
        ordering means every shard snapshots its exact end-of-round-``rnd``
        state; round ``rnd+1`` offers come from workers that only start
        after the next pops. The LATEST.json manifest is only written at
        drain time (next checkpoint / run end), preserving crash
        atomicity: an undrained snapshot is simply ignored by resume."""
        self._drain_checkpoint()              # at most one in flight
        ckpt = self.out / "checkpoints" / f"round={rnd}"
        self._pending_ckpt = {
            "round": rnd,
            "fetch_base": self.fetch_base,
            "metrics": list(self.metrics),
            "refs": [s.snapshot.remote(str(ckpt)) for s in self.shards],
        }

    def _drain_checkpoint(self) -> None:
        p = getattr(self, "_pending_ckpt", None)
        if p is None:
            return
        self._pending_ckpt = None
        manifest = {
            "round": p["round"],
            "fetch_base": p["fetch_base"],
            "shards": ray.get(p["refs"]),
            "metrics": p["metrics"],
            "corpus_dir": str(self.corpus_dir),
        }
        tmp = self.out / "checkpoints" / ".LATEST.json.tmp"
        tmp.write_text(json.dumps(manifest))
        tmp.rename(self.out / "checkpoints" / "LATEST.json")

    # -------------------------------------------------------------------- run
    def run(self) -> CrawlResult:
        while self.round < self.cfg.max_rounds:
            m = self.run_round()
            if m is None:
                break
        self._drain_checkpoint()
        # final artifacts: seen set (written in parallel by the shards —
        # the driver never holds O(corpus) rows) + metrics
        seen_dir = self.out / "seen"
        seen_dir.mkdir(exist_ok=True)
        ray.get([s.write_seen.remote(str(seen_dir)) for s in self.shards])
        (self.out / "metrics.json").write_text(json.dumps(self.metrics, indent=2))
        return CrawlResult(str(self.out), self.round, self.fetch_base, self.metrics)

    def seen_table(self) -> pa.Table:
        tables = ray.get([s.seen_table.remote() for s in self.shards])
        return pa.concat_tables(tables).sort_by("url")

    def shutdown(self) -> None:
        # a pending async checkpoint must land before its actors die —
        # killing a shard with its snapshot in flight would orphan the
        # refs and silently drop the manifest
        self._drain_checkpoint()
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def run_crawl(corpus_dir: str, out_dir: str, cfg: CrawlConfig | None = None,
              *, resume: bool = False, scratch_dir: str | None = None) -> CrawlResult:
    c = Crawler(corpus_dir, out_dir, cfg, resume=resume, scratch_dir=scratch_dir)
    try:
        return c.run()
    finally:
        c.shutdown()
