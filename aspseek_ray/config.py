"""Run configuration (SURVEY.md S1; reference: src/config.cpp aspseek.conf
directives — MaxHops, Server seeds, politeness, filters). Typed dataclass
loaded from JSON; the seed list and robots tables are separate Parquet
inputs (FIXTURES.md §2)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict
from pathlib import Path


@dataclass(frozen=True)
class CrawlConfig:
    # politeness / scheduling (FIXTURES.md §2.3)
    per_host_per_round: int = 4           # per-round per-host fetch budget
    max_hops: int = 5                     # reference MaxHops
    max_rounds: int = 32
    round_time_budget_ms: int = 2000      # crawl-delay budget window per round:
    # a host with crawl_delay_ms>0 fetches at most
    # max(1, round_time_budget_ms // crawl_delay_ms) urls per round
    # (deterministic stand-in for wall-clock delay honoring — pinned spec).
    max_docs: int = 0                     # 0 = unlimited (reference `index -n N`, O32)

    # partitioning (SURVEY §4: explicit partition counts)
    num_shards: int = 8                   # frontier/seen shard actors (host_hash % S)
    num_page_buckets: int = 16            # pages pre-bucketing (url_hash % B, O19)

    # url filters (reference Allow/Disallow/CheckOnly chains, O2)
    disallow_patterns: tuple[str, ...] = ()   # regex, first-match rejects

    # follow mode (reference `Server [mode] URL` — O3): restricts which
    # DISCOVERED urls may enter the frontier relative to the seed list:
    #   world — no restriction (default);
    #   site  — only hosts that appear in the seed list;
    #   path  — only urls under a seed's directory prefix
    #           (seed url truncated after its last '/').
    follow_mode: str = "world"

    # checkpointing
    checkpoint_every: int = 1             # rounds between checkpoints

    # per-host in-memory frontier bound (SURVEY §4 backlog sub-partitioning):
    # a host whose heap exceeds this spills its tail to sorted parquet runs
    # (exact: every spilled entry orders after every in-heap entry); 0 = off.
    # The default keeps ~1M entries (<100 MB) per pathological host in RAM.
    host_heap_cap: int = 1_000_000

    # stored-copy output (reference `stored` daemon, SURVEY S8): write
    # (url_hash, url, text) zstd parquet per bucket per round
    write_store: bool = True

    def effective_budget(self, crawl_delay_ms: int) -> int:
        """Per-round budget for a host honoring its crawl delay (pinned spec,
        see round_time_budget_ms)."""
        if crawl_delay_ms and crawl_delay_ms > 0:
            return min(self.per_host_per_round,
                       max(1, self.round_time_budget_ms // crawl_delay_ms))
        return self.per_host_per_round

    def to_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(asdict(self), indent=2))

    @classmethod
    def from_json(cls, path: str | Path) -> "CrawlConfig":
        raw = json.loads(Path(path).read_text())
        raw.pop("seed_list", None)
        if "disallow_patterns" in raw:
            raw["disallow_patterns"] = tuple(raw["disallow_patterns"])
        return cls(**raw)
