"""CrawlShard unit tests — driven as a plain class (no cluster):
arrival-order independence, politeness budgets, robots, snapshot/restore."""

import json

import pyarrow as pa

from aspseek_ray.config import CrawlConfig
from aspseek_ray.state.shard import CrawlShard


def _cfg_json(**kw) -> str:
    from dataclasses import asdict

    return json.dumps(asdict(CrawlConfig(**kw)))


def _cand(rows):
    from aspseek_ray.functions.hashing import fnv1a64

    return pa.table({
        "url": pa.array([r[0] for r in rows]),
        "url_hash": pa.array([fnv1a64(r[0]) for r in rows], pa.int64()),
        "host": pa.array([r[1] for r in rows]),
        "depth": pa.array([r[2] for r in rows], pa.int32()),
        "discovery_seq": pa.array([r[3] for r in rows], pa.int64()),
    })


def test_staging_min_seq_order_independent():
    a = CrawlShard(0, _cfg_json())
    b = CrawlShard(0, _cfg_json())
    o1 = _cand([("http://h.example/x", "h.example", 1, 100)])
    o2 = _cand([("http://h.example/x", "h.example", 2, 50)])
    a.offer(o1); a.offer(o2)
    b.offer(o2); b.offer(o1)
    ta, tb = a.pop_round(), b.pop_round()
    assert ta.equals(tb)
    assert ta["discovery_seq"].to_pylist() == [50]
    assert ta["depth"].to_pylist() == [2]  # min-seq offer's depth wins


def test_seen_rejects_across_rounds_but_not_within():
    s = CrawlShard(0, _cfg_json())
    s.offer(_cand([("http://h.example/x", "h.example", 0, 10)]))
    s.pop_round()
    # re-offer after fetch -> rejected by seen
    n = s.offer(_cand([("http://h.example/x", "h.example", 1, 999)]))
    assert n == 0
    assert s.pop_round().num_rows == 0


def test_budget_and_heap_order():
    s = CrawlShard(0, _cfg_json(per_host_per_round=2))
    rows = [(f"http://h.example/p{i}", "h.example", d, q)
            for i, (d, q) in enumerate([(2, 5), (1, 9), (1, 3), (3, 1)])]
    s.offer(_cand(rows))
    t = s.pop_round()
    # (depth, seq) order: (1,3) then (1,9); budget 2
    assert t["url"].to_pylist() == ["http://h.example/p2", "http://h.example/p1"]
    assert t["pop_idx"].to_pylist() == [0, 1]
    t2 = s.pop_round()
    assert t2["url"].to_pylist() == ["http://h.example/p0", "http://h.example/p3"]


def test_crawl_delay_budget():
    robots = pa.table({
        "host": ["slow.example"],
        "rules": pa.array([[]], pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([1000], pa.int64()),
    })
    s = CrawlShard(0, _cfg_json(per_host_per_round=4, round_time_budget_ms=2000),
                   robots_rows=robots)
    rows = [(f"http://slow.example/p{i}", "slow.example", 0, i) for i in range(6)]
    s.offer(_cand(rows))
    assert s.pop_round().num_rows == 2  # 2000ms / 1000ms delay


def test_robots_and_depth_rejection():
    robots = pa.table({
        "host": ["h.example"],
        "rules": pa.array([["/private/"]], pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([0], pa.int64()),
    })
    s = CrawlShard(0, _cfg_json(max_hops=2), robots_rows=robots)
    n = s.offer(_cand([
        ("http://h.example/private/x", "h.example", 0, 1),   # robots
        ("http://h.example/deep", "h.example", 3, 2),        # depth
        ("http://h.example/ok", "h.example", 1, 3),
    ]))
    assert n == 1
    assert s.pop_round()["url"].to_pylist() == ["http://h.example/ok"]


def test_snapshot_restore_roundtrip(tmp_path):
    s = CrawlShard(3, _cfg_json())
    s.offer(_cand([("http://a.example/1", "a.example", 0, 1),
                   ("http://b.example/2", "b.example", 0, 2)]))
    s.pop_round()  # fetch both; seen = {1,2}
    s.offer(_cand([("http://a.example/3", "a.example", 1, 30)]))  # staged
    s.snapshot(str(tmp_path))

    r = CrawlShard(3, _cfg_json())
    r.restore(str(tmp_path))
    assert r.seen == s.seen
    # staged offer was flushed into the snapshot -> pops identically
    assert r.pop_round()["url"].to_pylist() == ["http://a.example/3"]
    # and seen-set blocks re-offers after restore
    assert r.offer(_cand([("http://a.example/1", "a.example", 0, 99)])) == 0
