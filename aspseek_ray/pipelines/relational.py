"""Relational operator pipelines over the driver's TPC-H-ish tables —
the SQL-expressible exercise of the same operator families the crawl engine
uses (SURVEY.md §2.5/§2.6: O19 join, O20 anti-join, O21/O29/O30 grouped
aggregation with partial pre-agg, O16/O24 top-k, O31 per-group head).

Every function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names match the oracle SQL in __ray_entry__.py exactly.

Scale notes: dimension sides are broadcast lookups built ON WORKER TASKS
from block refs (runtime.unique_keys_ref / sorted_lookup_ref — the driver
holds ObjectRefs only, never key arrays) and probed vectorized
(np.isin / np.searchsorted); fact-side aggregations pre-aggregate inside
map_batches (one row per key per batch) before the small global groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..runtime import actor_pool, sorted_lookup_ref, unique_keys_ref


def _round2(x):
    """ROUND(x, 2) with DuckDB's exact double semantics: half away from
    zero, computed as round(x*100)/100 (pc.round multiplies by 0.01
    instead of dividing by 100 and lands 1 ULP off the SQL result on many
    values — bitwise value-hash comparisons then fail)."""
    v = np.asarray(x.to_numpy(zero_copy_only=False)
                   if hasattr(x, "to_numpy") else x, dtype=np.float64)
    return pa.array(np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5) / 100.0)


# --------------------------------------------------------------------- O21/O29
def lineitem_agg(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-flavor grouped aggregate with per-batch partial aggregation
    (the delta-merge / pre-agg pattern of SURVEY O21): map_batches emits one
    partial row per (returnflag, linestatus) per batch; the global groupby
    then shuffles only #keys x #batches rows, not 6e9 lineitems."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        batch = batch.append_column("disc_price", disc_price)
        return batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="sum_qty"),
        Sum("l_extendedprice_sum", alias_name="sum_base_price"),
        Sum("disc_price_sum", alias_name="sum_disc_price"),
        Sum("l_quantity_count", alias_name="n_rows"),
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    t = t.set_column(t.schema.get_field_index("sum_base_price"), "sum_base_price",
                     _round2(t["sum_base_price"]))
    return t.set_column(t.schema.get_field_index("sum_disc_price"), "sum_disc_price",
                        _round2(t["sum_disc_price"]))


# ------------------------------------------------------------------------- O19
def segment_revenue(sf_dir: str) -> pa.Table:
    """orders ⋈ customer (broadcast small side) → revenue by market segment.
    The crawl engine's fetch-join pattern (O19) run in reverse: the dim table
    ships once via ray.put; the fact side never shuffles."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    # broadcast side built ON A WORKER from block refs (driver holds one
    # ObjectRef) — the same pattern as shipping_priority's lookups
    info_ref = sorted_lookup_ref(cust, "c_custkey", "c_mktsegment")

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])

    class JoinAgg:
        def __init__(self):
            self.keys, self.segs = ray.get(info_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = batch["o_custkey"].to_numpy().astype(np.int64)
            if len(self.keys) == 0:
                return pa.table({"c_mktsegment": pa.array([], pa.string()),
                                 "total_price": pa.array([], pa.float64()),
                                 "n_orders": pa.array([], pa.int64())})
            idx = np.searchsorted(self.keys, k)
            idx[idx == len(self.keys)] = 0
            hit = self.keys[idx] == k          # FK integrity: all hit
            df = pd.DataFrame({"c_mktsegment": self.segs[idx[hit]],
                               "o_totalprice":
                               batch["o_totalprice"].to_numpy()[hit]})
            g = df.groupby("c_mktsegment", as_index=False).agg(
                total_price=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
            return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(JoinAgg, batch_format="pyarrow",
                              concurrency=actor_pool())
    out = partials.groupby("c_mktsegment").aggregate(
        Sum("total_price", alias_name="total_price"),
        Sum("n_orders", alias_name="n_orders"),
    ).to_pandas()
    t = pa.Table.from_pandas(out, preserve_index=False)
    return t.set_column(t.schema.get_field_index("total_price"), "total_price",
                        _round2(t["total_price"]))


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-01", k: int = 10) -> pa.Table:
    """TPC-H-Q3-flavor 3-way join + filtered grouped top-k: revenue of
    not-yet-shipped lineitems for one market segment's orders placed
    before ``cutoff``. Physical plan: both dim sides (customer keys of the
    segment; qualifying orders) reduce to broadcast lookups built ON
    WORKER TASKS from block refs (the driver holds only ObjectRefs), then
    one pass over lineitem with per-batch partial aggregation — the fact
    table never shuffles; the final groupby moves only partial rows."""
    cut = np.datetime64(f"{cutoff}T00:00:00")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"],
                           filter=pc.field("c_mktsegment") == segment)
    seg_ref = unique_keys_ref(cust, "c_custkey")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_filter(b: pa.Table) -> pa.Table:
        keys = ray.get(seg_ref)
        mine = np.isin(b["o_custkey"].to_numpy(), keys)
        early = b["o_orderdate"].to_numpy() < cut
        return b.filter(pa.array(mine & early)).select(
            ["o_orderkey", "o_orderdate"])

    info_ref = sorted_lookup_ref(
        orders.map_batches(order_filter, batch_format="pyarrow"),
        "o_orderkey", "o_orderdate")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    class Partial:
        def __init__(self):                 # once per actor
            okeys, odates = ray.get(info_ref)
            self.okeys = okeys
            self.odates = odates.astype("int64")   # MICROSECOND ints

        def __call__(self, b: pa.Table) -> pa.Table:
            late = b["l_shipdate"].to_numpy() > cut
            b = b.filter(pa.array(late))
            keys = b["l_orderkey"].to_numpy().astype(np.int64)
            ok = self.okeys
            if len(ok) == 0:
                hit = np.zeros(len(keys), dtype=bool)
                dates = np.empty(0, np.int64)
            else:
                idx = np.searchsorted(ok, keys)
                idx[idx == len(ok)] = len(ok) - 1
                hit = ok[idx] == keys
                dates = self.odates[idx[hit]]
            rev = (b["l_extendedprice"].to_numpy()
                   * (1.0 - b["l_discount"].to_numpy()))[hit]
            t = pa.table({"l_orderkey": pa.array(keys[hit]),
                          "o_orderdate": pa.array(dates),
                          "revenue": pa.array(rev)})
            return t.group_by(["l_orderkey", "o_orderdate"]).aggregate(
                [("revenue", "sum")])

    agg = (li.map_batches(Partial, batch_format="pyarrow",
                          concurrency=actor_pool())
             .groupby(["l_orderkey", "o_orderdate"])
             .aggregate(Sum("revenue_sum", alias_name="revenue"))).to_pandas()
    # round BEFORE the top-k cut — the oracle's ORDER BY uses the rounded
    # alias, so boundary ties must break on the rounded value
    agg["revenue"] = _round2(agg["revenue"].to_numpy()).to_numpy()
    agg = agg.sort_values(["revenue", "l_orderkey"],
                          ascending=[False, True]).head(k)
    return pa.table({
        "l_orderkey": pa.array(agg["l_orderkey"].to_numpy(), pa.int64()),
        "o_orderdate": pa.array(           # int64 values are MICROSECONDS
            agg["o_orderdate"].to_numpy().astype("datetime64[us]")),
        "revenue": _round2(agg["revenue"].to_numpy()),
    })


# ------------------------------------------------------------------- O16 / O24
def topk_orders(sf_dir: str, k: int = 10) -> pa.Table:
    """Global top-k with deterministic tiebreak (O24 result ranking)."""
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


# ------------------------------------------------------------------------- O20
def customers_without_orders(sf_dir: str, min_price: float = 300_000.0) -> pa.Table:
    """Anti-join via broadcast key set (the discovery-vs-seen pattern, O20):
    customers with no order above ``min_price``. At 100-TB scale the key set
    becomes a bucketed anti-join or a per-shard membership actor (exactly
    what the crawl engine does with CrawlShard)."""
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"],
                             filter=pc.field("o_totalprice") > min_price)
    keys_ref = unique_keys_ref(orders, "o_custkey")   # built on a worker

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_acctbal"])

    def anti(batch: pa.Table) -> pa.Table:
        have = np.isin(batch["c_custkey"].to_numpy(), ray.get(keys_ref))
        return batch.filter(pa.array(~have))

    out = ds.map_batches(anti, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


# ------------------------------------------------------------------------- O31
def top2_customers_per_nation(sf_dir: str) -> pa.Table:
    """Per-group head-m (site-grouped results, O31): top-2 customers by
    account balance per nation, deterministic tiebreak on custkey."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_nationkey", "c_custkey", "c_acctbal"])

    def head2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["c_acctbal", "c_custkey"],
                             ascending=[False, True]).head(2)

    out = ds.groupby("c_nationkey").map_groups(head2, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


# ------------------------------------------------------- streaming-shaped O29
def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate over the events table (Ray Data guide
    streaming-shaped pattern): floor ts to the hour inside map_batches (no
    shuffle), then grouped count/sum over (event_type, hour)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def stamp(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return batch.append_column("hour", hour)

    out = (ds.map_batches(stamp, batch_format="pyarrow")
             .groupby(["event_type", "hour"])
             .aggregate(Count(alias_name="n_events"),
                        Sum("value", alias_name="total_value"))).to_pandas()
    t = pa.Table.from_pandas(out, preserve_index=False)
    return t.set_column(t.schema.get_field_index("total_value"), "total_value",
                        _round2(t["total_value"]))


def events_hopping(sf_dir: str, window_s: int = 3600,
                   hop_s: int = 1800) -> pa.Table:
    """HOPPING (overlapping) windows over the events stream — each event
    belongs to window_s/hop_s windows; the fan-out happens inside
    map_batches (rows duplicated per window start, no shuffle), then one
    grouped aggregate over (event_type, wstart). Output
    (event_type, wstart, n_events, total_value)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    k = window_s // hop_s
    hop_us = hop_s * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        w1 = ts - (ts % hop_us)
        parts = []
        for i in range(k):
            parts.append(pa.table({
                "event_type": batch["event_type"],
                "wstart": pa.array((w1 - i * hop_us).view("datetime64[us]")),
                "value": batch["value"],
            }))
        t = pa.concat_tables(parts)
        return t.group_by(["event_type", "wstart"]).aggregate(
            [("value", "sum"), ("value", "count")])

    out = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby(["event_type", "wstart"])
             .aggregate(Sum("value_sum", alias_name="total_value"),
                        Sum("value_count", alias_name="n_events"))).to_pandas()
    t = pa.Table.from_pandas(out, preserve_index=False)
    t = t.set_column(t.schema.get_field_index("total_value"), "total_value",
                     _round2(t["total_value"]))
    return t.select(["event_type", "wstart", "n_events", "total_value"])


def supplier_region_stats(sf_dir: str) -> pa.Table:
    """supplier ⋈ nation ⋈ region — two chained broadcast dim lookups
    (both true dim tables), grouped per region. Output
    (r_name, n_suppliers, total_acctbal)."""
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = rd.read_parquet(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"]).to_pandas()
    reg_of = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    name_of = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({k: name_of[v] for k, v in reg_of.items()})

    ds = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_nationkey", "s_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        df = pd.DataFrame({
            "r_name": [lk[int(x)] for x in batch["s_nationkey"].to_pylist()],
            "s_acctbal": batch["s_acctbal"].to_numpy()})
        g = df.groupby("r_name", as_index=False).agg(
            n_suppliers=("s_acctbal", "size"),
            total_acctbal=("s_acctbal", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("r_name")
             .aggregate(Sum("n_suppliers", alias_name="n_suppliers"),
                        Sum("total_acctbal", alias_name="total_acctbal"))).to_pandas()
    t = pa.Table.from_pandas(out, preserve_index=False)
    return t.set_column(t.schema.get_field_index("total_acctbal"),
                        "total_acctbal", _round2(t["total_acctbal"]))


# ------------------------------------------------ native hash join (Ray 2.49+)
def customer_nation_join(sf_dir: str) -> pa.Table:
    """customer ⋈ nation via Ray Data's NATIVE Dataset.join (hash-
    partitioned on the key) — the both-sides-large join path, complementing
    the broadcast join in segment_revenue. Output: (n_name, n_customers,
    total_acctbal) per nation."""
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])

    def widen(batch: pa.Table) -> pa.Table:  # join keys must share a type
        return batch.set_column(0, "n_nationkey",
                                batch["n_nationkey"].cast(pa.int32()))

    joined = cust.join(nation.map_batches(widen, batch_format="pyarrow"),
                       join_type="inner", num_partitions=8,
                       on=("c_nationkey",), right_on=("n_nationkey",))
    out = (joined.groupby("n_name")
           .aggregate(Count(alias_name="n_customers"),
                      Sum("c_acctbal", alias_name="total_acctbal"))).to_pandas()
    t = pa.Table.from_pandas(out, preserve_index=False)
    return t.set_column(t.schema.get_field_index("total_acctbal"),
                        "total_acctbal", _round2(t["total_acctbal"]))


# ---------------------------------------------------- streaming-shaped sessions
def events_sessions(sf_dir: str, gap_s: int = 1800,
                    presplit_window_s: int | None = None,
                    presplit_min_rows: int = 50_000_000) -> pa.Table:
    """Session windows over the events stream (Ray Data guide
    streaming-shaped pattern): per user, a gap > gap_s starts a new
    session. Output one row per session:
    (user_id, session_start, n_events, total_value).

    Two physical plans behind a size switch (the pagerank pattern; the
    plans are proven equal in tests):

    * small inputs: groupby(user_id) + per-group pandas over the
      ts-sorted group — one user's whole history in one task.
    * above ``presplit_min_rows`` (or with ``presplit_window_s`` forced):
      pre-split on (user_id, coarse time window) so no task ever holds
      more than one user-window of events — a pathological power user
      stops being a straggler. Sessions fully inside a window finalize
      immediately; only each window's first/last session CAN touch a
      neighbor (in-window sessions are separated by > gap_s, so at most
      one open candidate per edge), and those boundary candidates — O(2
      x active windows) rows per user, independent of event count — go
      through a tiny per-user stitch that merges chains across window
      edges. The window must exceed gap_s so an empty window blocks any
      merge across it."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    if presplit_window_s is None and ds.count() > presplit_min_rows:
        presplit_window_s = max(4 * gap_s, 86_400)
    if presplit_window_s is not None:
        assert presplit_window_s > gap_s
        return _events_sessions_presplit(ds, gap_s, presplit_window_s)

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds()
        new_session = (gap.isna() | (gap > gap_s)).cumsum()
        out = g.groupby(new_session).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("event_id", "size"),
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        # total_value via reduceat: strictly SEQUENTIAL per-segment
        # summation in ts order — the association both plans pin so the
        # pre-split plan can reproduce it bitwise (pandas/np.sum use
        # pairwise trees that depend on segment length)
        sid = new_session.to_numpy()
        starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        raw = np.add.reduceat(g["value"].to_numpy(), starts)
        out["total_value"] = _round2(raw).to_numpy()
        return out.reset_index(drop=True)

    out = ds.groupby("user_id").map_groups(sessionize, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def _events_sessions_presplit(ds, gap_s: int, window_s: int) -> pa.Table:
    """Bounded-straggler sessions plan: see events_sessions."""

    def stamp(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        mult = {"s": 1, "ms": 10 ** 3, "us": 10 ** 6,
                "ns": 10 ** 9}[ts.type.unit]
        secs = ts.cast(pa.int64()).to_numpy() // mult
        return batch.append_column(
            "win", pa.array((secs // window_s).astype(np.int64)))

    def window_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds()
        sid_s = (gap.isna() | (gap > gap_s)).cumsum()
        out = g.groupby(sid_s).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
        ).reset_index(drop=True)
        out["n_events"] = out["n_events"].astype(np.int64)
        # sequential per-segment sums (see sessionize): raw here,
        # rounded at final emit
        vals_np = g["value"].to_numpy()
        sid = sid_s.to_numpy()
        starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        out["total_value"] = np.add.reduceat(vals_np, starts)
        win = int(g["win"].iloc[0])
        w0 = pd.Timestamp(win * window_s, unit="s")
        w1 = pd.Timestamp((win + 1) * window_s, unit="s")
        n = len(out)
        first_open = out["session_start"].iloc[0] <= w0 + pd.Timedelta(
            seconds=gap_s)
        last_open = out["session_end"].iloc[n - 1] >= w1 - pd.Timedelta(
            seconds=gap_s)
        cand = np.zeros(n, dtype=bool)
        if first_open:
            cand[0] = True
        if last_open:
            cand[n - 1] = True
        out["boundary"] = cand
        # boundary sessions carry their raw ts-ordered values so the
        # stitch can recompute a MERGED session's total with the exact
        # same sequential association the one-task plan uses (partial
        # sums re-summed would associate differently -> 1-ulp drift
        # that _round2 could amplify at a .xx5 boundary). Bounded by
        # session length; interior sessions carry nothing.
        ends = np.r_[starts[1:], len(vals_np)]
        vals_col: list = [None] * n
        if first_open:
            vals_col[0] = vals_np[: ends[0]].tolist()
        if last_open:
            vals_col[n - 1] = vals_np[starts[n - 1]:].tolist()
        out["vals"] = vals_col
        return out

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["session_start", "session_end"])
        starts = g["session_start"].to_numpy()
        ends = g["session_end"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (starts[1:] - ends[:-1]) > np.timedelta64(gap_s, "s")
        sid = np.cumsum(new)
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("session_start", "min"),
            n_events=("n_events", "sum"),
        ).reset_index(drop=True)
        out["n_events"] = out["n_events"].astype(np.int64)
        # recompute each chain's total from the member value arrays in
        # ts order with the SAME sequential association as the one-task
        # plan (reduceat over the concatenation == reduceat over the
        # full session segment)
        vals_list = g["vals"].tolist()
        seg_start = np.flatnonzero(new)
        totals = []
        for i, s in enumerate(seg_start):
            e = seg_start[i + 1] if i + 1 < len(seg_start) else len(g)
            chain = np.concatenate(
                [np.asarray(v, np.float64) for v in vals_list[s:e]])
            totals.append(np.add.reduceat(chain, [0])[0])
        out["total_value"] = np.asarray(totals, np.float64)
        return out

    summaries = (ds.map_batches(stamp, batch_format="pyarrow")
                   .groupby(["user_id", "win"])
                   .map_groups(window_sessions, batch_format="pandas")
                   .materialize())
    final = summaries.map_batches(
        lambda b: b.filter(pc.equal(b["boundary"], False)),
        batch_format="pyarrow")
    stitched = (summaries.map_batches(
                    lambda b: b.filter(pc.equal(b["boundary"], True)),
                    batch_format="pyarrow")
                         .groupby("user_id")
                         .map_groups(stitch, batch_format="pandas"))
    cols = ["user_id", "session_start", "n_events", "total_value"]
    parts = ([t.select(cols) for t in ray.get(
                 final.materialize().to_arrow_refs()) if t.num_rows] +
             [t.select(cols) for t in ray.get(
                 stitched.materialize().to_arrow_refs()) if t.num_rows])
    if not parts:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "session_start": pa.array([], pa.timestamp("us")),
                         "n_events": pa.array([], pa.int64()),
                         "total_value": pa.array([], pa.float64())})
    t = pa.concat_tables([p.cast(parts[0].schema) for p in parts])
    t = t.set_column(t.schema.get_field_index("total_value"), "total_value",
                     _round2(t["total_value"]))
    return t.sort_by([("user_id", "ascending"),
                      ("session_start", "ascending")]).combine_chunks()


# ---------------------------------------------------------------- range join
# Pinned price-band dimension for the range join (both the engine and the
# SQL oracle carry the same literal bands).
PRICE_BANDS = ((0.0, 50_000.0), (50_000.0, 150_000.0),
               (150_000.0, 300_000.0), (300_000.0, 450_000.0),
               (450_000.0, float("inf")))


def orders_price_band_join(sf_dir: str) -> pa.Table:
    """RANGE (non-equi) join (a custom operator Ray Data lacks, per the
    round brief): every order joins the price band whose [lo, hi)
    interval contains o_totalprice. Physical plan: the band table is tiny
    and its intervals are sorted and non-overlapping, so the join is a
    broadcast + per-batch vectorized binary search (np.searchsorted on
    the lower edges) — row-parallel, no shuffle, no per-row Python. For
    overlapping intervals the same plan emits one row per containing
    band from the searchsorted bracket. Output
    (o_orderkey, band_id, band_lo) per order."""
    edges = np.array([lo for lo, _ in PRICE_BANDS])
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])

    def band(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy().astype(np.float64)
        b = np.searchsorted(edges, price, side="right") - 1
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "band_id": pa.array(b.astype(np.int64)),
            "band_lo": pa.array(edges[b]),
        })

    out = ds.map_batches(band, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs())).combine_chunks()


# ---------------------------------------------------------------- as-of join
def events_asof_join(sf_dir: str, left_type: str = "view",
                     right_type: str = "purchase") -> pa.Table:
    """AS-OF join over the events stream (a custom operator Ray Data
    lacks, per the round brief): each ``right_type`` event joins the SAME
    user's most recent ``left_type`` event at-or-before it (the classic
    attribution join). Deterministic tiebreak: greatest ts, then greatest
    event_id. Unmatched rights are dropped (inner as-of).

    Plan: one groupby(user_id) shuffle, then a vectorized searchsorted
    per group over the ts-sorted left side — no per-row Python loops and
    no driver-side state. A user's events share one task (the sessions
    shape); the events_sessions (user, coarse-window) pre-split + stitch
    pattern applies verbatim if a power user ever dominates.

    Output (purchase_id, user_id, purchase_ts, view_id, view_ts) — named
    for the default types."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type", "ts"])

    def pre(batch: pa.Table) -> pa.Table:   # prune both sides at the read
        m = pc.is_in(batch["event_type"],
                     value_set=pa.array([left_type, right_type]))
        return batch.filter(m)

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values(
            ["ts", "event_id"], kind="mergesort")
        right = g[g["event_type"] == right_type]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {"purchase_id": pd.Series([], dtype=np.int64),
                 "user_id": pd.Series([], dtype=np.int64),
                 "purchase_ts": pd.Series([], dtype="datetime64[us]"),
                 "view_id": pd.Series([], dtype=np.int64),
                 "view_ts": pd.Series([], dtype="datetime64[us]")})
        lts = left["ts"].to_numpy()
        idx = np.searchsorted(lts, right["ts"].to_numpy(), side="right") - 1
        ok = idx >= 0
        r = right[ok]
        picked = left.iloc[idx[ok]]
        return pd.DataFrame({
            "purchase_id": r["event_id"].to_numpy(),
            "user_id": r["user_id"].to_numpy(),
            "purchase_ts": r["ts"].to_numpy(),
            "view_id": picked["event_id"].to_numpy(),
            "view_ts": picked["ts"].to_numpy(),
        })

    out = (ds.map_batches(pre, batch_format="pyarrow")
             .groupby("user_id").map_groups(asof, batch_format="pandas"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.sort_by("purchase_id").combine_chunks()


# ------------------------------------------------------------------------- O27
def docs_with_all_terms(sf_dir: str, terms: tuple[str, ...] = ("spark", "order")) -> pa.Table:
    """Posting-list AND-intersection analog (O27): documents containing every
    term as a substring, fully vectorized (pc.match_substring per term)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def matches(batch: pa.Table) -> pa.Table:
        mask = None
        for term in terms:
            m = pc.match_substring(batch["text"], term)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask).select(["doc_id"])

    out = ds.map_batches(matches, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))
