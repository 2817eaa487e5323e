"""exact_quantiles: distributed selection must equal the rank-based truth
under forced multi-level refinement, skew, and degenerate inputs; the
deterministic sampler must be a pure function of the key."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _truth(path, column, qs):
    v = np.sort(pq.read_table(path, columns=[column])[column].to_numpy())
    n = len(v)
    return [float(v[min(n, max(1, math.ceil(q * n))) - 1]) for q in qs]


def test_quantiles_forced_refinement(ray_session):
    """max_pull far below n and a tiny bin count force several histogram
    levels; the result must still be rank-exact."""
    from aspseek_ray.pipelines.quantiles import exact_quantiles

    qs = (0.01, 0.25, 0.5, 0.9, 0.99, 1.0)
    t = exact_quantiles(SF, qs=qs, bins=4, max_pull=20)
    want = _truth(f"{SF}/orders.parquet", "o_totalprice", qs)
    assert t["value"].to_pylist() == want


def test_quantiles_constant_column(ray_session, tmp_path):
    """All-equal values: no bin can narrow; the operator must stop
    refining and still return the constant."""
    from aspseek_ray.pipelines.quantiles import exact_quantiles

    p = tmp_path / "const"
    p.mkdir()
    pq.write_table(pa.table({"x": pa.array([7.5] * 1000, pa.float64())}),
                   p / "t.parquet")
    t = exact_quantiles(str(p), table="t", column="x", qs=(0.5,),
                        bins=8, max_pull=10)
    assert t["value"].to_pylist() == [7.5]


def test_quantiles_skewed_column(ray_session, tmp_path):
    """99% of mass in one spike plus a thin tail: the spike bin stops
    narrowing (degrades to a direct pull) while tail quantiles refine."""
    from aspseek_ray.pipelines.quantiles import exact_quantiles

    rng = np.random.default_rng(3)
    vals = np.concatenate([np.full(5000, 100.0),
                           rng.uniform(0, 1e6, 50)])
    p = tmp_path / "skew"
    p.mkdir()
    pq.write_table(pa.table({"x": pa.array(vals, pa.float64())}),
                   p / "t.parquet")
    qs = (0.5, 0.999)
    t = exact_quantiles(str(p), table="t", column="x", qs=qs,
                        bins=16, max_pull=64)
    assert t["value"].to_pylist() == _truth(str(p / "t.parquet"), "x", qs)


def test_deterministic_sample_is_pure(ray_session):
    from aspseek_ray.pipelines.sampling import deterministic_sample
    from aspseek_ray.state.cuckoo import _mix

    a = sorted(deterministic_sample(SF).to_pandas()["doc_id"])
    b = sorted(deterministic_sample(SF).to_pandas()["doc_id"])
    assert a == b and len(a) > 0
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    want = sorted(ids[(_mix(ids.astype(np.uint64)) % np.uint64(100))
                      < np.uint64(10)].tolist())
    assert a == want


def test_stratified_sample_rebalances_and_nests(ray_session):
    """Strata get their own rates; unlisted strata keep default_rate;
    per-stratum samples NEST across rates (a 5% cut is a subset of a
    20% cut) because every rate slices the same mixed-key axis."""
    from aspseek_ray.pipelines.sampling import stratified_sample

    full = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    out = stratified_sample(SF).to_pandas()
    # non-en strata survive whole at default_rate=100
    for lang, grp in full.groupby("lang"):
        kept = set(out[out["lang"] == lang]["doc_id"])
        if lang == "en":
            assert 0 < len(kept) < len(grp)
        else:
            assert kept == set(grp["doc_id"])
    # nesting: en@5 subset of en@20 subset of en@60
    cuts = [set(stratified_sample(SF, rates={"en": r}, default_rate=0)
                .to_pandas()["doc_id"]) for r in (5, 20, 60)]
    assert cuts[0] <= cuts[1] <= cuts[2]


def test_quantiles_ignore_nulls(ray_session, tmp_path):
    """Nulls/NaN are excluded from ranks AND selection consistently:
    ranks computed over a null-inclusive count would shift every high
    quantile (or crash on rank > finite rows)."""
    from aspseek_ray.pipelines.quantiles import exact_quantiles

    p = tmp_path / "nulls"
    p.mkdir()
    vals = list(np.arange(1.0, 101.0)) + [None] * 40 + [float("nan")] * 10
    pq.write_table(pa.table({"x": pa.array(vals, pa.float64())}),
                   p / "t.parquet")
    qs = (0.5, 0.99, 1.0)
    t = exact_quantiles(str(p), table="t", column="x", qs=qs,
                        bins=8, max_pull=10)
    finite = np.arange(1.0, 101.0)
    want = [float(finite[min(100, max(1, math.ceil(q * 100))) - 1])
            for q in qs]
    assert t["value"].to_pylist() == want


def test_quantiles_heavy_tail_keeps_refining(ray_session, tmp_path):
    """One enormous outlier parks ALL remaining mass in bin 0 for
    several levels (count does not shrink while the interval still
    contracts). Refinement must keep going and converge rank-exactly —
    not degrade to pulling ~n rows."""
    from aspseek_ray.pipelines.quantiles import exact_quantiles

    rng = np.random.default_rng(9)
    vals = np.concatenate([rng.uniform(0.0, 1.0, 20_000),
                           np.array([1e12])])
    p = tmp_path / "tail"
    p.mkdir()
    pq.write_table(pa.table({"x": pa.array(vals, pa.float64())}),
                   p / "t.parquet")
    qs = (0.5,)
    t = exact_quantiles(str(p), table="t", column="x", qs=qs,
                        bins=16, max_pull=64)
    assert t["value"].to_pylist() == _truth(str(p / "t.parquet"), "x", qs)
