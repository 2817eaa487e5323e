"""HyperLogLog distinct-count sketch: accuracy vs exact COUNT(DISTINCT),
merge correctness (batching invariance), and estimator edge cases."""

import numpy as np

from aspseek_ray.pipelines.sketches import (
    _registers,
    hll_distinct,
    hll_estimate,
)


def test_hll_accuracy_against_exact(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.01"
    for col, expected_err in [("user_id", 0.05), ("event_id", 0.05)]:
        est = hll_distinct(sf, "events", col)["estimate"][0].as_py()
        exact = duckdb.sql(
            f"SELECT COUNT(DISTINCT {col}) FROM "
            f"read_parquet('{sf}/events.parquet')").fetchone()[0]
        assert abs(est - exact) / exact < expected_err, (col, est, exact)


def test_hll_merge_is_batching_invariant():
    """Folding the same values in one pass or many must give identical
    registers — the max-merge property the distributed plan relies on."""
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 62, size=20_000, dtype=np.int64).astype(np.uint64)
    p = 12
    one_i, one_r = _registers(vals, p)
    full = np.zeros(1 << p, np.int64)
    full[one_i] = one_r
    merged = np.zeros(1 << p, np.int64)
    for chunk in np.array_split(vals, 7):
        i, r = _registers(chunk, p)
        np.maximum.at(merged, i, r)
    assert np.array_equal(full, merged)
    # duplicates never change the sketch
    i2, r2 = _registers(np.concatenate([vals, vals[:500]]), p)
    dup = np.zeros(1 << p, np.int64)
    dup[i2] = r2
    assert np.array_equal(full, dup)


def test_hll_estimator_edges():
    # empty sketch -> linear counting says 0
    assert hll_estimate(np.zeros(4096, np.int64)) == 0.0
    # tiny cardinalities are near-exact via linear counting
    i, r = _registers(np.arange(10, dtype=np.uint64), 12)
    regs = np.zeros(4096, np.int64)
    regs[i] = r
    assert abs(hll_estimate(regs) - 10) < 1.0


def test_cms_heavy_hitters_vs_exact(ray_session):
    """With width >> distinct keys the CMS estimate is collision-free,
    so heavy hitters match the exact GROUP BY truth bitwise."""
    import duckdb

    from aspseek_ray.pipelines.sketches import cms_heavy_hitters

    sf = "/root/testdata/sf0.01"
    got = cms_heavy_hitters(sf, "events", "user_id").to_pandas()
    truth = duckdb.sql(
        f"""SELECT user_id AS value, count(*) AS est_count
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY user_id HAVING est_count >= 75
            ORDER BY est_count DESC, value""").fetchdf()
    assert got.reset_index(drop=True).equals(truth.reset_index(drop=True))


def test_cms_only_overcounts_under_collisions(ray_session):
    """At a deliberately tiny width every cell collides; the estimate
    must still upper-bound the true count for every key (the CMS
    guarantee), and the >= threshold output must be a superset of the
    true heavy-hitter set."""
    import duckdb

    from aspseek_ray.pipelines.sketches import cms_heavy_hitters

    sf = "/root/testdata/sf0.001"
    got = cms_heavy_hitters(sf, "events", "user_id",
                            width=16, depth=2, threshold=30).to_pandas()
    truth = duckdb.sql(
        f"""SELECT user_id AS value, count(*) AS cnt
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY user_id""").fetchdf().set_index("value")["cnt"]
    for value, est in zip(got["value"], got["est_count"]):
        assert est >= truth[value], (value, est, truth[value])
    heavy_true = set(truth[truth >= 30].index)
    assert heavy_true <= set(got["value"])


def test_cms_grid_is_batching_invariant():
    """Cell counts merge by plain addition, so the grid is identical
    however the rows are batched — the property the distributed
    groupby(cell).sum merge relies on."""
    from aspseek_ray.pipelines.sketches import _cms_cols

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1 << 30, size=5_000).astype(np.uint64)
    width, depth = 64, 4
    one = np.zeros((depth, width), np.int64)
    for j, cols in enumerate(_cms_cols(vals, width, depth)):
        np.add.at(one[j], cols, 1)
    many = np.zeros((depth, width), np.int64)
    for chunk in np.array_split(vals, 9):
        for j, cols in enumerate(_cms_cols(chunk, width, depth)):
            np.add.at(many[j], cols, 1)
    assert np.array_equal(one, many)
