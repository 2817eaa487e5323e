"""DuckDB-oracle cross-checks for every oracle-backed queries() entry —
mirrors the driver's compare (row count + schema names + order-insensitive
values) at sf0.001 for speed; the driver runs sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


def test_every_oracle_key_has_query():
    q = entrymod.queries()
    for k in ORACLE_KEYS:
        assert k in q, f"oracle_sql has {k} but queries() doesn't"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(ray_session, con, name):
    # crawl-family oracles are pinned to the driver's sf0.01 gate (their
    # SQL reads the sf0.01 sim-trace / corpus parquet paths baked in by
    # oracle_sql()), so run those queries at sf0.01 too
    sf = ("/root/testdata/sf0.01" if name.startswith("crawl_") else SF_DIR)
    got = _canon(_to_pandas(entrymod.queries()[name](sf)))
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(got[c].dtype, np.floating):
            assert np.allclose(a.astype(np.float64), b.astype(np.float64),
                               rtol=0, atol=1e-9), f"{name}.{c}"
        else:
            assert (a == b).all(), f"{name}.{c}"
