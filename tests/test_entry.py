"""Driver-contract validation: entry() smoke + per-query side-by-side
against the DuckDB oracles at sf0.001 (the driver's own gate runs the
same comparison at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# every queries() entry now has a full DuckDB oracle (round 2 closed
# the minhash/simhash/ngram/ivf gaps with exact hash-scheme replays)
SQL_ONLY_ROWS: set = set()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def to_pandas(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke():
    out = entrymod.entry()
    df = to_pandas(out)
    assert len(df) > 0
    assert {"vid", "url", "component_id", "rank", "out_degree"} <= set(df.columns)
    assert df["rank"].sum() == pytest.approx(1.0, abs=1e-6)


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert set(q) - set(o) == SQL_ONLY_ROWS


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(name, con):
    ours = canon(to_pandas(entrymod.queries()[name](SF)))
    theirs = canon(con.execute(entrymod.oracle_sql()[name]).fetch_df())
    assert list(ours.columns) == list(theirs.columns), (
        ours.columns, theirs.columns,
    )
    assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)}"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False)


