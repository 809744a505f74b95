"""bucketed_aggregate must be result-identical to Ray's groupby
aggregation (it exists purely because Ray pays ~125µs per distinct
group — see util.bucketed_aggregate)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from imtag_ray.util import bucketed_aggregate, bucketed_sum_aggregate


def _mk(seed, n, nkeys, string_keys=False):
    rng = np.random.RandomState(seed)
    k = rng.randint(0, nkeys, n).astype(np.int64)
    t = pa.table(
        {
            "k": pa.array([f"u{v:05d}" for v in k], pa.string())
            if string_keys
            else pa.array(k, pa.int64()),
            "k2": pa.array(rng.randint(0, 3, n).astype(np.int64)),
            "v": pa.array(rng.randint(-50, 50, n).astype(np.int64)),
            "f": pa.array(rng.rand(n)),
        }
    )
    return ray.data.from_arrow(t).repartition(5)


def _sorted(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


@pytest.mark.parametrize("string_keys", [False, True])
def test_sum_count_matches_ray_groupby(string_keys):
    ds = _mk(0, 5000, 700, string_keys)
    ref = (
        ds.groupby("k")
        .aggregate(Sum("v", alias_name="v"), Count(alias_name="c"))
        .to_pandas()
    )
    got = bucketed_sum_aggregate(
        ds, key_cols=["k"], sum_cols=["v"], count_col="c", num_buckets=17
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(ref[["k", "v", "c"]], ["k"]),
        _sorted(got[["k", "v", "c"]], ["k"]),
        check_dtype=False,
    )


def test_min_max_multikey_matches_ray_groupby():
    ds = _mk(1, 4000, 500)
    ref = (
        ds.groupby(["k", "k2"])
        .aggregate(Min("v", alias_name="lo"), Max("v", alias_name="hi"))
        .to_pandas()
    )
    got = bucketed_aggregate(
        ds, key_cols=["k", "k2"],
        aggs=[("v", "min", "lo"), ("v", "max", "hi")],
        num_buckets=31,
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(ref[["k", "k2", "lo", "hi"]], ["k", "k2"]),
        _sorted(got[["k", "k2", "lo", "hi"]], ["k", "k2"]),
        check_dtype=False,
    )


def test_float_sum_close_and_distinct_exact():
    ds = _mk(2, 3000, 400)
    ref = ds.groupby("k").aggregate(Sum("f", alias_name="f")).to_pandas()
    got = bucketed_sum_aggregate(
        ds, key_cols=["k"], sum_cols=["f"], num_buckets=13
    ).to_pandas()
    ref, got = _sorted(ref, ["k"]), _sorted(got, ["k"])
    np.testing.assert_array_equal(ref["k"], got["k"])
    np.testing.assert_allclose(ref["f"], got["f"], rtol=0, atol=1e-9)
    # distinct (no aggs) returns just the keys
    dist = bucketed_sum_aggregate(ds, key_cols=["k"], sum_cols=[]).to_pandas()
    assert sorted(dist.columns) == ["k"]
    assert set(dist["k"]) == set(ref["k"])


def test_empty_input_yields_empty_output():
    t = pa.table(
        {"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
    )
    ds = ray.data.from_arrow(t)
    out = bucketed_sum_aggregate(ds, key_cols=["k"], sum_cols=["v"])
    assert out.count() == 0
