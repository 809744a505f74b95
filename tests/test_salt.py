"""Salting algebra: salted split/merge must be invisible for algebraic
aggregates (SURVEY.md §7.4)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data
from ray.data.aggregate import Min, Sum

from imtag_ray.stages.salt import salted_aggregate
from imtag_ray.util import dataset_to_numpy


def skewed_table(seed=100):
    rng = np.random.RandomState(seed)
    # one massive hub key + a power-law tail
    keys = np.concatenate(
        [np.zeros(20_000, dtype=np.int64), rng.zipf(1.8, 5_000) % 500]
    )
    vals = rng.randint(1, 100, size=len(keys)).astype(np.int64)
    return pa.table({"k": pa.array(keys), "v": pa.array(vals)})


@pytest.mark.parametrize("agg", ["sum", "min", "max"])
def test_salted_equals_unsalted(agg):
    tbl = skewed_table()
    ds = ray.data.from_arrow(tbl).repartition(8)
    salted = dataset_to_numpy(
        salted_aggregate(ds, "k", "v", agg=agg, n_salts=8), "k", "v"
    )
    import pandas as pd

    direct = tbl.to_pandas().groupby("k")["v"].agg(agg)
    got = dict(zip(salted["k"], salted["v"]))
    assert got == direct.to_dict()


def test_hot_key_only_salting():
    tbl = skewed_table()
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = dataset_to_numpy(
        salted_aggregate(
            ds, "k", "v", agg="sum", n_salts=8,
            hot_keys=np.array([0], dtype=np.int64),
        ),
        "k", "v",
    )
    import pandas as pd

    direct = tbl.to_pandas().groupby("k")["v"].sum()
    assert dict(zip(out["k"], out["v"])) == direct.to_dict()


def test_non_algebraic_rejected():
    ds = ray.data.from_arrow(skewed_table())
    with pytest.raises(ValueError):
        salted_aggregate(ds, "k", "v", agg="mean")
