"""HyperLogLog: partitioning invariance, accuracy sanity, and exact
agreement with a scalar python reference."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from imtag_ray.pipelines.sketch import (
    HLL_M,
    HLL_P,
    hll_distinct,
    hll_estimate_from_registers,
)


def hll_ref(keys, p=HLL_P):
    m = 1 << p
    reg = [0] * m
    for k in set(keys):
        h = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:16], 16)
        b = h % m
        rem = h >> p
        rho = (64 - p + 1) if rem == 0 else (64 - p) - rem.bit_length() + 1
        reg[b] = max(reg[b], rho)
    return hll_estimate_from_registers(np.array(reg, dtype=np.int64), p)


def run_hll(keys, blocks):
    t = pa.table({"k": pa.array(list(keys), pa.int64())})
    out = hll_distinct(
        ray.data.from_arrow(t).repartition(blocks), "k"
    ).to_pandas()
    return float(out["n_distinct_hll"].iloc[0])


def test_hll_matches_scalar_reference_and_blocks_invariant():
    rng = np.random.RandomState(3)
    keys = rng.randint(0, 5000, 20000)  # heavy duplication
    want = round(hll_ref(keys), 3)
    assert run_hll(keys, 4) == want
    assert run_hll(keys, 9) == want  # partitioning-invariant


def test_hll_accuracy():
    # p=12 → typical error ~1.04/sqrt(4096) ≈ 1.6%; allow 5%
    n = 30000
    keys = np.arange(n)
    est = run_hll(keys, 6)
    assert abs(est - n) / n < 0.05


def test_hll_small_cardinality_linear_counting():
    keys = list(range(17)) * 10
    est = run_hll(np.array(keys), 3)
    assert abs(est - 17) < 1.0  # linear counting is near-exact here


def test_hll_empty():
    t = pa.table({"k": pa.array([], pa.int64())})
    out = hll_distinct(ray.data.from_arrow(t), "k").to_pandas()
    # all-zero registers → linear counting with zeros = m → ln(1) = 0
    assert float(out["n_distinct_hll"].iloc[0]) == 0.0
