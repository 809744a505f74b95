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


def test_cms_upper_bound_and_blocks_invariant():
    from imtag_ray.pipelines.sketch import cms_counts, cms_estimate

    rng = np.random.RandomState(5)
    keys = rng.zipf(1.5, 5000).astype(np.int64) % 100
    true = {int(k): int((keys == k).sum()) for k in np.unique(keys)}
    probe = sorted(true)
    t = pa.table({"k": pa.array(keys)})
    m1 = cms_counts(ray.data.from_arrow(t).repartition(3), "k")
    m2 = cms_counts(ray.data.from_arrow(t).repartition(7), "k")
    np.testing.assert_array_equal(m1, m2)  # partitioning-invariant
    est = cms_estimate(m1, probe)
    for k, e in zip(probe, est):
        assert e >= true[k]  # CMS never undercounts
    # with width 1024 and only 100 keys, most estimates are exact
    exact = sum(int(e) == true[k] for k, e in zip(probe, est))
    assert exact >= 90


def test_bloom_semijoin_superset_and_invariant():
    from imtag_ray.pipelines.sketch import bloom_semijoin

    rng = np.random.RandomState(9)
    left_keys = rng.randint(0, 10000, 5000).astype(np.int64)
    right_keys = np.unique(rng.randint(0, 10000, 300).astype(np.int64))
    left = pa.table(
        {"rowid": pa.array(np.arange(5000, dtype=np.int64)),
         "k": pa.array(left_keys)}
    )
    right = pa.table({"k": pa.array(right_keys)})
    out = (
        bloom_semijoin(
            ray.data.from_arrow(left).repartition(4), "k",
            ray.data.from_arrow(right).repartition(3), "k",
        )
        .sort("rowid")
        .to_pandas()
    )
    passed = set(out["rowid"])
    true = {i for i, k in enumerate(left_keys) if k in set(right_keys)}
    assert true <= passed  # zero false negatives
    # 16384 bits / 300 keys / k=3 → false-positive rate well under 2%
    fp = len(passed - true)
    assert fp / 5000 < 0.02
    out2 = (
        bloom_semijoin(
            ray.data.from_arrow(left).repartition(7), "k",
            ray.data.from_arrow(right).repartition(1), "k",
        )
        .sort("rowid")
        .to_pandas()
    )
    assert list(out2["rowid"]) == list(out["rowid"])  # deterministic


def test_bloom_empty_build_side():
    from imtag_ray.pipelines.sketch import bloom_semijoin

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([], pa.int64())})
    out = bloom_semijoin(
        ray.data.from_arrow(left), "k", ray.data.from_arrow(right), "k"
    )
    assert out.count() == 0  # empty filter admits nothing


# --- per-group HLL ----------------------------------------------------------


def test_hll_by_group_matches_scalar_per_group():
    """Per-group registers must equal running hll on each group alone
    (same p), and estimates must be within HLL error of the truth."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from imtag_ray.pipelines.sketch import (
        _estimate_from_hist,
        hll_distinct_by_group,
        hll_hash_u64,
    )

    rng = np.random.default_rng(53)
    g = rng.integers(0, 5, size=4000).astype(np.int64) * 3_600_000_000
    k = rng.integers(0, 700, size=4000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"w": pa.array(g), "u": pa.array(k)})
    ).repartition(7)
    out = hll_distinct_by_group(ds, "w", "u", p=8, out_col="est").to_pandas()
    got = dict(zip(out["w"], out["est"]))

    p, m, W = 8, 256, 57
    for gv in sorted(set(g)):
        keys = k[g == gv]
        h = hll_hash_u64(keys)
        bucket = (h % np.uint64(m)).astype(np.int64)
        rem = h >> np.uint64(p)
        bl = np.array([int(x).bit_length() for x in rem])
        rho = np.where(rem == 0, W, 56 - bl + 1)
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, bucket, rho)
        hist = np.bincount(reg, minlength=W + 1)
        want = round(_estimate_from_hist(hist, p), 3)
        assert got[gv] == want, gv
        truth = len(set(keys.tolist()))
        assert abs(got[gv] - truth) / truth < 0.25  # p=8 ⇒ ~6.5% σ


def test_estimate_from_hist_equals_register_form():
    """_estimate_from_hist (vectorized-exact histogram form) must equal
    hll_estimate_from_registers bit-for-bit on random registers."""
    import numpy as np

    from imtag_ray.pipelines.sketch import (
        _estimate_from_hist,
        hll_estimate_from_registers,
    )

    rng = np.random.default_rng(59)
    for p in (8, 12):
        W = 64 - p + 1
        for _ in range(5):
            reg = rng.integers(0, W + 1, size=1 << p).astype(np.int64)
            hist = np.bincount(reg, minlength=W + 1)
            assert _estimate_from_hist(hist, p) == \
                hll_estimate_from_registers(reg, p)
