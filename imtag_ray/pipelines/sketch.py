"""HyperLogLog approximate distinct counting — the constant-memory
cardinality primitive a 100-TB pipeline uses where exact
count-distinct would shuffle every key.

Deterministic md5-based hashing makes the whole sketch EXACTLY
replayable in SQL (the oracle computes the identical estimate, not an
approximation of it):

- h = u64 from the first 16 hex chars of md5('hll:' + key)
- bucket = h % m (m = 2^p), rem = h >> p (64-p bits)
- rho = (64 - p) - bitlength(rem) + 1; rem == 0 → 64 - p + 1
- register M_j = max rho per bucket (0 for never-hit buckets)

The register SUM is kept in exact integer arithmetic — Σ 2^(-M_j) is
computed as Σ 2^(W - M_j) over python ints (W = 64 - p + 1), so
neither numpy's pairwise summation nor SQL's sequential summation can
diverge in the last ulp; the single float division afterwards has
identical operands on both sides.

Scale shape: per-batch partials reduce each block to ≤ m (bucket, rho)
rows, one groupby(bucket).Max over ≤ m keys, and a driver finale over
a CONSTANT-size (m-row) table — sketch size is independent of input
size, which is the entire point.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max

from ..util import dataset_to_numpy, table_from_arrays

HLL_P = 12
HLL_M = 1 << HLL_P


def hll_hash_u64(keys, prefix: str = "hll:") -> np.ndarray:
    return np.array(
        [
            int(hashlib.md5(f"{prefix}{k}".encode()).hexdigest()[:16], 16)
            for k in keys
        ],
        dtype=np.uint64,
    )


def _bitlength_u64(v: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (no float log)."""
    bl = np.zeros(len(v), dtype=np.int64)
    v = v.copy()
    while True:
        m = v > 0
        if not m.any():
            return bl
        bl[m] += 1
        v >>= np.uint64(1)


def hll_estimate_from_registers(reg: np.ndarray, p: int = HLL_P) -> float:
    """Registers (length 2^p int64, 0 = empty) → HLL estimate with the
    standard small-range linear-counting correction."""
    m = 1 << p
    W = 64 - p + 1
    # exact integer register sum: Σ 2^(-M_j) scaled by 2^W
    z_int = sum(1 << (W - int(r)) for r in reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e_raw = alpha * m * m * float(1 << W) / float(z_int)
    zeros = int((reg == 0).sum())
    if e_raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return e_raw


def hll_distinct(
    ds: "ray.data.Dataset", col: str, p: int = HLL_P,
    out_col: str = "n_distinct_hll",
) -> "ray.data.Dataset":
    """→ single-row Dataset (out_col DOUBLE): the HLL estimate of
    count(DISTINCT col)."""
    m = 1 << p
    maxrho = 64 - p + 1

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(col).to_numpy(zero_copy_only=False)
        h = hll_hash_u64(keys)
        bucket = (h % np.uint64(m)).astype(np.int64)
        rem = h >> np.uint64(p)
        rho = np.where(
            rem == 0, maxrho, (64 - p) - _bitlength_u64(rem) + 1
        ).astype(np.int64)
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, bucket, rho)
        seen = np.nonzero(reg)[0]
        return table_from_arrays(bucket=seen, rho=reg[seen])

    regs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="rho"))
    )
    # finale over a CONSTANT-size table (≤ 2^p rows)
    got = dataset_to_numpy(regs, "bucket", "rho")
    reg = np.zeros(m, dtype=np.int64)
    if len(got["bucket"]):
        reg[got["bucket"].astype(np.int64)] = got["rho"].astype(np.int64)
    est = hll_estimate_from_registers(reg, p)
    return ray.data.from_arrow(
        pa.table({out_col: pa.array([round(est, 3)], pa.float64())})
    )


def events_hll_users_q(sf_dir: str) -> "ray.data.Dataset":
    from ..util import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_distinct(ds, "user_id", out_col="n_users_hll")
