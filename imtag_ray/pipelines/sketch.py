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


def events_hll_hourly_q(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling-window distinct-user sketches: per 1-hour event-time
    window, the HLL (p=8) estimate of distinct users →
    (window_start, n_users_hll) — the streaming-dashboard op where the
    exact distinct would reshuffle every (window, user) pair."""
    import pyarrow.compute as pc

    from ..util import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def add_window(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())
        hour = pc.multiply(pc.divide(ts, 3_600_000_000), 3_600_000_000)
        return pa.table({"wstart_us": hour, "user_id": t["user_id"]})

    out = hll_distinct_by_group(
        ds.map_batches(add_window, batch_format="pyarrow"),
        "wstart_us", "user_id", p=8, out_col="n_users_hll",
    )
    return out.map_batches(
        lambda t: pa.table(
            {"window_start": t["wstart_us"].cast(pa.timestamp("us")),
             "n_users_hll": t["n_users_hll"]}
        ),
        batch_format="pyarrow",
    ).sort("window_start")


def hll_distinct_by_group(
    ds: "ray.data.Dataset", group_col: str, col: str, p: int = 8,
    out_col: str = "n_distinct_hll",
) -> "ray.data.Dataset":
    """Per-GROUP HLL distinct counts → Dataset (group_col, out_col):
    the windowed form of hll_distinct (sliding/tumbling distinct-user
    counts, per-shard cardinality profiles). Same exact-integer
    replayability contract; ``group_col`` must be int-typed (pass
    epoch-µs window starts, not date types — the bucketed exchange
    needs hashable Arrow ints).

    Scale shape: per-batch partials collapse each block to
    ≤ groups·2^p (group, bucket, rho) rows; ONE bucketed (group,
    bucket) max; then per-group finales run DISTRIBUTED — re-bucketed
    by group hash, each coarse bucket reducing its groups' register
    histograms vectorized (no driver register table at any group
    count)."""
    from ..util import _mix_to_bucket, bucketed_aggregate

    m = 1 << p
    maxrho = 64 - p + 1

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(col).to_numpy(zero_copy_only=False)
        g = t.column(group_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if not len(keys):
            return table_from_arrays(
                **{group_col: np.array([], np.int64)},
                bucket=np.array([], np.int64),
                rho=np.array([], np.int64),
            )
        h = hll_hash_u64(keys)
        bucket = (h % np.uint64(m)).astype(np.int64)
        rem = h >> np.uint64(p)
        rho = np.where(
            rem == 0, maxrho, (64 - p) - _bitlength_u64(rem) + 1
        ).astype(np.int64)
        ug, gi = np.unique(g, return_inverse=True)
        reg = np.zeros(len(ug) * m, dtype=np.int64)
        np.maximum.at(reg, gi * m + bucket, rho)
        nz = np.nonzero(reg)[0]
        return table_from_arrays(
            **{group_col: ug[nz // m]}, bucket=nz % m, rho=reg[nz]
        )

    agg = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        key_cols=[group_col, "bucket"],
        aggs=[("rho", "max", "rho")],
    )

    def group_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", pa.array(
            _mix_to_bucket(
                [t.column(group_col).to_numpy(zero_copy_only=False)
                 .astype(np.int64)], 256
            )
        ))

    def finale(block: pa.Table, _p=p) -> pa.Table:
        import pandas as pd

        W = 64 - _p + 1
        mm = 1 << _p
        df = pd.DataFrame(
            {"g": block.column(group_col).to_numpy(zero_copy_only=False)
             .astype(np.int64),
             "rho": block.column("rho").to_numpy(zero_copy_only=False)
             .astype(np.int64)}
        )
        gs, ests = [], []
        for gv, sub in df.groupby("g", sort=True):
            cnt = np.bincount(sub["rho"].to_numpy(), minlength=W + 1)
            n_present = int(cnt[1:].sum())
            reg_hist = cnt.copy()
            reg_hist[0] = mm - n_present  # empty registers
            est = _estimate_from_hist(reg_hist, _p)
            gs.append(int(gv))
            ests.append(round(est, 3))
        return pa.table(
            {group_col: pa.array(gs, pa.int64()),
             out_col: pa.array(ests, pa.float64())}
        )

    return (
        agg.map_batches(group_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(finale, batch_format="pyarrow")
    )


def _estimate_from_hist(reg_hist: np.ndarray, p: int) -> float:
    """HLL estimate from a register-VALUE histogram (index = rho,
    value = #registers) — the vectorized-exact form of
    hll_estimate_from_registers (identical arithmetic: python-int z,
    one float division, linear-counting branch)."""
    m = 1 << p
    W = 64 - p + 1
    z_int = sum(int(c) << (W - r) for r, c in enumerate(reg_hist) if c)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e_raw = alpha * m * m * float(1 << W) / float(z_int)
    zeros = int(reg_hist[0])
    if e_raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return e_raw


# --- Count-Min sketch ---------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_hash_cells(keys, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """(len(keys), depth) int64 cell columns: md5(f'cms{r}:{key}')
    first-16-hex u64 % width per row r."""
    out = np.empty((len(keys), depth), dtype=np.int64)
    for i, k in enumerate(keys):
        for r in range(depth):
            h = int(
                hashlib.md5(f"cms{r}:{k}".encode()).hexdigest()[:16], 16
            )
            out[i, r] = h % width
    return out


def cms_counts(
    ds: "ray.data.Dataset", col: str,
    depth: int = CMS_DEPTH, width: int = CMS_WIDTH,
) -> np.ndarray:
    """Count-Min sketch of `col` → (depth, width) int64 counter matrix.
    Per-batch partials collapse each block to ≤ depth·width rows, one
    cell-Sum groupby, and a CONSTANT-size driver finale — sketch size
    independent of input size (the scale point, as with HLL)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(col).to_numpy(zero_copy_only=False)
        mat = np.zeros((depth, width), dtype=np.int64)
        if len(keys):
            cells = cms_hash_cells(keys, depth, width)
            for r in range(depth):
                np.add.at(mat[r], cells[:, r], 1)
        flat = mat.ravel()
        nz = np.nonzero(flat)[0]
        return table_from_arrays(cell=nz, c=flat[nz])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("c", alias_name="c"))
    )
    got = dataset_to_numpy(agg, "cell", "c")
    mat = np.zeros(depth * width, dtype=np.int64)
    if len(got["cell"]):
        mat[got["cell"].astype(np.int64)] = got["c"].astype(np.int64)
    return mat.reshape(depth, width)


def cms_estimate(mat: np.ndarray, keys) -> np.ndarray:
    """Point-query the sketch: min over rows (int64, exact overcount)."""
    depth, width = mat.shape
    cells = cms_hash_cells(keys, depth, width)
    ests = np.stack([mat[r][cells[:, r]] for r in range(depth)])
    return ests.min(axis=0)


def events_cms_types_q(sf_dir: str) -> "ray.data.Dataset":
    """CMS-estimated count per distinct event_type (probed against the
    sketch — integer-exact, so the SQL oracle reproduces every
    overcount bit-for-bit)."""
    from ..util import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type"])
    mat = cms_counts(ds, "event_type")
    # probe keys: the distinct types (small domain), distributed distinct
    types = sorted(
        dataset_to_numpy(
            ds.groupby("event_type").count(), "event_type"
        )["event_type"]
    )
    est = cms_estimate(mat, types)
    return ray.data.from_arrow(
        pa.table(
            {"event_type": pa.array([str(t) for t in types], pa.string()),
             "cms_count": pa.array(est, pa.int64())}
        )
    )


# --- Bloom-filter semi-join ----------------------------------------------------

BF_BITS = 16384
BF_K = 3


def bloom_positions(keys, k: int = BF_K, m: int = BF_BITS) -> np.ndarray:
    """(len(keys), k) int64 bit positions: md5(f'bf{i}:{key}')
    first-16-hex u64 % m per hash i."""
    out = np.empty((len(keys), k), dtype=np.int64)
    for j, key in enumerate(keys):
        for i in range(k):
            h = int(
                hashlib.md5(f"bf{i}:{key}".encode()).hexdigest()[:16], 16
            )
            out[j, i] = h % m
    return out


def bloom_build(
    ds: "ray.data.Dataset", col: str, k: int = BF_K, m: int = BF_BITS
) -> np.ndarray:
    """Build-side: → bool bitmap (length m). Per-batch partials emit
    DISTINCT set positions (≤ m rows per block), one distinct groupby,
    constant-size driver finale — like HLL/CMS, the sketch is
    independent of build-side size."""
    from ray.data.aggregate import Count

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(col).to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table({"bit": pa.array([], pa.int64())})
        pos = np.unique(bloom_positions(keys, k, m).ravel())
        return table_from_arrays(bit=pos)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bit")
        .aggregate(Count(alias_name="_c"))
    )
    got = dataset_to_numpy(agg, "bit")
    bitmap = np.zeros(m, dtype=bool)
    if len(got["bit"]):
        bitmap[got["bit"].astype(np.int64)] = True
    return bitmap


def bloom_semijoin(
    left: "ray.data.Dataset", left_col: str,
    right: "ray.data.Dataset", right_col: str,
    k: int = BF_K, m: int = BF_BITS,
) -> "ray.data.Dataset":
    """Keep left rows whose key MAY be in the right key set (bloom
    membership: deterministic false positives, zero false negatives) —
    the broadcast pre-filter that prunes a big probe side before an
    exact join without shuffling it. The bitmap ships once via
    ray.put."""
    bitmap = bloom_build(right, right_col, k, m)
    ref = ray.put(bitmap)

    def probe(t: pa.Table, _ref=ref) -> pa.Table:
        bm = ray.get(_ref)
        keys = t.column(left_col).to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return t
        pos = bloom_positions(keys, k, m)
        mask = np.ones(len(keys), dtype=bool)
        for i in range(k):
            mask &= bm[pos[:, i]]
        return t.filter(pa.array(mask))

    return left.map_batches(probe, batch_format="pyarrow")


def events_bloom_hot_users_q(sf_dir: str) -> "ray.data.Dataset":
    """Events whose user passes the bloom filter of high-balance
    customers (bloom semi-join: exact oracle replays the identical
    bit positions, INCLUDING any false positives)."""
    import pyarrow.compute as pc

    from ..util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 9000.0)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    out = bloom_semijoin(ev, "user_id", cust, "c_custkey").sort("event_id")
    if out.count() == 0:
        # typed empty: Ray's to_pandas() drops all columns of a
        # zero-row Dataset (documented engine-wide empty-result rule)
        return pa.table(
            {"event_id": pa.array([], pa.int64()),
             "user_id": pa.array([], pa.int64())}
        )
    return out
