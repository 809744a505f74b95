"""MinHash + LSH near-duplicate detection (ray_guide 'Near-dup').

Pipeline (fully distributed — no O(corpus) driver state):

    shingle table (doc_id, sorted unique 64-bit shingle hashes)
      → per-batch vectorized minhash signatures (exact universal hash
        (sh·a + b) mod 2^61−1 in 64-bit limb arithmetic, NOT wraparound)
      → (doc_id, band, band_key) rows
      → groupby(band, band_key) buckets → candidate pairs Dataset
      → exact-Jaccard verification as a double join of the exploded
        shingle table on id_a / id_b (groupby count = |A∩B|)
      → pairs with jaccard ≥ threshold.

Because the permutation hash is the true mod-prime universal hash, a
DuckDB oracle can replay the entire scheme exactly in HUGEINT
arithmetic (see __ray_entry__.oracle_sql['minhash_pairs']).

All hashing is seeded/deterministic (no Python hash()).
"""

from __future__ import annotations

import functools
import hashlib
import itertools
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max

from ..util import col_np, compact_nonempty, table_from_arrays

_WS = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1
_M61 = np.uint64(_MERSENNE)
_MASK32 = np.uint64(0xFFFFFFFF)
_MASK29 = np.uint64((1 << 29) - 1)

DEFAULT_NUM_PERM = 128
DEFAULT_BANDS = 16
DEFAULT_SHINGLE_K = 3
DEFAULT_SEED = 100


def _red61(v: np.ndarray) -> np.ndarray:
    """Reduce v < 2^64 fully mod 2^61−1 (one fold + conditional subtract)."""
    v = (v & _M61) + (v >> np.uint64(61))
    return np.where(v >= _M61, v - _M61, v)


def mulmod61(x: np.ndarray, a: np.ndarray) -> np.ndarray:
    """(x · a) mod 2^61−1 exactly for x uint64 (any), a < 2^61 — 32-bit
    limb decomposition, no wraparound (the ADVICE fix: the previous
    overflow-and-ignore version was not a universal hash)."""
    x = np.asarray(x, dtype=np.uint64)
    a = np.asarray(a, dtype=np.uint64)
    x_lo, x_hi = x & _MASK32, x >> np.uint64(32)
    a_lo, a_hi = a & _MASK32, a >> np.uint64(32)
    # x·a = hh·2^64 + (m1+m2)·2^32 + ll ; 2^64 ≡ 8, 2^61 ≡ 1 (mod M)
    ll = _red61(x_lo * a_lo)                       # < 2^64 ✓
    hh = _red61((x_hi * a_hi) << np.uint64(3))     # x_hi·a_hi < 2^61 ✓
    m = _red61(x_hi * a_lo) + _red61(x_lo * a_hi)  # < 2^62
    m = np.where(m >= _M61, m - _M61, m)
    # m·2^32 ≡ (m >> 29) + ((m & (2^29−1)) << 32)   (since 2^61 ≡ 1)
    mid = _red61((m >> np.uint64(29)) + ((m & _MASK29) << np.uint64(32)))
    s = ll + hh
    s = np.where(s >= _M61, s - _M61, s)
    s = s + mid
    return np.where(s >= _M61, s - _M61, s)


def perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def token_shingles(text: str, k: int) -> np.ndarray:
    """Sorted unique 64-bit hashes (md5 first 8 bytes, big-endian) of
    k-token shingles."""
    toks = _WS.split(text.strip()) if text and text.strip() else []
    if not toks:
        return np.empty(0, dtype=np.uint64)
    if len(toks) < k:
        shingles = [" ".join(toks)]
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    vals = np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )
    return np.unique(vals)


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique hash arrays (scalar reference for
    tests; the distributed path computes the same ratio via joins)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def signature_of_text(
    text: str, num_perm: int = DEFAULT_NUM_PERM, shingle_k: int = DEFAULT_SHINGLE_K,
    seed: int = DEFAULT_SEED,
) -> np.ndarray:
    """Scalar minhash signature (tests / docs)."""
    sh = token_shingles(text, shingle_k)
    if len(sh) == 0:
        return np.full(num_perm, _MERSENNE, dtype=np.uint64)
    a, b = perm_params(num_perm, seed)
    hashed = mulmod61(sh[:, None], a[None, :]) + b[None, :]
    hashed = np.where(hashed >= _M61, hashed - _M61, hashed)
    return hashed.min(axis=0)


class Shingler:
    """Actor-pool stage: (id, text) batch → (doc_id, shingles list<u64>)."""

    def __init__(self, id_col: str, text_col: str, k: int):
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = col_np(batch, self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        shingles = [token_shingles(t or "", self.k) for t in texts]
        offsets = np.zeros(len(shingles) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in shingles], out=offsets[1:])
        flat = (
            np.concatenate(shingles)
            if shingles
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shingles": pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(flat, pa.uint64())
                ),
            }
        )


@functools.lru_cache(maxsize=8)
def _cached_shingler(id_col: str, text_col: str, k: int) -> Shingler:
    return Shingler(id_col, text_col, k)


def _shingle_batch(batch: pa.Table, *, id_col: str, text_col: str, k: int) -> pa.Table:
    """Task-pool form of Shingler: the 'state' (two column names and an
    int) costs nothing to build, so a long-lived actor pool would pay
    multi-second actor spin-up per pipeline for no amortization — the
    worker-process-cached instance gives the same per-batch path."""
    return _cached_shingler(id_col, text_col, k)(batch)


def shingle_table(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    shingle_k: int = DEFAULT_SHINGLE_K, concurrency: int | tuple = 4,
) -> "ray.data.Dataset":
    return ds.select_columns([id_col, text_col]).map_batches(
        _shingle_batch,
        fn_kwargs={"id_col": id_col, "text_col": text_col, "k": shingle_k},
        batch_format="pyarrow", batch_size=512,
    )


def _list_column_arrays(batch: pa.Table, name: str):
    """Zero-copy (offsets, flat values) view of a list column."""
    arr = batch.column(name)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = arr.values.to_numpy(zero_copy_only=False)
    return offsets, values


def _band_mix(sig_chunk: np.ndarray) -> np.ndarray:
    """(B, rows) uint64 → (B,) uint64 order-sensitive mixing key.
    Equal chunks ⇔ equal keys (collisions ~2^-64 only ADD candidates,
    which exact verification then filters)."""
    h = np.zeros(sig_chunk.shape[0], dtype=np.uint64)
    C = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for r in range(sig_chunk.shape[1]):
            h = h * C + sig_chunk[:, r]
        # fmix64 finalizer
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


class SignatureBander:
    """Actor-pool stage: shingle-table batch → (doc_id, band, band_key)
    rows. Perm params generated once per actor; the whole batch is
    vectorized through reduceat (no per-row Python loop)."""

    def __init__(self, num_perm: int = DEFAULT_NUM_PERM,
                 bands: int = DEFAULT_BANDS, seed: int = DEFAULT_SEED):
        assert num_perm % bands == 0
        self.num_perm, self.bands = num_perm, bands
        self.rows = num_perm // bands
        self.a, self.b = perm_params(num_perm, seed)

    def signatures(self, offsets: np.ndarray, flat: np.ndarray) -> np.ndarray:
        """(B+1,) offsets + (N,) shingle hashes → (B, num_perm) minima.
        Empty docs get the sentinel 2^61−1 (never produced by the hash)."""
        B = len(offsets) - 1
        sig = np.full((B, self.num_perm), _MERSENNE, dtype=np.uint64)
        if len(flat) == 0:
            return sig
        hashed = mulmod61(flat[:, None], self.a[None, :]) + self.b[None, :]
        hashed = np.where(hashed >= _M61, hashed - _M61, hashed)  # (N, P)
        starts = offsets[:-1]
        nonempty = np.flatnonzero(np.diff(offsets) > 0)
        mins = np.minimum.reduceat(hashed, starts[nonempty], axis=0)
        sig[nonempty] = mins
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = col_np(batch, "doc_id")
        offsets, flat = _list_column_arrays(batch, "shingles")
        sig = self.signatures(offsets, flat)
        B = len(ids)
        keys = np.empty((B, self.bands), dtype=np.uint64)
        for bnd in range(self.bands):
            keys[:, bnd] = _band_mix(
                sig[:, bnd * self.rows : (bnd + 1) * self.rows]
            )
        # band_key is emitted int64-reinterpreted (bijective): uint64
        # values above 2^63 make Ray's sort-shuffle groupby fall back to
        # pickled-object blocks (same reason as exploded_shingles.h).
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), B),
                    pa.int32(),
                ),
                "band_key": pa.array(
                    keys.reshape(-1).view(np.int64), pa.int64()
                ),
            }
        )


@functools.lru_cache(maxsize=8)
def _cached_bander(num_perm: int, bands: int, seed: int) -> "SignatureBander":
    return SignatureBander(num_perm, bands, seed)


def _band_batch(batch: pa.Table, *, num_perm: int, bands: int, seed: int) -> pa.Table:
    """Task-pool form of SignatureBander — the perm params are 2×num_perm
    random ints (microseconds to build), so actor-pool spin-up (seconds)
    would dominate; the instance is cached per worker process instead."""
    return _cached_bander(num_perm, bands, seed)(batch)


def _pairs_of_bucket(group: pa.Table) -> pa.Table:
    ids = np.sort(col_np(group, "doc_id"))
    if len(ids) < 2:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
    ia, ib = np.triu_indices(len(ids), k=1)
    return pa.table(
        {"id_a": pa.array(ids[ia], pa.int64()),
         "id_b": pa.array(ids[ib], pa.int64())}
    )


def _pairs_of_band_block(g: pa.Table) -> pa.Table:
    """Vectorized pair expansion for ONE coarse hash bucket holding MANY
    (band, band_key) LSH buckets: one lexsort, segment boundaries, then
    a triu expansion per distinct segment size — the per-LSH-bucket
    map_groups form paid Ray's per-group overhead n_docs×bands times."""
    band = col_np(g, "band").astype(np.int64)
    key = col_np(g, "band_key").astype(np.int64)
    doc = col_np(g, "doc_id").astype(np.int64)
    order = np.lexsort((doc, key, band))
    b, k, dv = band[order], key[order], doc[order]
    n = len(b)
    bound = np.zeros(n, dtype=bool)
    bound[0] = True
    bound[1:] = (b[1:] != b[:-1]) | (k[1:] != k[:-1])
    starts = np.flatnonzero(bound)
    sizes = np.diff(np.append(starts, n))
    parts_a: list = []
    parts_b: list = []
    for c in np.unique(sizes):
        if c < 2:
            continue
        idx = np.flatnonzero(sizes == c)
        mat = dv[starts[idx][:, None] + np.arange(int(c))[None, :]]
        ia, ib = np.triu_indices(int(c), 1)
        # doc ids ascend within a segment (lexsort innermost) → a < b
        parts_a.append(mat[:, ia].ravel())
        parts_b.append(mat[:, ib].ravel())
    if not parts_a:
        return pa.table(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64())}
        )
    return pa.table(
        {"id_a": pa.array(np.concatenate(parts_a), pa.int64()),
         "id_b": pa.array(np.concatenate(parts_b), pa.int64())}
    )


def minhash_candidates(
    sh_ds: "ray.data.Dataset",
    num_perm: int = DEFAULT_NUM_PERM, bands: int = DEFAULT_BANDS,
    seed: int = DEFAULT_SEED, concurrency: int | tuple = 4,
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """Shingle table → DISTINCT candidate pair Dataset (id_a < id_b).
    Stays a Dataset end-to-end: coarse-bucket shuffle (LSH-bucket
    cardinality is ~n_docs×bands — far beyond Ray's per-group groupby
    budget, see util.bucketed_sum_aggregate), vectorized per-block pair
    expansion, distinct via the same bucketed reduction."""
    from ..util import _mix_to_bucket, bucketed_sum_aggregate

    bucketed = sh_ds.map_batches(
        _band_batch,
        fn_kwargs={"num_perm": num_perm, "bands": bands, "seed": seed},
        batch_format="pyarrow", batch_size=512,
    )

    def coarse(t: pa.Table, _nb=num_buckets) -> pa.Table:
        keys = [
            col_np(t, "band").astype(np.int64),
            col_np(t, "band_key").astype(np.int64),
        ]
        return t.append_column(
            "__bucket", pa.array(_mix_to_bucket(keys, _nb))
        )

    pairs = (
        bucketed.map_batches(coarse, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_pairs_of_band_block, batch_format="pyarrow")
    )
    return bucketed_sum_aggregate(
        pairs, key_cols=["id_a", "id_b"], sum_cols=[],
        num_buckets=num_buckets,
    )


def exploded_shingles(sh_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, shingles list) → (doc_id, h) one row per shingle hash.

    h is the uint64 md5 prefix REINTERPRETED as int64 (bijective): Ray's
    sort-shuffle groupby round-trips key columns through Python ints and
    falls back to pickled-object blocks for values above 2^63."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = col_np(batch, "doc_id")
        offsets, flat = _list_column_arrays(batch, "shingles")
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(ids, np.diff(offsets)), pa.int64()
                ),
                "h": pa.array(flat.view(np.int64), pa.int64()),
            }
        )

    return sh_ds.map_batches(explode, batch_format="pyarrow")


# Above this many shingle-less documents the both-empty add-back falls
# back to joins instead of a broadcast id set (adversarial corpora only;
# the all-empty corpus is short-circuited before this matters).
EMPTY_BROADCAST_MAX = 1_000_000

_EMPTY_PAIRS = pa.table(
    {"id_a": pa.array([], pa.int64()),
     "id_b": pa.array([], pa.int64()),
     "jaccard": pa.array([], pa.float64())}
)


def _pairs_with_ones(cand: "ray.data.Dataset", threshold: float):
    """Candidates → (id_a, id_b, jaccard=1.0), threshold-gated."""

    def all_ones(t: pa.Table, _t=threshold) -> pa.Table:
        keep = np.ones(t.num_rows, dtype=bool) if _t <= 1.0 else \
            np.zeros(t.num_rows, dtype=bool)
        return pa.table(
            {"id_a": t.column("id_a").filter(pa.array(keep)),
             "id_b": t.column("id_b").filter(pa.array(keep)),
             "jaccard": pa.array(np.ones(int(keep.sum())), pa.float64())}
        )

    return cand.map_batches(all_ones, batch_format="pyarrow")


def _both_empty_pairs(
    cand: "ray.data.Dataset", sh_ds: "ray.data.Dataset",
    threshold: float, num_partitions: int,
):
    """Candidate pairs whose docs BOTH have zero shingles (J = 1 by the
    both-empty convention) — these produce no rows through the join path
    and must be added back. Returns a Dataset or None.

    Common case (no empty docs) costs one counting pass over the
    already-materialized shingle table and nothing else. Small empty
    sets ship once via ray.put; adversarially-large ones (rare) fall
    back to two inner joins."""

    def emptied(t: pa.Table) -> pa.Table:
        offsets, _ = _list_column_arrays(t, "shingles")
        ids = col_np(t, "doc_id")[np.diff(offsets) == 0]
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    empt = sh_ds.map_batches(emptied, batch_format="pyarrow")
    n_empty = empt.count()
    if n_empty == 0:
        return None
    if n_empty <= EMPTY_BROADCAST_MAX:
        ids_ref = ray.put(
            frozenset(r["doc_id"] for r in empt.take_all())
        )

        def both_in(t: pa.Table, _ref=ids_ref) -> pa.Table:
            es = ray.get(_ref)
            ia, ib = col_np(t, "id_a"), col_np(t, "id_b")
            keep = np.fromiter(
                ((a in es) and (b in es) for a, b in zip(ia.tolist(), ib.tolist())),
                dtype=bool, count=len(ia),
            )
            return pa.table(
                {"id_a": pa.array(ia[keep], pa.int64()),
                 "id_b": pa.array(ib[keep], pa.int64())}
            )

        both = compact_nonempty(
            cand.map_batches(both_in, batch_format="pyarrow")
        )
    else:  # huge empty set: keep it distributed
        empt = compact_nonempty(empt)
        on_a = compact_nonempty(
            cand.join(
                empt, join_type="inner", num_partitions=num_partitions,
                on=("id_a",), right_on=("doc_id",),
            ).select_columns(["id_a", "id_b"])
        )
        both = (
            compact_nonempty(
                on_a.join(
                    empt.rename_columns({"doc_id": "d_"}),
                    join_type="inner", num_partitions=num_partitions,
                    on=("id_b",), right_on=("d_",),
                ).select_columns(["id_a", "id_b"])
            )
            if on_a is not None
            else None
        )
    if both is None:
        return None
    return _pairs_with_ones(both, threshold)


def verify_pairs_jaccard(
    cand: "ray.data.Dataset", sh_ds: "ray.data.Dataset",
    threshold: float, num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of candidate pairs — ONE distributed
    join plus two groupby aggregations (replaces round-2's 5-join
    chain; each join stage spun up its own shuffle actor pool, which
    dominated wall-clock at small scale and tripled exchange volume at
    large scale):

        (id_a, id_b) × {a side, b side} → (id_a, id_b, doc_id)
          ⋈ exploded shingles (doc_id, h) → (id_a, id_b, h) multiset
          groupby(id_a, id_b, h).count()  → multiplicity c ∈ {1, 2}
          groupby(id_a, id_b)             → union = #distinct h,
                                            inter = #(c == 2)
          J = inter / union.

    Shingle sets are unique per doc, so each (pair, h) row count is 1
    (one side) or 2 (both sides): |A∩B| = #(c=2) and |A∪B| = #distinct.
    Pairs whose docs are BOTH shingle-less vanish from the join and are
    added back with J = 1 (the both-empty convention); one-empty pairs
    survive with inter = 0 → J = 0, as exact Jaccard requires.
    """
    P = num_partitions
    # compact_nonempty on EVERY join input: a zero-row first block on
    # either side silences Ray 2.49's one-shot schema broadcast and the
    # join dies on skew-emptied partitions (see util.compact_nonempty)
    ex = compact_nonempty(exploded_shingles(sh_ds))
    if ex is None:
        # every document is shingle-less (empty/whitespace/None text):
        # every candidate has |A|=|B|=0 → J = 1. Short-circuit.
        return _pairs_with_ones(cand, threshold)
    cand = compact_nonempty(cand)
    if cand is None:
        return ray.data.from_arrow(_EMPTY_PAIRS)

    def explode_pairs(t: pa.Table) -> pa.Table:
        ia, ib = col_np(t, "id_a"), col_np(t, "id_b")
        return pa.table(
            {
                "id_a": pa.array(np.concatenate([ia, ia]), pa.int64()),
                "id_b": pa.array(np.concatenate([ib, ib]), pa.int64()),
                "doc_id": pa.array(np.concatenate([ia, ib]), pa.int64()),
            }
        )

    sides = compact_nonempty(
        cand.map_batches(explode_pairs, batch_format="pyarrow")
    )
    # The single join is materialized (compact_nonempty materializes) so
    # every streaming execution holds at most ONE JoinOperator —
    # multiple join actor-pools fused into one plan can deadlock under a
    # small CPU budget (observed on ray 2.49 local mode).
    joined = compact_nonempty(
        sides.join(
            ex.rename_columns({"doc_id": "d_"}),
            join_type="inner", num_partitions=P,
            on=("doc_id",), right_on=("d_",),
        ).select_columns(["id_a", "id_b", "h"])
    )
    verified = None
    if joined is not None:
        from ..util import bucketed_sum_aggregate

        def mark_inter(t: pa.Table) -> pa.Table:
            c = col_np(t, "c")
            n = t.num_rows
            return pa.table(
                {
                    "id_a": t.column("id_a"),
                    "id_b": t.column("id_b"),
                    "u": pa.array(np.ones(n, dtype=np.int64)),
                    "i": pa.array((c == 2).astype(np.int64)),
                }
            )

        def jaccard(t: pa.Table, _t=threshold) -> pa.Table:
            union = np.asarray(col_np(t, "u"), dtype=np.float64)
            inter = np.asarray(col_np(t, "i"), dtype=np.float64)
            j = np.where(union > 0, inter / np.maximum(union, 1.0), 1.0)
            keep = j >= _t
            return pa.table(
                {
                    "id_a": pa.array(col_np(t, "id_a")[keep], pa.int64()),
                    "id_b": pa.array(col_np(t, "id_b")[keep], pa.int64()),
                    "jaccard": pa.array(j[keep], pa.float64()),
                }
            )

        # both aggregations are bucketed: (pair, h) cardinality is the
        # joined row count itself — Ray's per-group groupby overhead
        # would dominate (util.bucketed_sum_aggregate)
        per_h = bucketed_sum_aggregate(
            joined, key_cols=["id_a", "id_b", "h"], sum_cols=[],
            num_buckets=P * 32, count_col="c",
        )
        verified = bucketed_sum_aggregate(
            per_h.map_batches(mark_inter, batch_format="pyarrow"),
            key_cols=["id_a", "id_b"], sum_cols=["u", "i"],
            num_buckets=P * 32,
        ).map_batches(jaccard, batch_format="pyarrow")

    extra = _both_empty_pairs(cand, sh_ds, threshold, P)
    parts = [p for p in (verified, extra) if p is not None]
    if not parts:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    return parts[0] if len(parts) == 1 else parts[0].union(parts[1])


def minhash_dup_pairs(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    threshold: float = 0.8, num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS, shingle_k: int = DEFAULT_SHINGLE_K,
    seed: int = DEFAULT_SEED, concurrency: int | tuple = 4,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """→ Dataset (id_a, id_b, jaccard) of LSH candidates whose EXACT
    shingle-set Jaccard ≥ threshold, sorted by (id_a, id_b)."""
    sh_ds = shingle_table(ds, id_col, text_col, shingle_k, concurrency)
    sh_ds = sh_ds.materialize()  # reused by bucketing AND verification
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    # NOTE empty results return the typed pa.Table itself: Ray's
    # to_pandas() drops ALL columns for a zero-row Dataset even when
    # Dataset.schema() is correct, which breaks schema comparisons.
    cand = minhash_candidates(
        sh_ds, num_perm, bands, seed, concurrency
    ).materialize()
    if cand.count() == 0:  # no bucket collisions anywhere → typed empty
        return empty
    verified = verify_pairs_jaccard(
        cand, sh_ds, threshold, num_partitions
    ).materialize()
    if verified.count() == 0:  # every candidate verified below threshold
        return empty
    return verified.sort(["id_a", "id_b"])


def survivors_from_pairs(
    all_ids: np.ndarray, pairs: "pa.Table"
) -> np.ndarray:
    """Union-find over the dup-pair graph (min id survives per dup
    cluster — the same lt_cmp/min-label rule as pipelines.cc, ref
    src/disjoint_set.hpp:22-27). Pair graphs are tiny; at scale this is
    pipelines.cc itself on the pair edge table."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = min(rx, ry), max(rx, ry)
            parent[hi] = lo
    drop = {x for x in parent if find(x) != x}
    return np.array([i for i in all_ids.tolist() if i not in drop], dtype=np.int64)
