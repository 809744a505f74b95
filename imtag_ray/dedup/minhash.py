"""MinHash + LSH near-duplicate detection (ray_guide 'Near-dup').

Pipeline: shingle → minhash signature (per-batch, vectorized) →
explode to (band_id, band_hash, doc_id) rows → groupby(band) buckets →
candidate pairs → exact-Jaccard verification → duplicate pairs /
survivor selection via union-find over the (small) pair graph — the
same min-label semantics as pipelines.cc, applied to the dup graph.

All hashing is seeded/deterministic (no Python hash()).
"""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..util import col_np, dataset_to_numpy, table_from_arrays

_WS = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1


def _token_shingles(text: str, k: int) -> np.ndarray:
    """64-bit hashes of k-token shingles (deduped)."""
    toks = _WS.split(text.strip()) if text and text.strip() else []
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    vals = np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )
    return np.unique(vals)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: (id, text) batch → (doc_id, band, band_hash)
    rows. Permutation params generated once per actor in __init__."""

    def __init__(self, id_col: str, text_col: str, num_perm: int = 128,
                 bands: int = 16, shingle_k: int = 3, seed: int = 100):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _token_shingles(text, self.k)
        if len(sh) == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return m.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = col_np(batch, self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = self.signature(t or "")
            for bnd in range(self.bands):
                chunk = sig[bnd * self.rows : (bnd + 1) * self.rows]
                h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_id.append(i)
                out_band.append(bnd)
                out_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.string()),
            }
        )


def _exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def minhash_candidates(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    num_perm: int = 128, bands: int = 16, shingle_k: int = 3,
    concurrency: int | tuple = 4,
) -> list[tuple[int, int]]:
    """LSH candidate pairs (driver-side list — candidate sets are tiny
    relative to the corpus; at 100 TB this list stays distributed and
    feeds a pair-verification join instead)."""
    bucketed = ds.select_columns([id_col, text_col]).map_batches(
        MinHasher,
        fn_constructor_args=(id_col, text_col, num_perm, bands, shingle_k),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def pairs_of_bucket(group: "pa.Table") -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        out_a, out_b = [], []
        for x, y in itertools.combinations(ids, 2):
            out_a.append(x)
            out_b.append(y)
        return pa.table(
            {"id_a": pa.array(out_a, type=pa.int64()),
             "id_b": pa.array(out_b, type=pa.int64())}
        )

    pair_ds = (
        bucketed.groupby(["band", "band_hash"])
        .map_groups(pairs_of_bucket, batch_format="pyarrow")
    )
    got = dataset_to_numpy(pair_ds, "id_a", "id_b")
    return sorted(set(zip(got["id_a"].tolist(), got["id_b"].tolist())))


def minhash_dup_pairs(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    threshold: float = 0.8, num_perm: int = 128, bands: int = 16,
    shingle_k: int = 3, concurrency: int | tuple = 4,
) -> pa.Table:
    """→ (id_a, id_b, jaccard) verified pairs ≥ threshold (exact Jaccard
    on shingle sets, not the minhash estimate)."""
    cands = minhash_candidates(
        ds, id_col, text_col, num_perm, bands, shingle_k, concurrency
    )
    if not cands:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    involved = sorted({i for p in cands for i in p})
    inv_ref = ray.put(np.array(involved, dtype=np.int64))

    def collect(batch: pa.Table, _ref=inv_ref, _k=shingle_k) -> pa.Table:
        want = ray.get(_ref)
        ids = col_np(batch, id_col)
        pos = np.searchsorted(want, ids)
        pos[pos >= len(want)] = len(want) - 1
        mask = want[pos] == ids
        sel = batch.filter(pa.array(mask))
        sids = col_np(sel, id_col)
        stexts = sel.column(text_col).to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(sids, type=pa.int64()),
                "shingles": pa.array(
                    [_token_shingles(t or "", _k).tolist() for t in stexts],
                    type=pa.list_(pa.uint64()),
                ),
            }
        )

    sh_ds = ds.select_columns([id_col, text_col]).map_batches(
        collect, batch_format="pyarrow"
    )
    shingle_map: dict[int, np.ndarray] = {}
    for b in sh_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for i, s in zip(b.column("doc_id").to_pylist(), b.column("shingles").to_pylist()):
            shingle_map[i] = np.array(s, dtype=np.uint64)

    out_a, out_b, out_j = [], [], []
    for x, y in cands:
        j = _exact_jaccard(shingle_map[x], shingle_map[y])
        if j >= threshold:
            out_a.append(x)
            out_b.append(y)
            out_j.append(j)
    return pa.table(
        {"id_a": pa.array(out_a, pa.int64()), "id_b": pa.array(out_b, pa.int64()),
         "jaccard": pa.array(out_j, pa.float64())}
    )


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
