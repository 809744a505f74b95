"""SimHash near-duplicate detection.

64-bit simhash over per-token md5 hashes; candidate generation by the
pigeonhole principle (split the 64 bits into ``hamming_k + 1`` chunks —
any pair within hamming distance k agrees on at least one chunk), then
exact hamming verification inside the bucket groupby. Final pair dedup
(a pair can surface from several chunks) is a distributed
groupby(id_a, id_b) — no driver-side dict (VERDICT fix).

simhash64 is SQL-expressible (md5 per token + bit majority), so the
pair output has an exact DuckDB oracle
(__ray_entry__.oracle_sql['simhash_pairs']).
"""

from __future__ import annotations

import functools
import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from ..util import col_np

_WS = re.compile(r"\s+")


def _token_hashes(toks: list[str], cache: dict) -> np.ndarray:
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        v = cache.get(t)
        if v is None:
            v = np.uint64(
                int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            )
            if len(cache) < (1 << 16):
                cache[t] = v
        out[i] = v
    return out


def simhash64(text: str, _cache: dict | None = None) -> int:
    """Reference scalar implementation (tests / docs)."""
    toks = _WS.split(text.strip()) if text and text.strip() else []
    if not toks:
        return 0
    vals = _token_hashes(toks, _cache if _cache is not None else {})
    bits = ((vals[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    score = (2 * bits - 1).sum(axis=0)
    return int(((score > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


class SimHasher:
    """Actor-pool stage: (id, text) → (doc_id, simhash) 1→1.

    Token md5s are cached per actor; the bit-majority accumulation is
    vectorized across the WHOLE batch (one (N_tokens, 64) expansion +
    reduceat per doc), not per row."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col
        self.cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = col_np(batch, self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        toks_per_doc = [
            _WS.split(t.strip()) if t and t.strip() else [] for t in texts
        ]
        counts = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        flat_toks = [tok for toks in toks_per_doc for tok in toks]
        hs = np.zeros(len(ids), dtype=np.uint64)
        if flat_toks:
            vals = _token_hashes(flat_toks, self.cache)
            bits = (
                (vals[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int64)
            signed = 2 * bits - 1  # (N_tokens, 64)
            offsets = np.zeros(len(ids) + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            nonempty = np.flatnonzero(counts > 0)
            scores = np.add.reduceat(signed, offsets[:-1][nonempty], axis=0)
            packed = (
                (scores > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)[None, :]
            ).sum(axis=1)
            hs[nonempty] = packed
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "simhash": pa.array(hs, type=pa.uint64())}
        )


@functools.lru_cache(maxsize=8)
def _cached_hasher(id_col: str, text_col: str) -> SimHasher:
    return SimHasher(id_col, text_col)


def _simhash_batch(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    """Task-pool form of SimHasher: the token-md5 cache lives on the
    worker-process-cached instance (same amortization as an actor pool,
    none of the multi-second actor spin-up per pipeline)."""
    return _cached_hasher(id_col, text_col)(batch)


def simhash_table(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    concurrency: int | tuple = 4,
) -> "ray.data.Dataset":
    return ds.select_columns([id_col, text_col]).map_batches(
        _simhash_batch, fn_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
    )


def simhash_dup_pairs(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    hamming_k: int = 3, concurrency: int | tuple = 4,
) -> "ray.data.Dataset":
    """→ Dataset (id_a, id_b, hamming) pairs with hamming(simhash) ≤ k,
    sorted by (id_a, id_b); fully distributed."""
    tbl = simhash_table(ds, id_col, text_col, concurrency)
    nchunks = hamming_k + 1
    width = 64 // nchunks

    def explode(batch: pa.Table) -> pa.Table:
        ids = col_np(batch, "doc_id")
        hs = col_np(batch, "simhash")
        out_id = np.repeat(ids, nchunks)
        out_chunk = np.tile(np.arange(nchunks, dtype=np.int32), len(ids))
        shifts = (np.arange(nchunks, dtype=np.uint64) * np.uint64(width))
        mask = np.uint64((1 << width) - 1)
        vals = ((hs[:, None] >> shifts[None, :]) & mask).reshape(-1)
        # int64-reinterpreted (bijective): uint64 above 2^63 degrades
        # Ray's sort-shuffle to pickled-object blocks
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "chunk": pa.array(out_chunk, pa.int32()),
             "val": pa.array(vals.view(np.int64), pa.int64()),
             "simhash": pa.array(
                 np.repeat(hs, nchunks).view(np.int64), pa.int64()
             )}
        )

    _LUT = np.array([bin(v).count("1") for v in range(256)], dtype=np.int32)

    def chunk_block_pairs(g: pa.Table, _k=hamming_k) -> pa.Table:
        # ONE coarse hash bucket holding MANY (chunk, val) pigeonhole
        # buckets: lexsort once, then a triu pair expansion per distinct
        # segment size (per-bucket map_groups paid Ray's per-group
        # overhead n_docs x nchunks times)
        chunk = col_np(g, "chunk").astype(np.int64)
        val = col_np(g, "val")
        ids = col_np(g, "doc_id")
        hs = col_np(g, "simhash")
        order = np.lexsort((ids, val, chunk))
        c, v, dv, hv = chunk[order], val[order], ids[order], hs[order]
        n = len(c)
        bound = np.zeros(n, dtype=bool)
        bound[0] = True
        bound[1:] = (c[1:] != c[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(bound)
        sizes = np.diff(np.append(starts, n))
        pa_, pb_, pd_ = [], [], []
        for sz in np.unique(sizes):
            if sz < 2:
                continue
            idx = np.flatnonzero(sizes == sz)
            cols = np.arange(int(sz))
            mids = dv[starts[idx][:, None] + cols[None, :]]
            mhs = hv[starts[idx][:, None] + cols[None, :]]
            ia, ib = np.triu_indices(int(sz), 1)
            x = mhs[:, ia].ravel() ^ mhs[:, ib].ravel()
            d = _LUT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
            keep = d <= _k
            pa_.append(mids[:, ia].ravel()[keep])
            pb_.append(mids[:, ib].ravel()[keep])
            pd_.append(d[keep])
        if not pa_:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int32())}
            )
        return pa.table(
            {"id_a": pa.array(np.concatenate(pa_), pa.int64()),
             "id_b": pa.array(np.concatenate(pb_), pa.int64()),
             "hamming": pa.array(np.concatenate(pd_), pa.int32())}
        )

    from ..util import _mix_to_bucket, bucketed_aggregate

    def coarse(t: pa.Table) -> pa.Table:
        keys = [col_np(t, "chunk").astype(np.int64),
                col_np(t, "val").astype(np.int64)]
        return t.append_column("__bucket", pa.array(_mix_to_bucket(keys, 256)))

    pair_ds = (
        tbl.map_batches(explode, batch_format="pyarrow")
        .map_batches(coarse, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(chunk_block_pairs, batch_format="pyarrow")
    )
    # distributed dedup of pairs found in multiple chunks (bucketed:
    # pair cardinality is data-sized)
    deduped = (
        bucketed_aggregate(
            pair_ds, key_cols=["id_a", "id_b"],
            aggs=[("hamming", "min", "hamming")],
        )
        .map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("hamming"),
                "hamming",
                t["hamming"].cast(pa.int32()),
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    if deduped.count() == 0:
        # typed pa.Table, not an empty Dataset: Ray's to_pandas() drops
        # all columns for zero-row Datasets
        return pa.table(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int32())}
        )
    return deduped.sort(["id_a", "id_b"])
