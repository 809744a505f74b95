"""SimHash near-duplicate detection.

64-bit simhash over token hashes; candidate generation by the
pigeonhole principle (split the 64 bits into ``hamming_k + 1`` chunks —
any pair within hamming distance k agrees on at least one chunk), then
exact hamming verification. Chunk bucketing is a groupby shuffle;
verification runs on the (small) candidate set.
"""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pyarrow as pa
import ray.data

from ..util import col_np, dataset_to_numpy

_WS = re.compile(r"\s+")


def simhash64(text: str) -> int:
    toks = _WS.split(text.strip()) if text and text.strip() else []
    if not toks:
        return 0
    vals = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for t in toks
        ),
        dtype=np.uint64,
        count=len(toks),
    )
    bits = ((vals[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    score = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for j in range(64):
        if score[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return int(out)


class SimHasher:
    """Actor-pool stage: (id, text) → (doc_id, simhash) 1→1."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = col_np(batch, self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        hs = np.fromiter(
            (simhash64(t or "") for t in texts), dtype=np.uint64, count=len(texts)
        )
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "simhash": pa.array(hs, type=pa.uint64())}
        )


def simhash_table(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    concurrency: int | tuple = 4,
) -> "ray.data.Dataset":
    return ds.select_columns([id_col, text_col]).map_batches(
        SimHasher, fn_constructor_args=(id_col, text_col),
        batch_format="pyarrow", concurrency=concurrency,
    )


def simhash_dup_pairs(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    hamming_k: int = 3, concurrency: int | tuple = 4,
) -> pa.Table:
    """→ (id_a, id_b, hamming) pairs with hamming(simhash) ≤ k."""
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
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "chunk": pa.array(out_chunk, pa.int32()),
             "val": pa.array(vals, pa.uint64()),
             "simhash": pa.array(np.repeat(hs, nchunks), pa.uint64())}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        hs = group.column("simhash").to_pylist()
        order = np.argsort(ids)
        out_a, out_b, out_h = [], [], []
        for i, j in itertools.combinations(order, 2):
            d = bin(int(hs[i]) ^ int(hs[j])).count("1")
            if d <= hamming_k:
                a, b = ids[i], ids[j]
                if a > b:
                    a, b = b, a
                out_a.append(a)
                out_b.append(b)
                out_h.append(d)
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()),
             "id_b": pa.array(out_b, pa.int64()),
             "hamming": pa.array(out_h, pa.int32())}
        )

    pair_ds = (
        tbl.map_batches(explode, batch_format="pyarrow")
        .groupby(["chunk", "val"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    got = dataset_to_numpy(pair_ds, "id_a", "id_b", "hamming")
    seen = {}
    for a, b, h in zip(got["id_a"], got["id_b"], got["hamming"]):
        seen[(int(a), int(b))] = int(h)
    items = sorted(seen.items())
    return pa.table(
        {"id_a": pa.array([k[0] for k, _ in items], pa.int64()),
         "id_b": pa.array([k[1] for k, _ in items], pa.int64()),
         "hamming": pa.array([v for _, v in items], pa.int32())}
    )
