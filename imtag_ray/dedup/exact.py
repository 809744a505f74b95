"""Exact deduplication over a text/bytes column.

Pattern (ray_guide 'Aggregation at scale'): vectorized content-hash in
``map_batches`` → ``groupby(hash)`` keep-first. 'First' is defined by
min id (deterministic under any block order — never arrival order,
SURVEY.md §2.6)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..util import col_np, table_from_arrays


def add_content_hash(
    ds: "ray.data.Dataset", text_col: str, out_col: str = "content_hash"
) -> "ray.data.Dataset":
    """md5 hex of the RAW column bytes (exact dedup; see
    functions.textfn.fingerprint_md5 for the normalized variant)."""

    def h(batch: pa.Table) -> pa.Table:
        vals = batch.column(text_col).to_pylist()
        hx = [
            hashlib.md5(
                (v if isinstance(v, bytes) else (v or "").encode("utf-8"))
            ).hexdigest()
            for v in vals
        ]
        return batch.append_column(out_col, pa.array(hx, type=pa.string()))

    return ds.map_batches(h, batch_format="pyarrow")


def dedup_exact_ids(
    ds: "ray.data.Dataset", text_col: str, id_col: str
) -> "ray.data.Dataset":
    """→ (id_col, n_copies): the surviving min-id per distinct content,
    with its duplicate count. One hash shuffle; map-side hashing."""
    hashed = add_content_hash(ds.select_columns([id_col, text_col]), text_col)
    # bucketed, NOT groupby(content_hash): distinct-content cardinality
    # is ~n_docs (util.bucketed_aggregate)
    from ..util import bucketed_aggregate

    return bucketed_aggregate(
        hashed,
        key_cols=["content_hash"],
        aggs=[(id_col, "min", id_col), (id_col, "count", "n_copies")],
    ).select_columns([id_col, "n_copies"])


def dedup_exact(
    ds: "ray.data.Dataset", text_col: str, id_col: str
) -> "ray.data.Dataset":
    """→ full surviving rows (broadcast semi-join of survivor ids —
    survivor set is O(distinct), shipped once via ray.put; at 100 TB the
    same shape works per-hash-partition)."""
    ids = dedup_exact_ids(ds, text_col, id_col).select_columns([id_col])
    from ..util import dataset_to_numpy

    keep = dataset_to_numpy(ids, id_col)[id_col]
    keep_ref = ray.put(np.sort(keep))

    def f(batch: pa.Table, _ref=keep_ref) -> pa.Table:
        k = ray.get(_ref)
        vals = col_np(batch, id_col)
        pos = np.searchsorted(k, vals)
        pos[pos >= len(k)] = len(k) - 1 if len(k) else 0
        mask = (k[pos] == vals) if len(k) else np.zeros(len(vals), bool)
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def exact_dup_pairs(
    ds: "ray.data.Dataset", text_col: str, id_col: str,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """→ (id_a, id_b) star edges of the exact-duplicate relation:
    id_a = min id of the content group, id_b = every OTHER member.
    The pair-graph form of dedup_exact_ids, for composing exact
    duplicates with near-dup signals in one clustering pass.

    Scale shape: ONE bucketed (hash → min) aggregate + ONE
    hash-partitioned join back; group membership never concentrates
    on the driver."""
    from ..util import bucketed_aggregate, compact_nonempty

    hashed = add_content_hash(
        ds.select_columns([id_col, text_col]), text_col
    ).select_columns([id_col, "content_hash"]).materialize()
    mins = compact_nonempty(
        bucketed_aggregate(
            hashed, key_cols=["content_hash"],
            aggs=[(id_col, "min", "id_a")],
        )
    )
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64())}
    )
    hashed_c = compact_nonempty(hashed)
    if mins is None or hashed_c is None:
        return ray.data.from_arrow(empty)
    joined = hashed_c.join(
        mins.rename_columns({"content_hash": "ch"}),
        join_type="inner", num_partitions=num_partitions,
        on=("content_hash",), right_on=("ch",),
    )

    def star(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64())}
            )
        a = col_np(t, "id_a").astype(np.int64)
        b = col_np(t, id_col).astype(np.int64)
        m = a != b
        return table_from_arrays(id_a=a[m], id_b=b[m])

    return joined.map_batches(star, batch_format="pyarrow")
