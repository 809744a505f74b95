"""Shared helpers: Arrow batch utilities, distributed zip_with_index,
sparse per-batch reductions.

Everything here is vectorized (numpy / pyarrow.compute); no Python
row loops in hot paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def table_from_arrays(**cols) -> pa.Table:
    """Build a pyarrow Table from name→array kwargs (numpy or pa arrays)."""
    names = list(cols.keys())
    arrays = [
        c if isinstance(c, (pa.Array, pa.ChunkedArray)) else pa.array(np.asarray(c))
        for c in cols.values()
    ]
    return pa.table(arrays, names=names)


def col_np(batch: pa.Table, name: str) -> np.ndarray:
    """Zero-copy-ish numpy view of a column (combines chunks if needed)."""
    col = batch.column(name)
    if col.num_chunks == 1:
        return col.chunk(0).to_numpy(zero_copy_only=False)
    return col.combine_chunks().to_numpy(zero_copy_only=False)


def _mix_to_bucket(key_arrays, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id per row from one or more int64 key
    columns (fibonacci-hash mixing so adjacent keys spread)."""
    C = np.uint64(0x9E3779B97F4A7C15)
    h = np.zeros(len(key_arrays[0]), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in key_arrays:
            h = (h + np.asarray(k).view(np.uint64)) * C
        h ^= h >> np.uint64(33)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _bucket_of_table(t: pa.Table, key_cols: list[str], num_buckets: int) -> np.ndarray:
    """Per-row bucket id from int OR string key columns."""
    keys = []
    for k in key_cols:
        col = t.column(k)
        if pa.types.is_integer(col.type):
            keys.append(col_np(t, k).astype(np.int64))
        else:
            from .functions.urls import hash64_array

            keys.append(hash64_array(col_np(t, k)).view(np.int64))
    return _mix_to_bucket(keys, num_buckets)


def bucketed_aggregate(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    aggs: list[tuple],
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """``groupby(key_cols).aggregate(...)`` for HIGH-CARDINALITY keys.

    Ray 2.49's groupby aggregation pays ~125µs of per-distinct-group
    overhead (measured: 4M rows / 2M groups = 250 s), so V- or E-sized
    aggregates must never feed it raw keys. This shuffles on a coarse
    hash bucket (num_buckets distinct values — per-group overhead paid
    num_buckets times, not num_keys times) and reduces each bucket with
    ONE Arrow C++ hash aggregation (string and int keys both fine).

    ``aggs``: (src_col, fn, out_name) with fn ∈ Arrow group_by
    aggregate functions ("sum" | "min" | "max" | "count" | "mean" ...).
    Output: key_cols + one column per agg, dtypes Arrow-derived.

    (src_col, fn) pairs must be unique: Arrow names its results
    '<col>_<fn>', so two aggs sharing a pair would emit two
    identically-named columns and the alias rename below would silently
    keep only the last one."""
    pairs = [(c, fn) for c, fn, _ in aggs]
    if len(set(pairs)) != len(pairs):
        raise ValueError(
            f"bucketed_aggregate: duplicate (src_col, fn) pairs in aggs "
            f"{pairs}; duplicate the source column under a new name first"
        )

    def bucketize(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", pa.array(_bucket_of_table(t, key_cols, num_buckets))
        )

    def reduce_bucket(g: pa.Table) -> pa.Table:
        res = g.group_by(key_cols).aggregate(
            [(c, fn) for c, fn, _ in aggs]
        )
        # Arrow names results '<col>_<fn>'; rename to the requested
        # aliases and restore column order (keys first)
        rename = {f"{c}_{fn}": out for c, fn, out in aggs}
        res = res.rename_columns(
            [rename.get(n, n) for n in res.column_names]
        )
        return res.select(key_cols + [out for _, _, out in aggs])

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


def bucketed_sum_aggregate(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    sum_cols: list[str],
    num_buckets: int = 256,
    count_col: str | None = None,
) -> "ray.data.Dataset":
    """groupby(key_cols).sum(sum_cols)[.count()] via bucketed_aggregate
    (see there for why Ray's groupby must not see high-cardinality
    keys). With no sums and no count this is a distinct."""
    aggs = [(c, "sum", c) for c in sum_cols]
    if count_col is not None:
        aggs.append((key_cols[0], "count", count_col))
    if not aggs:
        # distinct: count into a throwaway column, then drop it
        return bucketed_aggregate(
            ds, key_cols, [(key_cols[0], "count", "__n")], num_buckets
        ).select_columns(key_cols)
    return bucketed_aggregate(ds, key_cols, aggs, num_buckets)


def sparse_min_reduce(keys: np.ndarray, values: np.ndarray):
    """Group ``values`` by ``keys`` and take the per-key min.

    Returns (unique_keys, min_values). This is the within-batch partial
    aggregation (combiner) run before any shuffle — the distributed
    analogue of the reference doing all merging through a single shared
    union-find array (src/disjoint_set.hpp:54-64): here every batch
    pre-merges locally so the shuffle only moves one row per key per
    batch.
    """
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    v = values[order]
    boundaries = np.empty(len(k), dtype=bool)
    if len(k):
        boundaries[0] = True
        np.not_equal(k[1:], k[:-1], out=boundaries[1:])
    starts = np.flatnonzero(boundaries)
    mins = np.minimum.reduceat(v, starts) if len(starts) else v[:0]
    return k[starts], mins


def sparse_sum_reduce(keys: np.ndarray, values: np.ndarray):
    """Group ``values`` by ``keys`` and sum per key (within-batch combiner)."""
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    v = values[order]
    boundaries = np.empty(len(k), dtype=bool)
    if len(k):
        boundaries[0] = True
        np.not_equal(k[1:], k[:-1], out=boundaries[1:])
    starts = np.flatnonzero(boundaries)
    sums = np.add.reduceat(v, starts) if len(starts) else v[:0]
    return k[starts], sums


def zip_with_index(
    ds: "ray.data.Dataset", index_name: str = "index"
) -> "ray.data.Dataset":
    """Assign a contiguous global row index 0..N-1 in the dataset's current
    (materialized) block order.

    Ray Data has no built-in zip_with_index; the Dataset API cannot express
    "my global offset" inside ``map_batches``, so this drops to block refs:
    materialize, count rows per block with tiny remote tasks, prefix-sum the
    offsets on the driver (P integers, not data), then relabel each block in
    parallel. This mirrors the reference's sequential dense-label
    linearization after parallel extraction
    (src/SegmentImageImpl_Scanline.cpp:88-95) with the sequential part
    reduced to a P-length prefix sum.
    """
    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _count(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_count.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote(num_cpus=0.25)
    def _index(t: pa.Table, off: int) -> pa.Table:
        idx = np.arange(off, off + t.num_rows, dtype=np.int64)
        return t.append_column(index_name, pa.array(idx))

    out_refs = [_index.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def exclusive_prefix_sum(
    ds: "ray.data.Dataset", val_col: str, out_col: str = "offset"
) -> "ray.data.Dataset":
    """Attach the EXCLUSIVE global running sum of ``val_col`` in the
    dataset's current (materialized) block order — the weighted
    generalization of zip_with_index, same two-phase distributed-scan
    shape: per-block sums via tiny remote tasks, a P-length fold on the
    driver (P integers, never data), then every block relabels in
    parallel. Post-sort zero-row blocks are schema-less in Ray 2.49 and
    are dropped (they contribute no rows and no sum)."""
    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _summary(t: pa.Table) -> tuple:
        if t.num_rows == 0:
            return 0, 0
        v = np.asarray(t.column(val_col), dtype=np.int64)
        return t.num_rows, int(v.sum())

    summaries = ray.get([_summary.remote(r) for r in refs])
    keep = [r for r, (n, _) in zip(refs, summaries) if n]
    sums = np.array([s for n, s in summaries if n], dtype=np.int64)
    if not keep:
        return mat
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote(num_cpus=0.25)
    def _attach(t: pa.Table, off: int) -> pa.Table:
        v = np.asarray(t.column(val_col), dtype=np.int64)
        excl = off + np.concatenate([[0], np.cumsum(v)[:-1]]).astype(
            np.int64
        )
        return t.append_column(out_col, pa.array(excl))

    return ray.data.from_arrow_refs(
        [_attach.remote(r, int(o)) for r, o in zip(keep, offsets)]
    )


def _strip_meta(t: pa.Table) -> pa.Table:
    """Drop schema/field metadata (zero-copy). Pandas-written parquet
    carries a b'pandas' schema-metadata dict that makes pa.Schema
    UNHASHABLE in this pyarrow build, so every downstream hash shuffle
    logs Ray's 'Failed to hash the schemas' warning — strip at the
    source."""
    if t.schema.metadata or any(f.metadata for f in t.schema):
        fields = [f.remove_metadata() for f in t.schema]
        t = t.cast(pa.schema(fields))
    return t


def read_parquet_clean(path, columns=None, **kw) -> "ray.data.Dataset":
    """ray.data.read_parquet + schema-metadata strip (see _strip_meta).

    For a single parquet file the stripped (and column-pruned) footer
    schema is passed straight to the reader, so even the read op's own
    blocks are metadata-free; otherwise a zero-copy strip map runs
    after the read."""
    import os

    if isinstance(path, str) and os.path.isfile(path) and "schema" not in kw:
        import pyarrow.parquet as pq

        full = pq.read_schema(path)
        names = columns if columns is not None else full.names
        sub = pa.schema([full.field(c).remove_metadata() for c in names])
        return ray.data.read_parquet(path, schema=sub, columns=columns, **kw)
    return ray.data.read_parquet(path, columns=columns, **kw).map_batches(
        _strip_meta, batch_format="pyarrow"
    )


def dataset_to_numpy(ds: "ray.data.Dataset", *cols: str) -> dict[str, np.ndarray]:
    """Stream a (small, vertex-state-sized) dataset into driver numpy arrays.

    Only for results that are O(vertices) or smaller — never edges.
    """
    parts: dict[str, list[np.ndarray]] = {c: [] for c in cols}
    for batch in ds.select_columns(list(cols)).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        for c in cols:
            parts[c].append(col_np(batch, c))
    return {
        c: (np.concatenate(v) if v else np.empty(0))
        for c, v in parts.items()
    }


def ensure_typed(**types):
    """Batch fn giving zero-row blocks a concrete schema.

    Ray 2.49's hash groupby/aggregate emits SCHEMA-LESS empty blocks
    for partitions that received no rows; when such a Dataset later
    feeds a hash join, the join aggregator builds a zero-column table
    for partitions covered only by those blocks and pyarrow's
    Table.join fails with 'No match or multiple matches for key field
    reference'. Chain `.map_batches(ensure_typed(k=pa.int64(), ...),
    batch_format="pyarrow")` between any sparse groupby and a join.
    Non-empty blocks pass through untouched (zero-copy)."""
    import pyarrow as _pa

    empty = _pa.table({n: _pa.array([], ty) for n, ty in types.items()})

    def fix(t: "_pa.Table", _e=empty) -> "_pa.Table":
        return _e if t.num_rows == 0 else t

    return fix


def compact_nonempty(ds: "ray.data.Dataset"):
    """Materialize `ds` and drop zero-row blocks (metadata-only: block
    refs are re-bundled, no data is fetched to the driver).

    Why: Ray 2.49's hash-shuffle join broadcasts each side's schema to
    all aggregator partitions only with the FIRST submitted shuffle
    task — and `_shuffle_block` early-returns on a zero-row input
    block, so when a side's first block happens to be empty the
    broadcast never fires, partitions that receive no rows finalize a
    zero-column table, and pyarrow's Table.join raises 'No match or
    multiple matches for key field reference'. Feeding a side through
    compact_nonempty makes its first block non-empty, which fixes the
    broadcast deterministically.

    Returns the compacted Dataset, or None if every block is empty
    (callers must handle the all-empty case with typed short-circuits
    — from_arrow_refs of nothing has no schema to offer).

    Idempotent-cheap: the returned Dataset is MARKED, and re-compacting
    a marked Dataset is a no-op — so helpers like relational._join_ne
    can defensively compact every side without re-materializing
    already-compacted base tables (the round-5 q2/q8/q9 wall
    regression).
    """
    import ray as _ray
    import ray.data as _rd

    if getattr(ds, "_imtag_nonempty", False):
        return ds
    mat = ds.materialize()
    refs = [
        block_ref
        for bundle in mat.iter_internal_ref_bundles()
        for block_ref, meta in bundle.blocks
        if meta.num_rows
    ]
    if not refs:
        return None
    out = _rd.from_arrow_refs(refs)
    out._imtag_nonempty = True
    return out


def to_pandas_typed(ds: "ray.data.Dataset"):
    """``Dataset.to_pandas()`` returns a COLUMN-LESS DataFrame for a
    zero-row Dataset even when ``Dataset.schema()`` is correct (Ray
    2.49) — dimension-table loaders that then do ``df.colname`` crash
    on legitimately-empty inputs. Concatenating the arrow block refs
    preserves the blocks' schema (parquet-read blocks carry it even at
    0 rows). Only for driver-bounded tables (dims, top-k results)."""
    import ray as _ray

    tabs = [t for t in _ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    if tabs:
        return pa.concat_tables(tabs, promote_options="default").to_pandas()
    # every block is 0-column (an empty parquet file reads as 0-column
    # blocks); rebuild the typed empty frame from the Dataset schema
    sch = ds.schema()
    arrow_schema = getattr(sch, "base_schema", None)
    if isinstance(arrow_schema, pa.Schema):
        return arrow_schema.empty_table().to_pandas()
    return ds.to_pandas()
