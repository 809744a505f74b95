"""Global set-similarity self-join with PREFIX FILTERING (AllPairs /
PPJoin family: Bayardo-Ma-Srikant WWW 2007, Xiao et al. WWW 2008) —
the scale path for exact-Jaccard dedup over an unblocked corpus.

dedup/ngram.py bounds its all-pairs kernel with a caller-chosen
blocking key; this operator needs NO blocking: order every document's
shingles by ascending global document frequency (rarest first) and
keep only the PREFIX of length |x| − ⌊t·|x|⌋ + 1 — two sets with
Jaccard ≥ t MUST share a prefix token under any fixed global order
(the classic prefix-filter bound is |x| − ⌈t·|x|⌉ + 1; the floor form
is ≥ it, i.e. never drops a true pair, and avoids float-ceil edge
cases). Candidates are pairs co-occurring under a prefix shingle —
rare by construction — then verified with exact set Jaccard. The
output is therefore EXACTLY all pairs with Jaccard ≥ t over nonempty
hashed-shingle sets, which is what the SQL oracle computes directly
(it does not need to replay the filter mechanics).

Scale design: shingle df via one bucketed aggregation; prefix
selection and candidate expansion via 256-way hash-bucket + per-bucket
lexsort/run passes (the walks.indexed_adjacency pattern — no
doc-cardinality groupby); candidate volume is Σ_prefix-shingle C(df,2)
(output-sensitive, hubs excluded because high-df shingles land in no
prefix); verification reuses dedup.minhash.verify_pairs_jaccard's
single-join multiset kernel. No driver state at any point.

Reference lineage: the same candidates-then-verify shape as imtag's
update_connectivity interval join (src/imtag.cpp) — generate the
plausible overlaps cheaply, confirm exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..util import (
    bucketed_aggregate,
    bucketed_sum_aggregate,
    col_np,
    compact_nonempty,
    table_from_arrays,
)
from .minhash import (
    DEFAULT_SHINGLE_K,
    _EMPTY_PAIRS,
    exploded_shingles,
    shingle_table,
    verify_pairs_jaccard,
)
from ..pipelines.linkpred import _splitmix64

_N_BUCKETS = 256


def _bucketize_on(col: str):
    def fn(t: pa.Table, _c=col) -> pa.Table:
        v = col_np(t, _c)
        h = _splitmix64(
            v.view(np.uint64) if v.dtype == np.int64 else v.astype(np.uint64)
        )
        return t.append_column(
            "__bucket",
            pa.array((h % np.uint64(_N_BUCKETS)).astype(np.int64)),
        )
    return fn


def prefix_jaccard_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_k: int = DEFAULT_SHINGLE_K,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """→ Dataset (id_a, id_b, jaccard): ALL pairs of documents with
    nonempty token-shingle sets whose exact hashed-shingle Jaccard is
    ≥ threshold, id_a < id_b — global (unblocked) self-join via prefix
    filtering. threshold must be > 0 (at 0 the join is all-pairs by
    definition and blocking is required)."""
    if not threshold > 0:
        raise ValueError("prefix_jaccard_pairs requires threshold > 0")
    P = num_partitions
    sh = shingle_table(ds, id_col, text_col, shingle_k).materialize()
    ex = compact_nonempty(exploded_shingles(sh))
    if ex is None:
        return ray.data.from_arrow(_EMPTY_PAIRS)

    # (doc, h) with h int64-reinterpreted (uint64 ≥ 2^63 degrades Ray's
    # shuffle to pickled-object blocks)
    def as_i64(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            doc=col_np(t, "doc_id").astype(np.int64),
            h=col_np(t, "h").astype(np.uint64).view(np.int64),
        )

    rows = ex.map_batches(as_i64, batch_format="pyarrow").materialize()

    # global document frequency per shingle — ONE bucketed aggregation
    df = compact_nonempty(
        bucketed_aggregate(
            rows, key_cols=["h"], aggs=[("doc", "count", "df")],
            num_buckets=max(P * 32, _N_BUCKETS),
        )
    )
    with_df = compact_nonempty(
        rows.join(
            df, join_type="inner", num_partitions=P,
            on=("h",), right_on=("h",),
        )
    )
    if with_df is None:
        return ray.data.from_arrow(_EMPTY_PAIRS)

    # prefix selection: bucket by doc, per-bucket lexsort by
    # (doc, df, h-as-unsigned) and keep positions < |x| − ⌊t·|x|⌋ + 1
    def prefix_bucket(g: pa.Table, _t=threshold) -> pa.Table:
        doc = col_np(g, "doc").astype(np.int64)
        h = col_np(g, "h").astype(np.int64)
        dfv = col_np(g, "df").astype(np.int64)
        hu = h.view(np.uint64)  # unsigned order = the oracle-free spec
        order = np.lexsort((hu, dfv, doc))
        doc, h, hu, dfv = doc[order], h[order], hu[order], dfv[order]
        bound = np.ones(len(doc), dtype=bool)
        if len(doc):
            bound[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(bound)
        run_id = np.cumsum(bound) - 1
        pos = np.arange(len(doc), dtype=np.int64) - starts[run_id]
        sizes = np.diff(np.append(starts, len(doc)))[run_id].astype(np.int64)
        plen = sizes - np.floor(_t * sizes.astype(np.float64)).astype(
            np.int64
        ) + 1
        keep = pos < np.maximum(plen, 1)
        return table_from_arrays(doc=doc[keep], h=h[keep])

    prefix = (
        with_df.map_batches(_bucketize_on("doc"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(prefix_bucket, batch_format="pyarrow")
        .materialize()
    )

    # candidate pairs: bucket by shingle, per-bucket run expansion
    # (docs ascending within a run ⇒ a < b); volume Σ C(df_prefix, 2)
    def pairs_bucket(g: pa.Table) -> pa.Table:
        doc = col_np(g, "doc").astype(np.int64)
        h = col_np(g, "h").astype(np.int64)
        order = np.lexsort((doc, h))
        hs, ds_ = h[order], doc[order]
        bound = np.ones(len(hs), dtype=bool)
        if len(hs):
            bound[1:] = hs[1:] != hs[:-1]
        starts = np.flatnonzero(bound)
        run_start = starts[np.cumsum(bound) - 1]
        sec_counts = np.arange(len(hs)) - run_start
        T = int(sec_counts.sum())
        if T == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64())}
            )
        sec = np.repeat(np.arange(len(hs)), sec_counts)
        cum = np.concatenate([[0], np.cumsum(sec_counts)[:-1]])
        off = np.arange(T) - np.repeat(cum, sec_counts)
        fir = np.repeat(run_start, sec_counts) + off
        a, b = ds_[fir], ds_[sec]
        # within-bucket pre-dedup before the global distinct
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        return table_from_arrays(id_a=uniq[:, 0], id_b=uniq[:, 1])

    cand_raw = compact_nonempty(
        prefix.map_batches(_bucketize_on("h"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_bucket, batch_format="pyarrow")
    )
    if cand_raw is None:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    cand = compact_nonempty(
        bucketed_sum_aggregate(
            cand_raw, key_cols=["id_a", "id_b"], sum_cols=[],
            num_buckets=max(P * 32, _N_BUCKETS), count_col="__n",
        )
    )
    if cand is None:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    cand = cand.select_columns(["id_a", "id_b"]).materialize()

    return verify_pairs_jaccard(cand, sh, threshold, P)


def containment_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = DEFAULT_SHINGLE_K,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """→ Dataset (id_a, id_b, containment): ALL ORDERED pairs a ≠ b of
    documents with nonempty token-shingle sets where the containment
    score C(A,B) = |A∩B| / |A| is ≥ threshold — i.e. document a is
    (near-)contained in document b. The asymmetric companion of
    prefix_jaccard_pairs: a short quote inside a long page has high
    containment but low Jaccard, so symmetric dedup misses it.

    Prefix-filter correctness (one-sided): if C(A,B) ≥ t then
    |A∩B| ≥ ⌈t·|A|⌉, so B must hit A's df-ordered prefix of length
    |A| − ⌈t·|A|⌉ + 1 (else inter ≤ ⌈t·|A|⌉ − 1). Candidates are
    therefore A-prefix tokens joined against ALL of B's tokens — still
    output-sensitive because prefix tokens are globally rare. Exact
    verification reuses the minhash multiset kernel's (union, inter)
    plus one sizes join. threshold must be > 0."""
    if not threshold > 0:
        raise ValueError("containment_pairs requires threshold > 0")
    P = num_partitions
    sh = shingle_table(ds, id_col, text_col, shingle_k).materialize()
    ex = compact_nonempty(exploded_shingles(sh))
    if ex is None:
        return ray.data.from_arrow(_EMPTY_CONT)

    def as_i64(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            doc=col_np(t, "doc_id").astype(np.int64),
            h=col_np(t, "h").astype(np.int64),
        )

    rows = ex.map_batches(as_i64, batch_format="pyarrow").materialize()
    df = compact_nonempty(
        bucketed_aggregate(
            rows, key_cols=["h"], aggs=[("doc", "count", "df")],
            num_buckets=max(P * 32, _N_BUCKETS),
        )
    )
    with_df = compact_nonempty(
        rows.join(
            df, join_type="inner", num_partitions=P,
            on=("h",), right_on=("h",),
        )
    )
    if with_df is None:
        return ray.data.from_arrow(_EMPTY_CONT)

    def prefix_bucket(g: pa.Table, _t=threshold) -> pa.Table:
        doc = col_np(g, "doc").astype(np.int64)
        h = col_np(g, "h").astype(np.int64)
        dfv = col_np(g, "df").astype(np.int64)
        hu = h.view(np.uint64)
        order = np.lexsort((hu, dfv, doc))
        doc, h = doc[order], h[order]
        bound = np.ones(len(doc), dtype=bool)
        if len(doc):
            bound[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(bound)
        run_id = np.cumsum(bound) - 1
        pos = np.arange(len(doc), dtype=np.int64) - starts[run_id]
        sizes = np.diff(np.append(starts, len(doc)))[run_id].astype(np.int64)
        plen = sizes - np.floor(_t * sizes.astype(np.float64)).astype(
            np.int64
        ) + 1
        keep = pos < np.maximum(plen, 1)
        return table_from_arrays(doc=doc[keep], h=h[keep])

    prefix = compact_nonempty(
        with_df.map_batches(_bucketize_on("doc"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(prefix_bucket, batch_format="pyarrow")
    )
    if prefix is None:
        return ray.data.from_arrow(_EMPTY_CONT)
    prefix = prefix.materialize()

    # ordered candidates: A-prefix token hits ANY token of B (a != b)
    cand_raw = compact_nonempty(
        prefix.rename_columns({"doc": "id_a"}).join(
            rows.rename_columns({"doc": "id_b", "h": "hb"}),
            join_type="inner", num_partitions=P,
            on=("h",), right_on=("hb",),
        ).map_batches(
            lambda t: (
                pa.table(
                    {"id_a": pa.array([], pa.int64()),
                     "id_b": pa.array([], pa.int64())}
                )
                if t.num_rows == 0
                else (
                    lambda a, b: table_from_arrays(
                        id_a=a[a != b], id_b=b[a != b]
                    )
                )(
                    col_np(t, "id_a").astype(np.int64),
                    col_np(t, "id_b").astype(np.int64),
                )
            ),
            batch_format="pyarrow",
        )
    )
    if cand_raw is None:
        return ray.data.from_arrow(_EMPTY_CONT)
    cand = compact_nonempty(
        bucketed_sum_aggregate(
            cand_raw, key_cols=["id_a", "id_b"], sum_cols=[],
            num_buckets=max(P * 32, _N_BUCKETS), count_col="__n",
        )
    )
    if cand is None:
        return ray.data.from_arrow(_EMPTY_CONT)
    cand = cand.select_columns(["id_a", "id_b"]).materialize()

    # verify: |A∩B| via the multiset kernel (threshold 0 keeps every
    # candidate with its union+inter), then containment = inter / |A|
    verified = compact_nonempty(verify_pairs_jaccard(cand, sh, 0.0, P))
    if verified is None:
        return ray.data.from_arrow(_EMPTY_CONT)
    sizes_ds = compact_nonempty(
        bucketed_aggregate(
            rows, key_cols=["doc"], aggs=[("h", "count", "sz")],
            num_buckets=max(P * 32, _N_BUCKETS),
        )
    )
    # jaccard j = i/u with u = |A∪B| = |A|+|B|-i ⇒ i = j·u/(j+1)… the
    # kernel doesn't expose (u, i) directly, so recompute i from j and
    # sizes: i = j·(|A|+|B|) / (1+j), exact in float only — instead
    # join sizes and recompute containment from u and |A|:
    # u = |A|+|B|−i ⇒ i = |A|+|B|−u, and j = i/u gives u = i/j… use
    # i = round(j·(szA+szB)/(1+j)) — EXACT because i, u are integers
    # and j = i/u is their exact float ratio only when representable.
    # Safer: containment from u: i = szA + szB − u where u = i/j…
    # Both need u. Avoid the algebra: run the kernel's count directly.
    joined = compact_nonempty(
        verified.join(
            sizes_ds.rename_columns({"doc": "da", "sz": "sza"}),
            join_type="inner", num_partitions=P,
            on=("id_a",), right_on=("da",),
        )
    )
    if joined is None:
        return ray.data.from_arrow(_EMPTY_CONT)
    joined = compact_nonempty(
        joined.join(
            sizes_ds.rename_columns({"doc": "db", "sz": "szb"}),
            join_type="inner", num_partitions=P,
            on=("id_b",), right_on=("db",),
        )
    )
    if joined is None:
        return ray.data.from_arrow(_EMPTY_CONT)

    def fin(t: pa.Table, _t=threshold) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_CONT
        ia = col_np(t, "id_a").astype(np.int64)
        ib = col_np(t, "id_b").astype(np.int64)
        j = col_np(t, "jaccard").astype(np.float64)
        sza = col_np(t, "sza").astype(np.int64)
        szb = col_np(t, "szb").astype(np.int64)
        # i/(sza+szb−i) = j ⇒ i = j·(sza+szb)/(1+j); i is an integer,
        # and the float error is ≪ 0.5, so the round is exact
        inter = np.rint(j * (sza + szb) / (1.0 + j)).astype(np.int64)
        cont = inter / sza
        keep = cont >= _t
        return pa.table(
            {"id_a": pa.array(ia[keep], pa.int64()),
             "id_b": pa.array(ib[keep], pa.int64()),
             "containment": pa.array(cont[keep], pa.float64())}
        )

    return joined.map_batches(fin, batch_format="pyarrow").materialize()


_EMPTY_CONT = pa.table(
    {"id_a": pa.array([], pa.int64()),
     "id_b": pa.array([], pa.int64()),
     "containment": pa.array([], pa.float64())}
)
