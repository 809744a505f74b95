"""Corpus scoring / selection operators for the training-data pipeline:
BM25 relevance scoring, group-wise top-k, deterministic stratified
sampling, and exact histogram quantiles.

These extend the driver brief's text-analysis flank (the reference's
per-component statistics pass, src/SegmentImageImpl.cpp rows_to_
components, generalized from pixel counts to corpus statistics). All
semantics are deliberately ANSI-SQL-replicable so the DuckDB oracles in
__ray_entry__.oracle_sql can check them value-for-value:

- **BM25**: two streaming passes — pass 1 reduces to O(|terms|)
  corpus constants (N, Σdl, per-term df) via a per-batch combiner +
  tiny Sum aggregate; pass 2 scores every doc with the constants
  closed over (broadcast once, not per batch).
- **top-k per group**: per-batch partial top-k (the combiner bounds
  shuffle volume at k rows per group per block) then a map_groups
  finalize over the reduced set.
- **deterministic sampling**: md5-prefix-u64 threshold per stratum —
  resumable and replayable by construction (same row set on every
  run, no RNG state).
- **histogram quantiles**: exact type-1 quantiles of an integer
  metric at any scale — per-batch (key, value)→count partials, one
  small shuffle of the histogram, integer-only threshold arithmetic
  (100·cum ≥ pct·n) so engine and SQL agree bit-for-bit.
- **vector centroids**: mean embedding per group (the k-means / IVF
  training primitive) — per-batch (group → Σvec, count) partials on a
  combined group·dim key, shuffle volume independent of row count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..functions.textfn import token_count
from ..util import col_np, table_from_arrays

# --- BM25 -------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def _texts(t: pa.Table, col: str) -> pd.Series:
    return pd.Series(t.column(col).to_numpy(zero_copy_only=False))


def _term_tf(texts: pd.Series, terms: list[str]) -> np.ndarray:
    """(len(texts), len(terms)) int64 matrix of whitespace-token term
    frequencies over trim(lower(text)) — exactly DuckDB's
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))."""
    norm = texts.fillna("").str.lower().str.strip()
    toks = norm.str.split(r"\s+", regex=True)
    ex = toks.explode()
    sub = ex[ex.isin(terms)]
    out = np.zeros((len(texts), len(terms)), dtype=np.int64)
    if len(sub):
        cols = {t: j for j, t in enumerate(terms)}
        rows = sub.index.to_numpy(dtype=np.int64)
        cidx = np.array([cols[v] for v in sub.to_numpy()], dtype=np.int64)
        np.add.at(out, (rows, cidx), 1)
    return out


def bm25_corpus_stats(
    ds: "ray.data.Dataset", text_col: str, terms: list[str]
) -> dict:
    """Pass 1: {n, sum_dl, df (per term)} via per-batch combiner + Sum."""
    terms = list(terms)

    def partial(t: pa.Table) -> pa.Table:
        texts = _texts(t, text_col)
        dl = token_count(texts)
        tf = _term_tf(texts, terms)
        cols = {
            "n": np.array([len(texts)], dtype=np.int64),
            "sum_dl": np.array([int(dl.sum())], dtype=np.int64),
        }
        for j in range(len(terms)):
            cols[f"df_{j}"] = np.array(
                [int((tf[:, j] > 0).sum())], dtype=np.int64
            )
        return table_from_arrays(**cols)

    aggs = [Sum("n", alias_name="n"), Sum("sum_dl", alias_name="sum_dl")] + [
        Sum(f"df_{j}", alias_name=f"df_{j}") for j in range(len(terms))
    ]
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    if not row or row.get("n") is None:  # empty corpus
        return {"n": 0, "avgdl": 0.0,
                "df": np.zeros(len(terms), dtype=np.int64)}
    n = int(row["n"])
    return {
        "n": n,
        "avgdl": (int(row["sum_dl"]) / n) if n else 0.0,
        "df": np.array(
            [int(row[f"df_{j}"]) for j in range(len(terms))], dtype=np.int64
        ),
    }


def bm25_scores(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> "ray.data.Dataset":
    """BM25(doc, terms) → Dataset (id_col, bm25). Okapi idf with the
    +1 smoothing (Lucene form): ln((N - df + 0.5)/(df + 0.5) + 1)."""
    terms = sorted(set(terms))
    stats = bm25_corpus_stats(ds, text_col, terms)
    n, avgdl, df = stats["n"], stats["avgdl"], stats["df"]
    idf = (
        np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        if n
        else np.zeros(len(terms))
    )

    def score(t: pa.Table) -> pa.Table:
        texts = _texts(t, text_col)
        dl = token_count(texts).astype(np.float64)
        tf = _term_tf(texts, terms).astype(np.float64)
        if avgdl > 0:
            denom = tf + k1 * (1.0 - b + b * (dl / avgdl))[:, None]
        else:
            denom = tf + k1
        with np.errstate(divide="ignore", invalid="ignore"):
            per_term = np.where(tf > 0, tf * (k1 + 1.0) / denom, 0.0)
        return pa.table(
            {id_col: t[id_col], "bm25": pa.array(per_term @ idf)}
        )

    return ds.map_batches(score, batch_format="pyarrow")


# --- group-wise top-k -------------------------------------------------------


def top_k_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int,
    keep_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """Top-k rows per group by (order_col DESC, tiebreak_col ASC) with a
    1..k rank column (`rnk`). Per-batch partial top-k bounds the shuffle
    at k rows per group per block; the finalize is vectorized over ALL
    groups in a coarse hash bucket (a per-group map_groups pays Ray's
    ~125µs-per-group overhead — untenable at vertex-sized group
    cardinality). order_col must be numeric (the descending sort key is
    negated)."""
    keep = keep_cols or [group_col, order_col, tiebreak_col]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(keep).to_pandas()
        df = df.sort_values(
            [group_col, order_col, tiebreak_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby(group_col, sort=False).head(k)

    def group_bucket(t: pa.Table) -> pa.Table:
        from ..util import _bucket_of_table

        return t.append_column(
            "__bucket", pa.array(_bucket_of_table(t, [group_col], 256))
        )

    def finalize_block(g: pa.Table, _k=k) -> pa.Table:
        gk = col_np(g, group_col)
        ov = col_np(g, order_col)
        tb = col_np(g, tiebreak_col)
        # (group ASC, order DESC, tiebreak ASC) in one lexsort; groups
        # need only be CONTIGUOUS, so any total order on the group
        # column works — string groups sort lexicographically
        order = np.lexsort((tb, -ov, gk))
        gs = gk[order]
        n = len(gs)
        new_g = np.zeros(n, dtype=bool)
        if n:
            new_g[0] = True
            new_g[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(new_g)
        rnk = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, n))
        ) + 1
        sel = rnk <= _k
        idx = order[sel]
        out = g.select(keep).take(pa.array(idx, pa.int64()))
        return out.append_column("rnk", pa.array(rnk[sel], pa.int64()))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(group_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(finalize_block, batch_format="pyarrow")
    )


# --- deterministic stratified sampling --------------------------------------


def sample_hash_u64(keys) -> np.ndarray:
    """md5('smp:'+key) first-16-hex-chars → uint64 (the oracle-proven
    CAST('0x' || substring(md5(...),1,16) AS UBIGINT) scheme)."""
    return np.array(
        [
            int(hashlib.md5(f"smp:{k}".encode()).hexdigest()[:16], 16)
            for k in keys
        ],
        dtype=np.uint64,
    )


def sample_stratified(
    ds: "ray.data.Dataset",
    id_col: str,
    strata_col: str,
    permille: dict[str, int],
    default_permille: int = 0,
) -> "ray.data.Dataset":
    """Deterministic per-stratum sample: keep rows where
    hash_u64('smp:'+id) % 1000 < permille[stratum]. Pure filter — no
    shuffle, no RNG state, identical row set on every run (resumable
    sampling for training-data selection)."""
    pm = dict(permille)

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        strata = t.column(strata_col).to_numpy(zero_copy_only=False)
        mod = (sample_hash_u64(ids) % np.uint64(1000)).astype(np.int64)
        thresh = np.array(
            [pm.get(s, default_permille) for s in strata], dtype=np.int64
        )
        return t.filter(pa.array(mod < thresh))

    return ds.map_batches(f, batch_format="pyarrow")


# --- exact histogram quantiles ----------------------------------------------


def float_quantiles_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    percentiles: list[int],
) -> "ray.data.Dataset":
    """Exact type-1 (discrete) quantiles of a FLOAT column per group —
    int_quantiles_by_group's histogram-collapse shape with double
    values: per-batch (group, value)→count partials, one small
    shuffle, per-group cumsum pick at the smallest v with
    100·cum ≥ pct·n (≡ DuckDB quantile_disc's ceil(p·n)-th order
    statistic, so the oracle agrees on identical doubles — the value
    returned IS an input value, never an interpolation). Near-
    continuous doubles collapse less than integers do, but the shuffle
    still carries (group, distinct value) rows, bounded by row count.
    → Dataset (group_col, p{pct}... float64)."""
    pcts = sorted(percentiles)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {group_col: t.column(group_col).to_numpy(zero_copy_only=False),
             value_col: t.column(value_col).to_numpy(zero_copy_only=False)}
        )
        out = (
            df.groupby([group_col, value_col], sort=False)
            .size().rename("c").reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(value_col, sort=True)["c"].sum().sort_index()
        vals = h.index.to_numpy(dtype=np.float64)
        cum = h.to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        row = {group_col: [g[group_col].iloc[0]]}
        for p in pcts:
            idx = int(np.searchsorted(100 * cum, p * n, side="left"))
            row[f"p{p}"] = np.array([vals[idx]], dtype=np.float64)
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finalize, batch_format="pandas")
    )


def int_quantiles_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    percentiles: list[int],
) -> "ray.data.Dataset":
    """Exact type-1 quantiles of an INTEGER column per group, at any
    scale: per-batch (group, value)→count partials collapse the data to
    a histogram (|groups| × |distinct values| rows), one small shuffle,
    then a per-group cumsum pick. The threshold is integer-only
    (100·cum ≥ pct·n) so the DuckDB oracle agrees bit-for-bit.
    → Dataset (group_col, p{pct}... int64)."""
    pcts = sorted(percentiles)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                group_col: t.column(group_col).to_numpy(
                    zero_copy_only=False
                ),
                value_col: t.column(value_col).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        out = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        h = (
            g.groupby(value_col, sort=True)["c"].sum().sort_index()
        )
        vals = h.index.to_numpy(dtype=np.int64)
        cum = h.to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        row = {group_col: [g[group_col].iloc[0]]}
        for p in pcts:
            # smallest v with 100*cum >= p*n (integer arithmetic)
            idx = int(np.searchsorted(100 * cum, p * n, side="left"))
            row[f"p{p}"] = np.array([vals[idx]], dtype=np.int64)
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finalize, batch_format="pandas")
    )


# --- queries() wrappers (column names match oracle_sql) ----------------------

BM25_TERMS = ["hash", "merge", "spark", "table"]
SAMPLE_PERMILLE = {"en": 400, "de": 300, "es": 200, "fr": 100}
SAMPLE_DEFAULT_PERMILLE = 250


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    from ..util import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def doc_bm25_q(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = bm25_scores(ds, "doc_id", "text", BM25_TERMS)
    return out.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "bm25": pc.round(t["bm25"], 6)}
        ),
        batch_format="pyarrow",
    ).sort("doc_id")


def doc_top3_source_q(sf_dir: str) -> "ray.data.Dataset":
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    out = top_k_per_group(
        ds, "source", "n_chars", "doc_id", k=3,
        keep_cols=["source", "doc_id", "n_chars"],
    )
    return out.sort(["source", "rnk"])


def doc_sample_q(sf_dir: str) -> "ray.data.Dataset":
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return sample_stratified(
        ds, "doc_id", "lang", SAMPLE_PERMILLE, SAMPLE_DEFAULT_PERMILLE
    ).sort("doc_id")


def events_value_quantiles_q(sf_dir: str) -> "ray.data.Dataset":
    """Exact p50/p90/p99 of the event value per event_type (discrete /
    type-1 quantiles over near-continuous doubles — the SLO-style
    percentile report)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return float_quantiles_by_group(
        ds, "event_type", "value", [50, 90, 99]
    ).sort("event_type")


def doc_len_quantiles_q(sf_dir: str) -> "ray.data.Dataset":
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def add_tokens(t: pa.Table) -> pa.Table:
        return pa.table(
            {"lang": t["lang"],
             "n_tokens": pa.array(token_count(_texts(t, "text")))}
        )

    withtok = ds.map_batches(add_tokens, batch_format="pyarrow")
    return int_quantiles_by_group(
        withtok, "lang", "n_tokens", [50, 90, 99]
    ).sort("lang")


def dedup_near_keep_q(sf_dir: str) -> "ray.data.Dataset":
    from ..dedup.cluster import near_dedup_keep

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return near_dedup_keep(ds, "doc_id", "text", threshold=0.5, rounds=6)


# --- vector aggregate: per-group embedding centroids --------------------------

EMB_DIM = 64


def vector_centroids(
    ds: "ray.data.Dataset", group_col: str, vec_col: str, dim: int
) -> "ray.data.Dataset":
    """Mean embedding per group → Dataset (label, dim, centroid), one
    row per (group, dimension). The k-means / IVF-training building
    block, shaped for scale: each batch collapses to |groups|·dim
    partial (sum, count) rows before the only shuffle (a groupby on the
    combined group·dim key), so shuffle volume is independent of row
    count."""
    dim_arange = np.arange(dim, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column(vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # flatten() (not .values) honors list-array slicing offsets;
        # cast each float32 element to float64 BEFORE summing, exactly
        # like SQL's sum(CAST(e AS DOUBLE))
        vals = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        m = vals.reshape(t.num_rows, dim)
        lab = t.column(group_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.float64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        ld = (uniq[:, None] * dim + dim_arange[None, :]).ravel()
        return table_from_arrays(
            ld=ld, s=sums.ravel(), c=np.repeat(cnt, dim)
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ld")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # post-groupby empties are schema-less
            return pa.table(
                {"label": pa.array([], pa.int64()),
                 "dim": pa.array([], pa.int64()),
                 "centroid": pa.array([], pa.float64())}
            )
        ld = t.column("ld").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        return table_from_arrays(
            label=ld // dim, dim=ld % dim, centroid=s / c
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def embed_centroids_q(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.compute as pc

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    out = vector_centroids(ds, "label", "embedding", EMB_DIM)
    return out.map_batches(
        lambda t: pa.table(
            {"label": t["label"], "dim": t["dim"],
             "centroid": pc.round(t["centroid"], 6)}
        ),
        batch_format="pyarrow",
    ).sort(["label", "dim"])


def gram_matrix(
    ds: "ray.data.Dataset", vec_col: str, dim: int,
    upper_only: bool = True,
) -> "ray.data.Dataset":
    """Second-moment (Gram) matrix of an embedding corpus → Dataset
    (i, j, m) with m = Σ_n x_ni·x_nj / N — THE covariance/PCA building
    block. Scale shape: each batch collapses to a dim² float64 partial
    (one ``X.T @ X`` einsum, constant size regardless of batch rows)
    before the only shuffle, so shuffle volume is dim²·blocks —
    independent of corpus size. float32 elements are cast to float64
    BEFORE multiplying, exactly like SQL's CAST(e AS DOUBLE)."""
    from ray.data.aggregate import Sum

    iu, ju = np.triu_indices(dim) if upper_only else (
        np.repeat(np.arange(dim), dim), np.tile(np.arange(dim), dim)
    )
    key = iu.astype(np.int64) * dim + ju

    def partial(t: pa.Table) -> pa.Table:
        arr = t.column(vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        X = vals.reshape(t.num_rows, dim)
        G = X.T @ X
        return table_from_arrays(
            ij=key, s=G[iu, ju],
            c=np.full(len(key), t.num_rows, dtype=np.int64),
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ij")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"i": pa.array([], pa.int64()),
                 "j": pa.array([], pa.int64()),
                 "m": pa.array([], pa.float64())}
            )
        ij = col_np(t, "ij").astype(np.int64)
        s = col_np(t, "s").astype(np.float64)
        c = col_np(t, "c").astype(np.float64)
        return table_from_arrays(i=ij // dim, j=ij % dim, m=s / c)

    return agg.map_batches(finalize, batch_format="pyarrow")


def embed_cov_q(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.compute as _pc

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    out = gram_matrix(ds, "embedding", EMB_DIM, upper_only=True)
    return out.map_batches(
        lambda t: pa.table(
            {"i": t["i"], "j": t["j"], "m": _pc.round(t["m"], 6)}
        ),
        batch_format="pyarrow",
    ).sort(["i", "j"])


def embed_pca8_q(sf_dir: str, rounds: int = 8) -> pa.Table:
    """Top principal direction of the embedding corpus by POWER
    ITERATION on the distributed Gram matrix: v₀ = 1⃗, v_{t+1} =
    M·v_t / ‖M·v_t‖₂ for a fixed 8 rounds (fixed-round semantics like
    pipelines.traversal, so the DuckDB oracle replays the identical
    trajectory with an unrolled CTE chain). The corpus-sized work — the
    Gram accumulation — is fully distributed (see gram_matrix); only
    the dim²-constant matrix and the dim-length iterate live on the
    driver, the same vertex-state-sized discipline as pipelines/cc."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    gm = gram_matrix(ds, "embedding", EMB_DIM, upper_only=False)
    M = np.zeros((EMB_DIM, EMB_DIM), dtype=np.float64)
    for t in gm.iter_batches(batch_format="pyarrow"):
        M[col_np(t, "i"), col_np(t, "j")] = col_np(t, "m")
    v = np.ones(EMB_DIM, dtype=np.float64)
    for _ in range(rounds):
        u = M @ v
        v = u / np.sqrt((u * u).sum())
    return pa.table(
        {
            "dim": pa.array(np.arange(EMB_DIM, dtype=np.int64)),
            "v": pa.array(np.round(v, 6), pa.float64()),
        }
    )


def doc_curate_q(sf_dir: str) -> "ray.data.Dataset | pa.Table":
    """END-TO-END corpus curation: the composition a training-data user
    actually runs — near-dup removal ∩ token-length band ∩ language
    agreement → kept doc_ids.

    1. keep set: MinHash near-dedup hash-min clustering (the
       dedup_near_keep pipeline verbatim);
    2. quality band: corpus-wide type-1 p10..p90 token-count band —
       per-batch sparse histogram partials collapse BEFORE the only
       shuffle, thresholds from the tiny aggregated histogram;
    3. language: n-gram langid prediction must agree with the declared
       lang column.
    All three are the engine's own distributed operators; one final
    doc_id hash join intersects them. The SQL oracle embeds the same
    three sub-oracles as subqueries."""
    from ray.data.aggregate import Sum

    from ..dedup.cluster import near_dedup_keep
    from ..functions.textfn import langid, token_count
    from ..util import (
        col_np,
        compact_nonempty,
        read_parquet_clean,
        sparse_sum_reduce,
        table_from_arrays,
    )

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    keep = near_dedup_keep(
        docs.select_columns(["doc_id", "text"]), "doc_id", "text",
        threshold=0.5, rounds=6,
    )

    def feats(t: pa.Table) -> pa.Table:
        texts = _texts(t, "text")
        nt = token_count(texts).astype(np.int64)
        lp = np.asarray(langid(texts), dtype=object)
        declared = t.column("lang").to_numpy(zero_copy_only=False)
        return table_from_arrays(
            doc_id=col_np(t, "doc_id").astype(np.int64), nt=nt
        ).append_column("lang_ok", pa.array(lp == declared))

    feats_ds = docs.map_batches(feats, batch_format="pyarrow").materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        k, c = sparse_sum_reduce(
            col_np(t, "nt"), np.ones(t.num_rows, dtype=np.int64)
        )
        return table_from_arrays(nt=k, c=c)

    hist = (
        feats_ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("nt")
        .aggregate(Sum("c", alias_name="c"))
        .sort("nt")
        .to_pandas()
    )
    if "c" not in hist.columns:  # zero-row to_pandas drops all columns
        hist = pd.DataFrame({"nt": [], "c": []})
    cum = hist["c"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    nts = hist["nt"].to_numpy()

    def thr(pct: int) -> int:  # type-1: min nt with 100*cum >= pct*n
        idx = np.flatnonzero(100 * cum >= pct * n)
        return int(nts[idx[0]]) if len(idx) else 0

    p10, p90 = thr(10), thr(90)

    def band(t: pa.Table, _lo=p10, _hi=p90) -> pa.Table:
        nt = t.column("nt")
        m = pc.and_(
            pc.and_(pc.greater_equal(nt, _lo), pc.less_equal(nt, _hi)),
            t.column("lang_ok"),
        )
        return t.filter(m).select(["doc_id"])

    passed = compact_nonempty(
        feats_ds.map_batches(band, batch_format="pyarrow")
    )
    kept = compact_nonempty(keep)
    if passed is None or kept is None:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return (
        passed.join(
            kept.rename_columns({"doc_id": "k_"}),
            join_type="inner", num_partitions=8,
            on=("doc_id",), right_on=("k_",),
        )
        .select_columns(["doc_id"])
        .sort("doc_id")
    )


def weighted_sample_top_k(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int = 20,
    prefix: str = "wsmp:",
) -> "ray.data.Dataset":
    """Deterministic WEIGHTED sampling without replacement
    (Efraimidis–Spirakis A-ES): key = u^(1/w) with u derived from the
    md5 hash of the id (replayable — no RNG state, identical sample on
    every run / resume), top-k keys win. Per-batch partial top-k bounds
    the final sort's input at k·num_blocks rows.
    → (id_col, weight_col, k_score) ordered by (k_score DESC, id)."""

    def score(t: pa.Table, _k=k) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = np.array(
            [
                int(hashlib.md5(f"{prefix}{i}".encode()).hexdigest()[:16], 16)
                for i in ids
            ],
            dtype=np.uint64,
        )
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        w = np.maximum(
            t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64),
            1.0,
        )
        key = np.round(np.power(u, 1.0 / w), 9)
        out = t.append_column("k_score", pa.array(key, pa.float64()))
        # batch-local prune: only the top k rows can reach the global top k
        order = np.lexsort((ids, -key))[:_k]
        return out.take(pa.array(np.sort(order)))

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["k_score", id_col], descending=[True, False])
        .limit(k)
    )


def doc_sample_weighted_q(sf_dir: str) -> "ray.data.Dataset":
    """Length-weighted corpus sample: 20 docs drawn A-ES-weighted by
    n_chars (longer docs proportionally likelier), bit-replayable via
    the md5 hash scheme shared with sample_stratified."""
    from ..util import read_parquet_clean

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return weighted_sample_top_k(docs, "doc_id", "n_chars", k=20)
