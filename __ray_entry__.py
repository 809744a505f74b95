"""Driver contract for the imtag_ray engine.

``entry()`` runs the flagship link-graph pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 inventory + training-data ops); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible query (same column
names; floats rounded identically on both sides).

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/ray.shutdown() anywhere in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: documents → synthesized HTML pages → link
    extraction (actor pool) → graph build (vid dictionary, dedup) →
    connected components + PageRank → joined per-vertex table."""
    import pyarrow as pa
    import ray

    from imtag_ray.config import EngineConfig
    from imtag_ray.pipelines.cc import connected_components
    from imtag_ray.pipelines.pagerank import pagerank
    from imtag_ray.pipelines.queries import doc_pages
    from imtag_ray.stages.extract import link_extract_fn
    from imtag_ray.stages.graph_build import build_graph, degrees
    from imtag_ray.util import col_np, dataset_to_numpy

    cfg = EngineConfig(num_partitions=8, max_iterations=50)
    pages = doc_pages(SF_SMOKE)
    edges = pages.select_columns(["url", "html"]).map_batches(
        link_extract_fn, batch_format="pyarrow", batch_size=256
    )
    graph = build_graph(edges, cfg)
    cc = connected_components(graph, cfg)
    comp = dataset_to_numpy(cc.sort("vid"), "component_id")["component_id"]
    pr = pagerank(graph, cfg, mode="broadcast")
    out = dataset_to_numpy(pr.sort("vid"), "vid", "url", "rank")
    deg = degrees(graph, "out")
    return pa.table(
        {
            "vid": pa.array(out["vid"], pa.int64()),
            "url": pa.array([str(u) for u in out["url"]], pa.string()),
            "component_id": pa.array(comp, pa.int64()),
            "rank": pa.array(out["rank"], pa.float64()),
            "out_degree": pa.array(deg, pa.int64()),
        }
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from imtag_ray.pipelines import dataops as d
    from imtag_ray.pipelines import queries as q
    from imtag_ray.pipelines import scoring as s
    from imtag_ray.pipelines import sketch as sk
    from imtag_ray import relational as r

    return {
        # --- extraction pipeline (pages → edges/texts) ---------------------
        "doc_edges": q.doc_edges_q,
        "doc_anchors": q.doc_anchors_q,
        "doc_link_density": q.doc_link_density_q,
        "doc_anchor_index": q.doc_anchor_index_q,
        "doc_source_graph": q.doc_source_graph_q,
        "doc_source_cut": q.doc_source_cut_q,
        "doc_cocitation": q.doc_cocitation_q,
        "doc_texts": q.doc_texts_q,
        # --- graph analytics ----------------------------------------------
        "copart_edges": q.copart_edges_q,
        "copart_weighted": q.copart_weighted_q,
        "copart_feature_agg2": q.copart_feature_agg2_q,
        "copart_negatives": q.copart_negatives_q,
        "copart_harmonic8": q.copart_harmonic8_q,
        "doc_sample3_per_source": d.doc_sample3_per_source_q,
        "copart_backbone": q.copart_backbone_q,
        "copart_degree": q.copart_degree_q,
        "copart_top20": q.copart_top20_q,
        "copart_triangles": q.copart_triangles_q,
        "copart_pagerank12": q.copart_pagerank12_q,
        "geo_components": q.geo_components_q,
        "doc_components_inc": q.doc_components_inc_q,
        "geo_component_sizes": q.geo_component_sizes_q,
        "geo_labelprop": q.geo_labelprop_q,
        "geo_modularity": q.geo_modularity_q,
        "geo_quotient": q.geo_quotient_q,
        "geo_percolation": q.geo_percolation_q,
        "geo_attack": q.geo_attack_q,
        "lattice_components48": q.lattice_components48_q,
        "lattice_holes48": q.lattice_holes48_q,
        "lattice_components48_eight": q.lattice_components48_eight_q,
        "doc_hits8": q.doc_hits8_q,
        "doc_graphlets": q.doc_graphlets_q,
        "doc_salsa": q.doc_salsa_q,
        "doc_salsa_hubs": q.doc_salsa_hubs_q,
        "doc_scc": q.doc_scc_q,
        "doc_bowtie": q.doc_bowtie_q,
        "doc_scc_cond": q.doc_scc_cond_q,
        "doc_scc_depth4": q.doc_scc_depth4_q,
        "doc_walks4": q.doc_walks4_q,
        "doc_walk_pairs": q.doc_walk_pairs_q,
        "doc_source_rank": q.doc_source_rank_q,
        "embed_mmr8": d.embed_mmr_q,
        "doc_hyperanf3": q.doc_hyperanf3_q,
        "doc_harmonic3": q.doc_harmonic3_q,
        "copart_mis3": q.copart_mis3_q,
        "copart_color3": q.copart_color3_q,
        "copart_match3": q.copart_match3_q,
        "copart_msf2": q.copart_msf2_q,
        "doc_bc8": q.doc_bc8_q,
        "doc_eigen8": q.doc_eigen8_q,
        "doc_katz8": q.doc_katz8_q,
        "doc_nf4": q.doc_nf4_q,
        "doc_effdiam4": q.doc_effdiam4_q,
        "copart_bfs12": q.copart_bfs12_q,
        "copart_bfs_tree12": q.copart_bfs_tree12_q,
        "copart_bipartite12": q.copart_bipartite12_q,
        "copart_sssp16": q.copart_sssp16_q,
        "copart_kcore3": q.copart_kcore3_q,
        "copart_densest4": q.copart_densest4_q,
        "copart_densest1_members": q.copart_densest1_members_q,
        "copart_shells6": q.copart_shells6_q,
        "copart_lpa4": q.copart_lpa4_q,
        "copart_jdm": q.copart_jdm_q,
        "copart_wl2": q.copart_wl2_q,
        "copart_truss4": q.copart_truss4_q,
        "copart_adamic": q.copart_adamic_q,
        "copart_clustering": q.copart_clustering_q,
        "copart_ppr12": q.copart_ppr12_q,
        "copart_stats": q.copart_stats_q,
        "copart_ball2": q.copart_ball2_q,
        "copart_ball2_hll": q.copart_ball2_hll_q,
        "copart_wpagerank8": q.copart_wpagerank8_q,
        "copart_edge_jaccard": q.copart_edge_jaccard_q,
        "doc_bridges": q.doc_bridges_q,
        "copart_nbr_top3": q.copart_nbr_top3_q,
        "doc_reciprocity": q.doc_reciprocity_q,
        "copart_richclub": q.copart_richclub_q,
        "copart_diam16": q.copart_diam16_q,
        # --- text analysis -------------------------------------------------
        "doc_token_stats": d.doc_token_stats_q,
        "doc_bpe_tokens": d.doc_bpe_tokens_q,
        "doc_langid": d.doc_langid_q,
        "doc_lang_confusion": d.doc_lang_confusion_q,
        "source_scorecard": d.source_scorecard_q,
        "doc_fingerprint": d.doc_fingerprint_q,
        "doc_tfidf": d.doc_tfidf_q,
        "doc_keywords": d.doc_keywords_q,
        "doc_cooccur": d.doc_cooccur_q,
        "doc_dup_ngrams": d.doc_dup_ngrams_q,
        "doc_dup_coverage": d.doc_dup_coverage_q,
        "doc_zipf": d.doc_zipf_q,
        "doc_ttr": d.doc_ttr_q,
        "doc_pii": d.doc_pii_q,
        "doc_rrf": d.doc_rrf_q,
        "doc_gopher": d.doc_gopher_q,
        "doc_cosine_pairs": d.doc_cosine_pairs_q,
        "doc_buckets10": d.doc_buckets10_q,
        "doc_budget10k": d.doc_budget10k_q,
        "doc_winnow": d.doc_winnow_q,
        "bpe_merge_pairs": d.bpe_merge_pairs_q,
        "winnow_pairs": d.winnow_pairs_q,
        "dedup_decontam": d.dedup_decontam_q,
        "dedup_multisignal": d.dedup_multisignal_q,
        "doc_oov100": d.doc_oov100_q,
        "doc_pack512": d.doc_pack512_q,
        "doc_bigram_coverage": d.doc_bigram_coverage_q,
        # --- dedup ---------------------------------------------------------
        "dedup_exact": d.dedup_exact_q,
        "minhash_pairs": d.minhash_pairs_q,
        "dedup_src_matrix": d.dedup_src_matrix_q,
        "dedup_cluster_sizes": d.dedup_cluster_sizes_q,
        "simhash_pairs": d.simhash_pairs_q,
        "simhash_table": d.simhash_table_q,
        "ngram_pairs": d.ngram_pairs_q,
        "lev_pairs": d.lev_pairs_q,
        "prefix_pairs": d.prefix_pairs_q,
        "containment_pairs": d.containment_pairs_q,
        "dedup_near_keep": s.dedup_near_keep_q,
        "doc_curate": s.doc_curate_q,
        # --- corpus scoring / selection -------------------------------------
        "doc_bm25": s.doc_bm25_q,
        "doc_top3_source": s.doc_top3_source_q,
        "doc_sample": s.doc_sample_q,
        "doc_sample_weighted": s.doc_sample_weighted_q,
        "doc_len_quantiles": s.doc_len_quantiles_q,
        "events_value_quantiles": s.events_value_quantiles_q,
        # --- similarity search --------------------------------------------
        "embed_knn": d.embed_knn_q,
        "embed_knn_graph": d.embed_knn_graph_q,
        "embed_knn_ivf": d.embed_knn_ivf_q,
        "embed_dup_pairs": d.embed_dup_pairs_q,
        "embed_dup_pairs_lsh": d.embed_dup_pairs_lsh_q,
        "embed_centroids": s.embed_centroids_q,
        "embed_kmeans": d.embed_kmeans_q,
        "embed_sq8": d.embed_sq8_q,
        "embed_pq4": d.embed_pq4_q,
        "embed_adc3": d.embed_adc3_q,
        "embed_adc_recall": d.embed_adc_recall_q,
        "embed_hard_negatives": d.embed_hard_negatives_q,
        # --- relational / windowed ----------------------------------------
        "q1_pricing": r.q1_pricing_summary,
        "q5_revenue": r.q5_revenue,
        "q3_shipping": r.q3_shipping,
        "q6_forecast": r.q6_forecast,
        "q18_large_orders": r.q18_large_orders,
        "q4_late": r.q4_late,
        "q13_custdist": r.q13_custdist,
        "q7_volume": r.q7_volume,
        "q10_returned": r.q10_returned,
        "q14_promo": r.q14_promo,
        "q17_small_qty": r.q17_small_quantity,
        "q19_disjunct": r.q19_disjunct,
        "q15_top_supplier": r.q15_top_supplier,
        "q12_priority": r.q12_priority,
        "q22_idle": r.q22_idle_customers,
        "q21_holdup": r.q21_holdup,
        "q8_share": r.q8_market_share,
        "q9_profit": r.q9_product_profit,
        "q2_mincost": r.q2_min_cost_supplier,
        "q11_value": r.q11_important_parts,
        "q16_suppcnt": r.q16_supplier_counts,
        "q20_dominant": r.q20_dominant_suppliers,
        "embed_kcenter4": d.embed_kcenter_q,
        "orders_stats": r.orders_stats,
        "events_burst": r.events_burst,
        "events_json_k": r.events_json_k,
        "doc_surprisal": d.doc_surprisal_q,
        "doc_split_manifest": d.doc_split_manifest_q,
        "events_hourly_topk": r.events_hourly_topk,
        "events_rfm": r.events_rfm,
        "top_customers": r.top_customers_by_revenue,
        "events_hourly": r.events_hourly_windows,
        "events_sessions": r.events_sessionize,
        "events_windows": r.events_window_funcs,
        "events_asof": r.events_asof_latest_order,
        "events_conv24": r.events_conversion_window,
        "cust_no_orders": r.customers_without_orders,
        "events_type_users": r.events_type_user_counts,
        "events_trailing1h": r.events_trailing_counts,
        "supplier_parts": r.supplier_part_counts,
        "cust_order_stats": r.customer_order_stats,
        "orders_rollup": r.orders_rollup,
        "orders_cube": r.orders_cube,
        "events_zscore": r.events_zscore,
        "events_assoc": r.events_assoc,
        "events_transitions": r.events_transitions,
        "events_gaps": r.events_gaps,
        "events_funnel": r.events_funnel,
        "events_retention": r.events_retention,
        "events_dau_wau": r.events_dau_wau,
        "events_session_hist": r.events_session_hist,
        "events_concurrency": r.events_concurrency,
        "copart_deg_hist": q.copart_deg_hist_q,
        "copart_squares": q.copart_squares_q,
        "copart_avg_nbr_deg": q.copart_avg_nbr_deg_q,
        "doc_degree_corr": q.doc_degree_corr_q,
        "events_pivot": r.events_pivot,
        "embed_cov": s.embed_cov_q,
        "embed_pca8": s.embed_pca8_q,
        "embed_knn_cc": d.embed_knn_cc_q,
        "embed_outlier3": d.embed_outlier3_q,
        # --- sketches --------------------------------------------------------
        "events_audio_features": d.events_audio_features_q,
        "doc_image_features": d.doc_image_features_q,
        "events_hll_users": sk.events_hll_users_q,
        "events_hll_hourly": sk.events_hll_hourly_q,
        "events_cms_types": sk.events_cms_types_q,
        "events_bloom_hot_users": sk.events_bloom_hot_users_q,
    }


_COPART_PAIRS = """
    SELECT DISTINCT a.l_partkey AS pa_, b.l_partkey AS pb_
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""

_PURL = "'part://' || lpad(CAST({c} AS VARCHAR), 9, '0')"

_GEO_EDGES = """
    SELECT 'n://' || lpad(CAST(n_nationkey AS VARCHAR),4,'0') AS s,
           'r://' || lpad(CAST(n_regionkey AS VARCHAR),4,'0') AS d FROM nation
    UNION ALL
    SELECT 'c://' || lpad(CAST(c_custkey AS VARCHAR),9,'0'),
           'n://' || lpad(CAST(c_nationkey AS VARCHAR),4,'0') FROM customer
    UNION ALL
    SELECT 's://' || lpad(CAST(s_suppkey AS VARCHAR),9,'0'),
           'n://' || lpad(CAST(s_nationkey AS VARCHAR),4,'0') FROM supplier
"""

_GEO_COMPONENTS = f"""
    WITH RECURSIVE e(s, d) AS ({_GEO_EDGES}),
    und AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
    verts(v) AS (SELECT DISTINCT s FROM und),
    reach(v, l) AS (
        SELECT v, v FROM verts
        UNION
        SELECT u.d, r.l FROM reach r JOIN und u ON u.s = r.v
    ),
    minl AS (SELECT v, min(l) AS ml FROM reach GROUP BY v)
"""

_DOC_TARGETS = """
    SELECT doc_id, 0 AS ord, doc_id % 10 AS tgt FROM documents
    UNION ALL
    SELECT doc_id, j, (doc_id * 7 + 13 * j) % (SELECT count(*) FROM documents)
    FROM (SELECT doc_id, unnest(range(1, 2 + doc_id % 5)) AS j FROM documents)
"""

_DURL = "'https://docs.example/d' || CAST({c} AS VARCHAR)"

# --- hash-scheme oracles (exact SQL replays of the engine's dedup /
# ANN pipelines; every constant below mirrors the engine's defaults) ---

# Python-normalized text: " ".join(text.split())
_STRIP = r"regexp_replace(coalesce(text,''), '^\s+|\s+$', '', 'g')"

_NGRAM_SQL = r"""
    WITH norm AS (
      SELECT doc_id, source,
             trim(regexp_replace(coalesce(text,''), '\s+', ' ', 'g')) AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             CASE WHEN length(t) = 0 THEN CAST([] AS VARCHAR[])
                  WHEN length(t) < 3 THEN [t]
                  ELSE list_distinct(list_transform(range(1, length(t) - 1),
                                     i -> substring(t, CAST(i AS INTEGER), 3)))
             END AS g
      FROM norm
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.g, b.g)) AS i,
             len(a.g) AS la, len(b.g) AS lb
      FROM grams a JOIN grams b
        ON a.source = b.source AND a.doc_id < b.doc_id
    ),
    j AS (
      SELECT id_a, id_b,
             CASE WHEN la = 0 AND lb = 0 THEN 1.0
                  ELSE CAST(i AS DOUBLE) / (la + lb - i) END AS jac
      FROM pairs
    )
    SELECT id_a, id_b, round(jac, 9) AS jaccard FROM j
    WHERE jac >= 0.55 ORDER BY id_a, id_b
"""

# per-doc 64-bit simhash values (md5 token hashes + bit majority)
_SIMHASH_TABLE_SQL = rf"""
    WITH stripped AS (
      SELECT doc_id, {_STRIP} AS s FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(s, '\s+')) AS tk
      FROM stripped WHERE s != ''
    ),
    th AS (
      SELECT doc_id, CAST('0x' || substring(md5(tk), 1, 16) AS UBIGINT) AS h
      FROM tok
    ),
    bitscore AS (
      SELECT doc_id, j,
             sum(CASE WHEN (h >> CAST(j AS UTINYINT)) & 1 = 1
                 THEN 1 ELSE -1 END) AS score
      FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j) bits
      GROUP BY doc_id, j
    ),
    sh0 AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN score > 0
                  THEN CAST(1 AS HUGEINT) << CAST(j AS INTEGER)
                  ELSE 0 END) AS UBIGINT) AS h
      FROM bitscore GROUP BY doc_id
    )
    SELECT d.doc_id,
           lower(lpad(hex(CAST(coalesce(s.h, 0) AS UBIGINT)), 16, '0'))
               AS simhash_hex
    FROM documents d LEFT JOIN sh0 s ON s.doc_id = d.doc_id
    ORDER BY d.doc_id
"""

_SIMHASH_SQL = rf"""
    WITH stripped AS (
      SELECT doc_id, {_STRIP} AS s FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(s, '\s+')) AS tk
      FROM stripped WHERE s != ''
    ),
    th AS (
      SELECT doc_id, CAST('0x' || substring(md5(tk), 1, 16) AS UBIGINT) AS h
      FROM tok
    ),
    bitscore AS (
      SELECT doc_id, j,
             sum(CASE WHEN (h >> CAST(j AS UTINYINT)) & 1 = 1
                 THEN 1 ELSE -1 END) AS score
      FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j) bits
      GROUP BY doc_id, j
    ),
    sh0 AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN score > 0
                  THEN CAST(1 AS HUGEINT) << CAST(j AS INTEGER)
                  ELSE 0 END) AS UBIGINT) AS h
      FROM bitscore GROUP BY doc_id
    ),
    sh AS (
      SELECT d.doc_id, coalesce(s.h, 0) AS h
      FROM documents d LEFT JOIN sh0 s ON s.doc_id = d.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.h, b.h)) AS INTEGER) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= 8
    ORDER BY id_a, id_b
"""


_LANGID_PRED = """
            WITH t AS (
                SELECT doc_id,
                       ' ' || regexp_replace(lower(coalesce(text, '')),
                                             '\\s+', ' ', 'g') || ' ' AS s
                FROM documents
            ),
            c AS (
                SELECT doc_id,
                    (length(s)-length(replace(s,' der ','')))/5
                  + (length(s)-length(replace(s,' und ','')))/5
                  + (length(s)-length(replace(s,' die ','')))/5
                  + (length(s)-length(replace(s,' nicht ','')))/7 AS c_de,
                    (length(s)-length(replace(s,' the ','')))/5
                  + (length(s)-length(replace(s,' and ','')))/5
                  + (length(s)-length(replace(s,' of ','')))/4
                  + (length(s)-length(replace(s,' is ','')))/4 AS c_en,
                    (length(s)-length(replace(s,' el ','')))/4
                  + (length(s)-length(replace(s,' los ','')))/5
                  + (length(s)-length(replace(s,' las ','')))/5
                  + (length(s)-length(replace(s,' una ','')))/5 AS c_es,
                    (length(s)-length(replace(s,' le ','')))/4
                  + (length(s)-length(replace(s,' les ','')))/5
                  + (length(s)-length(replace(s,' des ','')))/5
                  + (length(s)-length(replace(s,' est ','')))/5 AS c_fr
                FROM t
            )
            SELECT doc_id,
                   CASE WHEN c_de=0 AND c_en=0 AND c_es=0 AND c_fr=0 THEN 'und'
                        WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                        WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
                        WHEN c_es >= c_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM c 
        """


def _minhash_sql() -> str:
    """Exact SQL replay of the MinHash-LSH pipeline: the permutation
    constants are the engine's own (perm_params(128, seed=100)), the
    (sh·a+b) mod 2^61−1 hash is computed in HUGEINT, candidates are the
    band-signature-equality pairs, verification is exact shingle-set
    Jaccard — identical to imtag_ray.dedup.minhash at threshold 0.5."""
    from imtag_ray.dedup.minhash import (
        DEFAULT_BANDS, DEFAULT_NUM_PERM, DEFAULT_SEED, perm_params,
    )

    a, b = perm_params(DEFAULT_NUM_PERM, DEFAULT_SEED)
    rows = DEFAULT_NUM_PERM // DEFAULT_BANDS
    vals = ",\n        ".join(
        f"({p}, {int(a[p])}, {int(b[p])})" for p in range(DEFAULT_NUM_PERM)
    )
    return rf"""
    WITH perms(p, a, b) AS (VALUES
        {vals}
    ),
    toks AS (
      SELECT doc_id, {_STRIP} AS s,
             regexp_split_to_array({_STRIP}, '\s+') AS tk
      FROM documents
    ),
    shingle_strs AS (
      SELECT doc_id,
        CASE WHEN s = '' THEN CAST([] AS VARCHAR[])
             WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
             ELSE list_transform(range(1, len(tk) - 1),
                                 i -> array_to_string(tk[i:i+2], ' '))
        END AS sgl
      FROM toks
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             CAST('0x' || substring(md5(g), 1, 16) AS UBIGINT) AS h
      FROM (SELECT doc_id, unnest(sgl) AS g FROM shingle_strs)
    ),
    sigv AS (
      SELECT s.doc_id, p.p,
             min((CAST(s.h AS HUGEINT) * p.a + p.b)
                 % 2305843009213693951) AS v
      FROM sh s CROSS JOIN perms p
      GROUP BY s.doc_id, p.p
    ),
    sig AS (
      SELECT d.doc_id, p.p, coalesce(sv.v, 2305843009213693951) AS v
      FROM (SELECT doc_id FROM documents) d CROSS JOIN perms p
      LEFT JOIN sigv sv ON sv.doc_id = d.doc_id AND sv.p = p.p
    ),
    bands AS (
      SELECT doc_id, CAST(p // {rows} AS INTEGER) AS band,
             list(v ORDER BY p) AS chunk
      FROM sig GROUP BY doc_id, CAST(p // {rows} AS INTEGER)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS i
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b AND sb.h = sa.h
      GROUP BY c.id_a, c.id_b
    ),
    jac AS (
      SELECT c.id_a, c.id_b,
             CASE WHEN coalesce(na.n, 0) = 0 AND coalesce(nb.n, 0) = 0
                  THEN 1.0
                  ELSE CAST(coalesce(i.i, 0) AS DOUBLE)
                       / (coalesce(na.n, 0) + coalesce(nb.n, 0)
                          - coalesce(i.i, 0))
             END AS jv
      FROM cand c
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      LEFT JOIN sizes na ON na.doc_id = c.id_a
      LEFT JOIN sizes nb ON nb.doc_id = c.id_b
    )
    SELECT id_a, id_b, round(jv, 9) AS jaccard FROM jac
    WHERE jv >= 0.5 ORDER BY id_a, id_b
"""


def _lsh_sql() -> str:
    """Exact SQL replay of hyperplane-LSH near-dup: the seeded Gaussian
    hyperplanes are inlined as DOUBLE[] literals (repr round-trips to
    the identical float64), bucket = packed sign bits per table,
    candidates = bucket equality, verification = exact cosine ≥ 0.35."""
    from imtag_ray.ann.knn import LSH_BITS, LSH_TABLES, lsh_hyperplanes
    from imtag_ray.pipelines.dataops import EMB_DIM

    planes = lsh_hyperplanes(EMB_DIM, LSH_TABLES, LSH_BITS)
    rows = []
    for t in range(LSH_TABLES):
        for b in range(LSH_BITS):
            vec = ", ".join(repr(float(x)) for x in planes[t * LSH_BITS + b])
            rows.append(f"({t}, {b}, [{vec}])")
    vals = ",\n        ".join(rows)
    return f"""
    WITH planes(tbl, bit, pv) AS (VALUES
        {vals}
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    buck AS (
      SELECT e.vec_id, p.tbl,
             sum(CASE WHEN list_cosine_similarity(e.v, p.pv) > 0
                 THEN CAST(1 AS BIGINT) << p.bit ELSE 0 END) AS bucket
      FROM e CROSS JOIN planes p
      GROUP BY e.vec_id, p.tbl
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buck a JOIN buck b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    sims AS (
      SELECT c.id_a, c.id_b, list_cosine_similarity(ea.v, eb.v) AS s
      FROM cand c
      JOIN e ea ON ea.vec_id = c.id_a
      JOIN e eb ON eb.vec_id = c.id_b
    )
    SELECT id_a, id_b, round(s, 9) AS cos_sim FROM sims
    WHERE s >= 0.35 ORDER BY id_a, id_b
"""


_IVF_SQL = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
    probes AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               row_number() OVER (PARTITION BY q.qid
                   ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid) AS rn
        FROM q CROSS JOIN cent c) WHERE rn <= 4
    ),
    sims AS (
      SELECT q.qid AS query_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(q.qv, e2.v) AS s
      FROM q JOIN probes p ON p.qid = q.qid
      JOIN asg a ON a.cid = p.cid
      JOIN e e2 ON e2.vec_id = a.vec_id
      WHERE a.vec_id != q.qid
    ),
    ranked AS (
      SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
      FROM sims
    )
    SELECT query_id, neighbor_id, round(s, 9) AS cos_sim
    FROM ranked WHERE rn <= 5 ORDER BY query_id, neighbor_id
"""


def _lp_unrolled_sql(rounds: int = 6) -> str:
    """Label-propagation oracle: K synchronous rounds unrolled as plain
    CTEs (a recursive CTE can reference its own name only once per
    term, but one LP round needs BOTH the old label of v and the
    neighbors' labels). Each round: per-(target, label) vote counts →
    winner by (count DESC, label ASC) → seeds clamped, no-vote vertices
    unchanged — exactly imtag_ray.pipelines.labelprop's update rule."""
    parts = [f"WITH e(s, d) AS ({_GEO_EDGES}),",
             "und AS (SELECT s, d FROM e UNION SELECT d, s FROM e),",
             "verts(v) AS (SELECT DISTINCT s FROM und),",
             "seeds AS (SELECT 'r://' || lpad(CAST(r_regionkey AS VARCHAR),4,'0') AS v,"
             "          'region_' || lpad(CAST(r_regionkey AS VARCHAR),4,'0') AS lab"
             "   FROM region),",
             "state0 AS (SELECT verts.v, seeds.lab FROM verts"
             "   LEFT JOIN seeds ON seeds.v = verts.v),"]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
    votes{r} AS (
        SELECT u.d AS v, s.lab, count(*) AS c
        FROM und u JOIN state{p} s ON s.v = u.s
        WHERE s.lab IS NOT NULL GROUP BY u.d, s.lab),
    win{r} AS (
        SELECT v, lab AS wlab FROM (
            SELECT v, lab, row_number() OVER
                (PARTITION BY v ORDER BY c DESC, lab) AS rn
            FROM votes{r}) WHERE rn = 1),
    state{r} AS (
        SELECT st.v,
               CASE WHEN sd.lab IS NOT NULL THEN sd.lab
                    WHEN w.wlab IS NOT NULL THEN w.wlab
                    ELSE st.lab END AS lab
        FROM state{p} st
        LEFT JOIN seeds sd ON sd.v = st.v
        LEFT JOIN win{r} w ON w.v = st.v),""")
    body = "\n".join(parts)
    body = body.rstrip().rstrip(",")
    return (body + f"""
    SELECT v AS url, coalesce(lab, '') AS label
    FROM state{rounds} ORDER BY url""")


def _geo_modularity_sql(rounds: int = 6) -> str:
    """Modularity oracle: the labelprop CTE chain (same trajectory as
    _lp_unrolled_sql) + Newman's per-community decomposition. m is the
    distinct directed-star edge count (the engine's deduped edge
    table); degree = undirected neighbor count from `und`."""
    lp = _lp_unrolled_sql(rounds)
    head = lp[: lp.rindex("SELECT v AS url")].rstrip()
    return head + f""",
    labs AS (SELECT v, coalesce(lab, '') AS lab FROM state{rounds}),
    m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e),
    intra AS (
        SELECT ls.lab, CAST(count(*) AS BIGINT) AS n_intra
        FROM e JOIN labs ls ON ls.v = e.s JOIN labs ld ON ld.v = e.d
        WHERE ls.lab = ld.lab GROUP BY ls.lab),
    degs AS (SELECT u.s AS v, count(*) AS dg FROM und u GROUP BY u.s),
    dsum AS (
        SELECT l.lab, CAST(sum(d.dg) AS BIGINT) AS deg_sum
        FROM degs d JOIN labs l ON l.v = d.v GROUP BY l.lab)
    SELECT ds.lab AS label, coalesce(i.n_intra, 0) AS n_intra, ds.deg_sum,
           round(coalesce(i.n_intra, 0) / m.m
                 - pow(ds.deg_sum / (2 * m.m), 2), 9) AS q_c
    FROM dsum ds LEFT JOIN intra i ON i.lab = ds.lab CROSS JOIN m
    ORDER BY label"""


def _geo_quotient_sql(rounds: int = 6) -> str:
    """Quotient-graph oracle: the labelprop CTE chain (identical
    trajectory to _lp_unrolled_sql) + contraction — each directed edge
    of `e` counted once under its unordered (least, greatest) label
    pair, exactly pipelines.quotient.quotient_edges' contract."""
    lp = _lp_unrolled_sql(rounds)
    head = lp[: lp.rindex("SELECT v AS url")].rstrip()
    return head + f""",
    labs AS (SELECT v, coalesce(lab, '') AS lab FROM state{rounds})
    SELECT least(ls.lab, ld.lab) AS label_a,
           greatest(ls.lab, ld.lab) AS label_b,
           CAST(count(*) AS BIGINT) AS weight
    FROM e JOIN labs ls ON ls.v = e.s JOIN labs ld ON ld.v = e.d
    GROUP BY 1, 2 ORDER BY label_a, label_b"""


def _wl_sql(rounds: int = 2) -> str:
    """1-WL oracle: degree colors, then R rounds of
    md5(own || '|' || string_agg(neighbor colors, ',' ORDER BY color))
    over the copart graph — pipelines.wl.wl_colors' exact contract
    (DuckDB md5 == hashlib md5; ORDER BY on hex strings == Python
    sorted). Output: the color-class histogram."""
    parts = [f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
             "und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs"
             " UNION ALL SELECT pb_, pa_ FROM pairs),",
             "c0 AS MATERIALIZED (SELECT s AS v,"
             " CAST(count(*) AS VARCHAR) AS c FROM und GROUP BY s),"]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"n{r} AS MATERIALIZED (SELECT u.s AS v,"
            f" string_agg(cp.c, ',' ORDER BY cp.c) AS nb"
            f" FROM und u JOIN c{p} cp ON cp.v = u.d GROUP BY u.s),")
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT cp.v,"
            f" md5(cp.c || '|' || coalesce(n.nb, '')) AS c"
            f" FROM c{p} cp LEFT JOIN n{r} n ON n.v = cp.v),")
    body = "\n".join(parts).rstrip().rstrip(",")
    return body + f"""
    SELECT c AS wl_color, CAST(count(*) AS BIGINT) AS n_vertices
    FROM c{rounds} GROUP BY c ORDER BY wl_color"""


def _geo_percolation_sql(thresholds=(64, 128, 192)) -> str:
    """Bond-percolation oracle: per threshold t, filter the directed
    geo edge rows by the md5-prefix-u64 % 256 scheme (identical to the
    engine's 'perc:' keys), then a recursive min-label closure over
    the surviving undirected edges seeded from ALL original vertices
    (pruned vertices stay singleton components) —
    pipelines.queries.geo_percolation_q's exact contract."""
    h = ("CAST('0x' || substring(md5('perc:' || s || ' ' || d), 1, 16)"
         " AS UBIGINT) % 256")
    parts = [f"WITH RECURSIVE e(s, d) AS ({_GEO_EDGES}),",
             "verts(v) AS (SELECT DISTINCT s FROM"
             " (SELECT s FROM e UNION SELECT d AS s FROM e)),"]
    sel = []
    for t in thresholds:
        parts.append(
            f"pe{t}(s, d) AS (SELECT s, d FROM e WHERE {h} < {t}),")
        parts.append(
            f"u{t} AS (SELECT s, d FROM pe{t}"
            f" UNION SELECT d, s FROM pe{t}),")
        parts.append(
            f"r{t}(v, l) AS (SELECT v, v FROM verts UNION"
            f" SELECT u.d, r.l FROM r{t} r JOIN u{t} u ON u.s = r.v),")
        parts.append(
            f"m{t} AS (SELECT v, min(l) AS ml FROM r{t} GROUP BY v),")
        parts.append(
            f"s{t} AS (SELECT {t} AS t,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM pe{t}) AS n_edges,"
            f" CAST(count(*) AS BIGINT) AS n_components,"
            f" CAST(max(cnt) AS BIGINT) AS max_size FROM"
            f" (SELECT ml, count(*) AS cnt FROM m{t} GROUP BY ml)),")
        sel.append(f"SELECT * FROM s{t}")
    body = "\n".join(parts).rstrip().rstrip(",")
    return body + "\n" + " UNION ALL ".join(sel) + " ORDER BY t"


def _hits_unrolled_sql(iters: int = 8) -> str:
    """HITS oracle: K iterations unrolled as chained CTEs over the doc
    link formula (a_r = in-sum of h_{r-1}, then h_r = out-sum of a_r;
    no per-iteration normalization — it's a scalar factor, applied once
    at the end, exactly as pipelines.traversal.hits computes it).
    Vertices whose score hits exact 0 drop out of the inner joins and
    re-enter as coalesce(0) at the end — identical to the engine's
    scatter-add zeros."""
    parts = [f"WITH targets AS ({_DOC_TARGETS}),",
             "e AS MATERIALIZED (SELECT DISTINCT doc_id AS s, tgt AS d FROM targets"
             "      WHERE tgt != doc_id),",
             "verts(v) AS (SELECT s FROM e UNION SELECT d FROM e),",
             "h0 AS (SELECT v, 1.0 AS x FROM verts),"]
    for r in range(1, iters + 1):
        # MATERIALIZED: a{iters} is referenced by both h{iters} and
        # fin, so an inlined chain is re-evaluated multiplicatively
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT e.d AS v, sum(h{r-1}.x) AS x FROM e"
            f" JOIN h{r-1} ON h{r-1}.v = e.s GROUP BY e.d),")
        parts.append(
            f"h{r} AS MATERIALIZED (SELECT e.s AS v, sum(a{r}.x) AS x FROM e"
            f" JOIN a{r} ON a{r}.v = e.d GROUP BY e.s),")
    parts.append(
        f"fin AS MATERIALIZED (SELECT verts.v, coalesce(h{iters}.x, 0) AS hr,"
        f" coalesce(a{iters}.x, 0) AS ar FROM verts"
        f" LEFT JOIN h{iters} ON h{iters}.v = verts.v"
        f" LEFT JOIN a{iters} ON a{iters}.v = verts.v),")
    parts.append("tot AS (SELECT sum(hr) AS th, sum(ar) AS ta FROM fin)")
    return "\n".join(parts) + f"""
    SELECT {_DURL.format(c='fin.v')} AS url,
           round(fin.hr / nullif((SELECT th FROM tot), 0), 9) AS hub,
           round(fin.ar / nullif((SELECT ta FROM tot), 0), 9) AS auth
    FROM fin ORDER BY url"""




def _ktruss_unrolled_sql(k: int = 4, rounds: int = 3) -> str:
    """k-truss oracle: R peel rounds unrolled (each round: per-edge
    support = common-neighbor count within the alive subgraph via a
    wedge self-join, drop support < k-2), then a final support
    recompute on the surviving edge set - exactly
    pipelines.truss.ktruss_edges' fixed-round trajectory."""
    m = k - 2
    # MATERIALIZED: DuckDB inlines plain CTEs per reference; alive/und
    # appear 3x per round, which explodes the unrolled plan (3^rounds
    # wedge recomputations) without it
    parts = [f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
             "alive0 AS MATERIALIZED (SELECT pa_ AS a, pb_ AS b FROM pairs),"]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
    und{r} AS MATERIALIZED (SELECT a AS s, b AS d FROM alive{p}
               UNION ALL SELECT b, a FROM alive{p}),
    cn{r} AS MATERIALIZED (SELECT u1.d AS a, u2.d AS b, count(*) AS cn
              FROM und{r} u1 JOIN und{r} u2
                ON u1.s = u2.s AND u1.d < u2.d
              GROUP BY u1.d, u2.d),
    alive{r} AS MATERIALIZED (SELECT al.a, al.b FROM alive{p} al
                 JOIN cn{r} c ON c.a = al.a AND c.b = al.b
                 WHERE c.cn >= {m}),""")
    R = rounds
    parts.append(f"""
    undF AS MATERIALIZED (SELECT a AS s, b AS d FROM alive{R}
             UNION ALL SELECT b, a FROM alive{R}),
    cnF AS (SELECT u1.d AS a, u2.d AS b, count(*) AS cn
            FROM undF u1 JOIN undF u2 ON u1.s = u2.s AND u1.d < u2.d
            GROUP BY u1.d, u2.d)
    SELECT {_PURL.format(c='al.a')} AS url_a,
           {_PURL.format(c='al.b')} AS url_b,
           CAST(coalesce(c.cn, 0) AS BIGINT) AS support
    FROM alive{R} al LEFT JOIN cnF c ON c.a = al.a AND c.b = al.b
    ORDER BY url_a, url_b""")
    return "\n".join(parts)





def _kcore_unrolled_sql(k: int = 3, rounds: int = 8) -> str:
    """k-core oracle: R peel rounds unrolled (each round: degree within
    the previous alive set, keep >= k), then the final alive set's
    internal degrees — exactly pipelines.traversal.kcore's fixed-round
    semantics (converging earlier is a no-op: a fixpoint set replays
    unchanged through the remaining rounds)."""
    parts = [f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
             "und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs"
             " UNION ALL SELECT pb_, pa_ FROM pairs),",
             "a0(v) AS (SELECT DISTINCT s FROM und),"]
    for r in range(1, rounds + 1):
        # MATERIALIZED is load-bearing: every d{r} references a{r-1}
        # TWICE, so inlined plans double per round (2^rounds blowup)
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT u.s AS v, count(*) AS c FROM und u"
            f" JOIN a{r-1} x ON x.v = u.s JOIN a{r-1} y ON y.v = u.d"
            f" GROUP BY u.s),")
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT v FROM d{r} WHERE c >= {k}),")
    parts.append(
        f"dfin AS (SELECT u.s AS v, count(*) AS c FROM und u"
        f" JOIN a{rounds} x ON x.v = u.s JOIN a{rounds} y ON y.v = u.d"
        f" GROUP BY u.s)")
    return "\n".join(parts) + f"""
    SELECT {_PURL.format(c='a.v')} AS url,
           CAST(coalesce(dfin.c, 0) AS BIGINT) AS core_degree
    FROM a{rounds} a LEFT JOIN dfin ON dfin.v = a.v ORDER BY url"""


def _geo_attack_sql(ks=(0, 4, 8, 16)) -> str:
    """Targeted-attack oracle: per hub budget k, remove the top-k
    undirected-degree vertices (ties -> url ascending), recursive-CTE
    closure over the survivors, census row (k, n_edges, n_components,
    max_size) — exactly pipelines.queries.geo_attack_q."""
    parts = [f"WITH RECURSIVE e(s, d) AS ({_GEO_EDGES}),",
             "de AS MATERIALIZED (SELECT DISTINCT s, d FROM e),",
             "deg AS MATERIALIZED (SELECT u, count(*) AS dg FROM"
             " (SELECT s AS u FROM de UNION ALL SELECT d FROM de)"
             " GROUP BY u),"]
    for k in ks:
        parts.append(
            f"hub{k} AS MATERIALIZED (SELECT u FROM deg"
            f" ORDER BY dg DESC, u LIMIT {k}),")
        parts.append(
            f"ek{k} AS MATERIALIZED (SELECT s, d FROM de"
            f" WHERE s NOT IN (SELECT u FROM hub{k})"
            f" AND d NOT IN (SELECT u FROM hub{k})),")
        parts.append(
            f"vk{k} AS MATERIALIZED (SELECT u AS v FROM deg"
            f" WHERE u NOT IN (SELECT u FROM hub{k})),")
        parts.append(
            f"und{k} AS MATERIALIZED (SELECT s, d FROM ek{k}"
            f" UNION SELECT d, s FROM ek{k}),")
        parts.append(
            f"reach{k}(v, l) AS (SELECT v, v FROM vk{k}"
            f" UNION SELECT u.d, r.l FROM reach{k} r"
            f" JOIN und{k} u ON u.s = r.v),")
        parts.append(
            f"minl{k} AS MATERIALIZED (SELECT v, min(l) AS ml"
            f" FROM reach{k} GROUP BY v),")
        parts.append(
            f"stat{k} AS (SELECT (SELECT count(*) FROM ek{k}) AS ne,"
            f" count(*) AS ncomp, coalesce(max(cnt), 0) AS mx FROM"
            f" (SELECT ml, count(*) AS cnt FROM minl{k} GROUP BY ml)),")
    parts[-1] = parts[-1].rstrip(",")
    unions = " UNION ALL ".join(
        f"SELECT {k} AS k, CAST(ne AS BIGINT) AS n_edges,"
        f" CAST(ncomp AS BIGINT) AS n_components,"
        f" CAST(mx AS BIGINT) AS max_size FROM stat{k}"
        for k in ks)
    return "\n".join(parts) + f"\nSELECT * FROM ({unions}) ORDER BY k"


def _pq_blocks(m: int = 4, sub: int = 16, k: int = 4) -> list:
    """Shared PQ CTE chain (one embed_kmeans-style unrolled Lloyd run
    per contiguous subspace slice: 2 assignment rounds, init = lowest
    vec_ids, same squared-distance formula and lowest-cluster
    tie-break) — the trajectory of embed_pq4_q and embed_adc3_q."""
    blocks = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        blocks.append(f"""
            emb{j} AS (SELECT vec_id,
                              list_slice(CAST(embedding AS DOUBLE[]),
                                         {lo}, {hi}) AS e
                       FROM embeddings),
            c0_{j} AS (SELECT vec_id AS c, e FROM emb{j}
                       WHERE vec_id < {k}),
            d1_{j} AS (SELECT v.vec_id, c0_{j}.c,
                              list_inner_product(v.e, v.e)
                              - 2 * list_inner_product(v.e, c0_{j}.e)
                              + list_inner_product(c0_{j}.e, c0_{j}.e) AS d
                       FROM emb{j} v CROSS JOIN c0_{j}),
            a1_{j} AS (SELECT vec_id, c AS cluster FROM (
                         SELECT vec_id, c, row_number() OVER
                             (PARTITION BY vec_id ORDER BY d, c) AS rn
                         FROM d1_{j}) WHERE rn = 1),
            ex_{j} AS (SELECT a1_{j}.cluster AS c, unnest(e) AS val,
                              unnest(range(1, len(e) + 1)) AS i
                       FROM emb{j} JOIN a1_{j} USING (vec_id)),
            cm_{j} AS (SELECT c, list(mv ORDER BY i) AS e FROM
                         (SELECT c, i, avg(val) AS mv FROM ex_{j}
                          GROUP BY c, i) GROUP BY c),
            c1_{j} AS (SELECT c0_{j}.c, coalesce(cm_{j}.e, c0_{j}.e) AS e
                       FROM c0_{j} LEFT JOIN cm_{j} ON cm_{j}.c = c0_{j}.c),
            d2_{j} AS (SELECT v.vec_id, c1_{j}.c,
                              list_inner_product(v.e, v.e)
                              - 2 * list_inner_product(v.e, c1_{j}.e)
                              + list_inner_product(c1_{j}.e, c1_{j}.e) AS d
                       FROM emb{j} v CROSS JOIN c1_{j}),
            a2_{j} AS (SELECT vec_id, c AS cluster FROM (
                         SELECT vec_id, c, row_number() OVER
                             (PARTITION BY vec_id ORDER BY d, c) AS rn
                         FROM d2_{j}) WHERE rn = 1)""")
    return blocks


def _pq_sql(m: int = 4, sub: int = 16, k: int = 4) -> str:
    blocks = _pq_blocks(m, sub, k)
    codes = ",\n".join(
        f"CAST(a2_{j}.cluster AS BIGINT) AS code{j}" for j in range(m))
    joins = "\n".join(
        f"JOIN a2_{j} ON a2_{j}.vec_id = a2_0.vec_id"
        for j in range(1, m))
    return ("WITH " + ",".join(blocks) + f"""
            SELECT a2_0.vec_id, {codes}
            FROM a2_0 {joins} ORDER BY a2_0.vec_id""")


def _adc_sql(m: int = 4, sub: int = 16, k: int = 4, topk: int = 3) -> str:
    """ADC oracle: per-query-per-subspace LUT (exact distance from the
    query subvector to every c1 codebook centroid), summed across
    subspaces in the PINNED order d0+d1+d2+d3, top-k by (d,
    neighbor_id) with self excluded — exactly embed_adc3_q."""
    blocks = _pq_blocks(m, sub, k)
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        blocks.append(f"""
            lut{j} AS (SELECT qs.qid, c1_{j}.c,
                              list_inner_product(qs.e, qs.e)
                              - 2 * list_inner_product(qs.e, c1_{j}.e)
                              + list_inner_product(c1_{j}.e, c1_{j}.e) AS d
                       FROM (SELECT vec_id AS qid,
                                    list_slice(CAST(embedding AS DOUBLE[]),
                                               {lo}, {hi}) AS e
                             FROM embeddings WHERE vec_id < 10) qs
                       CROSS JOIN c1_{j})""")
    code_cols = ", ".join(
        f"a2_{j}.cluster AS k{j}" for j in range(m))
    code_joins = " ".join(
        f"JOIN a2_{j} ON a2_{j}.vec_id = a2_0.vec_id"
        for j in range(1, m))
    blocks.append(f"""
            codes AS (SELECT a2_0.vec_id, {code_cols}
                      FROM a2_0 {code_joins})""")
    lut_joins = " ".join(
        f"JOIN lut{j} l{j} ON l{j}.c = codes.k{j} AND l{j}.qid = l0.qid"
        for j in range(1, m))
    dsum = " + ".join(f"l{j}.d" for j in range(m))
    blocks.append(f"""
            adc AS (SELECT l0.qid AS query_id, codes.vec_id AS neighbor_id,
                           {dsum} AS d
                    FROM codes JOIN lut0 l0 ON l0.c = codes.k0 {lut_joins}
                    WHERE codes.vec_id != l0.qid),
            ranked AS (SELECT *, row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY d, neighbor_id) AS rn FROM adc)""")
    return ("WITH " + ",".join(blocks) + f"""
            SELECT query_id, neighbor_id, round(d, 9) AS adc_dist
            FROM ranked WHERE rn <= {topk}
            ORDER BY query_id, neighbor_id""")


def _recall_sql(m: int = 4, sub: int = 16, k: int = 4,
                topk: int = 3) -> str:
    """recall@k oracle: the ADC ranked CTE (same chain as _adc_sql)
    intersected with the exact squared-L2 top-k (list_distance is the
    monotone sqrt of the engine's squared kernel, so rankings agree),
    LEFT-joined so 0-hit queries emit — exactly embed_adc_recall_q."""
    adc = _adc_sql(m, sub, k, topk)
    head, tail = adc.rsplit("SELECT query_id, neighbor_id, round(d, 9)", 1)
    return head + f"""
            SELECT q0.qid AS query_id,
                   CAST(coalesce(h.c, 0) AS BIGINT) AS n_hits
            FROM (SELECT vec_id AS qid FROM embeddings
                  WHERE vec_id < 10) q0
            LEFT JOIN (
              SELECT a.query_id, count(*) AS c
              FROM (SELECT query_id, neighbor_id FROM ranked
                    WHERE rn <= {topk}) a
              JOIN (
                SELECT query_id, neighbor_id FROM (
                  SELECT qs.vec_id AS query_id, e.vec_id AS neighbor_id,
                         row_number() OVER (PARTITION BY qs.vec_id
                             ORDER BY list_distance(
                                 CAST(qs.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])),
                             e.vec_id) AS rn
                  FROM embeddings qs, embeddings e
                  WHERE qs.vec_id < 10 AND e.vec_id != qs.vec_id)
                WHERE rn <= {topk}) x
                ON x.query_id = a.query_id
               AND x.neighbor_id = a.neighbor_id
              GROUP BY a.query_id) h ON h.query_id = q0.qid
            ORDER BY query_id"""


def _densest_members_sql(rounds: int = 2) -> str:
    """Oracle for densest_members: the v{rounds} survivor set of the
    _densest_sql peel chain with its internal degree in e{rounds}."""
    body = _densest_sql(max(rounds + 1, 2))
    head = body.rsplit("SELECT * FROM (", 1)[0]
    return head + f"""
            , dfin AS (SELECT v, count(*) AS cd FROM
                (SELECT pa_ AS v FROM e{rounds}
                 UNION ALL SELECT pb_ FROM e{rounds}) GROUP BY v)
            SELECT {_PURL.format(c='vv.v')} AS url,
                   CAST(coalesce(dfin.cd, 0) AS BIGINT) AS core_degree
            FROM v{rounds} vv LEFT JOIN dfin ON dfin.v = vv.v
            ORDER BY url"""


def _densest_sql(rounds: int = 4) -> str:
    """Densest-subgraph peel-census oracle: R Bahmani (ε = 1/2) rounds
    unrolled — survivor test deg·nv > 3·ne in exact integers, one
    census row per round while nv > 0 — exactly
    pipelines.traversal.densest_census's fixed-round semantics."""
    parts = [f"WITH e0 AS MATERIALIZED ({_COPART_PAIRS}),",
             "v0 AS MATERIALIZED (SELECT pa_ AS v FROM e0"
             " UNION SELECT pb_ FROM e0),"]
    for r in range(rounds - 1):
        # MATERIALIZED is load-bearing: each round references the
        # previous sets repeatedly (2^rounds inlined-plan blowup)
        parts.append(
            f"n{r} AS MATERIALIZED (SELECT (SELECT count(*) FROM v{r}) AS nv,"
            f" (SELECT count(*) FROM e{r}) AS ne),")
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT v, count(*) AS deg FROM"
            f" (SELECT pa_ AS v FROM e{r} UNION ALL SELECT pb_ FROM e{r})"
            f" GROUP BY v),")
        parts.append(
            f"v{r+1} AS MATERIALIZED (SELECT d.v FROM d{r} d, n{r}"
            f" WHERE d.deg * n{r}.nv > 3 * n{r}.ne),")
        parts.append(
            f"e{r+1} AS MATERIALIZED (SELECT pa_, pb_ FROM e{r}"
            f" WHERE pa_ IN (SELECT v FROM v{r+1})"
            f" AND pb_ IN (SELECT v FROM v{r+1})),")
    last = rounds - 1
    parts.append(
        f"n{last} AS (SELECT (SELECT count(*) FROM v{last}) AS nv,"
        f" (SELECT count(*) FROM e{last}) AS ne)")
    unions = " UNION ALL ".join(
        f"SELECT {i} AS rnd, CAST(nv AS BIGINT) AS n_vertices,"
        f" CAST(ne AS BIGINT) AS n_edges FROM n{i} WHERE nv > 0"
        for i in range(rounds))
    return "\n".join(parts) + f"\nSELECT * FROM ({unions}) ORDER BY rnd"


def _lpa_unrolled_sql(rounds: int = 4) -> str:
    """Unseeded-LPA oracle: R synchronous rounds unrolled over the
    copart graph, labels initialized to the vertex's own id. The
    engine's tie-break orders by LABEL VID; part urls are zero-padded
    so vid order == url order == partkey numeric order, letting the
    oracle propagate partkeys as labels directly —
    pipelines.labelprop.lpa_communities' exact trajectory."""
    parts = [f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
             "und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs"
             " UNION ALL SELECT pb_, pa_ FROM pairs),",
             "s0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS lab"
             " FROM und),"]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"v{r} AS MATERIALIZED (SELECT u.s AS v, st.lab,"
            f" count(*) AS c FROM und u JOIN s{p} st ON st.v = u.d"
            f" GROUP BY u.s, st.lab),")
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT v, lab FROM ("
            f"SELECT v, lab, row_number() OVER"
            f" (PARTITION BY v ORDER BY c DESC, lab) AS rn FROM v{r})"
            f" WHERE rn = 1),")
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT s.v,"
            f" coalesce(w.lab, s.lab) AS lab FROM s{p} s"
            f" LEFT JOIN w{r} w ON w.v = s.v),")
    body = "\n".join(parts).rstrip().rstrip(",")
    return body + f"""
    SELECT {_PURL.format(c='v')} AS url,
           {_PURL.format(c='lab')} AS community
    FROM s{rounds} ORDER BY url"""


def _backbone_sql(min_weight: int = 2, rounds: int = 8) -> str:
    """Backbone component-size-histogram oracle: weighted projection →
    weight filter → `rounds` unrolled hash-min rounds (identical to
    dedup.cluster.minlabel_clusters) → label-count histogram —
    pipelines.queries.copart_backbone_q's exact trajectory."""
    parts = [
        "WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey"
        " FROM lineitem),",
        f"wp AS MATERIALIZED (SELECT a.l_partkey AS pa_, b.l_partkey AS pb_,"
        f" count(*) AS w FROM op a JOIN op b"
        f" ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
        f" GROUP BY 1, 2 HAVING count(*) >= {min_weight}),",
        "e AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM wp"
        " UNION ALL SELECT pb_, pa_ FROM wp),",
        "l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM e),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"l{r} AS MATERIALIZED ("
            f" SELECT l.v, least(l.lbl, coalesce(min(p.lbl), l.lbl)) AS lbl"
            f" FROM l{r-1} l LEFT JOIN e ON e.s = l.v"
            f" LEFT JOIN l{r-1} p ON p.v = e.d"
            f" GROUP BY l.v, l.lbl),"
        )
    parts.append(
        f"sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS sz"
        f" FROM l{rounds} GROUP BY lbl)")
    return "\n".join(parts) + """
    SELECT sz AS component_size, CAST(count(*) AS BIGINT) AS n_components
    FROM sz GROUP BY sz ORDER BY component_size"""


def _kshells_sql(k_max: int = 6, rounds: int = 8) -> str:
    """k-shell oracle: one _kcore_unrolled_sql-style peel chain per k
    (prefixed CTE names), then shell = max k whose final alive set
    contains the vertex — pipelines.traversal.kshells' fixed-round
    contract. MATERIALIZED is load-bearing exactly as in the k-core
    oracle (each degree CTE references the previous alive set twice)."""
    parts = [f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
             "und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs"
             " UNION ALL SELECT pb_, pa_ FROM pairs),",
             "a0(v) AS (SELECT DISTINCT s FROM und),"]
    for k in range(1, k_max + 1):
        prev = "a0"
        for r in range(1, rounds + 1):
            parts.append(
                f"k{k}d{r} AS MATERIALIZED (SELECT u.s AS v, count(*) AS c"
                f" FROM und u JOIN {prev} x ON x.v = u.s"
                f" JOIN {prev} y ON y.v = u.d GROUP BY u.s),")
            parts.append(
                f"k{k}a{r} AS MATERIALIZED"
                f" (SELECT v FROM k{k}d{r} WHERE c >= {k}),")
            prev = f"k{k}a{r}"
    mem = " UNION ALL ".join(
        f"SELECT v, {k} AS k FROM k{k}a{rounds}"
        for k in range(1, k_max + 1)
    )
    parts.append(f"mem AS ({mem}),")
    parts.append("sh AS (SELECT v, max(k) AS sh FROM mem GROUP BY v)")
    return "\n".join(parts) + f"""
    SELECT {_PURL.format(c='a0.v')} AS url,
           CAST(coalesce(sh.sh, 0) AS BIGINT) AS shell
    FROM a0 LEFT JOIN sh ON sh.v = a0.v ORDER BY url"""


def _ppr_unrolled_sql(iters: int = 12, n_seeds: int = 5) -> str:
    """Personalized-PageRank oracle: `iters` power-iteration rounds
    unrolled over the symmetrized copart graph (dangling-free — every
    vertex has outdeg ≥ 1 there), teleport mass on the n_seeds
    lexicographically-smallest vertices — exactly
    pipelines.pagerank._pr_broadcast's restart semantics, including the
    (1.0 - 0.85) literal form (1.0-0.85 != 0.15 in float64)."""
    seed_r = f"(CASE WHEN s.v IS NOT NULL THEN 1.0/{n_seeds} ELSE 0.0 END)"
    parts = [
        f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
        "und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs"
        " UNION ALL SELECT pb_, pa_ FROM pairs),",
        "verts AS MATERIALIZED (SELECT DISTINCT s AS v FROM und),",
        "outdeg AS MATERIALIZED (SELECT s AS v,"
        " CAST(count(*) AS DOUBLE) AS deg FROM und GROUP BY s),",
        f"seeds AS MATERIALIZED (SELECT v FROM verts ORDER BY v"
        f" LIMIT {n_seeds}),",
        f"p0 AS MATERIALIZED (SELECT verts.v,"
        f" CASE WHEN s.v IS NOT NULL THEN 1.0/{n_seeds} ELSE 0.0 END AS r"
        " FROM verts LEFT JOIN seeds s ON s.v = verts.v),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT u.d AS v,"
            f" sum(p{i-1}.r / od.deg) AS inc"
            f" FROM p{i-1} JOIN und u ON u.s = p{i-1}.v"
            f" JOIN outdeg od ON od.v = p{i-1}.v GROUP BY u.d),"
        )
        comma = "," if i < iters else ""
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT verts.v,"
            f" (1.0 - 0.85) * {seed_r} + 0.85 * coalesce(c{i}.inc, 0.0) AS r"
            f" FROM verts LEFT JOIN seeds s ON s.v = verts.v"
            f" LEFT JOIN c{i} ON c{i}.v = verts.v){comma}"
        )
    return "\n".join(parts) + f"""
    SELECT {_PURL.format(c='v')} AS url, round(r, 9) AS rank
    FROM p{iters} ORDER BY url"""


def _ball2_hll_sql(p: int = 10) -> str:
    """Exact SQL replay of ball2_sizes_approx's HyperLogLog estimate:
    vids are the engine's own (dense rank of url), the per-member hash
    is splitmix64 computed bit-exactly via HUGEINT limb mulmod (a
    64-bit product overflows HUGEINT, so each multiply is split at
    2^32), registers are max(rho) per (vertex, low-p hash bits), and
    the estimate repeats imtag_ray.pipelines.linkpred.ball2_sizes_
    approx's float formula with the same floor(est+0.5) rounding. The
    register sum Z is computed EXACTLY as a HUGEINT (Σ 2^(W−rho),
    missing registers contribute 2^W); the engine's distributed float
    sum agrees to ~1e-13 relative, far inside the integer rounding."""
    m = 1 << p
    W = 64 - p + 1
    maxrho = W
    shift_bits = 64 - p
    mul = (
        "CAST(((CAST({x} AS HUGEINT) % 4294967296) * {c}"
        " + (((CAST({x} AS HUGEINT) // 4294967296) * {c}) % 4294967296)"
        " * 4294967296) % 18446744073709551616 AS UBIGINT)"
    )
    return f"""
    WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
    und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
            UNION ALL SELECT pb_, pa_ FROM pairs),
    verts AS (SELECT DISTINCT s AS v FROM und),
    vid AS MATERIALIZED (
        SELECT v, url,
               CAST(row_number() OVER (ORDER BY url) - 1 AS UBIGINT) AS vid
        FROM (SELECT v, {_PURL.format(c='v')} AS url FROM verts)
    ),
    ball AS (
        SELECT s AS v, s AS w FROM und
        UNION ALL SELECT s, d FROM und
        UNION ALL SELECT e1.d, e2.d FROM und e1 JOIN und e2 ON e1.s = e2.s
    ),
    mem AS (SELECT DISTINCT b.v, wv.vid AS wvid
            FROM ball b JOIN vid wv ON wv.v = b.w),
    s0 AS (SELECT v, CAST((CAST(wvid AS HUGEINT) + 11400714819323198485)
               % 18446744073709551616 AS UBIGINT) AS x FROM mem),
    s1 AS (SELECT v, xor(x, x >> 30) AS x FROM s0),
    s2 AS (SELECT v, {mul.format(x='x', c='13787848793156543929')} AS x FROM s1),
    s3 AS (SELECT v, xor(x, x >> 27) AS x FROM s2),
    s4 AS (SELECT v, {mul.format(x='x', c='10723151780598845931')} AS x FROM s3),
    s5 AS (SELECT v, xor(x, x >> 31) AS x FROM s4),
    regs AS (
        SELECT v, CAST(x % {m} AS BIGINT) AS j,
               max(CASE WHEN (x >> {p}) = 0 THEN {maxrho}
                        ELSE {shift_bits} - length(bin(x >> {p})) + 1
                   END) AS rho
        FROM s5 GROUP BY v, CAST(x % {m} AS BIGINT)
    ),
    agg AS (
        SELECT v,
               sum(CAST(1 AS HUGEINT) << ({W} - rho)) AS znum,
               count(*) AS nreg
        FROM regs GROUP BY v
    ),
    est AS (
        SELECT v,
               CAST({m} - nreg AS BIGINT) AS zeros,
               (CAST(znum + (CAST({m} AS HUGEINT) - nreg)
                     * (CAST(1 AS HUGEINT) << {W}) AS DOUBLE)
                / CAST(CAST(1 AS HUGEINT) << {W} AS DOUBLE)) AS zfull
        FROM agg
    ),
    fin AS (
        SELECT v,
               (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m} / zfull AS e_raw,
               zeros
        FROM est
    )
    SELECT vd.url AS url,
           CAST(floor(CASE WHEN fin.e_raw <= 2.5 * {m} AND fin.zeros > 0
                THEN {m} * ln({m} / CAST(greatest(fin.zeros, 1) AS DOUBLE))
                ELSE fin.e_raw END + 0.5) AS BIGINT) AS ball2
    FROM fin JOIN vid vd ON vd.v = fin.v
    ORDER BY url
"""


def _near_keep_sql(rounds: int = 6) -> str:
    """near-dedup keep-set oracle: the exact minhash-pairs replay as the
    pair graph, then `rounds` unrolled hash-min rounds (each vertex
    takes min of its own and its neighbors' labels — identical to
    dedup.cluster.minlabel_clusters), then keep docs whose label is
    their own id."""
    parts = [
        f"WITH mp AS MATERIALIZED (SELECT id_a, id_b FROM ({_minhash_sql()})),",
        "e AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM mp"
        " UNION ALL SELECT id_b, id_a FROM mp),",
        "l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM e),",
    ]
    for r in range(1, rounds + 1):
        # MATERIALIZED: l{r} is referenced twice by l{r+1}
        parts.append(
            f"l{r} AS MATERIALIZED ("
            f" SELECT l.v, least(l.lbl, coalesce(min(p.lbl), l.lbl)) AS lbl"
            f" FROM l{r-1} l LEFT JOIN e ON e.s = l.v"
            f" LEFT JOIN l{r-1} p ON p.v = e.d"
            f" GROUP BY l.v, l.lbl),"
        )
    parts.append(f"dropped AS (SELECT v FROM l{rounds} WHERE lbl != v)")
    return "\n".join(parts) + """
    SELECT d.doc_id FROM documents d
    LEFT JOIN dropped ON dropped.v = d.doc_id
    WHERE dropped.v IS NULL ORDER BY d.doc_id"""


def _multisignal_sql(rounds: int = 6) -> str:
    """dedup_multisignal oracle: union of the exact-hash star edges,
    the minhash-pairs replay and the simhash-pairs replay as ONE pair
    graph, `rounds` unrolled hash-min rounds, size census per label,
    singletons (docs in no pair) folded into the size-1 bucket."""
    parts = [
        f"WITH mp AS MATERIALIZED (SELECT id_a, id_b FROM ({_minhash_sql()})),",
        f"sp AS MATERIALIZED (SELECT id_a, id_b FROM ({_SIMHASH_SQL})),",
        "xg AS (SELECT md5(text) AS h, min(doc_id) AS m"
        " FROM documents GROUP BY 1),",
        "xp AS (SELECT g.m AS id_a, d.doc_id AS id_b FROM xg g"
        " JOIN documents d ON md5(d.text) = g.h AND d.doc_id != g.m),",
        "ap AS MATERIALIZED (SELECT id_a, id_b FROM mp"
        " UNION SELECT id_a, id_b FROM sp"
        " UNION SELECT id_a, id_b FROM xp),",
        "e AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM ap"
        " UNION ALL SELECT id_b, id_a FROM ap),",
        "l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM e),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"l{r} AS MATERIALIZED ("
            f" SELECT l.v, least(l.lbl, coalesce(min(p.lbl), l.lbl)) AS lbl"
            f" FROM l{r-1} l LEFT JOIN e ON e.s = l.v"
            f" LEFT JOIN l{r-1} p ON p.v = e.d"
            f" GROUP BY l.v, l.lbl),"
        )
    parts.append(
        f"sz AS (SELECT lbl, count(*) AS sz FROM l{rounds} GROUP BY lbl),"
    )
    parts.append(
        "hist AS (SELECT sz AS cluster_size, count(*) AS n_clusters"
        " FROM sz GROUP BY sz"
        " UNION ALL"
        " SELECT 1, (SELECT count(*) FROM documents)"
        f" - (SELECT count(*) FROM l{rounds}))"
    )
    return "\n".join(parts) + """
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(sum(n_clusters) AS BIGINT) AS n_clusters
    FROM hist WHERE n_clusters > 0 OR cluster_size != 1
    GROUP BY cluster_size HAVING sum(n_clusters) > 0
    ORDER BY cluster_size"""


def _knn_cc_sql(rounds: int = 8, k: int = 3) -> str:
    """embed_knn_cc oracle: the embed_knn_graph top-k replay as the
    (undirected) pair graph, then `rounds` unrolled hash-min rounds —
    dedup.cluster.minlabel_clusters' exact trajectory over k-NN edges."""
    parts = [
        f"""WITH ee AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
             FROM embeddings),
        sims AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
                        list_cosine_similarity(a.ev, b.ev) AS s
                 FROM ee a, ee b WHERE a.vec_id != b.vec_id),
        knn AS MATERIALIZED (
            SELECT qid, nid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY qid ORDER BY s DESC, nid) AS rn
                FROM sims)
            WHERE rn <= {k}),
        e AS MATERIALIZED (SELECT qid AS s, nid AS d FROM knn
             UNION ALL SELECT nid, qid FROM knn),
        l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM e),""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"l{r} AS MATERIALIZED ("
            f" SELECT l.v, least(l.lbl, coalesce(min(p.lbl), l.lbl)) AS lbl"
            f" FROM l{r-1} l LEFT JOIN e ON e.s = l.v"
            f" LEFT JOIN l{r-1} p ON p.v = e.d"
            f" GROUP BY l.v, l.lbl),"
        )
    body = "\n".join(parts).rstrip().rstrip(",")
    return body + f"""
    SELECT CAST(v AS BIGINT) AS vec_id, CAST(lbl AS BIGINT) AS cluster
    FROM l{rounds} ORDER BY vec_id"""


def _pca_sql(rounds: int = 8) -> str:
    """embed_pca8 oracle: the Gram matrix as exact DOUBLE sums, then
    `rounds` unrolled power-iteration steps (matvec + L2 normalize) —
    scoring.embed_pca8_q's exact trajectory from v0 = all-ones."""
    parts = [
        """WITH ex AS MATERIALIZED (
          SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS v
          FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS i)),
        mat AS MATERIALIZED (
          SELECT a.i AS i, b.i AS j, sum(a.v * b.v) / count(*) AS m
          FROM ex a JOIN ex b ON b.vec_id = a.vec_id GROUP BY a.i, b.i),
        v0 AS (SELECT unnest(range(0, 64)) AS i,
                      CAST(1.0 AS DOUBLE) AS v),""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"u{r} AS MATERIALIZED (SELECT mat.i AS i,"
            f" sum(mat.m * p.v) AS u"
            f" FROM mat JOIN v{r-1} p ON p.i = mat.j GROUP BY mat.i),"
        )
        parts.append(
            f"v{r} AS (SELECT i,"
            f" u / (SELECT sqrt(sum(u * u)) FROM u{r}) AS v FROM u{r}),"
        )
    body = "\n".join(parts).rstrip().rstrip(",")
    return body + f"""
    SELECT CAST(i AS BIGINT) AS dim, round(v, 6) AS v
    FROM v{rounds} ORDER BY dim"""


def _cluster_sizes_sql(rounds: int = 6) -> str:
    """Cluster-size-histogram oracle: the _near_keep_sql hash-min chain,
    then count per label and histogram the counts —
    pipelines.dataops.dedup_cluster_sizes_q's exact trajectory."""
    keep = _near_keep_sql(rounds)
    head = keep[: keep.rindex("dropped AS")].rstrip().rstrip(",")
    return head + f""",
    sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS sz
           FROM l{rounds} GROUP BY lbl)
    SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
    FROM sz GROUP BY sz ORDER BY cluster_size"""


_BOWTIE_SCC_PREFIX = """
    e AS MATERIALIZED (
        SELECT DISTINCT doc_id AS s, tgt AS d FROM targets
        WHERE tgt != doc_id AND (doc_id + tgt) % 3 != 0
    ),
    verts AS MATERIALIZED (
        -- NOT "UNION": under WITH RECURSIVE DuckDB runs a named-column
        -- CTE's top-level UNION with UNION ALL semantics
        SELECT DISTINCT v FROM (
            SELECT s AS v FROM e UNION ALL SELECT d FROM e
        )
    ),
    reach(a, b) AS (
        SELECT v, v FROM verts
        UNION
        SELECT r.a, e.d FROM reach r JOIN e ON e.s = r.b
    ),
    reachm AS MATERIALIZED (SELECT a, b FROM reach),
    scc AS MATERIALIZED (
        SELECT r1.a AS v, min({root_url}) AS comp
        FROM reachm r1 JOIN reachm r2 ON r2.a = r1.b AND r2.b = r1.a
        GROUP BY r1.a
    )
"""


def _bowtie_sql() -> str:
    """Bowtie-decomposition oracle: mutual-reachability SCCs with
    min-URL canonical ids, CORE = largest SCC (url-lex tie-break ≡ the
    engine's min-vid rule), then the four reachability sets read
    straight off the materialized closure."""
    prefix = _BOWTIE_SCC_PREFIX.format(root_url=_DURL.format(c="r1.b"))
    return f"""
    WITH RECURSIVE targets AS ({_DOC_TARGETS}),
    {prefix},
    core_id AS (
        SELECT comp FROM (
            SELECT comp, count(*) AS n FROM scc GROUP BY comp
        ) ORDER BY n DESC, comp LIMIT 1
    ),
    core AS MATERIALIZED (
        SELECT v FROM scc WHERE comp = (SELECT comp FROM core_id)
    ),
    inn AS MATERIALIZED (
        SELECT DISTINCT r.a AS v FROM reachm r
        WHERE r.b IN (SELECT v FROM core)
          AND r.a NOT IN (SELECT v FROM core)
    ),
    outt AS MATERIALIZED (
        SELECT DISTINCT r.b AS v FROM reachm r
        WHERE r.a IN (SELECT v FROM core)
          AND r.b NOT IN (SELECT v FROM core)
    ),
    fin_ AS MATERIALIZED (
        SELECT DISTINCT r.b AS v FROM reachm r
        WHERE r.a IN (SELECT v FROM inn)
    ),
    bout AS MATERIALIZED (
        SELECT DISTINCT r.a AS v FROM reachm r
        WHERE r.b IN (SELECT v FROM outt)
    )
    SELECT {_DURL.format(c='verts.v')} AS url,
      CASE WHEN verts.v IN (SELECT v FROM core) THEN 'CORE'
           WHEN verts.v IN (SELECT v FROM inn) THEN 'IN'
           WHEN verts.v IN (SELECT v FROM outt) THEN 'OUT'
           WHEN verts.v IN (SELECT v FROM fin_)
                AND verts.v IN (SELECT v FROM bout) THEN 'TUBE'
           WHEN verts.v IN (SELECT v FROM fin_) THEN 'TENDRIL_IN'
           WHEN verts.v IN (SELECT v FROM bout) THEN 'TENDRIL_OUT'
           ELSE 'DISCONNECTED' END AS region
    FROM verts ORDER BY url
    """


def _scc_cond_sql() -> str:
    """Condensation oracle: distinct inter-SCC edges, endpoints named
    by the min-URL canonical SCC id."""
    prefix = _BOWTIE_SCC_PREFIX.format(root_url=_DURL.format(c="r1.b"))
    return f"""
    WITH RECURSIVE targets AS ({_DOC_TARGETS}),
    {prefix}
    SELECT DISTINCT s1.comp AS src_scc_url, s2.comp AS dst_scc_url
    FROM e JOIN scc s1 ON s1.v = e.s JOIN scc s2 ON s2.v = e.d
    WHERE s1.comp != s2.comp
    ORDER BY src_scc_url, dst_scc_url
    """


def _scc_depth_sql(rounds: int = 4) -> str:
    """Condensation longest-path-layering oracle: the _BOWTIE_SCC_PREFIX
    SCC labeling, distinct inter-SCC edges, then ``rounds`` unrolled
    monotone max-relaxations (fixed-round ≡ the engine)."""
    prefix = _BOWTIE_SCC_PREFIX.format(root_url=_DURL.format(c="r1.b"))
    body = f"""
    WITH RECURSIVE targets AS ({_DOC_TARGETS}),
    {prefix},
    ce AS MATERIALIZED (
        SELECT DISTINCT s1.comp AS cs, s2.comp AS cd
        FROM e JOIN scc s1 ON s1.v = e.s JOIN scc s2 ON s2.v = e.d
        WHERE s1.comp != s2.comp
    ),
    cv AS MATERIALIZED (SELECT DISTINCT comp FROM scc),
    d0 AS MATERIALIZED (SELECT comp, CAST(0 AS BIGINT) AS dep FROM cv)"""
    for i in range(rounds):
        body += f""",
    i{i} AS (SELECT ce.cd AS comp, max(du.dep) + 1 AS idep
             FROM ce JOIN d{i} du ON du.comp = ce.cs GROUP BY ce.cd),
    d{i + 1} AS MATERIALIZED (
        SELECT d.comp,
               CAST(greatest(d.dep, coalesce(i.idep, 0)) AS BIGINT)
                   AS dep
        FROM d{i} d LEFT JOIN i{i} i ON i.comp = d.comp)"""
    return body + f"""
    SELECT comp AS scc_url, dep AS depth FROM d{rounds}
    ORDER BY scc_url"""


def _sm64_sql(x0: str) -> str:
    """Inline splitmix64 over the UBIGINT SQL expression ``x0`` — the
    same bit-exact HUGEINT limb-mulmod replay as _ball2_hll_sql, but
    expanded into one nested expression so it can live inside a
    recursive CTE's join condition."""
    mul = (
        "CAST(((CAST({x} AS HUGEINT) % 4294967296) * {c}"
        " + (((CAST({x} AS HUGEINT) // 4294967296) * {c}) % 4294967296)"
        " * 4294967296) % 18446744073709551616 AS UBIGINT)"
    )
    x = x0
    x = f"xor({x}, ({x}) >> 30)"
    x = mul.format(x=x, c="13787848793156543929")
    x = f"xor({x}, ({x}) >> 27)"
    x = mul.format(x=x, c="10723151780598845931")
    x = f"xor({x}, ({x}) >> 31)"
    return x


def _walk_pairs_sql(length: int = 4, window: int = 2) -> str:
    """Skip-gram pair oracle: self-join the replayed walk corpus of
    _walks_sql on the walk id, keep ordered pairs 1..window steps
    apart, count per (center, context)."""
    walks = _walks_sql(length)
    return f"""
    SELECT a.url AS center_url, b.url AS context_url,
           CAST(count(*) AS BIGINT) AS n_cooc
    FROM ({walks}) a JOIN ({walks}) b
      ON b.start_url = a.start_url
     AND b.step > a.step AND b.step <= a.step + {window}
    GROUP BY 1, 2
    ORDER BY center_url, context_url
    """


def _mmr_sql(k: int = 8) -> str:
    """Maximal-marginal-relevance oracle: k unrolled greedy stages,
    score = 0.5*rel - 0.5*maxsim with the same double coefficients the
    engine uses; chosen-set similarity chains through greatest()."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "q AS (SELECT v FROM e WHERE vec_id = 0)",
        "base AS (SELECT e.vec_id, e.v,"
        " list_cosine_similarity(e.v, q.v) AS rel"
        " FROM e, q WHERE e.vec_id != 0)",
        "s1 AS (SELECT vec_id, v, rel, 0.5 * rel AS score FROM base"
        " ORDER BY score DESC, vec_id LIMIT 1)",
        "m1 AS (SELECT b.vec_id, b.v, b.rel,"
        " list_cosine_similarity(b.v, s1.v) AS ms"
        " FROM base b, s1 WHERE b.vec_id != s1.vec_id)",
    ]
    for i in range(2, k + 1):
        ctes.append(
            f"s{i} AS (SELECT vec_id, v, rel, ms,"
            f" 0.5 * rel - 0.5 * ms AS score FROM m{i-1}"
            f" ORDER BY score DESC, vec_id LIMIT 1)"
        )
        if i < k:
            ctes.append(
                f"m{i} AS (SELECT m.vec_id, m.v, m.rel,"
                f" greatest(m.ms, list_cosine_similarity(m.v, s{i}.v))"
                f" AS ms"
                f" FROM m{i-1} m, s{i} WHERE m.vec_id != s{i}.vec_id)"
            )
    sel = ["SELECT CAST(0 AS BIGINT) AS rnk, vec_id,"
           " round(score, 9) AS score FROM s1"]
    for i in range(2, k + 1):
        sel.append(f"SELECT {i-1}, vec_id, round(score, 9) FROM s{i}")
    return ("WITH " + ",\n    ".join(ctes) + "\n    "
            + "\n    UNION ALL ".join(sel) + "\n    ORDER BY rnk")


def _walks_sql(length: int = 4) -> str:
    """Deterministic-random-walk oracle: adjacency ranked by dst vid
    (row_number over the engine's url-sorted vid space), next hop =
    splitmix64(cur + step·K) mod out-degree replayed bit-exactly in a
    recursive CTE. K is the splitmix64 increment constant, so the
    hash input folds to cur + (step+1)·K."""
    x0 = (
        "CAST((CAST(w.cur AS HUGEINT)"
        " + (w.step + 1) * CAST(11400714819323198485 AS HUGEINT))"
        " % 18446744073709551616 AS UBIGINT)"
    )
    h = _sm64_sql(x0)
    return f"""
    WITH RECURSIVE targets AS ({_DOC_TARGETS}),
    e AS MATERIALIZED (
        SELECT DISTINCT doc_id AS s, tgt AS d FROM targets
        WHERE tgt != doc_id
    ),
    verts AS MATERIALIZED (
        -- DISTINCT subquery, not UNION: see _BOWTIE_SCC_PREFIX note
        SELECT DISTINCT v FROM (
            SELECT s AS v FROM e UNION ALL SELECT d FROM e
        )
    ),
    vid AS MATERIALIZED (
        SELECT v, url,
               CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS vid
        FROM (SELECT v, {_DURL.format(c='v')} AS url FROM verts)
    ),
    adj AS MATERIALIZED (
        SELECT sv.vid AS s, dv.vid AS d,
               row_number() OVER (PARTITION BY sv.vid ORDER BY dv.vid)
                   - 1 AS idx,
               count(*) OVER (PARTITION BY sv.vid) AS deg
        FROM e JOIN vid sv ON sv.v = e.s JOIN vid dv ON dv.v = e.d
    ),
    walk(wid, step, cur) AS (
        SELECT vid, 0, vid FROM vid
        UNION ALL
        SELECT w.wid, w.step + 1, a.d
        FROM walk w JOIN adj a ON a.s = w.cur
         AND a.idx = CAST({h} % CAST(a.deg AS UBIGINT) AS BIGINT)
        WHERE w.step < {length}
    )
    SELECT sv.url AS start_url, w.step AS step, tv.url AS url
    FROM walk w JOIN vid sv ON sv.vid = w.wid
                JOIN vid tv ON tv.vid = w.cur
    ORDER BY start_url, step, url
    """


_HYPERANF_PREFIX = """
    e AS MATERIALIZED (
        SELECT DISTINCT doc_id AS s, tgt AS d FROM targets
        WHERE tgt != doc_id
    ),
    verts AS MATERIALIZED (
        SELECT DISTINCT v FROM (
            SELECT s AS v FROM e UNION ALL SELECT d FROM e
        )
    ),
    vid AS MATERIALIZED (
        SELECT v, url,
               CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS vid
        FROM (SELECT v, {durl} AS url FROM verts)
    ),
    e2 AS MATERIALIZED (
        SELECT sv.vid AS s, dv.vid AS d
        FROM e JOIN vid sv ON sv.v = e.s JOIN vid dv ON dv.v = e.d
    )
"""


def _ball_ctes(radius: int) -> str:
    """b0..b{radius}: (v, w) forward-ball membership, b_k = vertices
    within k hops (unrolled closure joins over the vid space)."""
    balls = ["b0 AS MATERIALIZED (SELECT vid AS v, vid AS w FROM vid)"]
    for k in range(1, radius + 1):
        balls.append(
            f"b{k} AS MATERIALIZED (SELECT v, w FROM b{k-1} UNION "
            f"SELECT e2.s, b.w FROM e2 JOIN b{k-1} b ON b.v = e2.d)"
        )
    return ",\n    ".join(balls)


def _hll_est_ctes(src: str, sfx: str, p: int) -> str:
    """CTE chain turning a (v, w) membership table ``src`` into
    ``ballv{sfx}`` (v, ball): the bit-exact HLL replay of
    linkpred/hyperanf's register hash + estimator (splitmix64 via
    HUGEINT limb mulmod, max-rho registers, exact HUGEINT Z,
    floor(est+0.5))."""
    m = 1 << p
    W = 64 - p + 1
    maxrho = W
    shift_bits = 64 - p
    mul = (
        "CAST(((CAST({x} AS HUGEINT) % 4294967296) * {c}"
        " + (((CAST({x} AS HUGEINT) // 4294967296) * {c}) % 4294967296)"
        " * 4294967296) % 18446744073709551616 AS UBIGINT)"
    )
    s = sfx
    return f"""
    h0{s} AS (SELECT v, CAST((CAST(w AS HUGEINT) + 11400714819323198485)
               % 18446744073709551616 AS UBIGINT) AS x FROM {src}),
    h1{s} AS (SELECT v, xor(x, x >> 30) AS x FROM h0{s}),
    h2{s} AS (SELECT v, {mul.format(x='x', c='13787848793156543929')} AS x FROM h1{s}),
    h3{s} AS (SELECT v, xor(x, x >> 27) AS x FROM h2{s}),
    h4{s} AS (SELECT v, {mul.format(x='x', c='10723151780598845931')} AS x FROM h3{s}),
    h5{s} AS (SELECT v, xor(x, x >> 31) AS x FROM h4{s}),
    regs{s} AS (
        SELECT v, CAST(x % {m} AS BIGINT) AS j,
               max(CASE WHEN (x >> {p}) = 0 THEN {maxrho}
                        ELSE {shift_bits} - length(bin(x >> {p})) + 1
                   END) AS rho
        FROM h5{s} GROUP BY v, CAST(x % {m} AS BIGINT)
    ),
    agg{s} AS (
        SELECT v,
               sum(CAST(1 AS HUGEINT) << ({W} - rho)) AS znum,
               count(*) AS nreg
        FROM regs{s} GROUP BY v
    ),
    est{s} AS (
        SELECT v,
               CAST({m} - nreg AS BIGINT) AS zeros,
               (CAST(znum + (CAST({m} AS HUGEINT) - nreg)
                     * (CAST(1 AS HUGEINT) << {W}) AS DOUBLE)
                / CAST(CAST(1 AS HUGEINT) << {W} AS DOUBLE)) AS zfull
        FROM agg{s}
    ),
    fin{s} AS (
        SELECT v,
               (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m} / zfull AS e_raw,
               zeros
        FROM est{s}
    ),
    ballv{s} AS MATERIALIZED (
        SELECT v,
               CAST(floor(CASE WHEN e_raw <= 2.5 * {m} AND zeros > 0
                    THEN {m} * ln({m} / CAST(greatest(zeros, 1) AS DOUBLE))
                    ELSE e_raw END + 0.5) AS BIGINT) AS ball
        FROM fin{s}
    )"""


def _hyperanf_sql(radius: int = 3, p: int = 8) -> str:
    """HyperANF oracle: true radius-hop forward ball membership by
    unrolled closure joins over the engine's vid space, then the
    bit-exact HLL replay (_hll_est_ctes). Register content is
    identical to the engine's max-merge rounds because register union
    distributes over set union."""
    prefix = _HYPERANF_PREFIX.format(durl=_DURL.format(c="v"))
    return f"""
    WITH targets AS ({_DOC_TARGETS}),
    {prefix},
    {_ball_ctes(radius)},
    {_hll_est_ctes(f'b{radius}', '', p)}
    SELECT vd.url AS url, bv.ball AS ball
    FROM ballv bv JOIN vid vd ON vd.vid = bv.v
    ORDER BY url
"""


def _harmonic_sql(radius: int = 3, p: int = 8) -> str:
    """HyperBall truncated harmonic centrality oracle: per-round
    integer ball estimates b_0..b_r from the bit-exact HLL replay,
    combined with the telescoped weights of
    imtag_ray.pipelines.hyperanf._ball_coefs (H = Σ coef_k · b_k)."""
    coefs = [-1.0]
    for k in range(1, radius):
        coefs.append(1.0 / k - 1.0 / (k + 1))
    coefs.append(1.0 / radius)
    prefix = _HYPERANF_PREFIX.format(durl=_DURL.format(c="v"))
    est_blocks = ",\n    ".join(
        _hll_est_ctes(f"b{k}", str(k), p).lstrip() for k in range(radius + 1)
    )
    terms = " + ".join(
        f"({coefs[k]!r}) * bv{k}.ball" for k in range(radius + 1)
    )
    joins = " ".join(
        f"JOIN ballv{k} bv{k} ON bv{k}.v = bv0.v"
        for k in range(1, radius + 1)
    )
    return f"""
    WITH targets AS ({_DOC_TARGETS}),
    {prefix},
    {_ball_ctes(radius)},
    {est_blocks}
    SELECT vd.url AS url, round({terms}, 9) AS harmonic
    FROM ballv0 bv0 {joins}
    JOIN vid vd ON vd.vid = bv0.v
    ORDER BY url
"""


def _betweenness_sql(n_sources: int = 8, depth: int = 6) -> str:
    """Brandes betweenness oracle: forward BFS levels with path
    counting (sigma — integer sums, order-free) then the backward
    dependency accumulation, both unrolled; the dependency term
    replays BROADCAST mode's per-edge form sigma(u)/sigma(v)·(1+δ(v))
    summed per u (the doc graph auto-picks broadcast); both sides
    round to 9 decimals."""
    parts = [
        f"WITH targets AS ({_DOC_TARGETS}),",
        "e AS MATERIALIZED (SELECT DISTINCT doc_id AS es, tgt AS ed"
        " FROM targets WHERE tgt != doc_id),",
        "verts(v) AS (SELECT es FROM e UNION SELECT ed FROM e),",
        f"src{n_sources} AS MATERIALIZED (SELECT v FROM verts"
        f" ORDER BY {_DURL.format(c='v')} LIMIT {n_sources}),",
        f"l0 AS MATERIALIZED (SELECT v AS s, v, 1.0 AS sigma"
        f" FROM src{n_sources}),",
        "vis0 AS MATERIALIZED (SELECT s, v FROM l0),",
    ]
    for k in range(1, depth + 1):
        parts.append(
            f"l{k} AS MATERIALIZED ("
            f"SELECT p.s, e.ed AS v, sum(p.sigma) AS sigma"
            f" FROM l{k-1} p JOIN e ON e.es = p.v"
            f" WHERE NOT EXISTS (SELECT 1 FROM vis{k-1} x"
            f" WHERE x.s = p.s AND x.v = e.ed)"
            f" GROUP BY p.s, e.ed),")
        parts.append(
            f"vis{k} AS MATERIALIZED (SELECT s, v FROM vis{k-1}"
            f" UNION ALL SELECT s, v FROM l{k}),")
    parts.append(
        f"dl{depth} AS MATERIALIZED"
        f" (SELECT s, v, sigma, 0.0 AS delta FROM l{depth}),")
    for k in range(depth - 1, 0, -1):
        parts.append(
            f"up{k} AS MATERIALIZED ("
            f"SELECT w.s, e.es AS v,"
            f" sum(lu.sigma / w.sigma * (1.0 + w.delta)) AS delta"
            f" FROM dl{k+1} w JOIN e ON e.ed = w.v"
            f" JOIN l{k} lu ON lu.s = w.s AND lu.v = e.es"
            f" GROUP BY w.s, e.es),")
        parts.append(
            f"dl{k} AS MATERIALIZED ("
            f"SELECT u.s, u.v, u.sigma, coalesce(up{k}.delta, 0.0) AS delta"
            f" FROM l{k} u LEFT JOIN up{k}"
            f" ON up{k}.s = u.s AND up{k}.v = u.v),")
    alldl = " UNION ALL ".join(
        f"SELECT v, delta FROM dl{k}" for k in range(1, depth + 1)
    )
    parts.append(f"acc AS ({alldl}),")
    parts.append(
        "tot AS MATERIALIZED (SELECT v, sum(delta) AS bc"
        " FROM acc GROUP BY v)")
    return "\n".join(parts) + f"""
    SELECT {_DURL.format(c='verts.v')} AS url,
           round(coalesce(tot.bc, 0.0), 9) AS bc
    FROM verts LEFT JOIN tot ON tot.v = verts.v
    ORDER BY url"""


def _msf_unrolled_sql(rounds: int = 2) -> str:
    """Borůvka MSF oracle: R rounds unrolled over the weighted copart
    graph in part-key space (w = 1 + (pa_+pb_) % 7, argmin by the
    total (w, a, b) key — key order == url order == vid order, so the
    selected edge set equals the engine's). Per round: per-component
    window argmin, then a recursive-CTE min-label closure over the
    selected component pairs (full within-round merging, exactly
    pipelines.msf.boruvka_forest's contract)."""
    parts = [
        f"WITH RECURSIVE pairs AS MATERIALIZED ({_COPART_PAIRS}),",
        "we AS MATERIALIZED (SELECT pa_ AS a, pb_ AS b,"
        " 1 + (pa_ + pb_) % 7 AS w FROM pairs),",
        # bare UNION CTEs under WITH RECURSIVE get recursive-union
        # semantics in DuckDB (no dedup) — spell the distinct out
        "verts AS MATERIALIZED (SELECT DISTINCT v FROM"
        " (SELECT a AS v FROM we UNION ALL SELECT b FROM we)),",
        "c0 AS MATERIALIZED (SELECT v, v AS c FROM verts),",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(f"""
    tag{k} AS MATERIALIZED (
        SELECT we.a, we.b, we.w, xa.c AS ca, xb.c AS cb
        FROM we JOIN c{p} xa ON xa.v = we.a JOIN c{p} xb ON xb.v = we.b
        WHERE xa.c != xb.c),
    nom{k} AS (
        SELECT ca AS c, w, a, b, ca, cb FROM tag{k}
        UNION ALL SELECT cb, w, a, b, ca, cb FROM tag{k}),
    sel{k} AS MATERIALIZED (
        SELECT DISTINCT a, b, w, ca, cb FROM (
            SELECT *, row_number() OVER (
                PARTITION BY c ORDER BY w, a, b) AS rn
            FROM nom{k}) WHERE rn = 1),
    lbls{k} AS MATERIALIZED (SELECT DISTINCT x FROM
        (SELECT ca AS x FROM sel{k} UNION ALL SELECT cb FROM sel{k})),
    und{k} AS MATERIALIZED (SELECT DISTINCT x, y FROM
        (SELECT ca AS x, cb AS y FROM sel{k}
         UNION ALL SELECT cb, ca FROM sel{k})),
    reach{k}(x, l) AS (
        SELECT x, x FROM lbls{k}
        UNION
        SELECT u.x, r.l FROM und{k} u JOIN reach{k} r ON r.x = u.y),
    map{k} AS MATERIALIZED (
        SELECT x, min(l) AS l FROM reach{k} GROUP BY x),
    c{k} AS MATERIALIZED (
        SELECT c{p}.v, coalesce(map{k}.l, c{p}.c) AS c
        FROM c{p} LEFT JOIN map{k} ON map{k}.x = c{p}.c),""")
    forest = " UNION ALL ".join(
        f"SELECT a, b, w FROM sel{k}" for k in range(1, rounds + 1)
    )
    parts.append(
        f"forest AS (SELECT DISTINCT a, b, w FROM ({forest}))"
    )
    return "\n".join(parts) + f"""
    SELECT {_PURL.format(c='a')} AS url_a, {_PURL.format(c='b')} AS url_b,
           CAST(w AS BIGINT) AS weight
    FROM forest ORDER BY url_a, url_b
"""


def _matching_sql(rounds: int = 3) -> str:
    """Handshake maximal-matching oracle: per round every alive vertex
    targets its min-priority alive neighbor (row_number argmin over
    the replayed splitmix64 priorities), mutual targets match and
    leave — exactly pipelines.matching.maximal_matching's rounds."""
    K = 0x9E3779B97F4A7C15
    parts = [
        f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
        "uraw AS (SELECT pa_ AS s, pb_ AS d FROM pairs"
        " UNION ALL SELECT pb_, pa_ FROM pairs),",
        "verts AS MATERIALIZED (SELECT DISTINCT s AS v FROM uraw),",
        "vid AS MATERIALIZED (SELECT v,"
        " CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS vid"
        " FROM verts),",
        "und AS MATERIALIZED (SELECT sv.vid AS s, dv.vid AS d FROM uraw"
        " JOIN vid sv ON sv.v = uraw.s JOIN vid dv ON dv.v = uraw.d),",
        "a0 AS MATERIALIZED (SELECT vid AS v FROM vid),",
    ]
    for k in range(rounds):
        g = (k + 1) * K % (1 << 64)
        pri = _sm64_sql(
            f"CAST((CAST({{col}} AS HUGEINT) + {g})"
            " % 18446744073709551616 AS UBIGINT)"
        )
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT v, "
            + pri.format(col="v")
            + f" AS pri FROM a{k}),"
        )
        parts.append(
            f"tgt{k} AS MATERIALIZED ("
            f"SELECT u, v FROM ("
            f"SELECT e.s AS u, e.d AS v,"
            f" row_number() OVER (PARTITION BY e.s"
            f" ORDER BY pd.pri, e.d) AS rn"
            f" FROM und e JOIN a{k} x ON x.v = e.s"
            f" JOIN a{k} y ON y.v = e.d"
            f" JOIN p{k} pd ON pd.v = e.d) WHERE rn = 1),"
        )
        parts.append(
            f"m{k} AS MATERIALIZED ("
            f"SELECT t1.u AS lo, t1.v AS hi FROM tgt{k} t1"
            f" JOIN tgt{k} t2 ON t2.u = t1.v AND t2.v = t1.u"
            f" WHERE t1.u < t1.v),"
        )
        parts.append(
            f"a{k+1} AS MATERIALIZED (SELECT v FROM a{k}"
            f" EXCEPT SELECT lo FROM m{k} EXCEPT SELECT hi FROM m{k}),"
        )
    allm = " UNION ALL ".join(
        f"SELECT lo, hi FROM m{k}" for k in range(rounds)
    )
    parts.append(f"matched AS ({allm})")
    return "\n".join(parts) + f"""
    SELECT {_PURL.format(c='va.v')} AS url_a, {_PURL.format(c='vb.v')} AS url_b
    FROM matched
    JOIN vid va ON va.vid = matched.lo
    JOIN vid vb ON vb.vid = matched.hi
    ORDER BY url_a, url_b
"""


def _coloring_sql(colors: int = 3, rounds: int = 2) -> str:
    """Greedy-coloring oracle: colors × rounds Luby blocks unrolled
    (same splitmix64 priority replay as _mis_sql, priority index
    c·rounds + k); dominated vertices return to the pool between
    colors, exactly pipelines.mis.greedy_coloring's fixed-budget
    semantics."""
    K = 0x9E3779B97F4A7C15
    parts = [
        f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
        "uraw AS (SELECT pa_ AS s, pb_ AS d FROM pairs"
        " UNION ALL SELECT pb_, pa_ FROM pairs),",
        "verts AS MATERIALIZED (SELECT DISTINCT s AS v FROM uraw),",
        "vid AS MATERIALIZED (SELECT v,"
        " CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS vid"
        " FROM verts),",
        "und AS MATERIALIZED (SELECT sv.vid AS s, dv.vid AS d FROM uraw"
        " JOIN vid sv ON sv.v = uraw.s JOIN vid dv ON dv.v = uraw.d),",
        "u0 AS MATERIALIZED (SELECT vid AS v FROM vid),",
    ]
    for c in range(colors):
        parts.append(f"a{c}_0 AS MATERIALIZED (SELECT v FROM u{c}),")
        for k in range(rounds):
            g = (c * rounds + k + 1) * K % (1 << 64)
            pri = _sm64_sql(
                f"CAST((CAST({{col}} AS HUGEINT) + {g})"
                " % 18446744073709551616 AS UBIGINT)"
            )
            parts.append(
                f"p{c}_{k} AS MATERIALIZED (SELECT v, "
                + pri.format(col="v")
                + f" AS pri FROM a{c}_{k}),"
            )
            parts.append(
                f"w{c}_{k} AS MATERIALIZED ("
                f"SELECT pv.v FROM p{c}_{k} pv WHERE NOT EXISTS ("
                f"SELECT 1 FROM und u JOIN p{c}_{k} pd ON pd.v = u.d"
                f" WHERE u.s = pv.v AND pd.pri < pv.pri)),"
            )
            parts.append(
                f"r{c}_{k} AS MATERIALIZED ("
                f"SELECT u.d AS v FROM und u JOIN w{c}_{k} w ON w.v = u.s"
                f" JOIN a{c}_{k} x ON x.v = u.d"
                f" EXCEPT SELECT v FROM w{c}_{k}),"
            )
            parts.append(
                f"a{c}_{k+1} AS MATERIALIZED (SELECT v FROM a{c}_{k}"
                f" EXCEPT SELECT v FROM w{c}_{k}"
                f" EXCEPT SELECT v FROM r{c}_{k}),"
            )
        wins = " UNION ALL ".join(
            f"SELECT v FROM w{c}_{k}" for k in range(rounds)
        )
        parts.append(f"col{c} AS MATERIALIZED ({wins}),")
        parts.append(
            f"u{c+1} AS MATERIALIZED (SELECT v FROM u{c}"
            f" EXCEPT SELECT v FROM col{c}),"
        )
    cases = " ".join(
        f"WHEN vd.vid IN (SELECT v FROM col{c}) THEN {c}"
        for c in range(colors)
    )
    parts[-1] = parts[-1].rstrip(",")  # drop trailing comma
    return "\n".join(parts) + f"""
    SELECT {_PURL.format(c='vd.v')} AS url,
           CAST(CASE {cases} ELSE -1 END AS BIGINT) AS color
    FROM vid vd ORDER BY url
"""


def _eigen_unrolled_sql(iters: int = 8) -> str:
    """Eigenvector-centrality oracle: K rounds of x_r = in-sum of
    x_{r-1} unrolled (x_0 = 1, no per-round normalization — scalar
    factor applied once at the end), exactly
    pipelines.traversal.eigenvector_centrality's contract. Scores are
    integers until the final divide, so join order is immaterial."""
    parts = [f"WITH targets AS ({_DOC_TARGETS}),",
             "e AS MATERIALIZED (SELECT DISTINCT doc_id AS s, tgt AS d"
             " FROM targets WHERE tgt != doc_id),",
             "verts(v) AS (SELECT s FROM e UNION SELECT d FROM e),",
             "x0 AS (SELECT v, 1.0 AS x FROM verts),"]
    for r in range(1, iters + 1):
        parts.append(
            f"x{r} AS MATERIALIZED (SELECT e.d AS v, sum(x{r-1}.x) AS x"
            f" FROM e JOIN x{r-1} ON x{r-1}.v = e.s GROUP BY e.d),")
    parts.append(
        f"fin AS MATERIALIZED (SELECT verts.v,"
        f" coalesce(x{iters}.x, 0) AS xr FROM verts"
        f" LEFT JOIN x{iters} ON x{iters}.v = verts.v),")
    parts.append("tot AS (SELECT sum(xr) AS t FROM fin)")
    return "\n".join(parts) + f"""
    SELECT {_DURL.format(c='fin.v')} AS url,
           round(fin.xr / nullif((SELECT t FROM tot), 0), 9) AS score
    FROM fin ORDER BY url"""


def _katz_unrolled_sql(iters: int = 8, alpha: float = 0.125) -> str:
    """Katz-centrality oracle: K rounds of x_r = 1 + α·(in-sum of
    x_{r-1}) unrolled (x_0 = 1, β = 1), one L1 normalize at the end —
    pipelines.traversal.katz_centrality's contract. α = 1/8 keeps every
    intermediate a dyadic rational exactly representable in float64, so
    join/summation order is immaterial on both sides. Each round is a
    LEFT JOIN over ALL vertices (a vertex with no in-edges stays at 1,
    unlike the eigen oracle where it decays to 0)."""
    parts = [f"WITH targets AS ({_DOC_TARGETS}),",
             "e AS MATERIALIZED (SELECT DISTINCT doc_id AS s, tgt AS d"
             " FROM targets WHERE tgt != doc_id),",
             "verts(v) AS (SELECT s FROM e UNION SELECT d FROM e),",
             "x0 AS (SELECT v, 1.0 AS x FROM verts),"]
    for r in range(1, iters + 1):
        parts.append(
            f"m{r} AS MATERIALIZED (SELECT e.d AS v, sum(x{r-1}.x) AS mx"
            f" FROM e JOIN x{r-1} ON x{r-1}.v = e.s GROUP BY e.d),")
        parts.append(
            f"x{r} AS MATERIALIZED (SELECT verts.v,"
            f" 1.0 + {alpha!r} * coalesce(m{r}.mx, 0) AS x FROM verts"
            f" LEFT JOIN m{r} ON m{r}.v = verts.v),")
    parts.append(f"tot AS (SELECT sum(x) AS t FROM x{iters})")
    return "\n".join(parts) + f"""
    SELECT {_DURL.format(c=f'x{iters}.v')} AS url,
           round(x{iters}.x / nullif((SELECT t FROM tot), 0), 9) AS score
    FROM x{iters} ORDER BY url"""


def _mis_sql(rounds: int = 3) -> str:
    """Luby-MIS oracle: `rounds` rounds unrolled over the symmetrized
    copart graph in the engine's vid space (vid = url rank = numeric
    part-key rank — part urls are zero-padded). Round-k priority =
    splitmix64(vid + k·K) replayed via _sm64_sql with the +K increment
    folded into the constant; priorities are distinct within a round
    (splitmix64 is a bijection), so winner = alive vertex with NO
    alive neighbor of strictly smaller priority — exactly
    imtag_ray.pipelines.mis.maximal_independent_set's fixed-round
    semantics."""
    K = 0x9E3779B97F4A7C15
    parts = [
        f"WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),",
        "uraw AS (SELECT pa_ AS s, pb_ AS d FROM pairs"
        " UNION ALL SELECT pb_, pa_ FROM pairs),",
        "verts AS MATERIALIZED (SELECT DISTINCT s AS v FROM uraw),",
        "vid AS MATERIALIZED (SELECT v,"
        " CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS vid"
        " FROM verts),",
        "und AS MATERIALIZED (SELECT sv.vid AS s, dv.vid AS d FROM uraw"
        " JOIN vid sv ON sv.v = uraw.s JOIN vid dv ON dv.v = uraw.d),",
        "a0 AS MATERIALIZED (SELECT vid AS v FROM vid),",
    ]
    for k in range(rounds):
        c = (k + 1) * K % (1 << 64)
        pri = _sm64_sql(
            f"CAST((CAST({{col}} AS HUGEINT) + {c})"
            " % 18446744073709551616 AS UBIGINT)"
        )
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT v, "
            + pri.format(col="v")
            + f" AS pri FROM a{k}),"
        )
        parts.append(
            f"w{k} AS MATERIALIZED ("
            f"SELECT pv.v FROM p{k} pv WHERE NOT EXISTS ("
            f"SELECT 1 FROM und u JOIN p{k} pd ON pd.v = u.d"
            f" WHERE u.s = pv.v AND pd.pri < pv.pri)),"
        )
        parts.append(
            f"r{k} AS MATERIALIZED ("
            f"SELECT u.d AS v FROM und u JOIN w{k} w ON w.v = u.s"
            f" JOIN a{k} x ON x.v = u.d"
            f" EXCEPT SELECT v FROM w{k}),"
        )
        parts.append(
            f"a{k+1} AS MATERIALIZED (SELECT v FROM a{k}"
            f" EXCEPT SELECT v FROM w{k} EXCEPT SELECT v FROM r{k}),"
        )
    wins = " UNION ALL ".join(
        f"SELECT v FROM w{k}" for k in range(rounds)
    )
    rems = " UNION ALL ".join(
        f"SELECT v FROM r{k}" for k in range(rounds)
    )
    parts.append(f"wall AS ({wins}),")
    parts.append(f"rall AS ({rems})")
    return "\n".join(parts) + f"""
    SELECT {_PURL.format(c='vd.v')} AS url,
           CAST(CASE WHEN wall.v IS NOT NULL THEN 1
                     WHEN rall.v IS NOT NULL THEN 0
                     ELSE -1 END AS BIGINT) AS status
    FROM vid vd
    LEFT JOIN (SELECT DISTINCT v FROM wall) wall ON wall.v = vd.vid
    LEFT JOIN (SELECT DISTINCT v FROM rall) rall ON rall.v = vd.vid
    ORDER BY url
"""


def _nf_ctes(radius: int, p: int) -> str:
    """Shared CTE block for the neighbourhood-function oracles: ball
    closures b0..bR plus per-round bit-exact HLL estimates, ending in
    nf (k, nf) = Σ_v integer ball_k estimate."""
    est_blocks = ",\n    ".join(
        _hll_est_ctes(f"b{k}", str(k), p).lstrip() for k in range(radius + 1)
    )
    nf_rows = "\n        UNION ALL ".join(
        f"SELECT {k} AS k, sum(ball) AS nf FROM ballv{k}"
        for k in range(radius + 1)
    )
    prefix = _HYPERANF_PREFIX.format(durl=_DURL.format(c="v"))
    return f"""
    WITH targets AS ({_DOC_TARGETS}),
    {prefix},
    {_ball_ctes(radius)},
    {est_blocks},
    nf AS MATERIALIZED ({nf_rows})"""


def _nf_sql(radius: int = 4, p: int = 8) -> str:
    """Neighbourhood-function oracle: true k-hop ball membership per
    round by unrolled closure joins, bit-exact HLL replay, summed."""
    return f"""
    {_nf_ctes(radius, p)}
    SELECT k, CAST(nf AS BIGINT) AS nf FROM nf ORDER BY k
"""


def _effdiam_sql(radius: int = 4, p: int = 8, q: float = 0.9) -> str:
    """Interpolated q-effective diameter from the SAME integer N(k)
    values the engine computes: k0 = min k with N(k) ≥ q·N(R), then
    (k0−1) + (q·N(R) − N(k0−1)) / (N(k0) − N(k0−1)) in plain DOUBLE
    arithmetic, identical operation order to
    imtag_ray.pipelines.hyperanf.effective_diameter."""
    return f"""
    {_nf_ctes(radius, p)},
    tgt AS (
        SELECT {q!r} * CAST(nf AS DOUBLE) AS t FROM nf WHERE k = {radius}
    ),
    hit AS (
        SELECT (SELECT min(k) FROM nf, tgt
                WHERE CAST(nf.nf AS DOUBLE) >= tgt.t) AS k0,
               (SELECT t FROM tgt) AS t
    )
    SELECT round(
        CASE WHEN k0 = 0 THEN 0.0
             ELSE (k0 - 1)
                  + (t - (SELECT CAST(nf AS DOUBLE) FROM nf
                          WHERE k = hit.k0 - 1))
                    / ((SELECT CAST(nf AS DOUBLE) FROM nf WHERE k = hit.k0)
                       - (SELECT CAST(nf AS DOUBLE) FROM nf
                          WHERE k = hit.k0 - 1))
        END, 9) AS eff_diam
    FROM hit
"""


def oracle_sql() -> dict[str, str]:
    purl_a = _PURL.format(c="pa_")
    purl_b = _PURL.format(c="pb_")
    purl_wa = _PURL.format(c="a")
    purl_wb = _PURL.format(c="b")
    o = {
        "doc_anchors": f"""
            WITH targets AS ({_DOC_TARGETS})
            SELECT {_DURL.format(c='doc_id')} AS src_url,
                   {_DURL.format(c='tgt')} AS dst_url,
                   'd' || CAST(tgt AS VARCHAR) AS anchor
            FROM targets WHERE tgt != doc_id
            ORDER BY src_url, dst_url, anchor
        """,
        "doc_anchor_index": f"""
            WITH targets AS ({_DOC_TARGETS})
            SELECT {_DURL.format(c='tgt')} AS dst_url,
                   'd' || CAST(tgt AS VARCHAR) AS anchor,
                   CAST(count(*) AS BIGINT) AS n
            FROM targets WHERE tgt != doc_id
            GROUP BY 1, 2 ORDER BY dst_url, anchor
        """,
        "doc_edges": f"""
            WITH targets AS ({_DOC_TARGETS}),
            fil AS (SELECT DISTINCT doc_id, tgt FROM targets WHERE tgt != doc_id)
            SELECT {_DURL.format(c='doc_id')} AS src_url,
                   {_DURL.format(c='tgt')} AS dst_url
            FROM fil ORDER BY src_url, dst_url
        """,
        "doc_link_density": f"""
            WITH targets AS ({_DOC_TARGETS}),
            fil AS (SELECT doc_id, tgt FROM targets WHERE tgt != doc_id),
            lc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_links
                   FROM fil GROUP BY doc_id),
            anchors AS (
                SELECT doc_id,
                       string_agg('d' || CAST(tgt AS VARCHAR), ' '
                                  ORDER BY ord, tgt) AS atext
                FROM (SELECT doc_id, ord, tgt FROM targets
                      WHERE tgt != doc_id) GROUP BY doc_id),
            tx AS (SELECT d.doc_id,
                          trim(regexp_replace(coalesce(d.text, ''),
                               '\\s+', ' ', 'g')
                               || ' ' || coalesce(a.atext, '')) AS t
                   FROM documents d
                   LEFT JOIN anchors a ON a.doc_id = d.doc_id)
            SELECT {_DURL.format(c='tx.doc_id')} AS url,
                   CAST(coalesce(lc.n_links, 0) AS BIGINT) AS n_links,
                   CAST(CASE WHEN tx.t = '' THEN 0
                        ELSE len(regexp_split_to_array(tx.t, '\\s+'))
                        END AS BIGINT) AS n_tokens
            FROM tx LEFT JOIN lc ON lc.doc_id = tx.doc_id
            ORDER BY url
        """,
        "lattice_components48": r"""
            WITH RECURSIVE n AS (SELECT count(*) AS nn FROM documents),
            px AS (SELECT rr.r AS r, cx.c AS c
                   FROM unnest(range(0, 48)) AS rr(r),
                        unnest(range(0, 48)) AS cx(c), n
                   WHERE CAST('0x' || substring(md5('px:' ||
                         CAST(rr.r * 48 + cx.c + n.nn AS VARCHAR)),
                         1, 8) AS UBIGINT) % 100 < 45),
            e AS (SELECT a.r * 48 + a.c AS s, b.r * 48 + b.c AS d
                  FROM px a JOIN px b
                    ON (b.r = a.r AND b.c = a.c + 1)
                    OR (b.r = a.r + 1 AND b.c = a.c)),
            und AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
            verts AS (SELECT r * 48 + c AS v FROM px),
            reach(v, l) AS (
                SELECT v, v FROM verts
                UNION
                SELECT u.d, rc.l FROM reach rc JOIN und u ON u.s = rc.v),
            minl AS (SELECT v, min(l) AS ml FROM reach GROUP BY v),
            comp AS (SELECT ml, count(*) AS sz FROM minl GROUP BY ml)
            SELECT CAST(sz AS BIGINT) AS size,
                   CAST(count(*) AS BIGINT) AS n_components
            FROM comp GROUP BY sz ORDER BY size
        """,
        "lattice_components48_eight": r"""
            WITH RECURSIVE n AS (SELECT count(*) AS nn FROM documents),
            px AS (SELECT rr.r AS r, cx.c AS c
                   FROM unnest(range(0, 48)) AS rr(r),
                        unnest(range(0, 48)) AS cx(c), n
                   WHERE CAST('0x' || substring(md5('px:' ||
                         CAST(rr.r * 48 + cx.c + n.nn AS VARCHAR)),
                         1, 8) AS UBIGINT) % 100 < 45),
            e AS (SELECT a.r * 48 + a.c AS s, b.r * 48 + b.c AS d
                  FROM px a JOIN px b
                    ON (b.r = a.r AND b.c = a.c + 1)
                    OR (b.r = a.r + 1 AND b.c = a.c)
                    OR (b.r = a.r + 1 AND b.c = a.c + 1)
                    OR (b.r = a.r + 1 AND b.c = a.c - 1)),
            und AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
            verts AS (SELECT r * 48 + c AS v FROM px),
            reach(v, l) AS (
                SELECT v, v FROM verts
                UNION
                SELECT u.d, rc.l FROM reach rc JOIN und u ON u.s = rc.v),
            minl AS (SELECT v, min(l) AS ml FROM reach GROUP BY v),
            comp AS (SELECT ml, count(*) AS sz FROM minl GROUP BY ml)
            SELECT CAST(sz AS BIGINT) AS size,
                   CAST(count(*) AS BIGINT) AS n_components
            FROM comp GROUP BY sz ORDER BY size
        """,
        "lattice_holes48": r"""
            WITH RECURSIVE n AS (SELECT count(*) AS nn FROM documents),
            allp AS (SELECT rr.r AS r, cx.c AS c,
                            CAST('0x' || substring(md5('px:' ||
                                CAST(rr.r * 48 + cx.c + n.nn AS VARCHAR)),
                                1, 8) AS UBIGINT) % 100 < 45 AS fg
                     FROM unnest(range(0, 48)) AS rr(r),
                          unnest(range(0, 48)) AS cx(c), n),
            px AS (SELECT r, c FROM allp WHERE fg),
            bg AS (SELECT r, c FROM allp WHERE NOT fg),
            le AS (SELECT a.r * 48 + a.c AS s, b.r * 48 + b.c AS d
                   FROM px a JOIN px b
                     ON (b.r = a.r AND b.c = a.c + 1)
                     OR (b.r = a.r + 1 AND b.c = a.c)),
            lund AS (SELECT s, d FROM le UNION SELECT d, s FROM le),
            lverts AS (SELECT r * 48 + c AS v FROM px),
            lreach(v, l) AS (
                SELECT v, v FROM lverts
                UNION
                SELECT u.d, rc.l FROM lreach rc JOIN lund u ON u.s = rc.v),
            lminl AS (SELECT v, min(l) AS ml FROM lreach GROUP BY v),
            be AS (SELECT a.r * 48 + a.c AS s, b.r * 48 + b.c AS d
                   FROM bg a JOIN bg b
                     ON (b.r = a.r AND b.c = a.c + 1)
                     OR (b.r = a.r + 1 AND b.c = a.c)),
            bund AS (SELECT s, d FROM be UNION SELECT d, s FROM be),
            bverts AS (SELECT r * 48 + c AS v FROM bg),
            breach(v, l) AS (
                SELECT v, v FROM bverts
                UNION
                SELECT u.d, rc.l FROM breach rc JOIN bund u ON u.s = rc.v),
            bminl AS (SELECT v, min(l) AS ml FROM breach GROUP BY v),
            contact AS (
                SELECT DISTINCT lm.ml AS lml, bm.ml AS bml
                FROM px a JOIN bg b
                  ON (b.r = a.r AND abs(b.c - a.c) = 1)
                  OR (b.c = a.c AND abs(b.r - a.r) = 1)
                JOIN lminl lm ON lm.v = a.r * 48 + a.c
                JOIN bminl bm ON bm.v = b.r * 48 + b.c)
            SELECT CAST((SELECT count(DISTINCT ml) FROM lminl) AS BIGINT)
                       AS n_land,
                   CAST((SELECT count(DISTINCT ml) FROM bminl) AS BIGINT)
                       AS n_holes,
                   CAST((SELECT count(*) FROM contact) AS BIGINT)
                       AS n_adj_pairs
        """,
        "doc_graphlets": f"""
            WITH targets AS ({_DOC_TARGETS}),
            e AS (SELECT DISTINCT doc_id AS s, tgt AS d
                  FROM targets WHERE tgt != doc_id),
            ue AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                   FROM e),
            deg AS (SELECT v, count(*) AS dg FROM
                      (SELECT a AS v FROM ue UNION ALL SELECT b FROM ue)
                    GROUP BY v),
            wt AS (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT) AS w
                   FROM deg),
            tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM ue ab
                   JOIN ue ac ON ac.a = ab.a AND ac.b > ab.b
                   JOIN ue bc ON bc.a = ab.b AND bc.b = ac.b),
            kt AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ue ab
                   JOIN ue ac ON ac.a = ab.a AND ac.b > ab.b
                   JOIN ue ad ON ad.a = ab.a AND ad.b > ac.b
                   JOIN ue bc ON bc.a = ab.b AND bc.b = ac.b
                   JOIN ue bd ON bd.a = ab.b AND bd.b = ad.b
                   JOIN ue cd ON cd.a = ac.b AND cd.b = ad.b)
            SELECT wt.w AS n_wedges, tt.t AS n_triangles, kt.k AS n_k4
            FROM wt, tt, kt
        """,
        "doc_source_graph": f"""
            WITH targets AS ({_DOC_TARGETS}),
            e AS (SELECT DISTINCT doc_id AS src_id, tgt AS dst_id
                  FROM targets WHERE tgt != doc_id)
            SELECT da.source AS src_source, db.source AS dst_source,
                   CAST(count(*) AS BIGINT) AS n_links
            FROM e JOIN documents da ON da.doc_id = e.src_id
                   JOIN documents db ON db.doc_id = e.dst_id
            GROUP BY 1, 2 ORDER BY src_source, dst_source
        """,
        "doc_source_cut": f"""
            WITH targets AS ({_DOC_TARGETS}),
            e AS (SELECT DISTINCT doc_id AS src_id, tgt AS dst_id
                  FROM targets WHERE tgt != doc_id),
            m AS (SELECT da.source AS s, db.source AS t,
                         CAST(count(*) AS BIGINT) AS n
                  FROM e JOIN documents da ON da.doc_id = e.src_id
                         JOIN documents db ON db.doc_id = e.dst_id
                  GROUP BY 1, 2),
            sides AS (
                SELECT s AS source,
                       CASE WHEN s = t THEN n ELSE 0 END AS n_internal,
                       CASE WHEN s != t THEN n ELSE 0 END AS n_out_cut,
                       CAST(0 AS BIGINT) AS n_in_cut
                FROM m
                UNION ALL
                SELECT t, 0, 0, n FROM m WHERE s != t
            )
            SELECT source,
                   CAST(sum(n_internal) AS BIGINT) AS n_internal,
                   CAST(sum(n_out_cut) AS BIGINT) AS n_out_cut,
                   CAST(sum(n_in_cut) AS BIGINT) AS n_in_cut,
                   CAST(2 * sum(n_internal) + sum(n_out_cut)
                        + sum(n_in_cut) AS BIGINT) AS volume
            FROM sides GROUP BY source ORDER BY source
        """,
        "doc_cocitation": f"""
            WITH targets AS ({_DOC_TARGETS}),
            e AS (SELECT DISTINCT doc_id AS src_id, tgt AS dst_id
                  FROM targets WHERE tgt != doc_id)
            SELECT {_DURL.format(c='x.dst_id')} AS url_a,
                   {_DURL.format(c='y.dst_id')} AS url_b,
                   CAST(count(*) AS BIGINT) AS n_cociting
            FROM e x JOIN e y
              ON x.src_id = y.src_id AND x.dst_id < y.dst_id
            GROUP BY 1, 2
            ORDER BY n_cociting DESC, url_a, url_b LIMIT 50
        """,
        "doc_texts": f"""
            WITH targets AS ({_DOC_TARGETS}),
            fil AS (SELECT doc_id, ord, tgt FROM targets WHERE tgt != doc_id),
            anchors AS (
                SELECT doc_id,
                       string_agg('d' || CAST(tgt AS VARCHAR), ' ' ORDER BY ord, tgt) AS atext
                FROM fil GROUP BY doc_id
            )
            SELECT {_DURL.format(c='d.doc_id')} AS url,
                   trim(regexp_replace(coalesce(d.text,''), '\\s+', ' ', 'g')
                        || ' ' || coalesce(a.atext, '')) AS text
            FROM documents d LEFT JOIN anchors a ON a.doc_id = d.doc_id
            ORDER BY url
        """,
        "copart_edges": f"""
            WITH pairs AS ({_COPART_PAIRS})
            SELECT {purl_a} AS src_url, {purl_b} AS dst_url
            FROM pairs ORDER BY src_url, dst_url
        """,
        "copart_weighted": f"""
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem)
            SELECT {_PURL.format(c='a.l_partkey')} AS src_url,
                   {_PURL.format(c='b.l_partkey')} AS dst_url,
                   CAST(count(*) AS BIGINT) AS weight
            FROM op a JOIN op b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 ORDER BY src_url, dst_url
        """,
        "doc_sample3_per_source": r"""
            WITH h AS (
              SELECT source, doc_id,
                     CAST('0x' || substring(
                         md5('samp:' || CAST(doc_id AS VARCHAR)),
                         1, 15) AS UBIGINT) AS hv
              FROM documents),
            r AS (
              SELECT source, doc_id,
                     row_number() OVER (
                         PARTITION BY source ORDER BY hv, doc_id)
                         AS rnk
              FROM h)
            SELECT source, doc_id, CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 3
            ORDER BY source, rnk
        """,
        "copart_harmonic8": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            verts AS MATERIALIZED (SELECT DISTINCT s AS v FROM und),
            sd AS MATERIALIZED (
                SELECT v, row_number() OVER (ORDER BY v) - 1 AS i
                FROM (SELECT v FROM verts ORDER BY v LIMIT 4)),
            w0(it, v, dist) AS (
                SELECT 0, (SELECT v FROM sd WHERE i = 0), 0
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM w0 w JOIN und u ON u.s = w.v
                WHERE w.it < 8 GROUP BY w.it, u.d),
            w1(it, v, dist) AS (
                SELECT 0, (SELECT v FROM sd WHERE i = 1), 0
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM w1 w JOIN und u ON u.s = w.v
                WHERE w.it < 8 GROUP BY w.it, u.d),
            w2(it, v, dist) AS (
                SELECT 0, (SELECT v FROM sd WHERE i = 2), 0
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM w2 w JOIN und u ON u.s = w.v
                WHERE w.it < 8 GROUP BY w.it, u.d),
            w3(it, v, dist) AS (
                SELECT 0, (SELECT v FROM sd WHERE i = 3), 0
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM w3 w JOIN und u ON u.s = w.v
                WHERE w.it < 8 GROUP BY w.it, u.d),
            d0 AS (SELECT v, min(dist) AS d FROM w0 GROUP BY v),
            d1 AS (SELECT v, min(dist) AS d FROM w1 GROUP BY v),
            d2 AS (SELECT v, min(dist) AS d FROM w2 GROUP BY v),
            d3 AS (SELECT v, min(dist) AS d FROM w3 GROUP BY v)
            SELECT {_PURL.format(c='verts.v')} AS url,
                   (CASE WHEN d0.d > 0 THEN 1.0 / d0.d ELSE 0.0 END)
                 + (CASE WHEN d1.d > 0 THEN 1.0 / d1.d ELSE 0.0 END)
                 + (CASE WHEN d2.d > 0 THEN 1.0 / d2.d ELSE 0.0 END)
                 + (CASE WHEN d3.d > 0 THEN 1.0 / d3.d ELSE 0.0 END)
                   AS harmonic
            FROM verts
            LEFT JOIN d0 ON d0.v = verts.v
            LEFT JOIN d1 ON d1.v = verts.v
            LEFT JOIN d2 ON d2.v = verts.v
            LEFT JOIN d3 ON d3.v = verts.v
            ORDER BY url
        """,
        "copart_negatives": f"""
            WITH pairs AS ({_COPART_PAIRS}),
            verts AS (SELECT DISTINCT u FROM (
                SELECT pa_ AS u FROM pairs
                UNION ALL SELECT pb_ FROM pairs)),
            cand AS (
              -- residue form of (a*2654435761 + b) % 50 = 0: never
              -- overflows BIGINT at any key range (matches the
              -- engine's closed-form residue-class generator)
              SELECT a.u AS x, b.u AS y
              FROM verts a JOIN verts b ON a.u < b.u
              WHERE ((a.u % 50) * (2654435761 % 50) + (b.u % 50)) % 50 = 0),
            neg AS (
              SELECT x, y FROM cand
              WHERE NOT EXISTS (SELECT 1 FROM pairs
                                WHERE pairs.pa_ = cand.x
                                  AND pairs.pb_ = cand.y))
            SELECT {_PURL.format(c='x')} AS src_url,
                   {_PURL.format(c='y')} AS dst_url
            FROM neg ORDER BY src_url, dst_url
        """,
        "copart_feature_agg2": f"""
            WITH pairs AS ({_COPART_PAIRS}),
            und AS (SELECT pa_ AS u, pb_ AS v FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            f AS (SELECT p_partkey AS pk,
                         CAST(floor(p_retailprice * 100.0 + 0.5)
                              AS BIGINT) AS fc
                  FROM part),
            n1 AS (SELECT und.u, sum(f.fc) AS s1, count(*) AS deg
                   FROM und JOIN f ON f.pk = und.v GROUP BY 1),
            n2 AS (SELECT und.u, sum(n1.s1) AS s2, sum(n1.deg) AS w2
                   FROM und JOIN n1 ON n1.u = und.v GROUP BY 1)
            SELECT {_PURL.format(c='n1.u')} AS url,
                   CAST(n1.deg AS BIGINT) AS degree,
                   n1.s1 * 1.0 / (100.0 * n1.deg) AS h1,
                   n2.s2 * 1.0 / (100.0 * n2.w2) AS h2
            FROM n1 JOIN n2 ON n2.u = n1.u
            ORDER BY url
        """,
        "copart_degree": f"""
            WITH pairs AS ({_COPART_PAIRS}),
            und AS (SELECT pa_ AS u FROM pairs UNION ALL SELECT pb_ FROM pairs)
            SELECT {_PURL.format(c='u')} AS url,
                   CAST(count(*) AS BIGINT) AS degree
            FROM und GROUP BY u ORDER BY url
        """,
        "copart_top20": f"""
            WITH pairs AS ({_COPART_PAIRS}),
            und AS (SELECT pa_ AS u FROM pairs UNION ALL SELECT pb_ FROM pairs),
            deg AS (SELECT {_PURL.format(c='u')} AS url,
                           CAST(count(*) AS BIGINT) AS degree
                    FROM und GROUP BY u)
            SELECT url, degree FROM deg ORDER BY degree DESC, url LIMIT 20
        """,
        "copart_triangles": f"""
            WITH pairs AS ({_COPART_PAIRS}),
            verts AS (SELECT DISTINCT pa_ AS p FROM pairs
                      UNION SELECT DISTINCT pb_ FROM pairs),
            tri AS (
                SELECT e1.pa_ AS a, e1.pb_ AS b, e2.pb_ AS c
                FROM pairs e1
                JOIN pairs e2 ON e2.pa_ = e1.pb_
                JOIN pairs e3 ON e3.pa_ = e1.pa_ AND e3.pb_ = e2.pb_
            ),
            pv AS (SELECT a AS p FROM tri UNION ALL SELECT b FROM tri
                   UNION ALL SELECT c FROM tri),
            cnt AS (SELECT p, count(*) AS c FROM pv GROUP BY p)
            SELECT {_PURL.format(c='v.p')} AS url,
                   CAST(coalesce(cnt.c, 0) AS BIGINT) AS triangles
            FROM verts v LEFT JOIN cnt ON cnt.p = v.p ORDER BY url
        """,
        "copart_pagerank12": f"""
            WITH RECURSIVE pairs AS ({_COPART_PAIRS}),
            und AS (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            verts AS (SELECT DISTINCT s AS v FROM und),
            vc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
            outdeg AS (SELECT s AS v, CAST(count(*) AS DOUBLE) AS deg
                       FROM und GROUP BY s),
            pr(it, v, r) AS (
                SELECT 0, v, 1.0 / (SELECT n FROM vc) FROM verts
                UNION ALL
                SELECT pr.it + 1, u.d,
                       (1.0 - 0.85) / any_value((SELECT n FROM vc))
                       + 0.85 * sum(pr.r / od.deg)
                FROM pr
                JOIN und u ON u.s = pr.v
                JOIN outdeg od ON od.v = pr.v
                WHERE pr.it < 12
                GROUP BY pr.it, u.d
            )
            SELECT {_PURL.format(c='v')} AS url, round(r, 9) AS rank
            FROM pr WHERE it = 12 ORDER BY url
        """,
        "geo_components": f"""
            {_GEO_COMPONENTS}
            SELECT v AS url,
                   CAST(dense_rank() OVER (ORDER BY ml) - 1 AS BIGINT)
                       AS component_id
            FROM minl ORDER BY url
        """,
        "doc_components_inc": f"""
            WITH RECURSIVE targets AS ({_DOC_TARGETS}),
            e AS MATERIALIZED (
                SELECT DISTINCT doc_id AS s, tgt AS d FROM targets
                WHERE tgt != doc_id AND (doc_id + tgt) % 3 != 0),
            und AS MATERIALIZED (
                SELECT s, d FROM e UNION SELECT d, s FROM e),
            verts AS MATERIALIZED (SELECT DISTINCT s AS v FROM und),
            reach(v, l) AS (
                SELECT v, {_DURL.format(c='v')} FROM verts
                UNION
                SELECT u.d, r.l FROM reach r JOIN und u ON u.s = r.v),
            minl AS MATERIALIZED (SELECT v, min(l) AS ml
                    FROM reach GROUP BY v)
            SELECT {_DURL.format(c='v')} AS url,
                   CAST(dense_rank() OVER (ORDER BY ml) - 1 AS BIGINT)
                       AS component_id
            FROM minl ORDER BY url
        """,
        "geo_labelprop": _lp_unrolled_sql(6),
        "geo_modularity": _geo_modularity_sql(6),
        "geo_quotient": _geo_quotient_sql(6),
        "doc_salsa_hubs": f"""
            WITH RECURSIVE targets AS ({_DOC_TARGETS}),
            e AS MATERIALIZED (SELECT DISTINCT doc_id AS s, tgt AS d
                    FROM targets WHERE tgt != doc_id),
            odeg AS MATERIALIZED (SELECT s AS v,
                    CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY s),
            nh AS (SELECT CAST(count(*) AS BIGINT) AS n FROM odeg),
            cop AS MATERIALIZED (SELECT DISTINCT a.s AS u, b.s AS w
                    FROM e a JOIN e b ON b.d = a.d AND b.s > a.s),
            und AS (SELECT u, w FROM cop UNION SELECT w, u FROM cop),
            reach(v, l) AS (
                SELECT v, v FROM odeg
                UNION
                SELECT u.w, r.l FROM reach r JOIN und u ON u.u = r.v),
            minl AS MATERIALIZED (SELECT v, min(l) AS ml
                    FROM reach GROUP BY v),
            cs AS MATERIALIZED (
                SELECT ml, CAST(count(*) AS BIGINT) AS cnt,
                       CAST(sum(dg) AS BIGINT) AS sd
                FROM minl JOIN odeg ON odeg.v = minl.v GROUP BY ml)
            SELECT {_DURL.format(c='minl.v')} AS url,
                   round(CAST(cs.cnt * odeg.dg AS DOUBLE)
                         / CAST((SELECT n FROM nh) * cs.sd AS DOUBLE), 9)
                       AS score
            FROM minl JOIN odeg ON odeg.v = minl.v
                      JOIN cs ON cs.ml = minl.ml
            ORDER BY url
        """,
        "doc_salsa": f"""
            WITH RECURSIVE targets AS ({_DOC_TARGETS}),
            e AS MATERIALIZED (SELECT DISTINCT doc_id AS s, tgt AS d
                    FROM targets WHERE tgt != doc_id),
            ind AS MATERIALIZED (SELECT d AS v,
                    CAST(count(*) AS BIGINT) AS din FROM e GROUP BY d),
            na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ind),
            cop AS MATERIALIZED (SELECT DISTINCT a.d AS u, b.d AS w
                    FROM e a JOIN e b ON b.s = a.s AND b.d > a.d),
            und AS (SELECT u, w FROM cop UNION SELECT w, u FROM cop),
            reach(v, l) AS (
                SELECT v, v FROM ind
                UNION
                SELECT u.w, r.l FROM reach r JOIN und u ON u.u = r.v),
            minl AS MATERIALIZED (SELECT v, min(l) AS ml
                    FROM reach GROUP BY v),
            cs AS MATERIALIZED (
                SELECT ml, CAST(count(*) AS BIGINT) AS cnt,
                       CAST(sum(din) AS BIGINT) AS sd
                FROM minl JOIN ind ON ind.v = minl.v GROUP BY ml)
            SELECT {_DURL.format(c='minl.v')} AS url,
                   round(CAST(cs.cnt * ind.din AS DOUBLE)
                         / CAST((SELECT n FROM na) * cs.sd AS DOUBLE), 9)
                       AS score
            FROM minl JOIN ind ON ind.v = minl.v
                      JOIN cs ON cs.ml = minl.ml
            ORDER BY url
        """,
        "geo_percolation": _geo_percolation_sql(),
        "doc_hits8": _hits_unrolled_sql(8),
        # strongly connected components: closure oracle — mutual
        # reachability pairs, SCC id = lexicographically smallest url
        # (≡ the engine's min-vid member: vids are url-sorted)
        "doc_scc": f"""
            WITH RECURSIVE targets AS ({_DOC_TARGETS}),
            e AS MATERIALIZED (
                SELECT DISTINCT doc_id AS s, tgt AS d FROM targets
                WHERE tgt != doc_id AND (doc_id + tgt) % 3 != 0
            ),
            verts(v) AS (SELECT s FROM e UNION SELECT d FROM e),
            reach(a, b) AS (
                SELECT v, v FROM verts
                UNION
                SELECT r.a, e.d FROM reach r JOIN e ON e.s = r.b
            ),
            mutual AS (
                SELECT r1.a AS v, r1.b AS w
                FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
            )
            SELECT {_DURL.format(c='v')} AS url,
                   min({_DURL.format(c='w')}) AS scc_url
            FROM mutual GROUP BY v ORDER BY url
        """,
        "doc_bowtie": _bowtie_sql(),
        "doc_scc_cond": _scc_cond_sql(),
        "doc_scc_depth4": _scc_depth_sql(4),
        "doc_walks4": _walks_sql(4),
        "doc_walk_pairs": _walk_pairs_sql(4, 2),
        "doc_source_rank": f"""
            WITH RECURSIVE targets AS ({_DOC_TARGETS}),
            e AS MATERIALIZED (
                SELECT DISTINCT least(doc_id, tgt) AS a,
                                greatest(doc_id, tgt) AS b
                FROM targets WHERE tgt != doc_id),
            und AS MATERIALIZED (
                SELECT a AS s, b AS d FROM e
                UNION ALL SELECT b, a FROM e),
            verts AS (SELECT DISTINCT s AS v FROM und),
            vc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
            outdeg AS (SELECT s AS v, CAST(count(*) AS DOUBLE) AS deg
                       FROM und GROUP BY s),
            pr(it, v, r) AS (
                SELECT 0, v, 1.0 / (SELECT n FROM vc) FROM verts
                UNION ALL
                SELECT pr.it + 1, u.d,
                       (1.0 - 0.85) / any_value((SELECT n FROM vc))
                       + 0.85 * sum(pr.r / od.deg)
                FROM pr
                JOIN und u ON u.s = pr.v
                JOIN outdeg od ON od.v = pr.v
                WHERE pr.it < 12
                GROUP BY pr.it, u.d
            ),
            ranked AS (SELECT v, round(r, 9) AS r FROM pr WHERE it = 12)
            SELECT d.source AS source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   round(sum(ranked.r), 9) AS total_rank
            FROM ranked JOIN documents d ON d.doc_id = ranked.v
            GROUP BY 1 ORDER BY 1
        """,
        "embed_mmr8": _mmr_sql(8),
        "doc_hyperanf3": _hyperanf_sql(3, 8),
        "doc_harmonic3": _harmonic_sql(3, 8),
        "copart_mis3": _mis_sql(3),
        "copart_color3": _coloring_sql(3, 2),
        "copart_match3": _matching_sql(3),
        "events_conv24": """
            SELECT s.event_id AS signup_id,
                   count(p.event_id) AS n_purchases,
                   coalesce(sum(CAST(floor(p.value * 100) AS BIGINT)), 0)
                       AS value_cents
            FROM events s LEFT JOIN events p
              ON p.user_id = s.user_id
             AND p.event_type = 'purchase'
             AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
            WHERE s.event_type = 'signup'
            GROUP BY s.event_id ORDER BY signup_id
        """,
        "copart_msf2": _msf_unrolled_sql(2),
        "doc_bc8": _betweenness_sql(8, 6),
        "doc_eigen8": _eigen_unrolled_sql(8),
        "doc_katz8": _katz_unrolled_sql(8),
        "doc_nf4": _nf_sql(4, 8),
        "doc_effdiam4": _effdiam_sql(4, 8),
        "copart_bfs12": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            seed AS (SELECT min(s) AS v FROM und),
            walk(it, v, dist) AS (
                SELECT 0, v, 0 FROM seed
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM walk w JOIN und u ON u.s = w.v
                WHERE w.it < 12
                GROUP BY w.it, u.d
            )
            SELECT {_PURL.format(c='v')} AS url,
                   CAST(min(dist) AS BIGINT) AS dist
            FROM walk GROUP BY v ORDER BY url
        """,
        "copart_bfs_tree12": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            seed AS (SELECT min(s) AS v FROM und),
            walk(it, v, dist) AS (
                SELECT 0, v, 0 FROM seed
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM walk w JOIN und u ON u.s = w.v
                WHERE w.it < 12
                GROUP BY w.it, u.d
            ),
            dst AS MATERIALIZED (
                SELECT v, CAST(min(dist) AS BIGINT) AS dist
                FROM walk GROUP BY v),
            par AS (
                SELECT dd.v, min(u.s) AS parent
                FROM dst dd JOIN und u ON u.d = dd.v
                JOIN dst dp ON dp.v = u.s AND dp.dist = dd.dist - 1
                WHERE dd.dist > 0 GROUP BY dd.v)
            SELECT {_PURL.format(c='dst.v')} AS url, dst.dist,
                   {_PURL.format(c='coalesce(par.parent, dst.v)')}
                       AS parent_url
            FROM dst LEFT JOIN par ON par.v = dst.v ORDER BY url
        """,
        "copart_bipartite12": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            seed AS (SELECT min(s) AS v FROM und),
            walk(it, v, dist) AS (
                SELECT 0, v, 0 FROM seed
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM walk w JOIN und u ON u.s = w.v
                WHERE w.it < 12
                GROUP BY w.it, u.d
            ),
            dst AS MATERIALIZED (
                SELECT v, min(dist) % 2 AS p FROM walk GROUP BY v)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM dst) AS n_reached,
                   (SELECT CAST(count(*) AS BIGINT) FROM dst WHERE p = 0)
                       AS n_even,
                   (SELECT CAST(count(*) AS BIGINT) FROM dst WHERE p = 1)
                       AS n_odd,
                   CAST(coalesce(sum(CASE WHEN a.p = b.p THEN 1 ELSE 0 END),
                                 0) AS BIGINT) AS n_same_parity_edges,
                   CAST(coalesce(sum(CASE WHEN a.p != b.p THEN 1 ELSE 0 END),
                                 0) AS BIGINT) AS n_cross_parity_edges
            FROM pairs JOIN dst a ON a.v = pairs.pa_
                       JOIN dst b ON b.v = pairs.pb_
        """,
        "copart_sssp16": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_COPART_PAIRS}),
            wund AS MATERIALIZED (
                SELECT pa_ AS s, pb_ AS d,
                       CAST(1 + (pa_ + pb_) % 7 AS BIGINT) AS wt FROM pairs
                UNION ALL
                SELECT pb_, pa_, CAST(1 + (pa_ + pb_) % 7 AS BIGINT)
                FROM pairs),
            seed AS (SELECT min(s) AS v FROM wund),
            walk(it, v, dist) AS (
                SELECT 0, v, CAST(0 AS BIGINT) FROM seed
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist + u.wt)
                FROM walk w JOIN wund u ON u.s = w.v
                WHERE w.it < 16
                GROUP BY w.it, u.d
            )
            SELECT {_PURL.format(c='v')} AS url,
                   CAST(min(dist) AS BIGINT) AS dist
            FROM walk GROUP BY v ORDER BY url
        """,
        "copart_kcore3": _kcore_unrolled_sql(3, 8),
        "copart_densest4": _densest_sql(4),
        "copart_densest1_members": _densest_members_sql(1),
        "geo_attack": _geo_attack_sql(),
        "copart_shells6": _kshells_sql(6, 8),
        "copart_lpa4": _lpa_unrolled_sql(4),
        "copart_wl2": _wl_sql(2),
        "copart_backbone": _backbone_sql(2, 8),
        "copart_jdm": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            deg AS MATERIALIZED (SELECT s AS v,
                    CAST(count(*) AS BIGINT) AS dg FROM und GROUP BY s)
            SELECT least(ca, cb) AS deg_a, greatest(ca, cb) AS deg_b,
                   CAST(count(*) AS BIGINT) AS n_edges
            FROM (
                SELECT least(ds.dg, 256) AS ca, least(dd.dg, 256) AS cb
                FROM pairs
                JOIN deg ds ON ds.v = pairs.pa_
                JOIN deg dd ON dd.v = pairs.pb_
            ) GROUP BY 1, 2 ORDER BY deg_a, deg_b
        """,
        "copart_truss4": _ktruss_unrolled_sql(4, 3),
        "copart_adamic": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            deg AS MATERIALIZED (SELECT s AS v,
                    CAST(count(*) AS DOUBLE) AS dg FROM und GROUP BY s),
            wedge AS (
                SELECT e1.s AS w, e1.d AS a, e2.d AS b
                FROM und e1 JOIN und e2
                  ON e1.s = e2.s AND e1.d < e2.d
            )
            SELECT {purl_wa} AS url_a, {purl_wb} AS url_b,
                   CAST(count(*) AS BIGINT) AS cn,
                   round(sum(1.0 / ln(deg.dg)), 9) AS aa
            FROM wedge JOIN deg ON deg.v = wedge.w
            GROUP BY a, b HAVING count(*) >= 2
            ORDER BY url_a, url_b
        """,
        "copart_clustering": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            verts AS (SELECT DISTINCT pa_ AS p FROM pairs
                      UNION SELECT DISTINCT pb_ FROM pairs),
            tri AS (
                SELECT e1.pa_ AS a, e1.pb_ AS b, e2.pb_ AS c
                FROM pairs e1
                JOIN pairs e2 ON e2.pa_ = e1.pb_
                JOIN pairs e3 ON e3.pa_ = e1.pa_ AND e3.pb_ = e2.pb_
            ),
            pv AS (SELECT a AS p FROM tri UNION ALL SELECT b FROM tri
                   UNION ALL SELECT c FROM tri),
            cnt AS (SELECT p, count(*) AS c FROM pv GROUP BY p),
            undd AS (SELECT pa_ AS u FROM pairs UNION ALL SELECT pb_ FROM pairs),
            deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS dg
                    FROM undd GROUP BY u)
            SELECT {_PURL.format(c='v.p')} AS url,
                   round(CASE WHEN d.dg >= 2
                         THEN 2.0 * CAST(coalesce(cnt.c, 0) AS DOUBLE)
                              / (d.dg * (d.dg - 1.0))
                         ELSE 0.0 END, 9) AS lcc
            FROM verts v JOIN deg d ON d.u = v.p
            LEFT JOIN cnt ON cnt.p = v.p ORDER BY url
        """,
        "copart_ppr12": _ppr_unrolled_sql(12, 5),
        "copart_ball2": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            ball AS (
                SELECT s AS v, s AS w FROM und
                UNION ALL SELECT s, d FROM und
                UNION ALL SELECT e1.d, e2.d
                FROM und e1 JOIN und e2 ON e1.s = e2.s
            )
            SELECT {_PURL.format(c='v')} AS url,
                   CAST(count(DISTINCT w) AS BIGINT) AS ball2
            FROM ball GROUP BY v ORDER BY url
        """,
        "copart_ball2_hll": _ball2_hll_sql(10),
        "copart_stats": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            deg AS MATERIALIZED (SELECT s AS v,
                    CAST(count(*) AS BIGINT) AS dg FROM und GROUP BY s),
            tri AS (
                SELECT e1.pa_ AS a, e1.pb_ AS b, e2.pb_ AS c
                FROM pairs e1
                JOIN pairs e2 ON e2.pa_ = e1.pb_
                JOIN pairs e3 ON e3.pa_ = e1.pa_ AND e3.pb_ = e2.pb_
            ),
            tcnt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tri),
            wcnt AS (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT) AS w
                     FROM deg),
            stats AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(sum(da.dg) AS DOUBLE) AS sx,
                       CAST(sum(db.dg) AS DOUBLE) AS sy,
                       CAST(sum(da.dg * da.dg) AS DOUBLE) AS sxx,
                       CAST(sum(db.dg * db.dg) AS DOUBLE) AS syy,
                       CAST(sum(da.dg * db.dg) AS DOUBLE) AS sxy
                FROM und
                JOIN deg da ON da.v = und.s
                JOIN deg db ON db.v = und.d
            )
            SELECT (SELECT count(*) FROM deg) AS n_vertices,
                   (SELECT count(*) FROM pairs) AS n_edges,
                   tcnt.t AS n_triangles,
                   round((3.0 * tcnt.t) / wcnt.w, 9) AS transitivity,
                   round((n * sxy - sx * sy)
                         / (sqrt(n * sxx - sx * sx)
                            * sqrt(n * syy - sy * sy)), 9)
                       AS assortativity
            FROM tcnt, wcnt, stats
        """,
        "copart_wpagerank8": f"""
            WITH RECURSIVE pairs AS ({_COPART_PAIRS}),
            wund AS MATERIALIZED (
                SELECT pa_ AS s, pb_ AS d,
                       CAST(1 + (pa_ + pb_) % 7 AS DOUBLE) AS wt FROM pairs
                UNION ALL
                SELECT pb_, pa_, CAST(1 + (pa_ + pb_) % 7 AS DOUBLE)
                FROM pairs),
            verts AS (SELECT DISTINCT s AS v FROM wund),
            vc AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
            strength AS (SELECT s AS v, CAST(sum(wt) AS DOUBLE) AS st
                         FROM wund GROUP BY s),
            pr(it, v, r) AS (
                SELECT 0, v, 1.0 / (SELECT n FROM vc) FROM verts
                UNION ALL
                SELECT pr.it + 1, u.d,
                       (1.0 - 0.85) / any_value((SELECT n FROM vc))
                       + 0.85 * sum(pr.r / st.st * u.wt)
                FROM pr
                JOIN wund u ON u.s = pr.v
                JOIN strength st ON st.v = pr.v
                WHERE pr.it < 8
                GROUP BY pr.it, u.d
            )
            SELECT {_PURL.format(c='v')} AS url, round(r, 9) AS rank
            FROM pr WHERE it = 8 ORDER BY url
        """,
        "copart_edge_jaccard": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            deg AS (SELECT s AS v, count(*) AS dg FROM und GROUP BY s),
            cn AS (SELECT e1.d AS a, e2.d AS b, count(*) AS c
                   FROM und e1 JOIN und e2
                     ON e1.s = e2.s AND e1.d < e2.d
                   GROUP BY a, b)
            SELECT {_PURL.format(c='p.pa_')} AS url_a,
                   {_PURL.format(c='p.pb_')} AS url_b,
                   CAST(coalesce(cn.c, 0) AS BIGINT) AS cn,
                   round(CASE WHEN da.dg + db.dg - coalesce(cn.c, 0) > 0
                         THEN CAST(coalesce(cn.c, 0) AS DOUBLE)
                              / (da.dg + db.dg - coalesce(cn.c, 0))
                         ELSE 0.0 END, 9) AS jac
            FROM pairs p
            JOIN deg da ON da.v = p.pa_
            JOIN deg db ON db.v = p.pb_
            LEFT JOIN cn ON cn.a = p.pa_ AND cn.b = p.pb_
            ORDER BY url_a, url_b
        """,
        "doc_bridges": f"""
            WITH targets AS ({_DOC_TARGETS}),
            fil AS (SELECT DISTINCT doc_id AS s, tgt AS d FROM targets
                    WHERE tgt != doc_id),
            und AS MATERIALIZED (SELECT s, d FROM fil
                    UNION SELECT d AS s, s AS d FROM fil),
            edges AS (SELECT s AS a, d AS b FROM und WHERE s < d),
            cn AS (SELECT e1.d AS a, e2.d AS b
                   FROM und e1 JOIN und e2
                     ON e1.s = e2.s AND e1.d < e2.d
                   GROUP BY a, b)
            SELECT least({_DURL.format(c='e.a')}, {_DURL.format(c='e.b')})
                       AS url_a,
                   greatest({_DURL.format(c='e.a')}, {_DURL.format(c='e.b')})
                       AS url_b
            FROM edges e
            LEFT JOIN cn ON cn.a = e.a AND cn.b = e.b
            WHERE cn.a IS NULL
            ORDER BY url_a, url_b
        """,
        "copart_nbr_top3": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            wund AS (SELECT pa_ AS s, pb_ AS d,
                            CAST(1 + (pa_ + pb_) % 7 AS BIGINT) AS wt
                     FROM pairs
                     UNION ALL
                     SELECT pb_, pa_, CAST(1 + (pa_ + pb_) % 7 AS BIGINT)
                     FROM pairs),
            ranked AS (SELECT s, d, wt,
                              row_number() OVER (
                                  PARTITION BY s ORDER BY wt DESC, d ASC
                              ) AS rk
                       FROM wund)
            SELECT {_PURL.format(c='s')} AS url,
                   {_PURL.format(c='d')} AS nbr,
                   wt AS w, CAST(rk AS BIGINT) AS rnk
            FROM ranked WHERE rk <= 3 ORDER BY url, rnk
        """,
        "cust_no_orders": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND year(o.o_orderdate) = 1995
            )
            ORDER BY c_custkey
        """,
        "prefix_pairs": rf"""
    WITH toks AS (
      SELECT doc_id, {_STRIP} AS s,
             regexp_split_to_array({_STRIP}, '\s+') AS tk
      FROM documents
    ),
    shingle_strs AS (
      SELECT doc_id,
        CASE WHEN s = '' THEN CAST([] AS VARCHAR[])
             WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
             ELSE list_transform(range(1, len(tk) - 1),
                                 i -> array_to_string(tk[i:i+2], ' '))
        END AS sgl
      FROM toks
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             CAST('0x' || substring(md5(g), 1, 16) AS UBIGINT) AS h
      FROM (SELECT doc_id, unnest(sgl) AS g FROM shingle_strs)
    ),
    sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(CAST(i AS DOUBLE) / (sa.c + sb.c - i), 9) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (sa.c + sb.c - i) >= 0.5
    ORDER BY id_a, id_b
""",
        "containment_pairs": rf"""
    WITH toks AS (
      SELECT doc_id, {_STRIP} AS s,
             regexp_split_to_array({_STRIP}, '\s+') AS tk
      FROM documents
    ),
    shingle_strs AS (
      SELECT doc_id,
        CASE WHEN s = '' THEN CAST([] AS VARCHAR[])
             WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
             ELSE list_transform(range(1, len(tk) - 1),
                                 i -> array_to_string(tk[i:i+2], ' '))
        END AS sgl
      FROM toks
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             CAST('0x' || substring(md5(g), 1, 16) AS UBIGINT) AS h
      FROM (SELECT doc_id, unnest(sgl) AS g FROM shingle_strs)
    ),
    sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id != b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(CAST(i AS DOUBLE) / sa.c, 9) AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
    WHERE CAST(i AS DOUBLE) / sa.c >= 0.8
    ORDER BY id_a, id_b
""",
        "lev_pairs": """
            WITH d AS (
                SELECT doc_id, source,
                       substr(coalesce(text, ''), 1, 64) AS t,
                       length(substr(coalesce(text, ''), 1, 64)) AS l
                FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(levenshtein(a.t, b.t) AS BIGINT) AS lev
            FROM d a JOIN d b
              ON a.source = b.source AND a.doc_id < b.doc_id
            WHERE abs(a.l - b.l) <= 24
              AND levenshtein(a.t, b.t) <= 40
            ORDER BY id_a, id_b
        """,
        "events_trailing1h": """
            SELECT event_id, user_id, ts,
                   CAST(count(*) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW
                   ) AS BIGINT) AS n_trailing
            FROM events
            ORDER BY event_id
        """,
        "events_type_users": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "doc_reciprocity": f"""
            WITH targets AS ({_DOC_TARGETS}),
            fil AS (SELECT DISTINCT doc_id, tgt FROM targets
                    WHERE tgt != doc_id),
            rec AS (SELECT count(*) AS nr FROM fil a
                    JOIN fil b ON a.doc_id = b.tgt AND a.tgt = b.doc_id),
            tot AS (SELECT count(*) AS n FROM fil)
            SELECT CAST(tot.n AS BIGINT) AS n_edges,
                   CAST(rec.nr AS BIGINT) AS n_reciprocal,
                   round(CAST(rec.nr AS DOUBLE) / tot.n, 9) AS reciprocity
            FROM tot, rec
        """,
        "events_windows": """
            SELECT event_id, user_id, ts,
                   CAST(row_number() OVER w AS BIGINT) AS seq,
                   CAST(date_diff('microsecond', lag(ts) OVER w, ts)
                        AS BIGINT) AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, seq
        """,
        "geo_component_sizes": f"""
            {_GEO_COMPONENTS},
            comp AS (SELECT v, CAST(dense_rank() OVER (ORDER BY ml) - 1 AS BIGINT)
                            AS component_id FROM minl)
            SELECT component_id, CAST(count(*) AS BIGINT) AS size
            FROM comp GROUP BY component_id ORDER BY component_id
        """,
        "doc_token_stats": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                        END AS BIGINT) AS n_tokens,
                   round(CASE WHEN trim(text) = '' THEN 0.0
                         ELSE CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                              / len(regexp_split_to_array(trim(text), '\\s+'))
                         END, 6) AS avg_token_len,
                   round(CAST(length(text)
                              - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                          AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio
            FROM documents ORDER BY doc_id
        """,
        "doc_bpe_tokens": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                        ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "doc_langid": _LANGID_PRED + " ORDER BY doc_id",
        "source_scorecard": "WITH pred AS (" + _LANGID_PRED + """),
            fp AS (SELECT doc_id, md5(coalesce(text, '')) AS h
                   FROM documents),
            cnt AS (SELECT h, count(*) AS c FROM fp GROUP BY h)
            SELECT d.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN trim(coalesce(d.text, '')) = ''
                        THEN 0 ELSE len(regexp_split_to_array(
                            trim(d.text), '\\s+')) END) AS BIGINT)
                       AS n_tokens,
                   CAST(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_docs,
                   CAST(sum(CASE WHEN d.lang != p.lang_pred
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_mismatch
            FROM documents d
            JOIN pred p ON p.doc_id = d.doc_id
            JOIN fp ON fp.doc_id = d.doc_id
            JOIN cnt ON cnt.h = fp.h
            GROUP BY d.source ORDER BY d.source
        """,
        "doc_lang_confusion": "WITH pred AS (" + _LANGID_PRED + """)
            SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents d JOIN pred p ON p.doc_id = d.doc_id
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents ORDER BY doc_id
        """,
        "dedup_exact": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY md5(text) ORDER BY doc_id
        """,
        "embed_knn": """
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 10),
            sims AS (
                SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS s
                FROM q, embeddings e WHERE e.vec_id != q.qid
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
                FROM sims
            )
            SELECT query_id, neighbor_id, round(s, 9) AS cos_sim
            FROM ranked WHERE rn <= 5 ORDER BY query_id, neighbor_id
        """,
        "embed_knn_graph": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
                       FROM embeddings),
            sims AS (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       list_cosine_similarity(a.ee, b.ee) AS s
                FROM e a, e b WHERE a.vec_id != b.vec_id
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
                FROM sims
            )
            SELECT query_id, neighbor_id, round(s, 9) AS cos_sim
            FROM ranked WHERE rn <= 3 ORDER BY query_id, neighbor_id
        """,
        "embed_knn_cc": _knn_cc_sql(rounds=8, k=3),
        "embed_outlier3": """
            -- CAST to DOUBLE[] like every other cosine oracle:
            -- list_cosine_similarity on raw FLOAT lists computes in
            -- f32 (~1e-7 error), which survives 9dp rounding and
            -- hash-mismatches the engine's f64 kernel
            WITH sub AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                         FROM embeddings),
            p AS (
                SELECT a.vec_id AS q,
                       list_cosine_similarity(a.e, b.e) AS s
                FROM sub a, sub b WHERE a.vec_id <> b.vec_id
            ),
            r AS (
                SELECT q, s,
                       row_number() OVER (PARTITION BY q ORDER BY s DESC)
                           AS rnk
                FROM p
            )
            SELECT q AS vec_id, round(s, 9) AS knn3_sim
            FROM r WHERE rnk = 3 ORDER BY vec_id
        """,
        "embed_cov": """
            WITH ex AS (
              SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS v
              FROM embeddings
              CROSS JOIN (SELECT unnest(range(0, 64)) AS i))
            SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
                   round(sum(a.v * b.v) / count(*), 6) AS m
            FROM ex a JOIN ex b ON b.vec_id = a.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i ORDER BY i, j
        """,
        "embed_pca8": _pca_sql(rounds=8),
        "copart_squares": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS m, pb_ AS x FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            codeg AS (SELECT a.x AS u, b.x AS w,
                             CAST(count(*) AS BIGINT) AS c
                      FROM und a JOIN und b ON b.m = a.m AND a.x < b.x
                      GROUP BY a.x, b.x),
            red AS (SELECT CAST(count(*) AS BIGINT) AS np_,
                           CAST(coalesce(sum((c * (c - 1)) // 2), 0)
                                AS BIGINT) AS wp
                    FROM codeg)
            SELECT np_ AS n_codeg_pairs, wp AS n_wedge_pairs,
                   wp // 2 AS n_squares
            FROM red
        """,
        "copart_avg_nbr_deg": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS a, pb_ AS b FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            deg AS MATERIALIZED (SELECT a AS v,
                    CAST(count(*) AS BIGINT) AS dg FROM und GROUP BY a)
            SELECT da.dg AS degree,
                   round(CAST(sum(db.dg) AS DOUBLE) / count(*), 9)
                       AS avg_nbr_deg
            FROM und JOIN deg da ON da.v = und.a
                     JOIN deg db ON db.v = und.b
            GROUP BY da.dg ORDER BY degree
        """,
        "doc_degree_corr": f"""
            WITH targets AS ({_DOC_TARGETS}),
            e AS MATERIALIZED (SELECT DISTINCT doc_id AS s, tgt AS d
                    FROM targets WHERE tgt != doc_id),
            verts(v) AS (SELECT s FROM e UNION SELECT d FROM e),
            din AS (SELECT d AS v, CAST(count(*) AS BIGINT) AS din
                    FROM e GROUP BY d),
            dout AS (SELECT s AS v, CAST(count(*) AS BIGINT) AS dout
                     FROM e GROUP BY s),
            dd AS (SELECT verts.v, coalesce(din.din, 0) AS x,
                          coalesce(dout.dout, 0) AS y
                   FROM verts LEFT JOIN din ON din.v = verts.v
                              LEFT JOIN dout ON dout.v = verts.v),
            st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(x) AS BIGINT) AS sx,
                          CAST(sum(y) AS BIGINT) AS sy,
                          CAST(sum(x * x) AS BIGINT) AS sxx,
                          CAST(sum(y * y) AS BIGINT) AS syy,
                          CAST(sum(x * y) AS BIGINT) AS sxy
                   FROM dd)
            SELECT n AS n_vertices,
                   round((CAST(n AS DOUBLE) * sxy
                          - CAST(sx AS DOUBLE) * sy)
                         / (sqrt(CAST(n AS DOUBLE) * sxx
                                 - CAST(sx AS DOUBLE) * sx)
                            * sqrt(CAST(n AS DOUBLE) * syy
                                   - CAST(sy AS DOUBLE) * sy)), 9)
                       AS corr
            FROM st
        """,
        "events_pivot": """
            SELECT user_id,
                   CAST(count(*) FILTER (WHERE event_type = 'click')
                        AS BIGINT) AS n_click,
                   CAST(count(*) FILTER (WHERE event_type = 'error')
                        AS BIGINT) AS n_error,
                   CAST(count(*) FILTER (WHERE event_type = 'purchase')
                        AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (WHERE event_type = 'signup')
                        AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (WHERE event_type = 'view')
                        AS BIGINT) AS n_view,
                   CAST(count(*) AS BIGINT) AS n_total
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "embed_dup_pairs": """
            WITH sub AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                         FROM embeddings WHERE vec_id < 1000)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.e, b.e), 9) AS cos_sim
            FROM sub a, sub b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.e, b.e) >= 0.35
            ORDER BY id_a, id_b
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q5_revenue": """
            SELECT n.n_name AS n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
                           AND s.s_nationkey = c.c_nationkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1995-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n.n_name
            ORDER BY n_name
        """,
        "q4_late": r"""
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "events_json_k": r"""
            WITH ex AS (
              SELECT event_type,
                     CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
                          AS BIGINT) AS k
              FROM events
              WHERE regexp_extract(props, '"k":\s*(-?\d+)', 1) != '')
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(min(k) AS BIGINT) AS min_k,
                   CAST(max(k) AS BIGINT) AS max_k,
                   CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
            FROM ex GROUP BY event_type ORDER BY event_type
        """,
        "doc_surprisal": r"""
            WITH tk AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)),
                                                  '\s+')) AS term
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            uni AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
            tot AS (SELECT count(*) AS n FROM tk)
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(length(bin(tot.n)) - length(bin(u.cnt)))
                        AS BIGINT) AS total_bits
            FROM tk t JOIN uni u ON u.term = t.term CROSS JOIN tot
            GROUP BY t.doc_id ORDER BY t.doc_id
        """,
        "doc_split_manifest": r"""
            WITH sp AS (
              SELECT source,
                     CAST('0x' || substring(
                         md5('split:' || CAST(doc_id AS VARCHAR)),
                         1, 16) AS UBIGINT) % 10 AS h,
                     CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\s+')) END
                         AS ntok
              FROM documents)
            SELECT source,
                   CASE WHEN h < 8 THEN 'train'
                        WHEN h = 8 THEN 'val' ELSE 'test' END AS split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(ntok) AS BIGINT) AS n_tokens
            FROM sp GROUP BY 1, 2 ORDER BY source, split
        """,
        "events_burst": r"""
            WITH pm AS (
              SELECT user_id,
                     CAST(epoch_us(ts) // 60000000 AS BIGINT) AS minute,
                     count(*) AS c
              FROM events GROUP BY 1, 2)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_minutes,
                   CAST(max(c) AS BIGINT) AS max_per_min
            FROM pm GROUP BY user_id ORDER BY user_id
        """,
        "orders_stats": r"""
            SELECT * FROM (SELECT 'o_orderkey' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct, CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM orders
            UNION ALL SELECT 'o_custkey' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct, CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM orders
            UNION ALL SELECT 'o_orderstatus' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct, CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM orders
            UNION ALL SELECT 'o_totalprice' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct, CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM orders
            UNION ALL SELECT 'o_orderdate' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT o_orderdate) AS BIGINT) AS n_distinct, CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM orders
            UNION ALL SELECT 'o_orderpriority' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct, CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null FROM orders)
            ORDER BY column_name
        """,
        "q7_volume": r"""
            SELECT ns.n_name AS supp_nation,
                   nc.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT)
                       AS l_year,
                   sum(CAST(floor((l.l_extendedprice
                       * (1 - l.l_discount)) * 100.0 + 0.5) AS BIGINT))
                       / 100.0 AS revenue
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation ns ON ns.n_nationkey = s.s_nationkey
            JOIN nation nc ON nc.n_nationkey = c.c_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'
              AND s.s_nationkey != c.c_nationkey
            GROUP BY 1, 2, 3
            ORDER BY supp_nation, cust_nation, l_year
        """,
        "q10_returned": r"""
            WITH pc AS (
              SELECT o.o_custkey,
                     sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
              FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1995-07-01'
                AND o.o_orderdate < TIMESTAMP '1996-07-01'
              GROUP BY o.o_custkey
              ORDER BY rev DESC, o.o_custkey LIMIT 20)
            SELECT c.c_custkey, c.c_name, n.n_name,
                   round(pc.rev, 2) AS revenue
            FROM pc
            JOIN customer c ON c.c_custkey = pc.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            ORDER BY revenue DESC, c_custkey
        """,
        "q14_promo": r"""
            SELECT round(
                100.0 * coalesce(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN l.l_extendedprice * (1 - l.l_discount)
                    ELSE 0 END), 0)
                / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
                AS promo_revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
              AND l.l_shipdate < TIMESTAMP '1996-09-01'
        """,
        "q17_small_qty": r"""
            WITH bl AS (
              SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
              FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_brand = 'Brand#1'),
            st AS (
              SELECT l_partkey, sum(l_quantity) AS sum_qty,
                     count(*) AS n_qty
              FROM bl GROUP BY l_partkey)
            SELECT round(coalesce(sum(bl.l_extendedprice), 0) / 7.0, 2)
                AS avg_yearly
            FROM bl JOIN st ON st.l_partkey = bl.l_partkey
            WHERE 5.0 * bl.l_quantity * st.n_qty < st.sum_qty
        """,
        "q19_disjunct": r"""
            SELECT round(coalesce(
                sum(l.l_extendedprice * (1 - l.l_discount)), 0), 2)
                AS revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 1 AND 21)
               OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
                   AND l.l_quantity BETWEEN 10 AND 30)
               OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
                   AND l.l_quantity BETWEEN 20 AND 40)
        """,
        "q15_top_supplier": r"""
            WITH rev AS (
              SELECT l_suppkey,
                     sum(CAST(floor((l_extendedprice * (1 - l_discount))
                         * 100.0 + 0.5) AS BIGINT)) AS cents
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY 1
            )
            SELECT s.s_suppkey, s.s_name,
                   r.cents / 100.0 AS total_revenue
            FROM rev r
            JOIN supplier s ON s.s_suppkey = r.l_suppkey
            WHERE r.cents = (SELECT max(cents) FROM rev)
            ORDER BY s_suppkey
        """,
        "q12_priority": r"""
            SELECT l.l_linestatus,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                       AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                       ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                       AS BIGINT) AS low_line_count
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            GROUP BY 1
            ORDER BY 1
        """,
        "q22_idle": r"""
            WITH pop AS (
              SELECT c_custkey,
                     c_nationkey % 10 AS cntrycode,
                     CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
                         AS cents
              FROM customer
              WHERE (c_nationkey % 10) IN (1, 3, 5, 7, 9)
            ),
            avgp AS (
              SELECT sum(cents) AS tot, count(*) AS n
              FROM pop WHERE cents > 0
            )
            SELECT p.cntrycode,
                   CAST(count(*) AS BIGINT) AS numcust,
                   sum(p.cents) / 100.0 AS totacctbal
            FROM pop p, avgp a
            WHERE p.cents * a.n > a.tot
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = p.c_custkey
                                AND o.o_orderdate >=
                                    TIMESTAMP '2000-01-01')
            GROUP BY 1
            ORDER BY 1
        """,
        "q21_holdup": r"""
            WITH os AS (
              SELECT l_orderkey AS o, l_suppkey AS s,
                     max(l_shipdate) AS smax
              FROM lineitem GROUP BY 1, 2
            ),
            ost AS (
              SELECT o, s, smax,
                     max(smax) OVER (PARTITION BY o) AS omax,
                     count(*) OVER (PARTITION BY o) AS n_supp
              FROM os
            ),
            blamed AS (
              SELECT o, max(s) AS s
              FROM ost
              WHERE smax = omax AND n_supp >= 2
              GROUP BY o
              HAVING count(*) = 1
            )
            SELECT sp.s_suppkey, sp.s_name,
                   CAST(count(*) AS BIGINT) AS numwait
            FROM blamed b
            JOIN supplier sp ON sp.s_suppkey = b.s
            GROUP BY 1, 2
            ORDER BY numwait DESC, s_suppkey
        """,
        "embed_hard_negatives": r"""
            WITH e AS (SELECT vec_id, label,
                              CAST(embedding AS DOUBLE[]) AS ee
                       FROM embeddings),
            s AS (SELECT a.vec_id AS q, b.vec_id AS c,
                         a.label = b.label AS same,
                         list_cosine_similarity(a.ee, b.ee) AS s
                  FROM e a JOIN e b ON a.vec_id != b.vec_id),
            pos AS (SELECT q, c, s, row_number() OVER (
                        PARTITION BY q ORDER BY s ASC, c) AS rn
                    FROM s WHERE same),
            neg AS (SELECT q, c, s, row_number() OVER (
                        PARTITION BY q ORDER BY s DESC, c) AS rn
                    FROM s WHERE NOT same)
            SELECT p.q AS vec_id, p.c AS pos_id,
                   round(p.s, 9) AS pos_sim,
                   n.c AS neg_id, round(n.s, 9) AS neg_sim
            FROM pos p JOIN neg n ON n.q = p.q AND n.rn = 1
            WHERE p.rn = 1
            ORDER BY vec_id
        """,
        "doc_pii": r"""
            WITH aug AS (
              SELECT doc_id, text
                || CASE WHEN doc_id % 3 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@mail.example.com now'
                        ELSE '' END
                || CASE WHEN doc_id % 5 = 0
                        THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                             || '.0.1 end'
                        ELSE '' END AS s
              FROM documents),
            scan AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(
                         s, '[a-z0-9._]+@[a-z0-9.-]+')) AS BIGINT)
                         AS n_emails,
                     regexp_replace(s, '[a-z0-9._]+@[a-z0-9.-]+',
                                    '<EMAIL>', 'g') AS s1
              FROM aug),
            scan2 AS (
              SELECT doc_id, n_emails,
                     CAST(len(regexp_extract_all(
                         s1,
                         '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT)
                         AS n_ipv4,
                     CAST(length(regexp_replace(
                         s1, '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+',
                         '<IP>', 'g')) AS BIGINT) AS clean_len
              FROM scan)
            SELECT doc_id, n_emails, n_ipv4, clean_len
            FROM scan2 WHERE n_emails + n_ipv4 > 0
            ORDER BY doc_id
        """,
        "doc_rrf": r"""
            WITH s AS (
              SELECT doc_id, n_chars,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens
              FROM documents),
            rk AS (
              SELECT doc_id,
                     row_number() OVER (
                         ORDER BY n_chars DESC, doc_id) AS r1,
                     row_number() OVER (
                         ORDER BY n_tokens DESC, doc_id) AS r2
              FROM s)
            SELECT doc_id, CAST(r1 AS BIGINT) AS r1,
                   CAST(r2 AS BIGINT) AS r2,
                   round(1.0 / (60 + r1) + 1.0 / (60 + r2), 9) AS rrf
            FROM rk
            ORDER BY rrf DESC, doc_id LIMIT 50
        """,
        "events_assoc": r"""
            WITH ut AS (
              SELECT DISTINCT user_id, event_type FROM events),
            n AS (SELECT count(DISTINCT user_id) AS nu FROM ut),
            tc AS (SELECT event_type, count(*) AS c
                   FROM ut GROUP BY 1),
            p AS (SELECT a.event_type AS ta, b.event_type AS tb,
                         count(*) AS nb
                  FROM ut a JOIN ut b ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
                  GROUP BY 1, 2)
            SELECT p.ta AS type_a, p.tb AS type_b,
                   CAST(p.nb AS BIGINT) AS n_both,
                   CAST(ca.c AS BIGINT) AS n_a,
                   CAST(cb.c AS BIGINT) AS n_b,
                   round(p.nb * n.nu * 1.0 / (ca.c * cb.c), 9) AS lift
            FROM p, n
            JOIN tc ca ON ca.event_type = p.ta
            JOIN tc cb ON cb.event_type = p.tb
            ORDER BY type_a, type_b
        """,
        "q8_share": r"""
            WITH base AS (
              SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                         AS o_year,
                     CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                         * 100.0 + 0.5) AS BIGINT) AS rev,
                     ns.n_name AS supp_nation
              FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey
              JOIN customer c ON c.c_custkey = o.o_custkey
              JOIN nation nc ON nc.n_nationkey = c.c_nationkey
              JOIN region r ON r.r_regionkey = nc.n_regionkey
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN nation ns ON ns.n_nationkey = s.s_nationkey
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
                AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                AND o.o_orderdate < TIMESTAMP '1997-01-01')
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_3'
                                  THEN rev ELSE 0 END) * 1.0
                         / sum(rev), 6) AS mkt_share
            FROM base GROUP BY o_year ORDER BY o_year
        """,
        "q9_profit": r"""
            SELECT n.n_name AS nation,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                       AS o_year,
                   sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                           * 100.0 + 0.5) AS BIGINT)
                       - CAST(floor(p.p_retailprice * 50.0 + 0.5)
                              AS BIGINT)
                         * CAST(l.l_quantity AS BIGINT)) / 100.0
                       AS profit
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE p.p_name LIKE '%widget%'
            GROUP BY 1, 2 ORDER BY nation, o_year DESC
        """,
        "q2_mincost": r"""
            WITH supply AS (
              SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                     min(CAST(floor(l_extendedprice * 100.0 + 0.5)
                              AS BIGINT)) AS cost
              FROM lineitem GROUP BY 1, 2),
            eu AS (
              SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
              FROM supplier s
              JOIN nation n ON n.n_nationkey = s.s_nationkey
              JOIN region r ON r.r_regionkey = n.n_regionkey
              WHERE r.r_name = 'EUROPE'),
            cand AS (
              SELECT p.p_partkey, p.p_name, sp.suppkey, sp.cost
              FROM part p JOIN supply sp ON sp.partkey = p.p_partkey
              JOIN eu ON eu.s_suppkey = sp.suppkey
              WHERE p.p_size <= 25 AND p.p_type = 'STANDARD'),
            mn AS (SELECT p_partkey, min(cost) AS mincost
                   FROM cand GROUP BY 1)
            SELECT eu.s_acctbal, eu.s_name, eu.n_name, c.p_partkey,
                   c.p_name, c.cost / 100.0 AS supplycost
            FROM cand c
            JOIN mn ON mn.p_partkey = c.p_partkey
                   AND mn.mincost = c.cost
            JOIN eu ON eu.s_suppkey = c.suppkey
            ORDER BY s_acctbal DESC, n_name, s_name, c.p_partkey
        """,
        "q11_value": r"""
            WITH pv AS (
              SELECT l.l_partkey,
                     sum(CAST(floor(l.l_extendedprice
                         * (1 - l.l_discount) * 100.0 + 0.5)
                         AS BIGINT)) AS val
              FROM lineitem l
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN nation n ON n.n_nationkey = s.s_nationkey
              WHERE n.n_regionkey = 3
              GROUP BY 1),
            tot AS (SELECT sum(val) AS t, count(*) AS np FROM pv)
            SELECT pv.l_partkey, pv.val / 100.0 AS value
            -- HUGEINT product: exact at any sf (the engine compares
            -- against the arbitrary-precision threshold (3t)//(2np))
            FROM pv, tot
            WHERE CAST(pv.val AS HUGEINT) * tot.np * 2
                  > CAST(3 AS HUGEINT) * tot.t
            ORDER BY value DESC, pv.l_partkey
        """,
        "q16_suppcnt": r"""
            WITH supply AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            ok AS (SELECT s_suppkey FROM supplier
                   WHERE s_acctbal >= 1000.0)
            SELECT p.p_brand, p.p_type,
                   CAST(p.p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT sp.l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM supply sp
            JOIN ok ON ok.s_suppkey = sp.l_suppkey
            JOIN part p ON p.p_partkey = sp.l_partkey
            WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q20_dominant": r"""
            WITH wq AS (
              SELECT l.l_partkey, l.l_suppkey,
                     sum(CAST(l.l_quantity AS BIGINT)) AS qty
              FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              WHERE p.p_name LIKE '%bolt%'
                AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l.l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY 1, 2),
            pt AS (SELECT l_partkey, sum(qty) AS total
                   FROM wq GROUP BY 1)
            SELECT DISTINCT s.s_name, n.n_name
            FROM wq JOIN pt ON pt.l_partkey = wq.l_partkey
            JOIN supplier s ON s.s_suppkey = wq.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE wq.qty * 2 > pt.total
            ORDER BY s_name
        """,
        "embed_kcenter4": r"""
            WITH e AS (SELECT vec_id,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
            d1 AS (SELECT e.vec_id, e.v,
                          list_distance(e.v, c0.v) AS d
                   FROM e, c0 WHERE e.vec_id != c0.vec_id),
            c1 AS (SELECT vec_id, v, d FROM d1
                   ORDER BY d DESC, vec_id LIMIT 1),
            d2 AS (SELECT d1.vec_id, d1.v,
                          least(d1.d, list_distance(d1.v, c1.v)) AS d
                   FROM d1, c1 WHERE d1.vec_id != c1.vec_id),
            c2 AS (SELECT vec_id, v, d FROM d2
                   ORDER BY d DESC, vec_id LIMIT 1),
            d3 AS (SELECT d2.vec_id, d2.v,
                          least(d2.d, list_distance(d2.v, c2.v)) AS d
                   FROM d2, c2 WHERE d2.vec_id != c2.vec_id),
            c3 AS (SELECT vec_id, v, d FROM d3
                   ORDER BY d DESC, vec_id LIMIT 1)
            SELECT CAST(0 AS BIGINT) AS k, vec_id, 0.0 AS dist FROM c0
            UNION ALL SELECT 1, vec_id, round(d, 9) FROM c1
            UNION ALL SELECT 2, vec_id, round(d, 9) FROM c2
            UNION ALL SELECT 3, vec_id, round(d, 9) FROM c3
            ORDER BY k
        """,
        "q13_custdist": r"""
            WITH co AS (
              SELECT c.c_custkey, count(o.o_custkey) AS c_count
              FROM customer c
              LEFT JOIN orders o ON o.o_custkey = c.c_custkey
              GROUP BY c.c_custkey)
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM co GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q18_large_orders": """
            WITH big AS (
                SELECT l_orderkey, sum(l_quantity) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > 250.0
            )
            SELECT o.o_custkey AS c_custkey, c.c_name AS c_name,
                   b.l_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
                   o.o_totalprice AS o_totalprice, b.sum_qty AS sum_qty
            FROM big b
            JOIN orders o ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        "events_rfm": """
            -- exact int64 cents on both sides: double-SUM reduction
            -- order + round() implementation differences can land on
            -- adjacent ulps; sum(c)/100.0 from identical integers is
            -- bit-equal to the engine
            WITH c AS (SELECT user_id, ts,
                              CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                                  AS c
                       FROM events)
            SELECT user_id, max(ts) AS last_ts,
                   CAST(count(*) AS BIGINT) AS n_events,
                   sum(c) / 100.0 AS total_value,
                   sum(c) / (100.0 * count(*)) AS avg_value
            FROM c GROUP BY user_id ORDER BY user_id
        """,
        "q6_forecast": """
            SELECT round(coalesce(sum(l_extendedprice * l_discount),
                                  0.0), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q3_shipping": """
            SELECT l.l_orderkey AS o_orderkey,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue,
                   max(o.o_orderdate) AS o_orderdate
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1996-06-01'
              AND l.l_shipdate > TIMESTAMP '1996-06-01'
            GROUP BY l.l_orderkey
            ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC,
                     o_orderkey
            LIMIT 10
        """,
        "events_hourly_topk": """
            WITH c AS (
                SELECT date_trunc('hour', ts) AS window_start, event_type,
                       CAST(count(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
            ),
            r AS (
                SELECT window_start, event_type, n,
                       CAST(row_number() OVER (
                           PARTITION BY window_start
                           ORDER BY n DESC, event_type) AS BIGINT) AS rnk
                FROM c
            )
            SELECT window_start, event_type, n, rnk
            FROM r WHERE rnk <= 3 ORDER BY window_start, rnk
        """,
        "top_customers": """
            SELECT o.o_custkey AS c_custkey, any_value(c.c_name) AS c_name,
                   round(sum(o.o_totalprice), 2) AS revenue
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY o.o_custkey
            ORDER BY sum(o.o_totalprice) DESC, c_custkey LIMIT 20
        """,
        "events_hourly": """
            WITH c AS (SELECT user_id, date_trunc('hour', ts) AS w,
                              CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                                  AS c
                       FROM events)
            SELECT user_id, w AS window_start,
                   CAST(count(*) AS BIGINT) AS n_events,
                   sum(c) / 100.0 AS sum_value
            FROM c GROUP BY user_id, w
            ORDER BY user_id, window_start
        """,
        "events_sessions": """
            WITH x AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                FROM events
            ),
            y AS (
                SELECT user_id, ts, event_id,
                       CAST(sum(brk) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                FROM x
            )
            SELECT user_id, session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM y GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "events_asof": """
            SELECT e.event_id, e.user_id, e.ts,
                   (SELECT max(o.o_orderkey) FROM orders o
                    WHERE o.o_custkey = e.user_id
                      AND o.o_orderdate = (
                          SELECT max(o2.o_orderdate) FROM orders o2
                          WHERE o2.o_custkey = e.user_id
                            AND o2.o_orderdate <= e.ts)) AS o_orderkey
            FROM events e ORDER BY e.event_id
        """,
        "supplier_parts": """
            SELECT l_suppkey,
                   CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
            FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
        """,
        "cust_order_stats": """
            SELECT c.c_custkey, c.c_mktsegment,
                   CAST(count(o.o_custkey) AS BIGINT) AS n_orders,
                   coalesce(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                                     AS BIGINT)), 0) / 100.0
                       AS total_spent
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_mktsegment ORDER BY c.c_custkey
        """,
        "orders_rollup": """
            SELECT coalesce(o_year, -1) AS o_year,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   c_sum / 100.0 AS sum_price, n_orders
            FROM (
                SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                       o_orderpriority,
                       sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                                AS BIGINT)) AS c_sum,
                       CAST(count(*) AS BIGINT) AS n_orders
                FROM orders GROUP BY ROLLUP(o_year, o_orderpriority)
            ) ORDER BY o_year, o_orderpriority
        """,
        "events_gaps": """
            WITH s AS (
                SELECT user_id,
                       CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       )) AS BIGINT) AS gap
                FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(min(gap) AS BIGINT) AS min_gap_us,
                   CAST(max(gap) AS BIGINT) AS max_gap_us,
                   CAST(sum(gap) AS BIGINT) AS sum_gap_us
            FROM s WHERE gap IS NOT NULL
            GROUP BY user_id ORDER BY user_id
        """,
        "events_transitions": """
            WITH s AS (
                SELECT user_id, event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS nxt
                FROM events)
            SELECT event_type AS from_type, nxt AS to_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM s WHERE nxt IS NOT NULL
            GROUP BY 1, 2 ORDER BY from_type, to_type
        """,
        "events_zscore": """
            WITH c AS (
                SELECT event_type, date_trunc('hour', ts) AS window_start,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY event_type, date_trunc('hour', ts)),
            st AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(n_events) AS BIGINT) AS s,
                       CAST(sum(n_events * n_events) AS BIGINT) AS q
                FROM c GROUP BY event_type)
            SELECT c.event_type, c.window_start, c.n_events,
                   round(CASE WHEN st.n * st.q - st.s * st.s > 0
                         THEN CAST(st.n * c.n_events - st.s AS DOUBLE)
                              / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE))
                         ELSE 0.0 END, 9) AS z
            FROM c JOIN st ON st.event_type = c.event_type
            ORDER BY c.event_type, c.window_start
        """,
        "orders_cube": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   c_sum / 100.0 AS sum_price, n_orders
            FROM (
                SELECT o_orderstatus, o_orderpriority,
                       sum(CAST(floor(o_totalprice * 100.0 + 0.5)
                                AS BIGINT)) AS c_sum,
                       CAST(count(*) AS BIGINT) AS n_orders
                FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ) ORDER BY o_orderstatus, o_orderpriority
        """,
        "events_funnel": """
            WITH f AS (
              SELECT user_id,
                min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
                min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
                min(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
              FROM events GROUP BY user_id)
            SELECT
              CAST(count(*) FILTER (t1 IS NOT NULL) AS BIGINT) AS n_signup,
              CAST(count(*) FILTER (t1 IS NOT NULL AND t2 > t1) AS BIGINT)
                  AS n_signup_click,
              CAST(count(*) FILTER (t1 IS NOT NULL AND t2 > t1 AND t3 > t2)
                  AS BIGINT) AS n_funnel
            FROM f
        """,
        "events_retention": """
            WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
            first AS (SELECT user_id, min(day) AS cohort_date
                      FROM d GROUP BY user_id),
            tri AS (SELECT DISTINCT f.cohort_date,
                           CAST(d.day - f.cohort_date AS BIGINT) AS day_offset,
                           d.user_id
                    FROM d JOIN first f USING (user_id)
                    WHERE d.day - f.cohort_date <= 7)
            SELECT cohort_date, day_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM tri GROUP BY cohort_date, day_offset
            ORDER BY cohort_date, day_offset
        """,
        "events_session_hist": """
            WITH x AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                FROM events
            ),
            y AS (
                SELECT user_id,
                       CAST(sum(brk) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                FROM x
            ),
            sess AS (SELECT user_id, session_id,
                            CAST(count(*) AS BIGINT) AS n
                     FROM y GROUP BY user_id, session_id)
            SELECT n AS session_len, CAST(count(*) AS BIGINT) AS n_sessions
            FROM sess GROUP BY n ORDER BY session_len
        """,
        "events_concurrency": """
            WITH x AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - lag(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                FROM events
            ),
            y AS (
                SELECT user_id, ts,
                       CAST(sum(brk) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                FROM x
            ),
            sess AS (SELECT user_id, session_id,
                            min(ts) AS session_start, max(ts) AS session_end
                     FROM y GROUP BY user_id, session_id),
            b AS (SELECT session_start AS t, CAST(1 AS BIGINT) AS delta,
                         user_id, session_id FROM sess
                  UNION ALL
                  SELECT session_end, CAST(-1 AS BIGINT), user_id, session_id
                  FROM sess),
            o AS (SELECT t, delta, user_id, session_id,
                         CAST(sum(delta) OVER (
                             ORDER BY t, delta DESC, user_id, session_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS concurrency
                  FROM b)
            SELECT t, delta, user_id, session_id, concurrency
            FROM o ORDER BY t, delta DESC, user_id, session_id
        """,
        "events_dau_wau": """
            WITH ud AS (SELECT DISTINCT user_id,
                               date_trunc('day', ts) AS day FROM events),
            days AS (SELECT DISTINCT day FROM ud),
            dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                    FROM ud GROUP BY day),
            wau AS (SELECT d.day,
                           CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
                    FROM days d JOIN ud u
                      ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
                    GROUP BY d.day)
            SELECT dau.day AS day, dau.dau, wau.wau
            FROM dau JOIN wau ON wau.day = dau.day ORDER BY day
        """,
        "copart_deg_hist": f"""
            WITH pairs AS ({_COPART_PAIRS}),
            und AS (SELECT pa_ AS u FROM pairs UNION ALL SELECT pb_ FROM pairs),
            deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree
                    FROM und GROUP BY u)
            SELECT degree, CAST(count(*) AS BIGINT) AS n_vertices
            FROM deg GROUP BY degree ORDER BY degree
        """,
        "copart_richclub": f"""
            WITH pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS (SELECT pa_ AS u FROM pairs UNION ALL SELECT pb_ FROM pairs),
            deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS degree
                                 FROM und GROUP BY u),
            ks AS (SELECT unnest(range(0, 64)) AS k),
            me AS (SELECT least(ds.degree, dd.degree) AS m
                   FROM pairs JOIN deg ds ON ds.u = pairs.pa_
                              JOIN deg dd ON dd.u = pairs.pb_),
            nk AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS n_nodes
                   FROM ks JOIN deg ON deg.degree > ks.k GROUP BY ks.k),
            ek AS (SELECT ks.k, CAST(count(*) AS BIGINT) AS n_edges
                   FROM ks JOIN me ON me.m > ks.k GROUP BY ks.k)
            SELECT CAST(nk.k AS BIGINT) AS k, nk.n_nodes,
                   CAST(coalesce(ek.n_edges, 0) AS BIGINT) AS n_edges,
                   round(2.0 * coalesce(ek.n_edges, 0)
                         / (nk.n_nodes * (nk.n_nodes - 1.0)), 9) AS phi
            FROM nk LEFT JOIN ek ON ek.k = nk.k
            WHERE nk.n_nodes >= 2 ORDER BY k
        """,
        "copart_diam16": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_COPART_PAIRS}),
            und AS MATERIALIZED (SELECT pa_ AS s, pb_ AS d FROM pairs
                    UNION ALL SELECT pb_, pa_ FROM pairs),
            seed AS (SELECT min(s) AS v FROM und),
            walk1(it, v, dist) AS (
                SELECT 0, v, 0 FROM seed
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM walk1 w JOIN und u ON u.s = w.v
                WHERE w.it < 16 GROUP BY w.it, u.d),
            d1 AS (SELECT v, CAST(min(dist) AS BIGINT) AS dist
                   FROM walk1 GROUP BY v),
            far1 AS (SELECT v, dist FROM d1 ORDER BY dist DESC, v LIMIT 1),
            walk2(it, v, dist) AS (
                SELECT 0, v, 0 FROM far1
                UNION ALL
                SELECT w.it + 1, u.d, min(w.dist) + 1
                FROM walk2 w JOIN und u ON u.s = w.v
                WHERE w.it < 16 GROUP BY w.it, u.d),
            d2 AS (SELECT v, CAST(min(dist) AS BIGINT) AS dist
                   FROM walk2 GROUP BY v),
            far2 AS (SELECT v, dist FROM d2 ORDER BY dist DESC, v LIMIT 1)
            SELECT {_PURL.format(c='seed.v')} AS src_url,
                   {_PURL.format(c='far1.v')} AS mid_url,
                   {_PURL.format(c='far2.v')} AS dst_url,
                   far2.dist AS diameter
            FROM seed, far1, far2
        """,
        # hash-scheme pipelines: exact SQL replays (md5-based hashes via
        # hex-cast, minhash permutations in HUGEINT mod-prime arithmetic,
        # deterministic seed-vector IVF codebook) — no approximation gap.
        "embed_kmeans": """
            WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                         FROM embeddings),
            c0 AS (SELECT vec_id AS c, e FROM emb WHERE vec_id < 8),
            d1 AS (SELECT v.vec_id, c0.c,
                          list_inner_product(v.e, v.e)
                          - 2 * list_inner_product(v.e, c0.e)
                          + list_inner_product(c0.e, c0.e) AS d
                   FROM emb v CROSS JOIN c0),
            a1 AS (SELECT vec_id, c AS cluster FROM (
                     SELECT vec_id, c, row_number() OVER
                         (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d1)
                   WHERE rn = 1),
            ex AS (SELECT a1.cluster AS c, unnest(e) AS val,
                          unnest(range(1, len(e) + 1)) AS i
                   FROM emb JOIN a1 USING (vec_id)),
            cm AS (SELECT c, list(m ORDER BY i) AS e FROM
                     (SELECT c, i, avg(val) AS m FROM ex GROUP BY c, i)
                   GROUP BY c),
            c1 AS (SELECT c0.c, coalesce(cm.e, c0.e) AS e
                   FROM c0 LEFT JOIN cm ON cm.c = c0.c),
            d2 AS (SELECT v.vec_id, c1.c,
                          list_inner_product(v.e, v.e)
                          - 2 * list_inner_product(v.e, c1.e)
                          + list_inner_product(c1.e, c1.e) AS d
                   FROM emb v CROSS JOIN c1),
            a2 AS (SELECT vec_id, c AS cluster FROM (
                     SELECT vec_id, c, row_number() OVER
                         (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d2)
                   WHERE rn = 1)
            SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
            FROM a2 ORDER BY vec_id
        """,
        "ngram_pairs": _NGRAM_SQL,
        "simhash_pairs": _SIMHASH_SQL,
        "simhash_table": _SIMHASH_TABLE_SQL,
        "minhash_pairs": _minhash_sql(),
        "dedup_src_matrix": f"""
            WITH mh AS (SELECT id_a, id_b FROM ({_minhash_sql()}))
            SELECT least(da.source, db.source) AS src_a,
                   greatest(da.source, db.source) AS src_b,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM mh JOIN documents da ON da.doc_id = mh.id_a
                    JOIN documents db ON db.doc_id = mh.id_b
            GROUP BY 1, 2 ORDER BY src_a, src_b
        """,
        "embed_knn_ivf": _IVF_SQL,
        "embed_dup_pairs_lsh": _lsh_sql(),
        "dedup_near_keep": _near_keep_sql(6),
        "dedup_cluster_sizes": _cluster_sizes_sql(6),
        # HLL distinct: exact replay — md5 hash, p=12 buckets, integer
        # register sum in HUGEINT (so float summation order cannot
        # diverge), same linear-counting branch
        "doc_image_features": r"""
            WITH px AS (
              SELECT doc_id, rr.r AS r, cx.c AS c,
                     (doc_id * 7 + rr.r * 31 + cx.c * 13) % 256 AS v
              FROM documents,
                   unnest(range(0, 16)) AS rr(r),
                   unnest(range(0, 16)) AS cx(c)),
            base AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_pix,
                     CAST(sum(v) AS BIGINT) AS sum_pix,
                     CAST(max(v) AS BIGINT) AS max_pix
              FROM px GROUP BY doc_id),
            ed AS (
              SELECT a.doc_id,
                     CAST(sum(CASE WHEN abs(a.v - b.v) >= 128
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_edges_pix
              FROM px a JOIN px b
                ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
              GROUP BY a.doc_id)
            SELECT base.doc_id, n_pix, sum_pix, max_pix,
                   CAST(coalesce(ed.n_edges_pix, 0) AS BIGINT)
                       AS n_edges_pix
            FROM base LEFT JOIN ed ON ed.doc_id = base.doc_id
            ORDER BY base.doc_id
        """,
        "events_audio_features": r"""
            WITH s AS (
              SELECT event_id,
                     ((event_id * 31 + i * 7919) % 65536) - 32768 AS v
              FROM events, unnest(range(0, 64)) AS r(i))
            SELECT event_id,
                   CAST(count(*) AS BIGINT) AS n_samples,
                   CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
                   CAST(max(abs(v)) AS BIGINT) AS max_amp
            FROM s GROUP BY event_id ORDER BY event_id
        """,
        "events_hll_users": """
            WITH h AS (
              SELECT CAST('0x' || substring(
                  md5('hll:' || CAST(user_id AS VARCHAR)), 1, 16
              ) AS UBIGINT) AS x FROM events),
            br AS (SELECT x % 4096 AS b, x >> 12 AS rem FROM h),
            r AS (SELECT b,
                         max(CASE WHEN rem = 0 THEN 53
                             ELSE 53 - length(bin(rem)) END) AS rho
                  FROM br GROUP BY b),
            allb AS (SELECT unnest(range(0, 4096)) AS b),
            m AS (SELECT allb.b, coalesce(r.rho, 0) AS rho
                  FROM allb LEFT JOIN r ON r.b = allb.b),
            s AS (SELECT sum(CAST(1 AS HUGEINT)
                             << CAST(53 - rho AS INTEGER)) AS z,
                         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros
                  FROM m),
            e AS (SELECT (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096
                         * pow(2.0, 53) / CAST(z AS DOUBLE) AS e_raw,
                         zeros FROM s)
            SELECT round(CASE WHEN e_raw <= 2.5 * 4096 AND zeros > 0
                         THEN 4096 * ln(4096.0 / zeros)
                         ELSE e_raw END, 3) AS n_users_hll
            FROM e
        """,
        "events_hll_hourly": """
            WITH h AS (
              SELECT date_trunc('hour', ts) AS w,
                     CAST('0x' || substring(
                         md5('hll:' || CAST(user_id AS VARCHAR)), 1, 16
                     ) AS UBIGINT) AS x FROM events),
            br AS (SELECT w, x % 256 AS b, x >> 8 AS rem FROM h),
            r AS (SELECT w, b,
                         max(CASE WHEN rem = 0 THEN 57
                             ELSE 57 - length(bin(rem)) END) AS rho
                  FROM br GROUP BY w, b),
            wins AS (SELECT DISTINCT w FROM h),
            allb AS (SELECT unnest(range(0, 256)) AS b),
            m AS (SELECT wins.w, allb.b, coalesce(r.rho, 0) AS rho
                  FROM wins CROSS JOIN allb
                  LEFT JOIN r ON r.w = wins.w AND r.b = allb.b),
            s AS (SELECT w, sum(CAST(1 AS HUGEINT)
                                << CAST(57 - rho AS INTEGER)) AS z,
                         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros
                  FROM m GROUP BY w),
            e AS (SELECT w, (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256
                         * pow(2.0, 57) / CAST(z AS DOUBLE) AS e_raw,
                         zeros FROM s)
            SELECT w AS window_start,
                   round(CASE WHEN e_raw <= 2.5 * 256 AND zeros > 0
                         THEN 256 * ln(256.0 / zeros)
                         ELSE e_raw END, 3) AS n_users_hll
            FROM e ORDER BY window_start
        """,
        # Count-Min sketch: integer counters, exact replay including
        # every hash-collision overcount
        "events_cms_types": """
            WITH rws AS (SELECT unnest(range(0, 4)) AS r),
            ec AS (
              SELECT rws.r AS r,
                     CAST('0x' || substring(md5(
                         'cms' || CAST(rws.r AS VARCHAR) || ':'
                         || e.event_type), 1, 16) AS UBIGINT)
                         % 1024 AS cell,
                     count(*) AS c
              FROM events e CROSS JOIN rws
              GROUP BY 1, 2),
            types AS (SELECT DISTINCT event_type FROM events),
            probe AS (
              SELECT t.event_type, rws.r,
                     CAST('0x' || substring(md5(
                         'cms' || CAST(rws.r AS VARCHAR) || ':'
                         || t.event_type), 1, 16) AS UBIGINT)
                         % 1024 AS cell
              FROM types t CROSS JOIN rws)
            SELECT p.event_type,
                   CAST(min(coalesce(ec.c, 0)) AS BIGINT) AS cms_count
            FROM probe p LEFT JOIN ec ON ec.r = p.r AND ec.cell = p.cell
            GROUP BY p.event_type ORDER BY p.event_type
        """,
        # Bloom semi-join: exact replay of the bit positions, including
        # deterministic false positives
        "events_bloom_hot_users": """
            WITH ks AS (SELECT unnest(range(0, 3)) AS i),
            hot AS (SELECT DISTINCT c_custkey AS k FROM customer
                    WHERE c_acctbal > 9000.0),
            bits AS (
              SELECT DISTINCT CAST('0x' || substring(md5(
                  'bf' || CAST(ks.i AS VARCHAR) || ':'
                  || CAST(hot.k AS VARCHAR)), 1, 16) AS UBIGINT)
                  % 16384 AS b
              FROM hot CROSS JOIN ks),
            epos AS (
              SELECT e.event_id, e.user_id,
                     CAST('0x' || substring(md5(
                         'bf' || CAST(ks.i AS VARCHAR) || ':'
                         || CAST(e.user_id AS VARCHAR)), 1, 16) AS UBIGINT)
                         % 16384 AS b
              FROM events e CROSS JOIN ks),
            hits AS (
              SELECT event_id, user_id, count(*) AS nhit
              FROM epos JOIN bits USING (b) GROUP BY 1, 2)
            SELECT event_id, user_id FROM hits WHERE nhit = 3
            ORDER BY event_id
        """,
        # corpus scoring / selection (pipelines.scoring)
        "doc_bm25": r"""
            WITH dl AS (
              SELECT doc_id,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                          END AS BIGINT) AS dl
              FROM documents),
            stats AS (SELECT count(*) AS n,
                             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                      FROM dl),
            tk AS (SELECT doc_id,
                          unnest(regexp_split_to_array(
                              trim(lower(text)), '\s+')) AS tok
                   FROM documents WHERE trim(text) != ''),
            tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM tk
                   WHERE tok IN ('hash', 'merge', 'spark', 'table')
                   GROUP BY doc_id, tok),
            df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf
                   GROUP BY tok),
            contrib AS (
              SELECT tf.doc_id,
                     ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     * tf.tf * (1.2 + 1.0)
                     / (tf.tf + 1.2 * (1.0 - 0.75
                                       + 0.75 * dl.dl / stats.avgdl)) AS c
              FROM tf JOIN df USING (tok) JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats),
            sc AS (SELECT doc_id, sum(c) AS s FROM contrib GROUP BY doc_id)
            SELECT d.doc_id, round(coalesce(sc.s, 0.0), 6) AS bm25
            FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "doc_bigram_coverage": r"""
            WITH tk AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            bg AS (
              SELECT doc_id,
                     list_element(a, i) || ' ' || list_element(a, i + 1)
                         AS gram
              FROM tk, unnest(range(1, len(a))) AS r(i)),
            corpus AS (SELECT gram, CAST(count(*) AS BIGINT) AS c
                       FROM bg GROUP BY gram),
            perdoc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS k
                       FROM bg GROUP BY doc_id, gram)
            SELECT p.doc_id,
                   CAST(sum(p.k) AS BIGINT) AS n_bigrams,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax,
                   CAST(min(c.c) AS BIGINT) AS min_df,
                   CAST(max(c.c) AS BIGINT) AS max_df
            FROM perdoc p JOIN corpus c ON c.gram = p.gram
            GROUP BY p.doc_id ORDER BY p.doc_id
        """,
        "bpe_merge_pairs": r"""
            WITH dd AS (
              SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            tok AS (SELECT unnest(a) AS w FROM dd),
            tf AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
            pairs AS (
              SELECT substring(w, i, 2) AS pair, n
              FROM tf, unnest(range(1, length(w))) AS r(i)),
            agg AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
                    FROM pairs GROUP BY pair)
            SELECT pair, cnt FROM agg ORDER BY cnt DESC, pair LIMIT 20
        """,
        "dedup_multisignal": _multisignal_sql(6),
        "dedup_decontam": r"""
            WITH tk AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            g AS (
              SELECT doc_id, i,
                     substring(md5(list_element(a, i) || ' ' ||
                                   list_element(a, i+1) || ' ' ||
                                   list_element(a, i+2)), 1, 16) AS h
              FROM tk, unnest(range(1, len(a) - 1)) AS r(i)),
            win AS (
              SELECT doc_id,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS BETWEEN CURRENT ROW
                                  AND 3 FOLLOWING) AS fp
              FROM g),
            fps AS (SELECT DISTINCT doc_id, fp FROM win),
            pairs AS (
              SELECT DISTINCT c.doc_id, b.doc_id AS bid
              FROM fps c JOIN fps b ON b.fp = c.fp
              WHERE b.doc_id % 25 = 0 AND c.doc_id % 25 != 0)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits
            FROM pairs GROUP BY doc_id ORDER BY doc_id
        """,
        "winnow_pairs": r"""
            WITH tk AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            g AS (
              SELECT doc_id, i,
                     substring(md5(list_element(a, i) || ' ' ||
                                   list_element(a, i+1) || ' ' ||
                                   list_element(a, i+2)), 1, 16) AS h
              FROM tk, unnest(range(1, len(a) - 1)) AS r(i)),
            win AS (
              SELECT doc_id,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS BETWEEN CURRENT ROW
                                  AND 3 FOLLOWING) AS fp
              FROM g),
            fps AS (SELECT DISTINCT doc_id, fp FROM win)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM fps a JOIN fps b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 3
            ORDER BY id_a, id_b
        """,
        "doc_winnow": r"""
            WITH tk AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            g AS (
              SELECT doc_id, i,
                     substring(md5(list_element(a, i) || ' ' ||
                                   list_element(a, i+1) || ' ' ||
                                   list_element(a, i+2)), 1, 16) AS h
              FROM tk, unnest(range(1, len(a) - 1)) AS r(i)),
            win AS (
              SELECT doc_id,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS BETWEEN CURRENT ROW
                                  AND 3 FOLLOWING) AS fp
              FROM g)
            SELECT DISTINCT doc_id, fp FROM win ORDER BY doc_id, fp
        """,
        "doc_budget10k": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            tok AS (SELECT doc_id, unnest(a) AS w FROM d),
            st AS (SELECT doc_id,
                          CAST(count(*) AS BIGINT) AS n_tokens,
                          CAST(count(DISTINCT w) * 1000 // count(*)
                               AS BIGINT) AS score
                   FROM tok GROUP BY doc_id),
            ranked AS (
              SELECT doc_id, score, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                         ORDER BY score DESC, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
              FROM st)
            SELECT doc_id, score, n_tokens, cum_before
            FROM ranked WHERE cum_before < 10000 ORDER BY doc_id
        """,
        "doc_buckets10": r"""
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(ntile(10) OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS bucket
            FROM documents ORDER BY doc_id
        """,
        "doc_cosine_pairs": r"""
            WITH dd AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            tok AS (SELECT doc_id, unnest(a) AS w FROM dd),
            tf AS (SELECT doc_id, w, count(*) AS k
                   FROM tok GROUP BY doc_id, w),
            n AS (SELECT doc_id, sum(k * k) AS s2 FROM tf GROUP BY doc_id),
            dots AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     sum(a.k * b.k) AS dot
              FROM tf a JOIN tf b ON a.w = b.w AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(dot / sqrt(na.s2 * nb.s2), 9) AS cosine
            FROM dots
            JOIN n na ON na.doc_id = dots.id_a
            JOIN n nb ON nb.doc_id = dots.id_b
            WHERE dot / sqrt(na.s2 * nb.s2) >= 0.85
            ORDER BY id_a, id_b
        """,
        "doc_gopher": r"""
            WITH tk AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            tok AS (SELECT doc_id, unnest(a) AS w FROM tk),
            base AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN w IN
                        ('the','a','and','of','to','in','is')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
              FROM tok GROUP BY doc_id),
            bg AS (
              SELECT doc_id,
                     list_element(a, i) || ' ' || list_element(a, i + 1)
                         AS gram
              FROM tk, unnest(range(1, len(a))) AS r(i)),
            bgc AS (SELECT doc_id, gram, count(*) AS k
                    FROM bg GROUP BY doc_id, gram),
            top AS (
              SELECT doc_id, k, gram FROM (
                SELECT doc_id, k, gram, row_number() OVER (
                    PARTITION BY doc_id ORDER BY k DESC, gram) AS rn
                FROM bgc) WHERE rn = 1),
            g3 AS (
              SELECT doc_id,
                     list_element(a, i) || ' ' || list_element(a, i+1) ||
                     ' ' || list_element(a, i+2) AS gram
              FROM tk, unnest(range(1, len(a) - 1)) AS r(i)),
            g3c AS (SELECT doc_id, gram, count(*) AS k
                    FROM g3 GROUP BY doc_id, gram),
            dup AS (SELECT doc_id,
                           CAST(sum(CASE WHEN k >= 2 THEN k ELSE 0 END)
                                AS BIGINT) AS dup3_pos
                    FROM g3c GROUP BY doc_id)
            SELECT b.doc_id, b.n_tokens, b.n_stop,
                   CAST(coalesce(t.k, 0) AS BIGINT) AS top2_count,
                   CAST(coalesce(t.k * length(t.gram), 0) AS BIGINT)
                       AS top2_chars,
                   CAST(coalesce(dup.dup3_pos, 0) AS BIGINT) AS dup3_pos
            FROM base b
            LEFT JOIN top t USING (doc_id)
            LEFT JOIN dup USING (doc_id)
            ORDER BY b.doc_id
        """,
        "doc_ttr": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            tok AS (SELECT doc_id, unnest(a) AS w FROM d),
            tf AS (SELECT doc_id, w, count(*) AS c
                   FROM tok GROUP BY doc_id, w)
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_types,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax
            FROM tf GROUP BY doc_id ORDER BY doc_id
        """,
        "doc_oov100": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            tok AS (SELECT doc_id, unnest(a) AS w FROM d),
            ctf AS (SELECT w, count(*) AS tf FROM tok GROUP BY w),
            top AS (SELECT w FROM ctf ORDER BY tf DESC, w LIMIT 100)
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN top.w IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oov
            FROM tok LEFT JOIN top ON top.w = tok.w
            GROUP BY doc_id ORDER BY doc_id
        """,
        "doc_keywords": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            tok AS (SELECT doc_id, unnest(a) AS w FROM d),
            tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
                   FROM tok GROUP BY doc_id, w),
            df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                   FROM tok GROUP BY w),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM documents),
            sc AS (SELECT tf.doc_id, tf.w AS term,
                          round(ln(n.c / df.df) * tf.tf, 9) AS score
                   FROM tf JOIN df ON df.w = tf.w CROSS JOIN n),
            r AS (SELECT doc_id, term, score,
                         row_number() OVER (
                             PARTITION BY doc_id
                             ORDER BY score DESC, term) AS rnk
                  FROM sc)
            SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, score
            FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk
        """,
        "doc_pack512": r"""
            WITH tk AS (
              SELECT doc_id,
                     CAST(len(regexp_split_to_array(trim(lower(text)),
                                                    '\s+')) AS BIGINT)
                         AS n_tokens
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            s AS (
              SELECT doc_id, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS off
              FROM tk)
            SELECT doc_id, n_tokens,
                   CAST(off // 512 AS BIGINT) AS pack_id,
                   CAST(off % 512 AS BIGINT) AS pack_off
            FROM s ORDER BY doc_id
        """,
        "doc_zipf": r"""
            WITH tk AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                         AS term
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            agg AS (SELECT term, CAST(count(*) AS BIGINT) AS tf,
                           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                    FROM tk GROUP BY term),
            ranked AS (SELECT row_number() OVER
                           (ORDER BY tf DESC, term) AS rank, *
                       FROM agg)
            SELECT CAST(rank AS BIGINT) AS rank, term, tf, df
            FROM ranked WHERE rank <= 100 ORDER BY rank
        """,
        "doc_tfidf": r"""
            WITH tk AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                         AS term
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            agg AS (SELECT term, CAST(count(*) AS BIGINT) AS tf,
                           CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                    FROM tk GROUP BY term)
            SELECT term, tf, df,
                   round(ln(n.n / df) * tf, 9) AS tfidf_mass
            FROM agg CROSS JOIN n
            ORDER BY tfidf_mass DESC, term LIMIT 30
        """,
        "doc_dup_coverage": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS a
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            tk AS (SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens FROM d),
            g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                         array_to_string(list_slice(a, i, i + 4), ' ') AS gram
                  FROM d, unnest(range(1, len(a) - 3)) AS t(i)),
            dup AS (SELECT gram FROM g GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
            cov AS (SELECT DISTINCT s.doc_id, s.pos + o.o AS cp
                    FROM g s JOIN dup USING (gram),
                         (SELECT unnest([0, 1, 2, 3, 4]) AS o) o),
            c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_tokens
                  FROM cov GROUP BY doc_id)
            SELECT tk.doc_id, tk.n_tokens,
                   coalesce(c.dup_tokens, 0) AS dup_tokens
            FROM tk LEFT JOIN c USING (doc_id) ORDER BY tk.doc_id
        """,
        "doc_dup_ngrams": r"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS l
              FROM documents WHERE trim(coalesce(text, '')) != ''),
            pos AS (SELECT doc_id, l, unnest(range(1, len(l) - 3)) AS i
                    FROM tok WHERE len(l) >= 5),
            gram AS (SELECT doc_id,
                            array_to_string(list_slice(l, i, i + 4), ' ')
                                AS gram
                     FROM pos)
            SELECT gram, CAST(count(*) AS BIGINT) AS n_occ,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM gram GROUP BY gram
            HAVING count(DISTINCT doc_id) >= 2
            ORDER BY df DESC, n_occ DESC, gram LIMIT 50
        """,
        "doc_cooccur": """
            WITH tk AS (
              SELECT doc_id, unnest(l) AS tok,
                     unnest(range(1, len(l) + 1)) AS pos
              FROM (SELECT doc_id,
                           regexp_split_to_array(trim(lower(text)), '\s+') AS l
                    FROM documents
                    WHERE trim(coalesce(text, '')) != '')),
            uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                    FROM tk GROUP BY tok),
            tt AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM uni),
            pairs AS (
              SELECT least(a.tok, b.tok) AS ta, greatest(a.tok, b.tok) AS tb,
                     CAST(count(*) AS BIGINT) AS n_pairs
              FROM tk a JOIN tk b ON a.doc_id = b.doc_id
                   AND b.pos - a.pos BETWEEN 1 AND 2
              GROUP BY 1, 2),
            w AS (SELECT CAST(sum(n_pairs) AS DOUBLE) AS w FROM pairs),
            sc AS (SELECT ta AS term_a, tb AS term_b, n_pairs,
                          round(ln(n_pairs * tt.t * tt.t
                                   / (w.w * ua.c * ub.c)), 9) AS pmi
                   FROM pairs JOIN uni ua ON ua.tok = ta
                        JOIN uni ub ON ub.tok = tb
                   CROSS JOIN tt CROSS JOIN w)
            SELECT term_a, term_b, n_pairs, pmi FROM sc
            ORDER BY pmi DESC, term_a, term_b LIMIT 30
        """,
        "doc_top3_source": """
            SELECT source, doc_id, n_chars, rnk FROM (
              SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                     CAST(row_number() OVER (
                         PARTITION BY source ORDER BY n_chars DESC, doc_id
                     ) AS BIGINT) AS rnk
              FROM documents) WHERE rnk <= 3 ORDER BY source, rnk
        """,
        "doc_sample": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     CAST('0x' || substring(
                         md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 16
                     ) AS UBIGINT) % 1000 AS m
              FROM documents)
            WHERE m < CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 300
                                WHEN 'es' THEN 200 WHEN 'fr' THEN 100
                                ELSE 250 END
            ORDER BY doc_id
        """,
        "doc_sample_weighted": """
            SELECT doc_id, n_chars, k_score FROM (
              SELECT doc_id, n_chars,
                     round(pow((CAST(CAST('0x' || substring(
                                md5('wsmp:' || CAST(doc_id AS VARCHAR)), 1, 16
                            ) AS UBIGINT) AS DOUBLE) + 1)
                            / 18446744073709551616.0,
                            1.0 / greatest(n_chars, 1)), 9) AS k_score
              FROM documents)
            ORDER BY k_score DESC, doc_id LIMIT 20
        """,
        "embed_centroids": """
            WITH ex AS (
              SELECT label, i AS dim, CAST(embedding[i + 1] AS DOUBLE) AS v
              FROM embeddings
              CROSS JOIN (SELECT unnest(range(0, 64)) AS i))
            SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
                   round(sum(v) / count(*), 6) AS centroid
            FROM ex GROUP BY label, dim ORDER BY label, dim
        """,
        "embed_pq4": _pq_sql(),
        "embed_adc3": _adc_sql(),
        "embed_adc_recall": _recall_sql(),
        "embed_sq8": r"""
            WITH e AS (
              SELECT vec_id, i - 1 AS dim,
                     CAST(list_element(embedding, i) AS DOUBLE) AS x
              FROM embeddings, unnest(range(1, 65)) AS r(i)),
            mm AS (SELECT dim, min(x) AS mn, max(x) AS mx
                   FROM e GROUP BY dim)
            SELECT vec_id, CAST(e.dim AS BIGINT) AS dim,
                   CAST(CASE WHEN mx = mn THEN 0
                        ELSE least(floor((x - mn) * 255.0 / (mx - mn)),
                                   255) END AS BIGINT) AS code
            FROM e JOIN mm ON mm.dim = e.dim
            ORDER BY vec_id, dim
        """,
        "events_value_quantiles": r"""
            SELECT event_type,
                   quantile_disc(value, 0.50) AS p50,
                   quantile_disc(value, 0.90) AS p90,
                   quantile_disc(value, 0.99) AS p99
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "doc_len_quantiles": r"""
            WITH tok AS (
              SELECT lang,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                          END AS BIGINT) AS nt
              FROM documents),
            h AS (SELECT lang, nt, count(*) AS c FROM tok GROUP BY lang, nt),
            w AS (SELECT lang, nt,
                         sum(c) OVER (PARTITION BY lang ORDER BY nt) AS cum,
                         sum(c) OVER (PARTITION BY lang) AS n
                  FROM h)
            SELECT lang,
                   CAST(min(CASE WHEN 100 * cum >= 50 * n THEN nt END)
                        AS BIGINT) AS p50,
                   CAST(min(CASE WHEN 100 * cum >= 90 * n THEN nt END)
                        AS BIGINT) AS p90,
                   CAST(min(CASE WHEN 100 * cum >= 99 * n THEN nt END)
                        AS BIGINT) AS p99
            FROM w GROUP BY lang ORDER BY lang
        """,
    }
    # end-to-end corpus curation: composes the near-dup keep set, the
    # corpus token-length band and the langid agreement filter — the
    # sub-oracles are embedded verbatim as subqueries so the composed
    # oracle replays the engine's exact pipeline
    o["doc_curate"] = rf"""
        WITH keepq AS MATERIALIZED (
            SELECT doc_id FROM ({o['dedup_near_keep']})),
        langp AS MATERIALIZED (
            SELECT doc_id, lang_pred FROM ({o['doc_langid']})),
        tok AS (
            SELECT doc_id,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                        END AS BIGINT) AS nt
            FROM documents),
        h AS (SELECT nt, count(*) AS c FROM tok GROUP BY nt),
        w AS (SELECT nt, sum(c) OVER (ORDER BY nt) AS cum,
                     sum(c) OVER () AS n FROM h),
        thr AS (SELECT
            CAST(min(CASE WHEN 100 * cum >= 10 * n THEN nt END) AS BIGINT) AS p10,
            CAST(min(CASE WHEN 100 * cum >= 90 * n THEN nt END) AS BIGINT) AS p90
            FROM w)
        SELECT d.doc_id FROM documents d
        JOIN keepq k ON k.doc_id = d.doc_id
        JOIN tok ON tok.doc_id = d.doc_id
        JOIN langp ON langp.doc_id = d.doc_id
        CROSS JOIN thr
        WHERE tok.nt BETWEEN thr.p10 AND thr.p90
          AND langp.lang_pred = d.lang
        ORDER BY d.doc_id
    """
    return o
