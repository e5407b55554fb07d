"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself BEFORE importing this module:
nothing here (or in nexus_forge_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``      — flagship pipeline on /root/testdata/sf0.001
- ``queries()``    — one callable per implemented operator/pipeline (SURVEY.md §2)
- ``oracle_sql()`` — DuckDB-equivalent SQL for the oracle-checkable subset
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline smoke: KG construction over pages synthesized from the
    sf0.001 documents table (read → extract → mention-detect → link → triples).
    Falls back to the corpus analysis pipeline while the KG flagship is landing.
    """
    import nexus_forge_ray
    nexus_forge_ray.configure(quiet=True)
    try:
        from nexus_forge_ray.pipelines.kg_pipeline import flagship
        return flagship(SF_SMOKE)
    except ImportError:
        from nexus_forge_ray.pipelines import corpus
        return corpus.doc_quality(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    import nexus_forge_ray
    nexus_forge_ray.configure(quiet=True)
    from nexus_forge_ray.pipelines import corpus, kg_queries, relational

    # --- slots 1-50: the driver's oracle window (it checks the FIRST 50
    # entries). Round-5 rotation (VERDICT r4 "Next round" #1): 5 sentinel
    # queries from prior green windows (flagship kg core), then 45 entries
    # with NO green driver row in rounds 1-4 — the full ROUND4.md fodder
    # list minus near-duplicates of already-oracle-checked family members
    # (e.g. doc_bpe_merges is subsumed by doc_bpe_encode ★r4,
    # simhash_signatures by simhash_near_dup ★r4). Every slot has an
    # ORACLES row. Names registered exactly once (see _register).
    WINDOW: list[tuple[str, Callable[[str], Any]]] = [
        # — sentinels (2, green in r2-r4 driver windows) —
        ("kg_triples", kg_queries.QUERIES["kg_triples"]),
        ("kg_components", kg_queries.QUERIES["kg_components"]),
        # — brand-new this round (3): UNION + global-scope groups,
        # subqueries inside UNION branches, BM25 ES match scoring —
        ("kg_bgp_union_global", kg_queries.QUERIES["kg_bgp_union_global"]),
        ("kg_bgp_union_subquery",
         kg_queries.QUERIES["kg_bgp_union_subquery"]),
        ("q_es_bm25", corpus.q_es_bm25),
        # — no prior green driver row (45) —
        # kg: named graphs / updates / sampling / SPARQL long tail
        ("kg_graph_from", kg_queries.QUERIES["kg_graph_from"]),
        ("kg_graph_drop", kg_queries.QUERIES["kg_graph_drop"]),
        ("kg_graph_with_update", kg_queries.QUERIES["kg_graph_with_update"]),
        ("kg_graph_data_update", kg_queries.QUERIES["kg_graph_data_update"]),
        ("kg_graph_groupby", kg_queries.QUERIES["kg_graph_groupby"]),
        ("kg_default_graph_agg", kg_queries.QUERIES["kg_default_graph_agg"]),
        ("kg_negative_samples", kg_queries.QUERIES["kg_negative_samples"]),
        ("kg_bgp_negpath", kg_queries.QUERIES["kg_bgp_negpath"]),
        ("kg_bgp_zeroone", kg_queries.QUERIES["kg_bgp_zeroone"]),
        ("kg_bgp_filter_in", kg_queries.QUERIES["kg_bgp_filter_in"]),
        ("kg_bgp_functions", kg_queries.QUERIES["kg_bgp_functions"]),
        ("kg_bgp_sample", kg_queries.QUERIES["kg_bgp_sample"]),
        ("kg_bgp_path_nested", kg_queries.QUERIES["kg_bgp_path_nested"]),
        ("kg_bgp_union_optional", kg_queries.QUERIES["kg_bgp_union_optional"]),
        ("kg_bgp_union_minus", kg_queries.QUERIES["kg_bgp_union_minus"]),
        # ES-DSL surface
        ("q_es_multi_match", corpus.q_es_multi_match),
        ("q_es_terms", corpus.q_es_terms),
        ("q_es_match_phrase", corpus.q_es_match_phrase),
        ("q_es_agg", corpus.q_es_agg),
        ("q_es_date_histogram", corpus.q_es_date_histogram),
        ("q_es_range_agg", corpus.q_es_range_agg),
        ("q_es_top_hits", corpus.q_es_top_hits),
        # text / dedup / sampling / LM families
        ("minhash_near_dup", corpus.minhash_near_dup),
        ("doc_tfidf", corpus.doc_tfidf),
        ("doc_inverted_index", corpus.doc_inverted_index),
        ("doc_quality_classifier", corpus.doc_quality_classifier),
        ("doc_decontaminate", corpus.doc_decontaminate),
        ("doc_collocations", corpus.doc_collocations),
        ("doc_repetition", corpus.doc_repetition),
        ("doc_pii_redact", corpus.doc_pii_redact),
        ("doc_top_per_lang", corpus.doc_top_per_lang),
        ("doc_sample", corpus.doc_sample),
        ("doc_sample_stratified", corpus.doc_sample_stratified),
        ("doc_bigram_logprob", corpus.doc_bigram_logprob),
        ("doc_chunk_windows", corpus.doc_chunk_windows),
        ("doc_mixture", corpus.doc_mixture),
        ("doc_url_normalize", corpus.doc_url_normalize),
        ("doc_host_cap", corpus.doc_host_cap),
        ("lang_id_pred", corpus.lang_id_pred),
        ("doc_classifier_pr", corpus.doc_classifier_pr),
        ("q_events_retention", relational.q_events_retention),
        # embedding-space classification + ANN parity
        ("emb_class_centroids", corpus.emb_class_centroids),
        ("emb_nearest_centroid", corpus.emb_nearest_centroid),
        ("emb_knn_predict", corpus.emb_knn_predict),
        ("similarity_topk_ivf_full", corpus.similarity_topk_ivf_full),
    ]
    assert len(WINDOW) == 50, f"window must fill slots 1-50, got {len(WINDOW)}"

    q: dict[str, Callable[[str], Any]] = {}

    def _register(pairs) -> None:
        for name, fn in pairs:
            assert name not in q, f"duplicate registration: {name}"
            q[name] = fn

    _register(WINDOW)

    # --- slots 51+: rotated out of the window (green driver rows in
    # r1-r4), then the remainder; rows-only entries dead last.
    _register([
        ("kg_assemble", kg_queries.QUERIES["kg_assemble"]),
        ("kg_bgp", kg_queries.QUERIES["kg_bgp"]),
        ("kg_pagerank", kg_queries.QUERIES["kg_pagerank"]),
        ("kg_mentions", kg_queries.QUERIES["kg_mentions"]),
        ("kg_resolve_exact", kg_queries.QUERIES["kg_resolve_exact"]),
        ("kg_resolve_fuzzy", kg_queries.QUERIES["kg_resolve_fuzzy"]),
        ("kg_resolve_ontology", kg_queries.QUERIES["kg_resolve_ontology"]),
        ("kg_validate_logical", kg_queries.QUERIES["kg_validate_logical"]),
        ("kg_validate_closed", kg_queries.QUERIES["kg_validate_closed"]),
        ("kg_bgp_optional_filter",
         kg_queries.QUERIES["kg_bgp_optional_filter"]),
        ("kg_bgp_groupconcat", kg_queries.QUERIES["kg_bgp_groupconcat"]),
        ("kg_update", kg_queries.QUERIES["kg_update"]),
        ("kg_quads", kg_queries.QUERIES["kg_quads"]),
        ("kg_scc", kg_queries.QUERIES["kg_scc"]),
        ("kg_reachable", kg_queries.QUERIES["kg_reachable"]),
        ("kg_graph_named", kg_queries.QUERIES["kg_graph_named"]),
        ("kg_graph_var", kg_queries.QUERIES["kg_graph_var"]),
        ("kg_graph_mixed", kg_queries.QUERIES["kg_graph_mixed"]),
        ("kg_upsert_recrawl", kg_queries.QUERIES["kg_upsert_recrawl"]),
        ("kg_degree_dist", kg_queries.QUERIES["kg_degree_dist"]),
        ("kg_cooccur", kg_queries.QUERIES["kg_cooccur"]),
        ("kg_inlinks", kg_queries.QUERIES["kg_inlinks"]),
        ("kg_triangles", kg_queries.QUERIES["kg_triangles"]),
        ("kg_shortest_paths", kg_queries.QUERIES["kg_shortest_paths"]),
        ("kg_mis", kg_queries.QUERIES["kg_mis"]),
        ("kg_link_prediction", kg_queries.QUERIES["kg_link_prediction"]),
        ("kg_sameas_rewrite", kg_queries.QUERIES["kg_sameas_rewrite"]),
        ("kg_infer_types", kg_queries.QUERIES["kg_infer_types"]),
        ("kg_bgp_path_group", kg_queries.QUERIES["kg_bgp_path_group"]),
        ("simhash_near_dup", corpus.simhash_near_dup),
        ("doc_bm25", corpus.doc_bm25),
        ("emb_semdedup", corpus.emb_semdedup),
        ("doc_winnowing", corpus.doc_winnowing),
        ("doc_ngram_jaccard", corpus.doc_ngram_jaccard),
        ("doc_gopher_rules", corpus.doc_gopher_rules),
        ("doc_span_dedup", corpus.doc_span_dedup),
        ("doc_dedup_incremental", corpus.doc_dedup_incremental),
        ("doc_substring_dedup", corpus.doc_substring_dedup),
        ("dsir_weights", corpus.dsir_weights),
        ("doc_ppl_buckets", corpus.doc_ppl_buckets),
        ("doc_bpe_encode", corpus.doc_bpe_encode),
        ("mm_image_stats", corpus.mm_image_stats),
        ("mm_image_formats", corpus.mm_image_formats),
        ("mm_audio_spectral", corpus.mm_audio_spectral),
        ("q_es_match", corpus.q_es_match),
        ("q_es_should", corpus.q_es_should),
        ("q_es_score", corpus.q_es_score),
        ("q_es_vector_score", corpus.q_es_vector_score),
        ("kg_triples_typed", kg_queries.QUERIES["kg_triples_typed"]),
        ("kg_entity_popularity", kg_queries.QUERIES["kg_entity_popularity"]),
        ("kg_validate_customers",
         kg_queries.QUERIES["kg_validate_customers"]),
        ("kg_validate_nested", kg_queries.QUERIES["kg_validate_nested"]),
        ("kg_validate_pairs", kg_queries.QUERIES["kg_validate_pairs"]),
        ("kg_validate_strings", kg_queries.QUERIES["kg_validate_strings"]),
        ("kg_validate_sparql", kg_queries.QUERIES["kg_validate_sparql"]),
        ("kg_actions_summary", kg_queries.QUERIES["kg_actions_summary"]),
        ("kg_bgp_filter", kg_queries.QUERIES["kg_bgp_filter"]),
        ("kg_bgp_filter_logic", kg_queries.QUERIES["kg_bgp_filter_logic"]),
        ("kg_bgp_optional", kg_queries.QUERIES["kg_bgp_optional"]),
        ("kg_bgp_union", kg_queries.QUERIES["kg_bgp_union"]),
        ("kg_bgp_union_scoped", kg_queries.QUERIES["kg_bgp_union_scoped"]),
        ("kg_bgp_groupby", kg_queries.QUERIES["kg_bgp_groupby"]),
        ("kg_bgp_values", kg_queries.QUERIES["kg_bgp_values"]),
        ("kg_bgp_bind", kg_queries.QUERIES["kg_bgp_bind"]),
        ("kg_bgp_having", kg_queries.QUERIES["kg_bgp_having"]),
        ("kg_bgp_count_distinct", kg_queries.QUERIES["kg_bgp_count_distinct"]),
        ("kg_bgp_exists", kg_queries.QUERIES["kg_bgp_exists"]),
        ("kg_bgp_notexists", kg_queries.QUERIES["kg_bgp_notexists"]),
        ("kg_bgp_construct", kg_queries.QUERIES["kg_bgp_construct"]),
        ("kg_bgp_describe", kg_queries.QUERIES["kg_bgp_describe"]),
        ("kg_bgp_star", kg_queries.QUERIES["kg_bgp_star"]),
        ("kg_bgp_alt", kg_queries.QUERIES["kg_bgp_alt"]),
        ("kg_bgp_subquery", kg_queries.QUERIES["kg_bgp_subquery"]),
        ("kg_pagerank_personalized",
         kg_queries.QUERIES["kg_pagerank_personalized"]),
        ("kg_hits", kg_queries.QUERIES["kg_hits"]),
        ("kg_entity_jaccard", kg_queries.QUERIES["kg_entity_jaccard"]),
        ("kg_kcore", kg_queries.QUERIES["kg_kcore"]),
        ("kg_communities", kg_queries.QUERIES["kg_communities"]),
        ("kg_pagerank_weighted", kg_queries.QUERIES["kg_pagerank_weighted"]),
        ("kg_random_walks", kg_queries.QUERIES["kg_random_walks"]),
        ("kg_sssp", kg_queries.QUERIES["kg_sssp"]),
        ("embedding_near_dup", corpus.embedding_near_dup),
        ("simhash_signatures", corpus.simhash_signatures),
        ("doc_heavy_tokens", corpus.doc_heavy_tokens),
        ("doc_filter_pass", corpus.doc_filter_pass),
        ("doc_vocab", corpus.doc_vocab),
        ("q_es_stats_agg", corpus.q_es_stats_agg),
        ("q_es_search_page", corpus.q_es_search_page),
        ("doc_splits", corpus.doc_splits),
        ("doc_snapshot_diff", corpus.doc_snapshot_diff),
        ("emb_centroid_confusion", corpus.emb_centroid_confusion),
        ("doc_normalize", corpus.doc_normalize),
        ("doc_unigram_logprob", corpus.doc_unigram_logprob),
        ("doc_temperature_mixture", corpus.doc_temperature_mixture),
        ("doc_sample_per_lang", corpus.doc_sample_per_lang),
        ("doc_bigrams", corpus.doc_bigrams),
        ("doc_epoch_shuffle", corpus.doc_epoch_shuffle),
        ("doc_quality", corpus.doc_quality),
        # relational suite (green r2)
        ("q1_pricing_summary", relational.q1_pricing_summary),
        ("q6_forecast_revenue", relational.q6_forecast_revenue),
        ("q3_top_revenue_orders", relational.q3_top_revenue_orders),
        ("q5_local_supplier_volume", relational.q5_local_supplier_volume),
        ("q_distinct_segments", relational.q_distinct_segments),
        ("q_top_orders", relational.q_top_orders),
        ("q_customer_by_nation", relational.q_customer_by_nation),
        ("q_brand_volume", relational.q_brand_volume),
        ("q_events_hourly", relational.q_events_hourly),
        ("q_user_activity", relational.q_user_activity),
        ("q_events_stats", relational.q_events_stats),
        ("q_events_sessions", relational.q_events_sessions),
        ("q_events_sliding", relational.q_events_sliding),
        ("q_events_asof", relational.q_events_asof),
        ("q_events_median", relational.q_events_median),
        ("q_events_percentiles", relational.q_events_percentiles),
        ("q_events_first_n", relational.q_events_first_n),
        ("q_events_running", relational.q_events_running),
        ("q_events_distinct_users", relational.q_events_distinct_users),
        ("q_events_top_users", relational.q_events_top_users),
        ("q_events_pivot", relational.q_events_pivot),
        ("q_events_gap", relational.q_events_gap),
        ("q_revenue_rollup", relational.q_revenue_rollup),
        ("q_events_range", relational.q_events_range),
        ("q_customers_no_orders", relational.q_customers_no_orders),
        ("q_order_priority_count", relational.q_order_priority_count),
        ("q10_returned_revenue", relational.q10_returned_revenue),
        ("q17_small_quantity_revenue",
         relational.q17_small_quantity_revenue),
        ("q18_large_orders", relational.q18_large_orders),
        ("q_price_corr", relational.q_price_corr),
        ("q_price_histogram", relational.q_price_histogram),
        ("q_supplier_best", relational.q_supplier_best),
        ("q_events_json", relational.q_events_json),
        ("q_balance_buckets", relational.q_balance_buckets),
        ("q_events_late", relational.q_events_late),
        ("q_events_zscore", relational.q_events_zscore),
        ("q_events_funnel", relational.q_events_funnel),
        ("q_events_outliers", relational.q_events_outliers),
        ("q_integrity_check", relational.q_integrity_check),
        ("q_profile_lineitem", relational.q_profile_lineitem),
        ("q_events_moving_avg", relational.q_events_moving_avg),
        ("q_smb_join", relational.q_smb_join),
        # text / dedup / similarity (oracle-checked where SQL-expressible)
        ("doc_token_counts", corpus.doc_token_counts),
        ("doc_fingerprint", corpus.doc_fingerprint),
        ("doc_quality_sql", corpus.doc_quality_sql),
        ("dedup_exact", corpus.dedup_exact),
        ("similarity_topk", corpus.similarity_topk),
        ("emb_kmeans", corpus.emb_kmeans),
        ("doc_length_deciles", corpus.doc_length_deciles),
    ])
    # remaining kg_queries entries not named above keep registry coverage
    for name, fn in kg_queries.QUERIES.items():
        if name not in q:
            q[name] = fn
    # rows-only, dead last (justifications in pipelines/oracles.py docstring)
    _register([
        ("doc_bpe_merges", corpus.doc_bpe_merges),
        ("emb_pca", corpus.emb_pca),
        ("doc_pack_sequences", corpus.doc_pack_sequences),
        ("doc_approx_distinct", corpus.doc_approx_distinct),
        ("similarity_topk_ivf", corpus.similarity_topk_ivf),
        ("mm_image_features", corpus.mm_image_features),
    ])
    return q


def oracle_sql() -> dict[str, str]:
    from nexus_forge_ray.pipelines.oracles import ORACLES
    return dict(ORACLES)
