"""Oracle-checked relational pipelines vs DuckDB on sf0.001."""

import pytest

from nexus_forge_ray.pipelines import corpus, relational
from nexus_forge_ray.pipelines.oracles import ORACLES

from .helpers import assert_frames_match

CASES = {
    "q1_pricing_summary": relational.q1_pricing_summary,
    "q6_forecast_revenue": relational.q6_forecast_revenue,
    "q3_top_revenue_orders": relational.q3_top_revenue_orders,
    "q5_local_supplier_volume": relational.q5_local_supplier_volume,
    "q_distinct_segments": relational.q_distinct_segments,
    "q_top_orders": relational.q_top_orders,
    "q_customer_by_nation": relational.q_customer_by_nation,
    "q_brand_volume": relational.q_brand_volume,
    "q_events_hourly": relational.q_events_hourly,
    "q_user_activity": relational.q_user_activity,
    "doc_token_counts": corpus.doc_token_counts,
    "doc_fingerprint": corpus.doc_fingerprint,
    "doc_quality_sql": corpus.doc_quality_sql,
    "dedup_exact": corpus.dedup_exact,
    "similarity_topk": corpus.similarity_topk,
    "q_events_stats": relational.q_events_stats,
    "q_events_sessions": relational.q_events_sessions,
    "q_customers_no_orders": relational.q_customers_no_orders,
    "q_order_priority_count": relational.q_order_priority_count,
    "q10_returned_revenue": relational.q10_returned_revenue,
    "q17_small_quantity_revenue": relational.q17_small_quantity_revenue,
    "q18_large_orders": relational.q18_large_orders,
    "q_price_corr": relational.q_price_corr,
    "q_price_histogram": relational.q_price_histogram,
    "q_supplier_best": relational.q_supplier_best,
    "q_events_json": relational.q_events_json,
    "q_balance_buckets": relational.q_balance_buckets,
    "q_events_late": relational.q_events_late,
    "q_events_zscore": relational.q_events_zscore,
    "q_events_funnel": relational.q_events_funnel,
    "doc_sample": corpus.doc_sample,
    "doc_sample_stratified": corpus.doc_sample_stratified,
    "doc_unigram_logprob": corpus.doc_unigram_logprob,
    "doc_sample_per_lang": corpus.doc_sample_per_lang,
    "doc_bigrams": corpus.doc_bigrams,
    "q_es_date_histogram": corpus.q_es_date_histogram,
    "q_events_percentiles": relational.q_events_percentiles,
    "q_events_first_n": relational.q_events_first_n,
    "emb_kmeans": corpus.emb_kmeans,
    "q_events_outliers": relational.q_events_outliers,
    "q_integrity_check": relational.q_integrity_check,
    "doc_length_deciles": corpus.doc_length_deciles,
    "q_profile_lineitem": relational.q_profile_lineitem,
    "q_events_moving_avg": relational.q_events_moving_avg,
    "q_smb_join": relational.q_smb_join,
    "doc_dedup_incremental": corpus.doc_dedup_incremental,
    "q_es_range_agg": corpus.q_es_range_agg,
    "q_es_stats_agg": corpus.q_es_stats_agg,
    "doc_splits": corpus.doc_splits,
    "doc_host_cap": corpus.doc_host_cap,
    "doc_url_normalize": corpus.doc_url_normalize,
    "doc_snapshot_diff": corpus.doc_snapshot_diff,
    "q_es_top_hits": corpus.q_es_top_hits,
    "q_es_search_page": corpus.q_es_search_page,
    "emb_class_centroids": corpus.emb_class_centroids,
    "emb_nearest_centroid": corpus.emb_nearest_centroid,
    "emb_knn_predict": corpus.emb_knn_predict,
    "emb_centroid_confusion": corpus.emb_centroid_confusion,
    "doc_classifier_pr": corpus.doc_classifier_pr,
    "q_events_retention": relational.q_events_retention,
    "doc_collocations": corpus.doc_collocations,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_query_matches_oracle(name, duck, sf_dir):
    got = CASES[name](sf_dir)
    want = duck.sql(ORACLES[name]).df()
    assert_frames_match(got, want, tol=1e-4)


def test_smart_join_paths_agree(ray_session, sf_dir):
    """Broadcast and bucketed paths produce identical rows."""
    import ray.data

    from nexus_forge_ray.ops.joins import smart_join
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"]) \
        .map_batches(lambda df: df.rename(columns={"c_custkey": "o_custkey"}),
                     batch_format="pandas")
    a = smart_join(orders, cust, "o_custkey",
                   broadcast_threshold=10**9).to_pandas()
    b = smart_join(orders, cust, "o_custkey", broadcast_threshold=0,
                   lcols=["o_orderkey", "o_custkey"],
                   rcols=["o_custkey", "c_nationkey"]).to_pandas()
    key = ["o_orderkey", "o_custkey", "c_nationkey"]
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_es_range_agg_empty_range_with_stats(ray_session):
    """Empty ranges must come back with doc_count 0 and null stats, not an
    IntCastingNaNError (ES returns every range)."""
    import pandas as pd
    import ray.data

    from nexus_forge_ray.forge import KnowledgeGraphForge
    ds = ray.data.from_pandas(pd.DataFrame({"v": [1.0, 2.0, 3.0]}))
    body = {"aggs": {"r": {
        "range": {"field": "v",
                  "ranges": [{"to": 10}, {"from": 100, "to": 200}]},
        "aggs": {"s": {"stats": {"field": "v"}}}}}}
    out = KnowledgeGraphForge().elastic(body, data=ds)
    empty = out[out["key"] == "100-200"].iloc[0]
    assert empty["doc_count"] == 0 and empty["s_count"] == 0
    assert empty["s_sum"] == 0.0 and pd.isna(empty["s_avg"])
    full = out[out["key"] == "*-10"].iloc[0]
    assert full["s_count"] == 3 and full["s_sum"] == 6.0


def test_orphan_count_broadcast_and_partitioned_paths_agree(ray_session):
    import pandas as pd
    import ray.data

    from nexus_forge_ray.pipelines.relational import orphan_count
    fact = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2, 3, 5, 8, 8, 8, 13]})).repartition(3)
    dim = ray.data.from_pandas(pd.DataFrame(
        {"d": [1, 2, 3, 4]})).repartition(2)
    # orphans: 5, 8x3, 13 -> 5 rows
    bc = orphan_count(fact, "k", dim, "d", broadcast_cap=1_000)
    part = orphan_count(fact, "k", dim, "d", broadcast_cap=0)
    assert bc == part == 5
    # empty dim: every fact row is an orphan on both paths
    empty = ray.data.from_pandas(pd.DataFrame({"d": pd.Series(dtype="int64")}))
    assert orphan_count(fact, "k", empty, "d", broadcast_cap=1_000) == 9
    assert orphan_count(fact, "k", empty, "d", broadcast_cap=0) == 9
