"""Import all query modules so registration side effects run.

After import, ``QUERIES``/``ORACLES`` are reordered so the keys named in
``PRIORITY`` come first (in that order), followed by every other
registered key in module registration order. External consumers — the
driver's fixed-size correctness window in particular — sample the
*leading* entries of ``queries()``, so the priority list is how we make
sure the newest / least-proven operators get a hard correctness signal
each round, while long-proven shapes rotate to the tail (they remain
fully covered by ``tests/test_reference_queries.py``, which checks ALL
oracle-backed queries).

Round-13 rotation (the round-12 verdict's #1 item, prevalidated in
``tools/driver_sim_r13_prevalidate.log``): the window keeps the 4
reference queries, then takes the leading 46 keys of the round-12
``NEXT_TRANCHE`` verbatim — FIRST-EVER driver rows for the five
round-12 additions (graph-search ANN topk/recall, incremental k-NN
merge, and both int8-LSH keys), then the round-11 window-overflow
leftover ``q16_supplier_variety``, the remaining round-7-stale keys
and the oldest round-8-stale keys in staleness order (staleness
computed from the committed ``CORRECTNESS_r0*.json`` history).
``ROTATION_WINDOW`` pins the first ``ROTATION_WINDOW_SIZE`` keys
explicitly and a test asserts the ordering, so the planned rotation is
enforced by code, not a comment; the round-14 tranche (round-13
additions at its head as they land, then the round-12 window-overflow
leftovers, the remaining round-8-stale keys in registry order, then
the oldest round-9-stale keys) is kept IN ORDER at the tail of
``PRIORITY`` and holds a full 46-key window so the round-14 rotation
is fully determined.
"""

from ._core import ORACLES, QUERIES, register

from . import reference_q  # noqa: E402,F401
from . import relational_q  # noqa: E402,F401
from . import llm_q  # noqa: E402,F401

ROTATION_WINDOW_SIZE = 50

# The driver-checked leading window for THIS round (first 50 keys).
ROTATION_WINDOW: list[str] = [
    # Reference pipeline queries (SURVEY §2 P*/A*/W*) — always checked.
    "q1_alerts_30s",
    "q1_alerts_daily",
    "q2_windowed_avg_60s",
    "q2_windowed_avg_hourly",
    # Round-12 NEXT_TRANCHE head, verbatim — FIRST-EVER driver rows
    # for the five round-12 additions, then the round-11
    # window-overflow leftover, then the remaining round-7-stale and
    # oldest round-8-stale keys in staleness order.
    "similarity_graph_search_topk",
    "similarity_graph_search_recall",
    "similarity_incremental_knn_merge",
    "similarity_int8_lsh_topk",
    "similarity_int8_lsh_recall",
    "q16_supplier_variety",
    "q21_waiting_suppliers",
    "sql_front_door_pipeline",
    "grouped_map_centered_balance",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q13_order_count_distribution",
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_excess_share_suppliers",
    "q22_dormant_rich_customers",
    "events_anomaly_mad",
    "orders_benford_audit",
    "events_markov_transitions",
    "events_top_paths_3step",
    "dedup_embedding_cosine_pairs",
    "similarity_lsh_ann_topk",
    "multimodal_frame_sample",
    "text_approx_topk_words",
    "text_pack_sequences",
    "sketch_hll_users_by_type",
    "sketch_theta_user_overlap",
    "join_full_outer_activity",
    "q5_region_revenue",
    "join_range_clicks_before_purchase",
    "sql_front_door_exists",
    "q10_returned_items",
    "q18_large_volume_orders",
    "not_in_subquery_customers",
    "profile_key_skew_orders",
    "window_share_of_segment",
    "profile_table_stats_orders",
    "window_ntile_quartiles",
    "window_first_last_frame",
    "scalar_try_arithmetic",
    "orders_abc_pareto_classes",
    "text_token_counts",
]

# Next tranche (round 14): any round-13 additions are registered at
# the head of this list as they land, then the round-12
# window-overflow leftovers (round-8-stale), the remaining
# round-8-stale keys in registry order, then the oldest round-9-stale
# keys — staleness derived from the committed CORRECTNESS_r0*.json
# history. Keeping them HERE (not just in a comment) makes the plan
# part of the ordered registry.
NEXT_TRANCHE: list[str] = [
    # round-13 additions (never driver-checked) — head of the
    # round-14 window per the rotation policy.
    "similarity_int8_ivf_topk",
    "similarity_int8_ivf_recall",
    "similarity_int8_pq_topk",
    "similarity_int8_pq_recall",
    "dedup_int8_embedding_pairs",
    "dedup_embedding_incremental",
    "similarity_knn_forget_compact",
    # round-12 window-overflow leftovers (round-8-stale, pinned order)
    "text_quality_scores",
    "text_language_id",
    "text_fingerprint_md5",
    "text_rolling_fingerprints",
    "text_stratified_sample",
    "text_repetition_ratio",
    # remaining round-8-stale keys (last driver row round 8),
    # registry order
    "text_doc_frequency_idf",
    "embedding_label_centroids",
    "text_top_tfidf_term_per_doc",
    "dedup_exact_text",
    "dedup_ngram_jaccard_pairs",
    "dedup_incremental_components",
    "dedup_cluster_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "embedding_matryoshka_recall",
    "pipeline_admission_decisions",
    "text_dsir_importance_weights",
    "multimodal_resize_dims",
    "text_duplicate_passages",
    "embedding_norm_stats",
    "text_sample_per_source",
    "text_bigram_perplexity",
    "embedding_kmeans_lloyd2",
    "text_rolling_md5_fingerprints",
    "dq_split_leakage",
    "text_seeded_shuffle",
    "text_char_entropy",
    "multimodal_audio_segments",
    # oldest round-9-stale keys (last driver row round 9),
    # registry order
    "agg_pricing_summary",
    "distinct_suppliers_per_brand",
    "rollup_status_priority",
    "cube_status_priority",
    "case_when_price_buckets",
    "join_orders_per_segment",
    "q3_shipping_priority",
    "join_left_order_counts",
    "join_semi_open_order_customers",
    "join_anti_customers_without_orders",
    "join_broadcast_region_suppliers",
    "window_top3_orders_per_customer",
    "window_running_total",
    "window_lag_days_between_orders",
    "window_rank_functions",
    "top20_orders_by_price",
    "setop_union_active_or_rich",
    "setop_intersect_active_and_rich",
    "agg_mode_disc_percentiles",
    "window_range_frame_avg30d",
    "window_percent_rank_cume_dist",
    "agg_monthly_revenue",
    "histogram_price_buckets",
]

PRIORITY: list[str] = ROTATION_WINDOW + NEXT_TRANCHE


def _reorder() -> None:
    ordered = [k for k in PRIORITY if k in QUERIES]
    ordered += [k for k in QUERIES if k not in set(ordered)]
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        for key in ordered:
            if key in snapshot:
                mapping[key] = snapshot[key]


_reorder()

__all__ = [
    "QUERIES",
    "ORACLES",
    "register",
    "PRIORITY",
    "ROTATION_WINDOW",
    "ROTATION_WINDOW_SIZE",
    "NEXT_TRANCHE",
]
