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

Round-12 rotation (the round-11 verdict's #1 item, prevalidated in
``tools/driver_sim_r12_prevalidate.log``): the window keeps the 4
reference queries, then takes the leading 46 keys of the round-11
``NEXT_TRANCHE`` verbatim — FIRST-EVER driver row for the round-11
addition ``similarity_nnd_recall``, then the round-5-stale leftover
keys (last driver row round 5) in registry order, and the oldest
round-7-stale keys in staleness order (staleness computed from the
committed ``CORRECTNESS_r0*.json`` history).
``ROTATION_WINDOW`` pins the first ``ROTATION_WINDOW_SIZE`` keys
explicitly and a test asserts the ordering, so the planned rotation is
enforced by code, not a comment; the round-13 tranche (round-12
additions at its head, then the round-11 window-overflow leftover
``q16_supplier_variety``, then the remaining round-7-stale and oldest
round-8-stale keys, in staleness order) is kept IN ORDER at the tail
of ``PRIORITY`` and holds a full 46-key window so the round-13
rotation is fully determined.
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
    # Round-11 NEXT_TRANCHE head, verbatim — FIRST-EVER driver row for
    # the round-11 addition, then the round-5-stale leftover (window
    # overflow; last driver row round 5) in registry order, then the
    # oldest round-7-stale keys in staleness order.
    "similarity_nnd_recall",
    # round-5-stale leftover (window overflow), registry order
    "similarity_cosine_topk",
    "similarity_ivf_ann_topk",
    "pipeline_clean_corpus",
    "pipeline_near_dedup_corpus",
    "dedup_minhash_recall",
    "pipeline_forget_expand",
    "dedup_minhash_estimate_audit",
    "dedup_simhash_recall",
    "dedup_embedding_recall",
    "multimodal_feature_extract",
    "embedding_kmeans_assign",
    "dedup_fuzzy_name_pairs",
    "text_redact_pii",
    "embedding_quantize_int8",
    "text_split_assign",
    "text_token_balanced_mixture",
    "udtf_sentence_split",
    "pipeline_training_manifest",
    "text_token_budget_pack",
    "retrieval_hybrid_rrf",
    "embedding_pca_variance_audit",
    "quality_logistic_score",
    "text_inverted_index",
    "dq_source_overlap_matrix",
    "timeseries_quantile_bars",
    "dq_event_lag_by_type",
    # round-7-stale keys (last driver row round 7), staleness order
    "correlated_subquery_above_avg",
    "unpivot_lineitem_measures",
    "agg_max_by_priciest_item",
    "agg_listagg_nations_per_region",
    "agg_exact_percentiles",
    "timeseries_gapfill_daily",
    "sample_hash_orders",
    "cross_join_region_pairs",
    "union_by_name_balances",
    "map_event_type_counts",
    "dedup_latest_event_per_user",
    "join_salted_skew_orders",
    "outlier_orders_iqr",
    "agg_time_weighted_value",
    "asof_join_next_error",
    "q4_order_priority",
    "q7_volume_shipping",
    "q12_urgency_by_linestatus",
    "q14_promo_revenue",
]

# Next tranche (round 13): any round-12 additions are registered at
# the head of this list as they land, then the round-11
# window-overflow leftover, then the remaining round-7-stale and
# oldest round-8-stale keys — in staleness order derived from the
# committed CORRECTNESS_r0*.json history. Keeping them HERE (not just
# in a comment) makes the plan part of the ordered registry.
NEXT_TRANCHE: list[str] = [
    # round-12 additions (never driver-checked) — head of the
    # round-13 window per the rotation policy.
    "similarity_graph_search_topk",
    "similarity_graph_search_recall",
    "similarity_incremental_knn_merge",
    "similarity_int8_lsh_topk",
    "similarity_int8_lsh_recall",
    # round-11 window-overflow leftover
    "q16_supplier_variety",
    # remaining round-7-stale keys (last driver row round 7),
    # staleness order
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
    # oldest round-8-stale keys (last driver row round 8),
    # staleness order
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
    "text_quality_scores",
    "text_language_id",
    "text_fingerprint_md5",
    "text_rolling_fingerprints",
    "text_stratified_sample",
    "text_repetition_ratio",
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
