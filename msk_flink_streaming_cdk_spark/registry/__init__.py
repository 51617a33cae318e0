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

Round-11 rotation (the round-10 verdict's #1 item, prevalidated in
``tools/driver_sim_r11_prevalidate.log``): the window keeps the 4
reference queries, then takes the leading 46 keys of the round-10
``NEXT_TRANCHE`` verbatim — FIRST-EVER driver rows for the 6 round-10
additions (``dedup_suffix_duplicate_spans``,
``pipeline_strip_suffix_spans``, ``dq_k_anonymity_customers``,
``similarity_blas_topk``, ``dedup_prefix_filter_pairs``,
``dedup_span_floor_profile``), then the round-9 tranche leftover, the
remaining round-4-stale keys (single driver check, round 4), and the
oldest round-5-stale keys in staleness order (staleness computed from
the committed ``CORRECTNESS_r0*.json`` history).
``ROTATION_WINDOW`` pins the first ``ROTATION_WINDOW_SIZE`` keys
explicitly and a test asserts the ordering, so the planned rotation is
enforced by code, not a comment; the round-12 tranche (round-11
additions at its head, then the round-5 leftover, then the oldest
round-7-stale keys, in staleness order) is kept IN ORDER at the tail
of ``PRIORITY`` and holds a full 46-key window so the round-12
rotation is fully determined (and prevalidated in
``tools/driver_sim_r12_prevalidate.log``).
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
    # Round-10 NEXT_TRANCHE head, verbatim — FIRST-EVER driver rows
    # for the 6 round-10 additions, then the round-9 tranche leftover,
    # the remaining round-4-stale keys, and the oldest round-5-stale
    # keys.
    "dedup_suffix_duplicate_spans",
    "pipeline_strip_suffix_spans",
    "dq_k_anonymity_customers",
    "similarity_blas_topk",
    "dedup_prefix_filter_pairs",
    "dedup_span_floor_profile",
    # round-9 tranche leftover (window overflow; last driver row r4)
    "similarity_hard_negatives",
    "embedding_outlier_flags",
    "similarity_mmr_diversified",
    "timeseries_seasonal_residuals",
    "graph_label_propagation",
    "dq_ks_drift_by_source",
    "basket_pair_lift",
    "er_golden_records",
    "dedup_semantic_prune",
    # remaining round-4-stale keys (single driver check, round 4)
    "cohort_weekly_retention",
    "customer_rfm_segments",
    "similarity_ann_recall",
    "similarity_ivf_recall",
    "similarity_pq_ann_topk",
    "similarity_pq_recall",
    "text_gopher_quality_filter",
    "timeseries_interpolate_linear",
    "pipeline_strip_duplicate_passages",
    "text_quality_percentile_gate",
    "dedup_containment_pairs",
    "pipeline_near_dedup_keep_longest",
    # round-5-stale keys (last driver row round 5), registry order
    "json_bad_record_quarantine",
    "session_window_dynamic_gap",
    "scd2_user_value_history",
    "dq_orphan_foreign_keys",
    "approx_quantiles_audit",
    "cogrouped_activity_counts",
    "json_variant_extract",
    "chained_window_peak_counts",
    "asof_point_in_time_features",
    "window_rolling_median",
    "funnel_view_click_purchase",
    "winsorize_order_prices",
    "text_chunk_sliding",
    "text_contamination_8gram",
    "dedup_incremental_new_vs_corpus",
    "sketch_countmin_accuracy",
    "storage_zorder_events",
    "dedup_connected_components",
    "dedup_connected_components_star",]

# Next tranche (round 12): any round-11 additions are registered at
# the head of this list as they land, then the round-5-stale leftover
# (window overflow) — in staleness order derived from the committed
# CORRECTNESS_r0*.json history. Keeping them HERE (not just in a
# comment) makes the plan part of the ordered registry.
NEXT_TRANCHE: list[str] = [
    # round-11 additions (never driver-checked) — head of the
    # round-12 window per the rotation policy.
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
    "q16_supplier_variety",
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
