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

Round-14 rotation (the round-13 verdict's #1 item, prevalidated at
current HEAD in ``tools/driver_sim_r14_window.log``): the window keeps
the 4 reference queries, then takes the leading 46 keys of the
round-13 ``NEXT_TRANCHE`` verbatim — FIRST-EVER driver rows for all
seven round-13 additions (int8-IVF topk/recall, int8-PQ topk/recall,
int8 embedding dedup, incremental embedding dedup, k-NN
forget-compaction), then the round-12 window-overflow leftovers, the
remaining round-8-stale keys in registry order, then the oldest
round-9-stale keys (staleness computed from the committed
``CORRECTNESS_r0*.json`` history). ``ROTATION_WINDOW`` pins the first
``ROTATION_WINDOW_SIZE`` keys explicitly and a test asserts the
ordering, so the planned rotation is enforced by code, not a comment;
the round-15 tranche (round-14 additions at its head as they land,
then the round-13 window-overflow leftovers, the remaining
round-9-stale keys in registry order, then the oldest round-10-stale
keys) is kept IN ORDER at the tail of ``PRIORITY`` and holds a full
46-key window so the round-15 rotation is fully determined.
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
    # Round-13 NEXT_TRANCHE head, verbatim — FIRST-EVER driver rows
    # for the seven round-13 additions, then the round-12
    # window-overflow leftovers, the remaining round-8-stale keys and
    # the oldest round-9-stale keys in staleness order.
    "similarity_int8_ivf_topk",
    "similarity_int8_ivf_recall",
    "similarity_int8_pq_topk",
    "similarity_int8_pq_recall",
    "dedup_int8_embedding_pairs",
    "dedup_embedding_incremental",
    "similarity_knn_forget_compact",
    "text_quality_scores",
    "text_language_id",
    "text_fingerprint_md5",
    "text_rolling_fingerprints",
    "text_stratified_sample",
    "text_repetition_ratio",
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
]

# Next tranche (round 15): any round-14 additions are registered at
# the head of this list as they land, then the round-13
# window-overflow leftovers (round-9-stale), the remaining
# round-9-stale keys in registry order, then the oldest
# round-10-stale keys — staleness derived from the committed
# CORRECTNESS_r0*.json history. Keeping them HERE (not just in a
# comment) makes the plan part of the ordered registry.
NEXT_TRANCHE: list[str] = [
    # round-14 additions (never driver-checked) — head of the
    # round-15 window per the rotation policy.
    "similarity_int8_ivfpq_topk",
    "similarity_int8_ivfpq_recall",
    "similarity_graph_search_int8_topk",
    "similarity_graph_search_int8_recall",
    "similarity_int8_ivfpq_incremental",
    "similarity_int8_ivfpq_drift",
    "similarity_int8_knn_merge",
    "similarity_int8_knn_forget",
    # round-13 window-overflow leftovers (round-9-stale, pinned order)
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
    # remaining round-9-stale keys (last driver row round 9),
    # registry order
    "scalar_null_handling",
    "orders_cohort_ltv",
    "dq_schema_drift_events",
    "part_skyline_price_size",
    "dedup_edit_distance1_names",
    "agg_regr_price_vs_qty",
    "json_variant_typed_extract",
    "dq_expectation_suite",
    "sql_recursive_assembly_rollup",
    "lateral_top2_suppliers_per_nation",
    "multimodal_arrow_byte_stats",
    "text_token_fertility_by_lang",
    "embedding_int8_quant_error",
    "text_curriculum_stages",
    "text_source_cap_rebalance",
    "text_cdc_duplicate_chunks",
    "text_bpe_learn_merges",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "graph_kcore_mirror_clusters",
    "text_ngram_heaps_curve",
    "timeseries_lttb_downsample",
    "text_naive_bayes_lang",
    # oldest round-10-stale keys (last driver row round 10),
    # registry order
    "setop_except_rich_without_open_orders",
    "setop_union_all_order_events",
    "explode_top_words",
    "scalar_string_functions",
    "scalar_date_math",
    "json_extract_props",
    "pivot_event_type_counts",
    "sliding_window_event_counts",
    "session_window_user_sessions",
    "grouped_map_price_trend",
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
