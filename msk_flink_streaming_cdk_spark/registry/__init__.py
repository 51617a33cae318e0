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

Round-8 rotation (the round-7 verdict's #1 item): the window keeps the
4 reference queries, re-proves the 3 decimal-fix rows one more round
(``window_share_of_segment``, ``q10_returned_items``,
``q18_large_volume_orders``), then gives FIRST-EVER driver rows to all
28 keys of the round-7 ``NEXT_TRANCHE`` (every round-6 operator plus
the older never-checked tail), and fills the remaining 15 slots with
the STALEST previously-checked keys (last driver row in round 1 or
round 3, fewest total rows). ``ROTATION_WINDOW`` pins the first
``ROTATION_WINDOW_SIZE`` keys explicitly and a test asserts the
ordering, so the planned rotation is enforced by code, not a comment;
the next-stalest keys are kept IN ORDER at the tail of ``PRIORITY`` as
the round-9 tranche.
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
    # Round-7 decimal-fix rows — hash-green in r7, kept one more round
    # of re-proof per the round-7 verdict's rotation plan.
    "window_share_of_segment",
    "q10_returned_items",
    "q18_large_volume_orders",
    # Round-7 NEXT_TRANCHE, all 28, in planned order — FIRST-EVER
    # driver rows for every round-6 operator plus the older tail.
    "pipeline_admission_decisions",
    "text_dsir_importance_weights",
    "embedding_matryoshka_recall",
    "dedup_incremental_components",
    "dq_split_leakage",
    "orders_abc_pareto_classes",
    "dedup_cluster_stats",
    "not_in_subquery_customers",
    "profile_key_skew_orders",
    "profile_table_stats_orders",
    "window_ntile_quartiles",
    "window_first_last_frame",
    "scalar_try_arithmetic",
    "text_stratified_sample",
    "text_repetition_ratio",
    "text_doc_frequency_idf",
    "embedding_label_centroids",
    "text_top_tfidf_term_per_doc",
    "multimodal_resize_dims",
    "text_duplicate_passages",
    "embedding_norm_stats",
    "text_sample_per_source",
    "text_bigram_perplexity",
    "embedding_kmeans_lloyd2",
    "text_rolling_md5_fingerprints",
    "text_seeded_shuffle",
    "text_char_entropy",
    "multimodal_audio_segments",
    # Stalest previously-checked keys (last driver row r1 or r3) —
    # refresh their signal after 5+ rounds without one.
    "sql_front_door_exists",
    "text_token_counts",
    "text_quality_scores",
    "text_language_id",
    "text_fingerprint_md5",
    "text_rolling_fingerprints",
    "dedup_exact_text",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "sketch_hll_users_by_type",
    "sketch_theta_user_overlap",
    "join_full_outer_activity",
    "q5_region_revenue",
    "join_range_clicks_before_purchase",]

# Next tranche (round 9): round-8 additions first (never checked),
# then the next-stalest previously-checked keys (last driver row
# round 3), in staleness order. Keeping them HERE (not just in a
# comment) makes the plan part of the ordered registry.
NEXT_TRANCHE: list[str] = [
    "text_cdc_duplicate_chunks",
    "text_bpe_learn_merges",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "graph_kcore_mirror_clusters",
    "json_variant_typed_extract",
    "text_ngram_heaps_curve",
    "dq_expectation_suite",
    "timeseries_lttb_downsample",
    "sql_recursive_assembly_rollup",
    "lateral_top2_suppliers_per_nation",
    "text_naive_bayes_lang",
    "text_curriculum_stages",
    "multimodal_arrow_byte_stats",
    "text_source_cap_rebalance",
    "agg_regr_price_vs_qty",
    "orders_cohort_ltv",
    "dq_schema_drift_events",
    "part_skyline_price_size",
    "dedup_edit_distance1_names",
    "text_token_fertility_by_lang",
    "embedding_int8_quant_error",
    "agg_mode_disc_percentiles",
    "window_range_frame_avg30d",
    "window_percent_rank_cume_dist",
    "agg_monthly_revenue",
    "histogram_price_buckets",
    "scalar_null_handling",
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
    "setop_except_rich_without_open_orders",
    "setop_union_all_order_events",
    "explode_top_words",
    "scalar_string_functions",
    "scalar_date_math",]

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
