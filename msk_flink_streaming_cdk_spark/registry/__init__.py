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

Round-9 rotation (the round-8 verdict's #1 item): the window keeps the
4 reference queries, then takes the leading 46 keys of the round-8
``NEXT_TRANCHE`` verbatim — FIRST-EVER driver rows for all 23 round-8
operators (recursive CTE, expectation suite, naive Bayes, LTTB, BPE
merge learning, winnowing, CDC chunking, k-core, skyline, FastSS,
VARIANT, cohort LTV, drift canary, Heaps curve, fertility, int8 quant
audit, curriculum, source cap, mapInArrow, LATERAL, regr/mode aggs)
followed by the next-stalest round-3 keys in planned order.
``ROTATION_WINDOW`` pins the first ``ROTATION_WINDOW_SIZE`` keys
explicitly and a test asserts the ordering, so the planned rotation is
enforced by code, not a comment; the round-10 tranche (leftover round-8
tail + remaining round-3 keys + oldest round-4 single-check keys) is
kept IN ORDER at the tail of ``PRIORITY``.
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
    # Round-8 NEXT_TRANCHE head, verbatim — FIRST-EVER driver rows for
    # all 23 round-8 operators, then the next-stalest round-3 keys.
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
    "setop_intersect_active_and_rich",]

# Next tranche (round 10): any round-9 additions are registered at the
# head of this list as they land, then the round-8 tranche leftover,
# then the remaining round-3 keys, then the oldest round-4
# single-check keys, in staleness order. Keeping them HERE (not just
# in a comment) makes the plan part of the ordered registry.
NEXT_TRANCHE: list[str] = [
    # round-9 additions (never driver-checked)
    "text_repeated_ngram_loops",
    "text_bpe_encode_tokens",
    "text_zipf_rank_slope",
    "dq_mad_outlier_docs",
    "dq_psi_doclen_by_source",
    # round-8 tranche leftover (window overflow)
    "setop_except_rich_without_open_orders",
    "setop_union_all_order_events",
    "explode_top_words",
    "scalar_string_functions",
    "scalar_date_math",
    # remaining round-3 keys (last driver row round 3)
    "json_extract_props",
    "pivot_event_type_counts",
    "sliding_window_event_counts",
    "session_window_user_sessions",
    "grouped_map_price_trend",
    "approx_distinct_parts",
    "approx_quantiles_prices",
    "asof_join_prev_signup",
    "stats_by_returnflag",
    "grouping_sets_status_priority",
    "array_agg_order_keys",
    "in_subquery_suppliers",
    "scalar_subquery_price_ratio",
    # oldest round-4 single-check keys, in round-4 window order
    "text_contamination_bloom",
    "text_bm25_topk",
    "embedding_pca_project",
    "quality_logistic_fit",
    "text_ngram_novelty",
    "text_prefix_boilerplate_groups",
    "dedup_graph_triangle_count",
    "text_temperature_mixture",
    "text_zscore_by_source",
    "histogram_equidepth_prices",
    "dedup_graph_pagerank",
    "timeseries_ewma_kernel",
    "timeseries_ohlc_hourly",
    "timeseries_rolling_zscore",
    "text_weighted_sample_topk",
    "dq_column_profile",
    "dq_key_skew_profile",
    "pipeline_near_dedup_keep_central",
    "text_bpe_pair_counts",
    "attribution_last_touch",
    "text_pmi_pairs",
    "dq_gini_doclen_by_source",
    "dq_duplicate_rate_by_source",
    "similarity_hard_negatives",
    "embedding_outlier_flags",
    "similarity_mmr_diversified",
    "timeseries_seasonal_residuals",
    "graph_label_propagation",
    "dq_ks_drift_by_source",
    "basket_pair_lift",
    "er_golden_records",
    "dedup_semantic_prune",]

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
