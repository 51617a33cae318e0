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

Round-15 rotation (the round-14 verdict's #1 item, prevalidated at
round-14 HEAD in ``tools/driver_sim_r15_prevalidate.log``, 50/50):
the window keeps the 4 reference queries, then takes the leading 46
keys of the round-14 ``NEXT_TRANCHE`` verbatim — FIRST-EVER driver
rows for all eight round-14 int8-lifecycle additions (IVF-PQ
topk/recall, graph-search topk/recall, encode-on-ingest + drift,
hash-checked k-NN merge/forget), then the round-13 window-overflow
leftovers, the remaining round-9-stale keys in registry order, then
the oldest round-10-stale keys (staleness computed from the committed
``CORRECTNESS_r0*.json`` history). ``ROTATION_WINDOW`` pins the first
``ROTATION_WINDOW_SIZE`` keys explicitly and a test asserts the
ordering, so the planned rotation is enforced by code, not a comment;
the round-16 tranche (round-15 additions at its head as they land,
then the round-14 window-overflow leftovers and the remaining
round-10-stale keys in registry order) is kept IN ORDER at the tail
of ``PRIORITY`` and holds a full 46-key window so the round-16
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
    # Round-14 NEXT_TRANCHE head, verbatim — FIRST-EVER driver rows
    # for the eight round-14 int8-lifecycle additions, then the
    # round-13 window-overflow leftovers, the remaining round-9-stale
    # keys and the oldest round-10-stale keys in staleness order.
    "similarity_int8_ivfpq_topk",
    "similarity_int8_ivfpq_recall",
    "similarity_graph_search_int8_topk",
    "similarity_graph_search_int8_recall",
    "similarity_int8_ivfpq_incremental",
    "similarity_int8_ivfpq_drift",
    "similarity_int8_knn_merge",
    "similarity_int8_knn_forget",
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
    "setop_except_rich_without_open_orders",
    "setop_union_all_order_events",
]

# Next tranche (round 16): any round-15 additions are registered at
# the head of this list as they land, then the round-14
# window-overflow leftovers (round-10-stale), then the remaining
# round-10-stale keys in registry order — staleness derived from the
# committed CORRECTNESS_r0*.json history. Keeping them HERE (not
# just in a comment) makes the plan part of the ordered registry.
NEXT_TRANCHE: list[str] = [
    # round-15 additions (never driver-checked) — head of the
    # round-16 window per the rotation policy.
    "similarity_clustered_fixture_stats",
    "similarity_clustered_ivf_recall",
    "similarity_clustered_ivfpq_recall",
    "similarity_clustered_graph_recall",
    "text_html_extract",
    "embedding_int_pca_project",
    # round-14 window-overflow leftovers (round-10-stale, pinned order)
    "explode_top_words",
    "scalar_string_functions",
    "scalar_date_math",
    "json_extract_props",
    "pivot_event_type_counts",
    "sliding_window_event_counts",
    "session_window_user_sessions",
    "grouped_map_price_trend",
    # remaining round-10-stale keys (last driver row round 10),
    # registry order
    "approx_distinct_parts",
    "approx_quantiles_prices",
    "asof_join_prev_signup",
    "stats_by_returnflag",
    "grouping_sets_status_priority",
    "array_agg_order_keys",
    "in_subquery_suppliers",
    "scalar_subquery_price_ratio",
    "histogram_equidepth_prices",
    "dq_column_profile",
    "dq_key_skew_profile",
    "attribution_last_touch",
    "text_contamination_bloom",
    "text_bm25_topk",
    "embedding_pca_project",
    "text_zscore_by_source",
    "text_temperature_mixture",
    "dedup_graph_triangle_count",
    "text_ngram_novelty",
    "text_prefix_boilerplate_groups",
    "quality_logistic_fit",
    "dedup_graph_pagerank",
    "pipeline_near_dedup_keep_central",
    "timeseries_ewma_kernel",
    "timeseries_ohlc_hourly",
    "timeseries_rolling_zscore",
    "text_weighted_sample_topk",
    "text_bpe_pair_counts",
    "text_pmi_pairs",
    "dq_gini_doclen_by_source",
    "dq_duplicate_rate_by_source",
    "text_repeated_ngram_loops",
    "text_zipf_rank_slope",
    "dq_mad_outlier_docs",
    "text_bpe_encode_tokens",
    "dq_psi_doclen_by_source",
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
