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
"""

from ._core import ORACLES, QUERIES, register

from . import reference_q  # noqa: E402,F401
from . import relational_q  # noqa: E402,F401
from . import llm_q  # noqa: E402,F401

# Leading window: reference queries first (always), then operators that
# have not yet had a driver-visible correctness row (round-3 and round-4
# additions, recall pins, LLM-pipeline ops), newest first.
PRIORITY: list[str] = [
    # Reference pipeline queries (SURVEY §2 P*/A*/W*) — always checked.
    "q1_alerts_30s",
    "q1_alerts_daily",
    "q2_windowed_avg_60s",
    "q2_windowed_avg_hourly",
    # Round-4 additions.
    "text_contamination_bloom",
    "text_token_budget_pack",
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
    "text_inverted_index",
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
    # Round-3 additions (never driver-checked before round 4).
    "dedup_semantic_prune",
    "similarity_pq_ann_topk",
    "similarity_pq_recall",
    "text_gopher_quality_filter",
    "dedup_containment_pairs",
    "timeseries_interpolate_linear",
    "pipeline_strip_duplicate_passages",
    "text_quality_percentile_gate",
    "cohort_weekly_retention",
    "customer_rfm_segments",
    "pipeline_near_dedup_keep_longest",
    # Accuracy pins for the ANN/dedup scale paths (rows-only checks).
    "similarity_ivf_recall",
    "similarity_ann_recall",
    "dedup_minhash_recall",
    # Simple single-aggregate round-4 shapes (demoted below the
    # VERDICT-named round-3 set + recall pins so those keep a
    # driver-checked slot; these stay pytest-oracle-green regardless).
    "timeseries_quantile_bars",
    "dq_event_lag_by_type",
    "winsorize_order_prices",
    # LLM-pipeline operators without a prior driver row.
    "dedup_connected_components",
    "dedup_connected_components_star",
    "similarity_cosine_topk",
    "similarity_ivf_ann_topk",
    "pipeline_clean_corpus",
    "pipeline_near_dedup_corpus",
    "dedup_fuzzy_name_pairs",
    "funnel_view_click_purchase",
    "embedding_kmeans_assign",
    "embedding_quantize_int8",
    "text_contamination_8gram",
    "text_redact_pii",
    "text_pack_sequences",
    "text_chunk_sliding",
    "text_split_assign",
    "text_token_balanced_mixture",
    "pipeline_training_manifest",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    # Relational/streaming shapes without a prior driver row (the rest
    # of this round-2-era tail — json_variant_extract,
    # dq_orphan_foreign_keys, cogrouped_activity_counts,
    # udtf_sentence_split, session_window_dynamic_gap,
    # chained_window_peak_counts — rotates into the window next round;
    # all remain pytest-oracle-green every round).
    "scd2_user_value_history",
    "asof_point_in_time_features",
    "window_rolling_median",
]


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

__all__ = ["QUERIES", "ORACLES", "register", "PRIORITY"]
