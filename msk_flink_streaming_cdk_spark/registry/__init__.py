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
# Round-16 policy (VERDICT r15 #3/#4): FRONT-LOAD every key this
# optimization round's diff touches (the k-NN audit scored-frame
# sharing, the CC paired-probe rewrite and its consumers, the
# incremental-dedup hybrid, the RFM boundary rewrite, the
# dq_expectation_suite rule-7 marker) plus every round-15-touched key
# the r15 window missed (the persist sweep, scalar_try_arithmetic,
# the minhash/prefix/containment persists, the IVF-PQ fusion's
# clustered key, the round-15 additions) — so every semantic-adjacent
# change of the last two rounds gets a driver oracle row this round.
ROTATION_WINDOW: list[str] = [
    # Reference pipeline queries (SURVEY §2 P*/A*/W*) — always checked.
    "q1_alerts_30s",
    "q1_alerts_daily",
    "q2_windowed_avg_60s",
    "q2_windowed_avg_hourly",
    # --- round-16 touched keys ---
    "similarity_int8_knn_forget",
    "similarity_knn_forget_compact",
    "similarity_incremental_knn_merge",
    "pipeline_near_dedup_keep_central",
    "pipeline_near_dedup_keep_longest",
    "dedup_incremental_new_vs_corpus",
    "customer_rfm_segments",
    "dq_expectation_suite",
    "dedup_connected_components",
    "dedup_incremental_components",
    "dedup_cluster_stats",
    "pipeline_forget_expand",
    "pipeline_admission_decisions",
    "dq_split_leakage",
    "er_golden_records",
    # --- round-15 touched, not in the r15 window ---
    "scalar_try_arithmetic",
    "quality_logistic_fit",
    "text_pmi_pairs",
    "text_bigram_perplexity",
    "text_bm25_topk",
    "retrieval_hybrid_rrf",
    "text_temperature_mixture",
    "dq_source_overlap_matrix",
    "sketch_hll_users_by_type",
    "embedding_kmeans_lloyd2",
    "dedup_prefix_filter_pairs",
    "dedup_containment_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_recall",
    "dedup_minhash_estimate_audit",
    "similarity_clustered_ivfpq_recall",
    # --- round-15 additions (never driver-checked) ---
    "similarity_clustered_fixture_stats",
    "similarity_clustered_ivf_recall",
    "similarity_clustered_graph_recall",
    "text_html_extract",
    "embedding_int_pca_project",
    # --- round-14 window-overflow leftovers (oldest-stale) ---
    "explode_top_words",
    "scalar_string_functions",
    "scalar_date_math",
    "json_extract_props",
    "pivot_event_type_counts",
    "sliding_window_event_counts",
    "session_window_user_sessions",
    "grouped_map_price_trend",
    "approx_distinct_parts",
    "approx_quantiles_prices",
]

# Next tranche (round 17): the round-16 window-overflow leftovers
# (the former tranche's stale tail, pinned order), then the remaining
# oldest-stale keys in registry order — staleness derived from the
# committed CORRECTNESS_r0*.json history. Keeping them HERE (not
# just in a comment) makes the plan part of the ordered registry.
NEXT_TRANCHE: list[str] = [
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
    "embedding_pca_project",
    "text_zscore_by_source",
    "dedup_graph_triangle_count",
    "text_ngram_novelty",
    "text_prefix_boilerplate_groups",
    "dedup_graph_pagerank",
    "timeseries_ewma_kernel",
    "timeseries_ohlc_hourly",
    "timeseries_rolling_zscore",
    "text_weighted_sample_topk",
    "text_bpe_pair_counts",
    "dq_gini_doclen_by_source",
    "dq_duplicate_rate_by_source",
    "text_repeated_ngram_loops",
    "text_zipf_rank_slope",
    "dq_mad_outlier_docs",
    "text_bpe_encode_tokens",
    "dq_psi_doclen_by_source",
    # remaining oldest-stale keys (last driver row <= round 11),
    # registry order
    "pipeline_near_dedup_corpus",
    "graph_label_propagation",
    "dedup_simhash_recall",
    "dedup_ngram_jaccard_pairs",
    "dedup_exact_text",
    "dedup_fuzzy_name_pairs",
    "dedup_semantic_prune",
    "similarity_cosine_topk",
    "similarity_lsh_ann_topk",
    "similarity_pq_ann_topk",
    "similarity_hard_negatives",
    "similarity_mmr_diversified",
    "text_quality_scores",
    "text_contamination_8gram",
    "text_top_tfidf_term_per_doc",
    "text_inverted_index",
    "text_gopher_quality_filter",
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
