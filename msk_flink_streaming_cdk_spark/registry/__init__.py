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

Round-6 rotation: the window keeps the 4 reference queries plus the
re-proven ``text_pack_sequences`` (its oracle's HUGEINT cast fixed
this round), then gives FIRST-EVER driver rows to the next 45 keys of
the round-5 ``NEXT_TRANCHE`` in their planned order: the four
behavioral queries, the multimodal/UDF singles, and the whole TPC-H
q2-q22 tranche. ``ROTATION_WINDOW`` pins the first
``ROTATION_WINDOW_SIZE`` keys explicitly and a test asserts the
ordering, so the planned rotation is enforced by code, not a comment;
the remaining never-checked keys are kept IN ORDER at the tail of
``PRIORITY`` as the next tranche.
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
    # Round-5 driver-red row — oracle HUGEINT cast fixed this round,
    # kept in the window to prove green.
    "text_pack_sequences",
    # Round-5 NEXT_TRANCHE, first 45 in planned order: behavioral
    # queries, multimodal/UDF singles, TPC-H q2–q22, relational tail.
    "events_markov_transitions",
    "events_top_paths_3step",
    "events_anomaly_mad",
    "orders_benford_audit",
    "multimodal_frame_sample",
    "grouped_map_centered_balance",
    "window_share_of_segment",
    "sql_front_door_pipeline",
    "outlier_orders_iqr",
    "asof_join_next_error",
    "agg_time_weighted_value",
    "similarity_lsh_ann_topk",
    "dedup_embedding_cosine_pairs",
    "text_approx_topk_words",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_urgency_by_linestatus",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q20_excess_share_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_rich_customers",
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
    "join_salted_skew_orders",]

# Next tranche (round 6+): the remaining keys that have never had a
# driver row, in planned rotation order. Keeping them HERE (not just
# in a comment) makes the plan part of the ordered registry.
NEXT_TRANCHE: list[str] = [
    # Round-6 additions — registered after the round-6 window froze;
    # first in line for round-7 driver rows.
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
    "multimodal_audio_segments",]

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
