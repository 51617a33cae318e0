"""Empty-input robustness: every class of operator must degrade to an
empty (or well-defined scalar) result on zero-row tables — not throw.

At 100 TB, empty inputs are routine (a partition-pruned day with no
data, a filter that matches nothing, a fresh table) and an operator
that crashes on them takes the whole pipeline down.
"""

from __future__ import annotations

import os

import pytest

from msk_flink_streaming_cdk_spark.registry import QUERIES
from msk_flink_streaming_cdk_spark.sources.fixtures import load_table

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# One representative per operator family. Scalar aggregates legally
# return one row on empty input (count() over nothing = a single 0);
# everything else must return zero rows.
EMPTY_OK_ONE_ROW = {
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
}
# Model-fit queries emit a fixed-size coefficient table (zeros on an
# empty corpus) — well-defined, just not zero rows.
EMPTY_OK_COEF_TABLE = {"quality_logistic_fit": 5}
# Profiling queries emit a fixed-shape report row/table even on empty
# input (a 0-row table still HAS six columns to profile).
EMPTY_OK_FIXED_ROWS = {
    "dq_column_profile": 6,
    "dq_key_skew_profile": 1,
    # 1 audit row with NULL ratios on an empty corpus (agg over
    # nothing), never a crash.
    "embedding_pca_variance_audit": 1,
    "dedup_minhash_estimate_audit": 1,
    "sketch_countmin_accuracy": 1,
}
REPRESENTATIVES = [
    "q1_alerts_daily",            # windowed agg
    "q3_shipping_priority",       # multi-join top-k
    "q6_forecast_revenue",        # scalar agg
    "q21_waiting_suppliers",      # semi-join pipeline
    "window_running_total",       # OVER window
    "scd2_user_value_history",    # lead/validity intervals
    "dedup_exact_text",           # hash dedup
    "dedup_ngram_jaccard_pairs",  # shingle band join
    "dedup_minhash_lsh_pairs",    # minhash LSH
    "similarity_cosine_topk",     # embedding top-k
    "text_split_assign",          # map-only split
    "text_token_balanced_mixture",  # grouped mixture rates
    "pipeline_training_manifest",   # composed pipeline
    "grouped_map_centered_balance",  # applyInPandas
    "cogrouped_activity_counts",     # cogroup
    "sliding_window_event_counts",   # sliding window
    "session_window_user_sessions",  # session window
    "dedup_connected_components_star",  # iterative star contraction
    "dedup_graph_triangle_count",    # graph wedge joins
    "embedding_pca_project",         # mapInPandas sufficient stats
    "text_contamination_bloom",      # driver-built bitmap + verify join
    "text_bm25_topk",                # corpus-stats retrieval
    "text_temperature_mixture",      # scalar-normalized mixture rates
    "histogram_equidepth_prices",    # percentile-cut bucketing
    "quality_logistic_fit",          # IRLS on sufficient statistics
    "text_ngram_novelty",            # gram first-occurrence join
    "text_prefix_boilerplate_groups",  # narrow-key grouping
    "dedup_graph_pagerank",          # iterative rank loop, empty graph
    "timeseries_ewma_kernel",        # lag-kernel window
    "timeseries_ohlc_hourly",        # resample bars
    "timeseries_rolling_zscore",     # rolling-stats anomaly flags
    "text_weighted_sample_topk",     # weighted top-k sample
    "dq_column_profile",             # single-pass column profiling
    "dq_key_skew_profile",           # key-skew scalar report
    "pipeline_near_dedup_keep_central",  # CC + pagerank composition
    "text_bpe_pair_counts",          # vocab-weighted pair explosion
    "attribution_last_touch",        # as-of join + tolerance predicate
    "text_inverted_index",           # capped posting lists
    "text_pmi_pairs",                # doc-level co-occurrence join
    "dq_gini_doclen_by_source",      # rank + exact-moment inequality
    "dq_duplicate_rate_by_source",   # global fingerprint groups
    "similarity_hard_negatives",     # label-filtered broadcast top-k
    "embedding_outlier_flags",       # centroid-distance rank cut
    "similarity_mmr_diversified",    # lazily-composed greedy argmax
    "timeseries_seasonal_residuals",  # broadcast seasonal profile
    "graph_label_propagation",       # iterative vote loop, empty graph
    "dq_ks_drift_by_source",         # integer-CDF drift grid
    "basket_pair_lift",              # order-keyed co-occurrence join
    "er_golden_records",             # fuzzy ER + CC + merge rollup
    "timeseries_quantile_bars",      # exact-percentile panel
    "dq_event_lag_by_type",          # freshness vs data high-water mark
    "quality_logistic_score",        # frozen-model Catalyst scoring
    "embedding_pca_variance_audit",  # PCA quality audit row
    "dedup_incremental_new_vs_corpus",  # batch-vs-corpus band probe
    "storage_zorder_events",         # Morton key derivation
    "dq_source_overlap_matrix",      # fingerprint pair rollup
    "retrieval_hybrid_rrf",          # two-leg rank fusion
    "pipeline_forget_expand",        # CC-expanded deletion set
    "dedup_minhash_estimate_audit",  # signature-agreement audit
    "sketch_countmin_accuracy",      # d x w cell audit
    "events_markov_transitions",     # per-user lead + transition agg
    "events_top_paths_3step",        # double-lead path top-k
    "events_anomaly_mad",            # median/MAD robust flags
    "orders_benford_audit",          # first-digit distribution audit
    "pipeline_admission_decisions",  # reason-coded admission audit
    "text_dsir_importance_weights",  # hashed-ngram domain log-ratios
    "embedding_matryoshka_recall",   # truncated-dim retrieval audit
    "dedup_incremental_components",  # batch union-find merge
    "dq_split_leakage",              # cross-split near-dup audit
    "orders_abc_pareto_classes",     # Pareto cumulative classing
    "dedup_cluster_stats",           # cluster-size distribution
]


@pytest.fixture(scope="module")
def sf_empty(spark, tmp_path_factory, sf_small):
    path = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        load_table(spark, sf_small, t).limit(0).write.mode(
            "overwrite"
        ).parquet(os.path.join(str(path), f"{t}.parquet"))
    return str(path)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_query_survives_empty_tables(spark, sf_empty, name):
    rows = QUERIES[name](spark, sf_empty).collect()
    if name in EMPTY_OK_ONE_ROW:
        assert len(rows) <= 1
    elif name in EMPTY_OK_COEF_TABLE:
        assert len(rows) == EMPTY_OK_COEF_TABLE[name]
        assert all(r.value == 0.0 for r in rows)
    elif name in EMPTY_OK_FIXED_ROWS:
        assert len(rows) == EMPTY_OK_FIXED_ROWS[name]
    else:
        assert rows == []


def test_text_ops_survive_nulls_and_unicode(spark, tmp_path, sf_small):
    # Adversarial documents: NULL text, empty string, whitespace-only,
    # emoji, CJK (no whitespace tokens), RTL, a 1-char doc. Text
    # operators must neither crash nor emit rows for untokenizable
    # docs they claim to tokenize.
    import os

    weird = [
        (0, None, "xx", "srcw", 0),
        (1, "", "xx", "srcw", 0),
        (2, "   \t\n  ", "xx", "srcw", 7),
        (3, "héllo wörld 🎉🎉 café", "fr", "srcw", 20),
        (4, "这是一个没有空格的中文句子用来测试", "zh", "srcw", 17),
        (5, "مرحبا بالعالم hello", "ar", "srcw", 19),
        (6, "a", "en", "srcw", 1),
        (7, "normal english text with several words here", "en",
         "srcw", 43),
    ]
    path = str(tmp_path / "weird")
    os.makedirs(path)
    spark.createDataFrame(
        weird, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(os.path.join(path, "documents.parquet"))
    # embeddings table is required by some loaders; reuse the fixture's
    from msk_flink_streaming_cdk_spark.sources.fixtures import load_table

    load_table(spark, sf_small, "embeddings").write.parquet(
        os.path.join(path, "embeddings.parquet")
    )

    from msk_flink_streaming_cdk_spark.registry import QUERIES

    for name in (
        "text_token_counts",
        "text_quality_scores",
        "text_fingerprint_md5",
        "text_split_assign",
        "dedup_exact_text",
        "text_chunk_sliding",
        "text_rolling_md5_fingerprints",
        "udtf_sentence_split",
        "text_bpe_pair_counts",
        "text_inverted_index",
        "text_pmi_pairs",
        "text_weighted_sample_topk",
        "dq_gini_doclen_by_source",
        "dq_duplicate_rate_by_source",
        "dq_ks_drift_by_source",
        "quality_logistic_score",
        "pipeline_admission_decisions",
        "text_dsir_importance_weights",
    ):
        rows = QUERIES[name](spark, path).collect()  # must not raise
        assert isinstance(rows, list)
    # spot-check: token counter treats NULL/empty/CJK sanely
    toks = {
        r.doc_id: r
        for r in QUERIES["text_token_counts"](spark, path).collect()
    }
    assert toks[4].n_ws_tokens == 1  # no whitespace -> one "token"
    assert toks[7].n_ws_tokens == 7
