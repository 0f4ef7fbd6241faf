"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship exact-cosine-KNN query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (keys are the §2 ids) with matching DuckDB oracle SQL.
Implementation lives in ``tripgogo_vector_search_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tripgogo_vector_search_spark.plans import registry as _registry  # noqa: E402
from tripgogo_vector_search_spark.plans.flagship import flagship_query  # noqa: E402

SF0001 = "/root/testdata/sf0.001"

# Keys surfaced first to the driver's correctness gate (which checks a
# bounded prefix of this dict per round): queries not yet covered by a
# prior-round artifact, then queries whose behavior changed this round.
# Everything else (already driver-verified, unchanged) follows in
# registration order.
_CHECK_FIRST = [
    # The 35 registry keys with NO driver CORRECTNESS row across
    # r01 ∪ r02 (computed from the JSON artifacts, not by hand).
    # 25 round-1 leftovers:
    "ngram_jaccard_prefix", "sim_join_gemm", "approx_quantiles",
    "hll_union_rollup", "json_scan", "partitioned_sink", "tpch_q10",
    "label_centroids", "chunk_docs", "repetition_filter", "pii_redact",
    "tfidf_topk", "ann_knn_join", "pack_sequences", "decontaminate",
    "embed_quantize", "stream_static_join", "stream_stream_join",
    "grouped_agg_udaf", "stream_foreach_sink", "schema_evolution",
    "zorder_key", "salted_join", "incremental_dedup", "cdc_upsert",
    # 10 round-2 additions that missed the r2 gate window:
    "unpivot_metrics", "stratified_sample", "argmax_agg", "fuzzy_join",
    "funnel_stages", "normalize_text", "time_weighted_avg",
    "dedup_keep_best", "containment_join", "weighted_sample",
    # New in round 3, never driver-checked (35 + 15 = 50, filling the
    # gate window exactly):
    "tpch_q14", "tpch_q4", "pivot_table", "grouping_sets",
    "mode_agg", "histogram_fixed_bins", "skew_stats", "entropy_score",
    "bm25_score", "minhash_jaccard_estimate",
    "tpch_q18", "quartile_agg", "jaccard_topk_per_doc", "regex_funcs",
    "event_gap_stats",
    # --- 50-key line: everything below is next-in-line if the gate
    # checks more than 50. First the round-3 additions that exceeded
    # the 50-key window (locally oracle-green; driver row next round),
    # then r01∪r02-green keys ordered by how much their implementation
    # changed this round.
    # NOTE for round 4: after round 3's additions, ~122 keys have no
    # driver CORRECTNESS row yet (50 clear this round, ~72 remain).
    # Next round: promote the remainder into the head of this list
    # BEFORE adding new queries — evidence first, breadth second. ---
    "tpch_q7", "tpch_q8", "group_sample_balanced",
    "near_dup_cluster_stats", "event_rate_profile",
    "tpch_q9", "tpch_q13", "tpch_q15", "tpch_q17", "tpch_q19", "tpch_q22",
    "vocab_topk", "lang_confusion", "quality_gate",
    "token_count_histogram", "corr_pairs", "lang_distinctive_terms",
    "ann_recall_eval", "kmeans_assign", "user_retention_cohorts",
    "orders_rfm", "dedup_rate_by_source",
    "schema_profile", "value_outlier_iqr", "novelty_by_source",
    "stream_quality_filter",
    "minhash_threshold_sweep", "kmv_distinct_sketch",
    "shingle_df_histogram", "filtered_knn", "hybrid_search_rrf",
    "multimodal_frame_sample", "pipeline_funnel", "kmeans_lloyd",
    "near_dup_cross_source", "embedding_drift",
    "hop_window_agg", "event_transitions", "stream_event_alert",
    "copurchase_lift", "minhash_band_recall",
    "sql_passthrough", "observed_ingest", "stream_hop_window",
    "orc_roundtrip", "resample_zero_fill",
    "percentile_cont_exact", "trend_slope", "median_impute",
    "seasonality_profile", "referential_integrity_audit",
    "norm_outlier_screen", "token_fertility_by_lang",
    "embedding_coverage_audit", "first_touch_attribution",
    "corpus_summary_report", "dedup_cluster_examples",
    "char_trigrams_top", "source_concentration_gini",
    "revenue_growth_yoy", "null_safe_join",
    "mixture_weights", "activation_latency_quartiles",
    "knn_label_accuracy", "conversion_latency",
    "dedup_pair_audit_sample", "revenue_concentration_hhi",
    "daily_volume_anomalies", "quantization_error", "sample_bias_audit",
    "ann_index_occupancy", "quality_by_length_decile",
    "event_type_share_trend", "dup_multiplicity_histogram",
    "embedding_near_dup",  # adaptive-prefix stats caching changed
    "minhash_dedup", "ngram_jaccard", "simhash_hamming_dedup",
    "corpus_filter", "approx_distinct", "deterministic_sample",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _CHECK_FIRST if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_query(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(_registry.ORACLES)
