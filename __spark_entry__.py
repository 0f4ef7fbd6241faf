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
    # ROUND 4: evidence round — ZERO new queries. Head = the one red r3
    # row (ann_knn_join, negative-zero fix) and the keys whose behavior
    # changed this round (fuzzy_join plan, dedup_pair_audit_sample
    # star-edge oracle, trend_slope unit), then ALL 74 registry keys
    # that had no driver CORRECTNESS row across r01-r03, prioritized:
    # kmeans_lloyd / sql_passthrough / orc_roundtrip / tpch batch-3 /
    # the five streaming queries / the ANN-calibration set anchor the
    # round-3 claims. The driver's 50-slot window clears the first 50;
    # the residual ~26 lead round 5's window.
    "ann_knn_join", "fuzzy_join", "dedup_pair_audit_sample", "trend_slope",
    "kmeans_lloyd", "sql_passthrough", "orc_roundtrip", "tpch_q7",
    "tpch_q8", "tpch_q9", "tpch_q13", "tpch_q15", "tpch_q17", "tpch_q19",
    "tpch_q22", "stream_quality_filter", "stream_event_alert",
    "stream_hop_window", "hop_window_agg", "observed_ingest",
    "ann_recall_eval", "kmeans_assign", "embedding_drift",
    "knn_label_accuracy", "filtered_knn", "hybrid_search_rrf",
    "multimodal_frame_sample", "mixture_weights", "quantization_error",
    "group_sample_balanced", "near_dup_cluster_stats",
    "event_rate_profile", "vocab_topk", "lang_confusion", "quality_gate",
    "token_count_histogram", "corr_pairs", "lang_distinctive_terms",
    "user_retention_cohorts", "orders_rfm", "dedup_rate_by_source",
    "schema_profile", "value_outlier_iqr", "novelty_by_source",
    "minhash_threshold_sweep", "kmv_distinct_sketch",
    "shingle_df_histogram", "pipeline_funnel", "near_dup_cross_source",
    "event_transitions", "copurchase_lift", "minhash_band_recall",
    "resample_zero_fill", "percentile_cont_exact", "median_impute",
    "seasonality_profile", "referential_integrity_audit",
    "norm_outlier_screen", "token_fertility_by_lang",
    "embedding_coverage_audit", "first_touch_attribution",
    "corpus_summary_report", "dedup_cluster_examples", "char_trigrams_top",
    "source_concentration_gini", "revenue_growth_yoy", "null_safe_join",
    "activation_latency_quartiles", "conversion_latency",
    "revenue_concentration_hhi", "daily_volume_anomalies",
    "sample_bias_audit", "ann_index_occupancy", "quality_by_length_decile",
    "event_type_share_trend", "dup_multiplicity_histogram",
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
