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
    # ROUND 5: breadth frozen again — ZERO new queries. Head = the 26
    # registry keys with NO driver CORRECTNESS row across r01-r04 (the
    # tail of r3's breadth; clearing them makes coverage 218/218), then
    # every key whose behavior changed this round (knn_label_accuracy
    # count-capped eval + rounded-argmin oracle; sim_join_gemm
    # round-before-top-k kernel + own rounded-ORDER-BY oracle;
    # fuzzy_join plan extracted to operators/fuzzy; the quantize
    # kernel's degrade guard; hybrid/sim_join adjacency), then r4
    # anchors for re-confirmation. 26 + 7 + anchors fit the 50-slot
    # window with room to spare.
    "activation_latency_quartiles", "ann_index_occupancy",
    "char_trigrams_top", "conversion_latency", "copurchase_lift",
    "corpus_summary_report", "daily_volume_anomalies",
    "dedup_cluster_examples", "dup_multiplicity_histogram",
    "embedding_coverage_audit", "event_type_share_trend",
    "first_touch_attribution", "median_impute", "minhash_band_recall",
    "norm_outlier_screen", "null_safe_join", "percentile_cont_exact",
    "quality_by_length_decile", "referential_integrity_audit",
    "resample_zero_fill", "revenue_concentration_hhi",
    "revenue_growth_yoy", "sample_bias_audit", "seasonality_profile",
    "source_concentration_gini", "token_fertility_by_lang",
    # --- r5 behavior changes (new plans, same semantics) ---
    "knn_label_accuracy", "sim_join_gemm", "fuzzy_join",
    "embed_quantize", "quantization_error", "sim_join",
    "hybrid_search_rrf", "simhash_hamming_dedup", "simhash_dedup",
    "ngram_jaccard", "ngram_jaccard_prefix", "containment_join",
    "jaccard_topk_per_doc", "near_dup_cross_source", "minhash_dedup",
    "dedup_components", "dedup_keep_best",
    # --- re-confirmation anchors (r4 fixes + watch-list) ---
    "trend_slope", "ann_knn_join", "dedup_pair_audit_sample",
    "ann_recall_eval", "bm25_score", "filtered_knn",
    "approx_quantiles",
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
