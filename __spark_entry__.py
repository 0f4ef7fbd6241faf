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
    # ROUND 7. Head = every key whose physical plan changed THIS
    # round, in the tree at this commit (unlike the r6 comment, which
    # listed these as shipped when they were not — VERDICT r6 "What's
    # wrong #1"):
    #   quality_by_length_decile — global corpus rank window replaced
    #     by histogram decile bounds (cached per-length aggregate +
    #     IN-pruned straddle re-scan; registry.py, r6 list #2);
    #   sim_join_gemm — NULL distances (zero-norm vectors crossing
    #     pandas->Arrow) now rank LAST via asc_nulls_last, matching
    #     the oracle's NULLS LAST (operators/simjoin.py; ADVICE r5/r6);
    #   sim_join — broadcast path divides with try_divide (ANSI-safe,
    #     NULL on zero norm like the oracle) + the same nulls_last
    #     window;
    #   ntile_bands — single-task global ntile window replaced by the
    #     distributed two-phase rank (operators/rank.py) + closed-form
    #     ntile/percent_rank/cume_dist arithmetic;
    #   activation_latency_quartiles — |users|-frame rank window
    #     replaced by gap-histogram cumulative-rank selection;
    #   conversion_latency — same histogram selection, plus the
    #     forced broadcast of the |users|-scale view-times frame
    #     removed (planner's choice; shuffle join at scale);
    #   orders_rfm — |customers|-frame ntile window replaced by the
    #     distributed two-phase rank + closed-form ntile;
    #   the 21 keys below through copurchase_lift — the forced-
    #     broadcast sweep: F.broadcast() hints removed from every
    #     SF-scaling side (customer / supplier / part / orders-derived
    #     / entity-key-set / vocabulary frames); only fixed-size
    #     (nation, region) and bounded stat/sample frames keep pinned
    #     hints. Results are strategy-independent; plans changed.
    # Then re-confirmation anchors. Plan drift vs the last driver row
    # is enforced by tests/test_plan_manifest.py: it fingerprints
    # every non-streaming key's optimized plan and fails if a
    # fingerprint differs from tests/plan_manifest.json while the key
    # is absent from this changed-keys head.
    "quality_by_length_decile", "sim_join_gemm", "sim_join",
    "ntile_bands", "activation_latency_quartiles",
    "conversion_latency", "orders_rfm",
    "tpch_q3", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10",
    "tpch_q14", "tpch_q15", "tpch_q17", "tpch_q18", "tpch_q19",
    "join_agg", "join_multi", "in_subquery", "grouping_sets",
    "revenue_growth_yoy", "revenue_concentration_hhi", "tfidf_topk",
    "copurchase_lift", "referential_integrity_audit",
    "embedding_coverage_audit",
    #   dedup_pair_audit_sample — band-bucket posting array replaced
    #     by the dedup module's min-per-bucket star-edge join;
    #   dedup_cluster_examples — whole-cluster collect_list replaced
    #     by a WindowGroupLimit-pruned first-5 per component.
    "dedup_pair_audit_sample", "dedup_cluster_examples",
    # --- re-confirmation anchors ---
    "median_agg", "schema_profile", "knn_label_accuracy",
    "approx_quantiles", "ngram_jaccard_prefix", "hybrid_search_rrf",
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
