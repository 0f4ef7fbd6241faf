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
    # ROUND 10. Head = keys NEW this round, then every key whose
    # physical plan or source closure changed THIS round, in the tree
    # at this commit (drift gate: tests/test_plan_manifest.py).
    #
    # NEW: cross-document duplicate-paragraph exposure (MassiveText's
    # dup-paragraph signal) and the train->eval split leakage audit
    # (GPT-3-style decontamination at the engine's own deterministic
    # split boundary) — operators/corpus.py:dup_paragraph_stats,
    # split_contamination — and DSIR importance weighting (Xie et al.
    # 2023: hashed-bigram log importance weights of a target slice vs
    # the raw corpus, DECIMAL-exact across engines).
    "dup_paragraph_fraction", "split_contamination_audit",
    "dsir_importance_weights", "dup_paragraph_removal",
    "stream_paragraph_probe",
    # HOF-sweep re-rows (r10): these lambdas read the word array as an
    # OUTER expression, re-running the split per gram/shingle —
    # O(len^2) per doc, measured 3.3x on 2000-word docs.
    # boilerplate_ngrams projects the array to a column; the shared
    # shingles() expression now binds it once as a lambda variable,
    # moving the fingerprints of every expression-shingle consumer
    # (the minhash SIGNATURE paths use the Arrow kernel and are
    # unmoved).
    "boilerplate_ngrams", "ngram_jaccard", "ngram_jaccard_prefix",
    "containment_join", "jaccard_topk_per_doc", "novelty_by_source",
    "shingle_df_histogram", "minhash_band_recall",
    "minhash_threshold_sweep", "minhash_jaccard_estimate",
    "repetition_filter",
    # l2_normalize bound-norm fix (30x: the norm fold re-ran per
    # element); stream_embed's closure reaches the same function.
    "l2_normalize", "stream_embed",
    # NEW: container-magic intake audit over typed binary content
    # (operators/multimodal.py:sniff_magic — byte-exact vs the DuckDB
    # BLOB oracle, no codec).
    "multimodal_magic_audit",
    #
    # The nine width_bucket rank/quantile keys re-row for the ADVICE r9
    # medium fix: the evaluated fractional part t - floor(t) rounds to
    # exactly 1.0 for t in (-2^-54, 0), so the unclamped fine-cell id
    # hit K and overflowed the composite-id radix into the next e-fold
    # cell's slot — tiny negatives could out-sort non-negatives under a
    # fat+split cell (operators/rank.py: F.least clamp; red-on-old
    # proof in tests/test_bucket_balance.py). Oracles unchanged.
    "median_agg", "approx_quantiles", "quartile_agg",
    "percentile_cont_exact", "value_outlier_iqr", "median_impute",
    "quality_gate", "ntile_bands", "orders_rfm",
    # Index-maintenance keys (VERDICT r9 list #1/#5): fully-retired
    # partition cleanup now goes through the Hadoop FileSystem API
    # (cluster-real — file:// pinned in tests/test_index_compact.py),
    # and the NEW composed refresh_compact_cycle runs worklist ->
    # delta-only embed -> partition-local upsert -> compaction as one
    # job, returning the final store state (oracle embeds the current
    # corpus from scratch — sharp on routing AND eviction).
    "index_compact", "corpus_refresh_cycle", "refresh_compact_cycle",
    # Component-family keys re-row for the durable-checkpoint knob
    # (VERDICT r9 list #4): connected_components(durable=True) swaps
    # localCheckpoint for reliable .checkpoint() under
    # setCheckpointDir, deleting superseded rounds' file sets through
    # the Hadoop FS API; default behavior unchanged, but the shared
    # kernel's source closure moved.
    "dedup_components", "dedup_keep_best", "near_dup_cluster_stats",
    "near_dup_cross_source", "dedup_cluster_examples",
    # dup_ngram_fraction re-rows for the ADVICE r9 NULL fix: the pure
    # expression and the oracle now NULL-propagate like the Arrow
    # kernel (a NULL doc scores NULL, not 0.0).
    "dup_ngram_fraction",
    # quality_by_length_decile re-rows for the lazy conversion
    # (VERDICT r9 "What's wrong #3"): the build-time straddle collect
    # + literal IN is replaced by a broadcast join against the
    # <=10-row boundary frame — building the plan no longer runs a
    # job. Oracle unchanged.
    "quality_by_length_decile",
    # --- rotation (VERDICT r9 list #2): the r01/r02 residue, minus
    # four (null_funcs, like_filter, map_funcs, udtf_ngrams) displaced
    # by this round's changed-plan keys — changed plans NEED fresh
    # rows, rotation keys' old rows stay valid. chunk_docs and
    # decontaminate are both rotation AND changed (the HOF sweep moved
    # their closures). The r03 cohort and the displaced four continue
    # in r11 — 71 keys' newest rows predate r05, more than one window
    # holds. ---
    "scalar_funcs", "case_when", "array_funcs", "string_funcs",
    "date_funcs", "scalar_subquery", "correlated_subquery",
    "explode_tokens", "collect_agg", "set_ops_all",
    "chunk_docs", "decontaminate",
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
