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
    # ROUND 13. Head = keys NEW this round, then every key whose
    # physical plan, oracle SQL, or source closure changed THIS round
    # (drift gate: tests/test_plan_manifest.py).
    #
    # NEW: recall@k of the COMPRESSED tier (VERDICT r12 list #3) —
    # the ivfpq pipeline (probe -> ADC shortlist -> exact re-rank)
    # measured against exact brute force per query, mirroring
    # ann_recall_eval; the artifact that tunes (nprobe, shortlist).
    "ivfpq_recall_eval",
    # NEW: the fourth real decode — GIF through a REAL LZW layer
    # (VERDICT r12 list #5): Catalyst-synthesized GIF89a corpus
    # sidecar (9-bit clear-interleaved LZW codes, LSB-first bit
    # packing, sub-block framing, 256-entry palette), decoded by an
    # Arrow kernel with a full variable-width LZW decoder; a real
    # compressing LZW encoder round-trips through it in tests.
    "multimodal_gif_stats",
    # NEW: decode-on-arrival — the 14th streaming query: arriving
    # media bytes decoded per micro-batch through the LZW kernel,
    # stats sunk idempotently (the stream_minhash_probe pattern).
    "stream_media_decode",
    # NEW: the multimodal quality gate — LAION/DataComp-class
    # size/aspect prefilters as flags+keep over the DECODER's output
    # (curation consumes decode metadata; oracle re-derives
    # synthesis-side, double-checking the decoded dimensions rowwise).
    "media_quality_gate",
    # VERDICT r12 list #4: llm_generate's deterministic stub is a
    # pure function of the collected top-k frame, so it now carries a
    # REAL oracle (DuckDB string_agg + md5 replay of the prompt) —
    # the last rows-only hole closes; the registry is fully
    # oracle-gated.
    "llm_generate",
    # NEW: batch RAG — the same LLM contract run data-parallel per
    # group inside the executors (applyInPandas over the
    # WindowGroupLimit-pruned per-source top-3), oracle-gated by the
    # same engine-side-stringify + SQL md5 replay.
    "llm_generate_batch",
    # VERDICT r12 list #2: semdedup's within-cell pair join now sits
    # behind a per-cell occupancy guard (operators/dedup.py:
    # cell_occupancy_guard — bounded <=n_cells collect, RAISE on a
    # mega-cell) with an adversarial collapsed-embeddings fixture in
    # tests/test_dedup_guards.py.
    "semdedup",
    # ADVICE r12 low #1 (+ the same class in stream_sessionize): the
    # streaming oracles' watermark arithmetic is now MILLISECOND-
    # floored to mirror the engine (EventTimeStats tracks max event
    # time in epoch ms; the fixture has microsecond event times).
    "stream_session_window", "stream_sessionize",
    # ADVICE r12 low #2: the tokenizer kernel receives F.lower(text)
    # and never calls Python str.lower() — case is normalized once,
    # engine-side, by the same expression the vocab learning uses.
    "subword_tokenize",
    # ADVICE r12 low #3: tpch_q12 uses the CANONICAL Q12 CASE buckets
    # on both engines — a NULL o_orderpriority counts in NEITHER
    # bucket (the r11 count(*)-high formulation classified it low).
    "tpch_q12",
    # ROTATION (stale-evidence retirement, VERDICT r12 list #1:
    # finish the burn-down — 9 keys on r05 rows, 11 on r06). Oldest
    # first per tools/rotation.py: all r05, all r06, then r07
    # oldest-first up to the 50-key window. Plans unchanged — the
    # drift gate pins them.
    # r05 (the tail the r12 window couldn't fit):
    "null_safe_join", "quantization_error", "resample_zero_fill",
    "sample_bias_audit", "seasonality_profile", "simhash_hamming_dedup",
    "source_concentration_gini", "token_fertility_by_lang",
    "trend_slope",
    # r06:
    "corpus_filter", "doc_fingerprint", "fingerprint_dedup",
    "lang_dist", "lang_id", "lob_to_string", "multimodal_features",
    "project_display", "project_subset", "quality_score",
    "semi_anti_join",
    # r07 (oldest-first fill; the r07 remainder — schema_profile,
    # sim_join and sim_join_gemm, whose slots the three new keys
    # took, then sort_desc through tpch_q9: 17 keys — continues next
    # round):
    "activation_latency_quartiles", "cast_concat_pct", "concat_text",
    "conversion_latency", "copurchase_lift", "dedup_pair_audit_sample",
    "derived_score", "embedding_coverage_audit", "grouping_sets",
    "hybrid_search_rrf", "in_subquery", "join_agg", "join_multi",
    "knn_label_accuracy", "match_score", "referential_integrity_audit",
    "rename_cols", "revenue_concentration_hhi", "revenue_growth_yoy",
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
