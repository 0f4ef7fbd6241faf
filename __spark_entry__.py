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
    # ROUND 17. Head = keys whose plan/oracle/source closure changed
    # this round (drift gate: tests/test_plan_manifest.py), then the
    # stale-row rotation (oldest first per tools/rotation.py).
    #
    # CHANGED (r17 optimization, guide §5 — results identical, the
    # quality_gate materialization applied to the exact-quantile
    # family): grouped_order_statistics now eagerly materializes its
    # two BOUNDED decision frames (per-target owning cells, owning-
    # cell value histogram) once per run, so the probe and pick plans
    # read LogicalRDD leaves instead of re-embedding the stats/probe
    # subtrees per consumer; superseded checkpoint blocks are released
    # deterministically on rebuild (ckpt.py — ADVICE r16 #1, also
    # wired into quality_gate's scored frame). Paired A/B + plan
    # evidence in OPTIMIZATION_r17.md + plans/r17/. Source scans,
    # shuffles, and every output tuple are unchanged (oracle green at
    # sf0.01; lazy-vs-scoped tuple equality pinned in
    # tests/test_round17_props.py).
    "median_agg", "approx_quantiles", "quartile_agg",
    "percentile_cont_exact", "value_outlier_iqr", "median_impute",
    "ccnet_ppl_buckets", "quality_gate",
    # CHANGED closure only (ADVICE r16 #2 — no plan change, no
    # behavior change: the three dedup.py width pins and rank.py's
    # bucket count now read spark.sql.shuffle.partitions through
    # partitioning.shuffle_width, which falls back to
    # defaultParallelism when the conf is non-numeric; the numeric
    # value — every supported local/cluster conf — is identical, so
    # plans are byte-identical and only source-closure fingerprints
    # move). Nine of these were already due in the r10 stale rotation,
    # so the slots do double duty.
    # CHANGED (r17 optimization, guide §4.2 — results identical): the
    # custom stateful sessionizer's per-group body now sorts with one
    # np.lexsort over the raw column buffers instead of
    # pd.concat().sort_values() and yields no frame for groups that
    # close nothing — the function is called once per (user, batch),
    # so the per-call constant dominated the stream (paired floors
    # 6.35 -> 4.43 s at sf0.1). Same (ts, event_id) order, same µs
    # arithmetic, oracle green.
    "stream_sessionize",
    # CHANGED (r17 optimization, guide §5 — results identical): both
    # recall evals materialize their 8-row eval-query sample once per
    # run; the sample is a TakeOrderedAndProject over a FULL corpus
    # scan and was re-embedded by every consuming arm (ivfpq: probe
    # selection, LUT build, shortlist re-rank, brute force — 22 scans
    # -> 12 in the final plan, five sampling scans -> one).
    "ann_recall_eval", "ivfpq_recall_eval",
    # CHANGED closure only (VERDICT r16 #3 — no plan change, no
    # behavior change: run_stream_to_table's stateful-operator width
    # now resolves from spark.tripgogo.stream.statePartitions via
    # default_state_partitions() instead of a baked-in literal 8; the
    # resolved value everywhere this repo runs is still 8, so stream
    # plans and results are identical and only the shared source
    # closure of the stream keys moves).
    "stream_dedup", "stream_embed", "stream_event_alert",
    "stream_hop_window", "stream_quality_filter",
    "stream_session_window", "stream_static_join", "stream_stream_join",
    "stream_window_agg",
    "ngram_jaccard", "ngram_jaccard_prefix", "containment_join",
    "jaccard_topk_per_doc", "minhash_dedup", "minhash_refresh",
    "simhash_dedup", "simhash_hamming_dedup", "stream_minhash_probe",
    "dedup_cluster_examples", "dedup_components", "dedup_keep_best",
    "dedup_pair_audit_sample", "index_compact", "near_dup_cluster_stats",
    "near_dup_cross_source", "novelty_by_source", "refresh_compact_cycle",
    "shingle_df_histogram",
    # ---- round-16 head kept below until the r17 rotation tail is
    # finalized at close ----
    #
    # CHANGED (r16 optimization, guide §2.5 — results identical, plans
    # re-shaped for width): the DSIR/LM corpus bigram explode now
    # widen()s its single-split scan (was a 1-task stage); the
    # shingle-pair, prefix-verify, and semdedup pair stages pin their
    # exchange width explicitly so AQE's byte-based coalescing cannot
    # serialize CPU-dense, small-byte stages onto 1-2 tasks. Evidence
    # in OPTIMIZATION_r16.md + plans/r16/*_{before,after}.txt.
    "dsir_importance_weights", "dsir_resample", "lm_cross_entropy",
    "ngram_jaccard", "ngram_jaccard_prefix", "containment_join",
    "jaccard_topk_per_doc", "semdedup",
    # CHANGED (ADVICE r15 low #2): the RLE8 BMP Arrow kernel now runs
    # an INDEPENDENT pixel path (_bmp_rle_indices_np — flat bottom-up
    # numpy surface, int.from_bytes header parse) instead of reusing
    # the spec decoder's _bmp_rle_indices, restoring the
    # dual-implementation discipline the other codecs have; the fuzz
    # agreement test now also feeds random delta/multi-count-run
    # escape streams the synthesized corpus never emits.
    "multimodal_bmp_rle_stats",
    # CHANGED (VERDICT r15 list #1 + ADVICE r15 low #1):
    # stream_media_dispatch now streams STORED BYTES — the
    # mixed-format arrival corpus is rendered once into a sidecar
    # (registry._media_arrival_path, integer (doc_id div 10) % 5
    # selector) and the stream reads (media_id, content) from it, so
    # the bench measures the operator (sniff+route+decode), not
    # per-batch re-synthesis of the arrival bytes.
    "stream_media_dispatch",
    # CHANGED (VERDICT r15 list #2): every streaming
    # sink/checkpoint/scratch create-delete now goes through the
    # Hadoop FileSystem API (fsutil.fs_delete) instead of
    # shutil/local paths, so hdfs://s3a:// layouts take the same
    # code path as local ones; file:// round-trip pinned in
    # tests/test_round16_props.py. Source closure moves for every
    # scratch-writing stream key.
    "stream_foreach_sink", "stream_minhash_probe",
    "stream_paragraph_probe", "stream_media_decode",
    # CHANGED (r16 single-pass dispatch kernel): the JPEG and plain-
    # BMP Arrow kernels' per-blob bodies were hoisted verbatim to
    # module level (_jpeg_blob_stats / _bmp_blob_stats) so the
    # streaming dispatch can route a sniffed blob per row inside ONE
    # mapInPandas stage (media_dispatch_stats) instead of paying six
    # branch plans over an unstored batch. Behavior-identical
    # (kernel-equivalence + degenerate suites green), but the source
    # closure of every JPEG/BMP-kernel key moves, so they all re-row.
    # FURTHER (r16 optimization, guide §4/§2 — results identical):
    # media_decode_dispatch and media_quality_gate_multiformat now
    # run that same single mapInPandas router over the sniffed
    # sidecar instead of six branch plans + union — both keys consume
    # EVERY kind, so partition pruning bought the branch shape
    # nothing while costing six Arrow stage launches (dispatch
    # 2.75 -> 1.11 s at sf0.1); the gate derives its flags as
    # kind-gated Catalyst predicates over the router's columns
    # (audio_fields=True surfaces the WAV rate/frames the too_short
    # flag needs). Evidence in OPTIMIZATION_r16.md + plans/r16/.
    "multimodal_jpeg_stats", "multimodal_jpeg_color_stats",
    "multimodal_jpeg_progressive_stats", "multimodal_jpeg_420_stats",
    "multimodal_jpeg_422_stats", "multimodal_jpeg_411_stats",
    "multimodal_bmp_stats", "media_decode_dispatch",
    "media_quality_gate_multiformat",
    # CHANGED (r16 optimization, guide §4.2 — results identical,
    # bit-parity pinned): sim_join's physical strategy moves from the
    # broadcast join + interpreted per-pair HOF fold to the
    # FOLD-EXACT vectorized kernel (similarity_join_gemm_exact):
    # dimension-ordered accumulation reproduces the expression fold's
    # unrounded doubles bit for bit, so ranking and oracle are
    # unchanged (tests/test_round16_props.py pins tuple equality at
    # two SFs + a zero-norm/tie edge frame). Only sim_join's
    # fingerprint moves — the new kernel is its own definition, so
    # sim_join_gemm's closure is untouched (manifest-verified).
    "sim_join",
    # CHANGED (r16 optimization, guide §2.3/§5 — results identical):
    # quality_gate materializes its scored (doc_id, lang, quality)
    # projection once per run (eager localCheckpoint) instead of
    # re-scanning the text column and re-running the regex battery
    # three times (selection stats pass, probe pass, final gate) —
    # the in-query form of the production "persist the scored
    # column" shape its docstring always prescribed. 2.35 -> 1.67 s
    # at sf0.1; three corpus scans -> one at 100 TB.
    "quality_gate",
    # CHANGED (r16 optimization — the stream_media_dispatch
    # stored-bytes move applied to its older sibling, results
    # identical): stream_media_decode now streams PRE-RENDERED GIF
    # bytes from the build-once _gif_arrival_path sidecar instead of
    # re-running the per-byte Catalyst GIF synthesis inside every
    # micro-batch; per-batch tasks sized by the same narrow-coalesce
    # rule as the dispatch stream. 2.00 -> 1.17 s at sf0.1. (The key
    # is already queued in the fsutil closure-move group above;
    # _ordered() keeps its first position.)
    # ROTATION (VERDICT r15 list #3). Oldest first per
    # tools/rotation.py — the r09 tail (6 keys), then the r10 cohort
    # as far as the driver window allows. Plans unchanged — the
    # drift gate pins them.
    # r09 (the complete remainder):
    "time_bucket_rollup", "tpch_q1", "tpch_q6", "window_first_last",
    "window_frame", "window_funcs",
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
