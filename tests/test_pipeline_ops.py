"""Semantic invariants for the training-pipeline operators added after
round 1: sequence packing, benchmark decontamination, and embedding
scalar quantization. Oracle parity is covered by test_driver_parity;
these pin the properties parity can't see (boundary behavior, bounds,
shard independence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tripgogo_vector_search_spark.functions import vector as V
from tripgogo_vector_search_spark.operators import dedup as DD
from tripgogo_vector_search_spark.operators.packing import pack_sequences
from tripgogo_vector_search_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def _pack(spark, rows, context_len):
    df = spark.createDataFrame(rows, "doc_id bigint, text string, src string")
    out = pack_sequences(df, "text", "doc_id", "src",
                         context_len=context_len)
    return {r.id: (r.n_tok, r.seq_id, r.seq_offset) for r in out.collect()}


def test_pack_sequences_concat_and_chunk(spark):
    # token counts: 3, 4, 5 with context 4 -> starts 0, 3, 7
    rows = [(1, "a b c", "s"), (2, "d e f g", "s"), (3, "h i j k l", "s")]
    got = _pack(spark, rows, context_len=4)
    assert got[1] == (3, 0, 0)
    assert got[2] == (4, 0, 3)   # crosses the seq 0/1 boundary mid-doc
    assert got[3] == (5, 1, 3)


def test_pack_sequences_shards_independent(spark):
    # same docs in two shards -> identical shard-local layout
    rows = [(i, "w " * i + "w", f"s{i % 2}") for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, src string")
    out = pack_sequences(df, "text", "doc_id", "src", context_len=8)
    by_shard: dict[str, list] = {}
    for r in out.collect():
        by_shard.setdefault(r.shard, []).append((r.id, r.seq_id, r.seq_offset))
    # within a shard, (seq_id, offset) is non-decreasing in doc order and
    # offsets stay < context_len
    for rows_ in by_shard.values():
        rows_.sort()
        pos = [(s, o) for _, s, o in rows_]
        assert pos == sorted(pos)
        assert all(0 <= o < 8 for _, o in pos)


def test_pack_sequences_offsets_consistent_with_counts(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = pack_sequences(docs, "text", "doc_id", "source", context_len=512)
    rows = sorted(((r.shard, r.id, r.n_tok, r.seq_id, r.seq_offset)
                   for r in out.collect()))
    pos = {}
    for shard, _id, n_tok, seq_id, off in rows:
        expect = pos.get(shard, 0)
        assert seq_id * 512 + off == expect, (shard, _id)
        pos[shard] = expect + n_tok


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

def test_decontaminate_flags_overlap_only(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(1, "prefix words then the quick brown fox appears here"),
         (2, "completely unrelated content with no overlap at all"),
         (3, "xx")],  # shorter than one shingle -> clean by definition
        "doc_id bigint, text string")
    got = {r.id: (r.n_shared, r.contaminated)
           for r in DD.decontaminate(corpus, bench, "text", "doc_id",
                                     shingle_n=3).collect()}
    # doc 1 shares exactly "the quick brown" and "quick brown fox"
    assert got[1] == (2, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    assert set(got) == {1, 2, 3}  # every corpus doc present, clean or not


# ---------------------------------------------------------------------------
# embedding quantization
# ---------------------------------------------------------------------------

def test_quantize_error_bounded_by_half_scale(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    sc = V.quantize_scale("embedding")
    bad = (emb.select(sc.alias("s"),
                      V.dequantize_error("embedding", sc).alias("e"))
           .filter(F.col("s").isNotNull()
                   & (F.col("e") > F.col("s") / 2 + 1e-12)))
    assert bad.count() == 0


def test_quantize_known_codes(spark):
    df = spark.createDataFrame(
        [(1, [1.27, -0.635, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>")
    sc = V.quantize_scale("embedding")
    out = {r.vec_id: (r.s, r.q) for r in df.select(
        "vec_id", F.round(sc, 9).alias("s"),
        V.quantize("embedding", sc).alias("q")).collect()}
    s, q = out[1]
    assert s == pytest.approx(0.01, abs=1e-9)
    assert q == [127, -63, 0]   # floor(-63.5 + 0.5) = -63: round-half-up
    assert out[2] == (None, [0, 0, 0])  # zero vector -> NULL scale, 0 codes


# ---------------------------------------------------------------------------
# property-based: operators vs plain-Python references
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_DOCS = st.lists(
    st.tuples(st.sampled_from(["s0", "s1", "s2"]),
              st.text(alphabet=st.sampled_from(list("ab c!1.")),
                      min_size=0, max_size=40)),
    min_size=1, max_size=16)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_DOCS)
def test_pack_sequences_matches_python_reference(spark, docs):
    import re

    from tripgogo_vector_search_spark.functions.text import TOKEN_REGEX
    rows = [(i, t, s) for i, (s, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, src string")
    got = {r.id: (r.n_tok, r.seq_id, r.seq_offset)
           for r in pack_sequences(df, "text", "doc_id", "src",
                                   context_len=5).collect()}
    pos: dict[str, int] = {}
    for i, (s, t) in enumerate(docs):
        n = len(re.findall(TOKEN_REGEX, t))
        start = pos.get(s, 0)
        assert got[i] == (n, start // 5, start % 5), (i, s, t)
        pos[s] = start + n
    assert len(got) == len(docs)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=st.lists(
    st.lists(st.floats(min_value=-100, max_value=100,
                       allow_nan=False, allow_infinity=False,
                       width=32),
             min_size=1, max_size=8),
    min_size=1, max_size=8))
def test_quantize_matches_python_reference(spark, vecs):
    import math
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    sc = V.quantize_scale("embedding")
    got = {r.vec_id: (r.s, list(r.q)) for r in df.select(
        "vec_id", sc.alias("s"), V.quantize("embedding", sc).alias("q"))
        .collect()}
    for i, v in enumerate(vecs):
        mx = max(abs(float(x)) for x in v)
        if mx == 0:
            assert got[i] == (None, [0] * len(v))
        else:
            s = mx / 127
            q = [math.floor(float(x) / s + 0.5) for x in v]
            gs, gq = got[i]
            assert gq == q and abs(gs - s) < 1e-12, (i, v)
