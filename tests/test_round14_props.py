"""Round-14 property pins: the r13 ADVICE closures (GIF allocation
bound, batch-RAG snippet sanitization, required-n_cells guard
signature) and VERDICT r13 list items #1 (fixed-SIZE recall-eval
sampling) and #3 (NULL-group-key batch RAG), each as a
red-on-old-shape test over a degenerate fixture.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r13 medium: gif_stats_udf must NULL-out hostile header dims
# before allocating, never raise
# ---------------------------------------------------------------------------

def _hostile_gif(w: int, h: int, data: bytes = b"\x00\x01\x02",
                 mcs: int = 8) -> bytes:
    """A syntactically valid GIF whose image descriptor declares w x h
    pixels but whose LZW stream holds only a few bytes — the ADVICE
    r13 attack shape: the old kernel preallocated np.empty(w*h int64)
    (34 GB at 65535 x 65535) before reading a single code."""
    out = bytearray(b"GIF89a")
    out += bytes([w & 0xFF, w >> 8, h & 0xFF, h >> 8])  # screen w,h
    out += bytes([0x80 | 0x00, 0, 0])        # GCT flag, 2-entry table
    out += bytes(3 * 2)                      # tiny global palette
    out += bytes([0x2C, 0, 0, 0, 0,          # image descriptor at 0,0
                  w & 0xFF, w >> 8, h & 0xFF, h >> 8, 0x00])
    out += bytes([mcs])                      # LZW min code size
    out += bytes([len(data)]) + data + b"\x00"  # one sub-block + term
    out += b"\x3B"
    return bytes(out)


def test_gif_kernel_nulls_hostile_dims_without_alloc(spark):
    """65535 x 65535 declared, 3 bytes of data: the kernel must emit
    the all-NULL struct (the documented unreadable verdict), not
    MemoryError the task. Runs through a real Spark plan so the
    failure mode would be the executor's, exactly as in
    stream_media_decode."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        decode_gif_stats)
    blob = _hostile_gif(65535, 65535)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id bigint, content binary")
    rows = decode_gif_stats(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.media_id == 1
    assert r.width is None and r.height is None and r.n_pixels is None


def test_gif_spec_mirrors_absolute_pixel_cap():
    """parse_gif (the plain-Python spec the kernel is pinned equal to)
    must NULL the same oversized frames, so the equivalence contract
    holds above the cap too."""
    from tripgogo_vector_search_spark.operators.multimodal import parse_gif
    assert parse_gif(_hostile_gif(65535, 65535)) is None
    # and just above the data-derived bound: 4100 x 4100 = 16.8M
    # pixels > _GIF_DECODE_MAX_PIXELS (16.7M)
    assert parse_gif(_hostile_gif(4100, 4100)) is None


def test_gif_data_bound_never_rejects_a_decodable_stream(spark):
    """The data-derived bound (codes x 4096 max chain) must be
    conservative: a legitimate small GIF still decodes after the
    guard. Uses the engine's own synthesizer so the bytes are real."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        decode_gif_stats, synth_gif_corpus)
    docs = spark.createDataFrame([(7, "hello gif world")],
                                 "doc_id bigint, text string")
    media = synth_gif_corpus(docs)
    rows = decode_gif_stats(media).collect()
    assert len(rows) == 1 and rows[0].width is not None
    assert rows[0].n_pixels == rows[0].width * rows[0].height


# ---------------------------------------------------------------------------
# ADVICE r13 low: batch-RAG snippet sanitization must be symmetric
# ---------------------------------------------------------------------------

def _duck_batch_oracle(rows):
    """Replay the llm_generate_batch prompt+digest in DuckDB for an
    arbitrary (source, rn, doc_id, snippet) candidate set — the
    registry oracle's md/pr/summary tail over a literal VALUES
    frame."""
    con = duckdb.connect()
    try:
        vals = ", ".join(
            "(" + ", ".join("NULL" if v is None
                            else "'" + str(v).replace("'", "''") + "'"
                            for v in r) + ")"
            for r in rows)
        return {r[0]: (r[1], r[2]) for r in con.sql(f"""
            WITH s(source, rn, d, snippet) AS (VALUES {vals}),
            md AS (SELECT source,
                          string_agg('| ' || d || ' | ' || snippet
                                     || ' |', chr(10) ORDER BY rn) AS body,
                          count(*) AS k
                   FROM s GROUP BY source),
            pr AS (SELECT source,
                          'User query: digest of source ' || source
                          || chr(10) || chr(10) || 'Top results:'
                          || chr(10) || '| doc_id | snippet |'
                          || chr(10) || '| --- | --- |' || chr(10)
                          || body || chr(10) || chr(10)
                          || 'Write a short comparative summary.' AS p,
                          k
                   FROM md)
            SELECT source,
                   'Summary[' || substr(md5(p), 1, 8) || ']: compared '
                   || (k + 1) || ' results for the query.' AS summary,
                   CAST(k AS BIGINT) AS n_rows
            FROM pr""").fetchall()}
    finally:
        con.close()


_MDISH = "intro\n| looks | like | a row\nrest of the document text here"


def test_unsanitized_markdownish_snippet_diverges():
    """Red-on-old-shape proof that the ADVICE hazard is real: a snippet
    containing a newline-pipe inflates stub_transport's '\\n| ' count
    past k+1, so the Python summary and the oracle's COUNT(*)-derived
    text disagree on the UNsanitized bytes."""
    from tripgogo_vector_search_spark.plans.rag import generate_summary
    raw = _MDISH[:40]
    assert "\n| " in raw, "fixture must carry the hazard"
    rows = [{"doc_id": "1", "snippet": raw}]
    py = generate_summary(rows, "digest of source a",
                          sleeper=lambda s: None)
    oracle = _duck_batch_oracle([("a", 1, "1", raw)])["a"][0]
    assert py != oracle
    assert "compared 3 results" in py      # 1 row counted twice
    assert "compared 2 results" in oracle  # k+1 = 2


def test_sanitized_snippet_matches_oracle_end_to_end(spark):
    """The registry recipe (engine-side CR/LF -> space on BOTH
    engines) restores byte-exact parity on the same hostile text,
    through the real applyInPandas operator."""
    from tripgogo_vector_search_spark.plans.rag import batch_rag_summaries
    d = spark.createDataFrame(
        [("a", 10, _MDISH, len(_MDISH)),
         ("a", 11, "plain text", 10),
         ("b", 20, "another\r\nrow | with pipes", 25)],
        "source string, doc_id bigint, text string, n_chars bigint")
    from pyspark.sql import Window as W
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(),
                                        F.col("doc_id").asc())
    pruned = (d.select("source", "doc_id", "text", "n_chars")
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= 3)
              .select("source", "rn",
                      F.col("doc_id").cast("string").alias("doc_id"),
                      F.coalesce(
                          F.regexp_replace(F.substring("text", 1, 40),
                                           "[\\n\\r]", " "),
                          F.lit("None")).alias("snippet")))
    got = {r.source: (r.summary, r.n_rows)
           for r in batch_rag_summaries(pruned).collect()}
    cand = [(r.source, r.rn, r.doc_id, r.snippet)
            for r in pruned.collect()]
    want = _duck_batch_oracle(cand)
    assert got == want
    # and the count text now reflects the true row count (+1 header)
    assert "compared 3 results" in got["a"][0]


# ---------------------------------------------------------------------------
# VERDICT r13 #3: NULL group keys form a well-defined 'None' group
# ---------------------------------------------------------------------------

def test_null_group_key_coalesces_to_none_group(spark):
    """A NULL source must neither crash the grouped map nor
    NULL-propagate through the oracle's ||: the registry coalesces the
    key to 'None' engine-side, and the oracle does the same, so both
    produce one well-defined group with identical digest."""
    from tripgogo_vector_search_spark.plans.rag import batch_rag_summaries
    d = spark.createDataFrame(
        [(None, 1, "orphan document", 15),
         (None, 2, "second orphan", 13),
         ("s1", 3, "homed document", 14)],
        "source string, doc_id bigint, text string, n_chars bigint")
    from pyspark.sql import Window as W
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(),
                                        F.col("doc_id").asc())
    pruned = (d.select(F.coalesce("source", F.lit("None")).alias("source"),
                       "doc_id", "text", "n_chars")
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= 3)
              .select("source", "rn",
                      F.col("doc_id").cast("string").alias("doc_id"),
                      F.coalesce(
                          F.regexp_replace(F.substring("text", 1, 40),
                                           "[\\n\\r]", " "),
                          F.lit("None")).alias("snippet")))
    got = {r.source: (r.summary, r.n_rows)
           for r in batch_rag_summaries(pruned).collect()}
    assert set(got) == {"None", "s1"}
    assert got["None"][1] == 2
    cand = [(r.source, r.rn, r.doc_id, r.snippet)
            for r in pruned.collect()]
    assert got == _duck_batch_oracle(cand)


# ---------------------------------------------------------------------------
# VERDICT r13 #1: the recall evals' query draw is fixed-SIZE
# ---------------------------------------------------------------------------

def test_eval_query_sample_is_fixed_size_and_deterministic(spark):
    """The sample must (a) be exactly n rows however large the corpus,
    (b) be a stable prefix under corpus growth for ids it already
    chose... (a) is the scale contract; determinism is (c): same draw
    twice. Plan shape: a TakeOrderedAndProject, not a global sort."""
    from tripgogo_vector_search_spark.plans.registry import (
        _eval_query_sample)
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(200)],
        "vec_id bigint, embedding array<float>")
    s1 = _eval_query_sample(emb, n=8)
    ids1 = [r.qid for r in s1.collect()]
    ids2 = [r.qid for r in _eval_query_sample(emb, n=8).collect()]
    assert len(ids1) == 8 and ids1 == ids2
    # doubling the corpus cannot grow the draw past n
    emb2 = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(400)],
        "vec_id bigint, embedding array<float>")
    assert len(_eval_query_sample(emb2, n=8).collect()) == 8
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # md5 order, ties by id: replay the draw in plain Python
    want = sorted(range(200),
                  key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                 i))[:8]
    assert sorted(ids1) == sorted(want)


# ---------------------------------------------------------------------------
# media_decode_dispatch: routing is CONTENT-based, not provenance-based
# ---------------------------------------------------------------------------

def test_sniff_media_kind_routes_by_content(spark):
    """A GIF that arrived 'mislabeled' still routes to the GIF
    decoder, and garbage routes nowhere: the sniff expression reads
    magic bytes, never a provenance column."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        sniff_media_kind, synth_gif_corpus)
    from tripgogo_vector_search_spark.operators.jpeg import (
        synth_jpeg_corpus)
    docs = spark.createDataFrame([(1, "payload text")],
                                 "doc_id bigint, text string")
    gif = synth_gif_corpus(docs).collect()[0].content
    jpg = synth_jpeg_corpus(docs).collect()[0].content
    blobs = [("gif", gif), ("jpg", jpg), ("junk", bytearray(b"\x00junk")),
             ("empty", None)]
    df = spark.createDataFrame(
        [(tag, bytearray(b) if b is not None else None)
         for tag, b in blobs], "tag string, content binary")
    got = {r.tag: r.kind
           for r in df.select("tag",
                              sniff_media_kind(F.col("content"))
                              .alias("kind")).collect()}
    assert got == {"gif": "image/gif", "jpg": "image/jpeg",
                   "junk": "unknown", "empty": "unknown"}


# ---------------------------------------------------------------------------
# ADVICE r13 low: cell_occupancy_guard's n_cells is required
# ---------------------------------------------------------------------------

def test_occupancy_guard_requires_n_cells(spark):
    from tripgogo_vector_search_spark.operators import dedup as DD
    cells = spark.createDataFrame([(i % 4,) for i in range(16)], "cid int")
    with pytest.raises(TypeError, match="n_cells"):
        DD.cell_occupancy_guard(cells, "cid")
    stats = DD.cell_occupancy_guard(cells, "cid", n_cells=4)
    assert stats["n_cells"] == 4
