"""Round-13 property pins: the three r12 ADVICE closures (watermark
millisecond truncation, single-point tokenizer case normalization,
canonical tpch_q12 NULL buckets), plus the round's new operators
(ivfpq_recall_eval, multimodal_gif_stats, llm_generate's oracle) —
third implementations and red-on-old-shape proofs.
"""

from __future__ import annotations

import inspect
import os
import time

import duckdb
import pytest
from pyspark.sql import functions as F, types as T

from tests.conftest import SF_CORRECTNESS as SF


# ---------------------------------------------------------------------------
# ADVICE r12 #1: the engine watermark is MILLISECOND-floored
# ---------------------------------------------------------------------------

def test_stream_session_window_watermark_is_ms_floored(spark, tmp_path):
    """Red-on-old-oracle proof for the ADVICE r12 truncation fix: the
    final event carries sub-millisecond microseconds (.000500), so the
    un-truncated arithmetic `s_end <= max(ts) - delay` would emit B
    (session end 10:30:00.000001 <= 10:30:00.000500) — but the ENGINE
    watermark is floor_ms(max) - delay = 10:30:00.000, and B stays
    open. A, ending exactly ON the floored watermark, emits (the
    non-strict boundary pinned in test_streaming_semantics)."""
    base = str(tmp_path / "swms")
    os.makedirs(base)
    t0 = time.time()
    sch = T.StructType([T.StructField("user_id", T.StringType()),
                        T.StructField("ts", T.TimestampType())])

    def write(name, rows, mtime):
        import datetime as dt
        df = spark.createDataFrame(
            [(u, dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S.%f"))
             for u, ts in rows], sch).coalesce(1)
        p = os.path.join(base, name)
        df.write.mode("overwrite").parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))

    write("f1", [("A", "2024-01-01 10:00:00.000000"),
                 ("B", "2024-01-01 10:00:00.000001")], t0 - 100)
    write("f2", [("Z", "2024-01-01 11:00:00.000500")], t0 - 50)
    src = (spark.readStream.schema(sch)
           .option("maxFilesPerTrigger", 1).parquet(base + "/*"))
    s = (src.withWatermark("ts", "30 minutes")
         .groupBy(F.session_window("ts", "30 minutes"), "user_id")
         .agg(F.count(F.lit(1)).alias("n")))
    q = (s.writeStream.outputMode("append")
         .format("memory").queryName("swms_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = sorted(r.user_id for r in spark.table("swms_out").collect())
    assert emitted == ["A"]


def test_streaming_oracles_truncate_watermark_to_ms():
    """Both streaming-sessionization oracles must carry the engine's
    millisecond arithmetic (EventTimeStats tracks max event time in
    epoch ms; the state timeout is set in epoch ms)."""
    from tripgogo_vector_search_spark.plans.registry import ORACLES
    for key in ("stream_session_window", "stream_sessionize"):
        assert "date_trunc('milliseconds'" in ORACLES[key], key


# ---------------------------------------------------------------------------
# ADVICE r12 #2: tokenizer case is normalized ONCE, engine-side
# ---------------------------------------------------------------------------

def test_tokenizer_kernel_never_lowercases():
    """The kernel must receive pre-lowered text (F.lower — the same
    Catalyst expression the vocab learning uses) and never apply
    Python's str.lower(), whose case mapping can diverge from the
    JVM's on non-ASCII codepoints. Red on the old shape."""
    from tripgogo_vector_search_spark.operators.tokenize import (
        subword_tokenize, subword_vocab)
    src = inspect.getsource(subword_tokenize)
    assert "t.lower()" not in src         # no Python-side case mapping
    assert "F.lower(F.col(text_col))" in src   # Catalyst normalization
    assert "F.lower" in inspect.getsource(subword_vocab)


def test_tokenizer_is_pure_function_of_spark_lowered_text(spark):
    """Single-normalization-point contract, checked on NON-ASCII input:
    the engine's token counts equal the plain-Python replay applied to
    the SPARK-lowered text (never Python-lowered), so whatever the JVM
    does with İ/Σ/ß is the one mapping the whole engine path sees."""
    from tripgogo_vector_search_spark.operators.tokenize import (
        subword_tokenize, tokenize_word)
    rows = [(0, "İstanbul HOTELS Straße"),
            (1, "ΣΙΓΜΑ summary SIGMA"),
            (2, "plain ascii words")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    vocab = ["st", "ss", "ma", "wor", "sum"]
    got = {r.doc_id: (r.n_words, r.n_tokens)
           for r in subword_tokenize(docs, vocab).collect()}
    lowered = {r.doc_id: r.lt
               for r in docs.select("doc_id",
                                    F.lower("text").alias("lt")).collect()}
    vset = frozenset(vocab)
    for did, lt in lowered.items():
        words = [w for w in lt.split(" ") if w != ""]
        want = (len(words), sum(tokenize_word(w, vset) for w in words))
        assert got[did] == want, did


# ---------------------------------------------------------------------------
# ADVICE r12 #3: canonical tpch_q12 NULL buckets, engine-symmetric
# ---------------------------------------------------------------------------

def test_tpch_q12_null_priority_in_neither_bucket(spark):
    """Canonical Q12 CASE semantics: a NULL o_orderpriority joins and
    counts toward neither bucket, on BOTH engines (the r11 shape
    classified it low; the r10 shape diverged across engines)."""
    import datetime as dt
    o_rows = [(1, dt.datetime(1995, 1, 1), "1-URGENT"),
              (2, dt.datetime(1995, 1, 1), "5-LOW"),
              (3, dt.datetime(1995, 1, 1), None)]
    l_rows = [(k, dt.datetime(1996, 6, 1), "R") for k in (1, 2, 3)]
    o = spark.createDataFrame(
        o_rows, "o_orderkey bigint, o_orderdate timestamp, "
                "o_orderpriority string")
    li = spark.createDataFrame(
        l_rows, "l_orderkey bigint, l_shipdate timestamp, "
                "l_returnflag string")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lo = ((F.col("o_orderpriority") != "1-URGENT")
          & (F.col("o_orderpriority") != "2-HIGH"))
    got = (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
           .groupBy("l_returnflag")
           .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high"),
                F.sum(F.when(lo, 1).otherwise(0)).alias("low"))
           .collect()[0])
    assert (got.high, got.low) == (1, 1)  # the NULL row is in neither
    con = duckdb.connect()
    con.sql("CREATE TABLE o AS SELECT * FROM (VALUES "
            "(1, '1-URGENT'), (2, '5-LOW'), (3, NULL)) t(k, pri)")
    want = con.sql(
        "SELECT sum(CASE WHEN pri IN ('1-URGENT','2-HIGH') THEN 1 "
        "ELSE 0 END), sum(CASE WHEN pri NOT IN ('1-URGENT','2-HIGH') "
        "THEN 1 ELSE 0 END) FROM o").fetchone()
    assert tuple(map(int, want)) == (got.high, got.low)


# ---------------------------------------------------------------------------
# VERDICT r12 #4: llm_generate is oracle-checkable
# ---------------------------------------------------------------------------

def test_llm_generate_matches_oracle_at_smoke_sf(spark):
    """The stub summary is a pure function of the top-k frame, and the
    DuckDB oracle replays the whole prompt construction (markdown
    string-agg + md5). Exact-tuple parity at the smoke SF — the
    driver-parity suite covers sf0.01, this pins a second corpus so
    the digest is data-dependent, not a frozen constant."""
    from tripgogo_vector_search_spark.plans.registry import ORACLES, QUERIES
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf}/embeddings.parquet')")
    srows = [tuple(r) for r in QUERIES["llm_generate"](spark, sf).collect()]
    drows = [tuple(r) for r in con.sql(ORACLES["llm_generate"]).fetchall()]
    assert srows == drows
    assert srows[0][0].startswith("Summary[") and srows[0][1] == 3


def test_llm_generate_display_frame_is_all_strings(spark):
    """Engine-side stringification contract: every cell handed to the
    prompt builder is already a string (Python str() must be an
    identity, or the md5 replay in SQL could never match)."""
    from tripgogo_vector_search_spark.plans.flagship import flagship_query
    top = flagship_query(spark, "/root/testdata/sf0.001")
    disp = top.select(
        F.col("vec_id").cast("string"),
        F.coalesce(F.col("label").cast("string"), F.lit("None")),
        F.col("distance_score").cast("decimal(18,6)").cast("string"),
        F.col("match_score").cast("decimal(10,2)").cast("string"))
    assert all(t == "string" for _, t in disp.dtypes)
