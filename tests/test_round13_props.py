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
from pyspark.sql import functions as F, types as T


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


# ---------------------------------------------------------------------------
# VERDICT r12 #5: GIF through a REAL LZW layer
# ---------------------------------------------------------------------------

def _gif_lzw_encode(indices, mcs):
    """Genuinely COMPRESSING GIF-LZW reference encoder (the zlib.compress
    analogue of the PNG round): dictionary growth, variable code width
    with the early-change rule (width++ when next_code crosses
    2^width), clear-on-full reset. Emits LSB-first bit-packed bytes.
    Exists to prove the repo's decoder handles real compressed streams,
    not just the synthesis's clear-interleaved literals."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = []            # (code, width)
    width = mcs + 1

    def reset():
        return {(None, s): s for s in range(clear)}, clear + 2

    table, next_code = reset()
    out.append((clear, width))
    prev = None
    emitted_since_clear = 0
    for s in indices:
        assert 0 <= s < clear
        key = (prev, s)
        if key in table:
            prev = table[key]
            continue
        out.append((prev, width))
        emitted_since_clear += 1
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            out.append((clear, width))
            table, next_code = reset()
            width = mcs + 1
            emitted_since_clear = 0
        prev = s
    if prev is not None:
        out.append((prev, width))
        # the decoder adds a table entry for THIS code too (its adds
        # lag the encoder's by one); if that add crosses a width
        # boundary, the EOI must be written at the widened size —
        # found by the hypothesis roundtrip property (a constant run
        # whose flush lands exactly on the boundary desynchronizes an
        # encoder that only counts its own dictionary misses)
        if emitted_since_clear >= 1 and next_code < 4096:
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
    out.append((eoi, width))
    buf = bytearray()
    acc, nacc = 0, 0
    for code, w in out:
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            buf.append(acc & 255)
            acc >>= 8
            nacc -= 8
    if nacc:
        buf.append(acc & 255)
    return bytes(buf)


def _assemble_gif(w, h, indices, mcs=8, interlace=False, lct=None):
    """Assemble a complete GIF89a file around a REAL compressed LZW
    stream — the encoder-side third implementation the Spark kernel
    and plain-Python spec must both decode."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        _GIF_PALETTE_HEX)
    data = _gif_lzw_encode(indices, mcs)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])
    out += bytes.fromhex(_GIF_PALETTE_HEX)
    # a comment extension, to exercise the extension skip path
    out += bytes([0x21, 0xFE, 3]) + b"abc" + bytes([0])
    ipacked = (0x40 if interlace else 0)
    if lct is not None:
        ipacked |= 0x80 | 0x07          # 256-entry local table
    out += bytes([0x2C]) + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([ipacked])
    if lct is not None:
        out += lct
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def _decode_both(spark, blobs):
    """(plain-Python spec, Arrow kernel) results for a list of blobs."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        decode_gif_stats, parse_gif)
    spec = [parse_gif(b) for b in blobs]
    df = spark.createDataFrame(list(enumerate(blobs)),
                               "media_id bigint, content binary")
    krows = {r.media_id: tuple(r)[1:]
             for r in decode_gif_stats(df).collect()}
    kern = [None if all(v is None for v in krows[i]) else krows[i]
            for i in range(len(blobs))]
    return spec, kern


def _expected_stats(w, h, indices):
    from tripgogo_vector_search_spark.operators.multimodal import (
        _GIF_PALETTE)
    n = w * h
    si = sum(indices)
    sr = sum(_GIF_PALETTE[i][0] for i in indices)
    sg = sum(_GIF_PALETTE[i][1] for i in indices)
    sb = sum(_GIF_PALETTE[i][2] for i in indices)
    return (w, h, n, si / n, sr / n, sg / n, sb / n)


def test_gif_real_lzw_roundtrip_through_both_decoders(spark):
    """Streams from the genuinely compressing encoder — repetitive
    (deep dictionary chains, the KwKwK case), random (little
    compression), and constant (maximal chain reuse) — decode to the
    exact pixels through BOTH implementations, including the width
    growth the synthesis never emits."""
    import random
    rng = random.Random(13)
    cases = []
    rep = ([7, 7, 7, 8, 8, 7, 7, 7] * 100)[:640]       # KwKwK-heavy
    cases.append((8, 80, rep))
    cases.append((16, 50, [rng.randrange(256) for _ in range(800)]))
    cases.append((5, 40, [3] * 200))                    # constant run
    blobs = [_assemble_gif(w, h, px) for w, h, px in cases]
    spec, kern = _decode_both(spark, blobs)
    for (w, h, px), s, k in zip(cases, spec, kern):
        want = _expected_stats(w, h, px)
        assert s is not None and k is not None
        for a, b in zip(s, want):
            assert abs(a - b) < 1e-12
        for a, b in zip(k, want):
            assert abs(a - b) < 1e-12


def test_gif_lzw_width_growth_and_table_pressure(spark):
    """Small minimum code size forces the table through every width
    (3..12 bits) and into the clear-on-full regime; the decoders must
    track the encoder's early-change width schedule exactly."""
    import random
    rng = random.Random(29)
    px = [rng.randrange(4) for _ in range(3600)]        # mcs=2, w*h=3600
    blob = _assemble_gif(60, 60, px, mcs=2)
    spec, kern = _decode_both(spark, [blob])
    want = _expected_stats(60, 60, px)
    assert spec[0] is not None and kern[0] is not None
    for a, b in zip(spec[0], want):
        assert abs(a - b) < 1e-12
    for a, b in zip(kern[0], want):
        assert abs(a - b) < 1e-12


def test_gif_interlace_flag_and_local_color_table(spark):
    """Interlacing permutes row order only — channel MEANS are
    invariant, so the flag is accepted; a local color table must WIN
    over the global one (the means shift to the local palette)."""
    px = list(range(200)) + list(range(56, 256))
    blob_i = _assemble_gif(20, 20, px, interlace=True)
    lct = bytes(((5 * i + 9) % 256) for i in range(768))
    blob_l = _assemble_gif(20, 20, px, lct=lct)
    spec, kern = _decode_both(spark, [blob_i, blob_l])
    want = _expected_stats(20, 20, px)
    for a, b in zip(spec[0], want):
        assert abs(a - b) < 1e-12
    n = 400
    want_l = (20, 20, n, sum(px) / n,
              sum(lct[3 * i] for i in px) / n,
              sum(lct[3 * i + 1] for i in px) / n,
              sum(lct[3 * i + 2] for i in px) / n)
    for a, b in zip(spec[1], want_l):
        assert abs(a - b) < 1e-12
    assert kern[0] == spec[0] and kern[1] == spec[1]


def test_gif_decoders_fuzz_total_and_agree(spark):
    """Hostile bytes: single-byte mutations, truncations, and garbage
    must never raise in either implementation, and both must return
    the SAME verdict (None/None or equal stats) — the WAV/BMP/PNG
    fuzz-total discipline."""
    import random
    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_gif)
    rng = random.Random(113)
    base = _assemble_gif(8, 25, [rng.randrange(256) for _ in range(200)])
    blobs = [base]
    for _ in range(120):
        b = bytearray(base)
        b[rng.randrange(len(b))] = rng.randrange(256)
        blobs.append(bytes(b))
    for _ in range(30):
        blobs.append(base[:rng.randrange(len(base))])
    blobs += [b"", b"GIF89a", b"\x00" * 64,
              bytes(rng.randrange(256) for _ in range(300))]
    spec, kern = _decode_both(spark, blobs)
    for i, (s, k) in enumerate(zip(spec, kern)):
        if s is None:
            assert k is None, i
        else:
            assert k is not None and all(
                abs(a - b) < 1e-12 for a, b in zip(k, s)), i


def test_gif_synthesis_emits_standard_9bit_streams(spark):
    """The Catalyst synthesis' clear-interleave invariant: every code
    fits 9 bits because a CLEAR lands at least every 250 literals —
    checked by decoding a >250-pixel document (group boundary
    crossed) and a 0-row document (header-only, NULL stats) through
    the plain-Python spec."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_gif, synth_gif_corpus)
    docs = spark.createDataFrame(
        [(6, "q" * 501), (7, "zz")],   # id 6 -> w=2..? 6%6+2=2; 7 -> 3
        "doc_id bigint, text string")
    rows = {r.media_id: bytes(r.content)
            for r in synth_gif_corpus(docs).collect()}
    got = parse_gif(rows[6])
    assert got is not None and got[0] == 2 and got[1] == 250
    assert got[3] == ord("q")                   # mean of a constant
    assert parse_gif(rows[7]) is None           # h=0: header-only file
    assert rows[7][:6] == b"GIF89a" and rows[7][-1:] == b"\x3b"


def test_gif_lzw_encode_decode_property():
    """Property: for ANY index stream and minimum code size, the
    compressing reference encoder's stream decodes back to exactly the
    input through the plain-Python spec decoder (hypothesis over
    stream content, length, alphabet size, and repetition structure —
    drives the table through growth, KwKwK, and clear-on-full)."""
    from hypothesis import given, settings, strategies as st
    from tripgogo_vector_search_spark.operators.multimodal import (
        _gif_lzw_decode)

    @settings(max_examples=150, deadline=None)
    @given(st.integers(2, 8).flatmap(
        lambda mcs: st.tuples(
            st.just(mcs),
            st.lists(st.integers(0, (1 << mcs) - 1),
                     min_size=1, max_size=400),
            # a repetition factor to build dictionary-heavy streams
            st.integers(1, 12))))
    def roundtrip(case):
        mcs, base, rep = case
        px = (base * rep)[:3000]
        data = _gif_lzw_encode(px, mcs)
        got = _gif_lzw_decode(mcs, data, len(px))
        assert got == px

    roundtrip()


def test_gif_first_image_contract_and_gif87a(spark):
    """Container-walk contract on real-world shapes: a GIF87a
    signature is accepted; an ANIMATED file (graphic-control
    extensions + a second image descriptor) reports the FIRST frame's
    stats — web corpora are full of animations, and both
    implementations must agree on which pixels the stats describe."""
    px1 = [10, 20, 30, 40, 50, 60]
    px2 = [200, 210, 220, 230, 240, 250]
    base = bytearray(_assemble_gif(3, 2, px1))
    # splice a graphic-control extension + a SECOND image before the
    # trailer (reusing the first frame's encoder output for frame 2)
    second = bytearray()
    second += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])     # GCE + terminator
    second += bytes([0x2C]) + b"\x00\x00\x00\x00"
    second += (3).to_bytes(2, "little") + (2).to_bytes(2, "little")
    second += bytes([0])
    data2 = _gif_lzw_encode(px2, 8)
    second += bytes([8])
    for i in range(0, len(data2), 255):
        c = data2[i:i + 255]
        second += bytes([len(c)]) + c
    second += bytes([0])
    multi = bytes(base[:-1]) + bytes(second) + b"\x3b"
    gif87 = b"GIF87a" + bytes(base[6:])
    spec, kern = _decode_both(spark, [multi, gif87])
    want = _expected_stats(3, 2, px1)
    for got in (spec[0], kern[0], spec[1], kern[1]):
        assert got is not None
        for a, b in zip(got, want):
            assert abs(a - b) < 1e-12


# ---------------------------------------------------------------------------
# media_quality_gate: curation flags over DECODED stats
# ---------------------------------------------------------------------------

def test_media_quality_gate_fires_on_fixture_and_degenerates(spark):
    """The gate must fire on REAL data (a gate that never gates is
    untested by green rows alone) — fixture distribution pinned — and
    degenerate objects must flow to (undecodable=True, dimension
    flags NULL, keep=False)."""
    from tripgogo_vector_search_spark.plans.registry import QUERIES
    rows = QUERIES["media_quality_gate"](
        spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 500
    assert sum(r.undecodable for r in rows) == 0
    assert sum(bool(r.too_small) for r in rows) == 15
    assert sum(bool(r.extreme_aspect) for r in rows) == 219
    assert sum(r.keep for r in rows) == 266
    assert all(isinstance(r.keep, bool) for r in rows)  # total verdict
    # degenerate objects through the same synth+decode+flag chain
    from tripgogo_vector_search_spark.operators.multimodal import (
        decode_gif_stats, synth_gif_corpus)
    docs = spark.createDataFrame([(6, None), (12, "x")],
                                 "doc_id bigint, text string")
    s = decode_gif_stats(synth_gif_corpus(docs))
    dec = F.col("width").isNotNull()
    got = {r.media_id: r for r in
           s.select("media_id", (~dec).alias("undecodable"),
                    F.when(dec, F.col("n_pixels") < 64).alias("too_small"),
                    F.coalesce(dec & (F.col("n_pixels") >= 64)
                               & (F.col("height") <= 16 * F.col("width")),
                               F.lit(False)).alias("keep")).collect()}
    for mid in (6, 12):   # NULL text / sub-row text: both unreadable
        assert got[mid].undecodable is True
        assert got[mid].too_small is None
        assert got[mid].keep is False
