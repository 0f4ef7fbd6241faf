"""Independent reference checks for the round-11 additions: plain
Python (pyarrow + hashlib + math — no Spark, no DuckDB) recomputation
from the same parquet. Third implementation — catches the case where
the Spark plan and its SQL oracle share a mistake (the two-engine gate
cannot see that class)."""

from __future__ import annotations

import collections
import hashlib
import math
from decimal import Decimal

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE
from tripgogo_vector_search_spark.plans.registry import QUERIES

SF = SF_SMOKE
K = 64  # DSIR_BUCKETS


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    return list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))


def _bucket(gram: str) -> int:
    h = hashlib.md5(gram.encode()).hexdigest()
    b = 0
    for i in range(6):
        b = (b << 1) | (1 if h[i] in "89abcdef" else 0)
    return b


def _dsir_log_weights() -> dict[int, float]:
    """The dsir_importance_weights contract replayed in plain Python
    (the r10 reference, including the ADVICE r10 factor-double casts)."""
    db = collections.defaultdict(collections.Counter)
    target = {}
    for doc_id, text in _docs():
        ws = text.split(" ") if text is not None else []
        target[doc_id] = doc_id % 7 == 0
        for i in range(len(ws) - 1):
            db[doc_id][_bucket(ws[i] + " " + ws[i + 1])] += 1
    ct, cr = collections.Counter(), collections.Counter()
    for doc_id, counts in db.items():
        (ct if target[doc_id] else cr).update(counts)
    tt, tr = sum(ct.values()), sum(cr.values())
    delta = {b: Decimal(repr(round(math.log(
        float(ct[b] + 1) * float(tr + K)
        / (float(tt + K) * float(cr[b] + 1))), 12)))
        for b in set(ct) | set(cr)}
    out = {}
    for doc_id, is_t in target.items():
        if is_t:
            continue
        s = sum((Decimal(c) * delta[b]
                 for b, c in db.get(doc_id, {}).items()), Decimal(0))
        out[doc_id] = round(float(s), 6)
    return out


def test_dsir_resample_membership_matches_python_draw(spark):
    """The Gumbel-top-k draw replayed independently: u from md5, key =
    log_weight - ln(-ln(u)) rounded to 1e-12, top 100 by (key DESC,
    doc_id ASC). Set membership AND order-free identity of the drawn
    ids must match the Spark plan."""
    got = [r.doc_id for r in
           QUERIES["dsir_resample"](spark, SF).collect()]
    assert len(got) == len(set(got)) == 100
    lw = _dsir_log_weights()
    keyed = []
    for doc_id, w in lw.items():
        hx = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        u = (int(hx, 16) + 0.5) / 2 ** 32
        keyed.append((round(w - math.log(-math.log(u)), 12), -doc_id,
                      doc_id))
    keyed.sort(reverse=True)
    want = [doc_id for _, _, doc_id in keyed[:100]]
    assert set(got) == set(want)
    # the draw is weight-proportional, not a plain top-by-weight cut:
    # the selected set must differ from the 100 largest raw weights
    # (equality would mean the Gumbel noise is not being applied)
    by_weight = sorted(lw, key=lambda d: (-lw[d], d))[:100]
    assert set(want) != set(by_weight)


# -- CCNet hashed-LM perplexity scoring --------------------------------------

def _lm_ce_python() -> dict[int, tuple[int, float | None]]:
    """lm_cross_entropy replayed in plain Python: add-1-smoothed bucket
    log-probs from the doc_id%7 reference slice, per-doc DECIMAL sum,
    ce = round(-float(s)/n, 6)."""
    db = collections.defaultdict(collections.Counter)
    ref = {}
    for doc_id, text in _docs():
        ws = text.split(" ") if text is not None else []
        ref[doc_id] = doc_id % 7 == 0
        for i in range(len(ws) - 1):
            db[doc_id][_bucket(ws[i] + " " + ws[i + 1])] += 1
    ct = collections.Counter()
    for doc_id, counts in db.items():
        if ref[doc_id]:
            ct.update(counts)
    tt = sum(ct.values())
    lp = {b: Decimal(repr(round(
        math.log(float(ct[b] + 1) / float(tt + K)), 12)))
        for b in range(K)}
    out = {}
    for doc_id, is_ref in ref.items():
        if is_ref:
            continue
        counts = db.get(doc_id, {})
        n = sum(counts.values())
        if n == 0:
            out[doc_id] = (0, None)
            continue
        s = sum((Decimal(c) * lp[b] for b, c in counts.items()),
                Decimal(0))
        out[doc_id] = (n, round(-float(s) / n, 6))
    return out


def test_lm_cross_entropy_matches_python_reference(spark):
    """The full chain (shared explode, DECIMAL log-probs, DECIMAL
    accumulation) equals a from-scratch Python recomputation — the
    third implementation that catches a mistake the Spark plan and its
    SQL oracle could share."""
    got = {r["doc_id"]: (r["n_grams"], r["cross_entropy"]) for r in
           QUERIES["lm_cross_entropy"](spark, SF).collect()}
    assert got == _lm_ce_python()


def test_ccnet_buckets_match_python_terciles(spark):
    """Tercile membership and per-bucket DECIMAL means replayed in
    plain Python with the same rank rule (value at rank ceil(q*n))."""
    ce = sorted(v for _n, v in _lm_ce_python().values()
                if v is not None)
    n = len(ce)
    t1 = ce[max(math.ceil((1 / 3) * n), 1) - 1]
    t2 = ce[max(math.ceil((2 / 3) * n), 1) - 1]
    want = {}
    for label, vals in (
            ("head", [v for v in ce if v <= t1]),
            ("middle", [v for v in ce if t1 < v <= t2]),
            ("tail", [v for v in ce if v > t2])):
        s = sum((Decimal(repr(v)) for v in vals), Decimal(0))
        want[label] = (len(vals), round(float(s) / len(vals), 6))
    got = {r["ppl_bucket"]: (r["n_docs"], r["avg_ce"]) for r in
           QUERIES["ccnet_ppl_buckets"](spark, SF).collect()}
    assert got == want


# -- Product quantization -----------------------------------------------------

_PQ_M, _PQ_SUB, _PQ_K = 4, 16, 8


def _pq_python():
    """pq_encode_error replayed in plain Python: float32 elements
    promoted to double, sequential-order L2^2 folds, DECIMAL(.,12)
    HALF_UP centroid sums (the cast both engines now share), one Lloyd
    round, (d, cid)-tiebroken argmin."""
    from decimal import ROUND_HALF_UP

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vecs = {i: [float(x) for x in v] for i, v in
            zip(t.column(0).to_pylist(), t.column(1).to_pylist())}

    def l2sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def sub(v, m):
        return v[m * _PQ_SUB:(m + 1) * _PQ_SUB]

    def assign(cb):
        out = {}
        for i, v in vecs.items():
            for m in range(_PQ_M):
                xs = sub(v, m)
                best = min((l2sq(xs, cv), cid)
                           for cid, cv in cb[m].items())
                out[(i, m)] = (best[1], best[0])
        return out

    c0 = {m: {cid: sub(vecs[cid], m) for cid in range(_PQ_K)}
          for m in range(_PQ_M)}
    a1 = assign(c0)
    c1 = {m: {} for m in range(_PQ_M)}
    for m in range(_PQ_M):
        for cid in range(_PQ_K):
            members = [sub(vecs[i], m) for i in vecs
                       if a1[(i, m)][0] == cid]
            if not members:
                continue
            c1[m][cid] = [
                float(sum((Decimal(repr(xs[d])).quantize(
                    Decimal("1e-12"), rounding=ROUND_HALF_UP)
                    for xs in members), Decimal(0))) / len(members)
                for d in range(_PQ_SUB)]
    a2 = assign(c1)
    out = {}
    for i in vecs:
        codes = ",".join(str(a2[(i, m)][0]) for m in range(_PQ_M))
        s = 0.0
        for m in range(_PQ_M):
            s = s + a2[(i, m)][1]
        out[i] = (codes, round(s / (_PQ_M * _PQ_SUB), 6))
    return out


def test_pq_encode_matches_python_reference(spark):
    """Codebook training (DECIMAL Lloyd round), code assignment and
    reconstruction error replayed from the raw parquet floats in plain
    Python — the third implementation for the PQ family."""
    got = {r["vec_id"]: (r["codes"], r["recon_mse"]) for r in
           QUERIES["pq_encode_error"](spark, SF).collect()}
    assert got == _pq_python()


def test_pq_adc_matches_python_replay(spark):
    """The ADC search replayed in plain Python over the replayed
    codebooks/codes: per-subspace query-to-centroid LUT with the same
    sequential folds, estimate = m-ordered LUT sum, top-10 by
    (round(est, 6), vec_id). The whole cut must match — and the exact
    column must equal brute-force L2^2 from the raw floats. (No recall
    floor is asserted: the fixture embeddings are near-isotropic, so
    exact distances concentrate in a ~5% band and k=8 codebooks
    cannot rank inside it — the ADC contract here is estimator
    fidelity, which IS sharp.)"""
    from decimal import ROUND_HALF_UP

    from tripgogo_vector_search_spark.plans.flagship import QUERY_VEC

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vecs = {i: [float(x) for x in v] for i, v in
            zip(t.column(0).to_pylist(), t.column(1).to_pylist())}

    def l2sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def sub(v, m):
        return v[m * _PQ_SUB:(m + 1) * _PQ_SUB]

    # rebuild c1 + codes exactly as _pq_python does
    c0 = {m: {cid: sub(vecs[cid], m) for cid in range(_PQ_K)}
          for m in range(_PQ_M)}

    def assign(cb):
        return {(i, m): min((l2sq(sub(v, m), cv), cid)
                            for cid, cv in cb[m].items())[1]
                for i, v in vecs.items() for m in range(_PQ_M)}

    a1 = assign(c0)
    c1 = {m: {} for m in range(_PQ_M)}
    for m in range(_PQ_M):
        for cid in range(_PQ_K):
            members = [sub(vecs[i], m) for i in vecs
                       if a1[(i, m)] == cid]
            if members:
                c1[m][cid] = [
                    float(sum((Decimal(repr(xs[d])).quantize(
                        Decimal("1e-12"), rounding=ROUND_HALF_UP)
                        for xs in members), Decimal(0))) / len(members)
                    for d in range(_PQ_SUB)]
    a2 = assign(c1)
    lut = {(m, cid): l2sq(sub(QUERY_VEC, m), cv)
           for m in range(_PQ_M) for cid, cv in c1[m].items()}
    est = {}
    for i in vecs:
        s = 0.0
        for m in range(_PQ_M):
            s = s + lut[(m, a2[(i, m)])]
        est[i] = round(s, 6)
    want = sorted(((est[i], i) for i in est))[:10]
    got = QUERIES["pq_adc_topk"](spark, SF).collect()
    got_pairs = sorted((r["approx_dist"], r["vec_id"]) for r in got)
    assert got_pairs == want
    for r in got:
        assert r["exact_dist"] == round(
            l2sq(vecs[r["vec_id"]], QUERY_VEC), 6)


# -- BMP decode ---------------------------------------------------------------

def _expected_bmp_stats(doc_id: int, text: str | None):
    """The BMP synthesis-side contract with no container at all: width
    by id%5, full BGR pixel rows from the text bytes, channel means
    over the used bytes only (stride padding excluded)."""
    if text is None:
        return (None,) * 6
    w = doc_id % 5 + 4
    raw = text.encode("utf-8")
    h = len(raw) // (3 * w)
    if h < 1:
        return (None,) * 6
    used = raw[:3 * w * h]
    n = w * h
    sums = [0, 0, 0]
    for i, byte in enumerate(used):
        sums[i % 3] += byte

    def r6(v: float) -> float:
        # Spark's F.round(double, 6): HALF_UP over the double's exact
        # binary expansion (Python's round is HALF_EVEN — it loses the
        # exact .0000005 ties integer/2^k means produce, e.g.
        # 12073/128 = 94.3203125)
        from decimal import ROUND_HALF_UP
        return float(Decimal(v).quantize(Decimal("1e-6"),
                                         rounding=ROUND_HALF_UP))

    return (w, h, n, r6(sums[0] / n), r6(sums[1] / n), r6(sums[2] / n))


def test_bmp_decode_matches_no_container_reference(spark):
    """The full chain (Catalyst BMP synthesis -> Arrow-kernel
    stride-aware decode) equals a plain-Python recomputation that
    never builds a container — a shared byte-layout mistake (e.g.
    counting the stride padding into the channel sums) fails here."""
    got = {r["media_id"]: tuple(r)[1:] for r in
           QUERIES["multimodal_bmp_stats"](spark, SF).collect()}
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    want = {d: _expected_bmp_stats(d, x) for d, x in
            zip(t.column(0).to_pylist(), t.column(1).to_pylist())}
    assert got == want


def test_bmp_synth_height_zero_is_header_only(spark):
    """A text too short for one pixel row must synthesize a 54-byte
    header-only file whose size/height/image-size fields all say so —
    ADVICE r11: the unguarded sequence(0, h-1) counted DOWN at h=0 and
    appended two garbage rows after a height-0 header."""
    import struct

    from tripgogo_vector_search_spark.operators.multimodal import (
        synth_bmp_corpus)
    docs = spark.createDataFrame([(0, "tiny")], "doc_id bigint, text string")
    (blob,) = synth_bmp_corpus(docs).collect()[0][1:2]
    data = bytes(blob)
    assert len(data) == 54                       # header only, no rows
    assert struct.unpack("<I", data[2:6])[0] == 54   # declared file size
    assert struct.unpack("<i", data[22:26])[0] == 0  # height 0
    assert struct.unpack("<I", data[34:38])[0] == 0  # image size 0


def test_parse_bmp_handles_real_layouts_and_rejects_the_rest():
    """Hand-built files: top-down (negative height) decodes with
    row-order-invariant means; 32-bpp / RLE-compressed / truncated
    pixel data / zero-height are rejected as None, never misread."""
    import struct

    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_bmp)

    def bmp(w, h_field, planes=1, bpp=24, comp=0, px=b"", offset=54):
        return (b"BM" + struct.pack("<I", offset + len(px))
                + b"\0\0\0\0" + struct.pack("<I", offset)
                + struct.pack("<I", 40)
                + struct.pack("<ii", w, h_field)
                + struct.pack("<HH", planes, bpp)
                + struct.pack("<II", comp, len(px)) + b"\0" * 16 + px)

    stride = (3 * 2 + 3) // 4 * 4
    rows = (bytes([1, 2, 3, 4, 5, 6]) + b"\0" * (stride - 6)
            + bytes([7, 8, 9, 10, 11, 12]) + b"\0" * (stride - 6))
    up = parse_bmp(bmp(2, 2, px=rows))
    down = parse_bmp(bmp(2, -2, px=rows))
    assert up == down == (2, 2, 4, 5.5, 6.5, 7.5)
    assert parse_bmp(bmp(2, 2, bpp=32, px=rows)) is None
    assert parse_bmp(bmp(2, 2, comp=1, px=rows)) is None
    assert parse_bmp(bmp(2, 0, px=rows)) is None
    assert parse_bmp(bmp(2, 2, px=rows[:10])) is None  # truncated
    assert parse_bmp(b"BM") is None


def test_parse_bmp_total_on_arbitrary_bytes():
    """Fuzz totality: any byte string — including 'BM'-prefixed
    garbage with hostile offset/size fields — decodes to a tuple or
    None, never raises."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_bmp)

    @settings(max_examples=300, deadline=None)
    @given(st.one_of(
        st.binary(max_size=200),
        st.binary(max_size=160).map(lambda b: b"BM" + b)))
    def run(data):
        out = parse_bmp(data)
        assert out is None or (len(out) == 6 and out[2] > 0)

    run()


def test_bmp_decode_plan_is_map_only(spark):
    """Scale pin: one Arrow pass over the scan — no Exchange; pixel
    bytes never move between executors."""
    plan = (QUERIES["multimodal_bmp_stats"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan


# -- Gopher rule battery -----------------------------------------------------

_GOPHER_STOPS = {"the", "and", "of", "to", "in", "is", "that", "with",
                 "for", "it"}


def _gopher_python(text: str | None):
    if text is None:
        return (None,) * 6
    ws = text.split(" ")
    n = len(ws)
    sum_len = sum(len(t) for t in ws)
    n_alpha = sum(1 for t in ws if any(c.isascii() and c.isalpha()
                                       for c in t))
    stop_hits = sum(1 for t in ws if t.lower() in _GOPHER_STOPS)
    n_sym = text.count("#") + text.count("...")
    flags = (50 <= n <= 100_000,
             3 * n <= sum_len <= 10 * n,
             n_alpha * 5 >= n * 4,
             stop_hits >= 2,
             n_sym * 10 <= n)
    return (*flags, all(flags))


def test_gopher_gate_matches_python_reference(spark):
    """The published-threshold battery replayed in plain Python
    (str.count('...') counts non-overlapping occurrences — the same
    left-to-right semantics as both engines' replace-based count)."""
    got = {r["doc_id"]: tuple(r)[1:] for r in
           QUERIES["gopher_quality_gate"](spark, SF).collect()}
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    want = {d: _gopher_python(x) for d, x in
            zip(t.column(0).to_pylist(), t.column(1).to_pylist())}
    assert got == want


def test_gopher_gate_plan_is_map_only(spark):
    """Scale pin: one codegen'd projection over the scan — no
    Exchange, no Python stage."""
    plan = (QUERIES["gopher_quality_gate"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


# -- WAV/PCM decode (VERDICT r10 list #5) -----------------------------------

def _expected_wav_stats(doc_id: int, text: str | None):
    """The synthesis-side contract recomputed with no container at all:
    rate by id%3, samples = text bytes zero-padded to even length as
    int16-LE, rms over exact integer sum of squares."""
    if text is None:
        return (None,) * 6
    rate = (8000, 16000, 44100)[doc_id % 3]
    raw = text.encode("utf-8")
    if len(raw) % 2:
        raw += b"\x00"
    n = len(raw) // 2
    ss = 0
    for k in range(n):
        u = raw[2 * k] + 256 * raw[2 * k + 1]
        v = u - 65536 if u >= 32768 else u
        ss += v * v
    rms = round(float(ss / n) ** 0.5, 6) if n else None
    return (rate, 1, 16, n, round(n * 1000.0 / rate, 6), rms)


def test_wav_decode_matches_no_container_reference(spark):
    """The full registry chain (Catalyst WAV synthesis -> Arrow-kernel
    chunk-walk decode) equals a plain-Python recomputation that never
    builds a container — if synthesis and decode shared a byte-layout
    mistake, this catches it."""
    got = {r["media_id"]: (r["sample_rate"], r["n_channels"],
                           r["bits_per_sample"], r["n_samples"],
                           r["duration_ms"], r["rms"])
           for r in QUERIES["multimodal_wav_stats"](spark, SF).collect()}
    want = {doc_id: _expected_wav_stats(doc_id, text)
            for doc_id, text in _docs()}
    assert got == want


def test_wav_roundtrip_with_stdlib_wave(spark):
    """Both directions against the independent stdlib codec:
    synthesized files open in `wave` with the advertised header, and
    `wave`-written files (stereo, non-synth rate, negative samples)
    decode exactly through parse_wav — proving a REAL container parse,
    not a synth-shaped shortcut."""
    import io
    import struct
    import wave

    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_wav, synth_wav_corpus)

    docs = spark.createDataFrame(
        [(0, "hello world"), (2, "odd")], "doc_id bigint, text string")
    for r in synth_wav_corpus(docs).collect():
        w = wave.open(io.BytesIO(bytes(r["content"])))
        rate, _, _, n, _, _ = parse_wav(bytes(r["content"]))
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth(),
                w.getnframes()) == (rate, 1, 2, n)

    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(2)
    ww.setsampwidth(2)
    ww.setframerate(22050)
    frames = struct.pack("<6h", 100, -100, 32767, -32768, 0, 7)
    ww.writeframes(frames)
    ww.close()
    rate, n_ch, bits, n_frames, dur, rms = parse_wav(buf.getvalue())
    assert (rate, n_ch, bits, n_frames) == (22050, 2, 16, 3)
    assert dur == 3 * 1000.0 / 22050
    ss = sum(v * v for v in struct.unpack("<6h", frames))
    assert rms == float(ss / 6) ** 0.5


def test_wav_decode_rejects_unreadable_payloads():
    """Corrupt objects decode to None (the kernel maps that to an
    all-NULL struct), never raise — a 100 TB media lake always
    carries garbage: truncated files, wrong containers, non-PCM or
    non-16-bit encodings, missing chunks."""
    import io
    import struct
    import wave

    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_wav)

    assert parse_wav(None) is None
    assert parse_wav(b"") is None
    assert parse_wav(b"not a wav") is None
    assert parse_wav(b"RIFF\x24\x00\x00\x00WAVE") is None  # no chunks
    # a valid container whose fmt says IEEE-float (3) or 8-bit: out of
    # the 16-bit-PCM decoder's scope, rejected not misread
    for audio_format, bits in ((3, 16), (1, 8)):
        body = struct.pack("<HHIIHH", audio_format, 1, 8000, 16000, 2,
                           bits)
        f = (b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8) +
             b"WAVE" + b"fmt " + struct.pack("<I", len(body)) + body +
             b"data" + struct.pack("<I", 0))
        assert parse_wav(f) is None
    # unknown chunks are skipped, not fatal: LIST before fmt/data
    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(8000)
    ww.writeframes(struct.pack("<2h", 5, -5))
    ww.close()
    base = buf.getvalue()
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    spliced = base[:12] + extra + base[12:]
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8) +
               spliced[8:])
    assert parse_wav(spliced) == parse_wav(base)


def test_parse_wav_total_on_arbitrary_bytes():
    """Fuzz the container walk: ANY byte string decodes to a tuple or
    None — never an exception (a 100 TB media lake feeds the decoder
    truncated, mislabeled and hostile objects; the chunk walk indexes
    bytes from length fields it must never trust). Includes
    RIFF-prefixed garbage so the walker itself is exercised, not just
    the preamble check."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_wav)

    @settings(max_examples=300, deadline=None)
    @given(st.one_of(
        st.binary(max_size=200),
        st.binary(max_size=120).map(lambda b: b"RIFF" + b),
        st.binary(max_size=120).map(
            lambda b: b"RIFF" + bytes([len(b) % 256, 0, 0, 0])
            + b"WAVE" + b)))
    def run(data):
        out = parse_wav(data)
        assert out is None or (len(out) == 6 and out[3] >= 0)

    run()


def test_parse_wav_roundtrips_generated_wave_files():
    """Generative round-trip against stdlib `wave`: random rate /
    channel-count / frame-count files must decode to exactly the
    header wave wrote and the RMS of the samples it carried."""
    import io
    import struct
    import wave

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_wav)

    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 2), st.integers(1, 96000),
           st.lists(st.integers(-32768, 32767), min_size=0,
                    max_size=40))
    def run(n_ch, rate, vals):
        vals = vals[:len(vals) - (len(vals) % n_ch)]
        buf = io.BytesIO()
        ww = wave.open(buf, "wb")
        ww.setnchannels(n_ch)
        ww.setsampwidth(2)
        ww.setframerate(rate)
        ww.writeframes(struct.pack(f"<{len(vals)}h", *vals))
        ww.close()
        got = parse_wav(buf.getvalue())
        n_frames = len(vals) // n_ch
        assert got[:4] == (rate, n_ch, 16, n_frames)
        assert got[4] == n_frames * 1000.0 / rate
        if vals:
            ss = sum(v * v for v in vals)
            assert got[5] == float(ss / len(vals)) ** 0.5
        else:
            assert got[5] is None

    run()


def test_wav_decode_plan_is_map_only(spark):
    """Scale pin: the decode is one Arrow pass over the scan — no
    Exchange (shuffle) anywhere in the physical plan; payload bytes
    never move between executors."""
    plan = (QUERIES["multimodal_wav_stats"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan
