"""Independent reference checks for the round-12 additions: plain
Python (pyarrow + stdlib zlib/struct — no Spark, no DuckDB)
recomputation from the same parquet, plus a zlib.compress-based PNG
reference ENCODER so the decoder is exercised on REAL deflate streams
and all five spec filters, which the Catalyst synthesis never emits.
Third implementation — catches the case where the Spark plan and its
SQL oracle share a mistake (the two-engine gate cannot see that
class)."""

from __future__ import annotations

import struct
import zlib
from decimal import Decimal

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE
from tripgogo_vector_search_spark.plans.registry import QUERIES

SF = SF_SMOKE


# -- PNG decode ---------------------------------------------------------------

def _expected_png_stats(doc_id: int, text: str | None):
    """The PNG synthesis-side contract with no container at all: width
    by id%7, RGB rows from the text bytes, height capped to one
    deflate stored block, channel means over the used bytes only."""
    if text is None:
        return (None,) * 6
    w = doc_id % 7 + 3
    raw = text.encode("utf-8")
    h = min(len(raw) // (3 * w), 65535 // (3 * w + 1))
    if h < 1:
        return (None,) * 6
    used = raw[:3 * w * h]
    n = w * h
    sums = [0, 0, 0]
    for i, byte in enumerate(used):
        sums[i % 3] += byte

    def r6(v: float) -> float:
        # Spark's F.round(double, 6) is HALF_UP over the double's
        # exact binary expansion (Python's round is HALF_EVEN)
        from decimal import ROUND_HALF_UP
        return float(Decimal(v).quantize(Decimal("1e-6"),
                                         rounding=ROUND_HALF_UP))

    return (w, h, n, r6(sums[0] / n), r6(sums[1] / n), r6(sums[2] / n))


def test_png_decode_matches_no_container_reference(spark):
    """The full chain (Catalyst PNG synthesis with a real zlib layer
    -> CRC-verified inflate-and-unfilter decode) equals a plain-Python
    recomputation that never builds a container — a shared mistake in
    the byte layout, the filter convention, or the stored-block cap
    fails here."""
    got = {r["media_id"]: tuple(r)[1:] for r in
           QUERIES["multimodal_png_stats"](spark, SF).collect()}
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    want = {d: _expected_png_stats(d, x) for d, x in
            zip(t.column(0).to_pylist(), t.column(1).to_pylist())}
    assert got == want


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _encode_png(w: int, h: int, pixels: bytes,
                filters: list[int]) -> bytes:
    """Reference PNG encoder INDEPENDENT of the Catalyst synthesis:
    real zlib.compress deflate (dynamic Huffman, not stored blocks)
    and any per-row filter type 0-4, applied per the spec."""
    stride = 3 * w
    out = bytearray()
    prev = bytes(stride)
    for r in range(h):
        line = pixels[r * stride:(r + 1) * stride]
        ft = filters[r % len(filters)]
        out.append(ft)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = (line[i] - a) & 255
            elif ft == 2:
                v = (line[i] - b) & 255
            elif ft == 3:
                v = (line[i] - (a + b) // 2) & 255
            else:
                v = (line[i] - _paeth(a, b, c)) & 255
            out.append(v)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b""))


def _ref_corpus():
    """Deterministic pixel images covering every filter type and a
    multi-IDAT / compressed-stream shape the synthesis never emits."""
    cases = []
    for seed, (w, h, filters) in enumerate([
            (3, 4, [0]), (4, 3, [1]), (5, 2, [2]), (3, 3, [3]),
            (4, 4, [4]), (6, 5, [0, 1, 2, 3, 4]), (1, 1, [4]),
            (7, 6, [3, 4])]):
        px = bytes((i * 37 + seed * 101 + (i * i) % 251) % 256
                   for i in range(3 * w * h))
        cases.append((w, h, px, filters))
    return cases


def test_parse_png_roundtrips_real_deflate_and_all_filters():
    """An independent zlib.compress encoder (real dynamic-Huffman
    deflate, filters 0-4 incl. Average/Paeth) -> parse_png recovers
    the exact pixel statistics. The Catalyst synthesis only emits
    stored blocks and None/Sub — this is the proof the decoder
    implements the format, not the fixture."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_png)
    for w, h, px, filters in _ref_corpus():
        got = parse_png(_encode_png(w, h, px, filters))
        n = w * h
        sums = [0, 0, 0]
        for i, b in enumerate(px):
            sums[i % 3] += b
        assert got == (w, h, n, sums[0] / n, sums[1] / n, sums[2] / n), \
            (w, h, filters)


def test_png_kernel_equals_spec_on_encoder_outputs(spark):
    """The numpy-vectorized kernel (cumsum Sub, vector Up) and the
    plain-Python spec agree on the reference-encoder corpus — the
    filter paths the Catalyst fixture never exercises included."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        decode_png_stats, parse_png)
    blobs = [(i, _encode_png(w, h, px, filters))
             for i, (w, h, px, filters) in enumerate(_ref_corpus())]
    media = spark.createDataFrame(blobs, "media_id bigint, content binary")
    got = {r["media_id"]: tuple(r)[1:]
           for r in decode_png_stats(media).collect()}
    want = {i: parse_png(b) for i, b in blobs}
    assert got == want


def test_parse_png_rejects_corruption():
    """CRC damage, truncation, bad zlib bytes, unsupported IHDR shapes
    and length lies all decode to None, never an exception."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_png)
    w, h, px, filters = _ref_corpus()[0]
    good = _encode_png(w, h, px, filters)
    assert parse_png(good) is not None
    flipped = bytearray(good)
    flipped[20] ^= 0xFF                       # inside IHDR payload
    assert parse_png(bytes(flipped)) is None  # CRC mismatch
    assert parse_png(good[:-7]) is None       # truncated IEND
    assert parse_png(good[:30]) is None       # truncated mid-chunk
    assert parse_png(b"\x89PNG\r\n\x1a\n") is None
    # 16-bit depth and palette color types are out of scope -> None
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    deep = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * (1 + 6 * w)))
            + _chunk(b"IEND", b""))
    assert parse_png(deep) is None
    # declared geometry disagreeing with the inflated length -> None
    ihdr = struct.pack(">IIBBBBB", w + 1, h, 8, 2, 0, 0, 0)
    lied = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT",
                     zlib.compress(bytes(h * (1 + 3 * w))))
            + _chunk(b"IEND", b""))
    assert parse_png(lied) is None


def test_parse_png_total_on_arbitrary_bytes():
    """parse_png returns a 6-tuple or None on ANY byte string — never
    raises (hostile chunk lengths, fake signatures, garbage zlib)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_png)

    sig = b"\x89PNG\r\n\x1a\n"

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400),
           st.booleans())
    def run(data, with_sig):
        out = parse_png((sig + data) if with_sig else data)
        assert out is None or (len(out) == 6 and out[0] > 0)

    run()


# -- SemDeDup ------------------------------------------------------------------

def _r6(v: float) -> float:
    from decimal import ROUND_HALF_UP
    return float(Decimal(v).quantize(Decimal("1e-6"),
                                     rounding=ROUND_HALF_UP))


def _semdedup_python():
    """SemDeDup replayed in plain Python: 16-seed assignment (argmin
    cosine, cid tie-break), within-cell pairs at rounded distance
    <= 0.60, and the (centroid_dist DESC, vec_id ASC) tournament."""
    import math

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vecs = {i: [float(x) for x in v] for i, v in
            zip(t.column(0).to_pylist(), t.column(1).to_pylist())}

    def cosd(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot = dot + x * y
        na = 0.0
        for x in a:
            na = na + x * x
        nb = 0.0
        for y in b:
            nb = nb + y * y
        return 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))

    cents = {i: vecs[i] for i in vecs if i < 16}
    a = {}
    for i, v in vecs.items():
        cid, cd = min(((c, cosd(v, cv)) for c, cv in cents.items()),
                      key=lambda t: (t[1], t[0]))
        a[i] = (cid, _r6(cd))
    out = {}
    for i, (cid, cd) in a.items():
        keep = True
        for j, (cid2, cd2) in a.items():
            if j == i or cid2 != cid:
                continue
            if _r6(cosd(vecs[i], vecs[j])) <= 0.60 and \
                    (cd2 > cd or (cd2 == cd and j < i)):
                keep = False
                break
        out[i] = (cid, cd, keep)
    return out


def test_semdedup_matches_python_reference(spark):
    """Cluster assignment, pair gating and the keep-farthest-from-
    centroid tournament replayed from the raw parquet floats — and the
    gate must actually fire (the fixture prunes a nonzero set)."""
    got = {r["vec_id"]: (r["cid"], r["centroid_dist"], r["keep"])
           for r in QUERIES["semdedup"](spark, SF).collect()}
    want = _semdedup_python()
    assert got == want
    assert any(not k for _, _, k in got.values())


# -- Learned subword tokenizer -------------------------------------------------

def _subword_python():
    """Vocabulary learning and greedy longest-match tokenization
    replayed from the raw parquet in plain Python (Counter + sorted —
    no Spark, no SQL, and a separately-written greedy loop)."""
    import collections

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    docs = list(zip(t.column(0).to_pylist(), t.column(1).to_pylist()))
    counts = collections.Counter()
    for d, x in docs:
        if d % 7 != 0 or x is None:
            continue
        for w in x.lower().split(" "):
            if not w:
                continue
            for L in (2, 3, 4):
                for i in range(len(w) - L + 1):
                    counts[w[i:i + L]] += 1
    vocab = {g for g, _ in sorted(counts.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:200]}

    def ntok(w: str) -> int:
        out, i = 0, 0
        while i < len(w):
            for L in (4, 3, 2, 1):
                if L == 1 or (i + L <= len(w) and w[i:i + L] in vocab):
                    i += L
                    out += 1
                    break
        return out

    res = {}
    for d, x in docs:
        if x is None:
            res[d] = (None, None, None)
            continue
        words = [w for w in x.lower().split(" ") if w]
        toks = sum(ntok(w) for w in words)
        fert = None if not words else float(
            Decimal(toks / len(words)).quantize(
                Decimal("1e-6"),
                rounding=__import__("decimal").ROUND_HALF_UP))
        res[d] = (len(words), toks, fert)
    return res


def test_subword_tokenize_matches_python_reference(spark):
    """Top-200 gram vocabulary (count DESC, gram ASC) and the greedy
    longest-match walk replayed in plain Python — and the learned
    grams must actually fire (fertility strictly below chars/word
    for at least one doc)."""
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility"])
           for r in QUERIES["subword_tokenize"](spark, SF).collect()}
    assert got == _subword_python()
    assert any(v[1] is not None and v[0] and v[1] < 3 * v[0]
               for v in got.values())


# -- C4 quality battery -------------------------------------------------------

def _expected_c4(text: str | None):
    """The C4 gate replayed with str.split — no Spark, no SQL."""
    if text is None:
        return (None,) * 5
    arr = text.split(".")
    n = len(arr)

    def retained(i: int, x: str) -> bool:
        if i == n - 1:
            t = x.rstrip()
            if not (t.endswith("!") or t.endswith("?")
                    or t.endswith('"')):
                return False
        if len([w for w in x.split(" ") if w != ""]) < 3:
            return False
        return "javascript" not in x.lower()

    nk = sum(1 for i, x in enumerate(arr) if retained(i, x))
    enough = nk >= 5
    no_lorem = "lorem ipsum" not in text.lower()
    no_brace = "{" not in text
    return (nk, enough, no_lorem, no_brace,
            enough and no_lorem and no_brace)


def test_c4_gate_matches_python_reference(spark):
    """Sentence retention (terminal punctuation on the last fragment,
    3-word minimum, javascript removal) and the three page rules
    replayed in plain Python over the raw parquet text."""
    got = {r["doc_id"]: tuple(r)[1:] for r in
           QUERIES["c4_quality_gate"](spark, SF).collect()}
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    want = {d: _expected_c4(x) for d, x in
            zip(t.column(0).to_pylist(), t.column(1).to_pylist())}
    assert got == want


def test_c4_gate_plan_is_map_only(spark):
    """One projection over the scan: no Exchange, no Python."""
    from tests.test_plan_shape import plan_of
    plan = plan_of(QUERIES["c4_quality_gate"](spark, SF))
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_png_decode_plan_is_map_only(spark):
    """Synthesis + decode is one map-only Arrow pass: no Exchange
    anywhere in the plan (payload bytes never shuffle)."""
    from tests.test_plan_shape import plan_of
    plan = plan_of(QUERIES["multimodal_png_stats"](spark, SF))
    assert "Exchange" not in plan


def test_png_synth_height_zero_or_null_is_well_formed(spark):
    """h = 0 emits a real PNG whose IHDR declares height 0 over an
    EMPTY (but valid) zlib stream — the decoder rejects it to NULL
    stats; NULL text synthesizes NULL content."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        parse_png, synth_png_corpus)
    docs = spark.createDataFrame([(0, "xy"), (1, None)],
                                 "doc_id bigint, text string")
    rows = {r["media_id"]: r["content"]
            for r in synth_png_corpus(docs).collect()}
    assert rows[1] is None
    data = bytes(rows[0])
    assert parse_png(data) is None            # height 0 -> unreadable
    # ... but the container itself is structurally sound: the IDAT
    # zlib stream inflates to zero bytes and every CRC checks out
    (ln,) = struct.unpack(">I", data[8:12])
    assert data[12:16] == b"IHDR" and ln == 13
    w_f, h_f = struct.unpack(">II", data[16:24])
    assert (w_f, h_f) == (3, 0)
    pos = 8 + 12 + 13
    (ln2,) = struct.unpack(">I", data[pos:pos + 4])
    assert data[pos + 4:pos + 8] == b"IDAT"
    stream = data[pos + 8:pos + 8 + ln2]
    assert zlib.decompress(stream) == b""
    (crc,) = struct.unpack(">I", data[pos + 8 + ln2:pos + 12 + ln2])
    assert crc == zlib.crc32(b"IDAT" + stream) & 0xFFFFFFFF


def test_png_kernel_total_on_arbitrary_bytes_via_spark(spark):
    """The Arrow kernel (not just the spec parser) is total on hostile
    bytes THROUGH the Spark execution path: signatures with garbage
    chunks, truncations, and random blobs decode to all-NULL structs,
    never a task failure."""
    import random

    from tripgogo_vector_search_spark.operators.multimodal import (
        decode_png_stats, parse_png)

    rng = random.Random(12)
    sig = b"\x89PNG\r\n\x1a\n"
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randrange(120)))
             for _ in range(40)]
    blobs += [sig + b for b in blobs[:20]]
    blobs += [None, b"", sig]
    rows = [(i, b) for i, b in enumerate(blobs)]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    got = {r["media_id"]: tuple(r)[1:]
           for r in decode_png_stats(media).collect()}
    for i, b in rows:
        want = parse_png(bytes(b) if b is not None else None)
        assert got[i] == (want if want else (None,) * 6), i
