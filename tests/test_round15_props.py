"""Round-15 regression properties: the JPEG first-scan allocation
bound's true 1-bit-per-block floor (ADVICE r14 low #4) and the
single-pass media_decode_dispatch plan (VERDICT r14 list #1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _jpeg_dc_only_progressive(width: int, height: int) -> bytes:
    """Hand-assembled progressive (SOF2) grayscale file whose single
    DC-first scan uses a 1-BIT DC Huffman code (category 0 only, so
    every block costs exactly one bit — the legal minimum). With
    blocks-per-scan-byte between 4x and 8x, the old >= 2-bit bound
    assumption falsely NULLed this file; the true >= 1-bit floor
    accepts it. All DC diffs are 0, so every pixel is the level-shift
    value 128."""
    mw, mh = (width + 7) // 8, (height + 7) // 8
    out = bytearray(b"\xff\xd8")                       # SOI
    # DQT: table 0, 8-bit precision, all-ones
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
    # DHT: DC table 0 with ONE code of length 1 -> value 0 (category 0)
    bits = bytes([1] + [0] * 15)
    out += b"\xff\xc4" + (2 + 1 + 16 + 1).to_bytes(2, "big") \
        + b"\x00" + bits + b"\x00"
    # SOF2: 8-bit, height x width, 1 component (id 1, 1x1, qtable 0)
    out += b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08" \
        + height.to_bytes(2, "big") + width.to_bytes(2, "big") \
        + b"\x01" + b"\x01\x11\x00"
    # SOS: 1 component, DC table 0, spectral 0..0, Ah=Al=0
    out += b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01" \
        + b"\x01\x00" + b"\x00\x00\x00"
    n_blocks = mw * mh
    out += b"\x00" * ((n_blocks + 7) // 8)             # one '0' bit/block
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


def test_first_scan_bound_admits_one_bit_per_block_dc_scan(spark):
    from tripgogo_vector_search_spark.operators.jpeg import (
        decode_jpeg_stats, parse_jpeg)

    blob = _jpeg_dc_only_progressive(320, 8)           # 40 blocks
    # the falsely-NULLed band: 4x < blocks per remaining byte <= 8x
    entropy_plus_eoi = (40 + 7) // 8 + 2
    assert 4 * entropy_plus_eoi < 40 <= 8 * entropy_plus_eoi
    got = parse_jpeg(blob)
    assert got is not None, "1-bit/block DC scan must decode (ADVICE r14)"
    assert got[:4] == (320, 8, 2560, 128.0)
    m = spark.createDataFrame(pd.DataFrame(
        {"media_id": [1], "content": [blob]}))
    row = decode_jpeg_stats(m).first()
    assert (row.width, row.height, row.n_pixels,
            row.mean_gray) == (320, 8, 2560, 128.0)


def test_first_scan_bound_still_rejects_unfillable_headers(spark):
    """Pixel-cap arm: a 65528 x 65528 frame NULLs at the absolute
    ``x * y > _JPEG_MAX_PIXELS`` check before the data-derived bound
    is even consulted (ADVICE r15 low #3 renamed this test honestly —
    the data arm has its own test below)."""
    from tripgogo_vector_search_spark.operators.jpeg import (
        _JPEG_MAX_PIXELS, parse_jpeg)

    blob = _jpeg_dc_only_progressive(65528, 65528)
    assert 65528 * 65528 > _JPEG_MAX_PIXELS
    # rebuild with TINY scan data: strip the synthesized entropy bytes
    cut = blob.index(b"\xff\xda")
    sos_end = cut + 2 + 8                    # marker + segment
    hostile = blob[:sos_end] + b"\x00" * 4 + b"\xff\xd9"
    assert parse_jpeg(hostile) is None


def test_first_scan_bound_data_arm_rejects_under_pixel_cap(spark):
    """ADVICE r15 low #3: the relaxed data-derived arm itself
    (``blocks > 8 * remaining scan bytes``) must reject — the prior
    test's 65528 x 65528 frame NULLed at the earlier absolute pixel
    cap, so the new 1-bit floor's reject path had no direct coverage.
    2048 x 2048 is UNDER the pixel cap (4.2M px <= 2^24) but its
    65536 blocks against 6 remaining bytes (48 bits) cannot be coded
    at even 1 bit per block, so the bound NULLs before the ~16M-entry
    coefficient allocation. Both decoders take the arm."""
    import pandas as pd

    from tripgogo_vector_search_spark.operators.jpeg import (
        _JPEG_MAX_PIXELS, decode_jpeg_stats, parse_jpeg)

    blob = _jpeg_dc_only_progressive(2048, 2048)
    assert 2048 * 2048 <= _JPEG_MAX_PIXELS
    cut = blob.index(b"\xff\xda")
    sos_end = cut + 2 + 8                    # marker + segment
    hostile = blob[:sos_end] + b"\x00" * 4 + b"\xff\xd9"
    n_blocks, remaining = (2048 // 8) ** 2, 4 + 2
    assert n_blocks > 8 * remaining          # the data arm decides
    assert parse_jpeg(hostile) is None
    m = spark.createDataFrame(pd.DataFrame(
        {"media_id": [1], "content": [hostile]}))
    assert decode_jpeg_stats(m).first().width is None

SF_SMOKE = "/root/testdata/sf0.001"


import pytest


@pytest.mark.parametrize("key", ["media_decode_dispatch",
                                 "media_quality_gate_multiformat"])
def test_media_firehose_consumers_are_single_pass(spark, key):
    """VERDICT r14 list #1: every consumer of the media firehose must
    read it ONCE in aggregate. r16 strengthens the pin: the dispatch
    and the multiformat gate consume EVERY kind, so the r15 shape's
    six disjoint partition-pruned scans + six-way union read the same
    bytes as one full scan while paying six Arrow stage launches —
    each key's plan must now hold (a) EXACTLY ONE FileScan, (b) of
    the sniffed sidecar (never a raw per-format corpus), (c) feeding
    exactly one Python stage (the media_dispatch_stats router)."""
    from tripgogo_vector_search_spark.plans import registry as reg

    df = reg.QUERIES[key](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    # (a) one scan: the firehose is read once, literally
    assert len(scans) == 1, f"expected ONE firehose scan, got: {scans}"
    # (b) it reads the sniffed sidecar; no raw per-format corpus leaks
    assert "media_sniffed" in scans[0], scans[0]
    for corp in ("png_corpus", "gif_corpus", "jpeg_corpus",
                 "bmp_corpus", "wav_corpus"):
        assert corp not in plan
    # (c) one Python stage routes every object
    assert plan.count("MapInPandas") == 1, plan


def test_dispatch_id_stride_guard_raises_on_aliasing_ids(spark, tmp_path):
    """ADVICE r14 low #5: a source media_id at or past the branch
    stride would alias into the next format branch identically on
    both engines — invisible to the oracle gate — so the sniffed
    materialization must raise instead. Exercises the registry's own
    guard expression (the one build_sniffed applies per corpus)."""
    import pytest

    from tripgogo_vector_search_spark.plans import registry as reg

    stride = reg._DISPATCH_ID_STRIDE
    guarded = reg._dispatch_guarded_id(stride)
    ok = spark.createDataFrame([(1,), (stride - 1,)], "media_id bigint")
    assert (ok.select(guarded.alias("m")).agg(F.sum("m")).first()[0]
            == (stride + 1) + (2 * stride - 1))
    bad = spark.createDataFrame([(stride,)], "media_id bigint")
    with pytest.raises(Exception, match="alias across format branches"):
        bad.select(guarded.alias("m")).collect()


def test_jpeg_422_synthesis_roundtrips_on_both_decoders(spark):
    """synth_jpeg_422_corpus (VERDICT r14 list #4): each byte is one
    8x16 MCU (two Y units + Cb + Cr, horizontally box-upsampled), so
    both decoders must return 16n x 8 geometry and the exact per-byte
    channel means; NULL/empty text stays NULL."""
    from tripgogo_vector_search_spark.operators.jpeg import (
        decode_jpeg_stats, parse_jpeg, synth_jpeg_422_corpus)

    rows = [(0, None), (1, ""), (2, "A"), (3, "hello world")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    m = synth_jpeg_422_corpus(docs)
    out = {r.media_id: r for r in decode_jpeg_stats(m).collect()}
    assert out[0].width is None and out[1].width is None

    def rgb(u):
        cb, cr = (3 * u + 7) % 256 - 128, (7 * u + 1) % 256 - 128
        clip = lambda v: min(max(v, 0), 255)  # noqa: E731
        return (clip(u + ((91881 * cr + 32768) >> 16)),
                clip(u - ((22554 * cb + 46802 * cr + 32768) >> 16)),
                clip(u + ((116130 * cb + 32768) >> 16)))

    for did, txt in rows[2:]:
        raw = txt.encode()
        n = len(raw)
        o = out[did]
        assert (o.width, o.height, o.n_pixels) == (16 * n, 8, 128 * n)
        rs, gs, bs = zip(*[rgb(u) for u in raw])
        assert o.mean_gray == sum(raw) / n
        assert (o.mean_r, o.mean_g, o.mean_b) == (
            sum(rs) / n, sum(gs) / n, sum(bs) / n)
    # the independent spec decoder agrees bit-exactly
    blobs = {r.media_id: r.content for r in m.collect()}
    got = parse_jpeg(bytes(blobs[3]))
    raw = b"hello world"
    assert got[:4] == (16 * len(raw), 8, 128 * len(raw),
                       sum(raw) / len(raw))


def test_jpeg_411_synthesis_roundtrips_on_both_decoders(spark):
    """synth_jpeg_411_corpus: each byte is one 8x32 MCU (four Y units
    + Cb + Cr, chroma box-upsampled 4x horizontally), so both
    decoders must return 32n x 8 geometry and the exact per-byte
    channel means; NULL/empty text stays NULL."""
    from tripgogo_vector_search_spark.operators.jpeg import (
        decode_jpeg_stats, parse_jpeg, synth_jpeg_411_corpus)

    rows = [(0, None), (1, ""), (2, "A"), (3, "hello world")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    m = synth_jpeg_411_corpus(docs)
    out = {r.media_id: r for r in decode_jpeg_stats(m).collect()}
    assert out[0].width is None and out[1].width is None

    def rgb(u):
        cb, cr = (3 * u + 7) % 256 - 128, (7 * u + 1) % 256 - 128
        clip = lambda v: min(max(v, 0), 255)  # noqa: E731
        return (clip(u + ((91881 * cr + 32768) >> 16)),
                clip(u - ((22554 * cb + 46802 * cr + 32768) >> 16)),
                clip(u + ((116130 * cb + 32768) >> 16)))

    for did, txt in rows[2:]:
        raw = txt.encode()
        n = len(raw)
        o = out[did]
        assert (o.width, o.height, o.n_pixels) == (32 * n, 8, 256 * n)
        rs, gs, bs = zip(*[rgb(u) for u in raw])
        assert o.mean_gray == sum(raw) / n
        assert (o.mean_r, o.mean_g, o.mean_b) == (
            sum(rs) / n, sum(gs) / n, sum(bs) / n)
    blobs = {r.media_id: r.content for r in m.collect()}
    got = parse_jpeg(bytes(blobs[3]))
    raw = b"hello world"
    assert got[:4] == (32 * len(raw), 8, 256 * len(raw),
                       sum(raw) / len(raw))


def test_stream_media_dispatch_releases_its_per_batch_cache(spark):
    """The per-micro-batch persist of the sniffed frame must be freed
    in the same batch (finally-unpersist): after the stream drains,
    no RDD may remain resident — the sweep's 0-resident-RDDs gate
    applies to streaming keys too."""
    from tripgogo_vector_search_spark.plans import registry as reg

    def resident() -> set:
        # keySet elements are Java Integers, which py4j hands over as
        # plain Python ints (r16: the first NON-empty map this helper
        # ever met — quality_gate's caller-held localCheckpoint frame,
        # the same accepted pattern as the CC loop's final label
        # frame — crashed the old `.toString()` form)
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    # other tests may legitimately hold checkpoint RDDs (the CC
    # loop's reliable checkpoints); the contract here is that THIS
    # query adds none, so compare against a before-snapshot
    before = resident()
    out = reg.QUERIES["stream_media_dispatch"](spark, SF_SMOKE)
    n = out.count()
    assert n == 50          # the doc_id%10==7 cohort at sf0.001
    kinds = {r.kind for r in out.select("kind").distinct().collect()}
    assert kinds == {"image/png", "image/gif", "image/jpeg",
                     "image/bmp", "audio/wav"}
    assert resident() <= before, \
        f"stream_media_dispatch leaked resident RDDs: {resident() - before}"
    # and the per-batch sniffed scratch is freed in the same batch:
    # no batch_id dirs survive the run (self-review finding — the
    # first cut left one full firehose copy per micro-batch on disk)
    import glob
    import os

    from tripgogo_vector_search_spark.plans.registry import _cache_dir
    scratch = _cache_dir(SF_SMOKE, "stream_media_dispatch") + "_sniffed"
    assert not glob.glob(os.path.join(scratch, "batch_id=*")), \
        "per-batch sniffed scratch not freed"


# -- Adam7 interlaced PNG (r15) --------------------------------------------

def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def _filter_row(ft: int, cur: bytes, prev: bytes) -> bytes:
    """Forward PNG filter (spec 4.5.4, bpp=3) — the test-local
    ENCODER side, written from the filter definitions (not from the
    engine's unfilter code)."""
    out = bytearray(len(cur))
    for i in range(len(cur)):
        a = cur[i - 3] if i >= 3 else 0
        b = prev[i]
        c = prev[i - 3] if i >= 3 else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                      else c)
        out[i] = (cur[i] - pred) & 255
    return bytes(out)


def _encode_png_interlaced(pixels, w, h, filters) -> bytes:
    """Test-local Adam7 encoder: real deflate (zlib.compress), any
    filter type per pass row. `pixels` is h rows of 3*w byte values;
    `filters` yields a filter type per emitted scanline."""
    import struct
    import zlib

    from tripgogo_vector_search_spark.operators.multimodal import (
        _png_pass_plan)

    raw = bytearray()
    fit = iter(filters)
    for x0, dx, y0, dy, pw, ph in _png_pass_plan(w, h, 1):
        prev = bytes(3 * pw)
        for j in range(ph):
            row = bytearray()
            for i in range(pw):
                x = x0 + dx * i
                row += bytes(pixels[y0 + dy * j][3 * x:3 * x + 3])
            ft = next(fit)
            raw += bytes([ft]) + _filter_row(ft, bytes(row), prev)
            prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _n_pass_rows(w, h):
    from tripgogo_vector_search_spark.operators.multimodal import (
        _png_pass_plan)
    return sum(ph for *_, ph in _png_pass_plan(w, h, 1))


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_adam7_roundtrip_positional_both_decoders(data):
    """Random pixels + random filter type (0-4) per pass scanline,
    through a real-deflate test encoder: BOTH decoders must
    reconstruct the de-interlaced image POSITIONALLY (means alone
    cannot see a scatter bug), on geometries covering every
    empty-pass edge (w <= 4 empties pass 2; h < 5/3/2 empties
    passes 3/5/7)."""
    from tripgogo_vector_search_spark.operators.multimodal import (
        _png_blob_pixels, _png_pixels)

    w = data.draw(st.integers(min_value=1, max_value=9))
    h = data.draw(st.integers(min_value=1, max_value=17))
    pixels = [data.draw(st.binary(min_size=3 * w, max_size=3 * w))
              for _ in range(h)]
    filters = data.draw(st.lists(st.integers(0, 4),
                                 min_size=_n_pass_rows(w, h),
                                 max_size=_n_pass_rows(w, h)))
    blob = _encode_png_interlaced(pixels, w, h, filters)
    want = b"".join(pixels)
    spec = _png_pixels(blob)
    assert spec is not None
    sw, sh, rows = spec
    assert (sw, sh) == (w, h)
    assert b"".join(bytes(r) for r in rows) == want
    kern = _png_blob_pixels(blob)
    assert kern is not None
    assert bytes(kern[2].tobytes()) == want


def test_adam7_truncated_and_padded_streams_null():
    """An interlaced stream whose inflated length doesn't equal the
    exact pass-plan total (truncated or padded) must NULL."""
    import struct
    import zlib

    from tripgogo_vector_search_spark.operators.multimodal import (
        _png_blob_pixels, _png_pixels)

    pixels = [bytes(range(24))] * 8
    blob = _encode_png_interlaced(pixels, 8, 8,
                                  [0] * _n_pass_rows(8, 8))
    assert _png_pixels(blob) is not None
    # walk the chunk list to find the IDAT payload exactly
    pos, idat_body = 8, None
    while pos + 12 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        typ = blob[pos + 4:pos + 8]
        if typ == b"IDAT":
            idat_body = blob[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    body = zlib.decompress(idat_body)
    sig_ihdr = blob[:8 + 12 + 13]          # signature + IHDR chunk
    for mutant in (body[:-1], body + b"\x00"):
        rebuilt = (sig_ihdr
                   + _png_chunk(b"IDAT", zlib.compress(mutant))
                   + _png_chunk(b"IEND", b""))
        assert _png_pixels(rebuilt) is None
        assert _png_blob_pixels(rebuilt) is None


# -- interlaced GIF (r15) --------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(st.data())
def test_gif_interlace_roundtrip_positional_both_decoders(data):
    """Random indices through the independent test-encoder assembly
    (REAL compressed LZW), serialized in appendix E file order with
    the interlace flag: BOTH decoders must return the image in
    SOURCE row order, and the row-weighted statistic must equal the
    source-order formula (a decoder that ignores the flag returns a
    permuted image — invisible to means, red here)."""
    import sys
    sys.path.insert(0, "tests")
    from test_round13_props import _assemble_gif

    from tripgogo_vector_search_spark.operators import multimodal as M

    w = data.draw(st.integers(min_value=1, max_value=6))
    h = data.draw(st.integers(min_value=1, max_value=21))
    src = data.draw(st.lists(st.integers(0, 255), min_size=w * h,
                             max_size=w * h))
    order = M._gif_interlace_source_rows(h)
    assert sorted(order) == list(range(h))     # a permutation, total
    filestream = []
    for srow in order:
        filestream += src[srow * w:(srow + 1) * w]
    blob = _assemble_gif(w, h, filestream, interlace=True)
    gi = M._gif_indices(blob)
    assert gi is not None and gi[3] == src
    kb = M._gif_blob_indices(blob)
    assert kb is not None and list(kb[3]) == src
    rp = M.parse_gif_rowpos(blob)
    assert rp[4] == sum((k // w + 1) * v for k, v in enumerate(src))


def test_gif_interlace_is_observable_in_row_weighted_stat(spark):
    """The interlaced corpus must produce file bytes whose NAIVE
    (flag-ignoring) row-weighted sum differs from the source-order
    oracle value — i.e. the new statistic actually distinguishes a
    correct de-interlacer from one that ignores the flag."""
    from tripgogo_vector_search_spark.operators import multimodal as M

    # w=2 (id%6==0), 17 bytes -> h=8: interlace is a non-trivial
    # permutation and the byte values are row-distinct
    txt = bytes(range(33, 33 + 16)).decode()
    docs = spark.createDataFrame([(0, txt)], "doc_id bigint, text string")
    blob = bytes(M.synth_gif_interlaced_corpus(docs).first().content)
    gi = M._gif_indices(blob)
    w, h = gi[0], gi[1]
    src = gi[3]
    correct = sum((k // w + 1) * v for k, v in enumerate(src))
    # replay the decode WITHOUT de-interlacing: permute back to file
    # order and weight that
    order = M._gif_interlace_source_rows(h)
    filestream = []
    for srow in order:
        filestream += src[srow * w:(srow + 1) * w]
    naive = sum((k // w + 1) * v for k, v in enumerate(filestream))
    assert naive != correct, "fixture too symmetric to distinguish"
    assert M.parse_gif_rowpos(blob)[4] == correct


# -- RLE8 BMP (r15) --------------------------------------------------------

def _rle_bmp(w, h, stream: bytes) -> bytes:
    """Hand-assembled RLE8 BMP around an arbitrary escape stream."""
    import struct

    from tripgogo_vector_search_spark.operators.multimodal import (
        _BMP_RLE_PALETTE_HEX)

    offset = 14 + 40 + 1024
    hdr = (b"BM" + struct.pack("<I", offset + len(stream))
           + b"\x00\x00\x00\x00" + struct.pack("<I", offset)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1,
                         len(stream), 0, 0, 0, 0)
           + bytes.fromhex(_BMP_RLE_PALETTE_HEX))
    return hdr + stream


def test_bmp_rle_delta_skip_and_zero_fill():
    """Delta escapes (00 02 dx dy) skip pixels; skipped and
    never-written pixels decode to index 0 — and the early
    end-of-bitmap leaves whole rows zero."""
    from tripgogo_vector_search_spark.operators import multimodal as M

    # 4x3 bottom-up: write 2 px of 7 at bottom-left, delta-skip
    # (dx=1, dy=1), write 1 px of 9, then EOB
    stream = bytes([2, 7, 0, 2, 1, 1, 1, 9, 0, 1])
    got = M._bmp_rle_indices(_rle_bmp(4, 3, stream))
    assert got is not None
    w, h, _pal, idxs = got
    img = [idxs[r * w:(r + 1) * w] for r in range(h)]
    # bottom row (image row 2): [7, 7, 0, 0]
    assert img[2] == [7, 7, 0, 0]
    # delta lands at x=3, y=1 (bottom-up) -> image row 1, col 3
    assert img[1] == [0, 0, 0, 9]
    assert img[0] == [0, 0, 0, 0]       # never written
    # spec stats agree with a hand computation
    st = M.parse_bmp_rle(_rle_bmp(4, 3, stream))
    assert st[2] == 12 and st[3] == (7 + 7 + 9) / 12
    assert st[4] == 1 * 0 + 2 * 9 + 3 * 14   # rows 1..3 weighted


def test_bmp_rle_absolute_mode_padding_and_malformed():
    """Absolute mode consumes its word-alignment pad byte; a
    truncated absolute run, an overflowing encoded run, and a
    missing EOB all NULL."""
    from tripgogo_vector_search_spark.operators import multimodal as M

    # 3-wide: absolute run of 3 costs 2 + 3 + 1(pad) bytes
    ok = bytes([0, 3, 1, 2, 3, 0xEE, 0, 0, 0, 1])   # pad byte 0xEE ignored
    got = M._bmp_rle_indices(_rle_bmp(3, 1, ok))
    assert got is not None and got[3] == [1, 2, 3]
    assert M._bmp_rle_indices(_rle_bmp(3, 1, bytes([0, 3, 1, 2]))) is None
    assert M._bmp_rle_indices(_rle_bmp(3, 1, bytes([4, 5, 0, 1]))) is None
    assert M._bmp_rle_indices(_rle_bmp(3, 1, bytes([1, 5]))) is None


def test_bmp_rle_hostile_header_nulls_before_allocation():
    """65535 x 32767 (~2.1e9 px) with a 2-byte EOB must NULL at the
    absolute cap, never allocate (RLE zero-fills, so no data-derived
    bound exists)."""
    from tripgogo_vector_search_spark.operators import multimodal as M

    blob = _rle_bmp(65535, 32767, bytes([0, 1]))
    assert M._bmp_rle_indices(blob) is None
    assert M.parse_bmp_rle(blob) is None


def test_bmp_rle_synthesis_roundtrips_and_flip_is_observable(spark):
    """The Catalyst corpus decodes exactly on both decoders, and the
    bottom-up storage makes the naive (flip-forgetting) row-weighted
    sum differ from the oracle value on an asymmetric fixture."""
    from tripgogo_vector_search_spark.operators import multimodal as M

    txt = bytes(range(65, 65 + 12)).decode()    # w=4 (id%5==0), h=3
    docs = spark.createDataFrame([(0, txt)], "doc_id bigint, text string")
    blob = bytes(M.synth_bmp_rle_corpus(docs).first().content)
    w, h, _pal, idxs = M._bmp_rle_indices(blob)
    src = list(txt.encode())
    assert (w, h) == (4, 3) and idxs == src
    correct = sum((k // w + 1) * v for k, v in enumerate(src))
    flipped = []
    for r in range(h - 1, -1, -1):
        flipped += src[r * w:(r + 1) * w]
    naive = sum((k // w + 1) * v for k, v in enumerate(flipped))
    assert naive != correct
    assert M.parse_bmp_rle(blob)[4] == correct


def test_bmp_rle_synthesis_cap_arm_matches_oracle_formula(spark):
    """A document LONGER than the RLE synthesis pixel cap must
    produce a BMP whose height is the oracle's formula
    ``least(dlen // w, cap // w)`` with the cap arm winning — the
    arm the self-review found unguarded (an uncapped synthesis would
    cross the decoder's 2^24 allocation cap on multi-megabyte
    documents and silently diverge from the oracle)."""
    from tripgogo_vector_search_spark.operators import multimodal as M

    assert M._BMP_RLE_SYNTH_MAX_PIXELS == 4096
    assert M._BMP_RLE_MAX_PIXELS == 1 << 24
    text = "ab" * 2500                       # dlen = 5000 > 4096
    docs = spark.createDataFrame([(0, text)],
                                 "doc_id bigint, text string")
    o = M.decode_bmp_rle_stats(M.synth_bmp_rle_corpus(docs)).first()
    w, dlen = 4, 5000                        # id % 5 == 0 -> w = 4
    h_oracle = min(dlen // w, M._BMP_RLE_SYNTH_MAX_PIXELS // w)
    assert h_oracle == 1024                  # the cap arm
    assert (o.width, o.height, o.n_pixels) == (w, h_oracle,
                                               w * h_oracle)
    used = text.encode()[:w * h_oracle]
    assert o.mean_idx == sum(used) / len(used)


def test_bmp_rle_decoders_fuzz_total_and_agree(spark):
    """Hostile bytes: single-byte mutations, truncations, and garbage
    must never raise in either implementation, and both must return
    the SAME verdict (None/None or equal stats) — the
    WAV/BMP/PNG/GIF fuzz-total discipline, extended to the RLE8
    decoder. Since r16 the kernel runs the INDEPENDENT
    ``_bmp_rle_indices_np`` pixel path (ADVICE r15 low #2), so this
    agreement is a real cross-check; random hand-built escape
    streams below exercise delta skips, multi-count encoded runs,
    and absolute runs — shapes the synthesized corpus (unit runs +
    absolute rows only) never emits."""
    import random

    from tripgogo_vector_search_spark.operators import multimodal as M

    rng = random.Random(151)
    docs = spark.createDataFrame(
        [(3, "".join(chr(32 + rng.randrange(90)) for _ in range(120)))],
        "doc_id bigint, text string")
    base = bytes(M.synth_bmp_rle_corpus(docs).first().content)
    blobs = [base]
    for _ in range(150):
        b = bytearray(base)
        b[rng.randrange(len(b))] = rng.randrange(256)
        blobs.append(bytes(b))
    for _ in range(40):
        blobs.append(base[:rng.randrange(len(base))])
    blobs += [b"", b"BM", b"\x00" * 64,
              bytes(rng.randrange(256) for _ in range(300))]
    # random escape-machine streams over small frames: mixes of
    # encoded runs (any count), absolute runs (with pad), deltas,
    # EOLs, and a final EOB — roughly half stay valid, the rest trip
    # bounds checks; both implementations must agree either way
    for _ in range(120):
        w, h = rng.randrange(1, 9), rng.randrange(1, 7)
        stream = bytearray()
        for _ in range(rng.randrange(1, 8)):
            op = rng.randrange(4)
            if op == 0:                      # encoded run
                stream += bytes([rng.randrange(1, 10),
                                 rng.randrange(256)])
            elif op == 1:                    # absolute run
                v = rng.randrange(3, 8)
                stream += bytes([0, v])
                stream += bytes(rng.randrange(256) for _ in range(v))
                if v & 1:
                    stream.append(rng.randrange(256))   # pad
            elif op == 2:                    # delta skip
                stream += bytes([0, 2, rng.randrange(4),
                                 rng.randrange(3)])
            else:                            # end of line
                stream += bytes([0, 0])
        stream += bytes([0, 1])              # EOB
        blobs.append(_rle_bmp(w, h, bytes(stream)))
    # spec side must be total
    specs = [M.parse_bmp_rle(b) for b in blobs]
    # kernel side must be total AND verdict-equal
    m = spark.createDataFrame(
        pd.DataFrame({"media_id": list(range(len(blobs))),
                      "content": blobs}))
    kern = {r.media_id: r for r in M.decode_bmp_rle_stats(m).collect()}
    for i, s in enumerate(specs):
        k = kern[i]
        if s is None:
            assert k.width is None, i
        else:
            got = (k.width, k.height, k.n_pixels, k.mean_idx,
                   k.row_weighted_idx, k.mean_r, k.mean_g, k.mean_b)
            assert all(
                a == b if isinstance(a, int) else abs(a - b) < 1e-12
                for a, b in zip(got, s)), i
