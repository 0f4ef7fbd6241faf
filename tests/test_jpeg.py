"""Baseline-JPEG decoder tests (round 14): a standard-Annex-K-table
Huffman ENCODER round-trips AC-rich coefficient streams through both
decoder implementations (Arrow kernel and plain-Python spec), pinned
exactly equal; plus DRI/RST, 16-bit DQT, hostile-header allocation
bounds, truncation fuzz, and the synthesis corpus decoded by the
independent spec implementation.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings, strategies as st

from tripgogo_vector_search_spark.operators.jpeg import (
    _JPEG_MAX_BLOCKS, _ZIGZAG_LITERAL, _dct_basis_q20, _zigzag_order,
    parse_jpeg)


# ---------------------------------------------------------------------------
# the test encoder: ITU-T T.81 Annex K.3 typical luminance tables
# ---------------------------------------------------------------------------

K_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
K_DC_VALS = list(range(12))

K_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
K_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
assert len(K_AC_VALS) == sum(K_AC_BITS)


def _codes_from(bits, vals):
    """Canonical code assignment — the tests' own third copy of the
    algorithm, independent of both decoders' builders."""
    out = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _Writer:
    """MSB-first bit writer with 0xFF00 stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)


def _seg(marker, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def encode_jpeg(blocks_zz, width, height, qt_zz, dri=0, qt16=False,
                nf=1, sampling="444"):
    """Baseline JPEG encoder over pre-quantized zigzag-order
    coefficient blocks, Annex K luminance Huffman tables (shared by
    all components), optional restart intervals and 16-bit quant
    precision. For nf=1, blocks_zz is one block per MCU; for nf=3
    at 4:4:4, a flat interleaved list [Y0, Cb0, Cr0, Y1, ...]; for
    nf=3 at 4:2:0 (sampling="420"), each 16x16 MCU contributes
    [Y_tl, Y_tr, Y_bl, Y_br, Cb, Cr] with per-component DC
    predictors chaining through the four Y data units (spec
    A.2.3)."""
    dc = _codes_from(K_DC_BITS, K_DC_VALS)
    ac = _codes_from(K_AC_BITS, K_AC_VALS)
    cnts = [1] * nf
    hv = [0x11] * nf
    if nf == 3 and sampling == "420":
        cnts = [4, 1, 1]
        hv = [0x22, 0x11, 0x11]
    elif nf == 3 and sampling == "422":
        cnts = [2, 1, 1]               # Y left/right, then Cb, Cr
        hv = [0x21, 0x11, 0x11]
    elif nf == 3 and sampling == "411":
        cnts = [4, 1, 1]               # four Y units, then Cb, Cr
        hv = [0x41, 0x11, 0x11]
    bpm = sum(cnts)
    out = bytearray(b"\xFF\xD8")
    if qt16:
        out += _seg(0xDB, bytes([0x10]) + b"".join(
            int(q).to_bytes(2, "big") for q in qt_zz))
    else:
        out += _seg(0xDB, bytes([0x00]) + bytes(qt_zz))
    comps = b"".join(bytes([c + 1, hv[c], 0]) for c in range(nf))
    out += _seg(0xC0, bytes([8]) + height.to_bytes(2, "big")
                + width.to_bytes(2, "big") + bytes([nf]) + comps)
    out += _seg(0xC4, bytes([0x00]) + bytes(K_DC_BITS) + bytes(K_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(K_AC_BITS) + bytes(K_AC_VALS))
    if dri:
        out += _seg(0xDD, dri.to_bytes(2, "big"))
    sel = b"".join(bytes([c + 1, 0x00]) for c in range(nf))
    out += _seg(0xDA, bytes([nf]) + sel + bytes([0, 63, 0]))
    w = _Writer()
    preds = [0] * nf
    rst = 0
    n_mcus = len(blocks_zz) // bpm
    assert len(blocks_zz) == n_mcus * bpm
    for mi in range(n_mcus):
        if dri and mi and mi % dri == 0:
            w.pad()
            out += w.out
            out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            w = _Writer()
            preds = [0] * nf
        ofs = 0
        for ci in range(nf):
          for _rep in range(cnts[ci]):
            zz = blocks_zz[mi * bpm + ofs]
            ofs += 1
            diff = zz[0] - preds[ci]
            preds[ci] = zz[0]
            cat = abs(diff).bit_length()
            ln, code = dc[cat]
            w.put(code, ln)
            if cat:
                w.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
            run = 0
            had_trailing = False
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    had_trailing = True
                    continue
                while run >= 16:
                    ln, code = ac[0xF0]          # ZRL
                    w.put(code, ln)
                    run -= 16
                s = abs(zz[k]).bit_length()
                ln, code = ac[(run << 4) | s]
                w.put(code, ln)
                w.put(zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1, s)
                run = 0
                had_trailing = False
            if had_trailing or run:
                ln, code = ac[0x00]              # EOB
                w.put(code, ln)
    w.pad()
    out += w.out
    out += b"\xFF\xD9"
    return bytes(out)


def _kernel_decode(spark, blobs):
    """Run the Arrow kernel on raw bytes through a real Spark plan."""
    from tripgogo_vector_search_spark.operators.jpeg import (
        decode_jpeg_stats)
    df = spark.createDataFrame(
        [(i, bytearray(b) if b is not None else None)
         for i, b in enumerate(blobs)],
        "media_id bigint, content binary")
    rows = {r.media_id: (r.width, r.height, r.n_pixels, r.mean_gray,
                         r.mean_r, r.mean_g, r.mean_b)
            for r in decode_jpeg_stats(df).collect()}
    return [None if rows[i][0] is None else rows[i]
            for i in range(len(blobs))]


# ---------------------------------------------------------------------------
# table / constant pins
# ---------------------------------------------------------------------------

def test_zigzag_generator_matches_literal():
    assert _zigzag_order() == _ZIGZAG_LITERAL


def test_basis_dc_term_is_exact_eighth():
    b = _dct_basis_q20()
    assert b[0][0][3][5] == (1 << 20) // 8      # 1/8 scales exactly
    # and the table is symmetric in (u,x)<->(v,y)
    assert b[2][5][1][4] == b[5][2][4][1]


# ---------------------------------------------------------------------------
# encoder round-trips: kernel == spec, exactly
# ---------------------------------------------------------------------------

_coef = st.integers(min_value=-255, max_value=255)


@st.composite
def _block(draw):
    """A sparse-ish random quantized block in zigzag order: a random
    DC plus up to 8 nonzero ACs at random scan positions (realistic
    shape, and it exercises runs/ZRL/EOB in all phases)."""
    zz = [0] * 64
    zz[0] = draw(st.integers(min_value=-500, max_value=500))
    n_ac = draw(st.integers(min_value=0, max_value=8))
    for _ in range(n_ac):
        k = draw(st.integers(min_value=1, max_value=63))
        v = draw(_coef)
        zz[k] = v if v != 0 else 1
    return zz


@settings(max_examples=40, deadline=None)
@given(st.lists(_block(), min_size=1, max_size=6),
       st.integers(min_value=1, max_value=16),
       st.integers(min_value=0, max_value=7))
def test_roundtrip_spec_decode(blocks, qscale, crop):
    """encode(blocks) must decode through parse_jpeg with the exact
    dimensions and a mean equal to the independent per-pixel
    recomputation from the coefficients."""
    n = len(blocks)
    width = 8 * n - crop                 # exercises right-edge crop
    if width < 1:
        width = 8 * n
    qt = [qscale] * 64
    data = encode_jpeg(blocks, width, 8, qt)
    got = parse_jpeg(data)
    assert got is not None
    w, h, npx, mean = got[:4]
    assert got[4:] == (None, None, None)     # grayscale: no RGB
    assert (w, h, npx) == (width, 8, width * 8)
    basis = _dct_basis_q20()
    total = 0
    for bi, zz in enumerate(blocks):
        nat = [0] * 64
        for k in range(64):
            nat[_ZIGZAG_LITERAL[k]] = zz[k] * qt[k]
        vis = min(8, width - bi * 8)
        for y in range(8):
            for x in range(vis):
                acc = 0
                for v in range(8):
                    for u in range(8):
                        acc += nat[v * 8 + u] * basis[v][u][y][x]
                val = ((acc + (1 << 19)) >> 20) + 128
                total += min(255, max(0, val))
    assert mean == total / (width * 8)


@settings(max_examples=25, deadline=None)
@given(st.lists(_block(), min_size=1, max_size=8),
       st.integers(min_value=1, max_value=30),
       st.booleans(), st.integers(min_value=0, max_value=3))
def test_kernel_equals_spec_on_encoded_streams(spark, blocks, qscale,
                                               qt16, dri):
    """The two decoder implementations are pinned EXACTLY equal on
    Annex-K-coded streams, across quant precision and restart
    intervals."""
    qt = [(qscale * (1 + (i % 7))) for i in range(64)]
    if qt16:
        qt = [q * 37 for q in qt]        # force 16-bit values
    data = encode_jpeg(blocks, 8 * len(blocks), 8, qt,
                       dri=dri if dri < len(blocks) else 0, qt16=qt16)
    want = parse_jpeg(data)
    got = _kernel_decode(spark, [data])[0]
    assert got == want
    assert want is not None


def test_restart_interval_roundtrip(spark):
    """DRI/RSTn: predictor resets at each restart; both decoders agree
    and the values survive."""
    blocks = [[(i + 1) * 10] + [0] * 63 for i in range(7)]
    data = encode_jpeg(blocks, 56, 8, [8] * 64, dri=2)
    want = parse_jpeg(data)
    assert want is not None
    assert _kernel_decode(spark, [data])[0] == want
    # DC-only, quant 8: block i decodes to 10(i+1)+128 exactly
    exp = sum(64 * (10 * (i + 1) + 128) for i in range(7)) / (56 * 8)
    assert want[3] == exp


def test_dc_only_quant8_is_lossless():
    """The synthesis contract: uniform blocks with quant step 8 decode
    back to the exact byte, for every byte value."""
    blocks = [[u - 128] + [0] * 63 for u in range(256)]
    data = encode_jpeg(blocks, 8 * 256, 8, [8] * 64)
    got = parse_jpeg(data)
    assert got is not None
    assert got[3] == sum(range(256)) / 256.0


# ---------------------------------------------------------------------------
# hostile / malformed inputs
# ---------------------------------------------------------------------------

def test_hostile_dims_null_before_alloc(spark):
    """65535x65535 SOF0 with a 3-byte scan: both decoders NULL out at
    the pixel cap / MCU bound, never raise."""
    blocks = [[0] * 64]
    data = bytearray(encode_jpeg(blocks, 8, 8, [8] * 64))
    # patch SOF0 Y/X to 65535 (offsets: SOI(2) DQT(69) -> SOF at 71;
    # Y at 71+5, X at 71+7)
    assert data[71:73] == b"\xFF\xC0"
    data[76:78] = b"\xFF\xFF"
    data[78:80] = b"\xFF\xFF"
    data = bytes(data)
    assert parse_jpeg(data) is None
    assert _kernel_decode(spark, [data])[0] is None


def test_out_of_scope_frames_null(spark):
    """SUBSAMPLED color is the documented NULL boundary; well-formed
    4:4:4 color is in scope. A SOF2 marker on a baseline-shaped
    full-band scan is malformed (progressive DC scans must have
    Se=0) and NULLs too — real progressive scripts are exercised in
    tests/test_jpeg_progressive.py."""
    blocks = [[10] + [0] * 63]
    data = bytearray(encode_jpeg(blocks, 8, 8, [8] * 64))
    prog = bytes(data[:72]) + b"\xC2" + bytes(data[73:])
    assert parse_jpeg(prog) is None
    color = bytearray(encode_jpeg(
        [[10] + [0] * 63, [5] + [0] * 63, [-5] + [0] * 63],
        8, 8, [8] * 64, nf=3))
    sub = bytearray(color)
    # SOF comp list starts at 71+10; set Y sampling to 2x2 (4:2:0)
    assert sub[71:73] == b"\xFF\xC0"
    assert sub[81] == 1 and sub[82] == 0x11
    sub[82] = 0x22
    sub = bytes(sub)
    assert parse_jpeg(sub) is None
    assert parse_jpeg(bytes(color)) is not None
    assert _kernel_decode(spark, [prog, sub]) == [None, None]


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_random_bytes_never_raise(raw):
    data = b"\xFF\xD8" + raw
    parse_jpeg(data)                     # must not raise
    parse_jpeg(raw)


def test_truncation_battery_decoders_agree(spark):
    """Every prefix of a valid file: both implementations return the
    same verdict (None until the file is complete enough)."""
    blocks = [[50, 3] + [0] * 62, [-20] + [0] * 63]
    data = encode_jpeg(blocks, 16, 8, [4] * 64)
    cuts = sorted({1, 2, 4, 20, 70, 75, 90, 110, len(data) - 3,
                   len(data) - 1, len(data)})
    prefixes = [data[:c] for c in cuts]
    kern = _kernel_decode(spark, prefixes)
    for c, got in zip(cuts, kern):
        assert got == parse_jpeg(data[:c]), f"cut at {c}"
    assert kern[-1] is not None


# ---------------------------------------------------------------------------
# 4:4:4 color: interleaved MCUs, per-component predictors, YCbCr->RGB
# ---------------------------------------------------------------------------

def _rgb_ref(y, cb, cr):
    """The tests' own copy of the fixed-point conversion."""
    from tripgogo_vector_search_spark.operators.jpeg import (
        _CB_B, _CB_G, _CR_G, _CR_R)
    cb, cr = cb - 128, cr - 128
    r = y + ((_CR_R * cr + 32768) >> 16)
    g = y - ((_CB_G * cb + _CR_G * cr + 32768) >> 16)
    b = y + ((_CB_B * cb + 32768) >> 16)
    clamp = lambda v: min(255, max(0, v))  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def test_color_dc_only_exact_conversion(spark):
    """DC-only 4:4:4 MCUs at quant 8: every pixel's (Y,Cb,Cr) is the
    encoded value exactly, so the channel means equal the test's own
    integer conversion — including both clamp edges."""
    trips = [(200, 255, 255),    # R clamps high
             (10, 0, 0),         # R/G clamp low / high interplay
             (128, 128, 128),    # neutral: R=G=B=Y
             (255, 0, 255), (0, 255, 0), (77, 13, 200)]
    blocks = []
    for y, cb, cr in trips:
        for val in (y, cb, cr):
            blocks.append([val - 128] + [0] * 63)
    data = encode_jpeg(blocks, 8 * len(trips), 8, [8] * 64, nf=3)
    want_r = sum(_rgb_ref(*t)[0] for t in trips) / len(trips)
    want_g = sum(_rgb_ref(*t)[1] for t in trips) / len(trips)
    want_b = sum(_rgb_ref(*t)[2] for t in trips) / len(trips)
    got = parse_jpeg(data)
    assert got is not None
    assert got[:3] == (8 * len(trips), 8, 64 * len(trips))
    assert got[3] == sum(t[0] for t in trips) / len(trips)  # luma
    assert (got[4], got[5], got[6]) == (want_r, want_g, want_b)
    assert _kernel_decode(spark, [data])[0] == got


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(_block(), _block(), _block()),
                min_size=1, max_size=4),
       st.integers(min_value=1, max_value=16),
       st.integers(min_value=0, max_value=2))
def test_color_kernel_equals_spec(spark, mcus, qscale, dri):
    """AC-rich interleaved color streams: the two implementations stay
    pinned exactly equal (per-component predictors + restart resets
    included)."""
    blocks = [b for mcu in mcus for b in mcu]
    data = encode_jpeg(blocks, 8 * len(mcus), 8, [qscale] * 64,
                       dri=dri if dri < len(mcus) else 0, nf=3)
    want = parse_jpeg(data)
    assert want is not None
    assert _kernel_decode(spark, [data])[0] == want


def test_color_predictors_are_independent():
    """Red-on-wrong-shape: a decoder with ONE shared DC predictor
    across components would decode these MCUs to different planes.
    Values chosen so luma/chroma diff chains differ."""
    trips = [(100, 50, 200), (110, 60, 190), (90, 70, 210)]
    blocks = []
    for y, cb, cr in trips:
        for val in (y, cb, cr):
            blocks.append([val - 128] + [0] * 63)
    got = parse_jpeg(encode_jpeg(blocks, 24, 8, [8] * 64, nf=3))
    assert got is not None
    assert got[3] == sum(t[0] for t in trips) / 3   # Y survives exactly


# ---------------------------------------------------------------------------
# 4:2:0 subsampled color: MCU geometry, predictor chains, replication
# upsampling (the pinned box convention)
# ---------------------------------------------------------------------------

def _dc(v):
    return [v - 128] + [0] * 63


def test_420_dc_only_exact_replication():
    """One 16x16 MCU with four distinct Y quadrants + uniform chroma:
    means equal the hand-computed replication-upsampled conversion."""
    quads = (40, 90, 160, 210)
    cbv, crv = 77, 200
    blocks = [_dc(q) for q in quads] + [_dc(cbv), _dc(crv)]
    data = encode_jpeg(blocks, 16, 16, [8] * 64, nf=3, sampling="420")
    got = parse_jpeg(data)
    assert got is not None
    assert got[:3] == (16, 16, 256)
    assert got[3] == sum(quads) / 4
    want = [0.0, 0.0, 0.0]
    for q in quads:
        r, g, b = _rgb_ref(q, cbv, crv)
        want[0] += r / 4
        want[1] += g / 4
        want[2] += b / 4
    assert (got[4], got[5], got[6]) == tuple(want)


def test_420_cropping_and_multi_mcu(spark):
    """24x16 = two MCUs with the right one half-cropped: per-pixel
    python reference over the replication mapping, and kernel == spec
    exactly."""
    m0 = (10, 20, 30, 40, 100, 150)
    m1 = (50, 60, 70, 80, 200, 64)
    blocks = ([_dc(v) for v in m0[:4]] + [_dc(m0[4]), _dc(m0[5])]
              + [_dc(v) for v in m1[:4]] + [_dc(m1[4]), _dc(m1[5])])
    x, y = 24, 16
    data = encode_jpeg(blocks, x, y, [8] * 64, nf=3, sampling="420")
    got = parse_jpeg(data)
    assert got is not None and got[:3] == (x, y, x * y)
    t = [0, 0, 0, 0]
    for py in range(y):
        for px in range(x):
            mi = px // 16
            quads = (m0, m1)[mi][:4]
            lum = quads[(py // 8) * 2 + ((px % 16) // 8)]
            cb, cr = (m0, m1)[mi][4], (m0, m1)[mi][5]
            r, g, b = _rgb_ref(lum, cb, cr)
            t[0] += lum
            t[1] += r
            t[2] += g
            t[3] += b
    n = x * y
    assert (got[3], got[4], got[5], got[6]) == (
        t[0] / n, t[1] / n, t[2] / n, t[3] / n)
    assert _kernel_decode(spark, [data])[0] == got


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(_block(), _block(), _block(),
                          _block(), _block(), _block()),
                min_size=1, max_size=3),
       st.integers(min_value=1, max_value=12),
       st.integers(min_value=0, max_value=2))
def test_420_kernel_equals_spec_ac_rich(spark, mcus, qscale, dri):
    """AC-rich 4:2:0 MCUs (chroma carries AC too, exercising the
    subsampled plane's own IDCT before upsampling): the two
    implementations stay pinned exactly equal, restarts included."""
    blocks = [b for mcu in mcus for b in mcu]
    data = encode_jpeg(blocks, 16 * len(mcus), 16, [qscale] * 64,
                       nf=3, sampling="420",
                       dri=dri if 0 < dri < len(mcus) else 0)
    want = parse_jpeg(data)
    assert want is not None
    assert _kernel_decode(spark, [data])[0] == want


def test_422_dc_only_exact_horizontal_replication():
    """4:2:2 (Y 2x1): one 16x8 MCU, two Y halves + chroma replicated
    horizontally only — means equal the hand-computed conversion."""
    y_l, y_r, cbv, crv = 30, 220, 90, 170
    blocks = [_dc(y_l), _dc(y_r), _dc(cbv), _dc(crv)]
    data = encode_jpeg(blocks, 16, 8, [8] * 64, nf=3, sampling="422")
    got = parse_jpeg(data)
    assert got is not None
    assert got[:3] == (16, 8, 128)
    assert got[3] == (y_l + y_r) / 2
    rl, gl, bl = _rgb_ref(y_l, cbv, crv)
    rr, gr, br = _rgb_ref(y_r, cbv, crv)
    assert (got[4], got[5], got[6]) == ((rl + rr) / 2, (gl + gr) / 2,
                                        (bl + br) / 2)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_block(), _block(), _block(), _block()),
                min_size=1, max_size=3),
       st.integers(min_value=1, max_value=12))
def test_422_kernel_equals_spec_ac_rich(spark, mcus, qscale):
    """AC-rich 4:2:2: kernel and spec pinned exactly equal."""
    blocks = [b for mcu in mcus for b in mcu]
    data = encode_jpeg(blocks, 16 * len(mcus), 8, [qscale] * 64,
                       nf=3, sampling="422")
    want = parse_jpeg(data)
    assert want is not None
    assert _kernel_decode(spark, [data])[0] == want


def test_411_dc_only_exact_horizontal_replication():
    """4:1:1 (Y 4x1): one 32x8 MCU, four Y quarters + chroma
    replicated 4x horizontally — means equal the hand-computed
    conversion."""
    ys, cbv, crv = (30, 90, 150, 220), 90, 170
    blocks = [_dc(v) for v in ys] + [_dc(cbv), _dc(crv)]
    data = encode_jpeg(blocks, 32, 8, [8] * 64, nf=3, sampling="411")
    got = parse_jpeg(data)
    assert got is not None
    assert got[:3] == (32, 8, 256)
    assert got[3] == sum(ys) / 4
    rgb = [_rgb_ref(v, cbv, crv) for v in ys]
    assert (got[4], got[5], got[6]) == tuple(
        sum(c[i] for c in rgb) / 4 for i in range(3))


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_block(), _block(), _block(), _block(),
                          _block(), _block()),
                min_size=1, max_size=3),
       st.integers(min_value=1, max_value=12))
def test_411_kernel_equals_spec_ac_rich(spark, mcus, qscale):
    """AC-rich 4:1:1: kernel and spec pinned exactly equal."""
    blocks = [b for mcu in mcus for b in mcu]
    data = encode_jpeg(blocks, 32 * len(mcus), 8, [qscale] * 64,
                       nf=3, sampling="411")
    want = parse_jpeg(data)
    assert want is not None
    assert _kernel_decode(spark, [data])[0] == want


def test_off_whitelist_sampling_stays_null(spark):
    """Sampling layouts off the whitelist (4:4:0 — Y 1x2 — and a
    2x2-chroma inversion) remain the documented NULL boundary."""
    blocks = [_dc(100), _dc(110), _dc(120)]
    for bad in (0x12, 0x14):
        data = bytearray(encode_jpeg(blocks, 8, 8, [8] * 64, nf=3))
        assert data[71:73] == b"\xFF\xC0" and data[82] == 0x11
        data[82] = bad
        data = bytes(data)
        assert parse_jpeg(data) is None
        assert _kernel_decode(spark, [data])[0] is None


# ---------------------------------------------------------------------------
# the synthesis corpus, decoded by the INDEPENDENT spec implementation
# ---------------------------------------------------------------------------

def test_synth_corpus_spec_decode_returns_the_bytes(spark):
    """Tie synthesis to the spec decoder without the kernel in the
    loop: Catalyst-built files decode (via parse_jpeg) to exactly the
    document's leading bytes — the lossless-at-quant-8 contract the
    oracle relies on."""
    from tripgogo_vector_search_spark.operators.jpeg import (
        synth_jpeg_corpus)
    texts = ["hello jpeg", "a", "éè multi-byte ☃",
             "x" * 200]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")
    media = {r.media_id: bytes(r.content)
             for r in synth_jpeg_corpus(docs).collect()}
    for i, t in enumerate(texts):
        bs = t.encode()[: _JPEG_MAX_BLOCKS * 1]
        n = min(len(t.encode()), _JPEG_MAX_BLOCKS)
        got = parse_jpeg(media[i])
        assert got is not None
        w, h, npx, mean = got[:4]
        assert (w, h, npx) == (8 * n, 8, 64 * n)
        assert mean == sum(t.encode()[:n]) / n


def test_synth_null_and_empty_text(spark):
    from tripgogo_vector_search_spark.operators.jpeg import (
        synth_jpeg_corpus)
    docs = spark.createDataFrame([(0, None), (1, "")],
                                 "doc_id bigint, text string")
    rows = {r.media_id: r.content
            for r in synth_jpeg_corpus(docs).collect()}
    assert rows[0] is None and rows[1] is None
