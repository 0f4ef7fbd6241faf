"""Progressive JPEG (ITU-T T.81 Annex G, round 14): a spectral-
selection + successive-approximation test ENCODER (the libjpeg
phuff algorithm: DC first/refine scans, AC band scans with EOB-run
accumulation and buffered correction bits) round-trips scan scripts
through both decoder implementations, pinned exactly equal — and,
for full-precision scripts, pinned equal to the BASELINE encoding of
the same coefficients, which is the semantic ground truth requiring
no new oracle math.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from tests.test_jpeg import (
    K_DC_BITS, K_DC_VALS, _block, _codes_from,
    _kernel_decode, _seg, _Writer, encode_jpeg)
from tripgogo_vector_search_spark.operators.jpeg import parse_jpeg


# The Annex K AC table is baseline-only: it carries no EOBn symbols
# (r<<4 with s=0 for r<15). Progressive scans need them, so the
# progressive encoder ships its own DHT — every (run, size) plus all
# EOBn and ZRL, 176 symbols at a flat 8-bit code length (a legal
# canonical table, and a nice workout for the decoders' DHT
# reconstruction: codes 0..175 of 256).
P_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
P_AC_BITS = [0] * 7 + [len(P_AC_VALS)] + [0] * 8


class _PWriter(_Writer):
    """_Writer plus the phuff EOB-run machinery: EOBRUN counts
    all-zero(-history) band blocks; BE buffers their correction bits
    until the run is flushed."""

    def __init__(self, ac_codes):
        super().__init__()
        self.ac = ac_codes
        self.eobrun = 0
        self.be = []

    def emit_sym(self, sym):
        ln, code = self.ac[sym]
        self.put(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.emit_sym(nbits << 4)
            if nbits:
                self.put(self.eobrun - (1 << nbits), nbits)
            for b in self.be:
                self.put(b, 1)
            self.be = []
            self.eobrun = 0


def encode_jpeg_progressive(blocks_zz, width, height, qt_zz, scans,
                            nf=1, dri=0):
    """Progressive encoder over pre-quantized zigzag blocks (natural
    full-precision values). ``scans``: list of dicts with keys
    comps (list of component indices), ss, se, ah, al. For nf>1,
    blocks_zz is interleaved [c0,c1,...,c0,c1,...] like encode_jpeg.
    Emits SOF2 + per-scan SOS; DC scans may be interleaved, AC scans
    are single-component (spec G.1.1)."""
    dc = _codes_from(K_DC_BITS, K_DC_VALS)
    ac = _codes_from(P_AC_BITS, P_AC_VALS)
    n_units = len(blocks_zz) // nf
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_zz))
    comps = b"".join(bytes([c + 1, 0x11, 0]) for c in range(nf))
    out += _seg(0xC2, bytes([8]) + height.to_bytes(2, "big")
                + width.to_bytes(2, "big") + bytes([nf]) + comps)
    out += _seg(0xC4, bytes([0x00]) + bytes(K_DC_BITS) + bytes(K_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(P_AC_BITS) + bytes(P_AC_VALS))
    if dri:
        out += _seg(0xDD, dri.to_bytes(2, "big"))

    def blk(ci, u):
        return blocks_zz[u * nf + ci]

    for scan in scans:
        sc, ss, se = scan["comps"], scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        sel = b"".join(bytes([c + 1, 0x00]) for c in sc)
        out += _seg(0xDA, bytes([len(sc)]) + sel + bytes([ss, se,
                                                          (ah << 4) | al]))
        w = _PWriter(ac)
        preds = {c: 0 for c in sc}
        rst = 0
        for u in range(n_units):
            if dri and u and u % dri == 0:
                w.flush_eobrun()
                w.pad()
                out += w.out
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                w = _PWriter(ac)
                preds = {c: 0 for c in sc}
            for c in sc:
                zz = blk(c, u)
                if ss == 0 and ah == 0:
                    v = zz[0] >> al                 # arithmetic shift
                    diff = v - preds[c]
                    preds[c] = v
                    cat = abs(diff).bit_length()
                    ln, code = dc[cat]
                    w.put(code, ln)
                    if cat:
                        w.put(diff if diff >= 0
                              else diff + (1 << cat) - 1, cat)
                elif ss == 0:
                    w.put((zz[0] >> al) & 1, 1)     # DC refinement bit
                elif ah == 0:
                    # AC first: point transform is sign-magnitude
                    r = 0
                    for k in range(ss, se + 1):
                        t = zz[k]
                        v = (abs(t) >> al) * (1 if t >= 0 else -1)
                        if v == 0:
                            r += 1
                            continue
                        w.flush_eobrun()
                        while r > 15:
                            w.emit_sym(0xF0)
                            r -= 16
                        s = abs(v).bit_length()
                        w.emit_sym((r << 4) | s)
                        w.put(v if v >= 0 else v + (1 << s) - 1, s)
                        r = 0
                    if r > 0:
                        w.eobrun += 1
                        if w.eobrun == 0x7FFF:
                            w.flush_eobrun()
                else:
                    # AC refinement (libjpeg encode_mcu_AC_refine)
                    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
                    eob = 0
                    for i, t in enumerate(absv):
                        if t == 1:
                            eob = i
                    r = 0
                    br = []
                    for i, t in enumerate(absv):
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and i <= eob:
                            w.flush_eobrun()
                            w.emit_sym(0xF0)
                            r -= 16
                            for b in br:
                                w.put(b, 1)
                            br = []
                        if t > 1:
                            br.append(t & 1)
                            continue
                        w.flush_eobrun()
                        w.emit_sym((r << 4) | 1)
                        w.put(1 if zz[ss + i] >= 0 else 0, 1)
                        for b in br:
                            w.put(b, 1)
                        br = []
                        r = 0
                    if r > 0 or br:
                        w.eobrun += 1
                        w.be.extend(br)
                        if w.eobrun == 0x7FFF:
                            w.flush_eobrun()
        w.flush_eobrun()
        w.pad()
        out += w.out
    out += b"\xFF\xD9"
    return bytes(out)


FULL_GRAY = [  # a full-precision 4-scan script (DC 1+1, AC 1+1)
    {"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": 1},
    {"comps": [0], "ss": 0, "se": 0, "ah": 1, "al": 0},
    {"comps": [0], "ss": 1, "se": 63, "ah": 0, "al": 1},
    {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
]

SPLIT_BANDS = [  # band-split + two successive-approximation levels
    {"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": 2},
    {"comps": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
    {"comps": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
    {"comps": [0], "ss": 0, "se": 0, "ah": 2, "al": 1},
    {"comps": [0], "ss": 1, "se": 5, "ah": 2, "al": 1},
    {"comps": [0], "ss": 0, "se": 0, "ah": 1, "al": 0},
    {"comps": [0], "ss": 6, "se": 63, "ah": 2, "al": 1},
    {"comps": [0], "ss": 1, "se": 5, "ah": 1, "al": 0},
    {"comps": [0], "ss": 6, "se": 63, "ah": 1, "al": 0},
]


def _full_color_script():
    s = [{"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 1},
         {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0}]
    for c in range(3):
        s.append({"comps": [c], "ss": 1, "se": 63, "ah": 0, "al": 1})
    for c in range(3):
        s.append({"comps": [c], "ss": 1, "se": 63, "ah": 1, "al": 0})
    return s


@settings(max_examples=30, deadline=None)
@given(st.lists(_block(), min_size=1, max_size=6),
       st.integers(min_value=1, max_value=16),
       st.sampled_from(["full", "split"]))
def test_progressive_equals_baseline(blocks, qscale, script):
    """The killer property: a full-precision progressive scan script
    must decode to EXACTLY the same stats as the baseline encoding of
    the same quantized coefficients."""
    qt = [qscale] * 64
    scans = FULL_GRAY if script == "full" else SPLIT_BANDS
    prog = encode_jpeg_progressive(blocks, 8 * len(blocks), 8, qt, scans)
    base = encode_jpeg(blocks, 8 * len(blocks), 8, qt)
    want = parse_jpeg(base)
    got = parse_jpeg(prog)
    assert want is not None
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(_block(), min_size=1, max_size=6),
       st.integers(min_value=0, max_value=3))
def test_progressive_kernel_equals_spec(spark, blocks, dri):
    """Kernel and spec decoder pinned exactly equal on progressive
    streams, restart intervals included."""
    qt = [3] * 64
    prog = encode_jpeg_progressive(
        blocks, 8 * len(blocks), 8, qt, SPLIT_BANDS,
        dri=dri if 0 < dri < len(blocks) else 0)
    want = parse_jpeg(prog)
    assert want is not None
    assert _kernel_decode(spark, [prog])[0] == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(_block(), _block(), _block()),
                min_size=1, max_size=4))
def test_progressive_color_equals_baseline_color(spark, mcus):
    """3-component: interleaved progressive DC scans + per-component
    AC scans decode to the same RGB stats as baseline color."""
    blocks = [b for mcu in mcus for b in mcu]
    qt = [4] * 64
    prog = encode_jpeg_progressive(blocks, 8 * len(mcus), 8, qt,
                                   _full_color_script(), nf=3)
    base = encode_jpeg(blocks, 8 * len(mcus), 8, qt, nf=3)
    want = parse_jpeg(base)
    got = parse_jpeg(prog)
    assert want is not None and got == want
    assert _kernel_decode(spark, [prog])[0] == want


def test_partial_progressive_is_coarse_not_equal():
    """Dropping the refinement scans yields a VALID decode of coarser
    coefficients — progressive semantics, not an error — and differs
    from full precision when low bits matter."""
    blocks = [[101, 7, -3] + [0] * 61]
    qt = [8] * 64
    coarse = encode_jpeg_progressive(
        blocks, 8, 8, qt,
        [{"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": 1},
         {"comps": [0], "ss": 1, "se": 63, "ah": 0, "al": 1}])
    full = encode_jpeg_progressive(blocks, 8, 8, qt, FULL_GRAY)
    got_c, got_f = parse_jpeg(coarse), parse_jpeg(full)
    assert got_c is not None and got_f is not None
    assert got_c[:3] == got_f[:3]
    assert got_c[3] != got_f[3]
    # and the coarse decode equals baseline-encoding the truncated
    # coefficients ((v >> 1) << 1 per the point transform)
    def pt(v):
        return (v >> 1) << 1 if v >= 0 else -(((-v) >> 1) << 1)
    trunc = [[(blocks[0][0] >> 1) << 1] + [pt(v) for v in blocks[0][1:]]]
    assert parse_jpeg(encode_jpeg(trunc, 8, 8, qt)) == got_c


def test_progressive_truncation_nulls(spark):
    """A progressive stream cut before EOI must NULL (silently
    emitting partial-precision stats would desynchronize the oracle),
    in both implementations."""
    blocks = [[50, 3] + [0] * 62]
    prog = encode_jpeg_progressive(blocks, 8, 8, [8] * 64, FULL_GRAY)
    cut = prog[:len(prog) - 2]
    assert parse_jpeg(prog) is not None
    assert parse_jpeg(cut) is None
    assert _kernel_decode(spark, [cut])[0] is None


def test_progressive_first_scan_must_be_dc():
    """Spec G.1.1.1.1 — and the allocation bound depends on it."""
    blocks = [[10, 5] + [0] * 62]
    bad = encode_jpeg_progressive(
        blocks, 8, 8, [8] * 64,
        [{"comps": [0], "ss": 1, "se": 63, "ah": 0, "al": 0}])
    assert parse_jpeg(bad) is None
