"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) — the FIFTH real decode,
and the first LOSSY one (VERDICT r13 list #2: "ship
multimodal_jpeg_stats with the established treatment, or close the
codec chapter"). The established treatment, in full:

* :func:`synth_jpeg_corpus` — a corpus of REAL baseline JFIF-less JPEG
  files built with pure Catalyst byte arithmetic INCLUDING the entropy
  layer: each document's UTF-8 bytes become uniform 8x8 blocks of an
  8-bit grayscale image (one block per byte, a single block row), and
  the scan is a genuine Huffman-coded bitstream — per-block DC
  DIFFERENCE categories + value bits + EOB, variable-length codes from
  the file's own DHT segments, MSB-first bit packing, 1-padding to the
  byte boundary, and real 0xFF 0x00 byte stuffing. With the DC quant
  step pinned at 8, the forward DCT of a uniform block is EXACT
  (S(0,0) = 8*(px-128), quantizes to px-128 with zero loss), so the
  lossy pipeline is exactly invertible on this corpus and the DuckDB
  oracle can derive the decoded stats straight from the text bytes —
  the multimodal_gif_stats recipe applied to an entropy-coded format.
* :func:`jpeg_stats_udf` — an Arrow-batched kernel that decodes FULL
  baseline grayscale JPEG, far more than the synthesis emits: marker
  walk (APPn/COM skip, fill bytes), multi-table DQT (8- and 16-bit)
  and DHT (canonical code reconstruction), SOF0 validation, DRI/RSTn
  restart intervals, the complete DC+AC entropy decoder (EXTEND,
  ZRL, EOB), dezigzag, dequantization, and the spec'd integer IDCT —
  hostile headers NULL out before any allocation (the ADVICE r13
  lesson applied from day one: absolute pixel cap + a data-derived
  MCU bound).
* :func:`parse_jpeg` — the genuinely independent plain-Python spec
  decoder the kernel is pinned equal to: per-spec MINCODE/MAXCODE/
  VALPTR Huffman decode (Annex F) instead of the kernel's (len, code)
  dict, a literal zigzag table instead of the kernel's generated
  diagonal walk, and per-pixel Python IDCT loops instead of numpy
  tensordot. A standard-table Huffman ENCODER round-trips AC-rich
  streams through both in tests/test_jpeg.py (hypothesis).

Decode spec (shared constant, like the GIF palette formula): the IDCT
is the exact int64 dot product with the 2^20-scaled ROUNDED cosine
basis B[v][u][y][x] = round(2^20 * C(v)C(u)/4 * cos((2y+1)v*pi/16) *
cos((2x+1)u*pi/16)), descaled with half-up rounding
((acc + 2^19) >> 20), level-shifted +128 and clamped to [0, 255].
Every term is an integer, so the sum is fold-order-free and the two
implementations agree bit-exactly by construction; the basis exceeds
the spec's Annex A accuracy requirements trivially (it is the real
IDCT rounded at 20 fractional bits). Color: 3-component 4:4:4 frames
decode through interleaved MCUs with per-component quant/Huffman
tables and independent DC predictors, then the CCIR 601 full-range
YCbCr -> RGB conversion in exact 16-bit fixed point (constants
below). Scope boundary (all-NULL struct, documented): SUBSAMPLED
color (4:2:0/4:2:2 — upsampling interpolation is convention-bound,
codec-library territory) and progressive/arithmetic scans.

Reference parity: media metadata extraction the reference delegates
to client-side libraries (streamlit_app.py display layer).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: synthesis cap: blocks (= text bytes) consumed per document. 48
#: blocks = a 384x8 image; the oracle mirrors least(dlen, 48).
_JPEG_MAX_BLOCKS = 48

#: absolute decoded-pixel cap (the _GIF_MAX_PIXELS discipline): SOF0
#: dimensions are attacker-controlled up to 65535x65535; frames whose
#: X*Y exceeds 2^24 decode to the all-NULL struct before anything is
#: allocated.
_JPEG_MAX_PIXELS = 1 << 24

#: YCbCr -> RGB decode-spec constants (shared, like the IDCT basis):
#: the CCIR 601 full-range conversion in 16-bit fixed point, rounded
#: once at definition —
#:   R = Y + (( CR_R*(Cr-128)                 + 2^15) >> 16)
#:   G = Y - (( CB_G*(Cb-128) + CR_G*(Cr-128) + 2^15) >> 16)
#:   B = Y + (( CB_B*(Cb-128)                 + 2^15) >> 16)
#: with arithmetic (floor) shift and [0,255] clamp. All-integer, so
#: both implementations agree bit-exactly and the DuckDB oracle can
#: replay the conversion with floor(x/65536).
_CR_R = 91881     # round(1.402    * 2^16)
_CB_B = 116130    # round(1.772    * 2^16)
_CB_G = 22554     # round(0.344136 * 2^16)
_CR_G = 46802     # round(0.714136 * 2^16)


# ---------------------------------------------------------------------------
# shared spec constants
# ---------------------------------------------------------------------------

def _zigzag_order() -> list:
    """Zigzag scan order generated as the diagonal walk (spec Figure
    A.6): entry k = natural index (row*8+col) of the k-th scanned
    coefficient. parse_jpeg carries the literal table; a test pins the
    two equal."""
    out = []
    r = c = 0
    up = True
    for _ in range(64):
        out.append(r * 8 + c)
        if up:
            if c == 7:
                r += 1
                up = False
            elif r == 0:
                c += 1
                up = False
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
                up = True
            elif c == 0:
                r += 1
                up = True
            else:
                r += 1
                c -= 1
    return out


#: the same table, written out (spec Figure A.6) — parse_jpeg's copy,
#: independent of the generator above
_ZIGZAG_LITERAL = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _dct_basis_q20() -> list:
    """The decode spec's IDCT basis: B[v][u][y][x] as nested lists of
    EXACT integers (2^20-scaled, rounded once at table build). Both
    implementations call this same closed-form builder — the shared-
    constant convention (module docstring) — and everything downstream
    is int64."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    basis = []
    for v in range(8):
        cv = inv_sqrt2 if v == 0 else 1.0
        bu = []
        for u in range(8):
            cu = inv_sqrt2 if u == 0 else 1.0
            by = []
            for y in range(8):
                cy = math.cos((2 * y + 1) * v * math.pi / 16.0)
                bx = []
                for x in range(8):
                    cx = math.cos((2 * x + 1) * u * math.pi / 16.0)
                    bx.append(round((1 << 20) * cv * cu / 4.0 * cy * cx))
                by.append(bx)
            bu.append(by)
        basis.append(bu)
    return basis


# ---------------------------------------------------------------------------
# synthesis: documents -> real baseline JPEG files, in Catalyst
# ---------------------------------------------------------------------------

#: the synthesis's own Huffman tables, written into the file's DHT
#: segments: DC = categories 0..11 all at code length 4 (canonical
#: codes 0..11), AC = the single symbol EOB (0x00) at code length 1
#: (canonical code 0). Unusual but fully standard tables — a spec
#: decoder must RECONSTRUCT them from BITS/HUFFVAL, which is exactly
#: the machinery the fixture should exercise (the Annex K defaults are
#: exercised by the test encoder instead).
_SYNTH_HEADER_HEX = (
    "FFD8"                                        # SOI
    "FFDB0043" "00" + "08" * 64 +                 # DQT: Pq/Tq=0, all q=8
    "FFC4001F" "00" "0000000C" + "00" * 12        # DHT DC: 12 codes @ len 4
    + "000102030405060708090A0B"
    + "FFC40014" "10" "01" + "00" * 15 + "00"     # DHT AC: EOB @ len 1
)
_SYNTH_EOI_HEX = "FFD9"


def synth_jpeg_corpus(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Deterministic corpus of REAL baseline JPEG files from document
    text, pure Catalyst (module docstring). Byte i of the text becomes
    block i's uniform gray value: with quant step 8, quantized DC =
    px-128 exactly, so DC(0) = px_0-128 and every later block's coded
    DIFF is just px_i - px_{i-1} — a real differentially-coded,
    category-bucketed, variable-length Huffman stream whose decode
    provably returns the original bytes. Image = one row of
    min(bytes, 48) blocks (width 8n, height 8). NULL text -> NULL
    content; empty text -> NULL content (a 0-width JPEG frame is not
    representable, unlike the BMP/PNG/GIF h=0 convention)."""
    return _synth_jpeg(docs, id_col, text_col, [lambda u: u])


def synth_jpeg_color_corpus(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """The 3-component sibling: byte u becomes one 4:4:4 YCbCr MCU
    with Y = u and affine chroma planes Cb = (3u+7) mod 256,
    Cr = (7u+1) mod 256 (the GIF-palette convention: the color
    transform is observable in the channel means, not an identity).
    The scan interleaves Y/Cb/Cr blocks per MCU with three
    INDEPENDENT DC predictors — the interleaving and per-component
    predictor state are exactly what the color decode path must get
    right. Same lossless-at-quant-8 contract per channel, so the
    oracle derives R/G/B means from the text bytes through the exact
    integer YCbCr conversion (module constants)."""
    return _synth_jpeg(docs, id_col, text_col, [
        lambda u: u,
        lambda u: (u * 3 + 7) % 256,
        lambda u: (u * 7 + 1) % 256,
    ])


def _synth_jpeg(docs: DataFrame, id_col: str, text_col: str,
                channels: list) -> DataFrame:
    """Shared Catalyst builder: one interleaved baseline MCU per text
    byte, len(channels) components (1x1 sampling), all components on
    quant table 0 (step 8) and Huffman tables 0 — per-component DC
    predictors encoded per spec F.1.1.5.2.

    Staged projections (the synth_png lesson): every stage alias below
    is read more than once downstream, so CollapseProject keeps the
    boundaries and the per-block folds read bound attributes."""
    nf = len(channels)
    b0 = docs.select(
        F.col(id_col).alias("media_id"),
        F.hex(F.encode(F.col(text_col), "UTF-8")).alias("_hex"))
    nb = F.when(
        F.col("_hex").isNotNull(),
        F.least((F.length("_hex") / 2).cast("bigint"),
                F.lit(_JPEG_MAX_BLOCKS).cast("bigint")))
    b1 = b0.select("media_id", "_hex", nb.alias("_n"))
    px = F.when(F.col("_n") >= 1, F.transform(
        F.sequence(F.lit(0), F.col("_n") - 1),
        lambda i: F.conv(F.substring("_hex", (i * 2 + 1).cast("int"), 2),
                         16, 10).cast("bigint"))) \
        .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
    b2 = b1.select("media_id", "_n", px.alias("_px"))

    pow2 = F.array(*[F.lit(1 << i).cast("bigint") for i in range(9)])

    def dc_bits(cur, prev):
        # category code (4 bits: canonical code == category) ++ DIFF
        # value bits (one's-complement convention for negatives) ++
        # EOB (1 bit, code 0)
        diff = cur - prev
        cat = (F.when(diff == 0, F.lit(0).cast("bigint"))
               .otherwise(F.length(
                   F.conv(F.abs(diff).cast("string"), 10, 2))
                   .cast("bigint")))
        mapped = (F.when(diff >= 0, diff)
                  .otherwise(diff
                             + F.element_at(pow2, (cat + 1).cast("int"))
                             - 1))
        vbits = (F.lpad(F.conv(mapped.cast("string"), 10, 2), 8, "0")
                 .substr((F.lit(9) - cat).cast("int"), cat.cast("int")))
        return F.concat(
            F.lpad(F.conv(cat.cast("string"), 10, 2), 4, "0"),
            vbits, F.lit("0"))

    def mcu_bits(i):
        cur_u = F.element_at("_px", (i + 1).cast("int"))
        parts = []
        for chan in channels:
            prev_c = (F.when(i == F.lit(0), F.lit(128).cast("bigint"))
                      .otherwise(chan(
                          F.element_at("_px", i.cast("int")))))
            parts.append(dc_bits(chan(cur_u), prev_c))
        return F.concat(*parts) if nf > 1 else parts[0]

    bs0 = F.when(F.col("_n") >= 1, F.array_join(
        F.transform(F.sequence(F.lit(0), F.col("_n") - 1), mcu_bits),
        ""))
    b3 = b2.select("media_id", "_n", bs0.alias("_bs0"))
    # 1-pad to the byte boundary (spec B.2.1)
    padlen = (F.lit(8) - F.length("_bs0") % 8) % 8
    bs = F.concat(F.col("_bs0"),
                  F.lit("1111111").substr(F.lit(1), padlen.cast("int")))
    b4 = b3.select("media_id", "_n", bs.alias("_bs"))
    # bytes, with REAL 0xFF 0x00 stuffing (spec B.1.1.5)
    n_bytes = (F.length("_bs") / 8).cast("bigint")
    eh = F.when(F.col("_n") >= 1, F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_bytes - 1),
            lambda j: F.concat(
                F.lpad(F.hex(F.conv(
                    F.col("_bs").substr((j * 8 + 1).cast("int"), F.lit(8)),
                    2, 10).cast("bigint")), 2, "0"),
                F.when(F.conv(
                    F.col("_bs").substr((j * 8 + 1).cast("int"), F.lit(8)),
                    2, 10).cast("bigint") == 255,
                    F.lit("00")).otherwise(F.lit("")))),
        ""))
    b5 = b4.select("media_id", "_n", eh.alias("_eh"))
    sof_len = 8 + 3 * nf
    sof_hex = (f"FFC0{sof_len:04X}" "08" "0008")
    comps_hex = "".join(f"{c + 1:02X}1100" for c in range(nf))
    sos_len = 6 + 2 * nf
    sos_hex = (f"FFDA{sos_len:04X}{nf:02X}"
               + "".join(f"{c + 1:02X}00" for c in range(nf))
               + "003F00")
    hexfile = F.concat(
        F.lit(_SYNTH_HEADER_HEX),
        F.lit(sof_hex),                           # SOF0: P=8, Y=8
        F.lpad(F.hex(F.col("_n") * 8), 4, "0"),   # X = 8 * n_MCUs
        F.lit(f"{nf:02X}" + comps_hex),           # Nf; (Ci, 1x1, Tq=0)*
        F.lit(sos_hex),
        F.col("_eh"),
        F.lit(_SYNTH_EOI_HEX))
    content = F.when(F.col("_n") >= 1, F.unhex(hexfile))
    return b5.select("media_id", content.alias("content"))


# ---------------------------------------------------------------------------
# plain-Python spec decoder (the independent reference implementation)
# ---------------------------------------------------------------------------

def _annexf_tables(bits: list, vals: list):
    """Annex F (F.15/F.16) decode tables: MINCODE/MAXCODE/VALPTR per
    code length. MAXCODE = -1 marks an empty length."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, k = 0, 0
    for ln in range(1, 17):
        if bits[ln - 1] == 0:
            maxcode[ln] = -1
        else:
            valptr[ln] = k
            mincode[ln] = code
            code += bits[ln - 1]
            k += bits[ln - 1]
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, vals


class _BitsEnd(Exception):
    pass


class _SpecBitReader:
    """Per-spec bit source over ONE entropy-coded segment (already
    unstuffed, RST-delimited). MSB first."""

    def __init__(self, seg: bytes):
        self.seg = seg
        self.pos = 0          # bit position

    def nextbit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.seg):
            raise _BitsEnd()
        bit = (self.seg[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.nextbit()
        return v


def _extend(v: int, t: int) -> int:
    """Annex F EXTEND: map the t received bits to the signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _spec_decode_sym(rd: _SpecBitReader, tab) -> int | None:
    """Annex F Figure F.16 DECODE over MINCODE/MAXCODE/VALPTR."""
    mincode, maxcode, valptr, vals = tab
    code = rd.nextbit()
    ln = 1
    while maxcode[ln] < 0 or code > maxcode[ln]:
        ln += 1
        if ln > 16:
            return None
        code = (code << 1) | rd.nextbit()
    return vals[valptr[ln] + code - mincode[ln]]


def _split_entropy(data: bytes, p: int):
    """Unstuff the entropy-coded data starting at offset p into
    RST-delimited segments. Returns (segments, rst_numbers, end)."""
    segs, rsts = [], []
    cur = bytearray()
    n = len(data)
    while p < n:
        b = data[p]
        if b != 0xFF:
            cur.append(b)
            p += 1
            continue
        if p + 1 >= n:
            break
        m = data[p + 1]
        if m == 0x00:
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            rsts.append(m - 0xD0)
            cur = bytearray()
            p += 2
        else:
            break                      # EOI or next marker: scan over
    segs.append(bytes(cur))
    return segs, rsts, p


def _decode_scan_mcus(segs, rsts, n_mcus, dri, comps):
    """Scan walk for interleaved baseline MCUs (1x1 sampling: one
    block per component per MCU), honoring restart intervals.
    ``comps`` is a list of (dctab, actab, deq_fn) in SOF order, each
    with its own DC predictor (reset at every restart). Returns a
    list of per-MCU block lists (dequantized, natural order), or None
    on any malformed stream."""
    if dri:
        need = (n_mcus - 1) // dri     # RST between every dri MCUs
        if len(rsts) != need or any(r != i % 8 for i, r in enumerate(rsts)):
            return None
    elif rsts:
        return None                    # RST without DRI: malformed
    mcus = []
    mcu = 0
    for si, seg in enumerate(segs):
        rd = _SpecBitReader(seg)
        preds = [0] * len(comps)
        in_seg = (n_mcus - mcu) if si == len(segs) - 1 else dri
        for _ in range(in_seg):
            blocks = []
            for ci, (dctab, actab, deq_fn) in enumerate(comps):
                try:
                    t = _spec_decode_sym(rd, dctab)
                    if t is None or t > 15:
                        return None
                    diff = _extend(rd.receive(t), t)
                    preds[ci] += diff
                    zz = [0] * 64
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = _spec_decode_sym(rd, actab)
                        if rs is None:
                            return None
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break      # EOB
                        k += r
                        if k > 63:
                            return None
                        zz[k] = _extend(rd.receive(s), s)
                        k += 1
                except _BitsEnd:
                    return None
                blocks.append(deq_fn(zz))
            mcus.append(blocks)
            mcu += 1
    if mcu != n_mcus:
        return None
    return mcus


_SPEC_BASIS = None


def parse_jpeg(data: bytes | None) -> tuple | None:
    """Spec baseline-JPEG decode to image stats: returns
    (width, height, n_pixels, mean_gray, mean_r, mean_g, mean_b) —
    mean_gray is the luma-plane mean (always present); the RGB means
    are present for 3-component 4:4:4 color frames (exact integer
    YCbCr conversion, module constants) and None for grayscale — or
    None entirely for anything unreadable / out of the documented
    scope (module docstring: subsampled color and progressive scans
    are the NULL boundary). Per-pixel Python IDCT over the shared
    integer basis — the independent twin of :func:`jpeg_stats_udf`."""
    global _SPEC_BASIS
    if _SPEC_BASIS is None:
        _SPEC_BASIS = _dct_basis_q20()
    basis = _SPEC_BASIS
    if data is None or len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    qts: dict = {}
    huffs: dict = {}
    sof = None
    dri = 0
    p = 2
    try:
        while True:
            if data[p] != 0xFF:
                return None
            p += 1
            while data[p] == 0xFF:     # fill bytes (B.1.1.2)
                p += 1
            m = data[p]
            p += 1
            if m == 0xD9:
                return None            # EOI before any scan
            if 0xD0 <= m <= 0xD7 or m == 0x01:
                continue               # standalone markers
            ln = (data[p] << 8) | data[p + 1]
            if ln < 2:
                return None
            seg = data[p + 2:p + ln]
            if len(seg) != ln - 2:
                return None
            p += ln
            if m == 0xDB:              # DQT (possibly several tables)
                q = 0
                while q < len(seg):
                    pq, tq = seg[q] >> 4, seg[q] & 15
                    q += 1
                    if pq == 0:
                        qts[tq] = list(seg[q:q + 64])
                        q += 64
                    elif pq == 1:
                        qts[tq] = [(seg[q + 2 * i] << 8) | seg[q + 2 * i + 1]
                                   for i in range(64)]
                        q += 128
                    else:
                        return None
                    if len(qts[tq]) != 64:
                        return None
            elif m == 0xC4:            # DHT (possibly several tables)
                q = 0
                while q < len(seg):
                    tc, th = seg[q] >> 4, seg[q] & 15
                    q += 1
                    bits = list(seg[q:q + 16])
                    if len(bits) != 16:
                        return None
                    q += 16
                    nv = sum(bits)
                    vals = list(seg[q:q + nv])
                    if len(vals) != nv:
                        return None
                    q += nv
                    huffs[(tc, th)] = _annexf_tables(bits, vals)
            elif m == 0xC0:            # SOF0 — baseline sequential
                if seg[0] != 8:
                    return None
                y = (seg[1] << 8) | seg[2]
                x = (seg[3] << 8) | seg[4]
                nf = seg[5]
                if nf not in (1, 3) or y < 1 or x < 1:
                    return None
                comps = []
                for ci in range(nf):
                    o = 6 + 3 * ci
                    comps.append((seg[o], seg[o + 1], seg[o + 2]))
                if nf == 3 and any(hv != 0x11 for _, hv, _tq in comps):
                    return None        # subsampled color: NULL scope
                if len({c[0] for c in comps}) != nf:
                    return None        # duplicate component ids
                sof = (x, y, comps)
            elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                       0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None            # non-baseline frame types
            elif m == 0xDD:            # DRI
                dri = (seg[0] << 8) | seg[1]
            elif m == 0xDA:            # SOS
                if sof is None or seg[0] != len(sof[2]):
                    return None
                sel = {}
                for ci in range(seg[0]):
                    sel[seg[1 + 2 * ci]] = (seg[2 + 2 * ci] >> 4,
                                            seg[2 + 2 * ci] & 15)
                o = 1 + 2 * seg[0]
                if seg[o] != 0 or seg[o + 1] != 63 or seg[o + 2] != 0:
                    return None
                break
            # APPn / COM / anything else with a length: skipped
    except IndexError:
        return None
    x, y, comps = sof
    nf = len(comps)
    if x * y > _JPEG_MAX_PIXELS:
        return None
    scan_comps = []
    for cid, _hv, tq in comps:
        if cid not in sel or tq not in qts:
            return None
        td, ta = sel[cid]
        if (0, td) not in huffs or (1, ta) not in huffs:
            return None
        qt = qts[tq]

        def deq(zz, qt=qt):
            nat = [0] * 64
            for k in range(64):
                nat[_ZIGZAG_LITERAL[k]] = zz[k] * qt[k]
            return nat

        scan_comps.append((huffs[(0, td)], huffs[(1, ta)], deq))
    bw, bh = (x + 7) // 8, (y + 7) // 8
    n_mcus = bw * bh
    if n_mcus * nf > 4 * max(len(data) - p, 0):
        return None                    # each block needs >= 2 bits
    segs, rsts, _ = _split_entropy(data, p)
    mcus = _decode_scan_mcus(segs, rsts, n_mcus, dri, scan_comps)
    if mcus is None:
        return None

    def idct_px(nat, py, pxx):
        acc = 0
        for v in range(8):
            row = nat[v * 8:v * 8 + 8]
            bvy = basis[v]
            for u in range(8):
                if row[u]:
                    acc += row[u] * bvy[u][py][pxx]
        val = ((acc + (1 << 19)) >> 20) + 128
        return 0 if val < 0 else (255 if val > 255 else val)

    t_y = t_r = t_g = t_b = 0
    for bi, blocks in enumerate(mcus):
        by, bx = divmod(bi, bw)
        vis_y = min(8, y - by * 8)
        vis_x = min(8, x - bx * 8)
        for py in range(vis_y):
            for pxx in range(vis_x):
                lum = idct_px(blocks[0], py, pxx)
                t_y += lum
                if nf == 3:
                    cb = idct_px(blocks[1], py, pxx) - 128
                    cr = idct_px(blocks[2], py, pxx) - 128
                    r = lum + ((_CR_R * cr + 32768) >> 16)
                    g = lum - ((_CB_G * cb + _CR_G * cr + 32768) >> 16)
                    b = lum + ((_CB_B * cb + 32768) >> 16)
                    t_r += 0 if r < 0 else (255 if r > 255 else r)
                    t_g += 0 if g < 0 else (255 if g > 255 else g)
                    t_b += 0 if b < 0 else (255 if b > 255 else b)
    n_px = x * y
    if nf == 1:
        return (x, y, n_px, t_y / n_px, None, None, None)
    return (x, y, n_px, t_y / n_px, t_r / n_px, t_g / n_px, t_b / n_px)


# ---------------------------------------------------------------------------
# Arrow kernel
# ---------------------------------------------------------------------------

_JPEG_STRUCT = ("struct<width:int,height:int,n_pixels:bigint,"
                "mean_gray:double,"
                "mean_r:double,mean_g:double,mean_b:double>")


def jpeg_stats_udf(content_col) -> "F.Column":
    """Arrow-batched baseline-JPEG decode: binary content -> image
    dimensions + exact luma mean, plus exact RGB channel means for
    3-component 4:4:4 color frames (integer YCbCr conversion, module
    constants; NULL for grayscale). Same contract as
    :func:`parse_jpeg` but an independent implementation: (len, code)
    dict Huffman decode over a shift-register bit reader, generated
    zigzag walk, the IDCT as one int64 numpy tensordot per image and
    the color convert as vectorized int64 plane math (exact — every
    constant is an integer, so numpy's evaluation order is
    immaterial). Unreadable, hostile, or out-of-scope payloads decode
    to the all-NULL struct, never an error; output buffers are
    bounded before any allocation (_JPEG_MAX_PIXELS + a data-derived
    MCU bound). Map-only Arrow pass."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_JPEG_STRUCT)
    def _jpeg(blobs: pd.Series) -> pd.DataFrame:
        import numpy as np

        basis = np.array(_dct_basis_q20(), dtype=np.int64)
        zz_nat = _zigzag_order()
        cols = {k: [] for k in ("width", "height", "n_pixels",
                                "mean_gray", "mean_r", "mean_g",
                                "mean_b")}

        def emit(w=None, h=None, n=None, mg=None, mr=None, mgr=None,
                 mb=None):
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_pixels"].append(n)
            cols["mean_gray"].append(mg)
            cols["mean_r"].append(mr)
            cols["mean_g"].append(mgr)
            cols["mean_b"].append(mb)

        def build_huff(bits, vals):
            table = {}
            code, k = 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[k]
                    k += 1
                    code += 1
                code <<= 1
            return table

        class Bits:
            __slots__ = ("seg", "byte", "nbuf", "buf")

            def __init__(self, seg):
                self.seg = seg
                self.byte = 0
                self.buf = 0
                self.nbuf = 0

            def take(self, n):
                while self.nbuf < n:
                    if self.byte >= len(self.seg):
                        return None
                    self.buf = (self.buf << 8) | self.seg[self.byte]
                    self.byte += 1
                    self.nbuf += 8
                self.nbuf -= n
                v = (self.buf >> self.nbuf) & ((1 << n) - 1)
                return v

            def sym(self, table):
                ln, code = 0, 0
                while ln < 16:
                    b = self.take(1)
                    if b is None:
                        return None
                    code = (code << 1) | b
                    ln += 1
                    s = table.get((ln, code))
                    if s is not None:
                        return s
                return None

        def walk(data):
            if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
                return None
            qts, huffs = {}, {}
            sof, dri, sel = None, 0, None
            p = 2
            n = len(data)
            while True:
                if p >= n or data[p] != 0xFF:
                    return None
                p += 1
                while p < n and data[p] == 0xFF:
                    p += 1
                if p >= n:
                    return None
                m = data[p]
                p += 1
                if m == 0xD9:
                    return None
                if 0xD0 <= m <= 0xD7 or m == 0x01:
                    continue
                if p + 2 > n:
                    return None
                ln2 = (data[p] << 8) | data[p + 1]
                if ln2 < 2 or p + ln2 > n:
                    return None
                seg = data[p + 2:p + ln2]
                p += ln2
                if m == 0xDB:
                    q = 0
                    while q < len(seg):
                        pq, tq = seg[q] >> 4, seg[q] & 15
                        q += 1
                        step = 64 if pq == 0 else (128 if pq == 1 else 0)
                        if not step or q + step > len(seg):
                            return None
                        if pq == 0:
                            qts[tq] = np.frombuffer(
                                seg[q:q + 64], np.uint8).astype(np.int64)
                        else:
                            qts[tq] = np.frombuffer(
                                seg[q:q + 128], ">u2").astype(np.int64)
                        q += step
                elif m == 0xC4:
                    q = 0
                    while q < len(seg):
                        tcth = seg[q]
                        q += 1
                        if q + 16 > len(seg):
                            return None
                        bits = list(seg[q:q + 16])
                        q += 16
                        nv = sum(bits)
                        if q + nv > len(seg):
                            return None
                        huffs[(tcth >> 4, tcth & 15)] = build_huff(
                            bits, list(seg[q:q + nv]))
                        q += nv
                elif m == 0xC0:
                    if len(seg) < 6 or seg[0] != 8:
                        return None
                    y = (seg[1] << 8) | seg[2]
                    x = (seg[3] << 8) | seg[4]
                    nf = seg[5]
                    if nf not in (1, 3) or x < 1 or y < 1 \
                            or len(seg) < 6 + 3 * nf:
                        return None
                    comps = [(seg[6 + 3 * i], seg[7 + 3 * i],
                              seg[8 + 3 * i]) for i in range(nf)]
                    if nf == 3 and any(c[1] != 0x11 for c in comps):
                        return None    # subsampled color: NULL scope
                    if len({c[0] for c in comps}) != nf:
                        return None
                    sof = (x, y, comps)
                elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                           0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                    return None
                elif m == 0xDD:
                    if len(seg) < 2:
                        return None
                    dri = (seg[0] << 8) | seg[1]
                elif m == 0xDA:
                    if sof is None or len(seg) < 4 \
                            or seg[0] != len(sof[2]) \
                            or len(seg) < 4 + 2 * seg[0]:
                        return None
                    sel = {seg[1 + 2 * i]: (seg[2 + 2 * i] >> 4,
                                            seg[2 + 2 * i] & 15)
                           for i in range(seg[0])}
                    o = 1 + 2 * seg[0]
                    if seg[o] != 0 or seg[o + 1] != 63 \
                            or seg[o + 2] != 0:
                        return None
                    break
            x, y, comps = sof
            nf = len(comps)
            # allocation bounds BEFORE touching pixel buffers (the
            # ADVICE r13 GIF lesson, applied from day one)
            if x * y > _JPEG_MAX_PIXELS:
                return None
            tabs = []
            for cid, _hv, tq in comps:
                if cid not in sel or tq not in qts:
                    return None
                td, ta = sel[cid]
                if (0, td) not in huffs or (1, ta) not in huffs:
                    return None
                tabs.append((huffs[(0, td)], huffs[(1, ta)], qts[tq]))
            bw, bh = (x + 7) // 8, (y + 7) // 8
            n_mcus = bw * bh
            if n_mcus * nf > 4 * max(n - p, 0):
                return None          # >= 2 bits per block, hard floor
            segs, rsts, _ = _split_entropy(data, p)
            if dri:
                need = (n_mcus - 1) // dri
                if len(rsts) != need or any(r != i % 8
                                            for i, r in enumerate(rsts)):
                    return None
            elif rsts:
                return None
            coefs = np.zeros((nf, n_mcus, 64), dtype=np.int64)
            mcu = 0
            for si, seg in enumerate(segs):
                rd = Bits(seg)
                preds = [0] * nf
                left = (n_mcus - mcu) if si == len(segs) - 1 else dri
                for _ in range(left):
                    for ci in range(nf):
                        dct, act, _qt = tabs[ci]
                        t = rd.sym(dct)
                        if t is None or t > 15:
                            return None
                        v = rd.take(t)
                        if v is None:
                            return None
                        if t and v < (1 << (t - 1)):
                            v -= (1 << t) - 1
                        preds[ci] += v
                        zz = coefs[ci, mcu]
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = rd.sym(act)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63:
                                return None
                            v = rd.take(s)
                            if v is None:
                                return None
                            zz[k] = v if v >= (1 << (s - 1)) \
                                else v - (1 << s) + 1
                            k += 1
                    mcu += 1
            if mcu != n_mcus:
                return None
            # per component: dequant in zigzag, scatter to natural,
            # IDCT all blocks in one exact int64 contraction
            planes = []
            for ci in range(nf):
                deq = coefs[ci] * tabs[ci][2][None, :]
                nat = np.zeros((n_mcus, 8, 8), dtype=np.int64)
                nat.reshape(n_mcus, 64)[:, zz_nat] = deq
                out = np.tensordot(nat, basis, axes=([1, 2], [0, 1]))
                pix = np.clip(((out + (1 << 19)) >> 20) + 128, 0, 255)
                img = np.zeros((bh * 8, bw * 8), dtype=np.int64)
                for bi in range(n_mcus):
                    by, bx = divmod(bi, bw)
                    img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = pix[bi]
                planes.append(img[:y, :x])
            n_px = x * y
            mean_y = int(planes[0].sum()) / n_px
            if nf == 1:
                return (x, y, n_px, mean_y, None, None, None)
            lum, cb, cr = planes[0], planes[1] - 128, planes[2] - 128
            r = np.clip(lum + ((_CR_R * cr + 32768) >> 16), 0, 255)
            g = np.clip(lum - ((_CB_G * cb + _CR_G * cr + 32768) >> 16),
                        0, 255)
            b = np.clip(lum + ((_CB_B * cb + 32768) >> 16), 0, 255)
            return (x, y, n_px, mean_y, int(r.sum()) / n_px,
                    int(g.sum()) / n_px, int(b.sum()) / n_px)

        for blob in blobs:
            data = bytes(blob) if blob is not None else None
            res = walk(data) if data is not None else None
            if res is None:
                emit()
            else:
                emit(*res)
        return pd.DataFrame(cols)

    return _jpeg(content_col if not isinstance(content_col, str)
                 else F.col(content_col))


def decode_jpeg_stats(media: DataFrame) -> DataFrame:
    """Per-object baseline-JPEG decode over a (media_id, content)
    frame: one map-only Arrow pass, unreadable objects surfaced as
    NULL stats."""
    w = media.select("media_id",
                     jpeg_stats_udf(F.col("content")).alias("w"))
    return w.select("media_id", "w.*")
