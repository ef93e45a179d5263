"""Baseline JPEG codec, stdlib + numpy — the last common image format
behind the multimodal boundary (VERDICT r6 Next #9).

Implements the baseline sequential DCT process of the public JPEG
specification (ITU-T T.81 / ISO 10918-1): 8×8 block DCT, Annex K
quantization tables scaled by the public IJG quality formula, the
spec's standard (Annex K) Huffman tables, JFIF YCbCr color. Encoder
emits 4:4:4 (no chroma subsampling) or — with ``subsample=True`` —
4:2:0 MCU-interleaved streams (2×2 luma blocks + box-averaged chroma
per MCU, the most common real-world layout), plus single-component
grayscale, and — with ``progressive=True`` — a spectral-selection
progressive (SOF2) scan script quantized identically to baseline.
The decoder accepts baseline streams with sampling factors in
{1, 2, 4} — 4:4:4, 4:2:0, 4:2:2, 4:4:0, 4:1:1 (r11 lifted the
factor-4 refusal; the encoder emits any of those layouts via
``subsample="411"`` etc.) and grayscale — with replication chroma
upsampling and restart intervals (VERDICT r7 Next #5 lifted the
4:2:0 refusal), and — r10 — PROGRESSIVE (SOF2) streams: spectral
selection AND successive approximation, all four scan kinds of T.81
G.1.2 including AC end-of-band runs and refinement correction bits
(validated against a hand-built fixture, not just this encoder's own
output), with restart intervals supported in BOTH modes (progressive
restarts are per-scan: MCU-grained in DC scans, data-unit-grained in
the non-interleaved AC scans), and 12-BIT sample precision (SOF1
extended sequential / 12-bit SOF2: 16-bit DQT entries, level shift
2048, full T.81 category-range Huffman tables; decode returns native
0–4095 values). Everything else stays a loud refusal (arithmetic
coding — deliberately: its QM-coder Qe state table cannot be
verified against T.81 offline, and a self-consistent-but-wrong table
would decode real files incorrectly WITHOUT error — hierarchical,
sampling factor 3) — the same narrow-profile-or-raise convention
as the BMP/PGM/PNG/WAV codecs in ``binary_ops``: a wrong answer is
worse than no answer at a codec boundary.

Like the PNG decoder's deflate-bomb cap, all decoder allocation is
bounded by the declared SOF dimensions (an entropy stream cannot make
the decoder allocate more than w·h·3 samples), and a dimension above
``MAX_PIXELS`` is refused before any scan work.

Reference parity note: the reference pipeline
(`fastapi/app` in the reference repo) has no media path at all; this
module exists for the large-scale training-data mandate (image columns
as opaque binary + typed metadata), not for reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

MAX_PIXELS = 1 << 24  # 16M pixels: refuse pathological SOF dims early

# Annex K quantization tables (natural order), public spec values
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# k-th zigzag element's natural (row-major) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Standard Huffman tables, Annex K: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 12-bit Huffman tables (the Annex K tables stop at DC category 11 /
# AC size 10, below the 12-bit coefficient range): flat canonical
# tables covering the full T.81 category space — DC 0..15 at code
# length 5 (16 of 32 slots), AC = EOB + ZRL + every (run 0..15,
# size 1..14) at code length 8 (226 of 256 slots). Compression is
# not the point of the 12-bit profile here; completeness is.
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_DC12_VALS = list(range(16))
_AC12_VALS = sorted(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC12_VALS)] + [0] * 8

# 8-point DCT-II basis: C[k, n] = s(k)·cos((2n+1)kπ/16); block DCT is
# C · B · Cᵀ and the inverse is Cᵀ · B · C (orthonormal)
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling: 5000/q below 50, 200−2q above."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via JPEG canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            self.put(0x7F, 8 - self._nbits)  # pad with 1-bits per spec


class _RestartCadence:
    """Encoder-side restart bookkeeping, ONE definition for all four
    scan loops (baseline 4:4:4, baseline 4:2:0, progressive DC,
    progressive AC — review r10: the count/emit/reset idiom was
    copy-pasted): every ``ri`` units, byte-align (1-padding per
    spec), append the next RSTn bytes directly — markers are not
    entropy data, so no stuffing — and report that a boundary fired
    so the caller can reset its DC predictors. The 0-7 marker cycle
    starts at RST0 within every scan (one cadence per scan)."""

    def __init__(self, ri: int) -> None:
        self.ri = ri
        self.unit = 0
        self.rst = 0

    def boundary(self, bw: "_BitWriter") -> bool:
        fire = bool(self.ri) and self.unit > 0 and self.unit % self.ri == 0
        if fire:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) & 7
        self.unit += 1
        return fire


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


# -------------------------------------------------------------- encoder


def _quantize_block(plane, y0, x0, qt) -> np.ndarray:
    """DCT + quantize the 8×8 block of ``plane`` at (y0, x0) — edge
    replication for partial blocks (spec-recommended) — returning the
    quantized coefficients in ZIGZAG order. Shared by the baseline
    entropy coder and the progressive scan-script emitter so the two
    modes quantize identically (their decodes must agree pixel for
    pixel)."""
    h, w = plane.shape
    block = np.zeros((8, 8))
    ys, xs = min(8, h - y0), min(8, w - x0)
    block[:ys, :xs] = plane[y0 : y0 + ys, x0 : x0 + xs]
    if ys < 8:
        block[ys:, :] = block[ys - 1, :]
    if xs < 8:
        block[:, xs:] = block[:, xs - 1 : xs]
    coef = _C @ block @ _C.T
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int64).reshape(64)
    return q[ZIGZAG]


def _pad_subsample(planes, h, w, hs=2, vs=2):
    """Pad Y/Cb/Cr planes to a multiple of the 8·hs × 8·vs MCU by edge
    replication (so the hs×vs box average never reads outside the
    raster and partial MCUs encode the spec-recommended replicated
    edge) and box-average chroma by the luma sampling factors. ONE
    definition shared by the baseline entropy loop and the progressive
    scan builder — the progressive round-trip's pixel-identity to
    baseline depends on both modes feeding ``_quantize_block`` the
    same samples (r10 review: this block was copy-pasted in both
    places). The box accumulation runs in fixed raster order and
    hs·vs is a power of two for every supported layout, so the
    average is the exact IEEE value the 4:2:0-only predecessor
    produced (r11 generalization must not move a single 4:2:0 bit).
    Returns (luma, [cb, cr]) at padded resolution."""
    mh, mw = 8 * vs, 8 * hs
    ph, pw = ((h + mh - 1) // mh) * mh, ((w + mw - 1) // mw) * mw
    padded = []
    for plane in planes:
        p = np.empty((ph, pw))
        p[:h, :w] = plane
        p[:h, w:] = plane[:, w - 1 : w]
        p[h:, :] = p[h - 1 : h, :]
        padded.append(p)
    chroma = []
    for p in padded[1:]:
        acc = None
        for dy in range(vs):
            for dx in range(hs):
                sl = p[dy::vs, dx::hs]
                acc = sl if acc is None else acc + sl
        chroma.append(acc * (1.0 / (hs * vs)))
    return padded[0], chroma


#: Encoder chroma layouts: name → luma (H, V) sampling factors
#: (chroma is always 1×1). hs·vs is a power of two for each, keeping
#: the box-average multiplier exact.
_SAMPLINGS = {"420": (2, 2), "422": (2, 1), "440": (1, 2), "411": (4, 1)}


def _encode_block(bw, plane, y0, x0, qt, dc_codes, ac_codes, pred):
    """Huffman-encode the 8×8 block of ``plane`` at (y0, x0),
    returning the new DC predictor. One definition shared by the
    4:4:4 and 4:2:0 block loops so the per-block entropy coding can
    never diverge."""
    zz = _quantize_block(plane, y0, x0, qt)
    diff = int(zz[0]) - pred
    s, bits_v = _magnitude(diff)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(bits_v, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        s, bits_v = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(bits_v, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return int(zz[0])


def jpeg_encode(
    rows: list,
    quality: int = 90,
    grayscale: bool = False,
    subsample: bool = False,
    progressive: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """RGB rows (top-down, pixel = (r, g, b)) → baseline JFIF bytes.
    Default 4:4:4 interleaved; ``subsample=True`` emits the 4:2:0
    layout (luma sampling 2×2, chroma box-averaged to half resolution,
    MCU = 4 luma + 1 Cb + 1 Cr blocks — the layout most real-world
    encoders default to). ``subsample`` also accepts a layout name —
    ``"420"``, ``"422"`` (2×1), ``"440"`` (1×2), ``"411"`` (4×1, the
    DV/consumer-video layout and the one factor-4 profile in common
    use) — generalizing the same MCU interleave to the declared luma
    factors with 1×1 chroma (r11). With ``grayscale=True`` the rows
    hold plain 0–255 ints and a single-component stream is emitted
    (``subsample`` is meaningless there and refused).

    ``progressive=True`` emits a SPECTRAL-SELECTION progressive stream
    (SOF2): one interleaved DC scan, then per-component AC band scans
    (1–5, 6–63), all at full precision (Ah=Al=0). Quantization is
    byte-identical to the baseline mode (same ``_quantize_block``), so
    a progressive stream decodes to EXACTLY the pixels of its baseline
    sibling — the round-trip tests pin that identity. (Successive-
    approximation ENCODING is deliberately not offered; the decoder
    handles those streams, covered by a hand-built fixture.)

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every that-many MCUs (baseline and the progressive DC scan) or
    blocks (progressive AC scans — their MCU is one data unit,
    T.81 A.2.2), resetting the DC predictors and byte-aligning at
    each marker. RSTn numbers 0-7 cyclically, starting at RST0
    within every scan.

    ``precision=12`` emits an EXTENDED SEQUENTIAL stream (SOF1, or
    SOF2 with ``progressive=True``): rows hold 0–4095 samples, level
    shift 2048, quantization tables ×16 (the IJG convention, keeping
    relative quantization error equal to the 8-bit mode) emitted as
    16-bit DQT entries (Pq=1), and Huffman tables that cover the
    12-bit category ranges (DC 0–15, AC sizes 1–14 — the Annex K
    tables stop at DC 11/AC 10, which 12-bit coefficients exceed).
    Decode returns the native 0–4095 values."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    if h == 0 or w == 0:
        raise ValueError("jpeg_encode needs a non-empty raster")
    if subsample and grayscale:
        raise ValueError("subsample=True needs a color raster")
    if isinstance(subsample, str):
        if subsample not in _SAMPLINGS:
            raise ValueError(
                f"unknown subsample layout {subsample!r} "
                f"(one of {sorted(_SAMPLINGS)})"
            )
        samp_hv = _SAMPLINGS[subsample]
    else:
        samp_hv = (2, 2) if subsample else None
    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError(
            f"restart_interval must be in [0, 65535], got {restart_interval}"
        )
    if precision not in (8, 12):
        raise ValueError(
            f"precision must be 8 or 12, got {precision}"
        )
    shift = float(1 << (precision - 1))
    maxv = (1 << precision) - 1

    def check_range(arr):
        # out-of-range samples would otherwise surface as an untyped
        # KeyError from the Huffman category lookup (a 12-bit decode
        # fed back to an 8-bit encode — review r10); refuse loudly
        if arr.size and (arr.min() < 0 or arr.max() > maxv):
            raise ValueError(
                f"sample value outside the {precision}-bit range "
                f"[0, {maxv}] — decode output of a higher-precision "
                "stream? pass the matching precision="
            )

    if grayscale:
        y = np.asarray(rows, dtype=np.float64)
        check_range(y)
        planes = [y - shift]
    else:
        rgb = np.asarray(rows, dtype=np.float64)  # h × w × 3
        check_range(rgb)
        # JFIF RGB→YCbCr (linear, so the same weights hold at 12-bit)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - shift,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    nc = len(planes)
    qts = [_scaled_qt(QT_LUMA, quality), _scaled_qt(QT_CHROMA, quality)]
    if precision == 12:
        # ×16 tracks the 16× sample range: coefficient magnitudes (and
        # so the Huffman size categories and relative error) match the
        # 8-bit mode; entries stay ≤ 255·16 < 2^16 (Pq=1 DQT)
        qts = [qt * 16 for qt in qts]
    if grayscale:
        qts = qts[:1]
    if precision == 12:
        dc_spec = (_DC12_BITS, _DC12_VALS)
        ac_spec = (_AC12_BITS, _AC12_VALS)
        enc_dc = [_canonical_codes(*dc_spec)] * 2
        enc_ac = [_canonical_codes(*ac_spec)] * 2
    else:
        enc_dc = [
            _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
            _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
        ]
        enc_ac = [
            _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
            _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]

    if progressive:
        scans = _progressive_scans(
            planes, h, w, nc, qts, enc_dc, enc_ac, samp_hv,
            restart_interval, single_table=precision == 12,
        )
    elif samp_hv is None:
        bw = _BitWriter()
        pred = [0] * nc
        bh, bwid = (h + 7) // 8, (w + 7) // 8
        cad = _RestartCadence(restart_interval)
        for by in range(bh):
            for bx in range(bwid):
                if cad.boundary(bw):
                    pred = [0] * nc
                for ci in range(nc):
                    tbl = 0 if ci == 0 else 1
                    pred[ci] = _encode_block(
                        bw, planes[ci], by * 8, bx * 8, qts[tbl],
                        enc_dc[tbl], enc_ac[tbl], pred[ci],
                    )
        bw.flush()
    else:
        # subsampled: MCU-interleave hs·vs luma + 1 Cb + 1 Cr blocks
        # with per-component DC prediction over the padded/box-averaged
        # planes (_pad_subsample — shared with the progressive scan
        # builder so the two modes' pixel prep can never diverge)
        hs, vs = samp_hv
        bw = _BitWriter()
        pred = [0] * nc
        luma, chroma = _pad_subsample(planes, h, w, hs, vs)
        ph, pw = luma.shape
        cad = _RestartCadence(restart_interval)
        for my in range(ph // (8 * vs)):
            for mx in range(pw // (8 * hs)):
                if cad.boundary(bw):
                    pred = [0] * nc
                for byy in range(vs):
                    for bxx in range(hs):
                        pred[0] = _encode_block(
                            bw, luma,
                            (my * vs + byy) * 8, (mx * hs + bxx) * 8,
                            qts[0], enc_dc[0], enc_ac[0], pred[0],
                        )
                for ci in (1, 2):
                    pred[ci] = _encode_block(
                        bw, chroma[ci - 1], my * 8, mx * 8,
                        qts[1], enc_dc[1], enc_ac[1], pred[ci],
                    )
        bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    for tid, qt in enumerate(qts):
        if precision == 12:  # Pq=1: 16-bit entries
            zz_qt = b"".join(
                struct.pack(">H", int(qt[i])) for i in ZIGZAG
            )
            out += seg(0xFFDB, bytes([0x10 | tid]) + zz_qt)
        else:
            zz_qt = bytes(int(qt[i]) for i in ZIGZAG)
            out += seg(0xFFDB, bytes([tid]) + zz_qt)
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for cid in range(1, nc + 1):
        if samp_hv is not None and cid == 1:
            samp = (samp_hv[0] << 4) | samp_hv[1]
        else:
            samp = 0x11
        sof += bytes([cid, samp, 0 if cid == 1 else 1])
    # SOF0 is 8-bit-only by T.81 B.2.2: 12-bit sequential rides SOF1
    # (extended sequential, identical decode path)
    if progressive:
        sof_marker = 0xFFC2
    elif precision == 12:
        sof_marker = 0xFFC1
    else:
        sof_marker = 0xFFC0
    out += seg(sof_marker, sof)
    if precision == 12:
        # ONE table pair under id 0, referenced by every component —
        # the 12-bit profile's luma and chroma tables are identical
        # (the flat full-category tables), so emitting a second copy
        # under id 1 only duplicated ~490 DHT bytes (review r10)
        dht_specs = [
            (0, 0, _DC12_BITS, _DC12_VALS),
            (1, 0, _AC12_BITS, _AC12_VALS),
        ]
    else:
        dht_specs = [
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        ]
        if nc == 3:
            dht_specs += [
                (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
            ]
    for cls, tid, bits, vals in dht_specs:
        out += seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    if progressive:
        for sos_payload, entropy in scans:
            out += seg(0xFFDA, sos_payload)
            out += entropy
    else:
        sos = bytes([nc])
        for cid in range(1, nc + 1):
            t = 0 if (cid == 1 or precision == 12) else 1
            sos += bytes([cid, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += seg(0xFFDA, sos)
        out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _progressive_scans(
    planes, h, w, nc, qts, enc_dc, enc_ac, samp_hv, ri=0,
    single_table=False,
) -> list[tuple[bytes, bytes]]:
    """Build the spectral-selection scan script: quantize every block
    once (identically to the baseline path), then emit one interleaved
    DC scan followed by per-component AC band scans (1–5, 6–63) at
    Ah=Al=0. Returns [(SOS payload, entropy bytes), ...].

    ``ri`` > 0 inserts RSTn every ``ri`` MCUs in the DC scan (DC
    predictors reset) and every ``ri`` blocks in each AC scan (the
    non-interleaved MCU is one data unit); the 0-7 marker cycle
    restarts per scan. Every AC block's entropy ends at its own EOB,
    so no end-of-band run can cross a restart boundary here by
    construction — the decoder refuses streams where one does."""
    # quantized zigzag blocks per component, in the layout the
    # INTERLEAVED DC scan walks (MCU-padded when subsampled)
    if samp_hv is None:
        grids = []
        for ci in range(nc):
            tbl = 0 if ci == 0 else 1
            qt = qts[tbl]
            bh, bwid = (h + 7) // 8, (w + 7) // 8
            grids.append(
                [
                    [
                        _quantize_block(planes[ci], by * 8, bx * 8, qt)
                        for bx in range(bwid)
                    ]
                    for by in range(bh)
                ]
            )
        samp = [(1, 1)] * nc
    else:
        luma, chroma = _pad_subsample(planes, h, w, *samp_hv)
        srcs = [luma, chroma[0], chroma[1]]
        grids = []
        for ci, src in enumerate(srcs):
            tbl = 0 if ci == 0 else 1
            qt = qts[tbl]
            gh, gw = src.shape[0] // 8, src.shape[1] // 8
            grids.append(
                [
                    [
                        _quantize_block(src, by * 8, bx * 8, qt)
                        for bx in range(gw)
                    ]
                    for by in range(gh)
                ]
            )
        samp = [samp_hv, (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    scans: list[tuple[bytes, bytes]] = []
    # ---- DC scan: all components, interleaved in MCU order
    bw_dc = _BitWriter()
    pred = [0] * nc
    mcuy = len(grids[0]) // samp[0][1]
    mcux = len(grids[0][0]) // samp[0][0]
    cad = _RestartCadence(ri)
    for my in range(mcuy):
        for mx in range(mcux):
            if cad.boundary(bw_dc):
                pred = [0] * nc
            for ci in range(nc):
                hc, vc = samp[ci]
                tbl = 0 if ci == 0 else 1
                for byy in range(vc):
                    for bxx in range(hc):
                        dc = int(
                            grids[ci][my * vc + byy][mx * hc + bxx][0]
                        )
                        s, bits_v = _magnitude(dc - pred[ci])
                        code, ln = enc_dc[tbl][s]
                        bw_dc.put(code, ln)
                        if s:
                            bw_dc.put(bits_v, s)
                        pred[ci] = dc
    bw_dc.flush()
    sos = bytes([nc])
    for cid in range(1, nc + 1):
        t = 0 if (cid == 1 or single_table) else 1
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 0, 0])  # Ss=0, Se=0, Ah=Al=0
    scans.append((sos, bytes(bw_dc.out)))
    # ---- AC band scans: single-component, NON-interleaved grids
    # (T.81 A.1.1 component dims — a subset of the padded DC grid
    # when the frame is not an MCU multiple)
    for ci in range(nc):
        hc, vc = samp[ci]
        tbl = 0 if ci == 0 else 1
        cw = -(-w * hc // hmax)
        ch = -(-h * vc // vmax)
        gbw, gbh = -(-cw // 8), -(-ch // 8)
        for ss, se in ((1, 5), (6, 63)):
            bwr = _BitWriter()
            cad = _RestartCadence(ri)
            for by in range(gbh):
                for bx in range(gbw):
                    cad.boundary(bwr)
                    zz = grids[ci][by][bx]
                    run = 0
                    for k in range(ss, se + 1):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = enc_ac[tbl][0xF0]
                            bwr.put(code, ln)
                            run -= 16
                        s, bits_v = _magnitude(v)
                        code, ln = enc_ac[tbl][(run << 4) | s]
                        bwr.put(code, ln)
                        bwr.put(bits_v, s)
                        run = 0
                    if run:  # EOB0: end-of-band run of exactly 1
                        code, ln = enc_ac[tbl][0x00]
                        bwr.put(code, ln)
            bwr.flush()
            t = 0 if (ci == 0 or single_table) else 1
            sos = bytes([1, ci + 1, (t << 4) | t, ss, se, 0])
            scans.append((sos, bytes(bwr.out)))
    return scans


# -------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RSTn markers
    are surfaced to the caller via ``restart()``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            byte = d[self.pos]
            self.pos += 1
            if byte != 0xFF:
                return byte
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            # a real marker: step back so the caller sees it
            self.pos -= 1
            raise _MarkerReached()

    def bit(self) -> int:
        if self._nbits == 0:
            self._acc = self._next_byte()
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, expected: int) -> None:
        """Consume the RSTn marker with sequence number ``expected``
        (the 0-7 cycle, restarting at RST0 within every scan) and
        byte-align. The number IS the resync mechanism T.81 defines
        the cycle for: accepting any RSTn here would let a stream
        with swapped or dropped intervals decode self-consistently
        into spatially scrambled blocks with no error (review r10) —
        refused loudly instead."""
        self._nbits = 0
        d = self.data
        if not (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        if d[self.pos + 1] != 0xD0 + (expected & 7):
            raise ValueError(
                "JPEG restart marker out of sequence: got "
                f"RST{d[self.pos + 1] - 0xD0}, expected RST{expected & 7}"
            )
        self.pos += 2


class _MarkerReached(Exception):
    pass


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(
    content: bytes,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """JPEG bytes → (width, height, RGB rows top-down). Accepts
    baseline (SOF0) color with sampling factors in {1, 2, 4} — 4:4:4,
    4:2:0 (2×2 luma MCUs, chroma upsampled by replication), 4:2:2,
    4:4:0, 4:1:1 (r11) — and grayscale, plus restart intervals, AND
    progressive
    (SOF2) streams — spectral selection and successive approximation,
    dispatched to ``_decode_progressive`` (r10), with restart
    intervals honored there too (per-scan DRI, MCU grain in DC scans,
    data-unit grain in AC scans). 12-bit streams (SOF1 extended
    sequential, or 12-bit SOF2) decode to native 0–4095 values —
    precision follows the stream, never silently rescaled. Refuses
    arithmetic/hierarchical streams, other precisions, and sampling
    factor 3 with ``ValueError`` so callers fall back to the stub
    boundary."""
    b = bytes(content)
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    qts: dict[int, np.ndarray] = {}
    pq1_seen = False
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    restart_interval = 0
    i = 2
    scan = None
    progressive = False
    # progressive scans: (scan_comps, Ss, Se, Ah, Al, tables, data_pos,
    # restart_interval) — Huffman tables (and the DRI value) resolve AT
    # PARSE TIME because DHT/DRI segments may legally redefine them
    # between scans
    prog_scans: list = []
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", b, i + 2)[0]
        if i + 2 + ln > len(b):
            raise ValueError("truncated JPEG header segment")
        payload = b[i + 4 : i + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq not in (0, 1):
                    raise ValueError(f"bad JPEG DQT precision {pq}")
                step = 1 + pq  # 8- or 16-bit entries (Pq=1: 12-bit only)
                zz = payload[p + 1 : p + 1 + 64 * step]
                if len(zz) < 64 * step:
                    raise ValueError("truncated JPEG DQT segment")
                nat = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    v = (
                        zz[k]
                        if pq == 0
                        else struct.unpack_from(">H", zz, 2 * k)[0]
                    )
                    nat[ZIGZAG[k]] = v
                qts[tq] = nat
                pq1_seen = pq1_seen or pq == 1
                p += 1 + 64 * step
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "unsupported JPEG process (need sequential SOF0/SOF1 "
                "or progressive SOF2)"
            )
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2
            # progressive — SOF1 decodes exactly like SOF0 (the
            # extended process differs only in the 12-bit allowance
            # and Huffman table count, both handled below)
            progressive = marker == 0xC2
            if len(payload) < 6:
                raise ValueError("truncated JPEG SOF segment")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if len(payload) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF segment")
            if prec not in (8, 12):
                raise ValueError(
                    "unsupported JPEG precision (need 8- or 12-bit)"
                )
            if prec == 12 and marker == 0xC0:
                # T.81 B.2.2: baseline is 8-bit only — a 12-bit SOF0
                # is a malformed stream, not an extended-sequential one
                raise ValueError("baseline JPEG (SOF0) must be 8-bit")
            if nc not in (1, 3):
                raise ValueError("unsupported JPEG component count")
            if fw * fh > MAX_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {fw}x{fh} exceed the {MAX_PIXELS}"
                    "-pixel decode bound"
                )
            comps = []
            for c in range(nc):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                hs, vs = samp >> 4, samp & 15
                if nc == 1:
                    # a single-component scan is NON-interleaved per
                    # T.81 A.2: its MCU is one data unit regardless of
                    # the declared factors — normalize instead of
                    # refusing streams that declare 0x22 for gray
                    hs = vs = 1
                if hs not in (1, 2, 4) or vs not in (1, 2, 4):
                    # {1, 2, 4} keeps every hmax/hc, vmax/vc ratio an
                    # integer (the replication upsampler's contract);
                    # factor 3 — legal per T.81 but absent from JFIF
                    # practice — would need fractional upsampling and
                    # stays refused (r11: factor 4 / 4:1:1 now decodes)
                    raise ValueError(
                        "unsupported JPEG sampling factors (each must "
                        "be 1, 2 or 4: 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 "
                        "/ 4:1:1)"
                    )
                comps.append((cid, hs, vs, tq))
            if sum(hc * vc for _, hc, vc, _ in comps) > 10:
                # T.81 B.2.3: at most 10 data units per MCU — a
                # crafted 4x4+4x4+4x4 frame would otherwise allocate
                # 48 blocks per MCU and walk them all.
                # Deliberately STRICTER than spec scope (ADVICE r11):
                # B.2.3's bound applies only to interleaved scans, but
                # this decoder enforces it frame-wide at SOF parse —
                # a legal stream declaring high factors everywhere and
                # using non-interleaved scans is refused loudly, the
                # same narrow-profile-or-raise convention as the
                # factor-3 refusal above. Move the check to
                # interleaved-scan setup if such streams ever need to
                # decode.
                raise ValueError(
                    "JPEG MCU exceeds 10 data units (T.81 B.2.3)"
                )
            sof = (fw, fh, comps, prec)
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 15
                bits = list(payload[p + 1 : p + 17])
                if len(bits) < 16:
                    raise ValueError("truncated JPEG DHT segment")
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated JPEG DHT segment")
                huff[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            if len(payload) < 2:
                raise ValueError("truncated JPEG DRI segment")
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xDA:  # SOS
            if len(payload) < 1 or len(payload) < 4 + 2 * payload[0]:
                raise ValueError("truncated JPEG SOS segment")
            ns = payload[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = payload[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 15))
            if not progressive:
                scan = (scan_comps, i + 2 + ln)
                break
            ss = payload[1 + 2 * ns]
            se = payload[2 + 2 * ns]
            ah = payload[3 + 2 * ns] >> 4
            al = payload[3 + 2 * ns] & 15
            # resolve only the tables this scan KIND actually reads:
            # DC-refinement scans are raw bits (no Huffman at all),
            # and a DC scan never touches the AC slot (T.81 G.1.2)
            tabs = []
            for cs, dc_t, ac_t in scan_comps:
                need = None
                if ss == 0 and ah == 0:
                    need = (0, dc_t)
                elif ss > 0:
                    need = (1, ac_t)
                t = None
                if need is not None:
                    t = huff.get(need)
                    if t is None:
                        raise ValueError(
                            f"missing JPEG huffman table {need} for "
                            f"progressive scan component {cs}"
                        )
                tabs.append(t)
            data_pos = i + 2 + ln
            # entropy data runs to the next real marker (stuffed 0x00
            # and RSTn bytes belong to the scan)
            j = data_pos
            while j + 1 < len(b):
                if (
                    b[j] == 0xFF
                    and b[j + 1] != 0x00
                    and not (0xD0 <= b[j + 1] <= 0xD7)
                ):
                    break
                j += 1
            # DRI may be redefined between scans (like DHT): the value
            # in effect at THIS SOS governs this scan's restart grid
            prog_scans.append(
                (scan_comps, ss, se, ah, al, tabs, data_pos,
                 restart_interval)
            )
            i = j
            continue
        i += 2 + ln
    if progressive:
        if sof is None or not prog_scans:
            raise ValueError("missing JPEG SOF/SOS")
        fw, fh, comps, prec = sof
        if prec == 8 and pq1_seen:
            raise ValueError(
                "16-bit JPEG quant tables (Pq=1) are only legal in "
                "12-bit streams (T.81 B.2.4.1)"
            )
        return _decode_progressive(
            b, fw, fh, comps, qts, prog_scans, prec
        )
    if sof is None or scan is None:
        raise ValueError("missing JPEG SOF/SOS")
    fw, fh, comps, prec = sof
    if prec == 8 and pq1_seen:
        raise ValueError(
            "16-bit JPEG quant tables (Pq=1) are only legal in "
            "12-bit streams (T.81 B.2.4.1)"
        )
    scan_comps, data_pos = scan
    if len(scan_comps) != len(comps):
        raise ValueError("JPEG scan/frame component mismatch")
    # components pair POSITIONALLY below, so the ids must agree —
    # a reordered scan would otherwise cross-wire quant/Huffman
    # tables and decode garbled pixels with no error (review r7:
    # "a wrong answer is worse than no answer")
    for ci in range(len(comps)):
        if scan_comps[ci][0] != comps[ci][0]:
            raise ValueError(
                "JPEG scan component order differs from the frame's — "
                "refusing rather than cross-wiring tables"
            )
        if (0, scan_comps[ci][1]) not in huff or (
            1,
            scan_comps[ci][2],
        ) not in huff:
            raise ValueError(
                f"missing JPEG huffman table for component "
                f"{scan_comps[ci][0]}"
            )

    br = _BitReader(b, data_pos)
    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    # allocation stays SOF-bounded: per component ≤ (fh+8·vmax)·
    # (fw+8·hmax) samples — the MAX_PIXELS refusal above caps fw·fh
    planes = [
        np.zeros((mcuy * vc * 8, mcux * hc * 8))
        for (_, hc, vc, _) in comps
    ]
    pred = [0] * nc
    mcu_count = 0

    def decode_block(ci, dc_t, ac_t, qt, y0, x0):
        try:
            s = _huff_decode(br, huff[(0, dc_t)])
            if s > 15:
                # a corrupted DHT can carry arbitrary symbol bytes; a
                # category past T.81's maximum would read a >15-bit
                # magnitude and overflow the int64 coefficient store
                # (found by the byte-flip fuzz) — refuse, not crash
                raise ValueError(f"invalid JPEG DC category {s}")
            diff = _extend(br.bits(s), s) if s else 0
            pred[ci] += diff
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = _huff_decode(br, huff[(1, ac_t)])
                run, size = rs >> 4, rs & 15
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("JPEG AC run past block end")
                zz[k] = _extend(br.bits(size), size)
                k += 1
        except _MarkerReached as exc:
            raise ValueError("truncated JPEG entropy stream") from exc
        nat = np.zeros(64, dtype=np.float64)
        nat[ZIGZAG] = zz
        coef = (nat * qt).reshape(8, 8)
        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = _C.T @ coef @ _C

    rst_expect = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart(rst_expect)
                rst_expect = (rst_expect + 1) & 7
                pred = [0] * nc
            mcu_count += 1
            # component data units in raster order inside the MCU —
            # the T.81 A.2.3 interleave (4:4:4 degenerates to one
            # block per component, the pre-r8 layout)
            for ci in range(nc):
                _, dc_t, ac_t = scan_comps[ci]
                _, hc, vc, tq = comps[ci]
                qt = qts.get(tq)
                if qt is None:
                    raise ValueError("missing JPEG quant table")
                for byy in range(vc):
                    for bxx in range(hc):
                        decode_block(
                            ci, dc_t, ac_t, qt,
                            (my * vc + byy) * 8,
                            (mx * hc + bxx) * 8,
                        )
    return _reconstruct(planes, comps, fw, fh, prec)


def jpeg_precision(content: bytes) -> int:
    """Sample precision (8 or 12) from the stream's SOF header, WITHOUT
    decoding — the bit routing callers need now that 12-bit streams
    decode (their rows carry 0–4095 samples, and feeding those to an
    8-bit re-encode or an 0–255-scale feature column would corrupt
    silently — review r10). Walks header segments only; same marker
    conventions (and refusals) as ``jpeg_decode``'s parser."""
    b = bytes(content)
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = b[i + 1]
        if marker == 0xD9:
            break
        if 0xC0 <= marker <= 0xCB and marker not in (0xC4, 0xC8):
            # any SOFn (DHT 0xC4 and JPG 0xC8 are not frame headers)
            if i + 4 >= len(b):
                # the loop bound admits a header that ends AT the
                # precision byte — reading it would IndexError through
                # the stub boundary (review r10, caught by extending
                # the codec fuzz to this entry point)
                raise ValueError("truncated JPEG SOF segment")
            prec = b[i + 4]
            if prec not in (8, 12):
                # probe refusals stay a superset of jpeg_decode's: a
                # crafted SOF9 can carry any precision byte (even 0,
                # which would ZeroDivisionError a maxval=(1<<p)-1
                # consumer), and this probe is callable standalone —
                # it must not launder a garbage value (review r11)
                raise ValueError(
                    f"unsupported JPEG sample precision {prec}"
                )
            return prec
        ln = struct.unpack_from(">H", b, i + 2)[0]
        if i + 2 + ln > len(b):
            raise ValueError("truncated JPEG header segment")
        i += 2 + ln
    raise ValueError("missing JPEG SOF")


def _reconstruct(
    planes: list, comps: list, fw: int, fh: int, prec: int = 8
) -> tuple[int, int, list]:
    """Shared decode tail (baseline + progressive): replication
    upsampling to full resolution (box-subsampled chroma comes back as
    its nearest-neighbor expansion), crop the MCU padding to the
    declared dimensions, then JFIF YCbCr→RGB (or grayscale fan-out).

    ``prec`` sets the level shift (2^(P−1)) and clip range
    (0..2^P−1): 12-bit streams decode to 0..4095 sample values —
    native precision, NOT rescaled to 8-bit (a silent >>4 would lose
    the extra bits the format exists for; callers that want 8-bit
    divide explicitly)."""
    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    shift = float(1 << (prec - 1))
    maxv = float((1 << prec) - 1)
    full = []
    for ci, (_, hc, vc, _) in enumerate(comps):
        p = planes[ci]
        if vc < vmax:
            p = np.repeat(p, vmax // vc, axis=0)
        if hc < hmax:
            p = np.repeat(p, hmax // hc, axis=1)
        full.append(p[:fh, :fw])
    if nc == 1:
        y = np.clip(full[0] + shift, 0, maxv)
        r = g = bl = y
    else:
        y = full[0] + shift
        cb = full[1]
        cr = full[2]
        r = np.clip(y + 1.402 * cr, 0, maxv)
        g = np.clip(y - 0.344136 * cb - 0.714136 * cr, 0, maxv)
        bl = np.clip(y + 1.772 * cb, 0, maxv)
    ri = np.rint(r).astype(np.int64)
    gi = np.rint(g).astype(np.int64)
    bi = np.rint(bl).astype(np.int64)
    rows = [
        [(int(ri[yy, xx]), int(gi[yy, xx]), int(bi[yy, xx])) for xx in range(fw)]
        for yy in range(fh)
    ]
    return fw, fh, rows


# --------------------------------------------------- progressive decode


def _decode_progressive(
    b: bytes, fw: int, fh: int, comps: list, qts: dict, scans: list,
    prec: int = 8,
) -> tuple[int, int, list]:
    """Progressive (SOF2) decode: every scan deposits bits into
    per-component ZIGZAG-ORDER coefficient arrays — spectral selection
    picks the band [Ss, Se], successive approximation the bit plane
    (first pass Ah=0 codes values at precision Al; refinement passes
    Ah=Al+1 append one bit) — and one dequantize+IDCT pass at the end
    reconstructs pixels. The four scan kinds follow T.81 G.1.2 (the
    same algorithms libjpeg's decode_mcu_DC/AC_first/refine implement
    from the spec; reimplemented here from the public description):

    * DC first  (Ss=0, Ah=0): baseline DC diff coding, value << Al;
      interleaved in MCU order when the scan names several components.
    * DC refine (Ss=0, Ah>0): one raw bit per block ORed at bit Al.
    * AC first  (Ss>0, Ah=0): run/size coding inside the band plus
      EOBn end-of-band RUNS (eobrun = 2^r − 1 + r extra bits of blocks
      beyond this one with nothing in the band). Single-component by
      spec — AC scans are never interleaved.
    * AC refine (Ss>0, Ah>0): for each coded symbol, one correction
      bit per already-nonzero coefficient passed over, zero-history
      runs positioned by r, new coefficients appear as ±2^Al
      (magnitude must be 1); EOBn here counts the CURRENT block and
      the remainder of every EOB-run block still receives correction
      bits for its nonzero history.

    Correction-bit arithmetic uses two's-complement bit tests
    ((coef & 2^Al) == 0 → move the magnitude up one bit away from
    zero), which Python's infinite-precision & reproduces exactly for
    negative values.

    Allocation stays SOF-bounded as in the baseline path: coefficient
    arrays are (MCU-padded blocks) × 64 per component, capped by the
    MAX_PIXELS refusal on fw·fh before any scan work."""
    nc = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    coefs = [
        np.zeros((mcuy * vc, mcux * hc, 64), dtype=np.int64)
        for (_, hc, vc, _) in comps
    ]
    # non-interleaved block grids derive from the COMPONENT dimensions
    # (T.81 A.1.1: ceil(f·h/hmax) samples), NOT the MCU-padded grid —
    # a 4:2:0 luma plane at fh=17 has 3 block rows non-interleaved but
    # 4 in the padded interleaved grid
    nbw, nbh = [], []
    for _, hc, vc, _ in comps:
        cw = -(-fw * hc // hmax)
        ch = -(-fh * vc // vmax)
        nbw.append(-(-cw // 8))
        nbh.append(-(-ch // 8))
    cidx = {c[0]: i for i, c in enumerate(comps)}

    for scan_comps, ss, se, ah, al, tabs, dpos, ri in scans:
        if not (0 <= ss <= se <= 63):
            raise ValueError(f"bad JPEG spectral band [{ss}, {se}]")
        for cs, _, _ in scan_comps:
            if cs not in cidx:
                raise ValueError(
                    f"JPEG scan names unknown component {cs}"
                )
        br = _BitReader(b, dpos)
        try:
            if ss == 0:
                if se != 0:
                    raise ValueError(
                        "progressive JPEG DC scan must have Se=0 "
                        "(a baseline-coded stream marked SOF2?)"
                    )
                _scan_dc(
                    br, scan_comps, cidx, comps, coefs, nbw, nbh,
                    mcux, mcuy, ah, al, tabs, ri,
                )
            else:
                if len(scan_comps) != 1:
                    raise ValueError(
                        "progressive JPEG AC scans are single-component"
                    )
                ci = cidx[scan_comps[0][0]]
                _scan_ac(
                    br, coefs[ci], nbw[ci], nbh[ci], ss, se, ah, al,
                    tabs[0], ri,
                )
        except _MarkerReached as exc:
            raise ValueError("truncated JPEG entropy stream") from exc

    planes = []
    for ci, (_, hc, vc, tq) in enumerate(comps):
        qt = qts.get(tq)
        if qt is None:
            raise ValueError("missing JPEG quant table")
        arr = coefs[ci]
        plane = np.zeros((arr.shape[0] * 8, arr.shape[1] * 8))
        for by in range(arr.shape[0]):
            for bx in range(arr.shape[1]):
                nat = np.zeros(64, dtype=np.float64)
                nat[ZIGZAG] = arr[by, bx]
                coef = (nat * qt).reshape(8, 8)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ coef @ _C
                )
        planes.append(plane)
    return _reconstruct(planes, comps, fw, fh, prec)


def _scan_dc(
    br, scan_comps, cidx, comps, coefs, nbw, nbh, mcux, mcuy, ah, al,
    tabs, ri=0,
):
    """One progressive DC scan: interleaved in MCU order when the scan
    names several components (each contributes its hc×vc blocks per
    MCU), non-interleaved block-raster order for a single component.

    ``ri`` > 0: a restart marker every ``ri`` MCUs (interleaved) or
    data units (non-interleaved — T.81 A.2.2's degenerate MCU), each
    byte-aligning the reader and resetting the DC predictors. The
    refinement form (Ah>0) carries no predictor, but the byte
    alignment still applies."""
    pred = [0] * len(scan_comps)
    unit = 0
    rst_expect = 0

    def restart_point():
        nonlocal unit, pred, rst_expect
        if ri and unit and unit % ri == 0:
            br.align_restart(rst_expect)
            rst_expect = (rst_expect + 1) & 7
            pred = [0] * len(scan_comps)
        unit += 1

    def block(si, ci, by, bx):
        blk = coefs[ci][by, bx]
        if ah == 0:
            s = _huff_decode(br, tabs[si])
            if s > 15:
                raise ValueError(f"invalid JPEG DC category {s}")
            diff = _extend(br.bits(s), s) if s else 0
            pred[si] += diff
            blk[0] = pred[si] << al
        elif br.bit():
            blk[0] |= 1 << al

    if len(scan_comps) == 1:
        ci = cidx[scan_comps[0][0]]
        for by in range(nbh[ci]):
            for bx in range(nbw[ci]):
                restart_point()
                block(0, ci, by, bx)
        return
    for my in range(mcuy):
        for mx in range(mcux):
            restart_point()
            for si, (cs, _, _) in enumerate(scan_comps):
                ci = cidx[cs]
                _, hc, vc, _ = comps[ci]
                for byy in range(vc):
                    for bxx in range(hc):
                        block(si, ci, my * vc + byy, mx * hc + bxx)


def _scan_ac(br, arr, bw_blocks, bh_blocks, ss, se, ah, al, actab, ri=0):
    """One progressive AC scan over a single component's blocks in
    raster order — first pass (Ah=0) or refinement (Ah>0).

    ``ri`` > 0: a restart marker every ``ri`` blocks (AC scans are
    non-interleaved, so the MCU is one data unit). A restart resets
    ALL entropy state, including the end-of-band run — an EOBn run
    still open at a boundary means the encoder let it cross, which a
    conforming stream cannot do; refused loudly rather than silently
    zeroing it (the bits after the marker would decode misaligned)."""
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    unit = 0
    rst_expect = 0
    for by in range(bh_blocks):
        for bx in range(bw_blocks):
            if ri and unit and unit % ri == 0:
                if eobrun:
                    raise ValueError(
                        "JPEG end-of-band run crosses a restart "
                        "boundary"
                    )
                br.align_restart(rst_expect)
                rst_expect = (rst_expect + 1) & 7
            unit += 1
            blk = arr[by, bx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(br, actab)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:  # ZRL: sixteen zeros
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past band end")
                    blk[k] = _extend(br.bits(s), s) << al
                    k += 1
                continue
            # refinement pass
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(br, actab)
                    r, s = rs >> 4, rs & 15
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            break
                        # r == 15: position over 16 zero-history slots
                    else:
                        if s != 1:
                            raise ValueError(
                                "bad JPEG AC refinement magnitude"
                            )
                        newval = p1 if br.bit() else m1
                    while k <= se:
                        v = int(blk[k])
                        if v != 0:
                            if br.bit() and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    # inner-loop exhaustion means the symbol's run did
                    # not complete inside the band (a pending new
                    # coefficient with no slot, or a ZRL short of its
                    # 16 zeros) — stream corruption, refused as loudly
                    # as the AC-first path's run check ("a wrong
                    # answer is worse than no answer"); silently
                    # dropping the pending coefficient would misalign
                    # every following entropy bit (r10 review)
                    if k > se:
                        raise ValueError(
                            "JPEG AC refinement run past band end"
                        )
                    if newval:
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    v = int(blk[k])
                    if v != 0 and br.bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1
