"""GIF87a codec, pure stdlib — the palettized-image slice of the
multimodal boundary (joins BMP/PNG/PGM/WAV/JPEG on the real byte
path).

Implements the public GIF specification (CompuServe GIF87a; GIF89a
streams decode too, their extension blocks are skipped): logical
screen descriptor, global/local color tables, and the GIF variant of
LZW (variable code width starting at min_code_size+1, LSB-first bit
packing, CLEAR/EOI codes, dictionary capped at 4096 with mid-stream
resets). GIF is LOSSLESS over its palette, so decode is pixel-exact —
the audit discipline of the PNG leg applies verbatim.

Interlaced frames decode too (r10): GIF interlace stores rows in the
spec's four passes (every 8th row from 0, every 8th from 4, every 4th
from 2, every 2nd from 1) — a pure row-order permutation applied
after the LZW stage, pixel-exact like the sequential path.

Refusals (the narrow-profile-or-raise convention): images with no
color table, palettes over 256 on encode. Animated streams decode
their FIRST frame (the standard feature-extraction treatment) —
deterministic, not a guess. Decoder allocation is
bounded by the declared image descriptor dimensions: the LZW stream
cannot emit more than w·h pixels (decompression-bomb refusal, the PNG
inflate-cap discipline) and dimensions above ``MAX_PIXELS`` are
refused before any LZW work.

Reference parity note: the reference pipeline has no media path; this
module exists for the large-scale training-data mandate.
"""

from __future__ import annotations

import struct

MAX_PIXELS = 1 << 24  # same decode bound as the JPEG codec


# -------------------------------------------------------------- encoder


class _LSBBitWriter:
    """LSB-first bit packer (GIF's LZW bit order — opposite of JPEG)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def put(self, code: int, width: int) -> None:
        self._acc |= (code & ((1 << width) - 1)) << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> None:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows the code width when
    the next code to assign would not fit, resets at 4096. The width
    timing mirrors ``_lzw_decode`` exactly (the decoder assigns its
    copy of each dictionary entry one code later, so it grows width
    after assigning entry 2^w − 1 — round-trip tests arbitrate)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _LSBBitWriter()

    def reset():
        return {(i,): i for i in range(1 << mcs)}, eoi + 1, mcs + 1

    table, nxt, width = reset()
    bw.put(clear, width)
    cur: tuple[int, ...] = ()
    for s in indices:
        cand = cur + (s,)
        if cand in table:
            cur = cand
            continue
        bw.put(table[cur], width)
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            # every emitted code is < nxt; widen when the next code to
            # READ could be nxt−1 = 2^width (the decoder lags one
            # entry, so ITS rule is nxt == 2^width — see _lzw_decode)
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
        else:  # dictionary full: reset mid-stream
            bw.put(clear, width)
            table, nxt, width = reset()
        cur = (s,)
    if cur:
        bw.put(table[cur], width)
    bw.put(eoi, width)
    bw.flush()
    return bytes(bw.out)


def gif_encode(rows: list) -> bytes:
    """RGB rows (top-down, pixel = (r, g, b)) → single-frame GIF87a
    bytes with a global color table built from the distinct colors —
    refused loudly past 256 (GIF's palette bound; quantization is a
    separate concern this codec does not silently apply)."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    if h == 0 or w == 0:
        raise ValueError("gif_encode needs a non-empty raster")
    palette: dict[tuple[int, int, int], int] = {}
    for row in rows:
        for px in row:
            key = (int(px[0]), int(px[1]), int(px[2]))
            if key not in palette:
                if len(palette) == 256:
                    raise ValueError(
                        "gif_encode: more than 256 distinct colors — "
                        "quantize first (GIF palettes are 256-bounded)"
                    )
                palette[key] = len(palette)
    # color table size: power of two >= palette, min 2 entries
    bits = max((len(palette) - 1).bit_length(), 1)
    table_n = 1 << bits
    mcs = max(bits, 2)
    out = bytearray(b"GIF87a")
    # logical screen descriptor: global table present, 2^bits entries
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    colors = list(palette)
    for i in range(table_n):
        r, g, b = colors[i] if i < len(colors) else (0, 0, 0)
        out += bytes((r, g, b))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    out.append(mcs)
    data = _lzw_encode(
        [palette[(int(p[0]), int(p[1]), int(p[2]))] for row in rows for p in row],
        mcs,
    )
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


def _interlace_rows(h: int) -> list[int]:
    """Display-row order of an interlaced frame's stored rows — the
    GIF87a spec's four passes (appendix E): rows ≡ 0 (mod 8), then
    ≡ 4 (mod 8), then ≡ 2 (mod 4), then odd rows. A permutation of
    range(h) for every h (each row matches exactly one pass)."""
    return [
        y
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
        for y in range(start, h, step)
    ]


# -------------------------------------------------------------- decoder


def _lzw_decode(data: bytes, mcs: int, max_pixels: int) -> list[int]:
    if not 2 <= mcs <= 8:
        raise ValueError(f"bad GIF LZW min code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    def reset():
        return {i: (i,) for i in range(clear)}, eoi + 1, mcs + 1

    table, nxt, width = reset()
    out: list[int] = []
    prev: int | None = None
    while True:
        code = read(width)
        if code == clear:
            table, nxt, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("invalid first GIF LZW code")
        elif code in table:
            entry = table[code]
        elif code == nxt:
            entry = table[prev] + (table[prev][0],)
        else:
            raise ValueError("invalid GIF LZW code")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError(
                "GIF LZW stream emits more pixels than the image "
                "descriptor declares — refusing the bomb"
            )
        if prev is not None and nxt < 4096:
            table[nxt] = table[prev] + (entry[0],)
            nxt += 1
            # one entry BEHIND the encoder, so the width boundary
            # arrives one code earlier: widen at nxt == 2^width
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = code
    return out


def gif_decode(content: bytes) -> tuple[int, int, list]:
    """GIF bytes → (width, height, RGB rows top-down) — the FIRST
    image frame; extension blocks skipped; interlaced frames decode
    via the four-pass row permutation; missing color tables refused
    loudly."""
    b = bytes(content)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    _, _, flags, _, _ = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 1 << ((flags & 7) + 1)
        if pos + 3 * n > len(b):
            raise ValueError("truncated GIF global color table")
        global_table = [
            (b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF stream contains no image frame")
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(b):
                raise ValueError("truncated GIF extension")
            pos += 1
            while True:
                if pos >= len(b):
                    raise ValueError("truncated GIF extension")
                ln = b[pos]
                pos += 1
                if ln == 0:
                    break
                pos += ln
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 9 > len(b):
            raise ValueError("truncated GIF image descriptor")
        _, _, w, h, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if w * h > MAX_PIXELS:
            raise ValueError(
                f"GIF dimensions {w}x{h} exceed the {MAX_PIXELS}-pixel "
                "decode bound"
            )
        interlaced = bool(iflags & 0x40)
        table = global_table
        if iflags & 0x80:
            n = 1 << ((iflags & 7) + 1)
            if pos + 3 * n > len(b):
                raise ValueError("truncated GIF local color table")
            table = [
                (b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(b):
            raise ValueError("truncated GIF image data")
        mcs = b[pos]
        pos += 1
        chunks = bytearray()
        while True:
            if pos >= len(b):
                raise ValueError("truncated GIF image data")
            ln = b[pos]
            pos += 1
            if ln == 0:
                break
            chunks += b[pos : pos + ln]
            pos += ln
        idx = _lzw_decode(bytes(chunks), mcs, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF LZW stream ended before the raster")
        # interlace: the stream's j-th stored row is display row
        # _interlace_rows(h)[j]; sequential frames are the identity
        order = _interlace_rows(h) if interlaced else range(h)
        n_table = len(table)
        rows: list = [None] * h
        for j, y in enumerate(order):
            row = []
            for x in range(w):
                i = idx[j * w + x]
                if i >= n_table:
                    raise ValueError("GIF pixel index outside color table")
                row.append(table[i])
            rows[y] = row
        return w, h, rows
    raise ValueError("GIF stream contains no image frame")
