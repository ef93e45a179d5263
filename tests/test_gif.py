"""GIF87a codec (multimodal/gif.py): lossless round trips, LZW dict
growth/reset, profile refusals, decode bounds, the Spark kernel path."""

from __future__ import annotations

import random
import struct

import pytest

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.gif import (
    gif_decode,
    gif_encode,
)


def _pal(n, seed=3):
    rng = random.Random(seed)
    out = []
    while len(out) < n:
        c = (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        if c not in out:
            out.append(c)
    return out


def test_random_rasters_roundtrip_pixel_exactly():
    rng = random.Random(5)
    for ncol in (2, 17, 256):
        pal = _pal(ncol, seed=ncol)
        rows = [
            [pal[rng.randrange(ncol)] for _ in range(23)] for _ in range(11)
        ]
        w, h, back = gif_decode(gif_encode(rows))
        assert (w, h) == (23, 11) and back == rows


def test_lzw_dictionary_growth_and_reset_roundtrip():
    # 32768 pixels over 256 colors forces the code width through every
    # boundary up to 12 bits and at least one mid-stream dict reset
    pal = list(
        dict.fromkeys(((i * 7) % 256, (i * 13) % 256, (i * 29) % 256)
                      for i in range(256))
    )
    big = [
        [pal[(x * x + 3 * y + x * y) % len(pal)] for x in range(256)]
        for y in range(128)
    ]
    w, h, back = gif_decode(gif_encode(big))
    assert (w, h) == (256, 128) and back == big


def test_too_many_colors_refused():
    rows = [[(x, y, (x + y) % 256) for x in range(32)] for y in range(32)]
    with pytest.raises(ValueError, match="256"):
        gif_encode(rows)


def test_refusals_and_bounds():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"nope")
    data = bytearray(gif_encode([[(1, 2, 3)] * 4] * 4))
    i = data.index(0x2C, 13)
    # dimension bomb: claim a raster past MAX_PIXELS
    bombed = bytearray(data)
    struct.pack_into("<HH", bombed, i + 5, 65000, 65000)
    with pytest.raises(ValueError, match="decode bound"):
        gif_decode(bytes(bombed))
    # truncated image data
    with pytest.raises(ValueError, match="truncated"):
        gif_decode(bytes(data[: len(data) // 2]))
    # trailer with no frame
    with pytest.raises(ValueError, match="no image frame"):
        gif_decode(bytes(data[:13]) + bytes(data[13 : i]) + b"\x3B")


def test_gif89a_extension_blocks_are_skipped():
    # splice a graphic-control extension (0x21 0xF9 ...) before the
    # image descriptor and flip the version to 89a — decode unchanged
    rows = [[(9, 8, 7), (1, 2, 3)], [(1, 2, 3), (9, 8, 7)]]
    data = bytearray(gif_encode(rows))
    data[3:6] = b"89a"
    i = data.index(0x2C, 13)
    ext = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0x00])
    patched = bytes(data[:i]) + ext + bytes(data[i:])
    w, h, back = gif_decode(patched)
    assert (w, h) == (2, 2) and back == rows


def test_lzw_pixel_overflow_is_refused():
    # shrink the declared dimensions below the encoded raster: the LZW
    # stream now emits more pixels than declared — the bomb refusal
    data = bytearray(gif_encode([[(1, 2, 3)] * 8] * 8))
    i = data.index(0x2C, 13)
    struct.pack_into("<HH", data, i + 5, 2, 2)
    with pytest.raises(ValueError, match="bomb|more pixels"):
        gif_decode(bytes(data))


def test_decode_stub_dispatch_and_resize():
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.binary_ops import (
        decode_stub,
        resize_stub,
    )

    pal = _pal(4)
    rows = [[pal[(x // 4) % 4] for x in range(16)] for _ in range(8)]
    data = gif_encode(rows)
    feats = decode_stub(data, "image")
    assert feats[0] == 16.0 and feats[1] == 8.0
    small = resize_stub(data, 8, 4)
    w, h, back = gif_decode(small)
    assert (w, h) == (8, 4)
    # nearest-neighbor: every output pixel is some source pixel
    src = {px for row in rows for px in row}
    assert all(px in src for row in back for px in row)


def test_gif_through_spark_kernels(spark):
    from pyspark.sql import functions as F

    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.binary_ops import (
        extract_features,
    )

    pal = _pal(3)
    rows = [[pal[(x + y) % 3] for x in range(8)] for y in range(8)]
    media = spark.createDataFrame(
        [(1, "image", bytearray(gif_encode(rows)))],
        "media_id long, modality string, content binary",
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("long").alias("n_bytes"),
            F.lit(None).cast("double").alias("duration_s"),
        ),
    )
    feats = extract_features(media, fake=False).collect()[0].features
    assert feats[0] == 8.0 and feats[1] == 8.0
    want_mean_r = sum(px[0] for row in rows for px in row) / 64
    assert abs(feats[3] - want_mean_r) < 1e-9


def _interlace_gif(rows):
    """Hand-build an interlaced single-frame GIF87a: rows are stored
    in the spec's four-pass order and the descriptor carries the
    interlace flag — built from the encoder's own parts so only the
    row ORDER and flag differ from gif_encode's sequential output."""
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.gif import (
        _interlace_rows,
        _lzw_encode,
    )

    h, w = len(rows), len(rows[0])
    palette = {}
    for row in rows:
        for px in row:
            palette.setdefault(tuple(px), len(palette))
    bits = max((len(palette) - 1).bit_length(), 1)
    mcs = max(bits, 2)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    colors = list(palette)
    for i in range(1 << bits):
        r, g, b = colors[i] if i < len(colors) else (0, 0, 0)
        out += bytes((r, g, b))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlaced
    out.append(mcs)
    stored = [rows[y] for y in _interlace_rows(h)]  # pass order
    data = _lzw_encode(
        [palette[tuple(p)] for row in stored for p in row], mcs
    )
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    return bytes(out)


def test_interlaced_decode_pixel_exact():
    # 13 rows (not a multiple of 8: all four passes have ragged ends);
    # every row a distinct color so a row-order slip cannot cancel
    rows = [[(y, 2 * y, 255 - y)] * 5 for y in range(13)]
    w, h, back = gif_decode(_interlace_gif(rows))
    assert (w, h) == (5, 13)
    assert back == rows


def test_interlace_row_order_is_a_permutation():
    from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.gif import (
        _interlace_rows,
    )

    for h in range(1, 40):
        order = _interlace_rows(h)
        assert sorted(order) == list(range(h)), h
    # the spec's canonical 16-row example: pass starts 0,8 / 4,12 /
    # 2,6,.. / odds
    assert _interlace_rows(16) == [
        0, 8, 4, 12, 2, 6, 10, 14, 1, 3, 5, 7, 9, 11, 13, 15
    ]
