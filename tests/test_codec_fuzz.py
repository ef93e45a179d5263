"""Codec total-function fuzz: every native decoder must be TOTAL on
arbitrary bytes — a corrupted stream either decodes or raises
ValueError (the documented stub-boundary contract), never an untyped
crash (IndexError, KeyError, OverflowError, struct.error, stdlib
RuntimeError) and never unbounded work. Mutations are md5-derived
byte flips and truncations of valid streams — deterministic, so any
failure reproduces exactly.

This suite found two real escapes when first written: a corrupted
DHT symbol drove a >15-bit DC magnitude read that overflowed the
int64 coefficient store (jpeg.py now refuses categories > 15), and
stdlib ``wave`` raises bare RuntimeError when a corrupted chunk size
seeks past the stream end (wav_decode now maps it to ValueError).
"""

from __future__ import annotations

import hashlib

import pytest

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.binary_ops import (
    bmp_decode,
    bmp_encode,
    pgm_decode,
    pgm_encode,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.gif import (
    gif_decode,
    gif_encode,
)
from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.multimodal.jpeg import (
    jpeg_decode,
    jpeg_encode,
    jpeg_precision,
)


def _jpeg_probe_then_decode(content: bytes):
    # decode_stub/resize_stub call jpeg_precision BEFORE jpeg_decode —
    # the pre-parse is part of the same stub boundary and must be just
    # as total (review r10: its truncation bound was the one untyped
    # escape the first version of this suite missed by fuzzing only
    # the dec callables)
    jpeg_precision(content)
    return jpeg_decode(content)

_ROWS = [
    [((x * 11) % 256, (y * 7) % 256, ((x + y) * 5) % 256)
     for x in range(16)]
    for y in range(16)
]
_GRAY = [[(x * 9 + y * 5) % 256 for x in range(16)] for y in range(16)]
_PAL = [[((x // 4) * 60 % 256, 0, 0) for x in range(16)]
        for y in range(16)]


def _cases():
    return [
        ("jpeg", jpeg_encode(_ROWS, quality=90), _jpeg_probe_then_decode),
        ("jpeg_prog",
         jpeg_encode(_ROWS, quality=90, progressive=True),
         _jpeg_probe_then_decode),
        ("jpeg_rst",
         jpeg_encode(_ROWS, quality=90, subsample=True,
                     restart_interval=1), _jpeg_probe_then_decode),
        ("jpeg12",
         jpeg_encode([[v * 16 for v in r] for r in _GRAY],
                     grayscale=True, precision=12), _jpeg_probe_then_decode),
        ("jpeg411",
         jpeg_encode(_ROWS, quality=90, subsample="411"),
         _jpeg_probe_then_decode),
        ("gif", gif_encode(_PAL), gif_decode),
        ("png", png_encode(_ROWS), png_decode),
        ("bmp", bmp_encode(_ROWS), bmp_decode),
        ("pgm", pgm_encode(_GRAY), pgm_decode),
        ("wav",
         wav_encode([((i * 37) % 65536) - 32768 for i in range(256)]),
         wav_decode),
    ]


@pytest.mark.parametrize(
    "name,base,dec",
    _cases(),
    ids=[c[0] for c in _cases()],
)
def test_byte_flip_total(name, base, dec):
    for trial in range(1000):
        h = int(hashlib.md5(f"{name}_{trial}".encode()).hexdigest(), 16)
        pos = h % len(base)
        val = (h >> 32) % 256
        mutated = base[:pos] + bytes([val]) + base[pos + 1:]
        try:
            dec(mutated)
        except ValueError:
            pass
        # anything else propagates and fails the test with the trial
        # number in the traceback (deterministic reproduction)


@pytest.mark.parametrize(
    "name,base,dec",
    _cases(),
    ids=[c[0] for c in _cases()],
)
def test_truncation_total(name, base, dec):
    for trial in range(200):
        h = int(hashlib.md5(f"tr_{name}_{trial}".encode()).hexdigest(), 16)
        cut = h % len(base)
        try:
            dec(base[:cut])
        except ValueError:
            pass


@pytest.mark.parametrize(
    "name,base,dec",
    _cases(),
    ids=[c[0] for c in _cases()],
)
def test_insert_delete_total(name, base, dec):
    # insertion and deletion SHIFT the framing after the mutation
    # point — every length field downstream now lies — exercising
    # different parse paths than same-length substitution
    for trial in range(300):
        h = int(hashlib.md5(f"id_{name}_{trial}".encode()).hexdigest(), 16)
        pos = h % len(base)
        if trial % 2 == 0:
            mutated = base[:pos] + bytes([(h >> 32) % 256]) + base[pos:]
        else:
            mutated = base[:pos] + base[pos + 1:]
        try:
            dec(mutated)
        except ValueError:
            pass
