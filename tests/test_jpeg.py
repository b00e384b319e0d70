"""Real baseline-JPEG codec (functions/jpeg.py) unit tests.

The ``"jpg"`` format is the engine's genuinely entropy-coded image path
(DCT + quantization + Huffman, spec marker stream) — unlike the
``"jpeg"`` stand-in whose decode stays SQL-expressible for the
mm_image_stats oracle. These tests pin the three contract points:

- the input-hint PSNR >= 40 dB invariant holds on ARBITRARY content
  (the quantizer's error floor, not image luck);
- block-constant tiles round-trip EXACTLY (DC step 1, zero AC), which
  is what makes the mm_jpg_stats DuckDB oracle hash-exact;
- the decoder derives its tables from the stream's own DQT/DHT
  segments (tampering a table byte changes the decode), so encoder and
  decoder cannot silently share a wrong constant.

Reference parity: the reference decodes imagery via rasterio/GDAL
(reference raster_analysis/window.py:62-94); this engine re-expresses
decode as executor-side numpy per SURVEY.md §2 S1.
"""

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.functions import codecs
from gfw_raster_analysis_lambda_spark.functions.jpeg import jpeg_decode, jpeg_encode


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("shape,seed", [((48, 64), 7), ((17, 23), 3), ((8, 8), 1), ((1, 1), 2), ((256, 256), 11)])
def test_roundtrip_psnr_floor_on_noise(shape, seed):
    # worst-case content: uniform noise (no spatial redundancy at all)
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    d = jpeg_decode(jpeg_encode(a))
    assert d.shape == a.shape and d.dtype == np.uint8
    assert _psnr(a, d) >= 40.0


def test_block_constant_roundtrip_exact():
    rng = np.random.default_rng(5)
    a = np.repeat(np.repeat(rng.integers(0, 256, size=(6, 8), dtype=np.uint8), 8, 0), 8, 1)
    assert np.array_equal(jpeg_decode(jpeg_encode(a)), a)
    # extremes: all-0 and all-255 tiles survive the level shift + clip
    for v in (0, 255):
        c = np.full((16, 16), v, dtype=np.uint8)
        assert np.array_equal(jpeg_decode(jpeg_encode(c)), c)


def test_smooth_content_actually_compresses():
    x = np.linspace(0, 127, 64)
    smooth = (np.add.outer(x, x) / 2).astype(np.uint8)
    payload = jpeg_encode(smooth)
    assert len(payload) < smooth.size  # entropy coding is doing real work
    assert _psnr(smooth, jpeg_decode(payload)) >= 40.0


def test_marker_stream_is_spec_shaped():
    payload = jpeg_encode(np.zeros((8, 8), dtype=np.uint8))
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    markers = {payload[i + 1] for i in range(len(payload) - 1) if payload[i] == 0xFF}
    # SOI/DQT/SOF0/DHT/SOS/EOI all present
    assert {0xD8, 0xDB, 0xC0, 0xC4, 0xDA, 0xD9} <= markers


def test_decoder_reads_tables_from_stream():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload = bytearray(jpeg_encode(a))
    baseline = jpeg_decode(bytes(payload))
    # tamper the first DQT entry (zig-zag DC step 1 -> 3): a decoder that
    # assumed the encoder's constants would be blind to this
    i = payload.index(b"\xff\xdb") + 5  # marker(2) + len(2) + PqTq(1)
    assert payload[i] == 1
    payload[i] = 3
    tampered = jpeg_decode(bytes(payload))
    assert not np.array_equal(tampered, baseline)


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG not a jpeg")
    rng = np.random.default_rng(4)
    payload = jpeg_encode(rng.integers(0, 256, size=(32, 32), dtype=np.uint8))
    with pytest.raises(ValueError):
        jpeg_decode(payload[: len(payload) // 2])


def test_codecs_dispatch_jpg():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    out = codecs.decode_tile(codecs.encode_tile(a, "jpg"), 40, 24, "jpg")
    assert out.shape == (24, 40)
    assert _psnr(a, out) >= 40.0


def test_zigzag_matches_t81_spec_table():
    """Pin the computed scan against the first 16 indices of the T.81
    Figure 5 zig-zag (row-major flat indices) — guards against the
    transpose bug where encoder+decoder share a wrong constant and all
    round-trip tests still pass."""
    from gfw_raster_analysis_lambda_spark.functions.jpeg import _zigzag_order

    spec_prefix = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    zz = _zigzag_order()
    assert list(zz[:16]) == spec_prefix
    # full table is a permutation and is symmetric under the
    # transpose-then-reverse involution of the anti-diagonal walk
    assert sorted(zz.tolist()) == list(range(64))
    spec_full = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert zz.tolist() == spec_full
