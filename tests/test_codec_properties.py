"""Property-based tests (hypothesis) for the entropy-coded media codecs.

These pin the codecs' CONTRACTS over arbitrary inputs rather than
hand-picked examples: FLAC is lossless on any int16 waveform, JPEG holds
the quantizer's PSNR floor on any uint8 tile and is exact on any
8x8-block-constant tile, and MJPEG-AVI preserves frame count/dims on
any cube. Example counts are kept modest — each example runs a full
encode+decode — and deadlines disabled (encode of a large random tile is
slow by nature, not a hang).
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gfw_raster_analysis_lambda_spark.functions.avi import avi_decode, avi_encode
from gfw_raster_analysis_lambda_spark.functions.flac import flac_decode, flac_encode
from gfw_raster_analysis_lambda_spark.functions.jpeg import jpeg_decode, jpeg_encode

_SLOW = settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@_SLOW
@given(
    n=st.integers(min_value=0, max_value=9000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    kind=st.sampled_from(["noise", "sine", "steps", "clipped"]),
)
def test_flac_lossless_on_any_waveform(n, seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        w = rng.integers(-32768, 32768, size=n).astype(np.int16)
    elif kind == "sine":
        t = np.arange(n)
        w = (30000 * np.sin(t / max(rng.integers(1, 500), 1))).astype(np.int16)
    elif kind == "steps":
        w = np.repeat(
            rng.integers(-32768, 32768, size=max(n // 64, 1)), 64
        )[:n].astype(np.int16)
    else:
        w = rng.choice(
            np.array([-32768, -32767, 0, 32766, 32767], dtype=np.int16), size=n
        )
    dec, sr = flac_decode(flac_encode(w, 22050))
    assert sr == 22050
    assert np.array_equal(dec, w)


@_SLOW
@given(
    h=st.integers(min_value=1, max_value=96),
    w=st.integers(min_value=1, max_value=96),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_psnr_floor_on_any_tile(h, w, seed):
    a = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    d = jpeg_decode(jpeg_encode(a))
    assert d.shape == a.shape
    mse = float(np.mean((a.astype(np.float64) - d.astype(np.float64)) ** 2))
    assert mse == 0.0 or 10 * np.log10(255.0**2 / mse) >= 40.0


@_SLOW
@given(
    bh=st.integers(min_value=1, max_value=8),
    bw=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_exact_on_block_constant(bh, bw, seed):
    blocks = np.random.default_rng(seed).integers(
        0, 256, size=(bh, bw), dtype=np.uint8
    )
    a = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    assert np.array_equal(jpeg_decode(jpeg_encode(a)), a)


@_SLOW
@given(
    n=st.integers(min_value=0, max_value=6),
    bh=st.integers(min_value=1, max_value=4),
    bw=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_avi_roundtrip_block_constant_cubes(n, bh, bw, seed):
    rng = np.random.default_rng(seed)
    frames = (
        np.repeat(
            np.repeat(rng.integers(0, 256, size=(n, bh, bw), dtype=np.uint8), 8, 1),
            8, 2,
        )
        if n
        else np.zeros((0, bh * 8, bw * 8), dtype=np.uint8)
    )
    dec, _ = avi_decode(avi_encode(frames))
    if n:
        assert np.array_equal(dec, frames)
    else:
        assert dec.shape[0] == 0
