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


@_SLOW
@given(
    n=st.integers(min_value=1, max_value=8000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    prec=st.sampled_from([6, 8, 10]),
)
def test_mda_roundtrip_properties(n, seed, prec):
    """MDA1 contracts on arbitrary int16 audio: decode returns exactly n
    samples and the original sample rate; quantization error stays inside
    the per-band bound (each coefficient is off by at most half a step)."""
    from gfw_raster_analysis_lambda_spark.functions.mda import (
        mda_decode,
        mda_encode,
        mdct_analyze,
    )

    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=n).astype(np.int16)
    dec, sr = mda_decode(mda_encode(pcm, 22050, prec=prec))
    assert sr == 22050 and len(dec) == n
    # Parseval energy bound: the circular TDAC analysis is ORTHOGONAL, so
    # waveform error energy == coefficient error energy, and each
    # coefficient's quantization error is at most half its band step.
    # The int16 output rounding adds <= 0.5/sample; (a+b)^2 <= 2a^2+2b^2.
    pad = max((-n) % 64, 2 * 64 - n)
    x = np.concatenate([pcm.astype(np.float64), np.zeros(pad)]) / 32768.0
    cb = np.abs(mdct_analyze(x, 64)).reshape(-1, 8, 8).max(axis=2) * 32768.0
    lim = 2 ** (prec - 1) - 1
    exps = np.clip(np.ceil(np.log2(np.maximum(cb / lim, 1e-300))), 0, 120)
    quant_energy = float((8 * (np.exp2(exps) / 2.0) ** 2).sum())
    err_energy = float(
        ((dec.astype(np.float64) - pcm.astype(np.float64)) ** 2).sum()
    )
    assert err_energy <= 2.0 * (quant_energy + (n + pad) * 0.25) + 1e-6


@_SLOW
@given(
    nf=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=8, max_value=40),
    w=st.integers(min_value=8, max_value=40),
    gop=st.integers(min_value=1, max_value=4),
    rshift=st.sampled_from([0, 2]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_mdv_roundtrip_properties(nf, h, w, gop, rshift, seed):
    """MDV1 contracts on arbitrary uint8 cubes: shape and fps survive,
    the GOP pattern holds, P-frames are bit-exact at rshift=0, and at
    any rshift every P-frame pixel is within half a residual step."""
    from gfw_raster_analysis_lambda_spark.functions.mdv import (
        mdv_encode,
        mdv_parse,
    )

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w)).astype(np.uint8)
    dec, fps, types, _ = mdv_parse(
        mdv_encode(frames, fps=30, gop=gop, rshift=rshift)
    )
    assert fps == 30 and dec.shape == frames.shape
    assert types == ["I" if f % gop == 0 else "P" for f in range(nf)]
    half = 1 << rshift  # |orig - recon| <= 2^rshift / 2 rounded up
    for f in range(nf):
        if types[f] == "P":
            d = np.abs(dec[f].astype(np.int32) - frames[f].astype(np.int32))
            if rshift == 0:
                assert d.max(initial=0) == 0
            else:
                assert d.max(initial=0) <= half // 2
