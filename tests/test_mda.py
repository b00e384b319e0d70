"""Real perceptual (MDCT transform) audio codec (functions/mda.py) tests.

The ``MDA1`` payload path is the engine's genuinely LOSSY transform
audio format — 50%-overlap circular-TDAC MDCT, per-band scalefactor
quantization, canonical Huffman with the code-length table carried IN
the stream, CRC-16 on header / table / every frame. Contract points:

- MDCT analysis/synthesis are exact inverses BOTH ways (the circular
  analysis operator is orthogonal) — so all loss is the quantizer's;
- quantization noise is bounded: >= 40 dB PSNR on dense sines at the
  default precision (the north rule's lossy floor), and streams
  COMPRESS (< 0.75x raw) rather than expand;
- the integer-coefficient bridge: PCM synthesized from coefficients
  4k re-quantizes to exactly k in every band at exponent 2, which is
  what makes the mm_mda_coeffs DuckDB oracle hash-exact;
- the decoder trusts only the stream: a tampered header, Huffman
  table, or frame trips the matching CRC; an impossible code raises.
"""

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.functions.mda import (
    mda_decode,
    mda_decode_quantized,
    mda_encode,
    mdct_analyze,
    mdct_synthesize,
    synthesize_mda_pcm16,
)


def _sine(n, freq=440.0, amp=0.5, sr=16000):
    t = np.arange(n, dtype=np.float64)
    return np.floor(32767.0 * amp * np.sin(2 * np.pi * freq * t / sr) + 0.5).astype(np.int16)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10.0 * np.log10(32768.0 ** 2 / max(float((err ** 2).mean()), 1e-12))


def test_mdct_is_orthogonal_both_ways():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(640)
    c = mdct_analyze(x, 64)
    assert np.abs(mdct_synthesize(c, 640) - x).max() < 1e-12  # synth∘analyze
    c0 = rng.standard_normal((10, 64))
    assert np.abs(mdct_analyze(mdct_synthesize(c0, 640), 64) - c0).max() < 1e-12


@pytest.mark.parametrize("n", [64, 128, 4096])
def test_mdct_length_validation(n):
    with pytest.raises(ValueError):
        mdct_analyze(np.zeros(n + 1), n)
    with pytest.raises(ValueError):
        mdct_analyze(np.zeros(n), n)  # shorter than two frames


@pytest.mark.parametrize(
    "wave",
    [
        _sine(16000),
        _sine(16000, freq=1333.0, amp=0.9),
        np.zeros(5000, dtype=np.int16),
        np.random.default_rng(7).integers(-2000, 2000, size=13000).astype(np.int16),
    ],
    ids=["sine", "loud", "silence", "noise"],
)
def test_psnr_floor_and_length(wave):
    dec, sr = mda_decode(mda_encode(wave, 16000))
    assert sr == 16000
    assert len(dec) == len(wave)
    assert _psnr(dec, wave) >= 40.0  # north-rule lossy floor


@pytest.mark.parametrize("n_samples", [1, 63, 64, 100, 129, 4097])
def test_arbitrary_lengths_roundtrip(n_samples):
    w = (np.arange(n_samples) % 251 - 125).astype(np.int16)
    dec, _ = mda_decode(mda_encode(w, 44100))
    assert len(dec) == n_samples


def test_sine_actually_compresses():
    w = _sine(40000)
    payload = mda_encode(w, 16000)
    assert len(payload) < 0.75 * w.nbytes  # transform coding does real work


def test_integer_coefficient_bridge_is_exact():
    # PCM built from coefficients 4k: every band max is 4*120=480, so the
    # encoder picks exponent 2 everywhere and re-quantizes to exactly k —
    # the property the mm_mda_coeffs DuckDB oracle gate rides.
    def kfun(f, i):
        return np.where(i % 8 == 0, 120, (7 * f + 3 * i + 11) % 128 - 64)

    pcm, c4 = synthesize_mda_pcm16(lambda f, i: 4 * kfun(f, i), 24)
    q, e, sr, ns = mda_decode_quantized(mda_encode(pcm, 8000))
    ff, ii = np.meshgrid(np.arange(24), np.arange(64), indexing="ij")
    assert np.all(e == 2)
    assert np.array_equal(q, kfun(ff, ii))
    # and the float decode is bit-exact for this corpus
    dec, _ = mda_decode(mda_encode(pcm, 8000))
    assert np.array_equal(dec, pcm)


def test_bridge_perturbation_margin_is_wide():
    # the re-analysis perturbation of int16 rounding must sit far inside
    # the exponent-2 quantizer's ±2 acceptance window
    def kfun(f, i):
        return np.where(i % 8 == 0, 120, (7 * f + 3 * i + 3) % 128 - 64)

    pcm, c4 = synthesize_mda_pcm16(lambda f, i: 4 * kfun(f, i), 32)
    delta = np.abs(mdct_analyze(pcm / 32768.0, 64) * 32768.0 - c4).max()
    assert delta < 1.5  # observed ~0.99; margin to the 2.0 breaking point


def test_escape_path_roundtrips():
    # a tiny explicit alphabet forces the 32-bit raw escape for large
    # symbols; decode must still reconstruct the same quantized values
    w = _sine(2000, amp=0.9)
    payload = mda_encode(w, 16000, alphabet=8)
    q8, e8, _, _ = mda_decode_quantized(payload)
    qd, ed, _, _ = mda_decode_quantized(mda_encode(w, 16000))
    assert np.array_equal(e8, ed)
    assert np.array_equal(q8, qd)  # escapes carry exact values


def test_huffman_table_travels_in_stream():
    # streams with different content have different code-length tables
    # (the decoder derives codes from the stream, not a shared constant)
    p1 = mda_encode(_sine(4000), 16000)
    p2 = mda_encode(np.random.default_rng(1).integers(
        -30000, 30000, size=4000).astype(np.int16), 16000)
    hdr = 4 + 17 + 2  # magic + packed header fields + crc16
    t1 = p1[hdr : hdr + 2 + 256]
    t2 = p2[hdr : hdr + 2 + 256]
    assert t1 != t2


@pytest.mark.parametrize("kind", ["header", "table", "frame"])
def test_decoder_verifies_stream_integrity(kind):
    payload = bytearray(mda_encode(_sine(5000), 16000))
    hdr = 4 + 17  # magic + packed header fields
    if kind == "header":
        payload[6] ^= 0x01  # sample-rate byte
    elif kind == "table":
        payload[hdr + 2 + 2 + 5] ^= 0x01  # a code-length byte
    else:
        payload[-3] ^= 0x01  # entropy bits near the last frame end
    with pytest.raises(ValueError):
        mda_decode(bytes(payload))


def test_rejects_non_mda_and_bad_args():
    with pytest.raises(ValueError):
        mda_decode(b"RIFF this is not mda")
    with pytest.raises(ValueError):
        mda_encode(np.zeros(16, dtype=np.float32), 8000)
    with pytest.raises(ValueError):
        mda_encode(np.zeros(16, dtype=np.int16), 8000, n=64, bands=7)
    with pytest.raises(ValueError):
        synthesize_mda_pcm16(lambda f, i: f * 0, 1)


def test_audio_features_path_decodes_mda():
    from gfw_raster_analysis_lambda_spark.operators.multimodal import (
        _decode_audio,
        synthesize_mda_payload,
    )

    payload = synthesize_mda_payload(12, seed=4, sample_rate=12000)
    a, sr, nch = _decode_audio(payload, fake=False)
    assert sr == 12000 and nch == 1
    assert len(a) == 12 * 64
    # bit-exact vs the direct decode (shared path)
    dec, _ = mda_decode(payload)
    assert np.array_equal(a, dec.astype(np.float32) / 32768.0)
