"""Real FLAC-subset codec (functions/flac.py) unit tests.

The ``fLaC`` payload path is the engine's genuinely entropy-coded audio
format (fixed predictors + Rice residuals + spec marker/CRC stream).
Contract points:

- LOSSLESS round-trip on arbitrary int16 content (sine, noise,
  constants, extremes, multi-frame) — this is what lets the
  mm_flac_features DuckDB oracle be hash-exact;
- the decoder trusts only the stream: CRC-8 (frame header), CRC-16
  (frame), and the STREAMINFO MD5 each catch single-byte tampering;
- subset bounds reject (stereo / LPC) with errors, never wrong samples.
"""

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.functions.flac import flac_decode, flac_encode


def _sine(n, freq=440.0, amp=0.5, sr=16000):
    t = np.arange(n, dtype=np.float64)
    return np.floor(32767.0 * amp * np.sin(2 * np.pi * freq * t / sr) + 0.5).astype(np.int16)


@pytest.mark.parametrize(
    "wave",
    [
        _sine(20000),
        np.random.default_rng(7).integers(-32768, 32768, size=13000).astype(np.int16),
        np.full(5000, -123, dtype=np.int16),
        np.zeros(0, dtype=np.int16),
        np.array([5, -3, 7], dtype=np.int16),
        np.array([32767, -32768] * 100, dtype=np.int16),
    ],
    ids=["sine", "noise", "constant", "empty", "tiny", "extremes"],
)
def test_lossless_roundtrip(wave):
    dec, sr = flac_decode(flac_encode(wave, 16000))
    assert sr == 16000
    assert np.array_equal(dec, wave)


def test_multiframe_and_utf8_frame_numbers():
    # >128 frames forces multi-byte UTF-8-coded frame numbers
    rng = np.random.default_rng(3)
    w = rng.integers(-2000, 2000, size=4096 * 130 + 17).astype(np.int16)
    dec, _ = flac_decode(flac_encode(w, 8000))
    assert np.array_equal(dec, w)


def test_sine_actually_compresses():
    w = _sine(40000)
    payload = flac_encode(w, 16000)
    assert len(payload) < w.nbytes / 2  # fixed predictors do real work


def test_stream_is_spec_shaped():
    payload = flac_encode(_sine(5000), 16000)
    assert payload[:4] == b"fLaC"
    assert payload[4] & 0x7F == 0  # STREAMINFO first
    # frame sync code 0b11111111111110 right after the 38-byte STREAMINFO
    off = 4 + 4 + 34
    assert payload[off] == 0xFF and payload[off + 1] & 0xFC == 0xF8


@pytest.mark.parametrize("kind", ["header_crc8", "frame_crc16", "md5"])
def test_decoder_verifies_stream_integrity(kind):
    payload = bytearray(flac_encode(_sine(5000), 16000))
    frame0 = 4 + 4 + 34
    if kind == "header_crc8":
        payload[frame0 + 2] ^= 0x10  # flip a frame-header bit
    elif kind == "frame_crc16":
        payload[-3] ^= 0x01  # flip an entropy-coded bit near frame end
    else:
        # consistent frame CRCs but wrong STREAMINFO MD5
        payload[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError):
        flac_decode(bytes(payload))


def test_rejects_non_flac_and_subset_bounds():
    with pytest.raises(ValueError):
        flac_decode(b"RIFF this is not flac")
    with pytest.raises(ValueError):
        flac_encode(np.zeros((4, 4), dtype=np.int16))
    with pytest.raises(ValueError):
        flac_encode(np.zeros(16, dtype=np.float32))


def test_audio_features_path_decodes_flac():
    from gfw_raster_analysis_lambda_spark.operators.multimodal import (
        _decode_audio,
        synthesize_flac_pcm16,
        synthesize_wav_pcm16,
    )

    fl = synthesize_flac_pcm16(440.0, 0.5, 16000, 8000)
    wv = synthesize_wav_pcm16(440.0, 0.5, 16000, 8000)
    a, sra, _ = _decode_audio(fl, fake=False)
    b, srb, _ = _decode_audio(wv, fake=False)
    assert sra == srb == 16000
    assert np.array_equal(a, b)  # lossless: FLAC == WAV samples exactly
