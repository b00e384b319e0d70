"""MJPEG-in-AVI codec (functions/avi.py) unit tests.

Every AVI frame is a genuine Huffman-coded baseline JPEG inside a RIFF
chunk tree — the engine's entropy-coded video path. Contract points:
block-constant frames round-trip exactly (the oracle-gate property),
arbitrary frames hold the JPEG >= 40 dB floor, the decoder walks the
container from the stream (dims/fps/compression from strh/strf, frames
from movi '00dc'), and non-MJPG compression is rejected, not
mis-decoded.
"""

import struct

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.functions.avi import avi_decode, avi_encode


def _block_frames(n, bh=4, bw=4, seed=0):
    bi = np.arange(bh, dtype=np.int64)[:, None]
    bj = np.arange(bw, dtype=np.int64)[None, :]
    return np.stack(
        [
            np.repeat(np.repeat(((bi + 2 * bj + 7 * f + 11 * seed) % 256).astype(np.uint8), 8, 0), 8, 1)
            for f in range(n)
        ]
    )


def test_block_constant_roundtrip_exact():
    frames = _block_frames(6)
    dec, fps = avi_decode(avi_encode(frames, fps=10))
    assert fps == 10
    assert np.array_equal(dec, frames)


def test_noise_frames_hold_psnr_floor():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(3, 24, 40), dtype=np.uint8)
    dec, _ = avi_decode(avi_encode(frames))
    mse = np.mean((frames.astype(float) - dec.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / mse) >= 40.0


def test_empty_video():
    dec, _ = avi_decode(avi_encode(np.zeros((0, 8, 8), dtype=np.uint8)))
    assert dec.shape[0] == 0


def test_container_is_spec_shaped():
    payload = avi_encode(_block_frames(2))
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    (riff_sz,) = struct.unpack_from("<I", payload, 4)
    assert 8 + riff_sz == len(payload)  # RIFF size covers the whole body
    for fourcc in (b"hdrl", b"strl", b"movi", b"avih", b"strh", b"strf", b"00dc", b"idx1", b"MJPG"):
        assert fourcc in payload


def test_decoder_reads_compression_from_stream():
    payload = bytearray(avi_encode(_block_frames(2)))
    i = payload.index(b"MJPG")  # strh fccHandler
    payload[i : i + 4] = b"H264"
    with pytest.raises(ValueError, match="ffmpeg"):
        avi_decode(bytes(payload))


def test_rejects_non_avi_and_truncation():
    with pytest.raises(ValueError):
        avi_decode(b"fLaC not a video")
    payload = avi_encode(_block_frames(4))
    with pytest.raises(ValueError):
        avi_decode(payload[: len(payload) // 2])


def test_video_frame_path_decodes_avi():
    from gfw_raster_analysis_lambda_spark.operators.multimodal import (
        _decode_video,
        synthesize_mjpeg_avi,
    )

    cube = _decode_video(synthesize_mjpeg_avi(32, 24, 3, seed=5), fake=False)
    assert cube.shape == (3, 24, 32)
    bi = np.arange(3, dtype=np.int64)[:, None]
    bj = np.arange(4, dtype=np.int64)[None, :]
    want = np.stack(
        [
            np.repeat(np.repeat(((bi + 2 * bj + 7 * f + 55) % 256).astype(np.uint8), 8, 0), 8, 1)
            for f in range(3)
        ]
    )
    assert np.array_equal(cube, want)
