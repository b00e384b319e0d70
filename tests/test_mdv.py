"""Real inter-frame hybrid video codec (functions/mdv.py) tests.

The ``MDV1`` payload path is the engine's genuinely TEMPORAL video
format — JPEG I-frames + closed-loop motion-compensated P-frames with
canonical-Huffman residuals, per-frame CRC-16. Contract points:

- P-frames are LOSSLESS against the reconstructed reference (default
  rshift=0), so every P-frame reconstructs bit-exactly to its source
  regardless of I-frame loss — the property the mm_mdv_frames DuckDB
  oracle rides (with an 8x8-block-constant first frame the I-frame is
  exact too, making the whole video bit-exact);
- the motion search finds true translations (closed-loop MC does real
  work, P-frames of translating content are far smaller than I-frames);
- GOP structure: every gop-th frame is an intra refresh;
- lossy P-frames (rshift>0) stay above the 40 dB north-rule floor;
- the decoder trusts only the stream: header/I/P CRCs each catch
  single-byte tampering; truncation and bad magic raise.
"""

import numpy as np
import pytest

from gfw_raster_analysis_lambda_spark.functions.mdv import (
    mdv_decode,
    mdv_encode,
    mdv_parse,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10.0 * np.log10(255.0 ** 2 / max(float((err ** 2).mean()), 1e-12))


def _translating(nf=8, h=32, w=48, seed=3):
    # frame t = the block pattern slid by (+2, +2) px per frame
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    return np.stack([
        ((((i + 2 * t) // 8) + 2 * ((j + 2 * t) // 8) + 11 * seed) % 256
         ).astype(np.uint8)
        for t in range(nf)
    ])


def test_p_frames_are_lossless_even_after_lossy_i():
    rng = np.random.default_rng(0)
    fr = rng.integers(0, 256, size=(6, 24, 40)).astype(np.uint8)
    dec, fps = mdv_decode(mdv_encode(fr, gop=8))
    assert fps == 25
    # frame 0 is a real lossy JPEG; every P-frame is bit-exact
    assert _psnr(dec[0], fr[0]) > 30.0
    assert np.array_equal(dec[1:], fr[1:])


def test_block_constant_gop_is_bit_exact_end_to_end():
    v = _translating()
    dec, _ = mdv_decode(mdv_encode(v, gop=8, search=3))
    assert np.array_equal(dec, v)


def test_motion_search_finds_true_translation():
    # textured content translated by exactly (+2, +2)/frame: every block
    # whose (dy=2, dx=2) reference window exists must pick it (unique SAD=0)
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, size=(32 + 2 * 4, 48 + 2 * 4)).astype(np.uint8)
    fr = np.stack([base[2 * t : 2 * t + 32, 2 * t : 2 * t + 48] for t in range(4)])
    _, _, types, motions = mdv_parse(mdv_encode(fr, gop=8, search=3))
    assert types == ["I", "P", "P", "P"]
    for mv in motions:
        # blocks whose (+2, +2) reference window fits inside the frame:
        # y + 2 + 16 <= 32 -> first block row; x + 2 + 16 <= 48 -> first
        # two block cols (the last row/col can't reach the shifted window)
        inner = mv.reshape(2, 3, 2)[:1, :2]
        assert np.all(inner == 2)


def test_p_frames_compress_translating_content():
    v = _translating(nf=10)
    enc = mdv_encode(v, gop=255)
    _, _, types, _ = mdv_parse(enc)
    assert types == ["I"] + ["P"] * 9
    assert len(enc) < 0.25 * v.nbytes  # MC + residual coding do real work


def test_gop_intra_refresh():
    rng = np.random.default_rng(2)
    fr = rng.integers(0, 256, size=(9, 16, 16)).astype(np.uint8)
    _, _, types, _ = mdv_parse(mdv_encode(fr, gop=4))
    assert types == ["I", "P", "P", "P", "I", "P", "P", "P", "I"]


def test_lossy_residuals_meet_psnr_floor():
    rng = np.random.default_rng(3)
    fr = rng.integers(0, 256, size=(6, 24, 40)).astype(np.uint8)
    dec, _ = mdv_decode(mdv_encode(fr, gop=8, rshift=2))
    assert _psnr(dec[1:], fr[1:]) >= 40.0  # north-rule lossy floor


def test_ragged_edges_and_tiny_frames():
    rng = np.random.default_rng(4)
    for h, w in [(17, 23), (8, 8), (15, 50)]:
        fr = rng.integers(0, 256, size=(3, h, w)).astype(np.uint8)
        dec, _ = mdv_decode(mdv_encode(fr, gop=8, block=16))
        assert dec.shape == fr.shape
        assert np.array_equal(dec[1:], fr[1:])


@pytest.mark.parametrize("kind", ["header", "iframe", "pframe"])
def test_decoder_verifies_stream_integrity(kind):
    v = _translating(nf=4)
    payload = bytearray(mdv_encode(v, gop=8))
    if kind == "header":
        payload[5] ^= 0x01  # width byte
    elif kind == "iframe":
        ipos = payload.index(b"\xff\xdb")  # inside the JPEG DQT
        payload[ipos + 6] ^= 0x01
    else:
        payload[-3] ^= 0x01  # entropy bits near the last P-frame end
    with pytest.raises(ValueError):
        mdv_decode(bytes(payload))


def test_truncation_and_bad_magic_raise():
    v = _translating(nf=3)
    enc = mdv_encode(v)
    with pytest.raises(ValueError):
        mdv_decode(enc[: len(enc) // 2])
    with pytest.raises(ValueError):
        mdv_decode(b"RIFF not a video")
    with pytest.raises(ValueError):
        mdv_encode(np.zeros((2, 4, 4), dtype=np.int16))
    with pytest.raises(ValueError):
        mdv_encode(np.zeros((0, 4, 4), dtype=np.uint8))


def test_video_pipeline_decodes_mdv():
    from gfw_raster_analysis_lambda_spark.operators.multimodal import (
        _decode_video,
        synthesize_mdv_video,
    )

    payload = synthesize_mdv_video(48, 32, 5, seed=2)
    cube = _decode_video(payload, fake=False)
    assert cube.shape == (5, 32, 48)
    i = np.arange(32)[:, None]
    j = np.arange(48)[None, :]
    for t in range(5):
        want = ((((i + 2 * t) // 8) + 2 * ((j + 2 * t) // 8) + 11 * 2) % 256
                ).astype(np.uint8)
        assert np.array_equal(cube[t], want)


def test_negative_wrapping_motion_vector_raises():
    # A handcrafted stream with a valid CRC but an MV whose start index is
    # negative would WRAP under numpy slicing into a valid-shaped block of
    # wrong pixels; the decoder must bounds-check explicitly and raise.
    import struct

    from gfw_raster_analysis_lambda_spark.functions.flac import _crc16
    from gfw_raster_analysis_lambda_spark.functions import mdv as M

    v = _translating(nf=2, h=32, w=32)
    enc = bytearray(mdv_encode(v, gop=8, block=16, search=0))
    hdr_len = 4 + struct.calcsize(M._HDR) + 2
    # skip the I-frame: 'I' u32 len + payload + crc16
    (jlen,) = struct.unpack(">I", enc[hdr_len + 1 : hdr_len + 5])
    p_start = hdr_len + 1 + 4 + jlen + 2
    assert enc[p_start : p_start + 1] == b"P"
    body_start = p_start + 1
    body_end = len(enc) - 2  # last two bytes are the P-frame CRC
    # block grid is 2x2 of 16x16; set block 0's MV to dy=-16 (wraps to the
    # bottom half under naive slicing) and re-sign the CRC
    enc[body_start : body_start + 2] = struct.pack(">bb", -16, 0)
    enc[body_end:] = struct.pack(">H", _crc16(bytes(enc[body_start:body_end])))
    with pytest.raises(ValueError, match="out of bounds"):
        mdv_decode(bytes(enc))


def test_every_prefix_truncation_raises_valueerror():
    """Cutting the stream at ANY byte must surface as ValueError (the
    documented contract), never struct.error — the I-frame length field
    and the P-frame alphabet field were once unguarded."""
    v = _translating(nf=3)
    enc = mdv_encode(v, gop=2)  # I, P, I -> exercises both frame paths
    for cut in range(len(enc)):
        try:
            mdv_parse(enc[:cut])
        except ValueError:
            pass
