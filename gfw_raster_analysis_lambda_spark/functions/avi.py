"""Real MJPEG-in-AVI video codec — RIFF container + per-frame baseline JPEG.

This is the ENTROPY-CODED video path: each frame is a genuine
Huffman-coded baseline JPEG (functions/jpeg.py) inside a spec-shaped
RIFF/AVI container (RIFF 'AVI ' → LIST hdrl [avih + LIST strl
[strh 'vids'/'MJPG' + strf BITMAPINFOHEADER]] → LIST movi ['00dc'
chunks] → idx1). Motion-JPEG is the one mainstream video format a
pure-python stack can honestly deliver end-to-end; inter-frame codecs
(mp4/H.264, webm/VP9) need ffmpeg and stay documented stubs in
operators.multimodal.

Correctness levers:

- The decoder walks the RIFF chunk tree from the stream: frame size
  comes from strf/strh, frames from the movi '00dc' chunks, each
  decoded by the table-driven JPEG decoder — no layout assumptions
  shared with the encoder beyond the spec.
- 8x8-block-constant frames round-trip EXACTLY through the JPEG layer
  (DC step 1, zero AC), so an analytic frame formula stays
  SQL-expressible for the oracle gate while Huffman coding runs for
  real on every frame.
- Arbitrary frames hold the >= 40 dB PSNR floor of the JPEG quantizer.

Scale shape: one payload per row inside Arrow-batched pandas UDFs
(operators.multimodal.video_frame_sample); chunk walking is O(bytes),
the per-frame work is the JPEG kernel.

Reference parity note: the reference engine has no video surface; this
module serves the multimodal training-pipeline mandate (SURVEY.md §2
beyond-reference operators).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import jpeg_decode, jpeg_encode


def avi_encode(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode a (n, h, w) uint8 luma cube as MJPEG-in-AVI."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("avi_encode expects a (n, h, w) uint8 array")
    n, h, w = frames.shape
    payloads = [jpeg_encode(f) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_sz = max((len(p) for p in payloads), default=0)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # microseconds per frame
        0, 0, 0x10,                # rate, padding, flags (HASINDEX)
        n, 0, 1, max_sz,           # total frames, initial, streams, buf
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids", b"MJPG", 0, 0, 0,
        0, 1, max(fps, 1), 0, n,   # initial, scale, rate, start, length
        max_sz, 0xFFFFFFFF, 0,     # buffer, quality, sample size
        0, 0, w, h,                # rcFrame
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", p) for p in payloads)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset from start of movi list body)
    idx_entries = []
    off = 4  # past the 'movi' kind fourcc
    for p in payloads:
        idx_entries.append(struct.pack("<4s3I", b"00dc", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an MJPEG AVI -> ((n, h, w) uint8 luma cube, fps).

    Walks the RIFF chunk tree; only the 'MJPG'/'mjpg' fourcc is inside
    this codec's scope — other compression fourccs raise."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI magic)")
    fps = 25
    fourcc = None
    frames = []

    def walk(lo: int, hi: int) -> None:
        nonlocal fps, fourcc
        pos = lo
        while pos + 8 <= hi:
            cid = data[pos : pos + 4]
            (sz,) = struct.unpack_from("<I", data, pos + 4)
            body_lo = pos + 8
            body_hi = body_lo + sz
            if body_hi > hi:
                raise ValueError("avi: truncated chunk")
            if cid == b"LIST":
                walk(body_lo + 4, body_hi)
            elif cid == b"strh":
                stype, cc = data[body_lo : body_lo + 4], data[body_lo + 4 : body_lo + 8]
                if stype == b"vids":
                    fourcc = cc
                    scale, rate = struct.unpack_from("<2I", data, body_lo + 20)
                    if scale:
                        fps = max(rate // scale, 1)
            elif cid == b"00dc":
                frames.append(bytes(data[body_lo:body_hi]))
            pos = body_hi + (sz % 2)

    end = 8 + struct.unpack_from("<I", data, 4)[0]
    if end > len(data):
        raise ValueError("avi: truncated stream (RIFF size past end)")
    walk(12, end)
    if fourcc is None:
        raise ValueError("avi: no video stream header (strh 'vids')")
    if fourcc not in (b"MJPG", b"mjpg"):
        raise ValueError(
            f"avi: compression {fourcc!r} needs ffmpeg; only MJPG decodes here"
        )
    if not frames:
        h = w = 0
        return np.zeros((0, 0, 0), dtype=np.uint8), fps
    cube = [jpeg_decode(p) for p in frames]
    h, w = cube[0].shape
    if any(f.shape != (h, w) for f in cube):
        raise ValueError("avi: inconsistent frame dimensions")
    return np.stack(cube), fps
