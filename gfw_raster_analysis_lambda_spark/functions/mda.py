"""Real perceptual (lossy transform) audio codec — pure numpy + stdlib.

This is the PERCEPTUAL audio path next to the lossless one
(functions/flac.py), completing the audio codec pair the multimodal
mandate asks for: the MPEG-layer-III-shaped pipeline — 50%-overlap
circular-TDAC **MDCT** with the Princen-Bradley sine window (the frame
ring wraps, making the square analysis operator orthogonal — see
:func:`mdct_analyze`), **psychoacoustic-free
per-band scalefactor quantization**, and **canonical Huffman** entropy
coding — over an honest spec-documented container ("MDA1"). It is NOT
bitstream-compatible with MPEG audio (a conformant mp3 decoder needs
scalefactor-band tables, the bit reservoir, and the 36/12-line block
switch; decoding real-world mp3/aac still raises in
operators.multimodal). What it shares with mp2/mp3 is the thing that
matters for the engine: the transform → quantize → entropy-code shape,
a sync-framed stream whose tables travel IN the stream, and CRC-guarded
frames.

Stream layout (all multi-byte fields big-endian)::

    "MDA1" u8 version  u32 sample_rate  u32 n_samples
    u16 block N  u8 bands  u8 prec  u32 n_frames  u16 crc16(header)
    u16 n_symbols  u8 code_length[n_symbols]      u16 crc16(table)
    per frame: u8 exponent[bands] ; huffman(N symbols) ; pad ; u16 crc16

Correctness levers (mirrors functions/jpeg.py):

- The decoder derives the Huffman table from the STREAM's canonical
  code lengths — encoder and decoder cannot silently share a wrong
  constant (tamper a length byte and the table CRC trips; fix the CRC
  too and the decode output changes).
- Every frame carries a CRC-16 (reusing the FLAC CRC machinery); bit
  corruption raises instead of returning wrong audio.
- MDCT analysis/synthesis are exact TDAC inverses (verified to float
  epsilon in tests), so ALL loss is the quantizer's — which gives the
  testable PSNR floor and the exact-integer-coefficient gate trick:
  a signal synthesized from small-integer MDCT coefficients re-encodes
  to EXACTLY those integers (float error ~1e-12 << the 0.5 rounding
  margin), so a DuckDB twin can verify quantized-domain statistics with
  pure integer arithmetic — no trig, no float hashing.

Reference parity note: the reference engine has no audio surface; this
module serves the beyond-reference multimodal pipeline (SURVEY.md §2.7+)
as the second real audio codec family.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

from .flac import _BitReader, _BitWriter, _crc16

_MAGIC = b"MDA1"
_VERSION = 1
_ESCAPE_BITS = 32  # raw bits following the escape symbol
_MAX_CODE_LEN = 15


# ---------------------------------------------------------------------------
# MDCT (Princen-Bradley TDAC, sine window)
# ---------------------------------------------------------------------------

def _mdct_basis(n: int) -> np.ndarray:
    """(n, 2n) orthonormal-scaled MDCT analysis basis with the sine
    window folded in: X = frames @ basis.T, frames of length 2n."""
    t = np.arange(2 * n, dtype=np.float64)
    k = np.arange(n, dtype=np.float64)[:, None]
    w = np.sin(np.pi / (2 * n) * (t + 0.5))
    c = np.cos(np.pi / n * (t[None, :] + 0.5 + n / 2.0) * (k + 0.5))
    return np.sqrt(2.0 / n) * w[None, :] * c


def mdct_analyze(x: np.ndarray, n: int) -> np.ndarray:
    """(n_frames, n) MDCT coefficients of float signal ``x`` (length a
    multiple of n, at least 2n) on a CIRCULAR frame ring: frame i
    windows ``x[i*n : i*n + 2n]`` with the last frame wrapping to the
    start. Critically sampled (len(x) samples -> len(x) coefficients)
    AND perfect-reconstruction, so the square analysis operator is
    orthogonal — ``mdct_analyze(mdct_synthesize(C)) == C`` exactly,
    the property the integer-coefficient oracle bridge relies on."""
    x = np.asarray(x, np.float64)
    if len(x) % n:
        raise ValueError(f"signal length {len(x)} not a multiple of N={n}")
    if len(x) < 2 * n:
        raise ValueError(f"signal shorter than two frames ({len(x)} < {2 * n})")
    xx = np.concatenate([x, x[:n]])
    n_frames = len(x) // n
    idx = np.arange(2 * n)[None, :] + n * np.arange(n_frames)[:, None]
    return xx[idx] @ _mdct_basis(n).T


def mdct_synthesize(coeffs: np.ndarray, n_samples: int) -> np.ndarray:
    """Inverse of :func:`mdct_analyze`: circular overlap-add of the
    windowed IMDCT of each frame. Exact TDAC reconstruction."""
    coeffs = np.asarray(coeffs, np.float64)
    n_frames, n = coeffs.shape
    if n_samples != n_frames * n:
        raise ValueError("n_samples must equal n_frames * N (circular ring)")
    frames = coeffs @ _mdct_basis(n)  # (n_frames, 2n)
    buf = np.zeros(n_samples)
    for i in range(n_frames):
        lo = i * n
        if lo + 2 * n <= n_samples:
            buf[lo : lo + 2 * n] += frames[i]
        else:  # last frame wraps to the start of the ring
            buf[lo:] += frames[i][: n_samples - lo]
            buf[: lo + 2 * n - n_samples] += frames[i][n_samples - lo :]
    return buf


# ---------------------------------------------------------------------------
# Canonical Huffman (table carried in the stream)
# ---------------------------------------------------------------------------

def _code_lengths(counts: np.ndarray) -> np.ndarray:
    """Huffman code lengths per symbol (0 = unused), max depth capped at
    _MAX_CODE_LEN by count-flattening re-runs."""
    counts = counts.astype(np.int64)
    while True:
        sym = np.flatnonzero(counts)
        if len(sym) == 0:
            raise ValueError("empty alphabet")
        if len(sym) > (1 << _MAX_CODE_LEN):
            # Kraft: >2^L used symbols admit NO L-bit-limited prefix code,
            # so the flatten-retry loop below could never terminate.
            raise ValueError(
                f"{len(sym)} used symbols exceed the {_MAX_CODE_LEN}-bit "
                "code-length limit; reduce prec/alphabet"
            )
        if len(sym) == 1:
            out = np.zeros(len(counts), np.int64)
            out[sym[0]] = 1
            return out
        heap = [(int(counts[s]), int(s), (int(s),)) for s in sym]
        heapq.heapify(heap)
        depth = np.zeros(len(counts), np.int64)
        while len(heap) > 1:
            c1, t1, m1 = heapq.heappop(heap)
            c2, t2, m2 = heapq.heappop(heap)
            for s in m1 + m2:
                depth[s] += 1
            heapq.heappush(heap, (c1 + c2, min(t1, t2), m1 + m2))
        if depth.max() <= _MAX_CODE_LEN:
            return depth
        counts = (counts + 1) // 2  # flatten and retry

def _canonical_codes(lengths: np.ndarray) -> dict:
    """symbol -> (code, length), canonical order (length, symbol) — the
    same assignment rule as JPEG Annex C, re-derived for an arbitrary
    length table read from the stream."""
    order = sorted((int(l), s) for s, l in enumerate(lengths) if l > 0)
    out, code, prev = {}, 0, 0
    for l, s in order:
        code <<= (l - prev)
        out[s] = (code, l)
        code += 1
        prev = l
    return out


# ---------------------------------------------------------------------------
# Quantizer: per-band scalefactor exponents (psychoacoustic-free)
# ---------------------------------------------------------------------------

def _zig(q: np.ndarray) -> np.ndarray:
    """signed -> unsigned symbol: 0,-1,1,-2,2,... -> 0,1,2,3,4,..."""
    return np.where(q >= 0, 2 * q, -2 * q - 1)


def _unzig(s: np.ndarray) -> np.ndarray:
    return np.where(s % 2 == 0, s // 2, -(s + 1) // 2)


def mda_encode(
    pcm: np.ndarray,
    sample_rate: int,
    n: int = 64,
    bands: int = 8,
    prec: int = 8,
    alphabet: int | None = None,
) -> bytes:
    """Encode int16 mono PCM. ``prec`` bits of per-band precision: the
    band exponent is the smallest e >= 0 with max|coef|/2^e fitting in
    prec-1 magnitude bits, so quantized values live in [-(2^(prec-1)-1),
    2^(prec-1)-1] and their zig-zagged symbols fit the default alphabet
    of 2^prec. The last symbol is an escape to raw 32-bit two's
    complement — unreachable under the default sizing (a defensive path
    for callers passing a smaller explicit ``alphabet``)."""
    pcm = np.asarray(pcm)
    if pcm.dtype != np.int16:
        raise ValueError("mda_encode takes int16 PCM")
    if n % bands:
        raise ValueError("bands must divide N")
    if alphabet is None:
        alphabet = 2 ** prec
    if not (2 <= alphabet <= 65535):
        raise ValueError(f"alphabet {alphabet} out of range")
    n_samples = len(pcm)
    pad = max((-n_samples) % n, 2 * n - n_samples)
    x = np.concatenate([pcm.astype(np.float64), np.zeros(pad)]) / 32768.0
    coeffs = mdct_analyze(x, n)  # (F, n)
    f_cnt = coeffs.shape[0]
    # per-(frame, band) exponents
    cb = coeffs.reshape(f_cnt, bands, n // bands)
    mags = np.abs(cb).max(axis=2) * 32768.0  # scale to integer-ish domain
    lim = float(2 ** (prec - 1) - 1)
    exps = np.ceil(np.log2(np.maximum(mags / lim, 1e-300))).astype(np.int64)
    exps = np.clip(exps, 0, 120)
    steps = np.exp2(exps)[:, :, None] / 32768.0
    q = np.floor(cb / steps + 0.5).astype(np.int64)  # round half up
    syms = _zig(q.reshape(f_cnt, n))
    esc = alphabet - 1
    clipped = np.minimum(syms, esc)
    counts = np.bincount(clipped.ravel(), minlength=alphabet)
    lengths = _code_lengths(counts)
    codes = _canonical_codes(lengths)

    head = bytearray()
    head += _MAGIC
    head += struct.pack(">BIIHBBI", _VERSION, int(sample_rate), n_samples,
                        n, bands, prec, f_cnt)
    head += struct.pack(">H", _crc16(bytes(head)))
    tbl = struct.pack(">H", alphabet) + bytes(int(v) for v in lengths)
    head += tbl + struct.pack(">H", _crc16(tbl))

    out = bytearray(head)
    qf = q.reshape(f_cnt, n)
    for f in range(f_cnt):
        bw = _BitWriter()
        for b in range(bands):
            bw.write(int(exps[f, b]), 8)
        for i in range(n):
            s = int(min(syms[f, i], esc))
            c, l = codes[s]
            bw.write(c, l)
            if s == esc:
                bw.write(int(qf[f, i]) & 0xFFFFFFFF, _ESCAPE_BITS)
        bw.align()
        payload = bw.bytes()
        out += payload + struct.pack(">H", _crc16(payload))
    return bytes(out)


def mda_decode_quantized(
    data: bytes,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Decode an MDA1 stream to its QUANTIZED domain: -> (q int64 of
    shape (n_frames, N), exponents int64 of shape (n_frames, bands),
    sample_rate, n_samples). Everything is rebuilt from the stream:
    header fields, canonical Huffman table, per-band exponents. CRC
    mismatches, bad magic, and truncation raise ValueError. The float
    synthesis path (:func:`mda_decode`) layers on top."""
    data = bytes(data)
    if data[:4] != _MAGIC:
        raise ValueError("not an MDA1 stream")
    hdr_len = 4 + struct.calcsize(">BIIHBBI")
    if len(data) < hdr_len + 2:
        raise ValueError("truncated MDA1 header")
    version, sr, n_samples, n, bands, prec, f_cnt = struct.unpack(
        ">BIIHBBI", data[4:hdr_len]
    )
    if version != _VERSION:
        raise ValueError(f"unsupported MDA version {version}")
    (hcrc,) = struct.unpack(">H", data[hdr_len : hdr_len + 2])
    if _crc16(data[:hdr_len]) != hcrc:
        raise ValueError("MDA header CRC mismatch")
    pos = hdr_len + 2
    if len(data) < pos + 2:
        raise ValueError("truncated MDA table")
    (alphabet,) = struct.unpack(">H", data[pos : pos + 2])
    tbl_end = pos + 2 + alphabet
    if len(data) < tbl_end + 2:
        raise ValueError("truncated MDA table")
    lengths = np.frombuffer(data[pos + 2 : tbl_end], np.uint8).astype(np.int64)
    (tcrc,) = struct.unpack(">H", data[tbl_end : tbl_end + 2])
    if _crc16(data[pos:tbl_end]) != tcrc:
        raise ValueError("MDA table CRC mismatch")
    codes = _canonical_codes(lengths)
    # decode tree as dict[(code, len)] -> symbol
    rev = {v: s for s, v in codes.items()}
    esc = alphabet - 1
    pos = tbl_end + 2

    q_all = np.zeros((f_cnt, n), np.int64)
    e_all = np.zeros((f_cnt, bands), np.int64)
    for f in range(f_cnt):
        br = _BitReader(data, pos)
        e_all[f] = [br.bits(8) for _ in range(bands)]
        syms = np.zeros(n, np.int64)
        raws: dict[int, int] = {}
        for i in range(n):
            code, l = 0, 0
            while True:
                code = (code << 1) | br.bits(1)
                l += 1
                if l > _MAX_CODE_LEN:
                    raise ValueError("invalid MDA Huffman stream")
                s = rev.get((code, l))
                if s is not None:
                    break
            syms[i] = s
            if s == esc:
                raw = br.bits(_ESCAPE_BITS)
                raws[i] = raw - (1 << 32) if raw >= (1 << 31) else raw
        br.align()
        end = br.byte_pos()
        if len(data) < end + 2:
            raise ValueError("truncated MDA frame")
        (fcrc,) = struct.unpack(">H", data[end : end + 2])
        if _crc16(data[pos:end]) != fcrc:
            raise ValueError(f"MDA frame {f} CRC mismatch")
        q = _unzig(syms)
        for i, raw in raws.items():
            q[i] = raw
        q_all[f] = q
        pos = end + 2
    return q_all, e_all, sr, n_samples


def mda_decode(data: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 PCM, sample_rate): dequantize the stream's integer
    coefficients with their per-band exponents and run the circular
    IMDCT overlap-add."""
    q_all, e_all, sr, n_samples = mda_decode_quantized(data)
    f_cnt, n = q_all.shape
    bands = e_all.shape[1]
    steps = np.exp2(e_all.astype(np.float64)) / 32768.0
    frames = (
        q_all.astype(np.float64).reshape(f_cnt, bands, n // bands)
        * steps[:, :, None]
    ).reshape(f_cnt, n)
    x = mdct_synthesize(frames, f_cnt * n)[:n_samples]
    return (
        np.clip(np.floor(x * 32768.0 + 0.5), -32768, 32767).astype(np.int16),
        sr,
    )


def synthesize_mda_pcm16(
    coeff_fn,
    n_frames: int,
    n: int = 64,
    bands: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Build int16 PCM whose MDCT coefficients re-quantize to EXACTLY
    the integers ``coeff_fn(f, i)``: pcm = round(32768 * imdct(C)).
    Returns (pcm int16, C int64 of shape (n_frames, n)).

    Why this is exact: the circular TDAC analysis operator is
    ORTHOGONAL (square + perfect reconstruction), so analysis of
    imdct(C/32768) returns C/32768 exactly; the int16 rounding of the
    synthesized signal perturbs each re-analyzed coefficient by at most
    ||row||_1 * 0.5 in integer units — empirically < 0.05 for n = 64
    (pinned by a test) — far inside the 0.5 round-half-up margin, so
    ``mda_encode(pcm)`` at exponent 0 re-quantizes to exactly C. That
    makes quantized-domain statistics of the DECODED stream a pure
    integer function of ``coeff_fn`` — the SQL-expressible bridge the
    DuckDB oracle gate rides. Keep |coeff_fn| <= 2^(prec-1)-1 so every
    band's exponent stays 0."""
    if n_frames < 2:
        raise ValueError("circular ring needs at least 2 frames")
    ff, ii = np.meshgrid(np.arange(n_frames), np.arange(n), indexing="ij")
    c = np.asarray(coeff_fn(ff, ii), np.int64)
    n_samples = n_frames * n
    x = mdct_synthesize(c / 32768.0, n_samples)
    pcm = np.clip(np.floor(x * 32768.0 + 0.5), -32768, 32767).astype(np.int16)
    return pcm, c
