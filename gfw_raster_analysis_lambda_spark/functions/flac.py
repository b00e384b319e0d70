"""Real FLAC-subset lossless audio codec — pure numpy + stdlib.

This is the ENTROPY-CODED audio path: fixed linear predictors (orders
0-4), Rice/Golomb-coded residuals, and a spec-shaped stream — ``fLaC``
magic, STREAMINFO metadata block (with the decoded-audio MD5), frame
headers with CRC-8, frame footers with CRC-16 (per the FLAC format,
RFC 9639). It exists to make the engine's compressed-audio claim REAL
where pure python can honestly deliver it: FLAC is lossless, so unlike
perceptual codecs (mp3/aac — which stay documented stubs in
operators.multimodal) a from-scratch subset can round-trip EXACTLY,
which is what the oracle gates need.

Subset bounds (encode side): mono, 16-bit, fixed blocking. The decoder
is written against the stream, not the encoder: it rebuilds everything
from STREAMINFO and per-frame headers (block size, predictor order,
Rice parameters per partition, wasted-bits flags), verifies both CRCs
and the STREAMINFO MD5, and rejects features outside the subset
(stereo, LPC subframes) with clear errors instead of wrong samples.

Correctness levers:

- LOSSLESS: round-trip equality is asserted per-stream via the
  STREAMINFO MD5 the encoder embeds and the decoder recomputes — a
  predictor/Rice bug cannot produce silently-wrong audio.
- The decoder consumes arbitrary Rice partition orders and the
  wasted-bits escape even though this encoder emits neither beyond the
  basic forms — table/parameter knowledge lives in the stream only.
- The encoder picks the cheapest fixed predictor order per block by
  measured residual magnitude, so compression is content-adaptive (a
  sine compresses ~2-3x; noise falls back to low orders/verbatim-ish
  cost) while staying deterministic.

Scale shape: encode/decode run inside Arrow-batched pandas UDFs only
(operators.multimodal), one payload per row; predictor differencing is
vectorized numpy, the per-symbol loop is the Rice stream that is
inherent to entropy coding.

Reference parity note: the reference engine has no audio surface; this
module serves the multimodal training-pipeline mandate (SURVEY.md §2.7+
beyond-reference operators), mirroring functions/jpeg.py on the image
side.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCK = 4096  # encoder's fixed block size (decoder reads it per frame)


# ---------------------------------------------------------------------------
# CRCs (FLAC uses CRC-8 poly 0x07 for frame headers, CRC-16 poly 0x8005
# for whole frames; both init 0, not reflected)
# ---------------------------------------------------------------------------

def _make_crc8_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t[i] = c
    return t


def _make_crc16_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t[i] = c
    return t


_CRC8_T = _make_crc8_table()
_CRC16_T = _make_crc16_table()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_T[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16_T[((c >> 8) ^ b) & 0xFF])
    return c


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, length: int) -> None:
        if length <= 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self._d = data
        self._pos = pos
        self._acc = 0
        self._nbits = 0

    def bits(self, n: int) -> int:
        while self._nbits < n:
            if self._pos >= len(self._d):
                raise ValueError("flac: truncated stream")
            self._acc = (self._acc << 8) | self._d[self._pos]
            self._pos += 1
            self._nbits += 8
        self._nbits -= n
        v = (self._acc >> self._nbits) & ((1 << n) - 1)
        self._acc &= (1 << self._nbits) - 1
        return v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self._nbits = 0
        self._acc = 0

    def byte_pos(self) -> int:
        assert self._nbits == 0
        return self._pos


# ---------------------------------------------------------------------------
# Fixed predictors (FLAC orders 0-4: successive differencing)
# ---------------------------------------------------------------------------

def _residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _restore(res: np.ndarray, warmup: np.ndarray, order: int) -> np.ndarray:
    # invert order-fold differencing: cumulatively re-integrate
    out = res.astype(np.int64)
    for o in range(order, 0, -1):
        w = _residual(warmup, o - 1)  # the (o-1)-diffed warmup's last value
        out = np.concatenate(([w[-1]], out)).cumsum()[1:]
    return np.concatenate((warmup.astype(np.int64), out)) if order else out


def _rice_k(res: np.ndarray) -> int:
    # smallest k with (n << k) >= sum(|zigzag|): standard estimator
    u = np.abs(res.astype(np.int64)) * 2
    total = int(u.sum())
    n = max(len(res), 1)
    k = 0
    while (n << k) < total and k < 30:
        k += 1
    return min(k, 14)  # keep within the 4-bit parameter space (escape at 15)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _utf8_number(n: int) -> bytes:
    # FLAC frame numbers use UTF-8-style variable-length coding
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    # an nbytes-long coding carries (7 - nbytes) + 6 * (nbytes - 1) bits
    while bits > 5 * nbytes + 1:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | ((n >> (6 * (nbytes - 2 - i))) & 0x3F))
    lead = (0xFF << (8 - nbytes)) & 0xFF | (n >> (6 * (nbytes - 1)))
    return bytes([lead]) + bytes(out)


def flac_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a mono int16 waveform as a FLAC-subset stream."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("flac_encode expects a 1-D int16 array")
    x = samples.astype(np.int64)
    n_total = len(x)

    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    # STREAMINFO: min/max block, min/max frame (0 = unknown), 20-bit rate,
    # 3-bit channels-1, 5-bit bps-1, 36-bit total samples, MD5
    si = struct.pack(">HH", _BLOCK, _BLOCK) + b"\x00" * 6
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | n_total
    si += packed.to_bytes(8, "big") + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si  # last-block flag set

    for fi in range(0, max(n_total, 1), _BLOCK):
        blk = x[fi : fi + _BLOCK]
        bs = len(blk)
        if bs == 0:
            break
        # frame header: sync(14)=0x3FFE, reserved(1)=0, blocking(1)=0 fixed,
        # blocksize bits 0111 (16-bit at end), rate bits 0000 (STREAMINFO),
        # channels 0000 (mono), sample size 100 (16-bit), reserved 0
        hdr = bytearray()
        hdr += bytes([0xFF, 0xF8])
        hdr += bytes([(0b0111 << 4) | 0b0000])
        hdr += bytes([(0b0000 << 4) | (0b100 << 1)])
        hdr += _utf8_number(fi // _BLOCK)
        hdr += struct.pack(">H", bs - 1)
        hdr += bytes([_crc8(bytes(hdr))])

        bw = _BitWriter()
        if np.all(blk == blk[0]):
            # CONSTANT subframe
            bw.write(0, 1)
            bw.write(0b000000, 6)
            bw.write(0, 1)
            bw.write(int(blk[0]), 16)
        else:
            # cheapest fixed order by residual magnitude (order<=bs-1)
            best_o, best_cost, best_res = 0, None, None
            for o in range(min(5, bs)):
                res = _residual(blk, o)
                cost = int(np.abs(res).sum()) + (o << 14)
                if best_cost is None or cost < best_cost:
                    best_o, best_cost, best_res = o, cost, res
            o, res = best_o, best_res
            bw.write(0, 1)
            bw.write(0b001000 | o, 6)
            bw.write(0, 1)  # no wasted bits
            for w in blk[:o]:
                bw.write(int(w), 16)
            # residual: method 00 (4-bit Rice), partition order 0
            bw.write(0b00, 2)
            bw.write(0, 4)
            k = _rice_k(res)
            u = (np.abs(res) * 2 - (res < 0)).astype(np.int64)
            if k >= 15 or int((u >> k).max(initial=0)) > 4096:
                # escape: raw residuals at a fixed bit width
                width = max(int(u.max(initial=0)).bit_length() + 1, 2)
                bw.write(0b1111, 4)
                bw.write(width, 5)
                for v in res:
                    bw.write(int(v), width)
            else:
                bw.write(k, 4)
                for v in u:
                    bw.unary(int(v) >> k)
                    bw.write(int(v), k)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    while (b0 << nbytes) & 0x80:
        nbytes += 1
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.bits(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad UTF-8 frame number")
        n = (n << 6) | (b & 0x3F)
    return n


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC-subset stream -> (int16 mono samples, sample_rate).

    Everything is read from the stream (STREAMINFO + frame headers);
    CRC-8/CRC-16 and the STREAMINFO MD5 are verified. Stereo and LPC
    subframes are outside the subset and raise."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    sample_rate = None
    n_total = None
    md5_expect = None
    while True:  # metadata blocks
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:  # STREAMINFO
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            nch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            n_total = packed & ((1 << 36) - 1)
            md5_expect = body[18:34]
            if nch != 1 or bps != 16:
                raise ValueError("flac: subset decoder is mono/16-bit only")
        if last:
            break
    if sample_rate is None:
        raise ValueError("flac: missing STREAMINFO")

    chunks = []
    got = 0
    while got < (n_total or 0) and pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.bits(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        br.bits(1)  # reserved
        br.bits(1)  # blocking strategy
        bs_bits = br.bits(4)
        sr_bits = br.bits(4)
        ch_bits = br.bits(4)
        sz_bits = br.bits(3)
        br.bits(1)  # reserved
        if ch_bits != 0:
            raise ValueError("flac: subset decoder is mono only")
        if sz_bits not in (0b100, 0b000):
            raise ValueError("flac: subset decoder is 16-bit only")
        _read_utf8_number(br)
        if bs_bits == 0b0110:
            bs = br.bits(8) + 1
        elif bs_bits == 0b0111:
            bs = br.bits(16) + 1
        elif bs_bits >= 0b1000:
            bs = 256 << (bs_bits - 8)
        elif bs_bits >= 0b0010:
            bs = 576 << (bs_bits - 2)
        elif bs_bits == 0b0001:
            bs = 192
        else:
            raise ValueError("flac: reserved block size code")
        if sr_bits not in (0, 0b0000):
            # subset streams carry the rate in STREAMINFO; consume the
            # explicit forms anyway for stream generality
            if sr_bits == 0b1100:
                br.bits(8)
            elif sr_bits in (0b1101, 0b1110):
                br.bits(16)
        # CRC-8 covers the header up to (not incl.) the CRC byte; every
        # header field is whole bytes so the reader is byte-aligned here
        crc_offset = br.byte_pos()
        expect8 = br.bits(8)
        if _crc8(data[frame_start:crc_offset]) != expect8:
            raise ValueError("flac: frame header CRC-8 mismatch")

        # subframe header
        if br.bits(1) != 0:
            raise ValueError("flac: bad subframe padding bit")
        stype = br.bits(6)
        wasted = 0
        if br.bits(1):  # wasted-bits flag: unary count - 1
            wasted = 1
            while br.bits(1) == 0:
                wasted += 1
        eff_bits = 16 - wasted

        def _signed(v: int, nbits: int) -> int:
            return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

        if stype == 0b000000:  # CONSTANT
            v = _signed(br.bits(eff_bits), eff_bits)
            blk = np.full(bs, v, dtype=np.int64)
        elif stype == 0b000001:  # VERBATIM
            blk = np.array(
                [_signed(br.bits(eff_bits), eff_bits) for _ in range(bs)],
                dtype=np.int64,
            )
        elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
            order = stype & 0x7
            warm = np.array(
                [_signed(br.bits(eff_bits), eff_bits) for _ in range(order)],
                dtype=np.int64,
            )
            method = br.bits(2)
            if method > 1:
                raise ValueError("flac: reserved residual coding method")
            pbits = 4 if method == 0 else 5
            porder = br.bits(4)
            nparts = 1 << porder
            res = np.empty(bs - order, dtype=np.int64)
            ri = 0
            for p in range(nparts):
                cnt = (bs >> porder) - (order if p == 0 else 0)
                k = br.bits(pbits)
                if k == (1 << pbits) - 1:  # escape: raw at 5-bit width
                    width = br.bits(5)
                    for _ in range(cnt):
                        res[ri] = _signed(br.bits(width), width) if width else 0
                        ri += 1
                else:
                    for _ in range(cnt):
                        q = br.unary()
                        u = (q << k) | (br.bits(k) if k else 0)
                        res[ri] = (u >> 1) ^ -(u & 1)
                        ri += 1
            blk = _restore(res, warm, order)
        elif stype >= 0b100000:
            raise ValueError("flac: LPC subframes are outside this subset")
        else:
            raise ValueError(f"flac: reserved subframe type {stype:#08b}")
        if wasted:
            blk = blk << wasted

        br.align()
        body_end = br.byte_pos()
        expect16 = struct.unpack(">H", data[body_end : body_end + 2])[0]
        if _crc16(data[frame_start:body_end]) != expect16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = body_end + 2
        chunks.append(blk)
        got += bs

    if n_total and got != n_total:
        raise ValueError("flac: stream ended before total_samples")
    samples = (
        np.concatenate(chunks).astype(np.int16)
        if chunks
        else np.zeros(0, dtype=np.int16)
    )
    if md5_expect and md5_expect != b"\x00" * 16:
        if hashlib.md5(samples.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("flac: decoded-audio MD5 mismatch")
    return samples, int(sample_rate)
