"""Real baseline JPEG (ITU-T T.81) grayscale codec — pure numpy + stdlib.

This is the ENTROPY-CODED image path: 8x8 forward/inverse DCT,
quantization, zig-zag, DC-difference + AC run/size Huffman coding with
byte stuffing, and a spec-conformant marker stream
(SOI/DQT/SOF0/DHT/SOS/EOI). Baseline sequential, one grayscale
component, 8-bit samples. It exists to make the engine's compressed-
media claim REAL where pure python can honestly deliver it: unlike the
``"jpeg"`` stand-in in :mod:`codecs` (a quantizer whose decode is
SQL-expressible, kept so the mm_image_stats oracle stays exact), the
``"jpg"`` payloads produced here are genuine Huffman-coded JPEG
interchange format.

Correctness levers:

- The decoder builds its Huffman tables FROM THE STREAM's DHT segments
  (per the spec), never assuming the encoder's tables — so encoder and
  decoder cannot silently share a wrong constant.
- Quantization uses a fixed near-lossless table (DC step 1, AC steps
  2/4).  Uniform-quantizer error of step q contributes ~q^2/12 MSE per
  coefficient and the DCT is orthonormal, so worst-case PSNR stays
  >= ~45 dB on any input — the input-hint's >= 40 dB invariant holds
  WITHOUT depending on image content.
- Blocks that are CONSTANT round-trip exactly (their AC coefficients
  are identically zero and the DC step is 1), which gives the Spark
  pipeline an exact, SQL-expressible oracle on block-constant corpora
  while the entropy coder still runs for real.

Scale shape: encode/decode run inside Arrow-batched pandas UDFs only
(operators.multimodal), one payload per row; the DCT/IDCT are single
einsum calls over all of a tile's blocks, entropy coding is the
per-symbol loop that is inherent to Huffman streams.

Reference parity note: the reference lambda decodes imagery via
GDAL/rasterio (reference raster_analysis/globals.py pins rasterio); this
engine re-expresses decode as executor-side numpy per SURVEY.md §2 S1.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

# Near-lossless quantization: DC exact (step 1), low-frequency AC step 2,
# high-frequency AC step 4.  mean(q^2)/12 ~= 0.9 MSE -> ~48.6 dB floor.
_QTABLE = np.full((8, 8), 2, dtype=np.int32)
for _u in range(8):
    for _v in range(8):
        if _u + _v >= 6:
            _QTABLE[_u, _v] = 4
_QTABLE[0, 0] = 1

# Standard luminance Huffman tables (ITU-T T.81 Annex K.3).  Used by the
# ENCODER only; the decoder always rebuilds tables from the DHT segment.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Flat indices of the 8x8 zig-zag scan, computed (not transcribed).

    T.81 Figure 5: odd anti-diagonals (u+v odd) are traversed with the row
    index u increasing, even anti-diagonals with u decreasing (equivalently,
    v increasing) — the first indices are 0, 1, 8, 16, 9, 2, 3, 10, ...
    """
    order = sorted(
        ((u, v) for u in range(8) for v in range(8)),
        key=lambda t: (t[0] + t[1], t[0] if (t[0] + t[1]) % 2 else t[1]),
    )
    return np.array([u * 8 + v for u, v in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()

# Orthonormal 8-point DCT-II basis (equals the spec's 1/4*C(u)C(v) form).
_DCT_A = np.zeros((8, 8))
for _u in range(8):
    c = np.sqrt(1.0 / 8.0) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_A[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _huff_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman code assignment per T.81 Annex C: symbol ->
    (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _huff_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _huff_codes(_AC_BITS, _AC_VALS)


# ---------------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._nbits -= 8
            self._out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self._out.append(0x00)

    def done(self) -> bytes:
        if self._nbits:  # pad final byte with 1s (spec F.1.2.3)
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self._out)


class _BitReader:
    """Reads the entropy-coded segment; un-stuffs 0xFF00 on the fly and
    stops at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self._d = data
        self._pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        d, p = self._d, self._pos
        if p >= len(d):
            raise ValueError("jpeg: truncated entropy segment")
        byte = d[p]
        p += 1
        if byte == 0xFF:
            if p >= len(d):
                raise ValueError("jpeg: truncated after 0xFF")
            marker = d[p]
            if marker == 0x00:
                p += 1  # stuffed 0xFF data byte
            else:
                raise ValueError(f"jpeg: unexpected marker 0xFF{marker:02x} in scan")
        self._pos = p
        self._acc = (self._acc << 8) | byte
        self._nbits += 8

    def bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def end_pos(self) -> int:
        return self._pos


def _extend(value: int, size: int) -> int:
    """Sign-extend a SIZE-bit magnitude value (spec F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def jpeg_encode(arr: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as baseline sequential grayscale JPEG."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("jpeg_encode expects a 2-D uint8 array")
    h, w = arr.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeffs = np.einsum("ux,nxy,vy->nuv", _DCT_A, blocks, _DCT_A)
    quant = np.round(coeffs / _QTABLE).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]

    bw = _BitWriter()
    pred = 0
    for blk in zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s = _category(diff)
        code, length = _DC_CODES[s]
        bw.write(code, length)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.flatnonzero(blk[1:])
        last = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = _AC_CODES[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            s = _category(v)
            code, length = _AC_CODES[(run << 4) | s]
            bw.write(code, length)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, length = _AC_CODES[0x00]  # EOB
            bw.write(code, length)
    scan = bw.done()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, bytes([0x00]) + bytes(
        int(x) for x in _QTABLE.reshape(64)[_ZIGZAG]
    ))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _decode_huff_table(payload: bytes, off: int):
    tc_th = payload[off]
    bits = list(payload[off + 1 : off + 17])
    n = sum(bits)
    vals = list(payload[off + 17 : off + 17 + n])
    lut, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return tc_th >> 4, tc_th & 0xF, lut, off + 17 + n


def _read_symbol(br: _BitReader, lut: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code in scan")


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline sequential grayscale JPEG to a 2-D uint8 array.

    Tables come from the stream's own DQT/DHT segments.  Restart
    intervals, progressive scans, and multi-component images are out of
    scope and raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, dict] = {}
    h = w = None
    comp_q = 0
    scan_dc = scan_ac = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(
                    payload[off + 1 : off + 65], dtype=np.uint8
                )
                qtables[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(payload):
                tc, th, lut, off = _decode_huff_table(payload, off)
                htables[(tc, th)] = lut
        elif marker == 0xC0:  # SOF0
            precision, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8 or ncomp != 1:
                raise ValueError("jpeg: only 8-bit single-component baseline")
            comp_q = payload[8]  # [6]=component id, [7]=sampling, [8]=Tq
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("jpeg: only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("jpeg: restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            scan_dc = htables[(0, payload[2] >> 4)]
            scan_ac = htables[(1, payload[2] & 0xF)]
            break
    if h is None or scan_dc is None:
        raise ValueError("jpeg: missing SOF/SOS")
    q = qtables[comp_q]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    n_blocks = (ph // 8) * (pw // 8)
    zz = np.zeros((n_blocks, 64), dtype=np.int32)
    br = _BitReader(data, pos)
    pred = 0
    for b in range(n_blocks):
        s = _read_symbol(br, scan_dc)
        pred += _extend(br.bits(s), s)
        zz[b, 0] = pred
        k = 1
        while k < 64:
            sym = _read_symbol(br, scan_ac)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError("jpeg: bad AC symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("jpeg: AC run past block end")
            zz[b, k] = _extend(br.bits(size), size)
            k += 1
    coeffs = np.zeros((n_blocks, 64), dtype=np.float64)
    coeffs[:, _ZIGZAG] = zz
    coeffs = coeffs.reshape(-1, 8, 8) * q
    blocks = np.einsum("xu,nuv,yv->nxy", _DCT_A.T, coeffs, _DCT_A.T)
    out = (
        blocks.reshape(ph // 8, pw // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)
    )
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]
