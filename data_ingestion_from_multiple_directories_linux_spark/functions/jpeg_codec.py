"""Pure-Python baseline JPEG codec (grayscale), stdlib + numpy only.

Completes the pixel-path symmetry with ``png_codec``: the multimodal
operators' decode stage is fully real for baseline JFIF payloads too —
marker walk, Huffman entropy decode (standard Annex-K luminance tables
or any tables carried in DHT), dequantize, inverse zigzag, 2-D IDCT —
with no codec library and no stub. Reference parity: the reference
pipeline treats media as opaque blobs (SURVEY.md §2.12a additive
surface); this is engine-side capability, not a port.

Supported: baseline sequential DCT (SOF0), 8-bit, ONE component
(grayscale), no subsampling, no restart intervals. Anything else
returns None from :func:`decode_jpeg_gray` — callers quarantine, the
same contract as ``png_codec.decode_png`` and the header parsers.

The encoder exists so tests and the synthetic corpus can build REAL
entropy-coded payloads with predictable pixels: quantization tables of
all ones keep DCT coefficients exact, and an image that is CONSTANT
within every 8×8 tile round-trips bit-exactly (fDCT of a constant block
is a lone DC coefficient; float error ~1e-13 rounds away), which is
what gives ``media_pixel_stats`` a closed-form oracle over JPEG
payloads. Arbitrary images round-trip within a small rounding bound
(coefficient rounding of ≤0.5 compounds through the IDCT basis to a
worst case of ~±4; observed ≤±2 over large random sweeps),
property-tested — only the tile-constant construction is exact.

Performance shape: runs inside Arrow-batched ``mapInPandas`` workers;
the DCT/IDCT are single 8×8 matrix multiplies per block (numpy), and
the Huffman loops are per-symbol Python — fine for the metadata-sized
assets this path handles, and isolated behind the vectorized batch
boundary either way.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Constants: zigzag order, orthonormal DCT basis, Annex-K Huffman tables
# --------------------------------------------------------------------------

#: zigzag scan order: index i in scan order → (row, col) flat index
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: JPEG 2-D DCT basis: F = M @ (f - 128) @ M.T ; f = M.T @ F @ M + 128
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Standard luminance Huffman tables (JPEG spec ITU-T T.81 Annex K.3):
# BITS (count of codes per length 1..16) + HUFFVAL lists.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-at-a-time decoder."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


_DC_ENC = _build_codes(DC_BITS, DC_VALS)
_AC_ENC = _build_codes(AC_BITS, AC_VALS)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing: 0xFF in entropy data → FF 00
                self.buf.append(0x00)
        # drop the emitted bits — without this the accumulator grows
        # into a bigint of the entire stream and every shift above
        # copies it: quadratic encode time on real images
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits (T.81 F.1.2.3)
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, s: int) -> int:
    """Signed-magnitude encoding: negatives as v + 2^s - 1 (T.81 F.1.2.1)."""
    return v if v >= 0 else v + (1 << s) - 1


def encode_jpeg_gray(px: np.ndarray) -> bytes:
    """Encode an ``(h, w)`` uint8 array as a baseline JFIF grayscale
    JPEG with all-ones quantization (coefficients kept exact) and the
    standard Annex-K luminance Huffman tables. Edge blocks pad by
    replication, so tile-constant images stay tile-constant padded —
    the exact-round-trip construction the oracle query relies on."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 3:
        if px.shape[2] != 1:
            raise ValueError("encode_jpeg_gray takes a single channel")
        px = px[:, :, 0]
    h, w = px.shape
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError("bad dimensions")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]          # replicate bottom row
    padded[:, w:] = padded[:, w - 1 : w]       # replicate right column

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _M @ block @ _M.T
            q = np.rint(coef).astype(np.int64)  # quant table = all ones
            zz = q.ravel()[ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            s = _category(diff)
            code, ln = _DC_ENC[s]
            bw.put(code, ln)
            if s:
                bw.put(_amplitude(diff, s), s)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, 64):
                v = int(zz[i])
                if i > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = _AC_ENC[0xF0]  # ZRL: 16 zeros
                    bw.put(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = _AC_ENC[(run << 4) | s]
                bw.put(code, ln)
                bw.put(_amplitude(v, s), s)
                run = 0
            if last_nz < 63:
                code, ln = _AC_ENC[0x00]  # EOB
                bw.put(code, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    qt = bytes([0]) + bytes([1] * 64)  # table id 0, all ones (exact)
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00]) + bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, qt)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xC0, sof)
        + seg(0xDA, sos)
        + scan
        + b"\xff\xd9"
    )


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with FF00 unstuffing; a marker byte
    (FF followed by non-zero) ends the stream."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise EOFError
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise EOFError
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    raise EOFError  # marker: end of entropy data
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.bits(s)
    if v < (1 << (s - 1)):  # negative branch (T.81 F.2.2.1 EXTEND)
        v -= (1 << s) - 1
    return v


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:  # no JPEG Huffman code exceeds 16 bits (T.81 C.2)
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def decode_jpeg_gray(payload: bytes) -> np.ndarray | None:
    """Decode a baseline grayscale JFIF payload to an ``(h, w)`` uint8
    array, or None when the payload is not a JPEG this codec supports
    (progressive, color/subsampled, restart intervals, 16-bit quant
    tables, truncated scan — e.g. the header-only ``make_jpeg``
    fixtures). Never raises: the quarantine contract."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(data: bytes) -> np.ndarray | None:
    if data[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    h = w = 0
    comp_q = dc_id = ac_id = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return None
        # legal fill bytes: any run of 0xFF may pad before the marker
        # byte (T.81 B.1.1.2) — other encoders emit them
        while i + 1 < n and data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        if marker == 0xD9:
            return None  # EOI before SOS: no image data
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2  # TEM / RSTn: standalone, no length segment
            continue
        size = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + size]
        i += 2 + size
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables unsupported
                qtables[tq] = np.frombuffer(
                    body[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(body[j + 17 : j + 17 + cnt])
                tab = _build_decode(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                j += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc != 1:
                return None
            if body[7] != 0x11:  # sampling must be 1x1
                return None
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline SOF
        elif marker == 0xDD:
            return None  # restart intervals unsupported
        elif marker == 0xDA:  # SOS: entropy data follows
            if not h or not w or body[0] != 1:
                return None
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            return _decode_scan(
                data, i, h, w,
                qtables[comp_q], dc_tabs[dc_id], ac_tabs[ac_id],
            )
        # APPn / COM / others: skipped
    return None


def _decode_scan(
    data: bytes, pos: int, h: int, w: int,
    qt: np.ndarray, dc_tab: dict, ac_tab: dict,
) -> np.ndarray:
    r = _BitReader(data, pos)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.empty((ph, pw), dtype=np.float64)
    inv_zz = ZIGZAG  # zz[i] gives flat position of scan index i
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64, dtype=np.int64)
            s = _huff_decode(r, dc_tab)
            prev_dc += _receive_extend(r, s)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _huff_decode(r, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                if k > 63:
                    raise ValueError("AC index overflow")
                zz[k] = _receive_extend(r, sym & 0x0F)
                k += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[inv_zz] = zz * qt
            block = _M.T @ coef.reshape(8, 8) @ _M + 128.0
            out[by : by + 8, bx : bx + 8] = block
    return np.clip(np.rint(out[:h, :w]), 0, 255).astype(np.uint8)
