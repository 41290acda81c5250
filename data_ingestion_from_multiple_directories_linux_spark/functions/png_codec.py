"""Pure-Python PNG pixel codec: stdlib ``zlib`` + numpy unfiltering.

PNG image data is zlib-deflated scanlines, each prefixed by one filter
byte (types 0-4: None/Sub/Up/Average/Paeth). Nothing beyond the stdlib
is needed to decode it, so the multimodal pipeline's pixel-level
operators (channel statistics, nearest-neighbor resize) are fully real
for the PNG path — no codec library, no stub.

Supported: 8-bit depth, color types 0 (grayscale, 1 channel) and
2 (truecolor RGB, 3 channels), non-interlaced — the shapes the synthetic
corpus and the common ML-ingest path use. Anything else returns None
(callers quarantine upstream, same contract as the header parsers in
``operators.multimodal``).

Performance shape (this code runs inside Arrow-batched ``mapInPandas``
workers): the two hot filters are vectorized — Up is one numpy row add,
Sub is a per-channel prefix sum (mod 256 distributes over addition, so
``cumsum % 256`` is exact) — and Average/Paeth fall back to a per-pixel
loop only when a payload actually uses them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color_type → channel count (8-bit only)
_CHANNELS = {0: 1, 2: 3}


def _chunks(payload: bytes):
    i, n = 8, len(payload)
    while i + 8 <= n:
        size = int.from_bytes(payload[i : i + 4], "big")
        tag = payload[i + 4 : i + 8]
        yield tag, payload[i + 8 : i + 8 + size]
        i += 12 + size  # len + tag + data + crc


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray | None:
    """Decode a PNG payload to an ``(height, width, channels)`` uint8
    array, or None if the payload is not a PNG this codec supports
    (wrong signature, non-8-bit, palette/alpha, interlaced, or an IDAT
    stream shorter than the declared dimensions — e.g. the header-only
    fixtures :func:`operators.multimodal.make_png` builds)."""
    if payload[:8] != SIGNATURE:
        return None
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    for tag, data in _chunks(payload):
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if width is None or bit_depth != 8 or interlace != 0:
        return None
    channels = _CHANNELS.get(color_type)
    if channels is None or width == 0 or height == 0:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) < height * (1 + stride):
        return None  # header-only / truncated fixture

    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        base = y * (1 + stride)
        ftype = raw[base]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1)
        if ftype == 0:  # None
            recon = row.copy()
        elif ftype == 2:  # Up — one vectorized add
            recon = row + prior  # uint8 add wraps mod 256
        elif ftype == 1:  # Sub — per-channel prefix sum, mod-exact
            recon = (
                np.cumsum(row.reshape(width, channels), axis=0, dtype=np.uint64)
                % 256
            ).astype(np.uint8).reshape(stride)
        else:  # Average / Paeth — sequential dependency, per-pixel
            recon = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(recon[i - channels]) if i >= channels else 0
                up = int(prior[i])
                ul = int(prior[i - channels]) if i >= channels else 0
                if ftype == 3:
                    pred = (left + up) // 2
                elif ftype == 4:
                    pred = _paeth(left, up, ul)
                else:
                    return None  # invalid filter type
                recon[i] = (row[i] + pred) & 0xFF
        out[y] = recon
        prior = recon
    return out.reshape(height, width, channels)


def encode_png(
    pixels: np.ndarray, row_filters: list[int] | None = None
) -> bytes:
    """Encode an ``(h, w)`` or ``(h, w, c)`` uint8 array (c ∈ {1, 3}) as
    a well-formed PNG. ``row_filters`` picks the filter byte per
    scanline (default: 0 for the first row, 2/Up for the rest — cheap
    and forces a real unfilter pass on decode); types 0/1/2 supported."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2}[c]
    flat = arr.reshape(h, w * c)
    if row_filters is None:
        row_filters = [0] + [2] * (h - 1)
    lines = bytearray()
    prior = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        recon = flat[y]
        ftype = row_filters[y]
        if ftype == 0:
            enc = recon
        elif ftype == 2:
            enc = recon - prior  # uint8 wraps mod 256
        elif ftype == 1:
            shifted = np.zeros_like(recon)
            shifted[c:] = recon[:-c]
            enc = recon - shifted
        else:
            raise ValueError(f"encoder supports filters 0/1/2, got {ftype}")
        lines.append(ftype)
        lines.extend(enc.tobytes())
        prior = recon

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure numpy index
    arithmetic, the standard pixel-center mapping."""
    arr = np.asarray(pixels)
    h_in, w_in = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h_in / height).astype(np.int64), h_in - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w_in / width).astype(np.int64), w_in - 1)
    return arr[ys][:, xs]
