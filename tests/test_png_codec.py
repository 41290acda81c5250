"""PNG pixel codec tests: filter round-trips (including hand-built
Average/Paeth streams the encoder itself never emits), nearest-neighbor
resize arithmetic, and the real_resize / real_decode pixel paths e2e."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_ingestion_from_multiple_directories_linux_spark.functions.png_codec import (
    SIGNATURE,
    decode_png,
    encode_png,
    resize_nearest,
)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("ftype", [0, 1, 2])
def test_roundtrip_encoder_filters(channels, ftype):
    h, w = 13, 17
    arr = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    payload = encode_png(arr, row_filters=[ftype] * h)
    got = decode_png(payload)
    assert got is not None and got.shape == (h, w, channels)
    assert np.array_equal(got, arr)


def test_roundtrip_mixed_default_filters():
    arr = rng.integers(0, 256, size=(9, 5), dtype=np.uint8)
    got = decode_png(encode_png(arr))  # default: None then Up rows
    assert np.array_equal(got, arr[:, :, None])


def _hand_encode(arr: np.ndarray, ftype: int) -> bytes:
    """Forward-filter implemented independently of the codec (per the
    PNG spec, byte-wise) so decoder bugs can't cancel out."""
    h, w, c = arr.shape
    flat = arr.reshape(h, w * c).astype(np.int64)
    stride = w * c
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        lines.append(ftype)
        for i in range(stride):
            left = int(flat[y, i - c]) if i >= c else 0
            up = int(prior[i])
            ul = int(prior[i - c]) if i >= c else 0
            if ftype == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            lines.append((int(flat[y, i]) - pred) & 0xFF)
        prior = flat[y]

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2}[c], 0, 0, 0)
    return (SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("ftype", [3, 4])
def test_decode_average_and_paeth(channels, ftype):
    arr = rng.integers(0, 256, size=(7, 11, channels), dtype=np.uint8)
    got = decode_png(_hand_encode(arr, ftype))
    assert got is not None
    assert np.array_equal(got, arr)


def test_header_only_fixture_returns_none():
    from data_ingestion_from_multiple_directories_linux_spark.operators.multimodal import (
        make_jpeg,
        make_png,
    )

    assert decode_png(make_png(12, 34)) is None  # IDAT shorter than dims
    assert decode_png(make_jpeg(12, 34)) is None
    assert decode_png(b"") is None
    assert decode_png(b"\x89PNG\r\n\x1a\n garbage") is None


def test_resize_nearest_known_values():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8)
    # pixel-center mapping: output x∈{0,1} both sample input x=0
    assert up[0, 0] == arr[0, 0] and up[1, 1] == arr[0, 0]
    assert up[7, 7] == arr[3, 3]
    down = resize_nearest(arr, 2, 2)
    assert down.tolist() == [[5, 7], [13, 15]]  # centers of each quadrant
    same = resize_nearest(arr, 4, 4)
    assert np.array_equal(same, arr)


def test_real_resize_png_end_to_end():
    from data_ingestion_from_multiple_directories_linux_spark.operators.multimodal import (
        make_png_gradient,
        parse_image_header,
        real_resize,
    )

    src = make_png_gradient(7)  # 11x11 gradient, base 7
    out = real_resize(src, "image/png", 5, 3)
    hdr = parse_image_header(out)
    assert (hdr["format"], hdr["width"], hdr["height"]) == ("png", 5, 3)
    px = decode_png(out)
    assert px.shape == (3, 5, 1)
    # rows of the source are base+y; nearest-neighbor of 11 rows → 3
    # samples at y = floor((i+0.5)*11/3) = 1, 5, 9
    assert [int(r) for r in px[:, 0, 0]] == [7 + 1, 7 + 5, 7 + 9]
    # non-PNG payloads still refuse (JPEG needs a real codec)
    with pytest.raises(NotImplementedError):
        real_resize(b"\xff\xd8\xff\xd9", "image/jpeg", 2, 2)


def test_real_decode_pixel_features():
    from data_ingestion_from_multiple_directories_linux_spark.operators.multimodal import (
        make_png_gradient,
        real_decode,
    )

    got = real_decode(make_png_gradient(10), "image/png")
    # id=10: w=14, h=14, base=10, rows 10..23 → mean 16.5
    assert (got["width"], got["height"]) == (14, 14)
    assert got["feature"] == [16.5]
    rgb = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    got = real_decode(encode_png(rgb), "image/png")
    expect = [float(rgb[:, :, c].sum(dtype=np.int64)) / 48 for c in range(3)]
    assert got["feature"] == expect


# ---------------------------------------------------------------------------
# property-based round-trips (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def images(draw):
    h = draw(st.integers(1, 10))
    w = draw(st.integers(1, 10))
    c = draw(st.sampled_from([1, 3]))
    data = draw(
        st.lists(st.integers(0, 255), min_size=h * w * c, max_size=h * w * c)
    )
    return np.array(data, dtype=np.uint8).reshape(h, w, c)


@settings(max_examples=60, deadline=None)
@given(img=images(), data=st.data())
def test_png_roundtrip_property(img, data):
    """decode(encode(x)) == x for arbitrary images and per-row filter
    choices — the codec must be lossless whatever the filter mix."""
    h = img.shape[0]
    filters = data.draw(
        st.lists(st.sampled_from([0, 1, 2]), min_size=h, max_size=h)
    )
    assert np.array_equal(decode_png(encode_png(img, row_filters=filters)), img)


@settings(max_examples=60, deadline=None)
@given(img=images(), w2=st.integers(1, 16), h2=st.integers(1, 16))
def test_resize_nearest_property(img, w2, h2):
    """Resize output has the target shape and every pixel is an actual
    source pixel from a monotone row/column mapping."""
    out = resize_nearest(img, w2, h2)
    assert out.shape == (h2, w2, img.shape[2])
    ys = np.minimum(((np.arange(h2) + 0.5) * img.shape[0] / h2).astype(int),
                    img.shape[0] - 1)
    xs = np.minimum(((np.arange(w2) + 0.5) * img.shape[1] / w2).astype(int),
                    img.shape[1] - 1)
    assert np.array_equal(out, img[ys][:, xs])
    assert (np.diff(ys) >= 0).all() and (np.diff(xs) >= 0).all()
