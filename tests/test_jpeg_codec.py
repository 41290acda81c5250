"""Pure-Python baseline JPEG codec: exactness on tile-constant images,
±1 bound on arbitrary images, quarantine contract, interop with the
marker-walking header parser, and the resize pixel path over JPEG."""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_from_multiple_directories_linux_spark.functions.jpeg_codec import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def test_tile_constant_roundtrip_exact():
    """Images constant within every 8×8 tile round-trip BIT-EXACTLY
    (all-ones quant + lone DC coefficient per block) — the invariant
    the media_pixel_stats closed-form oracle rests on."""
    rng = np.random.RandomState(11)
    for _ in range(8):
        h, w = int(rng.randint(1, 45)), int(rng.randint(1, 65))
        tiles = rng.randint(0, 256, (-(-h // 8), -(-w // 8))).astype(np.uint8)
        img = np.kron(tiles, np.ones((8, 8), np.uint8))[:h, :w]
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert out is not None and out.dtype == np.uint8
        assert np.array_equal(out, img)


def test_arbitrary_roundtrip_within_bound():
    """Full AC Huffman path (runs, ZRL, EOB, byte stuffing) via
    hypothesis-style random images: reconstruction within the codec's
    worst-case rounding bound. Coefficient rounding injects ≤0.5 per
    coefficient; through the IDCT basis that compounds to ≤
    0.5·(Σ|basis|)² + 0.5 ≈ 3.8, so ±4 is the safe assertion (observed
    max over large sweeps: 2 — e.g. a 10×35 image ~750 draws into
    RandomState(0); ±1 only holds for tile-constant images, where the
    closed-form oracle lives)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        h=st.integers(1, 40),
        w=st.integers(1, 40),
    )
    def run(seed, h, w):
        img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert out is not None and out.shape == (h, w)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4

    run()


def test_gradient_rows_roundtrip_exact():
    """The media_pixel_stats JPEG construction specifically: block-row
    gradient (value = base + y // 8) is tile-constant, hence exact."""
    for doc_id in (1, 3, 17, 199, 4001):
        w, h = 4 + doc_id % 60, 4 + doc_id % 40
        base = doc_id % 200
        img = (base + np.arange(h) // 8).astype(np.uint8)[:, None]
        img = np.broadcast_to(img, (h, w)).copy()
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert np.array_equal(out, img)
        assert int(out.min()) == base
        assert int(out.max()) == base + (h - 1) // 8


def test_decode_quarantines_unsupported():
    """None (never an exception) for: empty, truncated, header-only
    fixtures, progressive SOF2, restart intervals."""
    from data_ingestion_from_multiple_directories_linux_spark.operators.multimodal import (
        make_jpeg,
    )

    assert decode_jpeg_gray(b"") is None
    assert decode_jpeg_gray(b"\xff\xd8") is None
    assert decode_jpeg_gray(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_gray(make_jpeg(20, 10)) is None  # no scan data
    good = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    # flip the SOF0 marker to SOF2 (progressive): must bail, not crash
    i = bytes(good).find(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2 :]
    assert decode_jpeg_gray(bytes(prog)) is None
    # truncated scan
    assert decode_jpeg_gray(bytes(good[: len(good) // 2])) is None


def test_decode_tolerates_fill_bytes_and_rst_markers():
    """Spec conformance (review finding): foreign encoders may pad with
    0xFF fill bytes before a marker (T.81 B.1.1.2) and emit standalone
    TEM markers — the walk must skip them, not desynchronize and
    wrongly quarantine a supported baseline payload."""
    img = np.full((8, 8), 77, np.uint8)
    data = encode_jpeg_gray(img)
    # inject a fill byte + a standalone TEM marker before the DQT segment
    i = data.find(b"\xff\xdb")
    assert i > 0
    padded = data[:i] + b"\xff" + b"\xff\x01" + data[i:]
    out = decode_jpeg_gray(padded)
    assert out is not None and np.array_equal(out, img)


def test_header_parser_interop():
    from data_ingestion_from_multiple_directories_linux_spark.operators.multimodal import (
        parse_image_header,
    )

    hdr = parse_image_header(encode_jpeg_gray(np.zeros((10, 20), np.uint8)))
    assert hdr == {"format": "jpeg", "width": 20, "height": 10}


def test_real_resize_jpeg_end_to_end():
    """real_resize now covers JPEG: decode (Huffman+IDCT) →
    nearest-neighbor → re-encode as JPEG; output parses and decodes to
    the expected resampled pixels (tile-constant source keeps the check
    exact end to end)."""
    from data_ingestion_from_multiple_directories_linux_spark.operators.multimodal import (
        parse_image_header,
        real_resize,
    )

    tiles = np.array([[10, 200], [90, 250]], dtype=np.uint8)
    img = np.kron(tiles, np.ones((8, 8), np.uint8))  # 16×16, 4 tiles
    # upsample ×2: quadrants become 16×16 constants, so the re-encoded
    # JPEG is tile-constant again and the whole check stays bit-exact
    out = real_resize(encode_jpeg_gray(img), "image/jpeg", 32, 32)
    hdr = parse_image_header(out)
    assert (hdr["width"], hdr["height"]) == (32, 32)
    px = decode_jpeg_gray(out)
    expect = np.kron(tiles, np.ones((16, 16), np.uint8))
    assert np.array_equal(px, expect)
    with pytest.raises(NotImplementedError):
        real_resize(b"\xff\xd8\xff\xd9", "image/jpeg", 2, 2)


def test_bitwriter_accumulator_stays_bounded():
    """The entropy writer must drop bits once emitted (review finding):
    without the mask the accumulator bigint holds the whole stream and
    every put() copies it — quadratic encode on real images."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.jpeg_codec import (
        _BitWriter,
    )

    bw = _BitWriter()
    for _ in range(20_000):
        bw.put(0x2A, 7)
    assert bw.acc.bit_length() <= 8
    assert len(bw.flush()) >= 20_000 * 7 // 8


def test_zero_width_sof_quarantined():
    """A SOF0 declaring width 0 must yield None (the quarantine
    contract), not an empty (h, 0) array that divides by zero
    downstream (review finding)."""
    data = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) height(2) width(2) — zero the width
    data[i + 7 : i + 9] = b"\x00\x00"
    assert decode_jpeg_gray(bytes(data)) is None
