"""Baseline JPEG codec (operators/jpeg.py): reconstruction bounds,
determinism, 4:2:0 interleave, byte stuffing, honest boundaries."""

import struct

import numpy as np
import pytest

from docs2kg_spark.operators import jpeg, media


def _gradient(h, w):
    ys, xs = np.mgrid[0:h, 0:w]
    return np.stack([50 + 2 * xs + ys, 80 + xs + 2 * ys, 120 + xs], axis=2).astype(
        np.uint8
    )


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_gradient_reconstruction(subsample):
    """Smooth content reconstructs within a few counts at q90 — the
    DCT/quant/Huffman chain is actually working, not passing bytes."""
    px = _gradient(26, 37)
    data = jpeg.encode_jpeg(px, quality=90, subsample=subsample)
    assert len(data) < px.nbytes // 2  # real compression
    dec = jpeg.decode_jpeg(data)
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 4


def test_jpeg_decode_is_deterministic():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(16, 21, 3), dtype=np.uint8)
    data = jpeg.encode_jpeg(px, quality=75)
    a, b = jpeg.decode_jpeg(data), jpeg.decode_jpeg(data)
    assert np.array_equal(a, b)


def test_jpeg_byte_stuffing_roundtrip():
    """A uniform mid-gray image produces long runs whose entropy bytes
    often hit 0xFF — the stuffing path must round-trip."""
    px = np.full((32, 32, 3), 200, dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=95))
    assert np.abs(dec.astype(int) - 200).max() <= 2


def test_jpeg_quality_monotone():
    """Lower quality → smaller file (on non-trivial content)."""
    rng = np.random.RandomState(1)
    px = rng.randint(0, 256, size=(24, 24, 3), dtype=np.uint8)
    hi = len(jpeg.encode_jpeg(px, quality=95))
    lo = len(jpeg.encode_jpeg(px, quality=20))
    assert lo < hi


def test_jpeg_rejects_progressive():
    px = _gradient(8, 8)
    data = bytearray(jpeg.encode_jpeg(px))
    i = data.find(b"\xFF\xC0")
    assert i > 0
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(data))


def test_jpeg_rejects_restart_interval():
    px = _gradient(8, 8)
    data = bytearray(jpeg.encode_jpeg(px))
    i = data.find(b"\xFF\xDA")
    dri = b"\xFF\xDD" + struct.pack(">HH", 4, 8)
    data[i:i] = dri
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(data))


def test_jpeg_media_dispatch():
    px = _gradient(10, 10)
    data = jpeg.encode_jpeg(px)
    assert media.sniff(data) == "jpeg"
    dec = media.media_decode(data)
    assert dec.shape == (10, 10, 3)
    f = media.media_features(data)
    assert (f[0], f[1]) == (10.0, 10.0)
