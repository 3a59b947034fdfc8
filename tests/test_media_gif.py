"""GIF/LZW codec: roundtrips, real compression, sub-block
reassembly, and the honest interlace boundary."""

import struct

import numpy as np
import pytest

from docs2kg_spark.operators import media


def _lum(px):
    return (
        (px[:, :, 0].astype(np.uint32) * 299
         + px[:, :, 1].astype(np.uint32) * 587
         + px[:, :, 2].astype(np.uint32) * 114) // 1000
    ).astype(np.uint8)


def test_gif_roundtrip_luminance():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(9, 14, 3), dtype=np.uint8)
    dec = media.decode_gif(media.encode_gif(px))
    gray = _lum(px)
    for c in range(3):
        assert np.array_equal(dec[:, :, c], gray)


def test_lzw_actually_compresses_and_grows_codes():
    """A long repetitive stream must compress far below raw size and
    force the code width past 9 bits (table growth path)."""
    idx = ([7] * 500 + [3] * 500) * 8  # 8000 symbols
    enc = media._lzw_encode(idx, 8)
    assert len(enc) < len(idx) // 4
    assert media._lzw_decode(enc, 8) == idx


def test_lzw_table_reset_at_4096():
    """A stream long and varied enough to exhaust the 12-bit table
    exercises the clear/re-init path on both sides."""
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 256, size=30000).tolist()
    enc = media._lzw_encode(idx, 8)
    assert media._lzw_decode(enc, 8) == idx


def test_gif_subblock_reassembly():
    """>255-byte LZW streams split across sub-blocks must reassemble."""
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(40, 40, 3), dtype=np.uint8)  # big stream
    dec = media.decode_gif(media.encode_gif(px))
    assert np.array_equal(dec[:, :, 0], _lum(px))


def test_gif_rejects_interlaced():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(media.encode_gif(px))
    i = 13 + 768  # header + logical screen descriptor + 256-entry palette
    assert payload[i] == 0x2C  # image descriptor
    payload[i + 9] |= 0x40  # set interlace flag
    with pytest.raises(NotImplementedError):
        media.decode_gif(bytes(payload))


def test_gif_sniff_and_dispatch():
    px = np.full((3, 3, 3), 42, dtype=np.uint8)
    g = media.encode_gif(px)
    assert media.sniff(g) == "gif"
    assert media.media_decode(g).shape == (3, 3, 3)
    f = media.media_features(g)
    assert f[0] == 3.0 and f[1] == 3.0  # w, h
