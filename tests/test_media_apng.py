"""APNG (video leg) codecs: roundtrips, fdAT sequence handling, the
honest NotImplementedError boundary, and frame sampling."""

import struct
import zlib

import numpy as np
import pytest

from docs2kg_spark.operators import media


def _frames(n, h=4, w=5, seed=3):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_apng_roundtrip_multi_frame():
    f = _frames(5)
    dec = media.decode_apng_frames(media.encode_apng(f))
    assert len(dec) == 5
    for a, b in zip(f, dec):
        assert np.array_equal(a, b)


def test_apng_single_frame_and_plain_png():
    f = _frames(1)
    assert len(media.decode_apng_frames(media.encode_apng(f))) == 1
    one = media.decode_apng_frames(media.encode_png(f[0]))
    assert len(one) == 1 and np.array_equal(one[0], f[0])


def test_frame_sample_stride():
    f = _frames(6)
    p = media.encode_apng(f)
    s = media.frame_sample(p, every_k=2)
    assert len(s) == 3
    assert np.array_equal(s[0], f[0]) and np.array_equal(s[2], f[4])
    assert len(media.frame_sample(p, every_k=1)) == 6


def test_apng_rejects_subregion_frames():
    """A hand-built fcTL with a 1x1 sub-region frame must hit the
    honest NotImplementedError boundary, not silently mis-composite."""
    f = _frames(1, h=2, w=2)
    payload = bytearray(media.encode_apng(f))
    # find the fcTL chunk and corrupt its width field to 1 (sub-region)
    i = payload.find(b"fcTL")
    assert i > 0
    body_off = i + 4
    # fcTL body: seq(4) w(4) h(4) x(4) y(4)...
    struct.pack_into(">I", payload, body_off + 4, 1)
    # fix the CRC so the parser reaches the semantic check
    clen = struct.unpack_from(">I", payload, i - 4)[0]
    body = bytes(payload[i : i + 4 + clen])
    struct.pack_into(">I", payload, i + 4 + clen, zlib.crc32(body) & 0xFFFFFFFF)
    with pytest.raises(NotImplementedError):
        media.decode_apng_frames(bytes(payload))


def test_apng_fdat_sequence_numbers_strip():
    """fdAT chunks carry a 4-byte sequence prefix that must be
    stripped before inflation — a frame decoded from fdAT equals the
    same frame from IDAT."""
    f = _frames(3)
    dec = media.decode_apng_frames(media.encode_apng(f))
    assert np.array_equal(dec[1], f[1])  # frame 1 is fdAT-borne
    assert np.array_equal(dec[2], f[2])
