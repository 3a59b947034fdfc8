"""Pure-stdlib media codecs (operators/media.py): round-trips, format
dispatch, the honest NotImplementedError boundary, and the Spark-side
real-decode path (decode=media_features through extract_features).

The reference side-outputs embedded ebook assets
(digitization/native/ebook.py:222-238); these tests make that decode
boundary REAL for uncompressed/deflate formats without media libs.
"""

import struct
import zlib

import numpy as np
import pytest

from docs2kg_spark.operators import media


def _grad(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (6, 8), (4, 3)])  # w=5,3 → row padding
def test_bmp_roundtrip(h, w):
    px = _grad(h, w, seed=h * 10 + w)
    assert np.array_equal(media.decode_bmp(media.encode_bmp(px)), px)


def test_bmp_top_down_and_32bit():
    """Hand-craft a top-down 32-bit BMP (negative height, BGRA rows,
    no padding needed) and check orientation + alpha drop."""
    h, w = 2, 2
    px = np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8)
    body = bytearray()
    for y in range(h):  # top-down: natural order
        for x in range(w):
            r, g, b = px[y, x]
            body += bytes([b, g, r, 255])  # BGRA
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(body), 0, 0, 0, 0)
    assert np.array_equal(media.decode_bmp(hdr + info + bytes(body)), px)


def test_bmp_rejects_compressed():
    hdr = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 1, 0, 0, 0, 0, 0)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        media.decode_bmp(hdr + info)


# ---------------------------------------------------------------------------
# PPM / PGM
# ---------------------------------------------------------------------------


def test_ppm_roundtrip():
    px = _grad(4, 7, seed=3)
    assert np.array_equal(media.decode_pnm(media.encode_ppm(px)), px)


def test_ppm_header_comment():
    px = _grad(2, 3, seed=5)
    payload = b"P6\n# a comment line\n3 2\n255\n" + px.tobytes()
    assert np.array_equal(media.decode_pnm(payload), px)


def test_pgm_gray_replicates():
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    payload = b"P5\n3 2\n255\n" + gray.tobytes()
    out = media.decode_pnm(payload)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_roundtrip():
    px = _grad(5, 6, seed=11)
    assert np.array_equal(media.decode_png(media.encode_png(px)), px)


def _png_with_filter(px, f):
    """Encode H×W×3 applying row filter `f` to every row (per PNG spec),
    so decode must invert that exact filter."""
    h, w, _ = px.shape
    nch, stride = 3, w * 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int32)
        out = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = row[x - nch] if x >= nch else 0
            up = prev[x]
            ul = prev[x - nch] if x >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                pred = media._paeth(int(left), int(up), int(ul))
            out[x] = (row[x] - pred) & 0xFF
        raw += bytes([f]) + bytes(out.astype(np.uint8).tobytes())
        prev = row
    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        media._PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_all_filters_inverted(f):
    px = _grad(4, 5, seed=20 + f)
    assert np.array_equal(media.decode_png(_png_with_filter(px, f)), px)


def test_png_gray_and_rgba():
    # gray (color type 0)
    h, w = 2, 3
    gray = np.arange(6, dtype=np.uint8).reshape(h, w)
    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(h))
    payload = (
        media._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = media.decode_png(payload)
    assert np.array_equal(out[:, :, 0], gray) and np.array_equal(out[:, :, 2], gray)
    # RGBA (color type 6): alpha dropped
    px = _grad(2, 2, seed=9)
    rgba = np.concatenate([px, np.full((2, 2, 1), 128, np.uint8)], axis=2)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(2))
    payload = (
        media._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(media.decode_png(payload), px)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_roundtrip_16bit_stereo():
    rng = np.random.RandomState(2)
    samples = rng.randint(-32768, 32767, size=200, dtype=np.int16)
    sr, nch, out = media.decode_wav(media.encode_wav(samples, 22050, 2))
    assert (sr, nch) == (22050, 2)
    assert np.array_equal(out, samples.astype(np.int32))


def test_wav_8bit():
    data = bytes([0, 128, 255])
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8)
    dat = struct.pack("<4sI", b"data", len(data)) + data
    # odd-size data chunk → pad byte per RIFF spec
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(dat) + 1, b"WAVE") + fmt + dat + b"\x00"
    sr, nch, out = media.decode_wav(payload)
    assert sr == 8000 and nch == 1
    assert list(out) == [(-128) << 8, 0, 127 << 8]


def test_wav_rejects_non_pcm():
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 3, 1, 8000, 32000, 4, 32)  # IEEE float
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt), b"WAVE") + fmt
    with pytest.raises(NotImplementedError):
        media.decode_wav(payload)


# ---------------------------------------------------------------------------
# dispatch + featurizer + Spark path
# ---------------------------------------------------------------------------


def test_sniff_and_dispatch():
    px = _grad(2, 2)
    assert media.sniff(media.encode_bmp(px)) == "bmp"
    assert media.sniff(media.encode_png(px)) == "png"
    assert media.sniff(media.encode_ppm(px)) == "pnm"
    assert media.sniff(media.encode_wav(np.zeros(4, np.int16))) == "wav"
    assert media.sniff(b"\xff\xd8\xff\xe0 jpeg") == "jpeg"  # real since operators/jpeg.py
    with pytest.raises(ValueError):
        media.media_decode(b"\xff\xd8\xff\xe0 jpeg")  # truncated stream, not a codec gap
    with pytest.raises(NotImplementedError):
        media.media_decode(b"\x00\x01 not a known container")


def test_media_features_image_and_audio():
    from docs2kg_spark.operators.multimodal import FEATURE_DIM

    px = np.full((4, 5, 3), 10, np.uint8)
    px[:, :, 1] = 20
    f = media.media_features(media.encode_bmp(px))
    assert len(f) == FEATURE_DIM
    assert f[:3] == [5.0, 4.0, 3.0]
    assert f[3] == pytest.approx((10 + 20 + 10) / 3)
    assert f[5:8] == [10.0, 20.0, 10.0]

    tone = (np.sin(np.arange(100)) * 1000).astype(np.int16)
    fa = media.media_features(media.encode_wav(tone, 16000, 1))
    assert fa[0] == 16000.0 and fa[1] == 1.0 and fa[2] == 100.0
    assert fa[3] > 0 and fa[4] <= 1000.0


def test_extract_features_real_decoder_spark(spark):
    """The injection seam carries the REAL featurizer through the Arrow
    mapInPandas path: encode known images driver-side, decode on
    executors, check exact dims/means."""
    from docs2kg_spark.operators.multimodal import extract_features

    rows = []
    for i in range(6):
        px = np.full((2 + i, 3, 3), i * 10, np.uint8)
        enc = (media.encode_bmp, media.encode_png, media.encode_ppm)[i % 3]
        rows.append((f"a{i}", "image", bytearray(enc(px)), {}))
    assets = spark.createDataFrame(
        rows, "asset_id string, kind string, payload binary, meta map<string,string>"
    )
    out = {
        r["asset_id"]: r
        for r in extract_features(assets, decode=media.media_features).collect()
    }
    assert len(out) == 6
    for i in range(6):
        f = out[f"a{i}"]["features"]
        assert f[0] == 3.0 and f[1] == float(2 + i)
        assert f[3] == pytest.approx(float(i * 10), abs=1e-4)


def test_real_decode_query_matches_twin(spark):
    """Local gate replica for multimodal_real_decode at sf0.001."""
    import duckdb

    from docs2kg_spark.queries import ORACLE_SQL, SPARK_QUERIES

    df = SPARK_QUERIES["multimodal_real_decode"](spark, "/root/testdata/sf0.001")
    got = sorted(tuple(r) for r in df.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    exp = sorted(tuple(r) for r in con.execute(ORACLE_SQL["multimodal_real_decode"]).fetchall())
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "fmt", "w", "h", "sum_r", "sum_g", "sum_b"
    ]
    assert got == exp
