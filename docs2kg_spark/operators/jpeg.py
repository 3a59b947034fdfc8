"""Baseline JPEG (ITU-T T.81) encode/decode with numpy + stdlib only.

The last "needs PIL/ffmpeg" claim of the media family, removed: this
module implements the full baseline sequential pipeline — JFIF marker
parse, DQT/DHT tables, Huffman entropy coding with byte-stuffing,
DC-prediction, zigzag, dequantization, 8×8 IDCT (exact DCT-II matrix),
YCbCr↔RGB — from the public spec.  The encoder emits 4:4:4 baseline
JPEGs with the Annex-K example Huffman tables; the decoder handles
4:4:4 and 2×2-subsampled (4:2:0) baseline streams.  Progressive
(SOF2), arithmetic coding, and restart-interval streams raise
NotImplementedError — honest boundaries, not silent corruption.

JPEG is lossy, so there is no bit-exact roundtrip to oracle in SQL;
the tests pin (a) decode determinism, (b) reconstruction error bounds
on smooth images, and (c) exact agreement of decode(encode(x)) with an
independent numpy IDCT of the quantized coefficients.
"""

from __future__ import annotations

import struct

import numpy as np

# standard luminance / chrominance quantization tables (T.81 Annex K)
QL = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex-K example Huffman tables: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _dct_matrix() -> np.ndarray:
    n = 8
    d = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            d[k, i] = np.cos((2 * i + 1) * k * np.pi / (2 * n))
    d *= np.sqrt(2.0 / n)
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d


_D = _dct_matrix()


def _huff_codes(bits, values):
    """T.81 C.2: canonical code assignment → {value: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lut(bits, values):
    """Decoder map {(length, code): value}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v):
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(pixels: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """H×W×3 uint8 RGB → baseline JFIF bytes; subsample=True emits a
    2×2-subsampled (4:2:0) stream with 16×16 interleaved MCUs (the
    common camera output shape), exercising the decoder's upsampling
    path."""
    h, w, _ = pixels.shape
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QL * scale + 50) // 100, 1, 255)
    qc = np.clip((QC * scale + 50) // 100, 1, 255)

    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128

    dc_l, ac_l = _huff_codes(*_DC_L), _huff_codes(*_AC_L)
    dc_c, ac_c = _huff_codes(*_DC_C), _huff_codes(*_AC_C)
    bw_ = _BitWriter()
    prev_dc = [0, 0, 0]

    def emit_block(block, ci):
        q = ql if ci == 0 else qc
        dct = _D @ block @ _D.T
        coef = np.round(dct / q).astype(np.int64)
        zz = coef.flatten()[_ZZ]
        dch, ach = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
        diff = int(zz[0]) - prev_dc[ci]
        prev_dc[ci] = int(zz[0])
        size, bits = _magnitude(diff)
        code, ln = dch[size]
        bw_.write(code, ln)
        if size:
            bw_.write(bits, size)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                if run == 16:
                    code, ln = ach[0xF0]  # ZRL
                    bw_.write(code, ln)
                    run = 0
                continue
            size, bits = _magnitude(v)
            code, ln = ach[(run << 4) | size]
            bw_.write(code, ln)
            bw_.write(bits, size)
            run = 0
        if last_nz < 63:
            code, ln = ach[0x00]  # EOB
            bw_.write(code, ln)

    if not subsample:
        bh, bw2 = -(-h // 8) * 8, -(-w // 8) * 8
        planes = [
            np.pad(p, ((0, bh - h), (0, bw2 - w)), mode="edge") - 128.0
            for p in (y, cb, cr)
        ]
        for by in range(0, bh, 8):
            for bx in range(0, bw2, 8):
                for ci, plane in enumerate(planes):
                    emit_block(plane[by : by + 8, bx : bx + 8], ci)
        samp = ((1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1))
    else:
        bh, bw2 = -(-h // 16) * 16, -(-w // 16) * 16
        yp = np.pad(y, ((0, bh - h), (0, bw2 - w)), mode="edge") - 128.0
        cbp = np.pad(cb, ((0, bh - h), (0, bw2 - w)), mode="edge")
        crp = np.pad(cr, ((0, bh - h), (0, bw2 - w)), mode="edge")
        # 2x2 mean-downsample chroma
        cbs = cbp.reshape(bh // 2, 2, bw2 // 2, 2).mean(axis=(1, 3)) - 128.0
        crs = crp.reshape(bh // 2, 2, bw2 // 2, 2).mean(axis=(1, 3)) - 128.0
        for my in range(0, bh, 16):
            for mx in range(0, bw2, 16):
                for v in range(2):
                    for hh in range(2):
                        emit_block(
                            yp[my + 8 * v : my + 8 * v + 8, mx + 8 * hh : mx + 8 * hh + 8],
                            0,
                        )
                cy, cx = my // 2, mx // 2
                emit_block(cbs[cy : cy + 8, cx : cx + 8], 1)
                emit_block(crs[cy : cy + 8, cx : cx + 8], 2)
        samp = ((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1))
    bw_.flush()

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid, table):
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in table.flatten()[_ZZ]))

    def dht(cls, tid, spec):
        bits, values = spec
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values))

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql) + dqt(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, sfac, tq in samp:
        sof += bytes([cid, sfac, tq])
    out += seg(0xFFC0, sof)
    out += dht(0, 0, _DC_L) + dht(1, 0, _AC_L) + dht(0, 1, _DC_C) + dht(1, 1, _AC_C)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw_.out
    out += b"\xFF\xD9"
    return bytes(out)


class _BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker: treat as end of entropy data (pad zeros)
                    self.pos = len(self.data)
                    b = 0
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self):
        self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, lut):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in lut:
                return lut[(length, code)]
        raise ValueError("bad Huffman code")


def _extend(bits, size):
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → H×W×3 uint8 RGB.  Supports 1- or
    3-component baseline streams, 4:4:4 and 2×2 (4:2:0) sampling.
    Progressive/arithmetic/restart streams raise NotImplementedError."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    i = 2
    qt = {}
    huff = {}
    comps = None
    h = w = None
    entropy = None
    scan = None
    while i < len(payload):
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        ln = struct.unpack_from(">H", payload, i)[0]
        body = payload[i + 2 : i + ln]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZZ] = np.frombuffer(body, np.uint8, 64, j + 1)
                qt[tq] = tab.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                values = list(body[j + 17 : j + 17 + n])
                huff[(cls, tid)] = _huff_lut(bits, values)
                j += 17 + n
        elif marker == 0xC0:
            _, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 15, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"cs": cs, "td": tabs >> 4, "ta": tabs & 15})
            entropy = payload[i + ln :]
            break
        i += ln
    if comps is None or entropy is None:
        raise ValueError("missing SOF/SOS")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["hs"], mcuy * 8 * c["vs"]
        planes.append(np.zeros((ph, pw)))
    br = _BitReader(entropy)
    prev_dc = [0] * len(comps)
    by_comp = {s["cs"]: s for s in scan}
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                s = by_comp[c["id"]]
                dlut, alut = huff[(0, s["td"])], huff[(1, s["ta"])]
                q = qt[c["tq"]]
                for v in range(c["vs"]):
                    for hh in range(c["hs"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = br.read_huff(dlut)
                        diff = _extend(br.read_bits(size), size)
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_huff(alut)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 15
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[_ZZ] = zz
                        block = (coef.reshape(8, 8) * q).astype(np.float64)
                        px = _D.T @ block @ _D + 128.0
                        y0 = (my * c["vs"] + v) * 8
                        x0 = (mx * c["hs"] + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    # upsample to full size
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
