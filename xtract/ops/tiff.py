"""TIFF codec, pure stdlib + numpy — completes the reference-parity
image ingest set: the reference engine's image layer (leptonica,
behind src/api.rs:1196-1239 set_image) reads BMP/PNG/JPEG/GIF/TIFF;
with the first four landed (`ops/multimodal`, `ops/png`, `ops/jpeg`,
`ops/gif`) TIFF was the remaining format taking the
``unsupported_codec`` path.

Decoder: both byte orders (II/MM), baseline IFD walk (width/length/
bits/compression/photometric/strips/samples/colormap/predictor/extra
samples), strip assembly, compressions 1 (none), 5 (TIFF-variant LZW
— MSB-first packing with EARLY code-width change at 2^n−1, unlike
GIF's late change), 8/32946 (zlib deflate) and 32773 (PackBits),
horizontal-differencing predictor 2, photometrics 0/1 (gray, incl.
white-is-zero inversion), 2 (RGB, + associated alpha composited over
white), 3 (palette via 16-bit ColorMap), 1-bit bilevel.  Output is
(h, w, 3) uint8 RGB like every sibling codec; corrupt streams raise
``ValueError`` → per-row ``status='decode_error'``.

Encoder: single-strip II TIFF (gray / RGB / RGBA / palette) with
selectable compression (none / LZW / PackBits / deflate) and optional
predictor — real decodable fixtures for every decoder path.

Specification-driven (TIFF 6.0 specification, public).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

TIFF_SIGS = (b"II*\x00", b"MM\x00*")


# ---------------------------------------------------------------------------
# TIFF LZW (MSB-first, early change) and PackBits
# ---------------------------------------------------------------------------

class _MSBReader:
    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ValueError("tiff: truncated LZW stream")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.bitpos & 7)))
                            & 1)
            self.bitpos += 1
        return v


def tiff_lzw_decode(data: bytes, n_expected: int) -> bytes:
    """TIFF LZW → bytes.  Clear=256, EOI=257, 9-bit start, EARLY
    code-width change (grow when next free code == 2^width − 1)."""
    CLEAR, EOI = 256, 257
    rdr = _MSBReader(data)
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    prev: int | None = None
    out = bytearray()
    while len(out) < n_expected:
        code = rdr.read(width)
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("tiff: bad first LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("tiff: LZW code out of range")
            if len(table) < 4096:
                table.append(table[prev] + entry[:1])
                if len(table) == (1 << width) - 1 and width < 12:
                    width += 1
        out += entry
        prev = code
    if len(out) < n_expected:
        raise ValueError("tiff: LZW stream ended early")
    return bytes(out[:n_expected])


class _MSBWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | v
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def tiff_lzw_encode(data: bytes) -> bytes:
    """Bytes → TIFF LZW (early-change mirror of the decoder)."""
    CLEAR, EOI = 256, 257
    w = _MSBWriter()

    def reset():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = reset()
    w.write(CLEAR, width)
    buf = b""
    for b in data:
        nxt = buf + bytes([b])
        if nxt in table:
            buf = nxt
            continue
        w.write(table[buf], width)
        table[nxt] = next_code
        next_code += 1
        # "early change": the decoder grows at table == 2^w − 1, the
        # encoder at 2^w — the one-entry offset compensates the
        # decoder's one-add lag (the libtiff convention)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # keep clear of the 12-bit ceiling
            w.write(CLEAR, width)
            table, next_code, width = reset()
        buf = nxt[-1:]
    if buf:
        w.write(table[buf], width)
    w.write(EOI, width)
    return w.flush()


def packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n_expected and i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(data):
                raise ValueError("tiff: truncated PackBits literal")
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("tiff: truncated PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop
    if len(out) < n_expected:
        raise ValueError("tiff: PackBits ended early")
    return bytes(out[:n_expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 1 < n and data[i + 1] == data[i]
                        and i + 2 < n and data[i + 2] == data[i])):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, bo: str):
    if len(data) < 8:
        raise ValueError("tiff: truncated header")
    (off,) = struct.unpack(bo + "I", data[4:8])
    if off + 2 > len(data):
        raise ValueError("tiff: bad IFD offset")
    (count,) = struct.unpack(bo + "H", data[off:off + 2])
    tags: dict[int, list] = {}
    for i in range(count):
        p = off + 2 + 12 * i
        if p + 12 > len(data):
            raise ValueError("tiff: truncated IFD")
        tag, typ, n = struct.unpack(bo + "HHI", data[p:p + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * n
        if total <= 4:
            raw = data[p + 8:p + 8 + total]
        else:
            (voff,) = struct.unpack(bo + "I", data[p + 8:p + 12])
            raw = data[voff:voff + total]
        if len(raw) != total:
            raise ValueError("tiff: truncated tag data")
        if typ in (1, 2):
            vals = list(raw)
        elif typ == 3:
            vals = list(struct.unpack(bo + f"{n}H", raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{n}I", raw))
        else:  # RATIONAL
            nums = struct.unpack(bo + f"{2 * n}I", raw)
            vals = [nums[2 * j] / max(nums[2 * j + 1], 1)
                    for j in range(n)]
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → (h, w, 3) uint8 RGB (first IFD)."""
    if data[:4] not in TIFF_SIGS:
        raise ValueError("not a TIFF payload")
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise ValueError(f"tiff: missing required tag {e}")
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * spp)
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    rows_per_strip = tags.get(278, [h])[0] or h
    predictor = tags.get(317, [1])[0]
    if w == 0 or h == 0 or spp == 0:
        raise ValueError("tiff: zero dimension")
    if len(set(bits)) != 1:
        raise ValueError("tiff: mixed bits per sample")
    bps = bits[0]
    if bps not in (1, 8):
        raise NotImplementedError(f"tiff: {bps}-bit samples unsupported")
    if bps == 1 and spp != 1:
        raise ValueError("tiff: 1-bit with multiple samples")
    row_bytes = (w * spp * bps + 7) // 8

    raw = bytearray()
    remaining = h
    for soff, scnt in zip(offsets, counts):
        strip = data[soff:soff + scnt]
        if len(strip) != scnt:
            raise ValueError("tiff: truncated strip")
        nrows = min(rows_per_strip, remaining)
        remaining -= nrows
        need = nrows * row_bytes
        if comp == 1:
            if len(strip) < need:
                raise ValueError("tiff: short uncompressed strip")
            raw += strip[:need]
        elif comp == 5:
            raw += tiff_lzw_decode(strip, need)
        elif comp in (8, 32946):
            try:
                d = zlib.decompress(strip)
            except zlib.error as e:
                raise ValueError(f"tiff: inflate failed ({e})")
            if len(d) < need:
                raise ValueError("tiff: short deflate strip")
            raw += d[:need]
        elif comp == 32773:
            raw += packbits_decode(strip, need)
        else:
            raise NotImplementedError(
                f"tiff: compression {comp} unsupported")
    if len(raw) != h * row_bytes:
        raise ValueError("tiff: strip payload size mismatch")
    arr = np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes)

    if bps == 1:
        bits_arr = np.unpackbits(arr, axis=1)[:, :w]
        g = (bits_arr * 255).astype(np.uint8)
        if photo == 0:  # white-is-zero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)

    px = arr.reshape(h, w, spp)
    if predictor == 2:
        px = np.cumsum(px.astype(np.uint16), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"tiff: predictor {predictor}")

    if photo in (0, 1):
        g = px[:, :, 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photo == 2:
        if spp < 3:
            raise ValueError("tiff: RGB needs 3 samples")
        rgb = px[:, :, :3]
        if spp >= 4:  # straight alpha → composite over white
            # (sibling-codec rule; ExtraSamples=2 unassociated)
            a = px[:, :, 3].astype(np.int32)[..., None]
            rgb = ((rgb.astype(np.int32) * a + 255 * (255 - a) + 127)
                   // 255).astype(np.uint8)
        return np.ascontiguousarray(rgb)
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("tiff: palette image without ColorMap")
        lut = (np.array(cmap[:3 * 256], np.uint32)
               .reshape(3, 256).T >> 8).astype(np.uint8)
        return lut[px[:, :, 0]]
    raise NotImplementedError(f"tiff: photometric {photo} unsupported")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode_tiff(pixels: np.ndarray, compression: int = 1,
                predictor: int = 1, photometric: int | None = None
                ) -> bytes:
    """uint8 pixels → single-strip little-endian TIFF.  (h, w) gray or
    (h, w, 3) RGB / (h, w, 4) RGBA; ``photometric=3`` palettizes RGB
    input (≤256 exact colors).  ``compression``: 1 none, 5 LZW,
    8 deflate, 32773 PackBits; ``predictor=2`` applies horizontal
    differencing (LZW/deflate only, per spec)."""
    px = np.ascontiguousarray(pixels, np.uint8)
    cmap_vals = None
    if photometric == 3:
        colors, inverse = np.unique(px.reshape(-1, 3), axis=0,
                                    return_inverse=True)
        if len(colors) > 256:
            raise ValueError("encode_tiff: >256 colors for palette")
        h, w = px.shape[:2]
        samples = inverse.astype(np.uint8).reshape(h, w, 1)
        spp, photo = 1, 3
        cmap = np.zeros((3, 256), np.uint16)
        cmap[:, :len(colors)] = colors.T.astype(np.uint16) * 257
        cmap_vals = cmap.flatten()
    elif px.ndim == 2:
        h, w = px.shape
        samples = px[:, :, None]
        spp, photo = 1, 1
    else:
        h, w, spp = px.shape
        samples = px
        photo = 2
    if photometric is not None and photometric != photo:
        raise ValueError("encode_tiff: photometric/shape mismatch")

    body = samples
    if predictor == 2:
        d = samples.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        body = (d & 0xFF).astype(np.uint8)
    flat = body.tobytes()
    if compression == 1:
        strip = flat
    elif compression == 5:
        strip = tiff_lzw_encode(flat)
    elif compression == 8:
        strip = zlib.compress(flat, 6)
    elif compression == 32773:
        strip = packbits_encode(flat)
    else:
        raise ValueError(f"encode_tiff: compression {compression}")

    entries = []  # (tag, type, count, values)

    def short(tag, v):
        entries.append((tag, 3, 1, [v]))

    short(256, w)
    short(257, h)
    entries.append((258, 3, spp, [8] * spp))
    short(259, compression)
    short(262, photo)
    entries.append((273, 4, 1, None))  # strip offset patched below
    short(277, spp)
    short(278, h)
    entries.append((279, 4, 1, [len(strip)]))
    if predictor != 1:
        short(317, predictor)
    if spp == 4:
        short(338, 2)  # unassociated alpha (straight, not premult)
    if cmap_vals is not None:
        entries.append((320, 3, len(cmap_vals), list(cmap_vals)))
    entries.sort(key=lambda e: e[0])

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()
    fields = bytearray()
    strip_patch = None
    for tag, typ, n, vals in entries:
        size = _TYPE_SIZE[typ] * n
        head = struct.pack("<HHI", tag, typ, n)
        if tag == 273:
            strip_patch = len(fields) + 8
            fields += head + b"\x00\x00\x00\x00"
            continue
        packed = struct.pack(f"<{n}{'H' if typ == 3 else 'I'}", *vals)
        if size <= 4:
            fields += head + packed + b"\x00" * (4 - size)
        else:
            fields += head + struct.pack("<I", ext_off + len(ext))
            ext += packed
    strip_off = ext_off + len(ext)
    struct.pack_into("<I", fields, strip_patch, strip_off)
    out = (b"II*\x00" + struct.pack("<I", ifd_off)
           + struct.pack("<H", len(entries)) + bytes(fields)
           + struct.pack("<I", 0) + bytes(ext) + strip)
    return out
