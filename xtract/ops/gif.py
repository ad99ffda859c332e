"""GIF codec, pure stdlib + numpy — with JPEG (`ops/jpeg`) and PNG
(`ops/png`) landed, GIF is the remaining top web image format a crawl
contains; previously it took the ``unsupported_codec`` path.

Decoder: GIF87a/89a, logical screen + global/local color tables,
LZW decompression (variable code width, clear/EOI, deferred-clear
tolerant, 12-bit dictionary cap), 4-pass row interlacing, graphic
control extensions (transparency index, disposal methods 0–3),
multi-frame composition over the logical screen.  `decode_gif`
returns the FIRST composited frame as (h, w, 3) uint8 RGB — the
shape every multimodal stage consumes; `decode_gif_frames` returns
every composited frame for the video-style sampling path.
Transparent pixels composite over white (the `ops/png` convention —
exact, deterministic).  Corrupt streams raise ``ValueError`` → the
typed per-row ``status='decode_error'`` discipline (reference
src/error.rs surface).

Encoder: palette GIF (≤256 exact colors, like `png.encode_png`'s
palette mode), single- or multi-frame (GIF89a with per-frame graphic
control), optional interlacing and a transparency index — enough to
synthesize REAL decodable fixtures that round-trip through any
standards-conforming decoder.

Everything is specification-driven (GIF89a specification, public);
LZW is the GIF variant (LSB-first bit packing, early-change-free code
growth).  The reference engine ingests pre-decoded pixel buffers
(src/api.rs:1196-1239 set_image) — decode is an explicit, tested
stage here, same as the JPEG/PNG tiers.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, 12-bit cap)
# ---------------------------------------------------------------------------

class _LSBReader:
    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ValueError("gif: truncated LZW stream")
            v |= ((self.data[byte] >> (self.bitpos & 7)) & 1) << i
            self.bitpos += 1
        return v


def lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    """GIF LZW stream → index bytes (exactly ``n_expected``)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    rdr = _LSBReader(data)
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    prev: int | None = None
    out = bytearray()
    while len(out) < n_expected:
        code = rdr.read(code_size)
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: bad first LZW code")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("gif: LZW code out of range")
            if len(table) < 4096:
                table.append(table[prev] + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        prev = code
    if len(out) < n_expected:
        raise ValueError("gif: LZW stream ended early")
    return bytes(out[:n_expected])


class _LSBWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= v << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Index bytes → GIF LZW stream (clear-on-full policy; the code
    width grows one entry later than the decoder's add — the classic
    alignment, verified by round-trip at every dictionary size)."""
    clear = 1 << min_code_size
    end = clear + 1
    w = _LSBWriter()

    def reset():
        return ({bytes([i]): i for i in range(clear)}, end + 1,
                min_code_size + 1)

    table, next_code, code_size = reset()
    w.write(clear, code_size)
    buf = b""
    for b in indices:
        nxt = buf + bytes([b])
        if nxt in table:
            buf = nxt
            continue
        w.write(table[buf], code_size)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4096:
            w.write(clear, code_size)
            table, next_code, code_size = reset()
        buf = nxt[-1:]
    if buf:
        w.write(table[buf], code_size)
    w.write(end, code_size)
    return w.flush()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> np.ndarray:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    inv = np.empty(h, np.int64)
    inv[np.array(order, np.int64)] = np.arange(h)
    return inv


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("gif: truncated sub-block")
        out += data[pos:pos + n]
        pos += n


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes → list of composited (h, w, 3) uint8 RGB frames over
    the logical screen (disposal 0/1 = keep, 2 = restore background,
    3 = restore previous; transparency composited over white)."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(data) < 13:
        raise ValueError("gif: truncated header")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0:
        raise ValueError("gif: zero logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            np.uint8).reshape(-1, 3)
        if len(gct) != n:
            raise ValueError("gif: truncated global color table")
        pos += 3 * n
    canvas = np.full((h, w, 3), 255, np.uint8)  # white = the
    # composite-over-white convention shared with ops/png
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(data):
            raise ValueError("gif: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("gif: truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                disposal = (flags >> 2) & 7
                transparent = body[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02X}")
        if pos + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        ix, iy, iw, ih, ipk = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        ct = gct
        if ipk & 0x80:
            n = 2 << (ipk & 7)
            ct = np.frombuffer(data[pos:pos + 3 * n],
                               np.uint8).reshape(-1, 3)
            if len(ct) != n:
                raise ValueError("gif: truncated local color table")
            pos += 3 * n
        if ct is None:
            raise ValueError("gif: no color table for image")
        if iw == 0 or ih == 0 or ix + iw > w or iy + ih > h:
            raise ValueError("gif: image exceeds logical screen")
        if pos >= len(data):
            raise ValueError("gif: missing LZW code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(lzw_decode(mcs, lzw, iw * ih),
                            np.uint8).reshape(ih, iw)
        if ipk & 0x40:  # interlaced
            idx = idx[_deinterlace_rows(ih)]
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("gif: color index out of range")
        saved = canvas.copy() if disposal == 3 else None
        rgb = ct[idx]
        region = canvas[iy:iy + ih, ix:ix + iw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore background → white convention
            canvas[iy:iy + ih, ix:ix + iw] = 255
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("gif: no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → first composited frame, (h, w, 3) uint8 RGB."""
    return decode_gif_frames(data)[0]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _palettize(frames: list[np.ndarray]) -> tuple[np.ndarray, list]:
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(allpx, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"encode_gif: {len(colors)} colors exceed palette size "
            "(posterize first)")
    idx_frames = []
    off = 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        idx_frames.append(inverse[off:off + n].astype(np.uint8)
                          .reshape(f.shape[:2]))
        off += n
    return colors.astype(np.uint8), idx_frames


def encode_gif(frames, interlace: bool = False,
               transparent_color=None, delay_cs: int = 4) -> bytes:
    """(h, w, 3) uint8 frame or list of same-size frames → GIF89a
    bytes (exact global palette from the ≤256 distinct colors).
    ``transparent_color``: an (r, g, b) tuple rendered transparent in
    every frame (decoder composites white there).  Multi-frame input
    writes per-frame graphic controls at ``delay_cs`` centiseconds."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("encode_gif: frames must share one size")
    colors, idx_frames = _palettize(frames)
    tindex = None
    if transparent_color is not None:
        match = np.where((colors == np.asarray(
            transparent_color, np.uint8)).all(axis=1))[0]
        if not len(match):
            raise ValueError("encode_gif: transparent color not in image")
        tindex = int(match[0])
    gct_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    gct_n = 1 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 7), 0, 0)
    out += colors.tobytes() + b"\x00\x00\x00" * (gct_n - len(colors))
    for idx in idx_frames:
        if len(frames) > 1 or tindex is not None:
            flags = (1 if tindex is not None else 0)
            out += bytes([0x21, 0xF9, 4, flags]) \
                + struct.pack("<H", delay_cs) \
                + bytes([tindex or 0, 0])
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        rows = idx
        if interlace:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, h, step))
            rows = idx[np.array(order, np.int64)]
        mcs = max(2, gct_bits)
        out += bytes([mcs])
        stream = lzw_encode(mcs, rows.tobytes())
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
