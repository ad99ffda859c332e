"""PNG codec, pure stdlib zlib + numpy — PNG is the reference
engine's own ingest format (the CLI loads PNG → luma8 before handing
pixels to the engine, /root/reference/cli/src/main.rs:144-145), and
with baseline JPEG landed (`ops/jpeg`) it was the one common crawl
image format still taking the ``unsupported_codec`` path.

Decoder: chunk walk with CRC verification, IHDR/PLTE/tRNS/IDAT/IEND,
zlib inflate, all five scanline filters (None/Sub/Up/Average/Paeth),
bit depths 1/2/4/8 for grayscale and palette, 8- and 16-bit RGB /
gray / gray+alpha / RGBA (16-bit downconverted by high byte), and
Adam7 interlacing (seven independently-filtered passes).  Alpha
channels are composited over white with exact integer arithmetic
(deterministic at any parallelism).  Output is always (h, w, 3) uint8
RGB — the shape every multimodal stage consumes
(`ops/multimodal._image_features` / `average_hash` / `encode_bmp`).
Corrupt streams raise ``ValueError`` → the typed per-row
``status='decode_error'`` discipline (reference src/error.rs surface).

Encoder: 8- or 16-bit gray / RGB / palette / RGBA, linear or Adam7,
with a selectable scanline filter (or ``filter_mode='cycle'`` to
exercise every unfilter path) — enough to synthesize REAL decodable
fixtures that round-trip through any standards-conforming decoder.

Everything is specification-driven (ISO/IEC 15948 / RFC 2083 — the
public PNG spec); the Sub filter's serial recurrence is a per-residue
``np.add.accumulate`` (uint8 wraparound IS the spec's mod-256), Up is
fully vectorized, and only Average/Paeth keep a per-byte loop (their
left-neighbor dependence is inherently serial; fixture-scale rows make
it cheap inside an actor-pool decode stage).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_DEPTHS_OK = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
              4: (8, 16), 6: (8, 16)}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _walk_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("png: truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:
                                          pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("png: missing IEND")


def _unfilter(raw: np.ndarray, h: int, stride: int, fbytes: int
              ) -> np.ndarray:
    """Filtered scanlines (h rows of 1 filter byte + ``stride`` data
    bytes) → reconstructed bytes (h, stride) uint8."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:]
        if ft == 0:
            rec = line.copy()
        elif ft == 1:  # Sub: per-residue prefix sum, uint8 wrap = mod 256
            rec = line.copy()
            for off in range(fbytes):
                np.add.accumulate(rec[off::fbytes], out=rec[off::fbytes])
        elif ft == 2:  # Up
            rec = line + prev
        elif ft == 3:  # Average — serial left dependence
            rec = np.zeros(stride, np.uint8)
            li, pi = line.tolist(), prev.tolist()
            ro = rec.tolist()
            for x in range(stride):
                left = ro[x - fbytes] if x >= fbytes else 0
                ro[x] = (li[x] + ((left + pi[x]) >> 1)) & 0xFF
            rec = np.array(ro, np.uint8)
        elif ft == 4:  # Paeth — serial left dependence
            rec = np.zeros(stride, np.uint8)
            li, pi = line.tolist(), prev.tolist()
            ro = rec.tolist()
            for x in range(stride):
                a = ro[x - fbytes] if x >= fbytes else 0
                b = pi[x]
                c = pi[x - fbytes] if x >= fbytes else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                ro[x] = (li[x] + pred) & 0xFF
            rec = np.array(ro, np.uint8)
        else:
            raise ValueError(f"png: bad filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def _unpack_samples(recon: np.ndarray, w: int, depth: int,
                    channels: int) -> np.ndarray:
    """(h, stride) reconstructed bytes → (h, w·channels) samples at
    8-bit precision (16-bit takes the high byte — the standard
    downconversion; sub-byte depths stay native, rescaled later)."""
    n = w * channels
    if depth == 8:
        return recon[:, :n]
    if depth == 16:
        return np.ascontiguousarray(recon[:, :2 * n])[:, ::2]
    bits = np.unpackbits(recon, axis=1)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = (bits[:, :n * depth].reshape(recon.shape[0], n, depth)
            .astype(np.uint16) * weights).sum(axis=2)
    return vals.astype(np.uint8)


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _decode_pixel_data(raw: np.ndarray, w: int, h: int, depth: int,
                       channels: int, interlace: int) -> np.ndarray:
    """Inflated filtered scanlines → (h, w, channels) uint8 samples,
    handling both the linear layout and the Adam7 seven-pass layout
    (each pass an independently-filtered sub-image)."""
    fbytes = max(1, channels * depth // 8)
    if interlace == 0:
        stride = (w * channels * depth + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("png: scanline payload size mismatch")
        recon = _unfilter(raw, h, stride, fbytes)
        return _unpack_samples(recon, w, depth, channels).reshape(
            h, w, channels)
    out = np.zeros((h, w, channels), np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        wi = (w - x0 + dx - 1) // dx
        hi = (h - y0 + dy - 1) // dy
        if wi <= 0 or hi <= 0:
            continue
        stride = (wi * channels * depth + 7) // 8
        need = hi * (stride + 1)
        sub = raw[pos:pos + need]
        if len(sub) != need:
            raise ValueError("png: truncated interlaced pass")
        pos += need
        recon = _unfilter(sub, hi, stride, fbytes)
        out[y0::dy, x0::dx, :] = _unpack_samples(
            recon, wi, depth, channels).reshape(hi, wi, channels)
    if pos != len(raw):
        raise ValueError("png: trailing bytes after interlaced passes")
    return out


def _composite_white(rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Exact-integer source-over-white: (fg·a + 255·(255−a) + 127)//255."""
    a = alpha.astype(np.int32)[..., None]
    fg = rgb.astype(np.int32)
    return ((fg * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB.  Alpha composited over white;
    low-bit gray rescaled to full range; 16-bit samples downconverted
    (high byte); Adam7 interlaced streams deinterlaced (round 5);
    palette resolved via PLTE (+ tRNS alpha if present).  Raises
    ``ValueError`` for corrupt streams."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    trns = None
    idat = []
    for ctype, body in _walk_chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if w == 0 or h == 0:
        raise ValueError("png: zero dimension")
    if comp != 0 or filt != 0:
        raise ValueError("png: bad compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"png: bad interlace {interlace}")
    if color not in _CHANNELS:
        raise ValueError(f"png: bad color type {color}")
    if depth not in _DEPTHS_OK[color]:
        raise ValueError(f"png: depth {depth} invalid for color {color}")
    channels = _CHANNELS[color]
    try:
        raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    except zlib.error as e:
        raise ValueError(f"png: inflate failed ({e})")
    samples = _decode_pixel_data(raw, w, h, depth, channels, interlace)

    if color == 0:  # grayscale
        g = samples.reshape(h, w)
        if depth < 8:
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)
                 ).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if color == 2:  # RGB
        return samples.reshape(h, w, 3)
    if color == 3:  # palette
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        idx = samples.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("png: palette index out of range")
        rgb = plte[idx]
        if trns is not None and len(trns):
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            return _composite_white(rgb, alpha[idx])
        return rgb
    if color == 4:  # gray + alpha
        ga = samples.reshape(h, w, 2)
        rgb = np.repeat(ga[:, :, :1], 3, axis=2)
        return _composite_white(rgb, ga[:, :, 1])
    # color == 6: RGBA
    rgba = samples.reshape(h, w, 4)
    return _composite_white(rgba[:, :, :3], rgba[:, :, 3])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _filter_row(rec: np.ndarray, prev: np.ndarray, ft: int,
                fbytes: int) -> np.ndarray:
    """Reconstructed row → filtered bytes for filter type ``ft``
    (inverse of `_unfilter`, same predictors)."""
    if ft == 0:
        return rec.copy()
    left = np.zeros_like(rec)
    left[fbytes:] = rec[:-fbytes]
    if ft == 1:
        return rec - left
    if ft == 2:
        return rec - prev
    upleft = np.zeros_like(prev)
    upleft[fbytes:] = prev[:-fbytes]
    if ft == 3:
        return rec - (((left.astype(np.int32) + prev) >> 1)
                      .astype(np.uint8))
    # ft == 4: Paeth
    a = left.astype(np.int32)
    b = prev.astype(np.int32)
    c = upleft.astype(np.int32)
    p = a + b - c
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    pred = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                    np.where(pb <= pc_, b, c)).astype(np.uint8)
    return rec - pred


def _filter_image(flat: np.ndarray, fbytes: int, filter_mode) -> bytes:
    """(rows, row_bytes) uint8 → filtered scanline bytes (one filter
    byte + filtered data per row; fresh prev per sub-image)."""
    body = bytearray()
    prev = np.zeros(flat.shape[1], np.uint8)
    for y in range(flat.shape[0]):
        ft = (y % 5) if filter_mode == "cycle" else int(filter_mode)
        body.append(ft)
        body += _filter_row(flat[y], prev, ft, fbytes).tobytes()
        prev = flat[y]
    return bytes(body)


def encode_png(pixels: np.ndarray, color_type: int = 2,
               filter_mode=0, interlace: bool = False,
               bit_depth: int = 8) -> bytes:
    """uint8 pixels → PNG bytes.  ``color_type``: 0 gray ((h,w) or
    (h,w,1)), 2 RGB (h,w,3), 3 palette (h,w,3 with ≤256 distinct
    colors), 6 RGBA ((h,w,3) gains opaque alpha, or (h,w,4)).
    ``filter_mode``: a fixed filter type 0–4, or ``'cycle'`` to use
    filter (row % 5) per row — every decoder unfilter path in one
    fixture.  ``interlace=True`` writes the Adam7 seven-pass layout.
    ``bit_depth=16`` (gray/RGB/RGBA only) widens samples as v·257, so
    the decoder's high-byte downconversion round-trips exactly."""
    px = np.ascontiguousarray(pixels, np.uint8)
    plte_body = None
    if bit_depth not in (8, 16) or (bit_depth == 16 and color_type == 3):
        raise ValueError("encode_png: bad bit depth for color type")
    if color_type == 0:
        if px.ndim == 3:
            px = px[:, :, 0]
        h, w = px.shape
        samples = px.reshape(h, w, 1)
        channels = 1
    elif color_type == 2:
        h, w, _ = px.shape
        samples = px
        channels = 3
    elif color_type == 3:
        h, w, _ = px.shape
        colors, inverse = np.unique(px.reshape(-1, 3), axis=0,
                                    return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"encode_png: {len(colors)} colors exceed palette size")
        plte_body = colors.astype(np.uint8).tobytes()
        samples = inverse.astype(np.uint8).reshape(h, w, 1)
        channels = 1
    elif color_type == 6:
        if px.shape[2] == 3:
            px = np.concatenate(
                [px, np.full(px.shape[:2] + (1,), 255, np.uint8)], axis=2)
        h, w, _ = px.shape
        samples = px
        channels = 4
    else:
        raise ValueError(f"encode_png: color type {color_type} "
                         "unsupported (use 0/2/3/6)")

    def row_bytes(sub: np.ndarray) -> np.ndarray:
        """(hi, wi, channels) samples → (hi, stride) uint8 rows."""
        hi, wi = sub.shape[:2]
        if bit_depth == 16:
            wide = (sub.astype(np.uint16) * 257).astype(">u2")
            return np.frombuffer(wide.tobytes(), np.uint8).reshape(
                hi, wi * channels * 2)
        return sub.reshape(hi, wi * channels)

    fbytes = max(1, channels * bit_depth // 8)
    out = [PNG_SIG,
           _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, bit_depth,
                                       color_type, 0, 0,
                                       1 if interlace else 0))]
    if plte_body is not None:
        out.append(_chunk(b"PLTE", plte_body))
    if interlace:
        body = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            body += _filter_image(row_bytes(sub), fbytes, filter_mode)
    else:
        body = _filter_image(row_bytes(samples), fbytes, filter_mode)
    out.append(_chunk(b"IDAT", zlib.compress(body, 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)
