"""PNG codec (ops/png) + its multimodal integration: lossless
round-trips across every color type and scanline filter, low-bit-depth
and tRNS decode, 16-bit/interlaced/corrupt rejection, planted PNG
near-dup recovery through the Ray pipeline, media_features ok-status
on PNG payloads, BMP↔PNG feature/hash parity (lossless containers of
the same pixels must be indistinguishable downstream)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from xtract.ops.multimodal import _synth_pixels, average_hash
from xtract.ops.png import PNG_SIG, _chunk, decode_png, encode_png


def test_roundtrip_rgb_every_filter():
    px = _synth_pixels(11, 37, 23)
    for fm in [0, 1, 2, 3, 4, "cycle"]:
        out = decode_png(encode_png(px, 2, filter_mode=fm))
        assert np.array_equal(out, px), fm


def test_roundtrip_gray_palette_rgba():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (17, 31), np.uint8)
    out = decode_png(encode_png(g, 0, filter_mode="cycle"))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, 2))
    # palette: few distinct colors
    pal = (rng.integers(0, 5, (19, 11), np.uint8)[:, :, None]
           * np.array([50, 30, 11], np.uint8)[None, None, :])
    assert np.array_equal(decode_png(encode_png(pal, 3,
                                                filter_mode="cycle")), pal)
    # opaque RGBA decodes to the identical RGB
    px = _synth_pixels(3, 20, 14)
    assert np.array_equal(decode_png(encode_png(px, 6,
                                                filter_mode="cycle")), px)


def test_rgba_composites_over_white_exact_integer():
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (9, 13, 4), np.uint8)
    out = decode_png(encode_png(rgba, 6))
    a = rgba[:, :, 3:].astype(np.int32)
    fg = rgba[:, :, :3].astype(np.int32)
    exp = ((fg * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
    assert np.array_equal(out, exp)


def _raw_png(w, h, depth, color, rowsdata, extra=b"", interlace=0):
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color,
                                       0, 0, interlace))
    idat = _chunk(b"IDAT", zlib.compress(rowsdata))
    return PNG_SIG + ihdr + extra + idat + _chunk(b"IEND", b"")


def test_low_bit_depth_gray_and_trns_palette():
    # 4-bit gray: values rescale by 255//15
    vals = np.array([[1, 2, 3, 15, 0], [7, 8, 9, 10, 11]], np.uint8)
    rows = b""
    for r in vals:
        bits = np.unpackbits(r[:, None], axis=1)[:, 4:].flatten()
        rows += b"\x00" + np.packbits(bits).tobytes()
    out = decode_png(_raw_png(5, 2, 4, 0, rows))
    exp = (vals.astype(np.uint16) * 255 // 15).astype(np.uint8)
    assert np.array_equal(out, np.repeat(exp[:, :, None], 3, 2))
    # 2-bit palette with a translucent index 0 via tRNS
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                    np.uint8)
    idx = np.array([0, 1, 2, 3, 0], np.uint8)
    bits = np.unpackbits(idx[:, None], axis=1)[:, 6:].flatten()
    rows = b"\x00" + np.packbits(bits).tobytes()
    png = _raw_png(5, 1, 2, 3, rows,
                   extra=_chunk(b"PLTE", plte.tobytes())
                   + _chunk(b"tRNS", bytes([128])))
    out = decode_png(png)
    exp0 = ((np.array([255, 0, 0], np.int32) * 128 + 255 * 127 + 127)
            // 255).astype(np.uint8)
    assert np.array_equal(out[0, 0], exp0)
    assert np.array_equal(out[0, 1], [0, 255, 0])


def test_unsupported_and_corrupt_rejected():
    with pytest.raises(ValueError, match="depth"):
        decode_png(_raw_png(1, 1, 16, 3, b"\x00\x00\x00"))  # 16-bit palette
    with pytest.raises(ValueError, match="PNG"):
        decode_png(b"not a png at all")
    good = encode_png(np.zeros((3, 3, 3), np.uint8))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt the IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:30])  # truncated


def test_png_bmp_parity_features_and_hash():
    # lossless containers of the same pixels: identical hash and
    # identical features through the decode stage
    from xtract.ops.multimodal import DecodeStage, encode_bmp

    px = _synth_pixels(21, 24, 18)
    assert average_hash(decode_png(encode_png(px))) == average_hash(px)
    stage = DecodeStage()
    meta = {"width": 24, "height": 18, "sample_rate": 0,
            "n_frames": 1, "codec": ""}
    f_bmp = stage.decode_one(encode_bmp(px), "image", meta)
    f_png = stage.decode_one(encode_png(px, filter_mode="cycle"),
                             "image", meta)
    assert np.array_equal(f_bmp, f_png)


def test_png_near_dups_planted_pair(ray_session):
    # a PNG and its 1-LSB-noised PNG re-encode must cluster; a
    # different scene (also PNG) must not
    import ray.data as rd

    from xtract.ops.multimodal import image_near_dups

    base = _synth_pixels(9, 40, 32)
    noised = base.copy()
    noised[::3, ::5, 0] ^= 1  # sub-perceptual LSB flips
    other = _synth_pixels(123, 40, 32)
    rows = [
        {"media_id": 1, "kind": "image", "payload": encode_png(base)},
        {"media_id": 2, "kind": "image",
         "payload": encode_png(noised, 6, filter_mode="cycle")},
        {"media_id": 3, "kind": "image", "payload": encode_png(other)},
    ]
    out = image_near_dups(rd.from_items(rows)).to_pandas()
    c = dict(zip(out.media_id, out.cluster_id))
    assert c[1] == c[2]
    assert c[3] != c[1]


def test_media_features_ok_on_png(ray_session):
    import ray.data as rd

    from xtract.ops.multimodal import decode_media

    rows = [
        {"media_id": 1, "kind": "image",
         "payload": encode_png(_synth_pixels(2, 24, 24)),
         "meta": {"codec": "png"}},
        {"media_id": 2, "kind": "image",
         "payload": PNG_SIG + b"garbage after the signature",
         "meta": {"codec": "png"}},
    ]
    out = decode_media(rd.from_items(rows)).to_pandas()
    st = dict(zip(out.media_id, out.decode_status))
    assert st[1] == "ok"
    assert st[2] in ("decode_error", "unsupported_codec")


def test_resize_stage_handles_png(ray_session):
    from xtract.ops.multimodal import ResizeStage, decode_bmp

    rows = [{"media_id": 1, "kind": "image",
             "payload": encode_png(_synth_pixels(4, 30, 20),
                                   filter_mode="cycle"),
             "meta": {"codec": "png"}}]
    out = ResizeStage(16, 16)(pa.Table.from_pylist(rows))
    assert out["resize_status"].to_pylist() == ["ok"]
    rs = decode_bmp(out["resized"].to_pylist()[0])
    assert rs.shape == (16, 16, 3)


def test_synth_media_rotates_containers_losslessly(ray_session):
    # synth emits BMP / PNG-RGB / PNG-RGBA images by (doc_id//3)%3 —
    # all must decode to the generator's exact pixels
    from xtract.ops.multimodal import decode_bmp, synth_media_batch

    docs = pa.table({"doc_id": pa.array([0, 3, 6, 9], pa.int64())})
    media = synth_media_batch(docs).to_pylist()
    codecs = {r["media_id"]: r["meta"]["codec"] for r in media}
    assert codecs == {0: "bmp", 3: "png", 6: "png", 9: "bmp"}
    for r in media:
        d = r["media_id"]
        exp = _synth_pixels(d, 8 + (d % 32), 8 + (d * 7 % 32))
        p = r["payload"]
        got = decode_png(p) if p[:8] == PNG_SIG else decode_bmp(p)
        assert np.array_equal(got, exp), d


# ---------------------------------------------------------------------------
# Adam7 interlacing + 16-bit depth — round 5
# ---------------------------------------------------------------------------

def test_adam7_roundtrip_all_types_and_sizes():
    rng = np.random.default_rng(11)
    # sizes straddling the 8x8 pass grid, incl. degenerate dims
    for (h, w) in [(1, 1), (3, 5), (8, 8), (13, 29), (40, 17)]:
        px = rng.integers(0, 256, (h, w, 3), np.uint8)
        for ct in (2, 6):
            got = decode_png(encode_png(px, ct, filter_mode="cycle",
                                        interlace=True))
            assert np.array_equal(got, px), (h, w, ct)
        g = rng.integers(0, 256, (h, w), np.uint8)
        got = decode_png(encode_png(g, 0, filter_mode="cycle",
                                    interlace=True))
        assert np.array_equal(got, np.repeat(g[:, :, None], 3, 2))
    # interlaced palette
    pal = (rng.integers(0, 7, (11, 19), np.uint8)[:, :, None]
           * np.array([31, 17, 3], np.uint8)[None, None, :])
    got = decode_png(encode_png(pal, 3, filter_mode="cycle",
                                interlace=True))
    assert np.array_equal(got, pal)


def test_16bit_roundtrip_and_high_byte():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (9, 14, 3), np.uint8)
    # v·257 widening → high byte == v: exact round-trip
    for interlace in (False, True):
        got = decode_png(encode_png(px, 2, bit_depth=16,
                                    filter_mode="cycle",
                                    interlace=interlace))
        assert np.array_equal(got, px), interlace
    g = rng.integers(0, 256, (7, 5), np.uint8)
    got = decode_png(encode_png(g, 0, bit_depth=16))
    assert np.array_equal(got, np.repeat(g[:, :, None], 3, 2))
    # hand-built 16-bit gray where low byte differs: high byte wins
    rows = b"\x00" + bytes([0x12, 0xFF, 0xAB, 0x00])  # two pixels
    out = decode_png(_raw_png(2, 1, 16, 0, rows))
    assert out[0, 0, 0] == 0x12 and out[0, 1, 0] == 0xAB


def test_interlaced_16bit_through_stages(ray_session):
    # an Adam7 16-bit RGBA PNG must hash/cluster like its plain encode
    import ray.data as rd

    from xtract.ops.multimodal import image_near_dups

    base = _synth_pixels(33, 40, 32)
    other = _synth_pixels(200, 40, 32)
    rows = [
        {"media_id": 1, "kind": "image", "payload": encode_png(base)},
        {"media_id": 2, "kind": "image",
         "payload": encode_png(base, 6, bit_depth=16, interlace=True,
                               filter_mode="cycle")},
        {"media_id": 3, "kind": "image",
         "payload": encode_png(other, interlace=True)},
    ]
    out = image_near_dups(rd.from_items(rows)).to_pandas()
    c = dict(zip(out.media_id, out.cluster_id))
    assert c[1] == c[2]
    assert c[3] != c[1]
