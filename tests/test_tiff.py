"""TIFF codec (ops/tiff) + its multimodal integration: TIFF-variant
LZW (early-change) and PackBits round-trips, every compression ×
photometric combination, predictor, palette/RGBA, 1-bit bilevel,
corrupt rejection, planted TIFF near-dup recovery through the Ray
pipeline, BMP↔TIFF hash parity."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from xtract.ops.multimodal import _synth_pixels, average_hash
from xtract.ops.tiff import (decode_tiff, encode_tiff, packbits_decode,
                             packbits_encode, tiff_lzw_decode,
                             tiff_lzw_encode)


def test_tiff_lzw_roundtrip_with_early_change():
    rng = np.random.default_rng(3)
    for n in [10, 1000, 100000]:  # 100k crosses every width boundary
        data = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        assert tiff_lzw_decode(tiff_lzw_encode(data), n) == data, n
    data = b"xyzxyzxyq" * 20000  # deep chains + clear-on-full
    enc = tiff_lzw_encode(data)
    assert tiff_lzw_decode(enc, len(data)) == data
    assert len(enc) < len(data) // 5


def test_packbits_roundtrip():
    rng = np.random.default_rng(5)
    for n in [1, 7, 500]:
        d = rng.integers(0, 3, n).astype(np.uint8).tobytes()
        assert packbits_decode(packbits_encode(d), n) == d, n
    d = bytes(rng.integers(0, 256, 1000).astype(np.uint8))
    assert packbits_decode(packbits_encode(d), 1000) == d


def test_roundtrip_every_compression_and_predictor():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (23, 37, 3), np.uint8)
    g = rng.integers(0, 256, (17, 13), np.uint8)
    for comp in (1, 5, 8, 32773):
        assert np.array_equal(
            decode_tiff(encode_tiff(px, compression=comp)), px), comp
        got = decode_tiff(encode_tiff(g, compression=comp))
        assert np.array_equal(got, np.repeat(g[:, :, None], 3, 2)), comp
    for comp in (5, 8):  # horizontal differencing
        assert np.array_equal(
            decode_tiff(encode_tiff(px, compression=comp,
                                    predictor=2)), px), comp


def test_palette_rgba_and_bilevel():
    rng = np.random.default_rng(9)
    pal = (rng.integers(0, 9, (11, 19), np.uint8)[:, :, None]
           * np.array([28, 13, 7], np.uint8)[None, None, :])
    assert np.array_equal(
        decode_tiff(encode_tiff(pal, compression=5, photometric=3)), pal)
    rgba = rng.integers(0, 256, (9, 6, 4), np.uint8)
    out = decode_tiff(encode_tiff(rgba, compression=8))
    a = rgba[:, :, 3:].astype(np.int32)
    fg = rgba[:, :, :3].astype(np.int32)
    exp = ((fg * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
    assert np.array_equal(out, exp)

    # hand-crafted 1-bit bilevel in both photometric polarities
    bits = np.packbits(np.array([[1, 0, 1, 1, 0, 1, 0, 0, 1]],
                                np.uint8), axis=1)

    def craft(photo):
        strip = bits.tobytes()
        entries = [(256, 3, 1, 9), (257, 3, 1, 1), (258, 3, 1, 1),
                   (259, 3, 1, 1), (262, 3, 1, photo), (273, 4, 1, None),
                   (277, 3, 1, 1), (278, 3, 1, 1), (279, 4, 1, len(strip))]
        fields = bytearray()
        patch = None
        for tag, typ, n, v in entries:
            head = struct.pack("<HHI", tag, typ, n)
            if v is None:
                patch = len(fields) + 8
                fields += head + b"\0\0\0\0"
                continue
            pk = struct.pack(f"<{n}{'H' if typ == 3 else 'I'}", v)
            fields += head + pk + b"\0" * (4 - len(pk))
        off = 8 + 2 + 12 * len(entries) + 4
        struct.pack_into("<I", fields, patch, off)
        return (b"II*\x00" + struct.pack("<I", 8)
                + struct.pack("<H", len(entries)) + bytes(fields)
                + struct.pack("<I", 0) + strip)

    out = decode_tiff(craft(1))
    assert out[0, 0, 0] == 255 and out[0, 1, 0] == 0
    out0 = decode_tiff(craft(0))  # white-is-zero inverts
    assert out0[0, 0, 0] == 0 and out0[0, 1, 0] == 255


def test_tiff_corrupt_rejected():
    px = np.zeros((4, 4, 3), np.uint8)
    for bad in [b"II*\x00", b"nottiff!", encode_tiff(px)[:30]]:
        with pytest.raises(ValueError):
            decode_tiff(bad)


def test_tiff_bmp_hash_parity():
    px = _synth_pixels(21, 24, 18)
    assert average_hash(decode_tiff(encode_tiff(px, compression=5))) \
        == average_hash(px)


def test_tiff_near_dups_through_pipeline(ray_session):
    import ray.data as rd

    from xtract.ops.multimodal import encode_bmp, image_near_dups

    base = _synth_pixels(9, 40, 32)
    other = _synth_pixels(123, 40, 32)
    rows = [
        {"media_id": 1, "kind": "image", "payload": encode_bmp(base)},
        {"media_id": 2, "kind": "image",
         "payload": encode_tiff(base, compression=5, predictor=2)},
        {"media_id": 3, "kind": "image",
         "payload": encode_tiff(other, compression=32773)},
    ]
    out = image_near_dups(rd.from_items(rows)).to_pandas()
    c = dict(zip(out.media_id, out.cluster_id))
    assert c[1] == c[2]  # lossless containers of the same pixels
    assert c[3] != c[1]


def test_media_features_and_resize_on_tiff(ray_session):
    import ray.data as rd

    from xtract.ops.multimodal import ResizeStage, decode_bmp, decode_media

    rows = [
        {"media_id": 1, "kind": "image",
         "payload": encode_tiff(_synth_pixels(2, 24, 24), compression=8),
         "meta": {"codec": "tiff"}},
        {"media_id": 2, "kind": "image",
         "payload": b"II*\x00" + b"\x00" * 3,
         "meta": {"codec": "tiff"}},
    ]
    out = decode_media(rd.from_items(rows)).to_pandas()
    st = dict(zip(out.media_id, out.decode_status))
    assert st[1] == "ok"
    assert st[2] in ("decode_error", "unsupported_codec")

    rs = ResizeStage(16, 16)(pa.Table.from_pylist(
        [{"media_id": 1, "kind": "image",
          "payload": encode_tiff(_synth_pixels(4, 30, 20)),
          "meta": {"codec": "tiff"}}]))
    assert rs["resize_status"].to_pylist() == ["ok"]
    assert decode_bmp(rs["resized"].to_pylist()[0]).shape == (16, 16, 3)
