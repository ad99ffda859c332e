"""GIF codec (ops/gif) + its multimodal integration: LZW round-trips
through full-dictionary growth, frame/interlace/transparency/animation
round-trips, corrupt rejection, planted GIF near-dup recovery through
the Ray pipeline, animated-GIF frame sampling, BMP↔GIF hash parity."""

import numpy as np
import pyarrow as pa
import pytest

from xtract.ops.gif import (decode_gif, decode_gif_frames, encode_gif,
                            lzw_decode, lzw_encode)
from xtract.ops.multimodal import _synth_pixels, average_hash


def _posterize(px: np.ndarray) -> np.ndarray:
    """Quantize to ≤256 distinct colors (3-3-2 bits) for exact-palette
    GIF encoding."""
    out = px.copy()
    out[:, :, 0] &= 0xE0
    out[:, :, 1] &= 0xE0
    out[:, :, 2] &= 0xC0
    return out


def test_lzw_roundtrip_and_growth():
    rng = np.random.default_rng(3)
    for mcs, n in [(2, 10), (4, 1000), (8, 60000)]:
        data = rng.integers(0, 1 << mcs, n).astype(np.uint8).tobytes()
        assert lzw_decode(mcs, lzw_encode(mcs, data), n) == data
    # compressible stream forces deep dictionary chains + clear-on-full
    data = b"abcabcabd" * 9000
    enc = lzw_encode(8, data)
    assert lzw_decode(8, enc, len(data)) == data
    assert len(enc) < len(data) // 10


def test_gif_roundtrip_plain_interlaced_transparent():
    rng = np.random.default_rng(5)
    px = (rng.integers(0, 6, (23, 37), np.uint8)[:, :, None]
          * np.array([40, 25, 7], np.uint8)[None, None, :])
    assert np.array_equal(decode_gif(encode_gif(px)), px)
    assert np.array_equal(decode_gif(encode_gif(px, interlace=True)), px)
    tr = tuple(int(v) for v in px[0, 0])
    out = decode_gif(encode_gif(px, transparent_color=tr))
    mask = (px == np.array(tr, np.uint8)).all(axis=2)
    assert (out[mask] == 255).all()  # composited over white
    assert np.array_equal(out[~mask], px[~mask])


def test_gif_animation_frames():
    rng = np.random.default_rng(7)
    frames = [((rng.integers(0, 4, (16, 16), np.uint8))[:, :, None]
               * np.array([60, 30, 15], np.uint8)[None, None, :])
              for _ in range(4)]
    got = decode_gif_frames(encode_gif(frames))
    assert len(got) == 4
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


def test_gif_corrupt_rejected():
    px = np.zeros((4, 4, 3), np.uint8)
    good = encode_gif(px)
    for bad in [b"not a gif", b"GIF89a", good[:20]]:
        with pytest.raises(ValueError):
            decode_gif(bad)
    with pytest.raises(ValueError, match="palette"):
        rng = np.random.default_rng(1)
        encode_gif(rng.integers(0, 256, (40, 40, 3), np.uint8))


def test_gif_bmp_hash_parity():
    px = _posterize(_synth_pixels(21, 24, 18))
    assert average_hash(decode_gif(encode_gif(px))) == average_hash(px)


def test_gif_near_dups_through_pipeline(ray_session):
    import ray.data as rd

    from xtract.ops.multimodal import encode_bmp, image_near_dups

    base = _posterize(_synth_pixels(9, 40, 32))
    other = _posterize(_synth_pixels(123, 40, 32))
    rows = [
        {"media_id": 1, "kind": "image", "payload": encode_bmp(base)},
        {"media_id": 2, "kind": "image",
         "payload": encode_gif(base, interlace=True)},
        {"media_id": 3, "kind": "image", "payload": encode_gif(other)},
    ]
    out = image_near_dups(rd.from_items(rows)).to_pandas()
    c = dict(zip(out.media_id, out.cluster_id))
    assert c[1] == c[2]  # lossless containers of the same pixels
    assert c[3] != c[1]


def test_media_features_ok_on_gif_and_animated_count(ray_session):
    import ray.data as rd

    from xtract.ops.multimodal import decode_media

    still = _posterize(_synth_pixels(2, 24, 24))
    anim = [_posterize(_synth_pixels(s, 12, 10)) for s in (3, 4, 5)]
    rows = [
        {"media_id": 1, "kind": "image", "payload": encode_gif(still),
         "meta": {"codec": "gif"}},
        {"media_id": 2, "kind": "image", "payload": encode_gif(anim),
         "meta": {"codec": "gif"}},
        {"media_id": 3, "kind": "image",
         "payload": b"GIF89a" + b"\x00" * 4,
         "meta": {"codec": "gif"}},
    ]
    out = decode_media(rd.from_items(rows)).to_pandas()
    st = dict(zip(out.media_id, out.decode_status))
    assert st[1] == "ok" and st[2] == "ok"
    assert st[3] in ("decode_error", "unsupported_codec")
    f2 = dict(zip(out.media_id, out.features))
    assert f2[2][22] == 3.0  # animated frame count reported


def test_resize_and_frame_sample_on_gif(ray_session):
    from xtract.ops.multimodal import (FrameSampleStage, ResizeStage,
                                       decode_bmp)

    still = _posterize(_synth_pixels(4, 30, 20))
    out = ResizeStage(16, 16)(pa.Table.from_pylist(
        [{"media_id": 1, "kind": "image", "payload": encode_gif(still),
          "meta": {"codec": "gif"}}]))
    assert out["resize_status"].to_pylist() == ["ok"]
    assert decode_bmp(out["resized"].to_pylist()[0]).shape == (16, 16, 3)

    anim = [_posterize(_synth_pixels(s, 12, 10)) for s in range(6)]
    frames = FrameSampleStage(2)(pa.Table.from_pylist(
        [{"media_id": 7, "kind": "video", "payload": encode_gif(anim),
          "meta": {"codec": "gif"}}]))
    idx = frames["frame_index"].to_pylist()
    assert idx == [0, 2, 4]
    got = decode_bmp(frames["frame"].to_pylist()[1])
    assert np.array_equal(got, anim[2])
