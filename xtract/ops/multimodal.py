"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as actor-pool ``map_batches`` stages with small batch sizes (large
payloads: batch_size × payload must fit the worker heap).

The actual codecs are NOT in this container, so the decode kernel is
stubbed two ways (both clearly marked):

- ``DecodeStage(fake=False)`` raises ``NotImplementedError`` per batch —
  the honest stub;
- ``DecodeStage(fake=True)`` produces a deterministic fake decode
  (dimensions from metadata, content hash as "pixels") so the Ray-side
  plumbing — schema, actor signature, batch sizing, output layout — is
  real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("url", pa.string()),
    ("kind", pa.string()),          # 'image' | 'audio' | 'video'
    ("payload", pa.binary()),
    ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("sample_rate", pa.int32()), ("n_frames", pa.int32()),
                        ("codec", pa.string())])),
])

FEATURE_DIM = 32


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents rows → deterministic fake media rows (payload = seeded
    bytes; metadata consistent with payload length)."""
    ids = batch["doc_id"].to_pylist()
    rows = []
    for d in ids:
        kind = ("image", "audio", "video")[d % 3]
        w, h = 8 + (d % 32), 8 + (d * 7 % 32)
        payload = hashlib.blake2b(f"media-{d}".encode(), digest_size=32).digest() * (1 + d % 4)
        rows.append({
            "media_id": d, "url": f"https://media.example.org/{kind}/{d}",
            "kind": kind, "payload": payload,
            "meta": {"width": w, "height": h, "sample_rate": 16000 if kind == "audio" else 0,
                     "n_frames": 1 + d % 24 if kind == "video" else 1,
                     "codec": {"image": "fake-png", "audio": "fake-pcm",
                               "video": "fake-h264"}[kind]},
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class DecodeStage:
    """Actor pool stage: payload bytes → decoded tensor-ish columns.

    STUB: real image/audio codecs are unavailable in this container.
    ``fake=True`` emits a deterministic stand-in (payload-hash-seeded
    feature vector + dims from metadata); ``fake=False`` raises
    ``NotImplementedError`` — swap in a real codec (PIL/libav) by
    overriding ``decode_one`` when the dependency exists."""

    def __init__(self, fake: bool = True) -> None:
        self.fake = fake

    def decode_one(self, payload: bytes, kind: str, meta: dict) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media codecs not available in this environment; "
                "construct DecodeStage(fake=True) for the deterministic stub")
        digest = hashlib.shake_128(payload).digest(FEATURE_DIM * 4)
        return np.frombuffer(digest, np.uint32).astype(np.float32) / np.float32(2 ** 32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        metas = batch["meta"].to_pylist()
        feats = np.empty((len(payloads), FEATURE_DIM), np.float32)
        ok = []
        for i, (p, k, m) in enumerate(zip(payloads, kinds, metas)):
            try:
                feats[i] = self.decode_one(p or b"", k, m or {})
                ok.append("ok")
            except NotImplementedError:
                feats[i] = 0.0
                ok.append("unsupported_codec")
        return (batch.drop_columns(["payload"])  # decoded stages drop raw bytes
                .append_column("features",
                               pa.array(list(feats), pa.list_(pa.float32(), FEATURE_DIM)))
                .append_column("decode_status", pa.array(ok, pa.string())))


def decode_media(ds, fake: bool = True, batch_size: int = 16, concurrency=(1, 4)):
    """Media dataset → features dataset.  Small batch_size: payloads are
    large; batch × concurrency must fit worker heap (SURVEY memory rule)."""
    return ds.map_batches(DecodeStage, fn_constructor_args=(fake,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


class ResizeStage:
    """Actor stage: image resize plumbing (STUB kernel).  Real resize
    needs PIL/opencv (absent here); the fake kernel deterministically
    re-hashes payload + target dims so schema/batching/output layout are
    real and tested.  Swap ``resize_one`` for a real kernel when the
    dependency exists."""

    def __init__(self, width: int = 64, height: int = 64,
                 fake: bool = True) -> None:
        self.width = width
        self.height = height
        self.fake = fake

    def resize_one(self, payload: bytes, meta: dict) -> tuple[bytes, int, int]:
        if not self.fake:
            raise NotImplementedError("image codecs unavailable; use fake=True")
        out = hashlib.blake2b(
            payload + self.width.to_bytes(4, "big") +
            self.height.to_bytes(4, "big"), digest_size=32).digest()
        return out, self.width, self.height

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        metas = batch["meta"].to_pylist()
        outs, ws, hs = [], [], []
        for p, m in zip(payloads, metas):
            o, w, h = self.resize_one(p or b"", m or {})
            outs.append(o)
            ws.append(w)
            hs.append(h)
        return (batch.append_column("resized", pa.array(outs, pa.binary()))
                     .append_column("out_width", pa.array(ws, pa.int32()))
                     .append_column("out_height", pa.array(hs, pa.int32())))


class FrameSampleStage:
    """Actor stage: video frame sampling plumbing (STUB decode).  Emits
    one row per sampled frame (flat_map shape inside map_batches):
    deterministic frame selection (every ``stride``-th of
    ``meta.n_frames``), fake frame payloads derived from
    (payload, frame_index)."""

    def __init__(self, stride: int = 4, fake: bool = True) -> None:
        self.stride = stride
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        metas = batch["meta"].to_pylist()
        out = {"media_id": [], "frame_index": [], "frame": []}
        for mid, kind, p, m in zip(ids, kinds, payloads, metas):
            if kind != "video":
                continue
            n_frames = int((m or {}).get("n_frames") or 1)
            for fi in range(0, n_frames, self.stride):
                if not self.fake:
                    raise NotImplementedError(
                        "video codecs unavailable; use fake=True")
                out["media_id"].append(mid)
                out["frame_index"].append(fi)
                out["frame"].append(hashlib.blake2b(
                    (p or b"") + fi.to_bytes(4, "big"), digest_size=16).digest())
        return pa.table({"media_id": pa.array(out["media_id"], pa.int64()),
                         "frame_index": pa.array(out["frame_index"], pa.int32()),
                         "frame": pa.array(out["frame"], pa.binary())})
