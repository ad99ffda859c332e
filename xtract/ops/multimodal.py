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
