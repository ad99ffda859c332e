"""Columnar interchange formats beyond Parquet: ORC and Arrow IPC
(Feather v2) sources/sinks, both pyarrow-native — the "switch a
pipeline onto a warehouse export without a conversion pass" surface.

Read shape: ``read_binary_files(include_paths=True)`` so each file
decodes inside ONE task (file-level parallelism, the
`read_pages_warc` ingest shape in ``xtract/sources.py``); column
pruning happens inside the task at the format reader, so only
requested columns materialize.

Write shape: one file per arriving block via ``map_batches``, named by
the blake2b digest of the encoded payload — deterministic for
deterministic input blocks and idempotent on rerun (same content →
same filename, overwrite-in-place), the resumability rule the parquet
shard sink follows.  A ``_manifest`` row per file carries
(path, n_rows, n_bytes) lineage.

Reference parity anchor: tesseract-rs ingests raw files/memory
buffers (src/api.rs:381-430 set_image paths); this extends the S-tier
source/sink family (SURVEY §2.1) the way the WARC/JSONL/CSV readers
do.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa


def _read_files(paths, decode_one, columns=None, **kw):
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kw)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for path, blob in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            t = decode_one(blob, columns)
            t = t.append_column(
                "_source_file",
                pa.array([os.path.basename(path)] * len(t), pa.string()))
            tables.append(t)
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


def read_orc(paths, columns=None, **kw):
    """ORC files → Dataset (one decode task per file, column-pruned at
    the reader); adds ``_source_file`` provenance."""
    def decode(blob: bytes, cols):
        import io

        import pyarrow.orc as orc

        return orc.ORCFile(io.BytesIO(blob)).read(columns=cols)

    return _read_files(paths, decode, columns, **kw)


def read_ipc(paths, columns=None, **kw):
    """Arrow IPC / Feather-v2 files → Dataset (zero-copy columnar
    decode per file); adds ``_source_file`` provenance."""
    def decode(blob: bytes, cols):
        import pyarrow.ipc as ipc

        t = ipc.open_file(pa.BufferReader(blob)).read_all()
        return t.select(cols) if cols else t

    return _read_files(paths, decode, columns, **kw)


def _write_files(ds, out_dir: str, encode_one, ext: str):
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        if not len(batch):
            return pa.table({"path": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        payload = encode_one(batch)
        name = hashlib.blake2b(payload, digest_size=16).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pa.table({
            "path": pa.array([path], pa.string()),
            "n_rows": pa.array([len(batch)], pa.int64()),
            "n_bytes": pa.array([len(payload)], pa.int64())})

    return ds.map_batches(write, batch_format="pyarrow")


def write_orc(ds, out_dir: str):
    """Dataset → one ORC file per block (content-hash names, atomic
    rename).  Consumes the manifest Dataset to drive the write."""
    def encode(batch: pa.Table) -> bytes:
        import io

        import pyarrow.orc as orc

        buf = io.BytesIO()
        orc.write_table(batch, buf)
        return buf.getvalue()

    return _write_files(ds, out_dir, encode, "orc")


def write_ipc(ds, out_dir: str):
    """Dataset → one Arrow IPC (Feather-v2) file per block
    (content-hash names, atomic rename)."""
    def encode(batch: pa.Table) -> bytes:
        import pyarrow.ipc as ipc

        sink = pa.BufferOutputStream()
        with ipc.new_file(sink, batch.schema) as w:
            w.write_table(batch)
        return sink.getvalue().to_pybytes()

    return _write_files(ds, out_dir, encode, "arrow")
