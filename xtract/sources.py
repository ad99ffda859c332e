"""Alternative sources for the ``pages`` table (S-family, SURVEY §2.1).

Parquet is the primary source (``pipeline.read_pages``); these cover
the other ingestion paths a crawl pipeline meets: JSONL exports, CSV
manifests, and raw-file directories (one document per file — the
``process_pages`` file-driver analogue, reference ``src/api.rs:844-875``).
Each normalizes to the canonical pages schema
``(url, warc_ts, html, text, lang)`` so every downstream stage is
source-agnostic.
"""

from __future__ import annotations

import base64
from typing import Optional

import pyarrow as pa

from .synth import EPOCH_US, PAGES_SCHEMA


def _normalize_batch(batch: pa.Table) -> pa.Table:
    """Coerce arbitrary ingested columns to the pages schema.  ``html``
    may arrive as base64 string (JSON transport) or utf-8 text."""
    n = len(batch)
    names = batch.column_names

    def col(name):
        return batch[name].to_pylist() if name in names else [None] * n

    urls = col("url")
    htmls = col("html")
    out_html: list[Optional[bytes]] = []
    for h in htmls:
        if h is None:
            out_html.append(None)
        elif isinstance(h, bytes):
            out_html.append(h)
        else:  # string: try base64 first (JSON-safe transport), else utf-8
            try:
                out_html.append(base64.b64decode(h, validate=True))
            except Exception:
                out_html.append(h.encode("utf-8"))
    tss = col("warc_ts")
    out_ts = [t if t is not None else EPOCH_US for t in tss]
    return pa.table({
        "url": pa.array([u or "" for u in urls], pa.string()),
        "warc_ts": pa.array(out_ts, pa.timestamp("us")),
        "html": pa.array(out_html, pa.binary()),
        "text": pa.array(col("text"), pa.string()),
        "lang": pa.array(col("lang"), pa.string()),
    })


def read_pages_json(paths, **kw):
    """JSONL source: one page object per line; html as base64 or text."""
    import ray.data as rd

    return rd.read_json(paths, **kw).map_batches(
        _normalize_batch, batch_format="pyarrow")


def read_pages_csv(paths, **kw):
    """CSV source (html column utf-8 or base64 — binary-unsafe transports
    should prefer parquet/jsonl)."""
    import ray.data as rd

    return rd.read_csv(paths, **kw).map_batches(
        _normalize_batch, batch_format="pyarrow")


def read_pages_files(paths, **kw):
    """Raw-file directory source: one document per file, url = file path
    (``read_binary_files(include_paths=True)`` — the provenance columns
    of ``set_input_name``, reference ``src/api.rs:381-407``)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **kw)

    def to_pages(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "url": pa.array([f"file://{p}" for p in batch["path"].to_pylist()],
                            pa.string()),
            "warc_ts": pa.array([EPOCH_US] * n, pa.timestamp("us")),
            "html": batch["bytes"].cast(pa.binary()),
            "text": pa.array([None] * n, pa.string()),
            "lang": pa.array([None] * n, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")
